package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X131 DESCRIBE HISTORY: every writing verb stamps its operation into
  * the commit it claims, and the history read reports counts, schema
  * flags, and SetTransaction identity off the log alone.
  */
class OccHistorySpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_hist").toString + "/t"

  test("every verb's commit carries its operation; txn identity and schema flag surface") {
    val dir = freshDir()
    val base = (1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartitionByRange(2, col("id"))
    OccTable.init(base, dir, statsColumns = Seq("id"))           // v0
    OccTable.append(Seq((200L, 2.0)).toDF("id", "v"), dir)       // v1
    OccTable.appendStream(Seq((300L, 3.0)).toDF("id", "v"), dir,
      "histapp", 0L)                                             // v2
    OccTable.merge(spark, dir,
      Seq((5L, 50.0)).toDF("id", "v"), Seq("id"),
      statsColumns = Seq("id"))                                  // v3
    OccTable.optimize(spark, dir)                                // v4
    OccTable.deleteRange(spark, dir, "id", 200.0, 300.0)         // v5
    OccTable.rewrite(spark, dir, d => d.coalesce(1))             // v6
    OccTable.restore(spark, dir, 5L)                             // v7

    val h = OccTable.history(spark, dir)
    val ops = h.select("version", "operation").as[(Long, String)]
      .collect().toMap
    assert(ops === Map(0L -> "init", 1L -> "append",
      2L -> "append_stream", 3L -> "merge", 4L -> "optimize",
      5L -> "delete", 6L -> "rewrite", 7L -> "restore"))
    val txnRow = h.filter(col("version") === 2L)
      .select("txn_app", "txn_batch").as[(Option[String], Option[Long])]
      .head()
    assert(txnRow === ((Some("histapp"), Some(0L))))
    // schema actions in this build: init records v0's schema; the
    // rewrite relaxes nullability (a toDF-initialized table has
    // non-nullable columns, but Spark file scans serve everything
    // nullable, so the first full rewrite's output schema is the
    // relaxed union — an additive action); the restore then restores
    // the stricter pre-rewrite schema (Delta semantics)
    assert(h.filter(col("schema_changed")).select("version")
      .as[Long].collect().toSeq === Seq(0L, 6L, 7L))
    // counts come from the log: the restore re-adds what the rewrite
    // removed and removes its single packed file
    val r7 = h.filter(col("version") === 7L)
      .select("n_adds", "n_removes").as[(Long, Long)].head()
    assert(r7._2 === 1L)
    assert(r7._1 >= 1L)
  }
}

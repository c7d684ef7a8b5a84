package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Schema-drift tripwire gates (r9 post-mortem: a silent upstream
  * events.ts re-encode cost 34 queries for a round — drift must now fail
  * loudly, with a named diff, before any query runs).
  */
class TablesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("tripwire passes on the current driver testdata") {
    Tables.assertExpectedSchemas(spark, sfDir) // must not throw
  }

  test("tripwire names a missing column and the table it vanished from") {
    val dir = Files.createTempDirectory("graft_drift").toString
    // clone the real tables, then drop a column from one
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      val df = spark.read.parquet(s"$sfDir/$t.parquet")
      (if (t == "documents") df.drop("lang") else df)
        .write.parquet(s"$dir/$t.parquet")
    }
    val e = intercept[IllegalStateException] {
      Tables.assertExpectedSchemas(spark, dir)
    }
    assert(e.getMessage.contains("documents.lang"))
    assert(e.getMessage.contains("MISSING"))
    assert(e.getMessage.contains("schema drift"))
  }

  test("tripwire names an out-of-class dtype flip; tolerates in-class ones") {
    val dir = Files.createTempDirectory("graft_drift2").toString
    import org.apache.spark.sql.functions.col
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      val df = spark.read.parquet(s"$sfDir/$t.parquet")
      val mutated = t match {
        // out-of-class: a measure column becomes a string → must fail
        case "lineitem" => df.withColumn("l_quantity",
          col("l_quantity").cast("string"))
        // in-class: key width widening int32→int64 → must pass
        case "nation" => df.withColumn("n_nationkey",
          col("n_nationkey").cast("long"))
        case _ => df
      }
      mutated.write.parquet(s"$dir/$t.parquet")
    }
    val e = intercept[IllegalStateException] {
      Tables.assertExpectedSchemas(spark, dir)
    }
    assert(e.getMessage.contains("lineitem.l_quantity"))
    assert(!e.getMessage.contains("n_nationkey")) // widening tolerated
  }

  test("events loader and raw-nanos flag come from one load, agree with the file") {
    val (events, rawNanos) = Tables.eventsWithRawNanosFlag(spark, sfDir)
    import org.apache.spark.sql.types.{LongType, TimestampType}
    // whatever the current physical encoding, the adapted contract holds:
    assert(events.schema("ts").dataType === TimestampType)
    assert(events.schema("ts_nanos").dataType === LongType)
    val physical = Tables.eventsPhysical(spark, sfDir).schema("ts").dataType
    assert(rawNanos === (physical == LongType))
  }

  test("manifest: order-invariant checksum, null counts, single-row sensitivity") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = Seq(
      (1L, Some("a"), 10L),
      (2L, None, 20L),
      (3L, Some("c"), 30L)).toDF("id", "s", "n")
    val m = Layout.manifest(d, Seq("id", "s", "n")).collect().head
    assert(m.getAs[Long]("row_count") === 3L)
    assert(m.getAs[Long]("nulls_id") === 0L)
    assert(m.getAs[Long]("nulls_s") === 1L)
    val sum0 = m.getAs[Long]("checksum")
    // XOR commutes: any row order / partitioning yields the same record
    val shuffled = Layout.manifest(
      d.orderBy(col("n").desc).repartition(7), Seq("id", "s", "n"))
      .collect().head
    assert(shuffled === m)
    // one changed value flips the checksum; so does a changed column list
    val tweaked = Layout.manifest(
      d.withColumn("n", when(col("id") === 2L, 21L).otherwise(col("n"))),
      Seq("id", "s", "n")).collect().head
    assert(tweaked.getAs[Long]("checksum") !== sum0)
    val fewer = Layout.manifest(d, Seq("id", "n")).collect().head
    assert(fewer.getAs[Long]("checksum") !== sum0)
    // NULL is distinct from the string it would render as
    val nulls = Seq((1L, Option.empty[String])).toDF("id", "s")
    val lits = Seq((1L, Some("\u001e"))).toDF("id", "s")
    assert(Layout.manifest(nulls, Seq("id", "s")).collect().head
        .getAs[Long]("checksum") ===
      Layout.manifest(lits, Seq("id", "s")).collect().head
        .getAs[Long]("checksum"))
    // ^ the sentinel IS the rendering — document the collision class:
    // a literal \u001e cell is indistinguishable from NULL by design
    // (control chars never appear in sane data; the null COUNT column
    // still differs, which is why the manifest carries both)
    assert(Layout.manifest(nulls, Seq("id", "s")).collect().head
      .getAs[Long]("nulls_s") === 1L)
    assert(Layout.manifest(lits, Seq("id", "s")).collect().head
      .getAs[Long]("nulls_s") === 0L)
  }
}

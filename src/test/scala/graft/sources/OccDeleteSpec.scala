package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X130 DELETE: the three-way file classification (pass-through /
  * pure-log drop / rewrite) is visible in the result record AND the
  * physical file set, NULL rows never match either predicate form,
  * and the bloom-discovered identity delete touches only the files
  * that could hold the targets.
  */
class OccDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_del").toString + "/t"

  private def ids(dir: String): Seq[Long] =
    OccTable.read(spark, dir)().select("id").as[Long]
      .collect().sorted.toSeq

  test("range delete: covered files drop without reading, straddlers rewrite, disjoint files pass through") {
    val dir = freshDir()
    val base = (1L to 400L).map(i => (i, i * 2.0)).toDF("id", "v")
      .repartitionByRange(4, col("id"))
    OccTable.init(base, dir, statsColumns = Seq("id"))
    val pre = OccTable.snapshot(spark, dir)

    // [101, 300] covers files 1 and 2 exactly: pure log removes
    val res = OccTable.deleteRange(spark, dir, "id", 101.0, 300.0,
      statsColumns = Seq("id"))
    assert(res.droppedFiles === 2)
    assert(res.rewrittenFiles === 0)
    assert(res.keptFiles === 2)
    val post = OccTable.snapshot(spark, dir)
    assert(post.files.toSet.subsetOf(pre.files.toSet)) // zero new files
    assert(ids(dir) === ((1L to 100L) ++ (301L to 400L)))

    // [50, 350] now straddles both survivors: rewrite, nothing droppable
    val res2 = OccTable.deleteRange(spark, dir, "id", 50.0, 350.0,
      statsColumns = Seq("id"))
    assert(res2.droppedFiles === 0)
    assert(res2.rewrittenFiles === 2)
    assert(ids(dir) === ((1L to 49L) ++ (351L to 400L)))

    // disjoint predicate: a no-op that commits nothing
    val res3 = OccTable.deleteRange(spark, dir, "id", 1000.0, 2000.0)
    assert(res3.version === res2.version)
    assert(res3.keptFiles === OccTable.snapshot(spark, dir).files.size)
  }

  test("NULL rows never match: a fully-covered file with nulls rewrites instead of dropping, keeping them") {
    val dir = freshDir()
    val rows: Seq[(Option[Long], Double)] =
      (1L to 10L).map(i => (Some(i), i * 1.0)) :+ ((None, -1.0))
    OccTable.init(rows.toDF("id", "v").coalesce(1), dir,
      statsColumns = Seq("id"))
    val res = OccTable.deleteRange(spark, dir, "id", 1.0, 10.0)
    assert(res.droppedFiles === 0) // nulls recorded > 0: cannot prove all-match
    assert(res.rewrittenFiles === 1)
    val left = OccTable.read(spark, dir)()
      .select("id", "v").as[(Option[Long], Double)].collect().toSeq
    assert(left === Seq((None, -1.0)))
  }

  test("identity delete: bloom discovers the holder files, the rest pass through; no-ops commit nothing") {
    val dir = freshDir()
    val base = (1L to 400L).map(i => (i, s"u$i", i * 2.0))
      .toDF("id", "user", "v").repartitionByRange(4, col("id"))
    val blooms = Seq(OccBloom.BloomCol("user", 200L, 0.01))
    OccTable.init(base, dir, bloomColumns = blooms)
    val pre = OccTable.snapshot(spark, dir)

    val res = OccTable.deleteEquality(spark, dir, "user",
      Seq("u42", "u157"), bloomColumns = blooms)
    assert(res.rewrittenFiles < 4) // bloom cleared the non-holders
    assert(res.keptFiles === 4 - res.rewrittenFiles)
    assert(pre.files.toSet.intersect(
      OccTable.snapshot(spark, dir).files.toSet).size === res.keptFiles)
    assert(ids(dir) === (1L to 400L).filterNot(Set(42L, 157L)))

    // absent values: every bloom clears, no commit
    val v = OccTable.snapshot(spark, dir).version
    val res2 = OccTable.deleteEquality(spark, dir, "user", Seq("nobody"))
    assert(res2.version === v)
    assert(res2.rewrittenFiles === 0)
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X128 OPTIMIZE: small-file bin packing leaves right-sized files
  * physically alone, partitioned tables compact per partition with pv
  * carried to the outputs, ZORDER BY re-clusters into stats-prunable
  * files — and the read is identical before and after, always.
  */
class OccOptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_opt").toString + "/t"

  private def fsys(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("packs small files, keeps the large one physically, no-ops when nothing qualifies") {
    val dir = freshDir()
    // one comfortably-large file, then a tail of tiny per-"batch" files
    OccTable.init((1L to 20000L).toDF("id").coalesce(1), dir)
    (1 to 6).foreach(i =>
      OccTable.append(Seq(100000L + i).toDF("id").coalesce(1), dir))
    val pre = OccTable.snapshot(spark, dir)
    assert(pre.files.size === 7)
    val big = pre.files.maxBy(f =>
      fsys(dir).getFileStatus(new Path(dir, f)).getLen)

    val res = OccTable.optimize(spark, dir, smallFileBytes = 16L << 10)
    assert(res.compacted === 6)
    assert(res.kept === 1)
    assert(res.outputFiles === 1)
    val post = OccTable.snapshot(spark, dir)
    assert(post.files.size === 2)
    assert(post.files.contains(big)) // untouched physically
    assert(OccTable.read(spark, dir)().count() === 20006L)
    assert(OccTable.read(spark, dir)()
      .agg(sum("id")).head.getLong(0) ===
      (1L to 20000L).sum + (1 to 6).map(100000L + _).sum)

    // second run: nothing qualifies, no commit
    val res2 = OccTable.optimize(spark, dir, smallFileBytes = 16L << 10)
    assert(res2.compacted === 0)
    assert(res2.version === post.version)
    assert(OccTable.snapshot(spark, dir).version === post.version)
  }

  test("partitioned table compacts per partition and carries pv to the outputs") {
    val dir = freshDir()
    def batch(tag: Int) = Seq(
      (tag * 10L + 1, "a"), (tag * 10L + 2, "b"))
      .toDF("id", "k").repartition(2)
    OccTable.init(batch(0), dir, partitionBy = Seq("k"))
    OccTable.append(batch(1), dir, partitionBy = Seq("k"))
    OccTable.append(batch(2), dir, partitionBy = Seq("k"))
    val pre = OccTable.snapshot(spark, dir)
    assert(pre.files.size === 6) // 3 commits x 2 partitions
    val res = OccTable.optimize(spark, dir)
    assert(res.compacted === 6)
    assert(res.outputFiles === 2) // one packed file per partition
    val post = OccTable.snapshot(spark, dir)
    assert(post.files.size === 2)
    // pv rode the pack: pruning still plans exactly one file
    assert(post.pvs.size === 2)
    val aFiles = OccTable.partitionPrunedFiles(post, Seq("k" -> "a"))
    assert(aFiles.size === 1)
    assert(OccTable.readPartitionPruned(spark, dir, Seq("k" -> "a"))
      .select("id").as[Long].collect().sorted.toSeq === Seq(1L, 11L, 21L))
  }

  test("ZORDER BY re-clusters into multiplicatively stats-prunable files") {
    val dir = freshDir()
    // 4096 (x, y) points scattered across 8 arrival-order files: any
    // box predicate admits every file before clustering
    val pts = (0 until 4096).map { i =>
      (((i * 2654435761L) % 64).toDouble, ((i * 40503L) % 64).toDouble, i.toLong)
    }.toDF("x", "y", "id").repartition(8)
    OccTable.init(pts, dir, statsColumns = Seq("x", "y"))
    val pre = OccTable.snapshot(spark, dir)
    val preKept = OccTable.prunedFiles(
      pre.copy(files = OccTable.prunedFiles(pre, "x", 0.0, 15.0)),
      "y", 0.0, 15.0)
    assert(preKept.size === pre.files.size) // scattered: nothing prunes

    val res = OccTable.optimize(spark, dir, zorderBy = Seq("x", "y"),
      targetFileBytes = 4L << 10, statsColumns = Seq("x", "y"))
    assert(res.compacted === 8)
    val post = OccTable.snapshot(spark, dir)
    assert(post.files.size > 1)
    val kept = OccTable.prunedFiles(
      post.copy(files = OccTable.prunedFiles(post, "x", 0.0, 15.0)),
      "y", 0.0, 15.0)
    assert(kept.size < post.files.size) // the curve makes the box local
    // and the pruned read is exactly the plain filter
    val got = OccTable.readPrunedMulti(spark, dir,
      Seq(("x", 0.0, 15.0), ("y", 0.0, 15.0)))
      .select("id").as[Long].collect().sorted.toSeq
    val want = pts.filter(col("x") <= 15.0 && col("y") <= 15.0)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === want)
    assert(OccTable.read(spark, dir)().count() === 4096L)
  }
}

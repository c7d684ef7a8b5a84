package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X133 SHALLOW CLONE: a zero-copy fork — the clone's v0 references the
  * source's files by absolute path, divergence commits locally on both
  * sides, log state (stats, schema, constraints) rides the clone, and
  * a clone-side OPTIMIZE localizes it into an independent deep table.
  */
class OccCloneSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_clone").toString

  private def localParts(dir: String): Seq[String] = {
    val f = new java.io.File(dir)
    Option(f.listFiles()).getOrElse(Array.empty)
      .filter(x => x.isFile && x.getName.startsWith("part-"))
      .map(_.getName).toSeq
  }

  test("zero-copy fork, local divergence, source immutability, optimize localization") {
    val root = freshRoot()
    val (src, dst) = (s"$root/src", s"$root/dst")
    val base = (1L to 400L).map(i => (i, i * 2.0)).toDF("id", "v")
      .repartitionByRange(4, col("id"))
    OccTable.init(base, src, statsColumns = Seq("id"))
    OccTable.addCheckConstraint(spark, src, "id_pos", "id > 0")

    val snap = OccTable.clone(spark, src, dst)
    // zero bytes copied: the clone dir holds no data files at all
    assert(localParts(dst).isEmpty)
    assert(snap.files.forall(n => new Path(n).isAbsolute))
    // reads equal; stats rode (interval pruning plans a strict subset)
    assert(OccTable.read(spark, dst)().agg(sum("id")).head.getLong(0)
      === (1L to 400L).sum)
    assert(OccTable.readPruned(spark, dst, "id", 1.0, 50.0)
      .count() === 50L)
    assert(OccTable.prunedFiles(snap, "id", 1.0, 50.0).size === 1)
    // constraints rode: a violating append on the CLONE refuses
    assertThrows[OccTable.ConstraintViolationException] {
      OccTable.append(Seq((-1L, 0.0)).toDF("id", "v"), dst)
    }

    // divergence is local in both directions
    OccTable.append(Seq((1000L, 1.0)).toDF("id", "v"), dst)
    OccTable.rewrite(spark, src, d => d.withColumn("v", -col("v")))
    assert(OccTable.read(spark, dst)().count() === 401L)
    assert(OccTable.read(spark, src)().count() === 400L)
    // the clone still serves the ORIGINAL values — its v0 references
    // the immutable pre-rewrite files, not the source's live snapshot
    assert(OccTable.read(spark, dst)()
      .filter(col("id") === 7L).select("v").as[Double].head() === 14.0)

    // OPTIMIZE localizes: every live file becomes clone-local, reads
    // unchanged — the shallow→deep path, after which a source vacuum
    // cannot hurt the clone
    val res = OccTable.optimize(spark, dst)
    assert(res.compacted === 5)
    val post = OccTable.snapshot(spark, dst)
    assert(post.files.forall(n => !new Path(n).isAbsolute))
    assert(localParts(dst).nonEmpty)
    assert(OccTable.read(spark, dst)().agg(sum("id")).head.getLong(0)
      === (1L to 400L).sum + 1000L)
    // clone-side vacuum never reaches the source's files
    OccTable.vacuum(spark, dst)
    assert(OccTable.read(spark, src)().count() === 400L)
    // a second clone into a used directory refuses
    assertThrows[IllegalArgumentException] {
      OccTable.clone(spark, src, dst)
    }
  }
}

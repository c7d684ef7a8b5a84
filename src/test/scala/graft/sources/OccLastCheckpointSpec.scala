package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** X141 `_last_checkpoint` pointer: [[OccTable.checkpoint]] writes a
  * pointer to the latest checkpoint so [[OccTable.snapshot]] opens
  * listing-free (pointer + checkpoint + existence-probed tail); a
  * corrupt or stale pointer degrades to the listing fold, and
  * truncation bases retention on the pointer so pointer-guided readers
  * never lose a tail commit.
  */
class OccLastCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_lcp").toString + "/t"

  private def pointer(dir: String): Option[String] = {
    val f = new java.io.File(s"$dir/_graft_occ/_last_checkpoint")
    if (!f.exists()) None
    else Some(new String(java.nio.file.Files.readAllBytes(f.toPath),
      "UTF-8").trim)
  }

  test("checkpoint writes the pointer; snapshot folds pointer + probed tail") {
    val dir = freshDir()
    OccTable.init(Seq((1L, "a")).toDF("id", "s"), dir)
    OccTable.append(Seq((2L, "b")).toDF("id", "s"), dir)
    assert(pointer(dir).isEmpty) // no checkpoint yet: listing path
    val cv = OccTable.checkpoint(spark, dir)
    assert(pointer(dir) === Some(cv.toString))
    // commits past the pointer are picked up by the existence probes
    OccTable.append(Seq((3L, "c")).toDF("id", "s"), dir)
    OccTable.append(Seq((4L, "d")).toDF("id", "s"), dir)
    val snap = OccTable.snapshot(spark, dir)
    assert(snap.version === cv + 2)
    assert(OccTable.read(spark, dir)().count() === 4L)
    // re-checkpoint advances the pointer
    OccTable.checkpoint(spark, dir)
    assert(pointer(dir) === Some((cv + 2).toString))
  }

  test("corrupt pointer degrades to the listing fold, never a wrong answer") {
    val dir = freshDir()
    OccTable.init(Seq((1L, "a")).toDF("id", "s"), dir)
    OccTable.checkpoint(spark, dir)
    OccTable.append(Seq((2L, "b")).toDF("id", "s"), dir)
    val p = new java.io.File(s"$dir/_graft_occ/_last_checkpoint")
    java.nio.file.Files.write(p.toPath, "not-a-number\n".getBytes("UTF-8"))
    assert(OccTable.snapshot(spark, dir).version === 1L)
    assert(OccTable.read(spark, dir)().count() === 2L)
  }

  test("truncation bases on the pointer: a stale pointer never strands readers") {
    val dir = freshDir()
    OccTable.init(Seq((1L, "a")).toDF("id", "s"), dir)
    OccTable.append(Seq((2L, "b")).toDF("id", "s"), dir) // v1
    OccTable.checkpoint(spark, dir) // chk v1, pointer 1
    OccTable.append(Seq((3L, "c")).toDF("id", "s"), dir) // v2
    // model a newer checkpoint whose POINTER WRITE FAILED: chk file at
    // v2 exists but the pointer still says 1
    val fsys = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val chk1 = new org.apache.hadoop.fs.Path(
      s"$dir/_graft_occ/v${"%020d".format(1L)}.chk")
    val chk2 = new org.apache.hadoop.fs.Path(
      s"$dir/_graft_occ/v${"%020d".format(2L)}.chk")
    // fabricate the failed-pointer-write state: take a REAL checkpoint
    // at v2 (which advances the pointer and drops chk v1), then restore
    // chk v1's bytes and the pointer value as they were before it
    // write through fsys so the checksummed local FS stays readable
    def fsWrite(p: org.apache.hadoop.fs.Path, bytes: Array[Byte]): Unit = {
      val out = fsys.create(p, true)
      try out.write(bytes) finally out.close()
    }
    val chk1Bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(chk1.toUri.getPath))
    OccTable.checkpoint(spark, dir)
    fsWrite(chk1, chk1Bytes)
    fsWrite(new org.apache.hadoop.fs.Path(
      s"$dir/_graft_occ/_last_checkpoint"), "1\n".getBytes("UTF-8"))
    assert(fsys.exists(chk2))
    // truncation must base on the POINTER (v1), keeping commit v2 for
    // pointer-guided readers — not on the newer checkpoint file
    OccTable.truncateLog(spark, dir)
    assert(fsys.exists(new org.apache.hadoop.fs.Path(
      s"$dir/_graft_occ/v${"%020d".format(2L)}")),
      "commit above the pointer must survive truncation")
    assert(OccTable.snapshot(spark, dir).version === 2L)
    assert(OccTable.read(spark, dir)().count() === 3L)
    assert(fsys.exists(chk1) || fsys.exists(chk2))
  }
}

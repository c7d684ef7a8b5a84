package graft.sources

import java.net.URI
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** A local filesystem that COUNTS metadata RPCs — the instrument that
  * turns "the connector opens from log metadata alone" (X148) from a
  * claim into an assertion. Registered under the `cntfs` scheme;
  * counters are JVM-global (local mode shares the JVM, so executor
  * traffic counts too — the specs scope their assertions to windows
  * where only the code under test runs).
  */
class CountingFs extends RawLocalFileSystem {
  override def getScheme: String = "cntfs"
  override def getUri: URI = URI.create("cntfs:///")
  override def getFileStatus(p: Path): FileStatus = {
    CountingFs.statCalls.incrementAndGet()
    super.getFileStatus(p)
  }
  override def listStatus(p: Path): Array[FileStatus] = {
    CountingFs.listCalls.incrementAndGet()
    super.listStatus(p)
  }
}

object CountingFs {
  val statCalls = new AtomicLong(0L)
  val listCalls = new AtomicLong(0L)
  def reset(): Unit = { statCalls.set(0L); listCalls.set(0L) }
}

/** X148 — file (size, modTime) recorded in the add actions (Delta
  * `AddFile.size`/`modificationTime` parity): every write verb stamps
  * its adds, checkpoints and clones re-emit the stamps, and the
  * `graft-occ` connector builds its FileIndex from the LOG ALONE —
  * zero per-file filesystem metadata calls on relation open, the
  * property that keeps a shallow-cloned 10^6-file table's open cost
  * O(log), not O(#files) serial driver RPCs. Size-less adds (legacy
  * logs) fall back to listing, never to a wrong answer.
  */
class OccFileMetaSpec extends SparkSpec {
  import spark.implicits._

  private def countedDir(): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.cntfs.impl", classOf[CountingFs].getName)
    "cntfs:" + Files.createTempDirectory("graft_fsmeta") + "/t"
  }

  private def slices(dir: String): Unit = {
    def slice(r: Range) =
      r.map(i => (i.toLong, s"k$i")).toDF("id", "key").coalesce(1)
    OccTable.init(slice(0 until 10), dir, statsColumns = Seq("id"))
    Seq(10 until 20, 20 until 30, 30 until 40).foreach(r =>
      OccTable.append(slice(r), dir, statsColumns = Seq("id")))
  }

  test("adds record (size, modTime); fold, checkpoint, and removes carry them") {
    val dir = Files.createTempDirectory("graft_fsmeta_log") + "/t"
    slices(dir)
    val snap = OccTable.snapshot(spark, dir)
    assert(snap.files.size === 4 && snap.sizesComplete)
    val fsys = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    snap.files.foreach { n =>
      val st = fsys.getFileStatus(new Path(s"$dir/$n"))
      assert(snap.sizes(n) === ((st.getLen, st.getModificationTime)),
        s"recorded (size, modTime) of $n must match the filesystem")
    }
    // checkpoint re-emits the stamps; a rewrite's staged files get
    // fresh ones and the removed files' stamps drop from the fold
    OccTable.checkpoint(spark, dir)
    assert(OccTable.snapshot(spark, dir).sizesComplete)
    OccTable.rewrite(spark, dir, d => d.coalesce(1))
    val after = OccTable.snapshot(spark, dir)
    assert(after.files.size === 1 && after.sizesComplete)
    val st = fsys.getFileStatus(new Path(s"$dir/${after.files.head}"))
    assert(after.sizes(after.files.head)._1 === st.getLen)
  }

  test("connector relation open is ZERO per-file metadata calls on a size-carrying log") {
    val dir = countedDir()
    slices(dir)
    val snap = OccTable.snapshot(spark, dir)
    assert(snap.sizesComplete)
    val fsys = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val realSum = snap.files
      .map(n => fsys.getFileStatus(new Path(s"$dir/$n")).getLen).sum
    CountingFs.reset()
    val idx = new OccFileIndex(spark, dir, snap, snap.schema.get)
    val planned = idx.listFiles(Nil, Nil)
    assert(CountingFs.statCalls.get === 0L && CountingFs.listCalls.get === 0L,
      "index construction + listFiles must touch the filesystem ZERO " +
        "times when every add carries fs= metadata")
    assert(idx.sizeInBytes === realSum,
      "sizeInBytes must come from the log and match the real bytes")
    assert(planned.head.files.map(_.getLen).sum === realSum)
    // the served rows are still the real bytes
    assert(spark.read.format("graft-occ").load(dir).count() === 40L)
  }

  test("a shallow CLONE opens from its v0 alone — no per-source-file RPC loop") {
    val src = countedDir()
    slices(src)
    val dst = countedDir()
    OccTable.clone(spark, src, dst)
    val snap = OccTable.snapshot(spark, dst)
    assert(snap.files.forall(_.contains(":/")),
      "clone must reference source files absolutely")
    assert(snap.sizesComplete, "clone v0 must carry the source's stamps")
    CountingFs.reset()
    val idx = new OccFileIndex(spark, dst, snap, snap.schema.get)
    idx.listFiles(Nil, Nil)
    assert(CountingFs.statCalls.get === 0L && CountingFs.listCalls.get === 0L,
      "a clone-backed relation open must not stat source files " +
        "one by one")
    assert(spark.read.format("graft-occ").load(dst)
      .agg(sum("id")).head.getLong(0) === (0L until 40L).sum)
  }

  test("size-less adds (legacy logs) fall back to listing, never to a wrong answer") {
    val dir = Files.createTempDirectory("graft_fsmeta_legacy") + "/t"
    slices(dir)
    // strip the fs= stamps from every commit — the pre-X148 log shape
    val fsys = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val log = new Path(s"$dir/_graft_occ")
    fsys.listStatus(log).filter(_.getPath.getName.matches("v\\d{20}"))
      .foreach { st =>
        val in = fsys.open(st.getPath)
        val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val stripped = body.linesIterator
          .map(_.split('\t').filterNot(_.startsWith("fs=")).mkString("\t"))
          .mkString("", "\n", "\n")
        val out = fsys.create(st.getPath, true)
        try out.write(stripped.getBytes("UTF-8")) finally out.close()
      }
    val snap = OccTable.snapshot(spark, dir)
    assert(snap.sizes.isEmpty && !snap.sizesComplete)
    val idx = new OccFileIndex(spark, dir, snap, snap.schema.get)
    assert(idx.sizeInBytes ===
      snap.files.map(n =>
        fsys.getFileStatus(new Path(s"$dir/$n")).getLen).sum)
    assert(spark.read.format("graft-occ").load(dir).count() === 40L)
  }
}

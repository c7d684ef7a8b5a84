package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exactly-once `foreachBatch` sink tests — the gate for the one
  * user-visible hole the r13 audit found: every blind-append foreachBatch
  * sink (and the reference's own JDBC append, spark_streaming.py:52-75)
  * duplicates a micro-batch replayed after a restart between the write
  * and the checkpoint commit. The flagship test here IS that scenario:
  * kill the query after the sink ran, restart from the same checkpoint,
  * prove zero duplicate rows — and prove the naive append DOES duplicate
  * under the identical kill, so the fence is what removes them.
  */
class TxnSinkSpec extends SparkSpec {
  import spark.implicits._

  private def dirFor(tag: String): String =
    Files.createTempDirectory(s"graft_txn_$tag").toString + "/data"

  test("append + committedRead: batches land once, empty batches fence, compaction preserves the view") {
    val dir = dirFor("basic")
    TxnSink.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), dir, 0L)
    TxnSink.append(Seq.empty[(Long, String)].toDF("id", "v"), dir, 1L)
    TxnSink.append(Seq((4L, "d"), (5L, "e")).toDF("id", "v"), dir, 2L)

    assert(TxnSink.committedRead(spark, dir).count() === 5)
    assert((0L to 2L).forall(TxnSink.isCommitted(spark, dir, _)))
    assert(!TxnSink.isCommitted(spark, dir, 3L))
    assert(TxnSink.lastCommitted(spark, dir) === Some(2L))
    // operational plain read still works: the log is a hidden _ dir
    assert(spark.read.parquet(dir).count() === 5)

    assert(TxnSink.compact(spark, dir) === Some(2L))
    assert(TxnSink.committedRead(spark, dir).count() === 5)
    assert((0L to 2L).forall(TxnSink.isCommitted(spark, dir, _)))
    // the log is now ONE generation file
    val log = new java.io.File(s"$dir/_graft_txn").listFiles()
      .filterNot(_.getName.startsWith("."))
    assert(log.length === 1 && log.head.getName.endsWith(".compact"))
    // commits continue past the compaction and both eras are read
    TxnSink.append(Seq((6L, "f")).toDF("id", "v"), dir, 3L)
    assert(TxnSink.committedRead(spark, dir).count() === 6)
    assert(TxnSink.lastCommitted(spark, dir) === Some(3L))
  }

  test("replay of a committed batch id is a no-op, even with different data") {
    val dir = dirFor("replay")
    TxnSink.append(Seq((1L, "a")).toDF("id", "v"), dir, 0L)
    // a replayed epoch re-offers the same id; the fence must win even if
    // the recomputed frame differs (nondeterministic upstream)
    TxnSink.append(Seq((9L, "z"), (10L, "y")).toDF("id", "v"), dir, 0L)
    val rows = TxnSink.committedRead(spark, dir).as[(Long, String)].collect()
    assert(rows.toSeq === Seq((1L, "a")))
  }

  test("mid-publish crash: orphan data files are invisible to committedRead and cleaned on redo") {
    val dir = dirFor("orphan")
    TxnSink.append(Seq((1L, "a")).toDF("id", "v"), dir, 0L)
    // simulate a crash AFTER batch 5 renamed a file in but BEFORE its
    // manifest published: a prefixed data file with no manifest entry
    val pad5 = f"${5L}%020d"
    Seq((99L, "orphan")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$dir/.staging-orphan")
    val part = new java.io.File(s"$dir/.staging-orphan").listFiles()
      .filter(_.getName.startsWith("part-")).head
    val orphan = new java.io.File(dir, s"part-b$pad5-crashed.parquet")
    java.nio.file.Files.move(part.toPath, orphan.toPath)

    // exact reader never sees it; the naive reader does — the documented
    // difference between the two
    assert(TxnSink.committedRead(spark, dir).count() === 1)
    assert(spark.read.parquet(dir).count() === 2)

    // the engine replays batch 5: redo must clean the orphan first
    TxnSink.append(Seq((5L, "real")).toDF("id", "v"), dir, 5L)
    assert(!orphan.exists())
    val rows = TxnSink.committedRead(spark, dir)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((1L, "a"), (5L, "real")))
    assert(spark.read.parquet(dir).count() === 2) // orphan gone on disk too
  }

  /** Run a MemoryStream through `sink`, killing the query via an
    * injected failure AFTER the sink processed batch 1, then restart
    * from the same checkpoint and feed one more batch. Returns the final
    * row count / distinct count of the sink output read by `readOut`.
    */
  private def killMidBatchRun(
      sink: String => (DataFrame, Long) => Unit,
      readOut: (String) => DataFrame): (Long, Long) = {
    implicit val sqlCtx = spark.sqlContext
    val dir = dirFor("kill")
    val ckpt = Files.createTempDirectory("graft_txn_kill_ckpt").toString
    val failOnce = new AtomicInteger(0)
    val body = sink(dir)
    def guarded: (DataFrame, Long) => Unit = (batch, batchId) => {
      body(batch, batchId)
      // the kill: sink SUCCEEDED for batch 1, engine checkpoint commit
      // never happens — exactly the restart-replay window
      if (batchId == 1L && failOnce.getAndIncrement() == 0)
        throw new RuntimeException("injected post-write crash")
    }
    val mem = MemoryStream[(Long, String)]
    def start() = mem.toDF().toDF("id", "v").writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch(guarded)
      .start()

    val q1 = start()
    mem.addData((1L, "a"), (2L, "b"))
    q1.processAllAvailable()
    mem.addData((3L, "c"))
    try q1.processAllAvailable() catch { case _: Throwable => () }
    // the query died on the injected failure, not something else
    assert(q1.exception.isDefined)
    q1.stop()

    val q2 = start() // same checkpoint: batch 1 replays with the same id
    try {
      mem.addData((4L, "d"))
      q2.processAllAvailable()
    } finally q2.stop()

    val out = readOut(dir)
    (out.count(), out.distinct().count())
  }

  test("kill after write, before checkpoint commit → restart: fenced sink has ZERO duplicate rows") {
    val (total, distinct) =
      killMidBatchRun(TxnSink.exactlyOnceParquetSink, TxnSink.committedRead(spark, _))
    assert(total === 4, s"expected the 4 source rows exactly once, got $total")
    assert(total === distinct)
  }

  test("the same kill against the naive blind append DOES duplicate — the reference's latent bug") {
    val (total, distinct) = killMidBatchRun(
      dir => (batch, _) => if (!batch.isEmpty) batch.write.mode("append").parquet(dir),
      spark.read.parquet(_))
    assert(distinct === 4)
    assert(total > distinct, // batch 1 appended twice
      s"naive append unexpectedly exactly-once: $total rows, $distinct distinct")
  }

  test("vacuum collects crashed-writer staging dirs and unreferenced orphans, never committed files") {
    val dir = dirFor("vacuum")
    TxnSink.append(Seq((1L, "a")).toDF("id", "v"), dir, 0L)
    // a crashed writer's leftovers: a staging dir and an orphan for a
    // batch id that was never redone
    Seq((7L, "x")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$dir/.staging-${f"${7L}%020d"}")
    Seq((8L, "y")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$dir/.tmp-src")
    val part = new java.io.File(s"$dir/.tmp-src").listFiles()
      .filter(_.getName.startsWith("part-")).head
    java.nio.file.Files.move(part.toPath,
      new java.io.File(dir, s"part-b${f"${8L}%020d"}-dead.parquet").toPath)

    val removed = TxnSink.vacuum(spark, dir)
    assert(removed.exists(_.startsWith(".staging-")))
    assert(removed.exists(_.endsWith("-dead.parquet")))
    val rows = TxnSink.committedRead(spark, dir).as[(Long, String)].collect()
    assert(rows.toSeq === Seq((1L, "a")))
    assert(spark.read.parquet(dir).count() === 1) // disk agrees
  }

  test("fenced effect sink: body runs once per batch id; crash-mid-body re-runs it") {
    val markers = dirFor("fence")
    val ran = new AtomicInteger(0)
    val body: (DataFrame, Long) => Unit = (_, _) => { ran.incrementAndGet(); () }
    val one = Seq((1L, "a")).toDF("id", "v")
    TxnSink.fenced(markers)(body)(one, 0L)
    TxnSink.fenced(markers)(body)(one, 0L) // replay after success: skipped
    assert(ran.get() === 1)
    // crash MID-body: no marker published → the replay must re-run
    val boom: (DataFrame, Long) => Unit = (b, id) => {
      ran.incrementAndGet(); throw new RuntimeException("mid-body crash")
    }
    intercept[RuntimeException] { TxnSink.fenced(markers)(boom)(one, 1L) }
    assert(!TxnSink.isCommitted(spark, markers, 1L))
    TxnSink.fenced(markers)(body)(one, 1L) // redo runs
    assert(ran.get() === 3 && TxnSink.isCommitted(spark, markers, 1L))
  }
}

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Measures the steady-state envelope of the real dual-sink pipeline
  * (raw parquet append + watermarked windowed agg) under the deterministic
  * rate simulator — the measured counterpart of BASELINE.md's published
  * target ("micro-batch latency < 10 s at a sustained replay of
  * ≥ 300 msg/min", reference/README.md:253,256, Project Scale.md:52).
  *
  * Shared by [[graft.streaming.SteadyStateSpec]] (which asserts the
  * targets) and [[graft.StreamBench]] (which persists the numbers as a
  * per-round JSON artifact, the streaming analogue of `BENCH_r*.json`).
  */
object SteadyState {

  final case class Envelope(
      rows: Long, elapsedSec: Double, msgPerMin: Double,
      rawBatches: Int, rawMedianMs: Long, rawMaxMs: Long,
      aggBatches: Int, aggMedianMs: Long, aggMaxMs: Long,
      aggWindowsFlushed: Long, rowsPerBatch: Int, advanceMsPerBatch: Long) {
    /** One diffable JSON line, targets included so the artifact is
      * self-describing.
      */
    def json: String =
      s"""{"metric":"stream_envelope","msg_per_min":${math.round(msgPerMin)},""" +
        s""""rows":$rows,"elapsed_sec":${math.round(elapsedSec * 10) / 10.0},""" +
        s""""raw_batches":$rawBatches,"raw_latency_ms":{"median":$rawMedianMs,"max":$rawMaxMs},""" +
        s""""agg_batches":$aggBatches,"agg_latency_ms":{"median":$aggMedianMs,"max":$aggMaxMs},""" +
        s""""agg_windows_flushed":$aggWindowsFlushed,""" +
        s""""sim":{"rows_per_batch":$rowsPerBatch,"advance_ms_per_batch":$advanceMsPerBatch},""" +
        s""""target":{"msg_per_min":300,"latency_ms":10000}}"""
  }

  def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.length / 2)

  /** Drives [[Pipeline.startDual]] from [[Sources.rateSimulated]] until the
    * slower (stateful agg) query has processed `minAggBatches` productive
    * micro-batches or `deadlineSec` elapses, then reads the envelope out of
    * the engine's own progress telemetry and what the raw sink actually
    * wrote (recentProgress caps at 100 entries, so summing it would
    * undercount long runs). Latency quantiles are over PRODUCTIVE batches
    * (numInputRows > 0): empty triggers cost ~nothing and would flatter
    * the median.
    */
  def measure(spark: SparkSession, rowsPerBatch: Int = 50,
      advanceMsPerBatch: Long = 120000L, minAggBatches: Int = 15,
      deadlineSec: Int = 180): Envelope = {
    val out = Files.createTempDirectory("graft_steady_out").toString
    val ckpt = Files.createTempDirectory("graft_steady_ckpt").toString
    val readings = Sources.rateSimulated(spark, rowsPerBatch = rowsPerBatch,
      advanceMsPerBatch = advanceMsPerBatch)
    val queries = Pipeline.startDual(readings, out, ckpt)
    val raw = queries.head
    val agg = queries(1)
    val t0 = System.nanoTime()
    try {
      val deadline = t0 + deadlineSec * 1000L * 1000 * 1000
      while (agg.recentProgress.count(_.numInputRows > 0) < minAggBatches
          && System.nanoTime() < deadline) {
        Thread.sleep(200)
      }
    } finally queries.foreach(_.stop())
    val elapsedSec = (System.nanoTime() - t0) / 1e9

    def latencies(q: org.apache.spark.sql.streaming.StreamingQuery): Seq[Long] =
      q.recentProgress.toSeq.filter(_.numInputRows > 0)
        .map(_.durationMs.get("triggerExecution").toLong)
    val rawLat = latencies(raw)
    val aggLat = latencies(agg)
    // no sink dir = the query committed zero batches before the deadline —
    // report the honest zero envelope instead of throwing on the read
    val rows =
      if (new java.io.File(s"$out/raw").exists())
        spark.read.parquet(s"$out/raw").count()
      else 0L
    val flushed =
      if (new java.io.File(s"$out/agg").exists())
        spark.read.parquet(s"$out/agg").count()
      else 0L
    Envelope(
      rows = rows, elapsedSec = elapsedSec,
      msgPerMin = rows / elapsedSec * 60,
      rawBatches = rawLat.length,
      rawMedianMs = if (rawLat.isEmpty) -1 else median(rawLat),
      rawMaxMs = if (rawLat.isEmpty) -1 else rawLat.max,
      aggBatches = aggLat.length,
      aggMedianMs = if (aggLat.isEmpty) -1 else median(aggLat),
      aggMaxMs = if (aggLat.isEmpty) -1 else aggLat.max,
      aggWindowsFlushed = flushed,
      rowsPerBatch = rowsPerBatch, advanceMsPerBatch = advanceMsPerBatch)
  }
}

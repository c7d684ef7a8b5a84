package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.AnalysisException

import graft.SparkSpec

/** The reference's published performance envelope, measured (BASELINE.md:
  * "micro-batch latency < 10 s at a sustained replay of ≥ 300 msg/min",
  * reference/README.md:253,256, Project Scale.md:52): the deterministic
  * rate simulator drives the REAL dual-sink pipeline (raw parquet append +
  * watermarked windowed agg with the non-empty-batch guard) and the
  * engine's own progress telemetry is asserted against both targets.
  *
  * Plus the S1/ST8 source contract: the Kafka reader wiring (format +
  * options mirroring reference/spark_streaming.py:125-130) and its
  * documented failure mode in a connector-less environment.
  */
class SteadyStateSpec extends SparkSpec {

  test("steady-state dual-sink replay sustains >=300 msg/min with <10s micro-batch latency") {
    val out = Files.createTempDirectory("graft_steady_out").toString
    val ckpt = Files.createTempDirectory("graft_steady_ckpt").toString
    // 50 readings per micro-batch (headroom over the 300/min target even
    // when suite-mates contend for the shared session); event time
    // advances 2 min per batch so 5-min windows close against the 10-min
    // watermark early in the run and the agg sink does real flush work.
    val readings = Sources.rateSimulated(spark, rowsPerBatch = 50,
      advanceMsPerBatch = 120000L)
    val queries = Pipeline.startDual(readings, out, ckpt)
    val raw = queries.head
    val agg = queries(1)
    val t0 = System.nanoTime()
    try {
      // run until the SLOWER query (the stateful agg) has replayed enough
      // event time for windows to finalize: watermark passes the first
      // window end after ~8 batches at 2 min advance
      val deadline = t0 + 180L * 1000 * 1000 * 1000
      while (agg.recentProgress.count(_.numInputRows > 0) < 15
          && System.nanoTime() < deadline) {
        Thread.sleep(200)
      }
    } finally queries.foreach(_.stop())
    val elapsedSec = (System.nanoTime() - t0) / 1e9

    val progress = raw.recentProgress.filter(_.numInputRows > 0)
    assert(progress.length >= 15, s"only ${progress.length} batches in ${elapsedSec}s")
    // total throughput from what the raw sink actually WROTE (recentProgress
    // is capped at 100 entries, so summing it would undercount long runs)
    val rows = spark.read.parquet(s"$out/raw").count()
    val msgPerMin = rows / elapsedSec * 60
    // steady-state latency = median trigger duration: the first batches
    // pay one-time state-store/sink init, and suite-mates sharing the
    // session can spike an individual trigger — the <10 s target is about
    // the sustained envelope
    def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.length / 2)
    val latencies = progress.map(_.durationMs.get("triggerExecution").toLong)
    info(f"raw sink: $rows rows in $elapsedSec%.1f s = $msgPerMin%.0f msg/min; " +
      f"micro-batch latency median ${median(latencies)} ms, max ${latencies.max} ms")
    assert(msgPerMin >= 300, f"throughput $msgPerMin%.0f msg/min below the 300 target")
    assert(median(latencies) < 10000,
      s"steady-state micro-batch latency ${median(latencies)} ms breaches the <10 s target")

    // the agg side must also stay under the latency target AND have
    // flushed finalized windows (watermark passed window end during replay)
    val aggLat = agg.recentProgress.map(_.durationMs.get("triggerExecution").toLong)
    assert(aggLat.nonEmpty && median(aggLat) < 10000,
      s"agg micro-batch latency ${if (aggLat.isEmpty) -1 else median(aggLat)} ms")
    info(f"agg sink: ${aggLat.length} micro-batches, latency median ${median(aggLat)} ms, " +
      f"max ${aggLat.max} ms")
    val flushed = spark.read.parquet(s"$out/agg")
    assert(flushed.count() > 0, "no finalized windows flushed to the agg sink")
  }

  test("kafka source contract: reference reader wiring; connector-missing failure is actionable (S1/ST8)") {
    val opts = Sources.kafkaOptions("localhost:9092", "iot-sensor-data", "latest")
    // the exact reader surface of reference/spark_streaming.py:125-130
    assert(Sources.KafkaFormat === "kafka")
    assert(opts("kafka.bootstrap.servers") === "localhost:9092")
    assert(opts("subscribe") === "iot-sensor-data")
    assert(opts("startingOffsets") === "latest")
    // this environment has no spark-sql-kafka jar: the wiring must fail at
    // source RESOLUTION (proving .format("kafka") reached the registry),
    // not at option validation
    val e = intercept[AnalysisException] {
      Sources.kafka(spark, "localhost:9092", "iot-sensor-data")
    }
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }
}

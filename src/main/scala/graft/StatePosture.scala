package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.model.SensorReading
import graft.streaming.{Pipeline, Stateful}

/** Empirical scale posture for STREAMING STATE — the measurement behind
  * [[Session.rocksdbStateStore]]'s 100 TB claim, which until this
  * section was argued analytically and exercised only on toy key
  * counts. Two stateful shapes (the reference's windowed rollup,
  * `spark_streaming.py:152-165`, and the custom EWMA state of X78) run
  * at 1×/10×/100× KEY CARDINALITY on both providers, and the artifact
  * records per (op, provider, scale):
  *
  *   - `state_rows_peak` — provider-reported `numRowsTotal` with all
  *     keys live. Healthy: ∝ keys on BOTH providers (state is per-key
  *     by design; the provider changes WHERE it lives, not how much).
  *   - `mem_used_mb` — provider-reported `memoryUsedBytes`. For the
  *     heap-backed default this IS executor heap (SizeEstimator over
  *     the in-heap version maps): healthy growth here is the PROBLEM
  *     being demonstrated — it scales with keys and is charged against
  *     executor memory, the GC-death mode at 100 TB. For RocksDB it is
  *     native (block cache + memtables + filters), bounded and OFF
  *     heap.
  *   - `rocks_sst_mb` / `rocks_pinned_mb` — where RocksDB's growth
  *     actually goes: SST files on local disk (scales with keys, as
  *     disk should) vs pinned block-cache memory (bounded).
  *   - `state_rows_after_evict` — `numRowsTotal` after the watermark
  *     passes window end / idle timeout: state ∝ ACTIVE keys, the
  *     eviction half of the claim (a provider that only grows is a
  *     leak at any scale).
  *   - `sec_batch` — wall time of the loaded batch, for the throughput
  *     cliff a heap provider hits when the working set outgrows cache.
  *
  * Wired into [[Posture]]'s `POSTURE_10X.json` as the `state` section;
  * the standalone main prints the section for iteration.
  */
object StatePosture {

  final case class Meas(keys: Int, rowsPeak: Long, memUsedBytes: Long,
      sstBytes: Long, pinnedBytes: Long, rowsAfterEvict: Long,
      batchSec: Double)

  private val T0 = Timestamp.valueOf("2024-01-01 00:00:00")

  private def at(minutes: Double): Timestamp =
    new Timestamp(T0.getTime + (minutes * 60000L).toLong)

  private def batch(k: Int, minute: Double): Seq[SensorReading] =
    (0 until k).map { i =>
      SensorReading(f"S$i%07d", s"loc_${i % 97}", at(minute),
        20.0 + (i % 13), 50.0, 1000.0)
    }

  /** Drain one op at key cardinality `k` on whatever provider the
    * session conf currently names. Three loaded batches (all keys
    * live; enough writes for the capped-buffer RocksDB fixture to
    * flush), a peak metrics read, then the eviction probe: one
    * watermark-advancing batch plus one follow-up batch (watermarks
    * publish at batch END, so timers/purges fire one batch later).
    */
  private[graft] def run(spark: SparkSession, name: String, k: Int,
      op: MemoryStream[SensorReading] => org.apache.spark.sql.DataFrame)
      : Meas = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SensorReading]
    val q: StreamingQuery = op(mem).writeStream
      .format("memory").queryName(s"state_posture_$name")
      .outputMode("append").start()
    try {
      mem.addData(batch(k, 0.0))
      q.processAllAvailable()
      mem.addData(batch(k, 1.0))
      q.processAllAvailable()
      val t0 = System.nanoTime()
      mem.addData(batch(k, 2.0))
      q.processAllAvailable()
      val batchSec = (System.nanoTime() - t0) / 1e9
      val peak = q.lastProgress.stateOperators.head
      val cm = peak.customMetrics.asScala.map { case (kk, v) =>
        (kk, v.longValue) }.toMap
      def metric(sub: String): Long =
        cm.collectFirst { case (kk, v) if kk.contains(sub) => v }
          .getOrElse(0L)
      val (rowsPeak, memPeak) = (peak.numRowsTotal, peak.memoryUsedBytes)
      val (sst, pinned) =
        (metric("SstFileSize"), metric("PinnedBlocksMemory"))
      // eviction: watermark (10 min) sails past both the 5-min windows
      // and the 30-min idle timeout; the follow-up batch fires them
      mem.addData(batch(1, 50.0))
      q.processAllAvailable()
      mem.addData(batch(1, 51.0))
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators.head.numRowsTotal
      Meas(k, rowsPeak, memPeak, sst, pinned, after, batchSec)
    } finally {
      q.stop()
      spark.catalog.dropTempView(s"state_posture_$name")
    }
  }

  private[graft] def withProvider[A](spark: SparkSession,
      confs: Map[String, String])(body: => A): A = {
    val prev = confs.keys.map(kk => kk -> spark.conf.getOption(kk)).toMap
    confs.foreach { case (kk, v) => spark.conf.set(kk, v) }
    try body
    finally prev.foreach {
      case (kk, Some(v)) => spark.conf.set(kk, v)
      case (kk, None) => spark.conf.unset(kk)
    }
  }

  /** The behavioral states' eviction audit (the r16 X78 discipline on
    * X113–X115's live forms): `k` users each open a funnel / arm a
    * transition gap / register cohort activity, then the watermark
    * sails past every horizon. Healthy = rows_after_evict collapses to
    * ~1 (the watermark-driver key) — state tracks ACTIVE users only,
    * where the r15 NoTimeout forms held `k` rows forever.
    */
  private[graft] def behaviorEviction(spark: SparkSession,
      scales: Seq[Int] = Seq(2000, 20000)): String = {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val us = 1000000L
    def userEvents(mem: MemoryStream[(String, String, Long, Long)]) =
      mem.toDS()
        .select(col("_1").as("user_id"), col("_2").as("event_type"),
          timestamp_micros(col("_3")).as("ts"), col("_4").as("event_id"))
        .withWatermark("ts", "0 seconds")
        .as[graft.streaming.UserEvent]
    def drive(name: String, k: Int,
        build: MemoryStream[(String, String, Long, Long)]
          => org.apache.spark.sql.DataFrame,
        load: Int => Seq[(String, String, Long, Long)]): String = {
      val mem = MemoryStream[(String, String, Long, Long)]
      val q = build(mem).writeStream.format("memory")
        .queryName(s"behavior_evict_$name").outputMode("append").start()
      try {
        val t0 = System.nanoTime()
        mem.addData(load(k))
        q.processAllAvailable()
        val batchSec = (System.nanoTime() - t0) / 1e9
        val peak = q.lastProgress.stateOperators.head.numRowsTotal
        // watermark far past every horizon; follow-up batch fires timers
        mem.addData(Seq(("W", "view", 1000000L * us, -1L)))
        q.processAllAvailable()
        mem.addData(Seq(("W", "view", 1001000L * us, -2L)))
        q.processAllAvailable()
        val after = q.lastProgress.stateOperators.head.numRowsTotal
        f""""$name": {"keys": $k, "state_rows_peak": $peak, "state_rows_after_evict": $after, "sec_load_batch": $batchSec%.2f}"""
      } finally {
        q.stop()
        spark.catalog.dropTempView(s"behavior_evict_$name")
      }
    }
    val blocks = scales.flatMap { k =>
      Seq(
        drive(s"funnel_$k", k,
          m => Stateful.funnelSnapshots(userEvents(m),
            Seq("view", "click", "purchase"), horizonSec = 3600L).toDF(),
          kk => (0 until kk).map(i =>
            (f"U$i%07d", "view", (i % 600 + 1).toLong * us, i.toLong))),
        drive(s"transitions_$k", k,
          m => Stateful.transitionPairs(userEvents(m), maxGapSec = 600L)
            .toDF("u", "f", "t"),
          kk => (0 until kk).flatMap(i => Seq(
            (f"U$i%07d", "view", (i % 600 + 1).toLong * us, 2L * i),
            (f"U$i%07d", "click", ((i % 600) + 11).toLong * us, 2L * i + 1)))),
        drive(s"cohort_$k", k,
          m => Stateful.cohortActivity(m.toDS()
            .select(col("_1").as("user_id"),
              timestamp_micros(col("_3")).as("ts"),
              (col("_3") / lit(86400L * us)).cast("long").as("epoch_day"))
            .withWatermark("ts", "0 seconds")
            .as[graft.streaming.CohortEvent], retentionDays = 1L)
            .toDF("u", "c", "o"),
          kk => (0 until kk).map(i =>
            (f"U$i%07d", "view", (i % 600 + 1).toLong * us, i.toLong))))
    }
    s""""behavior_eviction": {
       |      "what": "X113-X115 live forms under the r16 timeout discipline: k users load state, the watermark passes every horizon (funnel entry+1h, transition 10-min gap, cohort day+1), the follow-up batch fires the timers. Healthy = state_rows_after_evict ~1 (the watermark-driver key): state tracks ACTIVE users, not users-ever-seen",
       |      ${blocks.mkString(",\n      ")}}""".stripMargin
  }

  /** The `state` section of `POSTURE_10X.json`. */
  def section(spark: SparkSession): String = {
    val scales = Seq(("1x", 2000), ("10x", 20000), ("100x", 200000))
    // third op restricted to rocksdb: transformWithState (the Spark 4
    // successor API, engine-rejected on the heap provider) — same EWMA
    // semantics but with an EXPLICIT per-key timer registry, so 200k
    // live keys means 200k registered timers re-armed per batch; this
    // is the measurement that the timer path (not just ValueState)
    // holds at key scale
    val ops: Seq[(String, Set[String], MemoryStream[SensorReading]
        => org.apache.spark.sql.DataFrame)] = Seq(
      ("windowed_agg", Set("heap", "rocksdb"),
        m => Pipeline.watermarkedRollup(m.toDF())),
      ("ewma_state", Set("heap", "rocksdb"), m => {
        val sp = m.toDS().sparkSession
        import sp.implicits._
        Stateful.ewmaAnomalies(m.toDS()).toDF()
      }),
      ("ewma_state_tws", Set("rocksdb"), m => {
        val sp = m.toDS().sparkSession
        import sp.implicits._
        Stateful.ewmaAnomaliesTws(m.toDS()).toDF()
      }))
    val providers = Seq(
      // pin the heap provider explicitly — Map.empty would inherit
      // whatever providerClass the session carries, so a caller built
      // with the production RocksDB conf would silently re-measure
      // RocksDB under the "heap" label and void the comparison
      ("heap", Map("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")),
      // write buffer capped at 1 MB FOR THE MEASUREMENT so the fixture's
      // state sizes (up to ~60 MB at 100x) actually cross the
      // memtable→SST flush boundary and the disk tier shows up in
      // rocks_sst_mb; the production conf (Session.rocksdbStateStore)
      // leaves the 64 MB default, under which this whole fixture would
      // sit in one memtable and the artifact would (misleadingly) show
      // zero SST at every scale
      ("rocksdb", Session.rocksdbStateStore +
        ("spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB" -> "1")))
    val opBlocks = ops.map { case (opName, provFilter, op) =>
      val provBlocks = providers.filter(p => provFilter(p._1))
        .map { case (provName, confs) =>
          val rows = withProvider(spark, confs) {
            scales.map { case (lbl, k) =>
              val m = run(spark, s"${opName}_${provName}_$lbl", k, op)
              f""""$lbl": {"keys": ${m.keys}, "state_rows_peak": ${m.rowsPeak}, "mem_used_mb": ${m.memUsedBytes / 1048576.0}%.2f, "rocks_sst_mb": ${m.sstBytes / 1048576.0}%.2f, "rocks_pinned_mb": ${m.pinnedBytes / 1048576.0}%.2f, "state_rows_after_evict": ${m.rowsAfterEvict}, "sec_batch": ${m.batchSec}%.2f}"""
            }
          }
          s""""$provName": {${rows.mkString(",\n        ")}}"""
        }
      s""""$opName": {
         |      ${provBlocks.mkString(",\n      ")}}""".stripMargin
    }
    s"""  "state": {
       |    "what": "streaming state at 1x/10x/100x KEY cardinality (2k/20k/200k live keys, three loaded batches each), heap-backed default vs RocksDB provider (write buffer capped at 1 MB for the measurement so the fixture crosses the memtable-to-SST flush boundary; production keeps the 64 MB default, under which this whole fixture sits in one memtable), for the reference windowed rollup, the X78 custom EWMA state (flatMapGroupsWithState), and its transformWithState twin (rocksdb-only — the engine rejects TWS on the heap provider; its EXPLICIT per-key timers mean 200k live keys re-arm 200k timers per batch, so this row grades the timer registry at key scale, not just ValueState). Healthy = state_rows_peak proportional to keys on both providers; on heap, mem_used_mb IS executor heap (SizeEstimator over the in-heap version maps) and grows with keys — the GC-death path at 100 TB; on rocksdb, mem_used_mb is NATIVE and GC-exempt (the boundedMemoryUsage SESSION-SHARED cache + memtables, so the absolute figure folds in every store instance the session has touched — compare its conf cap, maxMemoryUsageMB default 500, against executor heap, not the raw number) with overflow carried by rocks_sst_mb on local disk; rocksdb sec_batch at 100x pays the fixture's forced 1 MB flushes, not a provider property; state_rows_after_evict collapses to ~1 once the watermark passes window end / idle timeout (state proportional to ACTIVE keys)",
       |    ${opBlocks.mkString(",\n    ")},
       |    ${behaviorEviction(spark)}}""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Session.local(cpus)
    println(section(spark))
    spark.stop()
  }
}

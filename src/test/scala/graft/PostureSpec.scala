package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.SensorReading
import graft.ops.Skew
import graft.sources.Layout
import graft.streaming.{CusumStream, Stateful}

/** Scale-posture components: partition pruning, skew salting, custom
  * streaming state.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("timeRangeFromMax pushes its range predicate into the parquet scan") {
    // the dynamic-bound form could never push; the two-phase literal form
    // must reach the reader via the raw-nanos twin predicate
    val plan = graft.ops.Scans
      .timeRangeFromMax(graft.sources.Tables.events(spark, "/root/testdata/sf0.001"),
        "ts", "1 DAY", nanosTwin = Some("ts_nanos"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      plan)
  }

  test("day-partitioned layout prunes partitions for day-bounded scans") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/events"
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-02 10:00:00"), 2.0),
      (3L, ts("2024-01-03 10:00:00"), 3.0)
    ).toDF("id", "ts", "v")
    Layout.writeByDay(df, "ts", dir)

    val scan = Layout.scanDays(spark, dir, "2024-01-02", "2024-01-02")
    assert(scan.select("id").as[Long].collect().toSeq === Seq(2L))
    // the day predicate must be a partition filter, not a data filter
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("day"))
  }

  test("pruned scan reads strictly fewer files than a full scan") {
    val dir = Files.createTempDirectory("graft_layout2").toString + "/events"
    val df = (1 to 10).map(i => (i.toLong, ts(f"2024-01-$i%02d 00:00:00"), i.toDouble))
      .toDF("id", "ts", "v")
    Layout.writeByDay(df, "ts", dir)
    def nFiles(d: org.apache.spark.sql.DataFrame): Long =
      d.select(input_file_name()).distinct().count()
    assert(nFiles(Layout.scanDays(spark, dir, "2024-01-03", "2024-01-04")) === 2)
    assert(nFiles(Layout.read(spark, dir)) === 10)
  }
}

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("same-key bucketed tables sort-merge join with zero shuffle exchanges") {
    val a = (1 to 100).map(i => (i % 10, s"a$i")).toDF("k", "va")
    val b = (1 to 50).map(i => (i % 10, i * 1.0)).toDF("k", "vb")
    // clear any stale table locations from an earlier JVM (the in-memory
    // catalog forgets them but the warehouse directories survive)
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("bt_a", "bt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      fs.delete(new org.apache.hadoop.fs.Path(wh, t), true)
    }
    Layout.writeBucketed(a, "bt_a", "k", 4)
    Layout.writeBucketed(b, "bt_b", "k", 4)
    val j = spark.table("bt_a").hint("merge")
      .join(spark.table("bt_b"), "k")
    assert(j.count() === 500) // 10 per a-key × 5 per b-key × 10 keys
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
  }

  test("q_bucketed_join's JOIN runs exchange-free off the bucketed layout") {
    val df = graft.SparkEntry.queries("q_bucketed_join")(
      spark, "/root/testdata/sf0.001")
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("SortMergeJoin"), plan)
    // the only hash exchange allowed is the groupBy(o_orderpriority)
    // re-partition AFTER the join; neither join key is ever shuffled
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
    // bucket pruning rides the same layout: a point predicate on the
    // bucket column plans a scan of exactly ONE of the 8 buckets (the
    // auto-bucketed-scan heuristic turns bucketed reading off for a
    // lone filter, where it sees no exchange to save — force it on so
    // the pruning itself is what's pinned)
    val (li, _) = graft.SparkEntry.bucketedOrdersTables(
      spark, "/root/testdata/sf0.001")
    val autoConf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(autoConf)
    spark.conf.set(autoConf, "false")
    try {
      val point = spark.table(li).filter(col("l_orderkey") === 42L)
      point.collect()
      val pointPlan = point.queryExecution.executedPlan.toString
      assert(pointPlan.contains("SelectedBucketsCount: 1 out of 8"), pointPlan)
    } finally spark.conf.set(autoConf, prev)

    // and the layout is invisible in the result: equals the plain join
    val plain = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .join(graft.sources.Tables.orders(spark, "/root/testdata/sf0.001"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("o_orderpriority")
    assert(df.collect().toSeq === plain.collect().toSeq)
  }
}

class BandingReuseSpec extends SparkSpec {

  test("LSH banding self-joins materialize the signature pipeline exactly once") {
    // the broadcast self-join regression: without the shuffle_hash hint
    // each side recomputed scan→shingle/bucket→agg, doubling the most
    // expensive stage — the final adaptive plan must show ONE parquet
    // scan and a ReusedExchange on the build side
    for (name <- Seq("q_simhash_candidates", "q_minhash_candidates",
        "q_embed_neardup", "q_embed_neardup_srp", "q_semdedup")) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect() // finalize the adaptive plan; reuse only shows there
      val finalPlan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(finalPlan.contains("ReusedExchange"), s"$name:\n$finalPlan")
      val nScans = "FileScan parquet".r.findAllIn(finalPlan).length
      assert(nScans === 1, s"$name executed $nScans document scans:\n$finalPlan")
    }
  }

  test("parameter audits join the signature frame twice but compute it once") {
    // the audits join sigs on d1 AND d2: the two identical id-partitioned
    // exchanges must collapse into one (shuffle_hash hint), leaving two
    // scans total — the exact-jaccard lineage and ONE signature lineage
    for (name <- Seq("q_minhash_estimate", "q_simhash_audit")) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect()
      val finalPlan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(finalPlan.contains("ReusedExchange"), s"$name:\n$finalPlan")
      val nScans = "FileScan parquet".r.findAllIn(finalPlan).length
      assert(nScans === 2, s"$name executed $nScans document scans:\n$finalPlan")
    }
  }

  test("incremental ingest dedup scans each input once: batch exchange reused across BOTH joins") {
    // the batch side appears three times (both sides of the self-join +
    // the probe side of the corpus join) but its identical banded
    // exchange is computed once and reused — the final plan holds ONE
    // batch scan + ONE corpus scan (an old-old self-join would show as
    // an extra scan + pair explosion)
    val df = SparkEntry.queries("q_dedup_incremental")(spark,
      "/root/testdata/sf0.001")
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(finalPlan.contains("ReusedExchange"), finalPlan)
    val nScans = "FileScan parquet".r.findAllIn(finalPlan).length
    assert(nScans === 2, s"executed $nScans document scans:\n$finalPlan")
  }
}

class CurationPostureSpec extends SparkSpec {

  test("near-dup resolution anti-joins a BROADCAST drop set — the corpus is never shuffled") {
    val df = SparkEntry.queries("q_neardup_resolve")(spark, "/root/testdata/sf0.001")
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(finalPlan.contains("BroadcastHashJoin") &&
      finalPlan.contains("LeftAnti"), finalPlan)
    // the corpus-side scan feeds the join directly, no exchange between
    val corpusSide = finalPlan.split("BroadcastExchange").head
    assert(!corpusSide.contains("Exchange hashpartitioning"), finalPlan)
  }

  test("sequence packing shuffles ONCE, on the shard key") {
    val df = SparkEntry.queries("q_seq_pack")(spark, "/root/testdata/sf0.001")
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val nEx = "Exchange hashpartitioning".r.findAllIn(finalPlan).length
    assert(nEx === 1, s"expected exactly 1 exchange:\n$finalPlan")
    assert(finalPlan.contains("hashpartitioning(source"), finalPlan)
  }

  test("the composed curation pipeline shuffles exactly twice: fingerprint + split") {
    val df = SparkEntry.queries("q_curation_full")(spark, "/root/testdata/sf0.001")
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val keys = "Exchange hashpartitioning\\(\\w+".r.findAllIn(finalPlan).toSeq
    assert(keys.size === 2, s"expected 2 exchanges, got $keys:\n$finalPlan")
    assert(keys.exists(_.endsWith("(fp")) && keys.exists(_.endsWith("(split")),
      keys.toString)
  }

  test("quality rules are one narrow scan: no shuffle, pruned read schema") {
    val df = SparkEntry.queries("q_quality_rules")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
  }

  test("BM25 and SQ8 scoring passes are shuffle-free TakeOrderedAndProject plans") {
    // both fold their eager corpus stats in as literals, so the scoring
    // pass must be scan → narrow projection → TakeOrderedAndProject with
    // no hash exchange anywhere (the stats pass is a separate 1-row job)
    for (name <- Seq("q_bm25_topk", "q_ann_sq8")) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"), s"$name:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"), s"$name:\n$plan")
    }
  }
}

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows on skewed data") {
    // 90% of big rows share one hot key
    val big = (1 to 1000).map(i =>
      (i.toLong, if (i <= 900) "hot" else s"k${i % 7}", i * 1.0))
      .toDF("id", "k", "v")
    val small = Seq(("hot", 100.0), ("k1", 1.0), ("k2", 2.0), ("k3", 3.0))
      .toDF("k", "w")
    val plain = big.join(small, Seq("k")).select("id", "k", "v", "w")
    val salted = Skew.saltedJoin(big, small, "k", "id", nSalts = 8)
      .select("id", "k", "v", "w")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  private def r(t: String, temp: Double, sensor: String = "S1") =
    SensorReading(sensor, "loc", ts(t), temp, 50.0, 1000.0)

  test("per-sensor delta state persists across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SensorReading]
    val q = Stateful.deltas(mem.toDS()).writeStream
      .format("memory").queryName("delta_test").outputMode("append").start()
    try {
      mem.addData(r("2024-01-01 00:00:00", 20.0), r("2024-01-01 00:01:00", 22.5))
      q.processAllAvailable()
      mem.addData(r("2024-01-01 00:02:00", 21.0)) // new batch, state carries
      mem.addData(r("2024-01-01 00:00:30", 5.0, sensor = "S2")) // other key
      q.processAllAvailable()
      val out = spark.table("delta_test").as[graft.streaming.DeltaReading]
        .collect().sortBy(d => (d.sensor_id, d.timestamp.getTime))
      val s1 = out.filter(_.sensor_id == "S1")
      assert(s1.map(_.delta) === Seq(None, Some(2.5), Some(-1.5)))
      assert(s1(2).gap_seconds === Some(60.0)) // across the batch boundary
      val s2 = out.filter(_.sensor_id == "S2")
      assert(s2.map(_.delta) === Seq(None)) // fresh key, fresh state
    } finally q.stop()
  }

  test("ewmaAnomalies: EWMA chain, anomaly verdicts, and timeout-evicted offline marker") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SensorReading]
    val q = Stateful.ewmaAnomalies(mem.toDS(), alpha = 0.5, threshold = 5.0,
        watermark = "10 minutes", idleMs = 30 * 60 * 1000L)
      .writeStream
      .format("memory").queryName("ewma_test").outputMode("append").start()
    try {
      // batch 1: A establishes a baseline; B reports once then goes silent
      mem.addData(
        r("2024-01-01 00:00:00", 20.0, sensor = "A"),
        r("2024-01-01 00:01:00", 22.0, sensor = "A"),
        r("2024-01-01 00:00:30", 10.0, sensor = "B"))
      q.processAllAvailable()
      // batch 2: A spikes (anomaly vs EWMA 21.0) and advances the
      // watermark far past B's idle horizon (00:30:30)
      mem.addData(r("2024-01-01 02:00:00", 40.0, sensor = "A"))
      q.processAllAvailable()
      // batch 3: timeouts fire in the batch AFTER the watermark moved
      mem.addData(r("2024-01-01 02:01:00", 40.0, sensor = "A"))
      q.processAllAvailable()

      val out = spark.table("ewma_test").as[graft.streaming.EwmaReading]
        .collect().sortBy(e => (e.sensor_id, e.timestamp.getTime))
      val a = out.filter(_.sensor_id == "A")
      // EWMA chain at α=0.5: 20 → 21 → 30.5 → 35.25; deviations vs the
      // PRE-update EWMA: 0, 2, 19, 9.5 — both spikes flagged
      assert(a.map(_.ewma) === Seq(20.0, 21.0, 30.5, 35.25))
      assert(a.map(_.is_anomaly) === Seq(false, false, true, true),
        a.map(e => (e.deviation, e.is_anomaly)).mkString(", "))
      assert(a.forall(!_.went_offline))
      // B: one reading, then exactly one terminal offline marker carrying
      // its last event time and final EWMA — and its state is gone
      val b = out.filter(_.sensor_id == "B")
      assert(b.map(_.went_offline) === Seq(false, true))
      assert(b(1).timestamp === ts("2024-01-01 00:00:30"))
      assert(b(1).ewma === 10.0)
    } finally q.stop()
  }

  test("ewmaAnomalies: a row behind the watermark is dropped before the operator — no state, no marker") {
    // the engine pre-filters late input for event-time-timeout stateful
    // ops, so a fully-late key can neither corrupt the EWMA chain nor
    // arm a past-dated timeout (the idleTimeoutAt clamp stays as
    // defense-in-depth behind this engine behavior, not instead of it)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SensorReading]
    val q = Stateful.ewmaAnomalies(mem.toDS(), alpha = 0.5, threshold = 5.0,
        watermark = "10 minutes", idleMs = 60 * 1000L)
      .writeStream
      .format("memory").queryName("ewma_clamp").outputMode("append").start()
    try {
      mem.addData(
        r("2024-01-01 00:00:00", 20.0, sensor = "A"),
        r("2024-01-01 01:00:00", 21.0, sensor = "A")) // watermark → 00:50
      q.processAllAvailable()
      // C's only row (00:45) is behind the 00:50 watermark
      mem.addData(r("2024-01-01 00:45:00", 10.0, sensor = "C"))
      q.processAllAvailable()
      mem.addData(r("2024-01-01 02:00:00", 21.0, sensor = "A"))
      q.processAllAvailable()
      mem.addData(r("2024-01-01 02:01:00", 21.0, sensor = "A"))
      q.processAllAvailable()
      val out = spark.table("ewma_clamp").as[graft.streaming.EwmaReading]
        .collect()
      // C never existed as far as state is concerned: no reading row,
      // and no offline marker either (nothing was ever armed)
      assert(!out.exists(_.sensor_id == "C"), out.mkString(", "))
      assert(out.count(_.sensor_id == "A") === 4)
    } finally q.stop()
  }

  test("ewmaAnomaliesTws (transformWithState) reproduces the flatMapGroupsWithState semantics") {
    // transformWithState requires the RocksDB provider; scope it to this
    // query and restore after
    val confs = graft.Session.rocksdbStateStore
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[SensorReading]
      val q = Stateful.ewmaAnomaliesTws(mem.toDS(), alpha = 0.5,
          threshold = 5.0, watermark = "10 minutes",
          idleMs = 30 * 60 * 1000L)
        .writeStream
        .format("memory").queryName("ewma_tws").outputMode("append").start()
      try {
        // the exact scenario the flatMapGroupsWithState spec pins
        mem.addData(
          r("2024-01-01 00:00:00", 20.0, sensor = "A"),
          r("2024-01-01 00:01:00", 22.0, sensor = "A"),
          r("2024-01-01 00:00:30", 10.0, sensor = "B"))
        q.processAllAvailable()
        mem.addData(r("2024-01-01 02:00:00", 40.0, sensor = "A"))
        q.processAllAvailable()
        mem.addData(r("2024-01-01 02:01:00", 40.0, sensor = "A"))
        q.processAllAvailable()
        val out = spark.table("ewma_tws").as[graft.streaming.EwmaReading]
          .collect().sortBy(e => (e.sensor_id, e.timestamp.getTime))
        val a = out.filter(_.sensor_id == "A")
        assert(a.map(_.ewma) === Seq(20.0, 21.0, 30.5, 35.25))
        assert(a.map(_.is_anomaly) === Seq(false, false, true, true))
        val b = out.filter(_.sensor_id == "B")
        assert(b.map(_.went_offline) === Seq(false, true))
        assert(b(1).timestamp === ts("2024-01-01 00:00:30"))
        assert(b(1).ewma === 10.0)
      } finally q.stop()
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ewmaAnomalies rejects degenerate smoothing/idle configs") {
    val ds = Seq(r("2024-01-01 00:00:00", 1.0)).toDS()
    intercept[IllegalArgumentException] {
      Stateful.ewmaAnomalies(ds, alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Stateful.ewmaAnomalies(ds, idleMs = 0L)
    }
  }

  test("CusumStream.monitor replays the batch CUSUM exactly across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // level shift at minute 20 (the DriftSpec fixture): κ=5, h=50 →
    // upward alarm at minute 23
    val rows = ((0 until 20).map(i => ("cp", t(i), 10.0, i.toLong)) ++
      (20 until 40).map(i => ("cp", t(i), 30.0, i.toLong)) ++
      (0 until 40).map(i => ("flat", t(i), 10.0, 100L + i))).toVector
    val df = rows.toDF("g", "ts", "v", "id")
    val batch = graft.ops.Drift.cusumChangepoint(
        df, "g", "ts", "v", "id", h = 50.0, slack = 5.0)
      .as[(String, Long, Long, Double, Double, Double,
        Option[java.sql.Timestamp], Option[java.sql.Timestamp])]
      .collect().map(r => r._1 -> r).toMap
    val bl = graft.ops.Drift.cusumBaselines(df, "g", "ts", "v")
      .as[(String, Long, Long)].collect()
      .map { case (k, n0, s0) => k -> (n0, s0) }.toMap
    val mem = MemoryStream[(String, Long, Long, Long)]
    val q = CusumStream.monitor(mem.toDS(), bl,
        math.round(50.0 * 1e6), math.round(5.0 * 1e6))
      .writeStream.format("memory").queryName("cusum_stream_test")
      .outputMode("append").start()
    try {
      def tup(r: (String, java.sql.Timestamp, Double, Long)) =
        (r._1, r._2.getTime * 1000L, math.round(r._3 * 1e6), r._4)
      // three ragged time-split batches — boundaries must be invisible
      Seq(rows.take(25), rows.slice(25, 41), rows.drop(41)).foreach { b =>
        mem.addData(b.map(tup)); q.processAllAvailable()
      }
      val latest = spark.table("cusum_stream_test")
        .as[graft.streaming.CusumSnapshot].collect()
        .groupBy(_.key).map { case (k, xs) => k -> xs.maxBy(_.n) }
      latest.foreach { case (k, s) =>
        val (n0, _) = bl(k)
        val b = batch(k)
        assert(s.n === b._2, s"$k n")
        assert(s.maxUp.toDouble / (n0 * 1e6) === b._5, s"$k maxUp")
        assert(s.maxDn.toDouble / (n0 * 1e6) === b._6, s"$k maxDn")
        assert(s.alarmUpUs ===
          b._7.map(_.getTime * 1000L).getOrElse(-1L), s"$k alarmUp")
        assert(s.alarmDnUs ===
          b._8.map(_.getTime * 1000L).getOrElse(-1L), s"$k alarmDn")
      }
      assert(latest.keySet === Set("cp", "flat"))
    } finally q.stop()
  }

  test("kllSnapshots: sketch state accumulates across micro-batches; latest snapshot within bound") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val q = Stateful.kllSnapshots(mem.toDS(), k = 64).writeStream
      .format("memory").queryName("kll_snap_test").outputMode("append").start()
    // deterministic value stream, delivered as three batches per key
    var x = 99L
    def nextV(): Double = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (x & 0xffffffL).toDouble / 1000.0
    }
    val all = Vector.fill(3)(Vector.fill(400)(nextV()))
    try {
      all.foreach { batch =>
        mem.addData(batch.map(v => ("a", v)) ++ batch.take(50).map(v => ("b", v)))
        q.processAllAvailable()
      }
      val snaps = spark.table("kll_snap_test")
        .as[graft.streaming.KllSnapshot].collect()
      // one snapshot per key per batch it received data in, n monotone
      val aNs = snaps.filter(_.key == "a").map(_.sketch.n).sorted
      assert(aNs === Seq(400L, 800L, 1200L))
      assert(snaps.filter(_.key == "b").map(_.sketch.n).sorted === Seq(50L, 100L, 150L))
      // latest per key = argmax n; its quantiles sit inside the sketch's
      // own guaranteed (order-independent) bound vs the exact ranks
      val latest = snaps.filter(_.key == "a").maxBy(_.sketch.n).sketch
      val exact = all.flatten.sorted
      val err = graft.ops.Kll.errBound(latest)
      for (p <- Seq(0.25, 0.5, 0.75)) {
        val t = math.ceil(p * 1200).toLong
        val rk = exact.count(_ <= graft.ops.Kll.quantile(latest, p)).toLong
        assert(math.abs(rk - t) <= err, s"p=$p outside bound after 3 batches")
      }
      assert(latest.minV === exact.head && latest.maxV === exact.last)
    } finally q.stop()
  }

  /** (user, type, tsMicros, id) tuples → the watermarked UserEvent
    * stream the behavioral states consume (event-time timeouts
    * require the watermark even when unbounded).
    */
  private def userEvents(mem: MemoryStream[(String, String, Long, Long)]) =
    mem.toDS()
      .select(col("_1").as("user_id"), col("_2").as("event_type"),
        timestamp_micros(col("_3")).as("ts"), col("_4").as("event_id"))
      .withWatermark("ts", "0 seconds")
      .as[graft.streaming.UserEvent]

  /** (user, epochDay) tuples → the watermarked CohortEvent stream. */
  private def cohortEvents(mem: MemoryStream[(String, Long)]) =
    mem.toDS()
      .select(col("_1").as("user_id"),
        timestamp_seconds(col("_2") * 86400L).as("ts"),
        col("_2").as("epoch_day"))
      .withWatermark("ts", "0 seconds")
      .as[graft.streaming.CohortEvent]

  test("funnelSnapshots: in-order ragged batches reproduce the batch funnel exactly") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Long)]
    val steps = Seq("view", "click", "purchase")
    val q = Stateful.funnelSnapshots(userEvents(mem), steps, horizonSec = 3600L)
      .writeStream.format("memory").queryName("funnel_snap_test")
      .outputMode("append").start()
    val us = 1000000L
    // u1 converts across batch boundaries; u2 has click-before-view;
    // u3's click lands outside the horizon; u4 purchases between view
    // and click (wrong order — must not convert)
    val all = Seq(
      ("u1", "view", 1000L * us, 1L), ("u2", "click", 1100L * us, 2L),
      ("u2", "view", 1200L * us, 3L), ("u3", "view", 1300L * us, 4L),
      ("u4", "view", 1400L * us, 5L),
      // --- batch 2 ---
      ("u1", "click", 2000L * us, 6L), ("u4", "purchase", 2100L * us, 7L),
      ("u4", "click", 2200L * us, 8L),
      // --- batch 3 ---
      ("u1", "purchase", 3000L * us, 9L),
      ("u3", "click", (1300L + 3700L) * us, 10L)) // past the 3600 s horizon
    try {
      Seq(all.take(5), all.slice(5, 8), all.drop(8)).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      val latest = spark.table("funnel_snap_test")
        .as[graft.streaming.FunnelSnapshot].collect()
        .groupBy(_.key).map { case (k, v) => k -> v.maxBy(_.n).times }
      assert(latest("u1") === Seq(1000L * us, 2000L * us, 3000L * us))
      assert(latest("u2") === Seq(1200L * us)) // pre-entry click ignored
      assert(latest("u3") === Seq(1300L * us)) // horizon cut
      assert(latest("u4") === Seq(1400L * us, 2200L * us)) // wrong-order purchase ignored
      // the rollup matches the batch operator on the same rows
      val batchDf = all.map { case (u, t, ts, id) =>
        (u, t, new java.sql.Timestamp(ts / 1000L), id) }
        .toDF("user_id", "event_type", "ts", "event_id")
      val batch = graft.ops.Behavior.funnel(batchDf, "user_id",
        "event_type", "ts", steps, 3600L)
        .orderBy("step_idx").collect()
        .map(r => (r.getLong(2), r.getDouble(3))).toSeq
      val streamed = steps.zipWithIndex.map { case (_, i) =>
        val reached = latest.values.filter(_.length > i)
        (reached.size.toLong,
          reached.map(t => t(i) - t.head).sum.toDouble /
            (reached.size * 1000000.0))
      }
      assert(streamed === batch)
    } finally q.stop()
  }

  test("transitionPairs: pairs form across batch boundaries from O(1) state; none across users") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Long)]
    val q = Stateful.transitionPairs(userEvents(mem))
      .toDF("u", "from", "to")
      .writeStream.format("memory").queryName("trans_pairs_test")
      .outputMode("append").start()
    try {
      // batch 1: u1 view→click forms in-batch; u2 single event, no pair
      mem.addData(Seq(("u1", "view", 10L, 1L), ("u1", "click", 20L, 2L),
        ("u2", "purchase", 30L, 3L)))
      q.processAllAvailable()
      // batch 2: u1's purchase pairs with the STORED click (cross-batch);
      // u2's view pairs with the stored purchase; same-ts id tiebreak
      mem.addData(Seq(("u1", "purchase", 40L, 4L),
        ("u2", "view", 50L, 5L), ("u2", "error", 50L, 6L)))
      q.processAllAvailable()
      val got = spark.table("trans_pairs_test")
        .as[(String, String, String)].collect().sorted.toSeq
      assert(got === Seq(
        ("u1", "click", "purchase"), ("u1", "view", "click"),
        ("u2", "purchase", "view"), ("u2", "view", "error")))
    } finally q.stop()
  }

  test("cohortActivity: one emission per (user, offset); cohort fixed by first batch; duplicates silent") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = Stateful.cohortActivity(cohortEvents(mem))
      .toDF("u", "cohort", "off")
      .writeStream.format("memory").queryName("cohort_act_test")
      .outputMode("append").start()
    try {
      // batch 1: u1 first seen day 100 (emits off 0), also day 101
      mem.addData(Seq(("u1", 100L), ("u1", 101L), ("u2", 100L)))
      q.processAllAvailable()
      // batch 2: u1 day 101 AGAIN (silent), new day 102; u2 day 103
      mem.addData(Seq(("u1", 101L), ("u1", 102L), ("u2", 103L)))
      q.processAllAvailable()
      val got = spark.table("cohort_act_test")
        .as[(String, Long, Long)].collect().sorted.toSeq
      assert(got === Seq(
        ("u1", 100L, 0L), ("u1", 100L, 1L), ("u1", 100L, 2L),
        ("u2", 100L, 0L), ("u2", 100L, 3L)))
    } finally q.stop()
  }

  /** State rows in the last completed micro-batch of `q` — the direct
    * observation that eviction actually REMOVED store rows (not just
    * that emissions look right).
    */
  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.filter(_.stateOperators.nonEmpty)
      .last.stateOperators.head.numRowsTotal

  test("funnelSnapshots eviction: horizon passage emits the terminal snapshot, frees state, and a second funnel never outranks the first") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Long)]
    val q = Stateful.funnelSnapshots(userEvents(mem),
        Seq("view", "click", "purchase"), horizonSec = 3600L)
      .writeStream.format("memory").queryName("funnel_evict_test")
      .outputMode("append").start()
    val us = 1000000L
    try {
      // u1 enters at t=1000 s; horizon ends 4600 s
      mem.addData(Seq(("u1", "view", 1000L * us, 1L)))
      q.processAllAvailable()
      // watermark → 10000 s (past u1's horizon) via another key; the
      // watermark-change follow-up batch fires u1's timeout
      mem.addData(Seq(("ux", "view", 10000L * us, 2L)))
      q.processAllAvailable()
      // ux advances INSIDE its own horizon (13600 s) so only u1 evicts
      mem.addData(Seq(("ux", "click", 12000L * us, 3L)))
      q.processAllAvailable()
      val afterEvict = spark.table("funnel_evict_test")
        .as[graft.streaming.FunnelSnapshot].collect()
      val term = afterEvict.filter(s => s.key == "u1" && s.n == Long.MaxValue)
      assert(term.length === 1, "exactly one terminal snapshot on eviction")
      assert(term.head.times === Seq(1000L * us), "frozen at the horizon")
      // state freed: only ux (live funnel from its view) remains stored
      assert(stateRows(q) === 1L)
      // a post-eviction SECOND u1 funnel emits small-n snapshots only;
      // the consumer rule (argmax n, then earliest entry) still answers
      // with the FIRST funnel — eviction is GC, not a semantic knob
      mem.addData(Seq(("u1", "view", 30000L * us, 4L)))
      q.processAllAvailable()
      val snaps = spark.table("funnel_evict_test")
        .as[graft.streaming.FunnelSnapshot].collect().filter(_.key == "u1")
      val latest = snaps.maxBy(s => (s.n, -s.times.head))
      assert(latest.times === Seq(1000L * us))
    } finally q.stop()
  }

  test("funnelSnapshotsTws: the explicit-timer twin reproduces the fMGWS eviction semantics under RocksDB") {
    implicit val sqlCtx = spark.sqlContext
    StatePosture.withProvider(spark, Session.rocksdbStateStore) {
      val mem = MemoryStream[(String, String, Long, Long)]
      val q = Stateful.funnelSnapshotsTws(userEvents(mem),
          Seq("view", "click", "purchase"), horizonSec = 3600L)
        .writeStream.format("memory").queryName("funnel_tws_test")
        .outputMode("append").start()
      val us = 1000000L
      try {
        mem.addData(Seq(("u1", "view", 1000L * us, 1L)))
        q.processAllAvailable()
        // u2 converts in one batch: state cleared, timer deleted — the
        // stale-timer guard path is exactly what must NOT emit later
        mem.addData(Seq(("u2", "view", 1500L * us, 2L),
          ("u2", "click", 1600L * us, 3L),
          ("u2", "purchase", 1700L * us, 4L)))
        q.processAllAvailable()
        // watermark past u1's horizon (4600 s); follow-up fires the timer
        mem.addData(Seq(("ux", "view", 10000L * us, 5L)))
        q.processAllAvailable()
        mem.addData(Seq(("ux", "click", 12000L * us, 6L)))
        q.processAllAvailable()
        val snaps = spark.table("funnel_tws_test")
          .as[graft.streaming.FunnelSnapshot].collect()
        val termU1 = snaps.filter(s => s.key == "u1" && s.n == Long.MaxValue)
        assert(termU1.length === 1 && termU1.head.times === Seq(1000L * us))
        // exactly one terminal for converted u2 (no stale-timer double)
        assert(snaps.count(s => s.key == "u2" && s.n == Long.MaxValue) === 1)
        assert(stateRows(q) === 1L, "only ux's live funnel remains stored")
      } finally q.stop()
    }
  }

  test("transitionPairs eviction: session gap drops the pair in any interleaving and idle keys leave the store") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, Long)]
    val q = Stateful.transitionPairs(userEvents(mem), maxGapSec = 100L)
      .toDF("u", "from", "to")
      .writeStream.format("memory").queryName("trans_evict_test")
      .outputMode("append").start()
    val us = 1000000L
    try {
      // in-gap pair forms; ux is a watermark driver (gaps always > 100 s)
      mem.addData(Seq(("u1", "A", 10L * us, 1L), ("u1", "B", 50L * us, 2L)))
      q.processAllAvailable()
      // 150 s silence: session boundary — NO pair, state re-arms
      mem.addData(Seq(("u1", "C", 200L * us, 3L), ("ux", "D", 500L * us, 4L)))
      q.processAllAvailable()
      // watermark 500 s passes u1's timeout (200+100+ε) → u1 evicted
      mem.addData(Seq(("ux", "D", 1000L * us, 5L)))
      q.processAllAvailable()
      assert(stateRows(q) === 1L, "idle u1 evicted; only ux remains")
      // post-eviction event forms no pair — its would-be gap (900 s)
      // exceeds maxGap anyway: eviction timing cannot change the output
      mem.addData(Seq(("u1", "E", 1100L * us, 6L)))
      q.processAllAvailable()
      val got = spark.table("trans_evict_test")
        .as[(String, String, String)].collect().sorted.toSeq
      assert(got === Seq(("u1", "A", "B")))
    } finally q.stop()
  }

  test("cohortActivity eviction: dormancy past the retention horizon re-enters the user as a NEW cohort; aged keys leave the store") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = Stateful.cohortActivity(cohortEvents(mem), retentionDays = 5L)
      .toDF("u", "cohort", "off")
      .writeStream.format("memory").queryName("cohort_evict_test")
      .outputMode("append").start()
    try {
      // u1 cohort day 100, active day 103 (offset 3 ≤ 5)
      mem.addData(Seq(("u1", 100L), ("u1", 103L)))
      q.processAllAvailable()
      // day 110 is offset 10 > 5 → RESET to a new cohort at 110
      mem.addData(Seq(("u1", 110L), ("u2", 111L)))
      q.processAllAvailable()
      // watermark → day 130; u1 horizon (116) and u2's (117) both passed
      mem.addData(Seq(("ux", 130L)))
      q.processAllAvailable()
      mem.addData(Seq(("ux", 131L)))
      q.processAllAvailable()
      assert(stateRows(q) === 1L, "aged u1/u2 evicted; only ux remains")
      // post-eviction activity re-creates exactly the reset path's
      // state (day 132: strictly past the watermark — a row AT the
      // watermark is dropped as late, the same contract as production)
      mem.addData(Seq(("u1", 132L)))
      q.processAllAvailable()
      val got = spark.table("cohort_evict_test")
        .as[(String, Long, Long)].collect().sorted.toSeq
      assert(got === Seq(
        ("u1", 100L, 0L), ("u1", 100L, 3L), ("u1", 110L, 0L),
        ("u1", 132L, 0L),
        ("u2", 111L, 0L),
        ("ux", 130L, 0L), ("ux", 130L, 1L)))
    } finally q.stop()
  }

  test("kllWindowedSnapshots: trailing window evicts old buckets, drift ages out of the KS read, idle keys leave the store") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.{Kll, KllBuf}
    val mem = MemoryStream[(String, Long, Double)] // (key, tsSec, v)
    val stream = mem.toDS()
      .select(col("_1").as("key"), timestamp_seconds(col("_2")).as("ts"),
        col("_3").as("v"))
      .withWatermark("ts", "0 seconds")
      .as[graft.streaming.KeyedReading]
    val q = Stateful.kllWindowedSnapshots(stream, k = 64,
        bucketSec = 100L, windowBuckets = 2)
      .writeStream.format("memory").queryName("kll_win_test")
      .outputMode("append").start()
    def ks(a: KllBuf, b: KllBuf): Double = {
      val pts = (Kll.weighted(a).map(_._1) ++ Kll.weighted(b).map(_._1))
        .distinct
      pts.map(x => math.abs(Kll.rank(a, x).toDouble / a.n -
        Kll.rank(b, x).toDouble / b.n)).max
    }
    val baseline = (0 until 100).foldLeft(Kll.empty(64)) {
      (s, i) => Kll.update(s, i.toDouble) }
    try {
      // bucket 0: a SHIFTED segment (drift vs baseline)
      mem.addData((0 until 100).map(i => ("a", i.toLong, 1000.0 + i)))
      q.processAllAvailable()
      // buckets 1 and 2: back in-distribution — bucket 0 must age out
      mem.addData((0 until 100).map(i => ("a", 100L + i, i.toDouble)))
      q.processAllAvailable()
      mem.addData((0 until 100).map(i => ("a", 200L + i, i.toDouble)))
      q.processAllAvailable()
      val snaps = spark.table("kll_win_test")
        .as[graft.streaming.KllWinSnapshot].collect()
        .filter(_.key == "a").sortBy(_.n)
      // the trailing window never holds more than windowBuckets buckets
      assert(snaps.map(_.buckets.toList) ===
        Seq(List(0L), List(0L, 1L), List(1L, 2L)))
      // drift while the shifted bucket is live; gone once it ages out
      assert(ks(baseline, snaps(0).sketch) > 0.9)
      assert(ks(baseline, snaps(2).sketch) <=
        Kll.errBound(baseline).toDouble / baseline.n +
        Kll.errBound(snaps(2).sketch).toDouble / snaps(2).sketch.n + 1e-9,
        "shifted segment aged out: KS back inside the sketch envelope")
      assert(snaps(2).sketch.n === 200L)
      // idle-key eviction: watermark far past a's horizon frees its state
      mem.addData(Seq(("w", 1000L, 1.0)))
      q.processAllAvailable()
      mem.addData(Seq(("w", 1100L, 2.0)))
      q.processAllAvailable()
      assert(stateRows(q) === 1L, "idle key a evicted; only w remains")
    } finally q.stop()
  }

  test("seasonalSnapshots: integer hour cells accumulate across ragged batches; state stays <= 24 cells per key") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, Long)]
    val q = Stateful.seasonalSnapshots(mem.toDS())
      .writeStream.format("memory").queryName("seasonal_snap_test")
      .outputMode("append").start()
    try {
      // batch 1: hour 3 twice, hour 7 once; batch 2: hour 3 again +
      // every other hour once (24-cell ceiling exercised)
      mem.addData(Seq(("a", 3, 1000000L), ("a", 3, 3000000L),
        ("a", 7, 2000000L)))
      q.processAllAvailable()
      mem.addData((0 until 24).map(h => ("a", h, 1000000L * (h + 1))))
      q.processAllAvailable()
      val snaps = spark.table("seasonal_snap_test")
        .as[graft.streaming.SeasonalSnapshot].collect().sortBy(_.n)
      assert(snaps.map(_.n).toSeq === Seq(3L, 27L))
      val latest = snaps.last
      assert(latest.cells.length === 24) // bounded regardless of rows
      val h3 = latest.cells.find(_.hour == 3).get
      // exact integer partials: 1 + 3 + 4 (micro-million units)
      assert(h3.n === 3L && h3.s1 === 8000000L)
      assert(BigInt(h3.s2) ===
        BigInt(1000000L) * 1000000L + BigInt(3000000L) * 3000000L +
        BigInt(4000000L) * 4000000L)
    } finally q.stop()
  }

  test("kmvSnapshots: streamed bottom-k state is EXACTLY the batch sketch (order-independent set)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = Stateful.kmvSnapshots(mem.toDS(), k = 16).writeStream
      .format("memory").queryName("kmv_snap_test").outputMode("append").start()
    // 300 items over ~80 distinct values (> k), ragged batches, duplicates
    var x = 3L
    def nextItem(): String = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      s"u_${(x & 0x7fffffffL) % 80}"
    }
    val batches = Vector(Vector.fill(120)(nextItem()),
      Vector.fill(9)(nextItem()), Vector.fill(171)(nextItem()))
    try {
      batches.foreach { b => mem.addData(b.map(("g", _))); q.processAllAvailable() }
      val snaps = spark.table("kmv_snap_test")
        .as[graft.streaming.KmvSnapshot].collect()
      assert(snaps.map(_.n).sorted === Seq(120L, 129L, 300L))
      val latest = snaps.maxBy(_.n)
      // batch twin on the SAME rows: identical array, not just close
      val batch = graft.ops.Sketches.kmvSketch(
        batches.flatten.map(("g", _)).toDF("g", "item"),
        Seq("g"), "item", k = 16)
        .select("kmv").as[Seq[Long]].head()
      assert(latest.ks === batch)
      assert(latest.ks.length === 16)
      assert(latest.ks === latest.ks.sorted)
    } finally q.stop()
  }

  test("mgSnapshots: MG state accumulates across ragged batches; window holds vs exact counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = Stateful.mgSnapshots(mem.toDS(), k = 8).writeStream
      .format("memory").queryName("mg_snap_test").outputMode("append").start()
    // skewed item stream (item_i ~ 1/i head), cardinality >> k=8,
    // delivered as three ragged batches
    var x = 7L
    def nextItem(): String = {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      val u = ((x & 0xffffffL).toDouble + 1.0) / 16777217.0
      s"item_${math.min(200, math.max(1, math.exp(u * math.log(200.0)).toInt))}"
    }
    val batches = Vector(Vector.fill(500)(nextItem()),
      Vector.fill(37)(nextItem()), Vector.fill(800)(nextItem()))
    try {
      batches.foreach { b => mem.addData(b.map(("g", _))); q.processAllAvailable() }
      val snaps = spark.table("mg_snap_test")
        .as[graft.streaming.MgSnapshot].collect()
      // n strictly increasing per batch (latest = argmax n)
      assert(snaps.map(_.sketch.n).sorted === Seq(500L, 537L, 1337L))
      val latest = snaps.maxBy(_.sketch.n).sketch
      assert(latest.keys.length <= 8)
      // the two-sided window vs exact counts of everything streamed —
      // order-independent, so batch boundaries cannot break it
      val f = batches.flatten.groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
      for ((item, cnt) <- f) {
        val est = graft.ops.Freq.estimate(latest, item)
        assert(est <= cnt, s"$item overestimated: $est > $cnt")
        assert(est * 9 >= cnt * 9 - 1337L, s"$item below window: $est vs $cnt")
      }
    } finally q.stop()
  }
}

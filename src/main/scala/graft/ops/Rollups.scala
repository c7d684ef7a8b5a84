package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Group-by and global statistical aggregations (SURVEY.md §2.4 A3-A12).
  *
  * All are single-pass hash aggregations: Spark plans partial (map-side)
  * + final aggregation around one shuffle on the grouping key, so the
  * full fact table never moves — only per-group partial states do. That
  * is the property that keeps these correct-and-fast at 100 TB.
  *
  * Mirrors the pandas analytics layer of the reference
  * (reference/streamlit_dashboard.py:450-456,555-558,632-665;
  * reference/app.py:404,465-483).
  */
object Rollups {

  /** Per-group mean + count (reference/streamlit_dashboard.py:555-558). */
  def groupMean(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(round(avg(valueCol), 6).as(s"avg_$valueCol"),
        count(lit(1)).as("n"))

  /** Per-group multi-aggregate with deterministic "first"/"last" — the
    * reference uses pandas `first` on constant-per-group columns
    * (reference/app.py:541-549) and `iloc[-1]` for the current reading
    * (W3, reference/streamlit_dashboard.py:719); here `min_by`/`max_by`
    * over a unique order column keep both deterministic under any
    * partitioning.
    */
  def groupMultiAgg(df: DataFrame, key: String, valueCol: String,
      firstCol: String, orderCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(
        round(avg(valueCol), 6).as(s"avg_$valueCol"),
        min(valueCol).as(s"min_$valueCol"),
        max(valueCol).as(s"max_$valueCol"),
        count(lit(1)).as("n"),
        min_by(col(firstCol), col(orderCol)).as(s"first_$firstCol"),
        max_by(col(valueCol), col(orderCol)).as(s"last_$valueCol"))

  /** A9: pandas `describe()` — count/mean/std/min/Q1/median/Q3/max in one
    * aggregation (exact interpolated quantiles, sample stddev).
    */
  def describe(df: DataFrame, c: String): DataFrame =
    df.agg(
        count(lit(1)).as("n"),
        round(avg(c), 6).as("mean"),
        round(stddev_samp(c), 6).as("std"),
        min(c).as("min"),
        expr(s"percentile($c, array(0.25, 0.5, 0.75))").as("__q"),
        max(c).as("max"))
      .select(col("n"), col("mean"), col("std"), col("min"),
        round(element_at(col("__q"), 1), 6).as("q1"),
        round(element_at(col("__q"), 2), 6).as("median"),
        round(element_at(col("__q"), 3), 6).as("q3"),
        col("max"))

  /** Global descriptive stats: mean/std/min/max/count plus coefficient of
    * variation and range (reference/streamlit_dashboard.py:632-637;
    * pandas `std` is sample std, ddof=1 → stddev_samp).
    */
  def globalStats(df: DataFrame, c: String): DataFrame =
    df.agg(
        avg(c).as("__mean"),
        stddev_samp(c).as("__std"),
        min(c).as(s"min_$c"),
        max(c).as(s"max_$c"),
        count(lit(1)).as("n"))
      .select(
        round(col("__mean"), 6).as(s"mean_$c"),
        round(col("__std"), 6).as(s"std_$c"),
        col(s"min_$c"), col(s"max_$c"), col("n"),
        round(col("__std") / col("__mean") * 100, 6).as("cv_pct"),
        round(col(s"max_$c") - col(s"min_$c"), 6).as(s"range_$c"))

  /** Exact interpolated quartiles per group (reference IQR inputs,
    * reference/streamlit_dashboard.py:191-201). Exact `percentile` (not
    * approx) matches pandas/DuckDB linear interpolation; swap to
    * `percentile_approx` at scales where an exact sort-based quantile is
    * too expensive and approximation is acceptable.
    */
  def quantiles(df: DataFrame, key: String, c: String): DataFrame =
    df.groupBy(col(key))
      .agg(expr(s"percentile($c, array(0.25, 0.5, 0.75))").as("__q"))
      .select(
        col(key),
        round(element_at(col("__q"), 1), 6).as("q1"),
        round(element_at(col("__q"), 2), 6).as("median"),
        round(element_at(col("__q"), 3), 6).as("q3"),
        round(element_at(col("__q"), 3) - element_at(col("__q"), 1), 6).as("iqr"))

  /** Equi-width histogram (reference/streamlit_dashboard.py:648-650,
    * 30 bins). Two-phase: the min/max bounds are collected as two driver
    * scalars (adaptive-binning metadata — so the operator runs its bounds
    * job eagerly at construction, batch input only), then one hash agg on
    * the literal bin index; only the ≤nBins bin counts ever leave the
    * executors.
    */
  def histogram(df: DataFrame, c: String, nBins: Int): DataFrame = {
    require(!df.isStreaming,
      "histogram collects adaptive min/max bounds eagerly and has NO " +
        "streaming form (bin bounds would change every micro-batch); " +
        "aggregate fixed-bound bins in foreachBatch instead")
    // One bounds pass, collected to the driver — two scalar doubles, the
    // adaptive-binning metadata collection every engine performs. Binning
    // then uses literal bounds, so the bounds subtree appears zero times
    // in the counting plan (the previous broadcast-bounds-twice form
    // re-ran the full min/max agg when exchange reuse didn't unify the
    // two copies).
    val bounds = df.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
    val spine = df.sparkSession.range(nBins).toDF("bin")
    if (bounds.isNullAt(0)) {
      // empty input: the dense spine with null bounds and zero counts
      // (what the aggregate-over-empty SQL formulation yields)
      return spine.select(col("bin"),
        lit(null).cast("double").as("bin_start"), lit(0L).as("n"))
    }
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    val counts = df
      .select(least(floor((col(c) - lo) / ((hi - lo) / nBins)),
          lit(nBins - 1)).cast("long").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
    // dense bin spine (plotly's px.histogram renders every bin of the
    // range, empty ones included) — ≤nBins rows, broadcast
    spine.join(broadcast(counts), Seq("bin"), "left")
      .select(
        col("bin"),
        round(lit(lo) + col("bin") * (hi - lo) / nBins, 6).as("bin_start"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Scale-path approximate statistics: HLL++ distinct counts and
    * GK-sketch quantiles. At 100 TB the exact forms (shuffle-heavy
    * count-distinct expand, full-sort percentile) are the wrong default;
    * these are one-pass, mergeable, and bounded-memory. Registered without
    * a value oracle (approximate by contract); unit tests pin the error
    * envelope instead.
    */
  def approxStats(df: DataFrame, distinctCol: String, quantileCol: String,
      rsd: Double = 0.05, accuracy: Int = 10000): DataFrame =
    df.agg(
      approx_count_distinct(col(distinctCol), rsd).as(s"approx_n_$distinctCol"),
      percentile_approx(col(quantileCol),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(accuracy)).as("__q"),
      count(lit(1)).as("n"))
      .select(col(s"approx_n_$distinctCol"), col("n"),
        element_at(col("__q"), 1).as("approx_q1"),
        element_at(col("__q"), 2).as("approx_median"),
        element_at(col("__q"), 3).as("approx_q3"))

  /** The value-checked CONTRACT of [[approxStats]], oracle-able: one row
    * of exact values plus booleans asserting every approximate output
    * sits inside its function's documented error envelope —
    * `approx_count_distinct` within 3 relative standard deviations of the
    * exact distinct count, `percentile_approx` returning a value whose
    * possible rank interval intersects a window of n/accuracy (+1 for
    * target-rank rounding) around the target rank. The DuckDB oracle
    * replays the exact side and pins each boolean to literal TRUE, so a
    * Spark-side envelope violation hash-mismatches — the same pattern as
    * `q_contamination_bloom_bound`. One extra scan over [[approxStats]]'s
    * own pass (the rank-counting aggregate against the three collected
    * quantile values), still shuffle-free.
    */
  def approxStatsBound(df: DataFrame, distinctCol: String,
      quantileCol: String, rsd: Double = 0.05,
      accuracy: Int = 10000): DataFrame = {
    val ap = approxStats(df, distinctCol, quantileCol, rsd, accuracy)
    val v = col(quantileCol).cast("double")
    val targets = Seq("q1" -> 0.25, "med" -> 0.5, "q3" -> 0.75)
    def qc(nm: String): Column =
      if (nm == "med") col("approx_median") else col(s"approx_$nm")
    val aggs: Seq[Column] =
      count_distinct(col(distinctCol)).as("exact_n") +:
        count(lit(1)).as("n") +:
        max(col(s"approx_n_$distinctCol")).as("__apn") +:
        targets.flatMap { case (nm, _) => Seq(
          sum(when(v <= qc(nm), 1L).otherwise(0L)).as(s"__le_$nm"),
          sum(when(v < qc(nm), 1L).otherwise(0L)).as(s"__lt_$nm"))
        }
    val ranks = df.crossJoin(broadcast(ap)).agg(aggs.head, aggs.tail: _*)
    val qOks = targets.map { case (nm, p) =>
      // the returned value's true rank lies in [__lt+1, __le]; accept if
      // that interval intersects [p·n − w, p·n + w], w = n/accuracy + 1
      val w = col("n").cast("double") / accuracy + 1.0
      val target = col("n").cast("double") * p
      (col(s"__le_$nm") >= target - w &&
        (col(s"__lt_$nm") + 1) <= target + w).as(s"${nm}_ok")
    }
    ranks.select(
      col("exact_n") +: col("n") +:
        (abs(col("__apn") - col("exact_n")) / col("exact_n")
          <= 3 * rsd).as("cd_ok") +: qOks: _*)
  }

  /** The scale-path twin of [[quantiles]], value-checked: at 100 TB the
    * engine answer to per-group quartiles is `percentile_approx`
    * (one-pass GK sketch, bounded memory), not the exact sort-based
    * `percentile`. This audit form computes BOTH — exact quartiles per
    * group plus booleans asserting each approximate value's possible
    * rank interval [lt+1, le] intersects the sketch's documented window
    * (n/accuracy, +1 for target-rank rounding) around the target rank —
    * the per-group generalization of [[approxStatsBound]]. The DuckDB
    * oracle replays the exact side and pins the booleans TRUE, so a
    * Spark-side envelope violation hash-mismatches. Two aggregations
    * over the input (sketch pass, then rank-count pass against the
    * broadcast per-group sketch values); group cardinality bounds the
    * broadcast side.
    */
  def quantilesApproxBound(df: DataFrame, key: String, c: String,
      accuracy: Int = 10000): DataFrame = {
    val ap = df.groupBy(col(key))
      .agg(percentile_approx(col(c),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(accuracy)).as("__aq"))
      .withColumnRenamed(key, "__apk")
    val v = col(c).cast("double")
    val targets = Seq(("q1", 0.25, 1), ("med", 0.5, 2), ("q3", 0.75, 3))
    val aggs: Seq[Column] =
      expr(s"percentile($c, array(0.25, 0.5, 0.75))").as("__q") +:
        count(lit(1)).as("n") +:
        count(v).as("__nn") +:
        targets.flatMap { case (nm, _, i) => Seq(
          sum(when(v <= element_at(col("__aq"), i), 1L).otherwise(0L))
            .as(s"__le_$nm"),
          sum(when(v < element_at(col("__aq"), i), 1L).otherwise(0L))
            .as(s"__lt_$nm"))
        }
    // Null-safe key equality (<=>): DuckDB's GROUP BY keeps a NULL-key
    // group, so a plain equi-join here would silently drop it and
    // row-count-diverge from the oracle.
    val ranks = df.join(broadcast(ap), col(key) <=> col("__apk"))
      .groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
    val qOks = targets.map { case (nm, p, _) =>
      // Rank envelope over the NON-NULL value count (percentile and
      // percentile_approx both ignore NULLs); a group with no non-null
      // values has NULL exact and sketch quantiles on both sides — the
      // bound is vacuously TRUE, matching the oracle's literal TRUE.
      val w = col("__nn").cast("double") / accuracy + 1.0
      val target = col("__nn").cast("double") * p
      (col("__nn") === 0L ||
        (col(s"__le_$nm") >= target - w &&
          (col(s"__lt_$nm") + 1) <= target + w)).as(s"${nm}_ok")
    }
    ranks.select(
      col(key) +:
        round(element_at(col("__q"), 1), 6).as("q1") +:
        round(element_at(col("__q"), 2), 6).as("median") +:
        round(element_at(col("__q"), 3), 6).as("q3") +:
        col("n") +: qOks: _*)
  }

  /** Pairwise Pearson correlations in one aggregation pass
    * (reference/streamlit_dashboard.py:657,664 — the 3×3 matrix's
    * distinct off-diagonal cells).
    */
  def corrPairs(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    val aggs: Seq[Column] = pairs.map { case (a, b) =>
      round(corr(col(a), col(b)), 6).as(s"corr_${a}_$b")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Multi-level hierarchical rollup (SQL ROLLUP): per-(key, day)
    * aggregates PLUS per-key subtotals PLUS the grand total in one
    * query — Spark plans a single Expand over one aggregation, so all
    * three levels ride ONE shuffle instead of three queries re-scanning
    * the fact table (the dashboard "drill-down" shape at 100 TB).
    * `level` is `grouping_id()` (0 = leaf, 1 = per-key subtotal, 3 =
    * grand total), disambiguating a subtotal row from a genuinely-null
    * key.
    */
  def hierarchical(df: DataFrame, tsCol: String, key: String,
      valueCol: String): DataFrame =
    df.withColumn("day", to_date(col(tsCol)))
      .rollup(col(key), col("day"))
      .agg(count(lit(1)).as("n"),
        round(sum(valueCol), 2).as(s"sum_$valueCol"),
        round(avg(valueCol), 6).as(s"avg_$valueCol"),
        // must live inside the agg list: grouping_id() only resolves
        // under the GroupingSets aggregate itself
        grouping_id().as("level"))

  /** Per-day MERGEABLE distinct-count sketches (Apache DataSketches HLL
    * via the engine's `hll_sketch_agg`) — the "daily uniques" primitive
    * a 100 TB dashboard materializes instead of exact distincts: an
    * exact per-day distinct cannot merge (yesterday's count + today's
    * count ≠ the two-day uniques), so every cross-day window forces a
    * re-scan; the sketch is a constant-size (≈2^lgK bytes) binary that
    * unions losslessly — store one per day partition and ANY date range
    * collapses to a `hll_union_agg` over its rows, the same
    * partial-merge shape as the X69 incremental aggregates. One grouped
    * aggregation pass, map-side combinable; estimate standard error ≈
    * 1.04/√2^lgK (~1.6% at the default 12).
    */
  def dailyUniqueSketch(df: DataFrame, tsCol: String, keyCol: String,
      lgK: Int = 12): DataFrame =
    df.withColumn("day", to_date(col(tsCol)))
      .groupBy(col("day"))
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("uniques_sketch"))
      .withColumn("uniques_est",
        hll_sketch_estimate(col("uniques_sketch")))

  /** Range rollup over [[dailyUniqueSketch]] partials: one row with the
    * union-merged estimate — the read path that never touches raw data.
    */
  def mergeUniqueSketches(daily: DataFrame): DataFrame =
    daily.agg(hll_union_agg(col("uniques_sketch")).as("merged_sketch"))
      .select(hll_sketch_estimate(col("merged_sketch")).as("uniques_est"))

  /** Explicit GROUPING SETS rollup — the drill-down shapes ROLLUP's
    * strict hierarchy cannot express: here (key, day) leaves, the
    * per-DAY panel across all keys (a non-prefix subtotal), and the
    * grand total, in ONE aggregation. Same execution shape as
    * [[hierarchical]]: Spark plans a single Expand (one row copy per
    * set) over one shuffle, instead of three fact-table scans — at
    * 100 TB the dashboard's three panels cost one pass. `level` is
    * `grouping_id()` (0 = leaf, 2 = per-day panel, 3 = grand total),
    * disambiguating subtotal rows from genuinely-null keys.
    */
  def groupingSetsRollup(df: DataFrame, tsCol: String, key: String,
      valueCol: String): DataFrame =
    df.withColumn("day", to_date(col(tsCol)))
      .groupingSets(
        Seq(Seq(col(key), col("day")), Seq(col("day")), Seq.empty),
        col(key), col("day"))
      .agg(count(lit(1)).as("n"),
        round(sum(valueCol), 2).as(s"sum_$valueCol"),
        round(avg(valueCol), 6).as(s"avg_$valueCol"),
        grouping_id().as("level"))

  /** CUBE — every subset of (key, day) in ONE aggregation: the
    * cross-tab view ("filter by either dimension, both, or neither")
    * that ROLLUP's strict hierarchy cannot express and GROUPING SETS
    * only reaches by hand-enumerating all 2^n subsets. Same execution
    * shape as [[hierarchical]]/[[groupingSetsRollup]]: one Expand (2^n
    * row copies for n dims — keep n small by design) over ONE shuffle,
    * so at 100 TB all four dashboard panels cost a single fact-table
    * pass. `level` = `grouping_id()` (0 leaf, 1 per-key, 2 per-day,
    * 3 grand total) disambiguates subtotals from genuinely-null keys.
    */
  def cubeRollup(df: DataFrame, tsCol: String, key: String,
      valueCol: String): DataFrame =
    df.withColumn("day", to_date(col(tsCol)))
      .cube(col(key), col("day"))
      .agg(count(lit(1)).as("n"),
        round(sum(valueCol), 2).as(s"sum_$valueCol"),
        round(avg(valueCol), 6).as(s"avg_$valueCol"),
        grouping_id().as("level"))

  /** Incremental materialized-aggregate maintenance — the dashboard
    * rollup refreshed from each new event batch WITHOUT rescanning
    * history. The state table holds per-(key, day) MERGEABLE partials
    * (`n`, `sum`; avg is derived at read time — an average itself cannot
    * be merged), partitioned by day so a batch refresh touches only the
    * days it contains:
    *
    *   1. the batch collapses to its own per-(key, day) partials (a
    *      batch-sized aggregation, never the fact table);
    *   2. its distinct days (driver metadata) prune the state read;
    *   3. union + re-aggregate merges old and new partials;
    *   4. dynamic partition overwrite rewrites exactly those day dirs.
    *
    * A day far in the past that receives a late event costs one
    * day-partition rewrite, not a history scan — this is why partials,
    * not finished averages, are what a 100 TB pipeline materializes.
    * NOT idempotent (increments add): callers must apply each batch
    * exactly once — pair with a batch-id ledger when the source can
    * re-deliver (the streaming-dedup gate exists for exactly that).
    * Returns the refreshed day partition names.
    */
  def initDailyAgg(df: DataFrame, tsCol: String, key: String,
      valueCol: String, path: String): Unit =
    clusterByDay(dailyPartials(df, tsCol, key, valueCol))
      .write.partitionBy("day").mode("overwrite").parquet(path)

  /** Cluster a partials frame by its `day` partition column before a
    * partitionBy("day") write: the aggregation upstream leaves rows
    * key-hash-partitioned, so every write task held every day and the
    * job emitted (#tasks × #days) files from however many tasks AQE
    * left — measured at sf0.1 as ONE task writing ~30 day files
    * serially (0.5 s of a 2.1 s query). Clustered, each day's rows land
    * in one task and the write emits one file per day dir, in parallel
    * (guide §6). The explicit count pins the exchange against AQE
    * coalescing back to a single task; a day's partials are bounded by
    * key cardinality — the same bound the state table itself carries —
    * so per-task size stays bounded at any corpus scale.
    */
  private def clusterByDay(partials: DataFrame): DataFrame =
    partials.repartition(
      partials.sparkSession.sparkContext.defaultParallelism, col("day"))

  /** Per-(key, day) mergeable partials of one frame. */
  private def dailyPartials(df: DataFrame, tsCol: String, key: String,
      valueCol: String): DataFrame =
    df.withColumn("day", to_date(col(tsCol)))
      .groupBy(col(key), col("day"))
      .agg(count(lit(1)).as("n"), sum(valueCol).as("sum_v"))

  /** Merge one batch into an [[initDailyAgg]] state table; see there. */
  def mergeDailyIncrement(spark: SparkSession, path: String,
      batch: DataFrame, tsCol: String, key: String,
      valueCol: String): Seq[String] = {
    val inc = dailyPartials(batch, tsCol, key, valueCol).persist()
    try {
      val days = inc.select(col("day")).distinct()
        .collect().map(_.getDate(0).toString).toSeq.sorted
      if (days.isEmpty) return Seq.empty
      val cur = spark.read.parquet(path)
        .filter(col("day").isin(days: _*))
        .select(col(key), col("day").cast("date"), col("n"), col("sum_v"))
      clusterByDay(
        cur.unionByName(inc.select(col(key), col("day"), col("n"), col("sum_v")))
          .groupBy(col(key), col("day"))
          .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v")))
        .write.partitionBy("day").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
      days
    } finally inc.unpersist()
  }

  /** MERGEABLE HISTOGRAM partials — the quantile analogue of
    * [[initDailyAgg]]'s (n, sum) state: a finished median cannot merge,
    * but fixed-range bin counts can (counts add), so the maintained
    * state supports approximate per-(key, day) quantiles at histogram
    * resolution without ever rescanning history. State rows are
    * (key, day, bin, n) — the relational form of the histogram vector,
    * so the merge is the SAME union + sum machinery as the scalar
    * partials and a late day costs one partition rewrite. The [lo, hi)
    * range and bin count are part of the state's identity: two states
    * only merge if binned identically (out-of-range values clamp to the
    * edge bins, which the quantile read then treats as ordinary mass).
    */
  def dailyHistPartials(df: DataFrame, tsCol: String, key: String,
      valueCol: String, lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 2 && hi > lo,
      s"dailyHistPartials: need bins>=2 and hi>lo, got $bins [$lo,$hi)")
    val w = (hi - lo) / bins
    df.withColumn("day", to_date(col(tsCol)))
      .withColumn("bin", least(lit(bins - 1), greatest(lit(0),
        floor((col(valueCol) - lit(lo)) / lit(w)).cast("int"))))
      .groupBy(col(key), col("day"), col("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** Write the histogram state table (day-partitioned). */
  def initDailyHist(df: DataFrame, tsCol: String, key: String,
      valueCol: String, lo: Double, hi: Double, bins: Int,
      path: String): Unit =
    clusterByDay(dailyHistPartials(df, tsCol, key, valueCol, lo, hi, bins))
      .write.partitionBy("day").mode("overwrite").parquet(path)

  /** Merge one batch into an [[initDailyHist]] state table — same
    * touched-days-only contract (and same non-idempotence caveat) as
    * [[mergeDailyIncrement]].
    */
  def mergeDailyHistIncrement(spark: SparkSession, path: String,
      batch: DataFrame, tsCol: String, key: String, valueCol: String,
      lo: Double, hi: Double, bins: Int): Seq[String] = {
    val inc = dailyHistPartials(batch, tsCol, key, valueCol, lo, hi, bins)
      .persist()
    try {
      val days = inc.select(col("day")).distinct()
        .collect().map(_.getDate(0).toString).toSeq.sorted
      if (days.isEmpty) return Seq.empty
      val cols = Seq(col(key), col("day").cast("date"), col("bin"), col("n"))
      clusterByDay(
        spark.read.parquet(path).filter(col("day").isin(days: _*))
          .select(cols: _*)
          .unionByName(inc.select(col(key), col("day"), col("bin"), col("n")))
          .groupBy(col(key), col("day"), col("bin"))
          .agg(sum(col("n")).as("n")))
        .write.partitionBy("day").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
      days
    } finally inc.unpersist()
  }

  /** Per-(key, day) quantile estimate read off the histogram state:
    * first bin where the cumulative count reaches p·total, linearly
    * interpolated within the bin (the classic equi-width estimator —
    * error bounded by bin width). All inputs are merged integer counts,
    * so the estimate is deterministic across engines.
    */
  def histQuantile(state: DataFrame, key: String, p: Double,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(p > 0 && p < 1, s"histQuantile: p=$p")
    import org.apache.spark.sql.expressions.Window
    val w = (hi - lo) / bins
    val byBin = Window.partitionBy(col(key), col("day")).orderBy(col("bin"))
    val whole = Window.partitionBy(col(key), col("day"))
    state
      .withColumn("cum", sum(col("n")).over(byBin))
      .withColumn("total", sum(col("n")).over(whole))
      .filter(col("cum") >= lit(p) * col("total"))
      .withColumn("__rn", row_number().over(byBin))
      .filter(col("__rn") === 1)
      .select(col(key), col("day"),
        round(lit(lo) + (col("bin") +
          (lit(p) * col("total") - (col("cum") - col("n"))) / col("n"))
          * lit(w), 6).as(s"p${math.round(p * 100)}_est"))
  }

  /** Read an [[initDailyAgg]] state table with the derived metrics a
    * dashboard wants (avg = merged sum / merged n).
    */
  def readDailyAgg(spark: SparkSession, path: String,
      valueCol: String): DataFrame =
    spark.read.parquet(path)
      .select(col("*"),
        round(col("sum_v") / col("n"), 6).as(s"avg_$valueCol"))
      .withColumn("sum_v", round(col("sum_v"), 2))
      .withColumnRenamed("sum_v", s"sum_$valueCol")

  /** Wide per-entity feature row (`groupBy.pivot` over an EXPLICIT
    * column vocabulary): one value column per listed category. The
    * explicit list matters at scale: it keeps the plan one pass with no
    * distinct-values pre-query and a bounded output schema — pivoting an
    * unbounded-cardinality column is the anti-pattern this signature
    * forbids. One shuffle on the key; per-category conditional
    * aggregation is map-side combined.
    */
  def pivotMean(df: DataFrame, key: String, catCol: String,
      valueCol: String, cats: Seq[String]): DataFrame = {
    require(cats.nonEmpty, "pivotMean: empty category vocabulary")
    df.groupBy(col(key))
      .pivot(catCol, cats)
      .agg(round(avg(valueCol), 6))
  }
}

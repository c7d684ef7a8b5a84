package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution DRIFT detection (X108): the two-sample Kolmogorov–
  * Smirnov statistic per key — "has this sensor's VALUE distribution
  * changed between period A and period B", the value-distribution
  * companion to X87's token-distribution JS divergence. The reference
  * monitors point anomalies (verify_data.py thresholds); drift is the
  * slow failure mode those never catch: a miscalibrated sensor whose
  * every reading is individually plausible.
  *
  * Two forms:
  *   - [[ksExact]]: KS = sup_x \|F_A(x) − F_B(x)\| computed exactly with
  *     one per-key value sort (cumulative side counts over distinct
  *     values). Integer cumulative counts + one IEEE-exact division per
  *     side mean the statistic replays BIT-IDENTICALLY in DuckDB — a
  *     full value oracle, not an audit.
  *   - [[ksSketchBound]]: the scale path — each side collapses to a KLL
  *     sketch ([[Kll]]) and KS is read off the two estimated CDFs. The
  *     estimated CDFs are step functions constant between retained
  *     points, so the sup over retained points IS the sup over ℝ, and
  *     each estimated CDF is within its sketch's guaranteed
  *     (order-independent) rank error of the truth — hence
  *     \|KS_est − KS_exact\| ≤ errA/nA + errB/nB, a deterministic
  *     envelope the oracled audit pins TRUE. No per-key sort of raw
  *     rows: the sort is over ≤ ~H·k retained items per side.
  *
  * The default split is the TIME MIDPOINT of the table (first half vs
  * second half, anchored on min/max ts — deterministic and replayable
  * via integer epoch-micros arithmetic in both engines).
  */
object Drift {

  /** Side-B predicate: ts in the second half of the table's time range.
    * Midpoint = (epoch_us(min) + epoch_us(max)) div 2 — INTEGER
    * arithmetic, so both engines compute the same cut.
    */
  def secondHalf(df: DataFrame, tsCol: String): Column = {
    val b = df.agg(
      min(unix_micros(col(tsCol))).as("__mn"),
      max(unix_micros(col(tsCol))).as("__mx"))
      .selectExpr("(__mn + __mx) div 2 AS __mid")
      .collect().head
    if (b.isNullAt(0)) lit(false)
    else unix_micros(col(tsCol)) >= lit(b.getLong(0))
  }

  /** Exact per-key two-sample KS. One aggregation to per-(key, value)
    * side counts, then a per-key cumulative window over DISTINCT values
    * (cardinality-bounded, not row-bounded), max of the CDF gap. Keys
    * with an empty side are dropped (KS undefined). Emits
    * (key, n_a, n_b, ks) with ks rounded to 6 dp.
    */
  def ksExact(df: DataFrame, key: String, c: String,
      sideB: Column): DataFrame = {
    val v = col(c).cast("double")
    val perVal = df.filter(v.isNotNull)
      .groupBy(col(key), v.as("__v"))
      .agg(sum(when(sideB, 0L).otherwise(1L)).as("__a"),
        sum(when(sideB, 1L).otherwise(0L)).as("__b"))
    val ord = Window.partitionBy(col(key)).orderBy(col("__v"))
    val tot = Window.partitionBy(col(key))
    val cum = perVal
      .withColumn("__ca", sum(col("__a")).over(ord))
      .withColumn("__cb", sum(col("__b")).over(ord))
      .withColumn("__na", sum(col("__a")).over(tot))
      .withColumn("__nb", sum(col("__b")).over(tot))
    // keys with an empty side are dropped BEFORE the division (ANSI
    // mode makes x/0 an error, not an Inf)
    cum.filter(col("__na") > 0 && col("__nb") > 0)
      .groupBy(col(key))
      .agg(
        max(col("__na")).as("n_a"),
        max(col("__nb")).as("n_b"),
        max(abs(col("__ca").cast("double") / col("__na").cast("double") -
          col("__cb").cast("double") / col("__nb").cast("double")))
          .as("__ks"))
      .select(col(key), col("n_a"), col("n_b"),
        round(col("__ks"), 6).as("ks"))
  }

  /** Per-key KS estimated from two KLL sketches: returns
    * (key, ksEst, bound) where bound = errA/nA + errB/nB is the
    * deterministic worst-case deviation from the exact KS. Rows whose
    * key lacks either side are omitted.
    */
  private[graft] def ksSketch(df: DataFrame, key: String, c: String,
      sideB: Column, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    val sketches = df.filter(col(c).cast("double").isNotNull)
      .groupBy(col(key), sideB.as("__side"))
      .agg(Kll.sketchColumn(k, col(c)).as("__sk"))
    val paired = sketches.groupBy(col(key)).agg(
      max(when(!col("__side"), col("__sk"))).as("__ska"),
      max(when(col("__side"), col("__sk"))).as("__skb"))
      .filter(col("__ska").isNotNull && col("__skb").isNotNull)
      .withColumnRenamed(key, "__k")
      .as[(String, KllBuf, KllBuf)]
    ksFromSketchPairs(paired)
  }

  /** KS estimate + deterministic bound from per-key (sketchA, sketchB)
    * pairs — the read shared by the batch ([[ksSketch]]) and streaming
    * ([[graft.streaming.Pipeline.replayKsDrift]]) paths.
    */
  private[graft] def ksFromSketchPairs(
      paired: org.apache.spark.sql.Dataset[(String, KllBuf, KllBuf)]): DataFrame = {
    import paired.sparkSession.implicits._
    paired.map { case (kk, a, b) =>
      // estimated CDFs are constant between retained points, so the sup
      // over the union of retained points is the sup over all x
      val pts = (Kll.weighted(a).map(_._1) ++ Kll.weighted(b).map(_._1))
        .distinct
      val ks = if (pts.isEmpty) 0.0
        else pts.map(x => math.abs(
          Kll.rank(a, x).toDouble / a.n -
            Kll.rank(b, x).toDouble / b.n)).max
      val bound = Kll.errBound(a).toDouble / a.n +
        Kll.errBound(b).toDouble / b.n
      (kk, a.n, b.n, ks, bound)
    }.toDF("__k", "__na", "__nb", "__ksEst", "__bound")
  }

  /** CUSUM changepoint localization (X109) — WHEN did the drift start,
    * the sequential companion to [[ksExact]]'s did-it-drift verdict
    * (Page 1954's cumulative-sum control chart). Per key, against a
    * baseline mean learned on the FIRST HALF of the time range:
    *
    *   S⁺_i = max(0, S⁺_{i−1} + (x_i − μ₀ − κ))   (upward drift)
    *   S⁻_i = max(0, S⁻_{i−1} + (μ₀ − x_i − κ))   (downward)
    *
    * alarm at the first i with S ≥ h. The nonlinear recurrence is NOT a
    * SQL window op — but the classic identity S_i = P_i − min(0,
    * min_{j≤i} P_j) (P = prefix sum of the drift terms) turns it into
    * cumulative-sum + cumulative-min windows, both per-key and
    * row-bounded.
    *
    * EXACT cross-engine replay by integer arithmetic: values scale to
    * micro-units (×1e6, half-up — identical in both engines), the
    * baseline mean is never divided out (terms multiply through by n₀:
    * d_i = n₀·x_i − s₀ − κ·n₀), so every prefix sum is a bigint and
    * order-independent-associative — the one FP step is the final
    * display division, identical shape both sides. Magnitudes: \|d\| ≤
    * n₀·(range + κ)·1e6 ≈ 1e13 at sf0.1, prefix < 1e18 — inside long;
    * a 100 TB deployment shards the series (per day) or widens to
    * decimal.
    *
    * Total order is pinned by (ts, x, `idCol`) with `idCol` unique, so
    * both engines walk the same sequence. Keys with an empty baseline
    * half are dropped. Emits per key: n, n_baseline, baseline,
    * max_cusum_up/dn (in value units, 6 dp), alarm_up/dn_ts (first
    * crossing, null if never).
    */
  /** Per-key in-control baselines for CUSUM: (key, n0, s0) over the
    * FIRST half of the time range, in the same micro-unit scaling the
    * recurrence uses. Metadata-sized (one row per key) — the offline
    * aggregate [[graft.streaming.CusumStream]] broadcasts.
    */
  def cusumBaselines(df: DataFrame, key: String, tsCol: String,
      c: String): DataFrame = {
    val v = col(c).cast("double")
    val sideB = secondHalf(df, tsCol)
    df.filter(v.isNotNull && !sideB)
      .groupBy(col(key))
      .agg(count(lit(1)).as("n0"),
        sum(round(v * lit(1e6), 0).cast("long")).as("s0"))
  }

  def cusumChangepoint(df: DataFrame, key: String, tsCol: String,
      c: String, idCol: String, h: Double = 500.0,
      slack: Double = 25.0): DataFrame = {
    require(h > 0 && slack >= 0, s"cusum: h=$h slack=$slack")
    val hS = math.round(h * 1e6)
    val kS = math.round(slack * 1e6)
    val v = col(c).cast("double")
    val sideB = secondHalf(df, tsCol)
    val base = df.filter(v.isNotNull)
      .withColumn("__x", round(v * lit(1e6), 0).cast("long"))
      .withColumn("__first", !sideB)
    val tot = Window.partitionBy(col(key))
    val ord = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("__x"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scaleDiv = (nc: Column) => nc.cast("double") /
      (max(col("__n0")) * lit(1000000L)).cast("double")
    base
      .withColumn("__n0",
        sum(when(col("__first"), 1L).otherwise(0L)).over(tot))
      .withColumn("__s0",
        sum(when(col("__first"), col("__x")).otherwise(0L)).over(tot))
      .filter(col("__n0") > 0)
      .withColumn("__pu", sum(col("__n0") * col("__x") - col("__s0") -
        lit(kS) * col("__n0")).over(ord))
      .withColumn("__pd", sum(col("__s0") - col("__n0") * col("__x") -
        lit(kS) * col("__n0")).over(ord))
      .withColumn("__su",
        col("__pu") - least(min(col("__pu")).over(ord), lit(0L)))
      .withColumn("__sd",
        col("__pd") - least(min(col("__pd")).over(ord), lit(0L)))
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("n"),
        max(col("__n0")).as("n_baseline"),
        round(scaleDiv(max(col("__s0"))), 6).as("baseline"),
        round(scaleDiv(max(col("__su"))), 6).as("max_cusum_up"),
        round(scaleDiv(max(col("__sd"))), 6).as("max_cusum_dn"),
        min(when(col("__su") >= lit(hS) * col("__n0"), col(tsCol)))
          .as("alarm_up_ts"),
        min(when(col("__sd") >= lit(hS) * col("__n0"), col(tsCol)))
          .as("alarm_dn_ts"))
  }

  /** The oracled audit twin: exact KS (replayable) next to booleans
    * pinning the sketch estimate inside its deterministic envelope and
    * the sketch side counts against the exact ones. A Spark-side
    * violation hash-mismatches against the all-TRUE oracle.
    */
  def ksSketchBound(df: DataFrame, key: String, c: String,
      sideB: Column, k: Int = 256): DataFrame =
    ksAudit(df, key, c, sideB, ksSketch(df, key, c, sideB, k))

  /** Exact-vs-estimate audit shared by the batch and streaming forms:
    * `est` carries (__k, __na, __nb, __ksEst, __bound) per key.
    */
  private[graft] def ksAudit(df: DataFrame, key: String, c: String,
      sideB: Column, est: DataFrame): DataFrame = {
    val exact = ksExact(df, key, c, sideB)
    exact.join(est, col(key) === col("__k"), "left")
      .select(col(key), col("n_a"), col("n_b"), col("ks"),
        (col("__na") === col("n_a") && col("__nb") === col("n_b"))
          .as("n_ok"),
        // +1e-6 absorbs the exact side's 6-dp rounding (the estimate is
        // compared unrounded); negligible next to any non-exact bound
        (abs(col("__ksEst") - col("ks")) <= col("__bound") + lit(1e-6))
          .as("ks_ok"))
  }
}

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

  /** The oracled audit twin: exact KS (replayable) next to booleans
    * pinning the sketch estimate inside its deterministic envelope and
    * the sketch side counts against the exact ones. A Spark-side
    * violation hash-mismatches against the all-TRUE oracle.
    */
  def ksSketchBound(df: DataFrame, key: String, c: String,
      sideB: Column, k: Int = 256): DataFrame = {
    val exact = ksExact(df, key, c, sideB)
    val est = ksSketch(df, key, c, sideB, k)
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

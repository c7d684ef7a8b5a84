package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IQR anomaly detection (SURVEY.md §2.9 ML1).
  *
  * Semantics of reference/streamlit_dashboard.py:185-207 (compact form
  * reference/app.py:164-173): Q1/Q3 are computed **globally over the input
  * frame** (not per group), a row is anomalous when it falls outside
  * [Q1 − k·IQR, Q3 + k·IQR], k = 1.5.
  *
  * Two-pass plan: an exact-percentile aggregation reduces the input to a
  * 1-row bounds relation, which is broadcast back onto the scan — the fact
  * table is read twice but never shuffled, so the operator scales linearly.
  */
object Anomaly {

  /** 1-row bounds relation (lo, hi) for `c`. */
  def iqrBounds(df: DataFrame, c: String, k: Double = 1.5): DataFrame =
    df.agg(expr(s"percentile($c, array(0.25, 0.75))").as("__q"))
      .select(
        (element_at(col("__q"), 1)
          - lit(k) * (element_at(col("__q"), 2) - element_at(col("__q"), 1))).as("lo"),
        (element_at(col("__q"), 2)
          + lit(k) * (element_at(col("__q"), 2) - element_at(col("__q"), 1))).as("hi"))

  /** Row-level anomaly flag against precomputed global bounds. */
  def flag(df: DataFrame, c: String, bounds: DataFrame): DataFrame =
    df.crossJoin(broadcast(bounds))
      .withColumn("is_anomaly", col(c) < col("lo") || col(c) > col("hi"))

  /** Per-group anomaly tally + the bounds used (bounds are constant
    * columns; min/max just carries them through the agg).
    */
  def rollup(df: DataFrame, c: String, key: String, k: Double = 1.5): DataFrame =
    flag(df, c, iqrBounds(df, c, k))
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("n_anomalies"),
        round(min(col("lo")), 6).as("lo_bound"),
        round(max(col("hi")), 6).as("hi_bound"))

  /** Seasonal (hour-of-day) baseline per key: mean / sample-stddev /
    * count of `valCol` in each of the key's 24 hour cells — the profile
    * the reference's diurnal signal (app.py:84-90's `8·sin((h−6)π/12)`)
    * makes necessary: against a GLOBAL distribution (the [[iqrBounds]]
    * family) the 14:00 peak always reads hot and the 02:00 trough always
    * reads cold; deviation must be judged against the hour's own
    * baseline. One aggregation; output is #keys × ≤24 rows.
    */
  def seasonalProfile(df: DataFrame, tsCol: String, keyCol: String,
      valCol: String): DataFrame =
    df.groupBy(col(keyCol), hour(col(tsCol)).as("hour_of_day"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col(valCol)), 6).as("seasonal_mean"),
        round(stddev_samp(col(valCol)), 6).as("seasonal_std"))

  /** Residual anomalies against a [[seasonalProfile]]: a row is
    * seasonally anomalous when it sits more than `z` profile
    * standard deviations from ITS HOUR's mean. The profile joins back
    * on (key, hour) — #keys × 24 rows, the scalar-context rule's
    * grouped form: the fact table is never shuffled, the planner
    * broadcasts the profile side. Cells with a degenerate profile
    * (n < 2 → NULL stddev, or zero stddev) flag nothing — comparisons
    * with NULL are not anomalies, matching the oracle's SQL semantics.
    */
  def seasonalResiduals(df: DataFrame, tsCol: String, keyCol: String,
      valCol: String, profile: DataFrame, z: Double = 3.0): DataFrame =
    df.withColumn("hour_of_day", hour(col(tsCol)))
      .join(broadcast(profile), Seq(keyCol, "hour_of_day"))
      .withColumn("residual",
        round(col(valCol) - col("seasonal_mean"), 6))
      .withColumn("is_seasonal_anomaly",
        coalesce(abs(col(valCol) - col("seasonal_mean")) >
          lit(z) * col("seasonal_std"), lit(false)))

  /** Per-key tally of [[seasonalResiduals]] — the dashboard row. */
  def seasonalRollup(df: DataFrame, tsCol: String, keyCol: String,
      valCol: String, z: Double = 3.0): DataFrame =
    seasonalResiduals(df, tsCol, keyCol, valCol,
        seasonalProfile(df, tsCol, keyCol, valCol), z)
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("is_seasonal_anomaly"), 1L).otherwise(0L))
          .as("n_anomalies"),
        round(max(abs(col("residual"))), 6).as("max_abs_residual"))

  /** Outage / downtime report (X110): per key, every inter-event gap
    * longer than `thresholdSec` — the reference's freshness panel
    * (max-ts staleness, S12) generalized to the FULL availability
    * history the batch table can answer: when was each silence, how
    * long, bounded by which events. One per-key lag window ordered by
    * (ts, id) with `idCol` unique, so the report replays exactly;
    * gap duration stays in integer micros until the final 6-dp display
    * division. The streaming complement is [[graft.streaming.Stateful
    * .ewmaAnomalies]]'s went-offline marker — that detects silence
    * live; this audits it after the fact.
    */
  def gaps(df: DataFrame, key: String, tsCol: String, idCol: String,
      thresholdSec: Long): DataFrame = {
    require(thresholdSec > 0, s"gaps: thresholdSec=$thresholdSec")
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col(idCol))
    df.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__gapUs",
        unix_micros(col(tsCol)) - unix_micros(col("__prev")))
      .filter(col("__gapUs") > lit(thresholdSec * 1000000L))
      .select(col(key), col("__prev").as("outage_start"),
        col(tsCol).as("outage_end"),
        round(col("__gapUs").cast("double") / lit(1e6), 6)
          .as("gap_seconds"))
  }

  /** [[madRollup]]'s 100 TB SCALE TWIN, value-checked — the swap the
    * exact form's contract promises: both medians read off X107 KLL
    * sketches (mergeable partials; exact `percentile`'s imperative
    * buffer holds the group's values and cannot split). Same two-pass
    * shape — sketch v per key, broadcast the median estimates back,
    * sketch \|v − med_est\| per key — with group-cardinality-bounded
    * driver state (one sketch answer per key, the CUSUM-baseline
    * pattern).
    *
    * The audit emits the EXACT med/mad/n (replayable — the
    * `q_mad_anomaly` construction) next to `med_ok`/`mad_ok`:
    * each estimate's true rank interval intersects
    * [target − errBound, target + errBound] for ITS OWN sketch — the
    * deterministic order/merge-independent KLL guarantee, so TRUE is a
    * theorem the DuckDB oracle pins (`q_mad_sketch_bound`). mad's
    * audit ranks the estimate within \|v − med_est\| — the population
    * the second sketch actually summarized.
    */
  def madRollupSketchBound(df: DataFrame, key: String, c: String,
      k: Int = 256): DataFrame = {
    import df.sparkSession.implicits._
    val v = col(c).cast("double")
    val filtered = df.filter(v.isNotNull)
    val sk1 = filtered.groupBy(col(key))
      .agg(Kll.sketchColumn(k, col(c)).as("sk"))
      .withColumnRenamed(key, "__k")
      .as[(String, KllBuf)].collect()
    val medDf = sk1.toSeq.map { case (kk, b) =>
      (kk, Kll.quantile(b, 0.5), Kll.errBound(b))
    }.toDF("__mk", "__medEst", "__err1")
    val dev = filtered
      .join(broadcast(medDf), col(key) === col("__mk"))
      .withColumn("__dev", abs(v - col("__medEst")))
    val sk2 = dev.groupBy(col(key))
      .agg(Kll.sketchColumn(k, col("__dev")).as("sk"))
      .withColumnRenamed(key, "__k")
      .as[(String, KllBuf)].collect()
    val madDf = sk2.toSeq.map { case (kk, b) =>
      (kk, Kll.quantile(b, 0.5), Kll.errBound(b))
    }.toDF("__ak", "__madEst", "__err2")
    // exact med per key (the replayable side), joined back for exact mad
    val exactMed = filtered.groupBy(col(key))
      .agg(round(expr(s"percentile($c, 0.5)"), 6).as("__medX"))
      .withColumnRenamed(key, "__xk")
    val audited = dev
      .join(broadcast(madDf), col(key) === col("__ak"))
      .join(broadcast(exactMed), col(key) === col("__xk"))
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("__medX")).as("med"),
        round(expr(s"percentile(abs($c - __medX), 0.5)"), 6).as("mad"),
        sum(when(v <= col("__medEst"), 1L).otherwise(0L)).as("__le1"),
        sum(when(v < col("__medEst"), 1L).otherwise(0L)).as("__lt1"),
        sum(when(col("__dev") <= col("__madEst"), 1L).otherwise(0L)).as("__le2"),
        sum(when(col("__dev") < col("__madEst"), 1L).otherwise(0L)).as("__lt2"),
        min(col("__err1")).as("__e1"),
        min(col("__err2")).as("__e2"))
    def ok(le: String, lt: String, e: String) = {
      val target = ceil(col("n_rows").cast("double") * 0.5)
      val w = col(e).cast("double")
      (col(le) >= target - w && (col(lt) + 1) <= target + w)
    }
    audited.select(col(key), col("n_rows"), col("med"), col("mad"),
      ok("__le1", "__lt1", "__e1").as("med_ok"),
      ok("__le2", "__lt2", "__e2").as("mad_ok"))
  }

  /** MAD robust anomaly rollup (X110) — the median-based twin of the
    * IQR family: per key, med = median(c), mad = median(\|c − med\|),
    * a row is anomalous when \|c − med\| > k·mad (k = 3 ≈ 4.45σ on
    * normal data; unlike mean/stddev, one wild reading cannot drag the
    * baseline toward itself). Cross-engine determinism: med and mad are
    * ROUNDED to 6 dp before the comparison in BOTH engines, so an
    * interpolation ulp cannot flip a row at the boundary. Two exact
    * percentile passes + a broadcast join of the per-key 1-row stats —
    * the fact table is never shuffled; at 100 TB swap the exact medians
    * for [[Kll]] quantiles (same plan, mergeable partials —
    * [[madRollupSketchBound]] is that swap, value-checked).
    */
  def madRollup(df: DataFrame, key: String, c: String,
      k: Double = 3.0): DataFrame = {
    val v = col(c).cast("double")
    val med = df.filter(v.isNotNull).groupBy(col(key))
      .agg(round(expr(s"percentile($c, 0.5)"), 6).as("med"))
      .withColumnRenamed(key, "__mk")
    val mad = df.filter(v.isNotNull)
      .join(broadcast(med), col(key) === col("__mk"))
      .groupBy(col(key))
      .agg(round(expr(s"percentile(abs($c - med), 0.5)"), 6).as("mad"))
      .withColumnRenamed(key, "__ak")
    df.filter(v.isNotNull)
      .join(broadcast(med), col(key) === col("__mk"))
      .join(broadcast(mad), col(key) === col("__ak"))
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("med")).as("med"),
        min(col("mad")).as("mad"),
        sum(when(abs(round(v, 6) - col("med")) > lit(k) * col("mad"),
          1L).otherwise(0L)).as("n_anomalies"))
  }
}

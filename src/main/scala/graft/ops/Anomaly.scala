package graft.ops

import org.apache.spark.sql.DataFrame
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
}

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
}

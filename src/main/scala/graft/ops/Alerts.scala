package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Threshold alerting, severity classification, and rollups
  * (SURVEY.md §2.2 P7/P8, §2.4 A14, §2.9 ML3/ML4).
  *
  * Mirrors reference/streamlit_dashboard.py:209-297: rows breaching fixed
  * thresholds become alerts with a type label; severity is a nested
  * CASE WHEN; the rollup is a single-pass conditional-count aggregation
  * (never one filter-and-count job per class).
  */
object Alerts {

  /** Alert thresholds for a single measure. `high`/`low` open an alert;
    * `criticalHigh`/`criticalLow` escalate it (else "warning") —
    * reference/streamlit_dashboard.py:49-51,268-297.
    */
  final case class Thresholds(
      high: Double, low: Double, criticalHigh: Double, criticalLow: Double)

  /** Row-level alert extraction: selective filter, then type + severity
    * labels (reference/streamlit_dashboard.py:209-266). The filter is a
    * pushable range predicate — at scale the Parquet reader skips row
    * groups whose min/max exclude both thresholds.
    */
  def extract(df: DataFrame, c: String, t: Thresholds): DataFrame =
    df.filter(col(c) > t.high || col(c) < t.low)
      .withColumn("alert_type",
        when(col(c) > t.high, s"high_$c").otherwise(s"low_$c"))
      .withColumn("severity",
        when(col(c) > t.criticalHigh || col(c) < t.criticalLow, "critical")
          .otherwise("warning"))

  /** Per-group single-pass severity tally
    * (reference/streamlit_dashboard.py:268-297).
    */
  def severityRollup(df: DataFrame, c: String, t: Thresholds, key: String): DataFrame =
    df.groupBy(col(key))
      .agg(
        sum(when((col(c) > t.high || col(c) < t.low)
            && (col(c) > t.criticalHigh || col(c) < t.criticalLow), 1L)
          .otherwise(0L)).as("n_critical"),
        sum(when((col(c) > t.high || col(c) < t.low)
            && !(col(c) > t.criticalHigh || col(c) < t.criticalLow), 1L)
          .otherwise(0L)).as("n_warning"),
        sum(when(col(c) > t.high || col(c) < t.low, 1L).otherwise(0L))
          .as("n_alerts"),
        count(lit(1)).as("n_rows"))

  /** Per-group status classification from the group mean — the
    * map-coloring logic of reference/streamlit_dashboard.py:769-777 /
    * app.py:551-553 (P8): mean above `hi` → High, below `lo` → Low,
    * else Normal, with a display color.
    */
  def statusClassify(df: DataFrame, key: String, c: String,
      hi: Double, lo: Double): DataFrame =
    df.groupBy(col(key))
      .agg(round(avg(c), 6).as(s"avg_$c"), count(lit(1)).as("n"))
      .withColumn("status",
        when(col(s"avg_$c") > hi, "High")
          .when(col(s"avg_$c") < lo, "Low")
          .otherwise("Normal"))
      .withColumn("color",
        when(col(s"avg_$c") > hi, "red")
          .when(col(s"avg_$c") < lo, "blue")
          .otherwise("green"))
}

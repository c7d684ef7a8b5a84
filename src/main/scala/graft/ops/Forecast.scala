package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group OLS forecast (SURVEY.md §2.9 ML2).
  *
  * Replaces the reference's sequential per-location sklearn loop
  * (reference/streamlit_dashboard.py:698-739; reference/app.py:510-537)
  * with ONE distributed grouped aggregation using Spark's built-in
  * `regr_slope` / `regr_intercept` / `regr_r2`: per key, fit
  * value = slope·x + intercept with x = seconds since the group's first
  * event, keep groups with ≥ minRows rows, and extrapolate one horizon
  * past the group's last observation.
  *
  * x is centered on the group minimum (exact integer microseconds, then
  * /1e6) rather than raw epoch seconds — centering removes the huge
  * constant offset that makes covariance accumulation numerically noisy.
  * Plan: one broadcast join against the per-group minimum + one hash agg;
  * no per-group driver loop, no window over a whole partition.
  */
object Forecast {

  def ols(df: DataFrame, key: String, tsCol: String, valueCol: String,
      orderCol: String, horizonSec: Double = 3600.0, minRows: Long = 10): DataFrame = {
    val t0 = df.groupBy(col(key)).agg(min(col(tsCol)).as("__t0"))
    val withX = df.join(broadcast(t0), Seq(key))
      .withColumn("__x",
        (unix_micros(col(tsCol)) - unix_micros(col("__t0"))) / lit(1e6))
    withX.groupBy(col(key))
      .agg(
        count(lit(1)).as("n"),
        regr_slope(col(valueCol), col("__x")).as("__slope"),
        regr_intercept(col(valueCol), col("__x")).as("__intercept"),
        regr_r2(col(valueCol), col("__x")).as("__r2"),
        max(col("__x")).as("__max_x"),
        max_by(col(valueCol), col(orderCol)).as("current_value"))
      .filter(col("n") >= minRows)
      .select(
        col(key), col("n"),
        round(col("__slope"), 9).as("slope"),
        round(col("__intercept"), 6).as("intercept"),
        round(col("__r2"), 6).as("r2"),
        round(col("__intercept") + col("__slope") * (col("__max_x") + horizonSec), 6)
          .as("forecast"),
        col("current_value"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic window operators: trailing moving average, first difference,
  * and trend classification (SURVEY.md §2.5 W1/W2, §2.9 ML5).
  *
  * Semantics of reference/streamlit_dashboard.py:676-696:
  *   - 20-row trailing mean with `min_periods=1` — pandas' shrinking
  *     leading frame is exactly Spark's `rowsBetween(-19, 0)`;
  *   - first difference via `lag`;
  *   - trend = mean of the last 20 first-differences of the MA series,
  *     which telescopes to (MA_last − MA_20th-from-last) / 19, classified
  *     rising / falling / stable at ±0.01.
  *
  * Windows are ALWAYS partitioned by the series key — an unpartitioned
  * `orderBy` window would pull the whole table through one task and is a
  * scale-killer. The key is a COMPOSITE (`keys`) so callers can partition
  * by a high-cardinality series identity (e.g. sensor/device/user id, or
  * type × id): each per-key window is one task, so key cardinality is the
  * window-stage parallelism. Partitioning a 100 TB fact table's windows by
  * a 5-value type column would serialize all window work through 5 tasks
  * — the registered queries key by user_id (cardinality scales with the
  * data) for exactly this reason.
  */
object Trend {

  /** Adds `ma` (n-row trailing mean) and `diff1` (x − lag(x)) per key
    * group, ordered by `order` (include a unique tiebreaker for
    * determinism).
    */
  def movingAvg(df: DataFrame, keys: Seq[String], order: Seq[String],
      valueCol: String, n: Int = 20): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    df.withColumn("ma",
        round(avg(col(valueCol)).over(w.rowsBetween(-(n - 1), 0)), 6))
      .withColumn("diff1", col(valueCol) - lag(col(valueCol), 1).over(w))
  }

  /** Per-key running cumulative total + event index over time — the
    * audit/meter-reading window (balance after every transaction). One
    * shuffle on the key, per-partition sort; the frame is rows-unbounded-
    * preceding, so Spark evaluates it in one streamed pass per key — no
    * quadratic re-aggregation. `order` must be a UNIQUE ordering per key
    * (include a tiebreaker id): a running sum over tied rows is frame-
    * order-dependent and silently nondeterministic otherwise.
    */
  def runningTotal(df: DataFrame, keys: Seq[String], order: Seq[String],
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("running_sum", round(sum(col(valueCol)).over(w), 2))
      .withColumn("n_so_far", count(lit(1)).over(w))
  }

  /** Per-key trend slope + classification
    * (reference/streamlit_dashboard.py:688-696): slope is the mean of the
    * last n first-differences of the n-row MA = (MA@last − MA@last−(n−1))/(n−1).
    * Groups shorter than n rows have no MA@n → null slope, classified
    * "stable" (the reference skips the trend box for short series).
    */
  def classify(df: DataFrame, keys: Seq[String], order: Seq[String],
      valueCol: String, n: Int = 20, eps: Double = 0.01): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(order.map(col): _*)
    val wDesc = Window.partitionBy(keyCols: _*)
      .orderBy(order.map(c => col(c).desc): _*)
    val withMa = df
      .withColumn("__ma", avg(col(valueCol)).over(w.rowsBetween(-(n - 1), 0)))
      .withColumn("__rn", row_number().over(wDesc))
      .filter(col("__rn") === 1 || col("__rn") === n)
    withMa.groupBy(keyCols: _*)
      .agg(((max(when(col("__rn") === 1, col("__ma")))
          - max(when(col("__rn") === n, col("__ma")))) / (n - 1)).as("__slope"))
      .select(keyCols ++ Seq[Column](
        round(col("__slope"), 6).as("slope"),
        when(col("__slope") > eps, "rising")
          .when(col("__slope") < -eps, "falling")
          .otherwise("stable").as("trend")): _*)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tumbling-window aggregation — the reference pipeline's core computation
  * (reference/spark_streaming.py:152-176): 5-minute windows keyed by sensor,
  * avg/min/max of each measure plus a reading count, window struct flattened
  * to `window_start`/`window_end` columns.
  *
  * Works identically on a batch DataFrame and a streaming one (with a
  * watermark applied upstream, see [[graft.streaming.Pipeline]]); Spark plans
  * it as partial + final hash aggregation, shuffling once on
  * (key, window) — the minimal shuffle for this computation, and the plan
  * scales linearly with input at constant state per (key, window) pair.
  */
object WindowedAgg {

  /** Generic single-measure form used over the `events` test table. */
  def tumbling(df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      width: String = "5 minutes"): DataFrame =
    df.groupBy(col(keyCol), window(col(tsCol), width))
      .agg(
        avg(valueCol).as("avg_value"),
        min(valueCol).as("min_value"),
        max(valueCol).as("max_value"),
        count(lit(1)).as("reading_count"))
      .select(
        col(keyCol),
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("avg_value"), col("min_value"), col("max_value"),
        col("reading_count"))

  /** Hopping (sliding) windows: `width`-long windows every `slide`,
    * so each event lands in width/slide windows. Same one-shuffle
    * partial+final aggregation as tumbling — the event-to-window fan-out
    * happens map-side before the partial agg.
    */
  def hopping(df: DataFrame, tsCol: String, keyCol: String, valueCol: String,
      width: String = "10 minutes", slide: String = "5 minutes"): DataFrame =
    df.groupBy(col(keyCol), window(col(tsCol), width, slide))
      .agg(
        round(avg(valueCol), 6).as("avg_value"),
        count(lit(1)).as("n"))
      .select(
        col(keyCol),
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("avg_value"), col("n"))

  /** Session windows: events closer than `gap` merge into one session per
    * key (start = first event, end = last event + gap). Beyond the
    * reference's tumbling-only surface, but a first-class capability of
    * the streaming engine (`session_window` works identically on streams
    * with a watermark). Batch-oracle-able via gaps-and-islands SQL.
    */
  def sessionized(df: DataFrame, tsCol: String, keyCol: String,
      gap: String = "30 minutes"): DataFrame =
    df.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Full sensor form matching reference/init.sql:14-26 column-for-column. */
  def sensorRollup(readings: DataFrame, width: String = "5 minutes"): DataFrame =
    readings
      .groupBy(col("sensor_id"), window(col("timestamp"), width))
      .agg(
        avg("temperature").as("avg_temperature"),
        avg("humidity").as("avg_humidity"),
        avg("pressure").as("avg_pressure"),
        min("temperature").as("min_temperature"),
        max("temperature").as("max_temperature"),
        count(lit(1)).as("reading_count"))
      .select(
        col("sensor_id"),
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("avg_temperature"), col("avg_humidity"), col("avg_pressure"),
        col("min_temperature"), col("max_temperature"), col("reading_count"))
}

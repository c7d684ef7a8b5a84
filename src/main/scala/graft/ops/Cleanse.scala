package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level derivation, formatting, and extraction operators
  * (SURVEY.md §2.2 P2/P10, §2.7 F1-F8/F14).
  *
  * All pure narrow projections — no shuffle, fully codegen'd, applied
  * inside the scan stage. The reference does these driver-side in Python
  * (reference/streamlit_dashboard.py:62-64,480-534); here they are
  * distributed expressions.
  */
object Cleanse {

  /** `location.replace('_',' ').title()` → clean display label
    * (reference/streamlit_dashboard.py:62-64; F1).
    */
  def cleanLabel(df: DataFrame, src: String, out: String): DataFrame =
    df.withColumn(out, initcap(regexp_replace(col(src), "_", " ")))

  /** Extract a scalar field from a JSON string column with an explicit
    * path — the wire-format round-trip of the reference
    * (reference/mqtt_producer.py:72, mqtt_to_kafka.py:35; F14).
    */
  def jsonField(df: DataFrame, jsonCol: String, field: String, out: String): DataFrame =
    df.withColumn(out, get_json_object(col(jsonCol), s"$$.$field").cast("long"))

  /** Per-group elapsed time in exact integer microseconds since the
    * group's first event (reference/streamlit_dashboard.py:708; F6).
    * Implemented as a broadcast join against the per-group minimum — not
    * a partitioned window — so a low-cardinality key never serializes
    * a whole partition through one task at scale.
    */
  def elapsedMicros(df: DataFrame, tsCol: String, key: String): DataFrame = {
    val t0 = df.groupBy(col(key)).agg(min(col(tsCol)).as("__t0"))
    df.join(broadcast(t0), Seq(key))
      .withColumn("elapsed_us", unix_micros(col(tsCol)) - unix_micros(col("__t0")))
      .drop("__t0")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dimension enrichment join with defaults on miss
  * (SURVEY.md §2.3 J1, §2.9 ML7, §2.7 F15).
  *
  * The reference "joins" aggregates to a 10-row coordinates dict with
  * `dict.get(k, default)` (reference/streamlit_dashboard.py:746-777);
  * the relational form is a broadcast hash LEFT OUTER equi-join against
  * the small dimension plus `coalesce` defaults — the dim ships to every
  * executor, the (already tiny) aggregate side never shuffles.
  */
object Geo {

  /** Per-key rollup of the fact side left-joined to `dim` (expected tiny,
    * broadcast), with coalesced defaults for keys missing from the dim and
    * the status classification of reference/streamlit_dashboard.py:769-777.
    */
  def rollup(facts: DataFrame, dim: DataFrame, key: String, valueCol: String,
      hi: Double, lo: Double,
      defaultLat: Double = 0.0, defaultLon: Double = 0.0,
      defaultSite: String = "unknown"): DataFrame =
    facts.groupBy(col(key))
      .agg(round(avg(valueCol), 6).as(s"avg_$valueCol"), count(lit(1)).as("n"))
      .join(broadcast(dim), Seq(key), "left")
      .select(
        col(key), col(s"avg_$valueCol"), col("n"),
        coalesce(col("lat"), lit(defaultLat)).as("lat"),
        coalesce(col("lon"), lit(defaultLon)).as("lon"),
        coalesce(col("site"), lit(defaultSite)).as("site"),
        when(col(s"avg_$valueCol") > hi, "High")
          .when(col(s"avg_$valueCol") < lo, "Low")
          .otherwise("Normal").as("status"))
}

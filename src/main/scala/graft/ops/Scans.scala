package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dashboard-style scan operators (SURVEY.md §2.1 S9-S13).
  *
  * The reference issues these as SQL against PostgreSQL B-tree indexes
  * (reference/streamlit_dashboard.py:74-79,107-112,130-171,
  * reference/verify_data.py:17); here each is a declarative plan over the
  * Parquet scan so Catalyst pushes the time predicate and projection into
  * the scan (PushedFilters + ReadSchema) — the distributed analog of the
  * reference's index scans.
  *
  * "Now"-relative predicates (`NOW() - INTERVAL …`,
  * reference/streamlit_dashboard.py:151) are anchored to `max(ts)` of the
  * input instead of the wall clock so results are deterministic and
  * oracle-checkable. [[timeRangeFromMax]] collects that anchor as one
  * scalar so the range predicate pushes into the scan (and therefore runs
  * its bounds job eagerly at construction — batch input only);
  * [[scanMetrics]] keeps the broadcast-1-row-bound form, which stays
  * lazy and shuffle-free.
  */
object Scans {

  /** Time-range scan relative to the dataset's own high-water mark:
    * rows with `tsCol >= max(tsCol) - lookback`
    * (reference/streamlit_dashboard.py:107-112).
    *
    * Two-phase, index-style: the high-water mark is ONE collected scalar
    * (parquet footer statistics make the max scan near-free), so the
    * range predicate is a LITERAL that reaches the parquet reader as a
    * pushed filter — the distributed analog of the reference's B-tree
    * range scan. The earlier broadcast-bound form kept the predicate
    * dynamic, forcing a full scan every time. Runs the bounds job eagerly
    * at construction — batch input only (use [[scanMetrics]]'s
    * broadcast-bound form for streaming frames).
    *
    * `nanosTwin` names a raw TIMESTAMP(NANOS) long column that derives
    * `tsCol` via `timestamp_micros(nanos DIV 1000)` (the events table's
    * reader workaround — predicates on the DERIVED timestamp can't
    * push). When given, a conservative pushable twin predicate on the raw
    * long is conjoined: `nanos ≥ micros(F)·1000 − 999` is implied by
    * `ts ≥ F` even for pre-epoch values, where `DIV` truncates toward
    * zero rather than flooring; the ≤1 µs of extra rows it admits are
    * removed by the base predicate.
    */
  def timeRangeFromMax(df: DataFrame, tsCol: String, lookback: String,
      nanosTwin: Option[String] = None): DataFrame = {
    require(!df.isStreaming,
      "timeRangeFromMax collects the max-ts bound eagerly (that's what buys " +
        "the pushed-down literal range scan) and is batch-only; on a stream, " +
        "derive the bound as a broadcast 1-row frame like scanMetrics does")
    val bound = df
      .agg(unix_micros(max(col(tsCol)) - expr(s"INTERVAL $lookback")))
      .head()
    if (bound.isNullAt(0)) return df.filter(lit(false))
    val fromMicros = bound.getLong(0)
    val base = df.filter(col(tsCol) >= timestamp_micros(lit(fromMicros)))
    nanosTwin match {
      case Some(c) => base.filter(col(c) >= lit(fromMicros * 1000L - 999L))
      case None => base
    }
  }

  /** One-row health metrics block: total rows, per-dim distinct counts,
    * time span, and a recent-row count over a trailing interval — the
    * reference's metrics header in one pass
    * (reference/streamlit_dashboard.py:130-171: S10 count, S11 recent
    * count, S12 max-timestamp freshness; A6 distinct counts :454-456).
    */
  def scanMetrics(df: DataFrame, tsCol: String, distinctCols: Seq[String],
      recentInterval: String): DataFrame = {
    val m = df.agg(max(col(tsCol)).as("__max_ts"))
    val distinctAggs: Seq[Column] =
      distinctCols.map(c => countDistinct(col(c)).as(s"n_distinct_$c"))
    val aggs: Seq[Column] = Seq(
      count(lit(1)).as("n_rows"),
      min(col(tsCol)).as("min_ts"),
      max(col(tsCol)).as("max_ts"),
      sum(when(col(tsCol) >= col("__max_ts") - expr(s"INTERVAL $recentInterval"), 1L)
        .otherwise(0L)).as("recent_n")) ++ distinctAggs
    df.crossJoin(broadcast(m)).agg(aggs.head, aggs.tail: _*)
  }

  /** Sorted distinct values of a dimension column — the reference's filter
    * dropdowns (reference/streamlit_dashboard.py:392-395; A7/O3).
    */
  def distinctSorted(df: DataFrame, c: String): DataFrame =
    df.select(col(c)).distinct().orderBy(col(c))

  /** Latest-N scan: ORDER BY ts DESC LIMIT n
    * (reference/verify_data.py:17; streamlit_dashboard.py:590-598).
    * Plans as TakeOrderedAndProject — per-partition top-N then a driver
    * merge of N×partitions rows; no global sort is materialized.
    */
  def latestN(df: DataFrame, tsCol: String, tiebreak: String, n: Int): DataFrame =
    df.orderBy(col(tsCol).desc, col(tiebreak)).limit(n)

  /** S12: freshness — latest event time + ingestion lag vs the wall clock
    * (reference/streamlit_dashboard.py:155,161-171). Wall-clock-dependent,
    * so excluded from the oracle set; the deterministic variant is
    * [[scanMetrics]]'s max-anchored form.
    */
  def freshness(df: DataFrame, tsCol: String): DataFrame =
    df.agg(max(col(tsCol)).as("max_ts"))
      .select(col("max_ts"),
        ((unix_micros(current_timestamp()) - unix_micros(col("max_ts")))
          / lit(1e6)).as("lag_seconds"))

  /** S14: storage-size metric — bytes on disk per table path, the engine
    * metric behind the reference's `pg_database_size` panel
    * (reference/streamlit_dashboard.py:158). A filesystem metadata call,
    * not a data scan.
    */
  def storageSize(spark: org.apache.spark.sql.SparkSession,
      tables: Map[String, String]): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    tables.toSeq.sortBy(_._1).map { case (name, path) =>
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val bytes =
        if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
      (name, bytes)
    }.toDF("table_name", "bytes")
  }
}

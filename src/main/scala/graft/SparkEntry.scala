package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.WindowedAgg
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is registered here as a named query over
  * the driver test tables, with a DuckDB oracle in [[oracleSql]]. Column
  * names and ordering are aligned pair-wise (the driver hash-compares after
  * sorting columns by name). Doubles produced by summation are rounded to
  * stay stable across summation orders; raw min/max/values are left exact.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference pipeline's core computation: 5-minute tumbling windowed
    * aggregate per key (reference/spark_streaming.py:152-176), over the
    * `events` stream table.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_windowed_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A1/A2: streaming-style tumbling window agg, batch form ----
    "q_windowed_agg" -> ((s, dir) =>
      WindowedAgg.tumbling(Tables.events(s, dir), "ts", "event_type", "value")
        .select(
          col("event_type"), col("window_start"), col("window_end"),
          round(col("avg_value"), 6).as("avg_value"),
          col("min_value"), col("max_value"), col("reading_count"))
        .orderBy("event_type", "window_start")),

    // ---- TPC-H Q1-style pricing summary: scan + wide agg on lineitem ----
    "q_pricing_summary" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // ---- J1-style broadcast dim join chain + rollup ----
    "q_dim_join_rollup" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
      val nat = broadcast(Tables.nation(s, dir))
      val reg = broadcast(Tables.region(s, dir))
      cust
        .join(nat, cust("c_nationkey") === nat("n_nationkey"))
        .join(reg, nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          round(avg("c_acctbal"), 6).as("avg_acctbal"))
        .orderBy("r_name", "n_name")
    }),

    // ---- S13/W4/O1/O2: latest-N scan (orderBy desc + limit) ----
    "q_topn_recent" -> ((s, dir) =>
      Tables.events(s, dir)
        .orderBy(col("ts").desc, col("event_id"))
        .limit(100)
        .select(
          col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_windowed_agg" ->
      """SELECT event_type,
        |  time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
        |  time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) + INTERVAL '5 minutes' AS window_end,
        |  round(avg(value), 6) AS avg_value,
        |  min(value) AS min_value,
        |  max(value) AS max_value,
        |  count(*) AS reading_count
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY event_type, window_start""".stripMargin,
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_dim_join_rollup" ->
      """SELECT r_name, n_name,
        |  count(*) AS n_customers,
        |  round(avg(c_acctbal), 6) AS avg_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q_topn_recent" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        |FROM events
        |ORDER BY ts DESC, event_id
        |LIMIT 100""".stripMargin,
  )
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver test data (TESTDATA.md).
  *
  * All loads are plain `spark.read.parquet` — column pruning and predicate
  * pushdown happen in Catalyst from the query on top; at cluster scale the
  * same loaders work unchanged against a partitioned data lake path.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")

  /** Session conf required to read TIMESTAMP(NANOS) parquet columns as
    * longs. Set it in the SESSION BUILDER (Verify/Bench/Explain and the
    * test base all do) — a loader mutating shared session conf would be a
    * side effect visible to every concurrent reader of the session.
    */
  val NanosAsLongConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** The `events` stream table stands in for the reference's sensor fact
    * stream in oracle-checked batch queries (SURVEY.md §7.1 item 6):
    * ts → timestamp, value → measure, event_type/user_id → keys.
    *
    * The parquet files store `ts` as TIMESTAMP(NANOS), which Spark's reader
    * does not support natively; read it as a long (legacy nanosAsLong) and
    * truncate to microsecond precision — the same truncation DuckDB applies
    * on `CAST(ts AS TIMESTAMP)`, keeping the oracle comparable.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.getOption(NanosAsLongConf).contains("true"),
      s"""events.parquet stores ts as TIMESTAMP(NANOS): build the session with
         |.config("$NanosAsLongConf", "true") before loading it""".stripMargin)
    // keep the RAW nanos long beside the converted timestamp: predicates
    // on the derived `ts` cannot reach the parquet reader, so range scans
    // add a pushable twin on `ts_nanos` (see Scans.timeRangeFromMax)
    load(spark, dir, "events")
      .withColumn("ts_nanos", col("ts"))
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

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
    * The loader adapts to the physical `ts` encoding the lake actually
    * uses (it has shipped both), keyed on the dtype the scan reports:
    *
    *   - TIMESTAMP(NANOS) → Spark's reader has no nanos timestamp; with
    *     `spark.sql.legacy.parquet.nanosAsLong=true` it surfaces as a
    *     long, which we truncate to a microsecond timestamp — the same
    *     truncation DuckDB applies on `CAST(ts AS TIMESTAMP)`, keeping
    *     the oracle comparable. Predicates on the DERIVED timestamp
    *     cannot reach the reader, so the raw long is kept as a pushable
    *     `ts_nanos` twin (see Scans.timeRangeFromMax).
    *   - TIMESTAMP(MICROS) → native read; predicates on `ts` push down
    *     directly and `ts_nanos` is derived only to keep the column
    *     contract stable for callers. [[graft.Session.builder]] sets
    *     `spark.sql.parquet.inferTimestampNTZ.enabled=false` so the scan
    *     emits TIMESTAMP_LTZ (UTC session) rather than NTZ; a session
    *     without it still works via the NTZ cast branch, at the cost of
    *     the pushdown (the cast sits between filter and scan).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // schema inference on a nanos file without the legacy conf fails
    // INSIDE load() with Spark's raw "Illegal Parquet type" — rethrow
    // with the one-line fix so the misconfiguration names its remedy
    val raw =
      try load(spark, dir, "events")
      catch {
        case e: Throwable if String.valueOf(e.getMessage).contains("NANOS") =>
          throw new IllegalArgumentException(
            s"""events.parquet stores ts as TIMESTAMP(NANOS): build the session
               |with .config("$NanosAsLongConf", "true") before loading it"""
              .stripMargin, e)
      }
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) surfaced as long under nanosAsLong
        raw
          .withColumn("ts_nanos", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampType =>
        raw.withColumn("ts_nanos", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType => // session missing inferTimestampNTZ=false
        raw
          .withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_nanos", unix_micros(col("ts")) * lit(1000L))
      case other =>
        throw new IllegalArgumentException(
          s"events.parquet ts column has unsupported dtype $other; expected " +
            s"TIMESTAMP(MICROS), TIMESTAMP_NTZ, or TIMESTAMP(NANOS)-as-long " +
            s"(set $NanosAsLongConf=true for nanos files)")
    }
  }
  /** True when events.parquet physically stores `ts` as the legacy nanos
    * long — i.e. when [[events]]' `ts_nanos` is a RAW pushable column.
    * Range scans conjoin the `ts_nanos` twin predicate only then; on
    * native-micros files the base predicate on `ts` pushes directly and
    * the twin would be a redundant per-row filter on a derived column.
    */
  def eventsHasRawNanos(spark: SparkSession, dir: String): Boolean =
    load(spark, dir, "events").schema("ts").dataType ==
      org.apache.spark.sql.types.LongType

  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

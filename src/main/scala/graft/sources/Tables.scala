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
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsWithRawNanosFlag(spark, dir)._1

  /** [[events]] plus whether the file physically stores `ts` as the
    * legacy nanos long — i.e. whether the returned `ts_nanos` is a RAW
    * pushable column. Range scans conjoin the `ts_nanos` twin predicate
    * only then; on native-micros files the base predicate on `ts` pushes
    * directly and the twin would be a redundant per-row filter on a
    * derived column. One parquet footer read serves both the frame and
    * the flag — callers must not re-infer the schema to learn it.
    */
  def eventsWithRawNanosFlag(spark: SparkSession,
      dir: String): (DataFrame, Boolean) = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = eventsPhysical(spark, dir)
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) surfaced as long under nanosAsLong
        (raw
          .withColumn("ts_nanos", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts DIV 1000)")), true)
      case TimestampType =>
        (raw.withColumn("ts_nanos", unix_micros(col("ts")) * lit(1000L)), false)
      case TimestampNTZType => // session missing inferTimestampNTZ=false
        // WARN: the cast below sits between any caller filter and the
        // scan, so ts predicates stop pushing down — name the fix here
        // rather than letting the slow plan stay anonymous
        System.err.println(
          "[graft] events.ts scanned as TIMESTAMP_NTZ: set " +
            "spark.sql.parquet.inferTimestampNTZ.enabled=false (as " +
            "graft.Session.builder does) to restore ts predicate pushdown")
        (raw
          .withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_nanos", unix_micros(col("ts")) * lit(1000L)), false)
      case other =>
        throw new IllegalArgumentException(
          s"events.parquet ts column has unsupported dtype $other; expected " +
            s"TIMESTAMP(MICROS), TIMESTAMP_NTZ, or TIMESTAMP(NANOS)-as-long " +
            s"(set $NanosAsLongConf=true for nanos files)")
    }
  }

  /** The UNADAPTED events frame (physical schema as the scan reports it).
    * Schema inference on a nanos file without the legacy conf fails with
    * Spark's raw "Illegal Parquet type" — rethrown here with the one-line
    * fix so the misconfiguration names its remedy. Shared by [[events]]
    * and the streaming replay (which needs the physical schema to declare
    * the file-stream source).
    */
  def eventsPhysical(spark: SparkSession, dir: String): DataFrame =
    try load(spark, dir, "events")
    catch {
      case e: Throwable if String.valueOf(e.getMessage).contains("NANOS") =>
        throw new IllegalArgumentException(
          s"""events.parquet stores ts as TIMESTAMP(NANOS): build the session
             |with .config("$NanosAsLongConf", "true") before loading it"""
            .stripMargin, e)
    }

  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  // ---------------------------------------------------------------------
  // Schema-drift tripwire
  // ---------------------------------------------------------------------

  /** Expected logical shape of every driver test table, as EQUIVALENCE
    * CLASSES per column: the upstream generator has silently flipped
    * physical encodings between rounds (events.ts TIMESTAMP(NANOS) →
    * micros in r9, costing 34 queries for a round), so the tripwire
    * accepts any encoding an engine loader already adapts to and fails —
    * with a named diff — on anything else: a missing column, a rename, or
    * a dtype outside its class.
    *
    * Classes: `i` int32/int64 (key/count widths — both sides of the
    * oracle read the same file, so width flips are lossless), `f`
    * float/double, `s` string, `t` any timestamp encoding the events
    * loader branches on (micros, NTZ, nanos-as-long), `vf` float/double
    * vector.
    */
  private val ExpectedTables: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "i", "r_name" -> "s"),
    "nation" -> Seq("n_nationkey" -> "i", "n_name" -> "s", "n_regionkey" -> "i"),
    "customer" -> Seq("c_custkey" -> "i", "c_name" -> "s",
      "c_nationkey" -> "i", "c_acctbal" -> "f", "c_mktsegment" -> "s"),
    "supplier" -> Seq("s_suppkey" -> "i", "s_name" -> "s",
      "s_nationkey" -> "i", "s_acctbal" -> "f"),
    "part" -> Seq("p_partkey" -> "i", "p_name" -> "s", "p_brand" -> "s",
      "p_type" -> "s", "p_size" -> "i", "p_retailprice" -> "f"),
    "orders" -> Seq("o_orderkey" -> "i", "o_custkey" -> "i",
      "o_orderstatus" -> "s", "o_totalprice" -> "f", "o_orderdate" -> "t",
      "o_orderpriority" -> "s"),
    "lineitem" -> Seq("l_orderkey" -> "i", "l_partkey" -> "i",
      "l_suppkey" -> "i", "l_linenumber" -> "i", "l_quantity" -> "f",
      "l_extendedprice" -> "f", "l_discount" -> "f", "l_tax" -> "f",
      "l_returnflag" -> "s", "l_linestatus" -> "s", "l_shipdate" -> "t"),
    "events" -> Seq("event_id" -> "i", "ts" -> "t", "user_id" -> "i",
      "event_type" -> "s", "value" -> "f", "props" -> "s"),
    "documents" -> Seq("doc_id" -> "i", "text" -> "s", "lang" -> "s",
      "source" -> "s", "n_chars" -> "i"),
    "embeddings" -> Seq("vec_id" -> "i", "embedding" -> "vf", "label" -> "i"))

  private def dtypeClass(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case IntegerType | LongType | ShortType => "i"
      case FloatType | DoubleType => "f"
      case StringType => "s"
      case TimestampType | TimestampNTZType => "t"
      case ArrayType(FloatType | DoubleType, _) => "vf"
      case _ => "?" + dt.simpleString
    }
  }

  /** Assert every test table still has its expected logical schema;
    * throw ONE exception naming every diff otherwise. Run as the Verify
    * preamble so an upstream testdata change fails the round loudly with
    * the diff, instead of as N silent per-query errors (the r9 failure
    * mode). `ts`-class columns additionally accept a raw long ONLY on
    * `events.ts` (the nanos-as-long encoding the loader adapts);
    * EXTRA columns are reported but non-fatal — every registered query
    * addresses columns by name, so additions cannot change results.
    */
  def assertExpectedSchemas(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.types.LongType
    val diffs = scala.collection.mutable.ArrayBuffer.empty[String]
    val extras = scala.collection.mutable.ArrayBuffer.empty[String]
    ExpectedTables.toSeq.sortBy(_._1).foreach { case (table, cols) =>
      val schemaOpt =
        try Some(
          (if (table == "events") eventsPhysical(spark, dir)
           else load(spark, dir, table)).schema)
        catch {
          case e: Throwable =>
            diffs += s"$table: unreadable (${e.getMessage})"
            None
        }
      schemaOpt.foreach { schema =>
        val actual = schema.fields.map(f => f.name -> f.dataType).toMap
        cols.foreach { case (name, cls) =>
          actual.get(name) match {
            case None =>
              diffs += s"$table.$name: MISSING (expected class '$cls'; " +
                s"present: ${schema.fieldNames.mkString(", ")})"
            case Some(dt) =>
              val got = dtypeClass(dt)
              val ok = got == cls ||
                (cls == "t" && table == "events" && name == "ts" && dt == LongType)
              if (!ok) diffs += s"$table.$name: dtype ${dt.simpleString} " +
                s"(class '$got') where class '$cls' expected"
          }
        }
        val unknown = schema.fieldNames.filterNot(cols.map(_._1).toSet)
        if (unknown.nonEmpty)
          extras += s"$table: extra columns ${unknown.mkString(", ")}"
      }
    }
    if (diffs.nonEmpty)
      throw new IllegalStateException(
        "test-table schema drift detected — upstream testdata changed shape;" +
          " adapt the loaders in graft.sources.Tables (see TESTDATA.md):\n  " +
          diffs.mkString("\n  "))
    if (extras.nonEmpty)
      System.err.println("[graft] schema tripwire: non-fatal additions — " +
        extras.mkString("; "))
  }
}

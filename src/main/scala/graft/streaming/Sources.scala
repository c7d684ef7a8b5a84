package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Stream source wiring (SURVEY.md §2.1 S1-S5, §2.8 ST8/ST9).
  *
  * The reference's ingestion chain is MQTT → bridge → Kafka → Spark
  * (reference/mqtt_producer.py, mqtt_to_kafka.py, spark_streaming.py:125-139);
  * the bridge is a pass-through, so the Kafka source covers its semantics
  * (SURVEY §7.3). Schema is ALWAYS enforced, never inferred — the
  * reference's own explicit decision (reference/Project Depth.md:66-68).
  */
object Sources {

  /** The exact reader configuration [[kafka]] applies — split out as data
    * so the source contract (format name + option keys/values mirroring
    * reference/spark_streaming.py:125-130) is testable in this build
    * environment, which ships without the spark-sql-kafka connector jar.
    */
  val KafkaFormat = "kafka"
  def kafkaOptions(bootstrapServers: String, topic: String,
      startingOffsets: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets)

  /** S1: Kafka stream source. Wiring matches
    * reference/spark_streaming.py:125-130 (subscribe + startingOffsets).
    * NOTE: needs the spark-sql-kafka connector on the runtime classpath
    * (`--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>`);
    * this build environment ships without it, so [[SourcesSpec]] asserts
    * the reader contract (format/options and the connector-missing
    * failure mode) and exercises [[parseJson]] on in-memory frames.
    */
  def kafka(spark: SparkSession, bootstrapServers: String, topic: String,
      startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format(KafkaFormat)
      .options(kafkaOptions(bootstrapServers, topic, startingOffsets))
      .load()

  /** S2: JSON decode against the explicit reading schema and flatten —
    * `CAST(value AS STRING)` → `from_json(schema)` → `data.*`
    * (reference/spark_streaming.py:136-139). Malformed payloads yield a
    * row of nulls; [[dropIncomplete]] guards them out (P9).
    */
  def parseJson(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw.selectExpr(s"CAST($jsonCol AS STRING) AS __json")
      .select(from_json(col("__json"), Schemas.sensorReading).as("data"))
      .select("data.*")

  /** P9: null/empty guard — drop rows missing any required field (the
    * relational form of the reference's `df.empty` / failed-parse guards,
    * reference/streamlit_dashboard.py:218-219, spark_streaming.py:67).
    */
  def dropIncomplete(df: DataFrame): DataFrame =
    df.na.drop("any", Seq("sensor_id", "timestamp"))

  /** Outbound wire format: readings → Kafka-shaped (key, value) payloads,
    * the inverse of [[parseJson]] (reference producer wire format,
    * reference/mqtt_producer.py:43-50,72). Keyed by sensor_id so a Kafka
    * sink partitions by sensor and per-sensor ordering is preserved.
    * Write with `.writeStream.format("kafka")` where the connector is
    * installed; the payload construction itself is connector-free.
    */
  def toKafkaPayload(readings: DataFrame): DataFrame =
    readings.select(
      col("sensor_id").cast("string").as("key"),
      to_json(struct(col("sensor_id"), col("location"), col("timestamp"),
        col("temperature"), col("humidity"), col("pressure"))).as("value"))

  /** S1-live: tail an append-only line file as a micro-batch stream via
    * the in-repo DataSource-V2 source ([[FileTailSource]]) — the
    * EXECUTABLE stand-in for the Kafka source in this connector-less
    * environment. Same downstream shape as [[kafka]]: a `value` string
    * column feeding [[parseJson]]; same `startingOffset` semantics
    * (earliest|latest) as Kafka's `startingOffsets`
    * (reference/spark_streaming.py:125-130).
    */
  def fileTail(spark: SparkSession, path: String,
      startingOffset: String = "latest"): DataFrame =
    spark.readStream
      .format(FileTailSource.ShortName)
      .option("path", path)
      .option("startingOffset", startingOffset)
      .load()

  /** ST9: deterministic rate-driven ingest simulator. `rate-micro-batch`
    * emits (timestamp, value=row index) deterministically per batch
    * (unlike `rate`, which is wall-clock bound); [[enrichRateRows]] turns
    * them into sensor readings. ~`rowsPerBatch` readings per micro-batch
    * reproduces the reference's ≥300 msg/min replay target
    * (reference/README.md:253, Project Scale.md:52).
    */
  def rateSimulated(spark: SparkSession, rowsPerBatch: Int = 10,
      startEpochMs: Long = 1704067200000L,
      advanceMsPerBatch: Long = 1000L): DataFrame =
    enrichRateRows(
      spark.readStream
        .format("rate-micro-batch")
        .option("rowsPerBatch", rowsPerBatch)
        .option("startTimestamp", startEpochMs)
        .option("advanceMillisPerBatch", advanceMsPerBatch)
        .load())

  /** Pure enrichment of rate-source rows (timestamp, value) into readings:
    * sensor assignment round-robins on the row index; measures use the
    * same key-derived hash randomness as [[graft.gen.Generator]] so the
    * stream is bit-deterministic. Split out for static unit testing.
    */
  def enrichRateRows(rate: DataFrame): DataFrame = {
    def u(salt: Int) =
      (pmod(xxhash64(col("value"), lit(salt)), lit(1000000007L)).cast("double")
        + lit(0.5)) / lit(1000000007.0)
    val dim = broadcast(
      rate.sparkSession.createDataFrame(Schemas.sensorDimRows))
    rate
      .withColumn("sensor_id",
        format_string("SENSOR_%03d", pmod(col("value"), lit(10)) + lit(1)))
      .join(dim, Seq("sensor_id"))
      .select(
        col("sensor_id"), col("location"), col("timestamp"),
        round(col("base_temp") + (u(1) * 6.0 - 3.0), 2).as("temperature"),
        round(lit(30.0) + u(2) * 50.0, 2).as("humidity"),
        round(lit(980.0) + u(3) * 40.0, 2).as("pressure"))
  }
}

package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Scans

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("parseJson enforces the reading schema and round-trips to_json (F14)") {
    val json = """{"sensor_id":"SENSOR_001","location":"warehouse_a",
      |"timestamp":"2024-01-01T00:01:00.000Z","temperature":21.5,
      |"humidity":55.0,"pressure":1001.2}""".stripMargin.replace("\n", "")
    val parsed = Sources.parseJson(Seq(json).toDF("value")).collect().head
    assert(parsed.getAs[String]("sensor_id") === "SENSOR_001")
    assert(parsed.getAs[Double]("temperature") === 21.5)
    assert(parsed.getAs[java.sql.Timestamp]("timestamp") === ts("2024-01-01 00:01:00"))
  }

  test("toKafkaPayload -> parseJson wire round-trip preserves every field (F14)") {
    val readings = Seq(graft.model.SensorReading(
      "SENSOR_007", "data_center", ts("2024-03-05 10:20:30"), 18.25, 40.5, 999.9))
    val wire = Sources.toKafkaPayload(readings.toDF())
    assert(wire.columns.toSeq === Seq("key", "value"))
    assert(wire.select("key").as[String].collect().head === "SENSOR_007")
    val back = Sources.parseJson(wire).as[graft.model.SensorReading].collect()
    assert(back.toSeq === readings)
  }

  test("malformed payloads become null rows and dropIncomplete guards them (P9)") {
    val df = Seq(
      """{"sensor_id":"SENSOR_001","location":"l","timestamp":"2024-01-01T00:00:00Z","temperature":1.0,"humidity":2.0,"pressure":3.0}""",
      "not json at all",
      """{"unexpected":"shape"}""").toDF("value")
    val parsed = Sources.parseJson(df)
    assert(parsed.count() === 3)
    assert(Sources.dropIncomplete(parsed).count() === 1)
  }

  test("enrichRateRows is deterministic and reading-shaped") {
    val rate = Seq(
      (ts("2024-01-01 00:00:00"), 0L),
      (ts("2024-01-01 00:00:01"), 1L),
      (ts("2024-01-01 00:00:02"), 11L) // same sensor as row 1, different draw
    ).toDF("timestamp", "value")
    val out = Sources.enrichRateRows(rate).orderBy("timestamp").collect()
    assert(out.length === 3)
    assert(out(0).getAs[String]("sensor_id") === "SENSOR_001")
    assert(out(1).getAs[String]("sensor_id") === "SENSOR_002")
    assert(out(2).getAs[String]("sensor_id") === "SENSOR_002")
    // same row index → same values on recompute (key-derived, not random)
    val again = Sources.enrichRateRows(rate).orderBy("timestamp").collect()
    assert(out.toSeq === again.toSeq)
    val t = out(0).getAs[Double]("temperature")
    assert(t > 22.0 - 3.5 && t < 22.0 + 3.5) // base_temp ± 3 jitter
  }

  test("rate-micro-batch stream starts and produces enriched readings") {
    val q = Sources.rateSimulated(spark, rowsPerBatch = 5).writeStream
      .format("memory").queryName("rate_sim").outputMode("append").start()
    try {
      // a rate source always has a next batch, so processAllAvailable()
      // would never return — poll until the first batches land
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("rate_sim").count() < 5
          && System.currentTimeMillis() < deadline) Thread.sleep(200)
      val rows = spark.table("rate_sim")
      assert(rows.count() >= 5)
      assert(rows.columns.toSeq === Seq("sensor_id", "location", "timestamp",
        "temperature", "humidity", "pressure"))
    } finally q.stop()
  }

  test("storageSize reports on-disk bytes per table (S14)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_size").toString
    Seq(1, 2, 3).toDF("v").write.parquet(s"$dir/t1")
    val out = Scans.storageSize(spark,
      Map("t1" -> s"$dir/t1", "missing" -> s"$dir/nope")).collect()
      .map(r => r.getAs[String]("table_name") -> r.getAs[Long]("bytes")).toMap
    assert(out("t1") > 0)
    assert(out("missing") === 0)
  }

  test("freshness lag is non-negative for past data (S12)") {
    val df = Seq(ts("2024-01-01 00:00:00")).toDF("t")
    val r = Scans.freshness(df, "t").collect().head
    assert(r.getAs[java.sql.Timestamp]("max_ts") === ts("2024-01-01 00:00:00"))
    assert(r.getAs[Double]("lag_seconds") > 0.0)
  }
}

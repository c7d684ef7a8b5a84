package graft.gen

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GeneratorSpec extends SparkSpec {
  import spark.implicits._

  private def gen(days: Int = 1) = Generator.sensorReadings(spark, days = days)

  test("shape: 10 sensors × ticks, schema matches the reference reading") {
    val df = gen()
    assert(df.columns.toSeq === Seq("sensor_id", "location", "timestamp",
      "temperature", "humidity", "pressure"))
    assert(df.count() === 10L * 24 * 60 / 2)
    assert(df.select("sensor_id").distinct().count() === 10)
  }

  test("determinism: same seed is bit-identical under different partitioning") {
    val a = gen().repartition(1).agg(sum(hash(col("*"))).as("h")).collect().head.getLong(0)
    val b = gen().repartition(13).agg(sum(hash(col("*"))).as("h")).collect().head.getLong(0)
    assert(a === b)
  }

  test("humidity clipped to [10, 98]; anomaly rate ≈ 5%") {
    val df = Generator.sensorReadings(spark, days = 7)
    val r = df.agg(min("humidity").as("lo"), max("humidity").as("hi")).collect().head
    assert(r.getAs[Double]("lo") >= 10.0)
    assert(r.getAs[Double]("hi") <= 98.0)
    // anomalies push temp ±15σ-ish; count rows far from the per-sensor base
    val n = df.count().toDouble
    val far = df.join(
        broadcast(graft.model.Schemas.sensorDimRows.toDF()
          .select(col("sensor_id"), col("base_temp"))), "sensor_id")
      .filter(abs(col("temperature") - col("base_temp")) > 10.0).count().toDouble
    assert(far / n > 0.02 && far / n < 0.15)
  }

  test("diurnal: afternoon hotter than night on average") {
    val df = gen(days = 2)
    val byHour = df.groupBy(hour(col("timestamp")).as("h"))
      .agg(avg("temperature").as("t")).collect()
      .map(r => r.getAs[Int]("h") -> r.getAs[Double]("t")).toMap
    assert(byHour(14) > byHour(2) + 5.0)
  }
}

package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Deterministic synthetic sensor-reading generator — the Spark port of
  * the reference's seeded demo dataset (reference/app.py:68-118) and live
  * producer semantics (reference/mqtt_producer.py:31-51):
  *
  *   - `days` × 10 sensors at `freqMinutes` cadence;
  *   - diurnal temperature: 8·sin((hour−6)·π/12) during 06:00–18:00,
  *     −4 °C at night (app.py:84-90);
  *   - Gaussian noise σ = 1.5 / 5.0 / 3.0 (temp/hum/press, app.py:91-93);
  *   - 5 % injected anomalies: temp ±15 °C, humidity −30/+25 (app.py:96-104);
  *   - humidity clipped to [10, 98] (app.py:94,100).
  *
  * Randomness is KEY-DERIVED, not partition-derived: every random draw is
  * a pure function of (sensor_id, tick, stream-index) through a 64-bit
  * hash → uniform → Box-Muller, so the output is bit-identical under any
  * partitioning or cluster size — the seed-stability requirement of
  * SURVEY §7.4(5) that `rand(seed)`/`randn(seed)` (partition-dependent)
  * cannot give.
  */
object Generator {

  private def u(streamIdx: Int, seed: Long) = {
    // uniform in (0,1): salted 64-bit hash of (sensor_id, tick, stream)
    val h = xxhash64(col("sensor_id"), col("__tick"), lit(streamIdx), lit(seed))
    (pmod(h, lit(1000000007L)).cast("double") + lit(0.5)) / lit(1000000007.0)
  }

  private def gauss(i1: Int, i2: Int, seed: Long) =
    sqrt(lit(-2.0) * log(u(i1, seed))) * cos(lit(2.0 * math.Pi) * u(i2, seed))

  def sensorReadings(spark: SparkSession, days: Int = 7, freqMinutes: Int = 2,
      seed: Long = 42L, startEpochSec: Long = 1704067200L /* 2024-01-01 UTC */)
      : DataFrame = {
    import spark.implicits._
    val ticksPerSensor = days * 24 * 60 / freqMinutes
    val dim = broadcast(Schemas.sensorDimRows.toDF())
    val ticks = spark.range(ticksPerSensor.toLong).withColumnRenamed("id", "__tick")
    val base = ticks.crossJoin(dim)
      .withColumn("timestamp",
        timestamp_seconds(lit(startEpochSec) + col("__tick") * (freqMinutes * 60)))
      .withColumn("__hour", hour(col("timestamp")))
    val diurnal = when(col("__hour").between(6, 18),
      lit(8.0) * sin((col("__hour") - lit(6)) * lit(math.Pi / 12.0)))
      .otherwise(lit(-4.0))
    val isAnomaly = u(0, seed) < lit(0.05)
    val anomalySign = when(u(1, seed) < lit(0.5), lit(-1.0)).otherwise(lit(1.0))
    base
      .withColumn("temperature", round(
        col("base_temp") + diurnal + gauss(2, 3, seed) * lit(1.5)
          + when(isAnomaly, anomalySign * lit(15.0)).otherwise(lit(0.0)), 2))
      .withColumn("humidity", round(
        greatest(least(
          col("base_hum") + gauss(4, 5, seed) * lit(5.0)
            + when(isAnomaly,
              when(anomalySign < 0, lit(-30.0)).otherwise(lit(25.0)))
              .otherwise(lit(0.0)),
          lit(98.0)), lit(10.0)), 2))
      .withColumn("pressure", round(
        lit(1000.0) + gauss(6, 7, seed) * lit(3.0), 2))
      .select("sensor_id", "location", "timestamp",
        "temperature", "humidity", "pressure")
  }
}

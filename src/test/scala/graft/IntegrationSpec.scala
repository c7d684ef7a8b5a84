package graft

import org.apache.spark.sql.functions._

import graft.gen.Generator
import graft.model.Schemas
import graft.ops.{Alerts, Anomaly, Forecast, WindowedAgg}

/** End-to-end sensor-domain composition on generated data — the
  * reference's actual workload shape: seeded generator (app.py demo data)
  * → 5-min rollup → IQR anomaly detection → threshold alerts with the
  * reference's own cut points (streamlit_dashboard.py:49-51,268-297) →
  * per-location forecast. Verifies the operators compose and the injected
  * 5% anomalies actually fire every downstream detector, which is exactly
  * why the reference seeds them (app.py:73-75).
  */
class IntegrationSpec extends SparkSpec {

  private lazy val readings = Generator.sensorReadings(spark, days = 2).cache()

  test("5-min rollup covers every sensor with plausible windows") {
    val rollup = WindowedAgg.sensorRollup(readings)
    assert(rollup.select("sensor_id").distinct().count() === 10)
    // 2-min cadence → at most 3 readings per 5-min window per sensor
    val counts = rollup.agg(max("reading_count"), min("reading_count")).collect().head
    assert(counts.getLong(0) <= 3 && counts.getLong(1) >= 1)
  }

  test("IQR detector fires on the injected anomalies at roughly the seeded rate") {
    val flagged = Anomaly.flag(readings, "temperature",
      Anomaly.iqrBounds(readings, "temperature"))
    val rate = flagged.filter(col("is_anomaly")).count().toDouble / readings.count()
    // 5% injected ±15°C spikes; IQR over the mixed population catches most
    assert(rate > 0.01 && rate < 0.12, s"anomaly rate $rate out of band")
  }

  test("reference alert thresholds populate both severities on demo data") {
    val t = Alerts.Thresholds(
      high = Schemas.HighTempThreshold, low = Schemas.LowTempThreshold,
      criticalHigh = Schemas.CriticalHighTemp, criticalLow = Schemas.CriticalLowTemp)
    val rollup = Alerts.severityRollup(readings, "temperature", t, "location")
    val totals = rollup.agg(
      sum("n_critical").as("c"), sum("n_warning").as("w")).collect().head
    assert(totals.getLong(0) > 0, "no critical alerts — injected ±15°C spikes should breach 35/10")
    assert(totals.getLong(1) > 0, "no warnings")
    // alerts are the selective minority, not the bulk of readings
    val alertRate = rollup.agg(sum("n_alerts")).collect().head.getLong(0).toDouble /
      readings.count()
    assert(alertRate < 0.5)
  }

  test("per-location forecast produces finite forecasts for all 10 locations") {
    val f = Forecast.ols(
      readings.withColumn("event_id", monotonically_increasing_id()),
      "location", "timestamp", "temperature", "event_id")
    assert(f.count() === 10)
    val rows = f.collect()
    assert(rows.forall(r => !r.getAs[Double]("forecast").isNaN))
    assert(rows.forall(r => {
      val r2 = r.getAs[Double]("r2"); r2 >= 0.0 && r2 <= 1.0
    }))
    // forecasts stay within physically plausible bounds for the generator
    assert(rows.forall(r => math.abs(r.getAs[Double]("forecast")) < 100.0))
  }
}

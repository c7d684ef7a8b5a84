package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Core data model of the engine.
  *
  * Mirrors the reference pipeline's two logical tables plus its implicit
  * sensor dimension (see SURVEY.md §1.1):
  *   - raw sensor readings (reference/spark_streaming.py:43-50, init.sql:2-11)
  *   - 5-minute windowed aggregates (reference/init.sql:14-26)
  *   - sensor/location dimension (reference/app.py:52-63)
  *
  * Schemas are explicit `StructType` constants — never inferred — matching
  * the reference's own decision to enforce schemas on the stream
  * (reference/Project Depth.md:66-68).
  */
final case class SensorReading(
    sensor_id: String,
    location: String,
    timestamp: Timestamp,
    temperature: Double,
    humidity: Double,
    pressure: Double)

final case class SensorAggregate(
    sensor_id: String,
    window_start: Timestamp,
    window_end: Timestamp,
    avg_temperature: Double,
    avg_humidity: Double,
    avg_pressure: Double,
    min_temperature: Double,
    max_temperature: Double,
    reading_count: Long)

final case class SensorDim(
    sensor_id: String,
    location: String,
    lat: Double,
    lon: Double,
    base_temp: Double,
    base_hum: Double)

object Schemas {

  /** Wire/storage schema of the raw reading stream
    * (reference/spark_streaming.py:43-50).
    */
  val sensorReading: StructType = StructType(Seq(
    StructField("sensor_id", StringType),
    StructField("location", StringType),
    StructField("timestamp", TimestampType),
    StructField("temperature", DoubleType),
    StructField("humidity", DoubleType),
    StructField("pressure", DoubleType)))

  /** Materialized rollup schema (reference/init.sql:14-26). */
  val sensorAggregate: StructType = StructType(Seq(
    StructField("sensor_id", StringType),
    StructField("window_start", TimestampType),
    StructField("window_end", TimestampType),
    StructField("avg_temperature", DoubleType),
    StructField("avg_humidity", DoubleType),
    StructField("avg_pressure", DoubleType),
    StructField("min_temperature", DoubleType),
    StructField("max_temperature", DoubleType),
    StructField("reading_count", LongType)))

  /** The 10-sensor dimension hard-coded in the reference
    * (reference/app.py:52-63; coords reference/streamlit_dashboard.py:746-757).
    * Functionally a broadcast dim table joined to facts by location.
    */
  val sensorDimRows: Seq[SensorDim] = Seq(
    SensorDim("SENSOR_001", "warehouse_a", 40.7128, -74.0060, 22.0, 55.0),
    SensorDim("SENSOR_002", "warehouse_b", 40.7260, -73.9897, 21.5, 58.0),
    SensorDim("SENSOR_003", "factory_floor_1", 40.7489, -73.9680, 28.0, 45.0),
    SensorDim("SENSOR_004", "factory_floor_2", 40.7549, -73.9840, 27.5, 47.0),
    SensorDim("SENSOR_005", "office_building_a", 40.7580, -73.9855, 23.0, 50.0),
    SensorDim("SENSOR_006", "office_building_b", 40.7614, -73.9776, 22.5, 52.0),
    SensorDim("SENSOR_007", "data_center", 40.7505, -73.9934, 18.0, 40.0),
    SensorDim("SENSOR_008", "parking_garage", 40.7282, -73.9942, 20.0, 60.0),
    SensorDim("SENSOR_009", "loading_dock", 40.7400, -74.0000, 21.0, 62.0),
    SensorDim("SENSOR_010", "rooftop_unit", 40.7450, -73.9900, 19.0, 65.0))

  /** Alert thresholds (reference/streamlit_dashboard.py:49-51). */
  val HighTempThreshold = 30.0
  val LowTempThreshold = 15.0
  val HighHumidityThreshold = 80.0

  /** Severity cut points (reference/streamlit_dashboard.py:268-297). */
  val CriticalHighTemp = 35.0
  val CriticalLowTemp = 10.0
  val CriticalHighHumidity = 90.0
}

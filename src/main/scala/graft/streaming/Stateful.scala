package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.SensorReading

/** Last observed reading per sensor, carried across micro-batches. */
final case class SensorState(lastTemp: Double, lastTsMicros: Long)

/** A reading enriched with the change since the sensor's previous reading
  * (null on the very first observation of a sensor).
  */
final case class DeltaReading(
    sensor_id: String, timestamp: Timestamp, temperature: Double,
    delta: Option[Double], gap_seconds: Option[Double])

/** Custom streaming state beyond windowed aggregation (SURVEY §2.8 ST5;
  * the prompt's `flatMapGroupsWithState` path): per-sensor
  * previous-reading state producing streaming first differences — the
  * stateful analog of the batch `lag` operator (W2), which no built-in
  * streaming operator expresses (streaming doesn't support window
  * functions).
  *
  * State is one (double, long) per sensor — constant per key, so state
  * store size is bounded by sensor cardinality, not throughput.
  */
object Stateful {

  def deltas(readings: Dataset[SensorReading]): Dataset[DeltaReading] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.sensor_id)
      .flatMapGroupsWithState[SensorState, DeltaReading](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[SensorReading], state: GroupState[SensorState]) =>
          // within a batch, apply in event-time order for deterministic chaining
          val sorted = rows.toSeq.sortBy(r => (r.timestamp.getTime, r.temperature))
          var cur = state.getOption
          val out = sorted.map { r =>
            val tsMicros = r.timestamp.getTime * 1000L
            val d = cur.map(s =>
              DeltaReading(key, r.timestamp, r.temperature,
                Some(r.temperature - s.lastTemp),
                Some((tsMicros - s.lastTsMicros) / 1e6)))
              .getOrElse(DeltaReading(key, r.timestamp, r.temperature, None, None))
            cur = Some(SensorState(r.temperature, tsMicros))
            d
          }
          cur.foreach(state.update)
          out.iterator
      }
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig}

import graft.model.SensorReading
import graft.ops.{Freq, Kll, KllBuf, MgBuf}

/** Last observed reading per sensor, carried across micro-batches. */
final case class SensorState(lastTemp: Double, lastTsMicros: Long)

/** A reading enriched with the change since the sensor's previous reading
  * (null on the very first observation of a sensor).
  */
final case class DeltaReading(
    sensor_id: String, timestamp: Timestamp, temperature: Double,
    delta: Option[Double], gap_seconds: Option[Double])

/** Exponentially-weighted running state per sensor. */
final case class EwmaState(ewma: Double, n: Long, lastTsMicros: Long)

/** Per-reading EWMA verdict, or the terminal offline marker a key's
  * event-time timeout emits (`ewma` carries the last state; `temperature`
  * is NaN and `deviation` 0.0 — there is no reading at eviction time;
  * `went_offline = true`, exactly once per silence).
  */
final case class EwmaReading(
    sensor_id: String, timestamp: Timestamp, temperature: Double,
    ewma: Double, deviation: Double, is_anomaly: Boolean,
    went_offline: Boolean)

/** Custom streaming state beyond windowed aggregation (SURVEY §2.8 ST5;
  * the prompt's `flatMapGroupsWithState` path): per-sensor
  * previous-reading state producing streaming first differences — the
  * stateful analog of the batch `lag` operator (W2), which no built-in
  * streaming operator expresses (streaming doesn't support window
  * functions).
  *
  * State is one (double, long) per sensor — constant per key, so state
  * store size is bounded by sensor cardinality, not throughput. That
  * bound still leaks on an UNBOUNDED key space (devices churn; a retired
  * sensor's row lives forever under NoTimeout) — [[ewmaAnomalies]] is
  * the timeout-disciplined form: event-time timeouts evict idle keys
  * at the watermark AND turn the eviction itself into signal (the
  * offline-sensor marker), so state size tracks ACTIVE keys only.
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

  /** Streaming per-sensor EWMA anomaly detection WITH state hygiene —
    * `flatMapGroupsWithState` + event-time timeout:
    *
    *   - each reading updates the key's EWMA (`ewma += α·(x − ewma)`)
    *     and is emitted with its deviation from the PRE-update EWMA and
    *     an `is_anomaly` verdict (`deviation > threshold`, first reading
    *     never anomalous — no baseline yet);
    *   - after every batch the key re-arms an event-time timeout at
    *     `last event + idleMs`; when the WATERMARK passes that with
    *     no new data, the key emits ONE terminal `went_offline` marker
    *     and its state is REMOVED — the silent-device detector and the
    *     state-store bound in one mechanism (timeouts fire in the batch
    *     after the watermark moves, so detection latency is one batch
    *     past the horizon — the price of event-time discipline).
    *
    * Within a batch, rows apply in event-time order so the EWMA chain is
    * deterministic under shuffle; `alpha` ∈ (0, 1].
    */
  /** The EWMA fold both state APIs share: apply a batch's rows in
    * event-time order to the prior state, emitting one verdict per row.
    */
  private def ewmaBatch(key: String, rows: Iterator[SensorReading],
      prior: Option[EwmaState], alpha: Double,
      threshold: Double): (Seq[EwmaReading], Option[EwmaState]) = {
    val sorted = rows.toSeq.sortBy(r => (r.timestamp.getTime, r.temperature))
    var cur = prior
    val out = sorted.map { r =>
      val tsMicros = r.timestamp.getTime * 1000L
      val (dev, anom, next) = cur match {
        case Some(s) =>
          val d = math.abs(r.temperature - s.ewma)
          (d, d > threshold,
            EwmaState(s.ewma + alpha * (r.temperature - s.ewma),
              s.n + 1, math.max(s.lastTsMicros, tsMicros)))
        case None =>
          (0.0, false, EwmaState(r.temperature, 1L, tsMicros))
      }
      cur = Some(next)
      EwmaReading(key, r.timestamp, r.temperature, next.ewma, dev,
        anom, went_offline = false)
    }
    (out, cur)
  }

  /** The terminal went-offline record an idle key's eviction emits. */
  private def offlineMarker(key: String, s: EwmaState): EwmaReading =
    EwmaReading(key, new Timestamp(s.lastTsMicros / 1000L), Double.NaN,
      s.ewma, 0.0, is_anomaly = false, went_offline = true)

  /** Timeout arm time for an active key, clamped past the watermark.
    * Defense-in-depth: the engine pre-filters late input for
    * event-time-timeout stateful ops (spec-pinned), so an accepted
    * row's `ts + idleMs` normally exceeds the watermark — but arming a
    * past timeout throws, and this contract is cheap to not depend on.
    */
  private def idleTimeoutAt(s: EwmaState, idleMs: Long,
      watermarkMs: Long): Long =
    math.max(s.lastTsMicros / 1000L + idleMs, watermarkMs + 1)

  def ewmaAnomalies(readings: Dataset[SensorReading],
      alpha: Double = 0.3, threshold: Double = 5.0,
      watermark: String = "10 minutes",
      idleMs: Long = 30 * 60 * 1000L): Dataset[EwmaReading] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
    require(idleMs > 0, s"idleMs must be positive: $idleMs")
    import readings.sparkSession.implicits._
    readings
      .withWatermark("timestamp", watermark)
      .groupByKey(_.sensor_id)
      .flatMapGroupsWithState[EwmaState, EwmaReading](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[SensorReading], state: GroupState[EwmaState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(offlineMarker(key, s))
          } else {
            val (out, cur) =
              ewmaBatch(key, rows, state.getOption, alpha, threshold)
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                idleTimeoutAt(s, idleMs, state.getCurrentWatermarkMs()))
            }
            out.iterator
          }
      }
  }

  /** [[ewmaAnomalies]] on the `transformWithState` API (Spark 4's
    * successor to `flatMapGroupsWithState`) — same semantics, pinned
    * row-identical by the spec, but built from the primitives the old
    * API fused together: a NAMED `ValueState` (a processor can hold
    * several independent state variables, each with its own optional
    * TTL), explicit event-time TIMERS (register/delete per key — the
    * old API's single implicit timeout generalized to many), and a
    * dedicated `handleExpiredTimer` callback instead of a
    * `hasTimedOut` branch inside the input handler. Requires the
    * RocksDB state store provider ([[graft.Session.rocksdbStateStore]])
    * — the engine rejects transformWithState on the HDFS-backed
    * default, which is the right constraint at 100 TB anyway.
    */
  def ewmaAnomaliesTws(readings: Dataset[SensorReading],
      alpha: Double = 0.3, threshold: Double = 5.0,
      watermark: String = "10 minutes",
      idleMs: Long = 30 * 60 * 1000L): Dataset[EwmaReading] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
    require(idleMs > 0, s"idleMs must be positive: $idleMs")

    class EwmaProcessor
        extends StatefulProcessor[String, SensorReading, EwmaReading] {
      @transient private var state:
        org.apache.spark.sql.streaming.ValueState[EwmaState] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        state = getHandle.getValueState[EwmaState]("ewma",
          Encoders.product[EwmaState], TTLConfig.NONE)

      override def handleInputRows(key: String,
          rows: Iterator[SensorReading],
          timerValues: TimerValues): Iterator[EwmaReading] = {
        val prior = if (state.exists()) Some(state.get()) else None
        val (out, cur) = ewmaBatch(key, rows, prior, alpha, threshold)
        cur.foreach { s =>
          state.update(s)
          // one idle timer per key: re-arm by deleting whatever stands
          getHandle.listTimers().foreach(getHandle.deleteTimer)
          getHandle.registerTimer(
            idleTimeoutAt(s, idleMs, timerValues.getCurrentWatermarkInMs()))
        }
        out.iterator
      }

      override def handleExpiredTimer(key: String,
          timerValues: TimerValues,
          expiredTimerInfo: ExpiredTimerInfo): Iterator[EwmaReading] = {
        // Unlike fMGWS's hasTimedOut contract, timers here are managed by
        // hand: a stale timer can fire for a key whose state was already
        // cleared, and state.get() on empty state would kill the query.
        if (!state.exists()) return Iterator.empty
        val s = state.get()
        state.clear()
        Iterator.single(offlineMarker(key, s))
      }
    }

    import readings.sparkSession.implicits._
    readings
      .withWatermark("timestamp", watermark)
      .groupByKey(_.sensor_id)
      .transformWithState(new EwmaProcessor, TimeMode.EventTime,
        OutputMode.Append, Encoders.product[EwmaReading])
  }

  /** Streaming per-key value-distribution monitoring (X107's streaming
    * form): each key carries ONE KLL sketch ([[graft.ops.Kll]]) in the
    * state store and emits its updated SNAPSHOT once per micro-batch it
    * received data in — bounded-memory running quantiles, the streaming
    * fix for the reference dashboard's recompute-quartiles-per-refresh
    * (streamlit_dashboard.py:657). State per key is the sketch
    * (≤ ~H·k doubles), independent of stream length; the emitted
    * snapshot's `n` is strictly increasing per key, so "latest" is
    * `argmax n` — an append sink needs no upsert to recover the current
    * answer. The sketch's deterministic worst-case rank-error bound is
    * ORDER-INDEPENDENT, so every snapshot's quantile reads are certified
    * regardless of micro-batch arrival order — what makes the streaming
    * answer oracle-able (`q_kll_stream_bound`) where an order-sensitive
    * statistic would not be.
    */
  def kllSnapshots(values: Dataset[(String, Double)],
      k: Int = 256): Dataset[KllSnapshot] = {
    import values.sparkSession.implicits._
    values
      .groupByKey(_._1)
      .flatMapGroupsWithState[KllBuf, KllSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)],
            state: GroupState[KllBuf]) =>
          var cur = state.getOption.getOrElse(Kll.empty(k))
          rows.foreach(r => cur = Kll.update(cur, r._2))
          state.update(cur)
          Iterator.single(KllSnapshot(key, cur))
      }
  }

  /** Streaming per-(key, time-bucket) KLL monitoring with a TRAILING
    * WINDOW (X120, the rolling form of [[kllSnapshots]]): each key
    * keeps one sketch PER `bucketSec`-wide event-time bucket, only the
    * newest `windowBuckets` buckets stay live, and every snapshot
    * carries the LOSSLESS KLL MERGE over the live window — "the
    * trailing 24 h vs baseline" drift monitor, where old drift AGES
    * OUT instead of being diluted into a cumulative sketch.
    *
    * State hygiene is two-tier (the X78 discipline — callers must
    * `withWatermark` the `ts` column):
    *   - WITHIN a live key, buckets at or below `maxBucket −
    *     windowBuckets` are dropped the moment the key's frontier
    *     advances (state per key is ≤ `windowBuckets` sketches, ever);
    *   - a fully idle key is evicted at the watermark once even a
    *     brand-new event could no longer share a trailing window with
    *     its newest bucket (timeout at `(maxBucket + windowBuckets +
    *     1) · bucketSec`) — eviction emits nothing and is invisible:
    *     a post-eviction event's window contains only new buckets by
    *     construction.
    *
    * A row older than the live window start (possible only under
    * late/out-of-order delivery beyond the watermark contract) is
    * skipped without counting. `n` counts rows absorbed and is
    * strictly increasing per key under in-order delivery (latest =
    * argmax n). The KLL rank-error envelope is order- AND
    * merge-independent, so every snapshot's KS-vs-baseline read is
    * certified regardless of how rows split across buckets and
    * micro-batches — what makes the rolling monitor oracle-able
    * (`q_ks_rolling_bound`).
    */
  def kllWindowedSnapshots(rows: Dataset[KeyedReading], k: Int,
      bucketSec: Long, windowBuckets: Int): Dataset[KllWinSnapshot] = {
    import rows.sparkSession.implicits._
    require(bucketSec > 0, s"kllWindowedSnapshots: bucketSec=$bucketSec")
    require(windowBuckets >= 1,
      s"kllWindowedSnapshots: windowBuckets=$windowBuckets")
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[KllWinState, KllWinSnapshot](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[KeyedReading],
            state: GroupState[KllWinState]) =>
          if (state.hasTimedOut) {
            // every live bucket is beyond any future trailing window
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(KllWinState(0L, Seq.empty))
            var n = prev.n
            val bufs = scala.collection.mutable.LinkedHashMap(
              prev.buckets.map(x => x.b -> x.sk): _*)
            var maxB =
              if (bufs.isEmpty) Long.MinValue else bufs.keys.max
            it.toVector.sortBy(r => (micros(r.ts), r.v)).foreach { r =>
              val b = Math.floorDiv(micros(r.ts) / 1000000L, bucketSec)
              if (b > maxB) maxB = b
              if (b > maxB - windowBuckets) {
                bufs(b) = Kll.update(bufs.getOrElse(b, Kll.empty(k)), r.v)
                n += 1
              } // else: older than the live window — aged out, skip
            }
            val live = bufs.toSeq.filter(_._1 > maxB - windowBuckets)
              .sortBy(_._1)
            val merged = live.map(_._2).reduceLeft(Kll.merge)
            state.update(KllWinState(n,
              live.map { case (b, s) => KllBucket(b, s) }))
            state.setTimeoutTimestamp(math.max(
              (maxB + windowBuckets + 1L) * bucketSec * 1000L + 1L,
              state.getCurrentWatermarkMs() + 1L))
            Iterator.single(KllWinSnapshot(key, n, live.map(_._1), merged))
          }
      }
  }

  /** Streaming SEASONAL PROFILE (X121, X100's live form): each key
    * carries 24 hour-of-day cells of EXACT INTEGER partials — (n,
    * Σv_micro as long, Σv_micro² as a stringified BigInt) — and emits
    * the full updated profile once per micro-batch it received data
    * in. Integer sums commute, so the streamed profile is
    * bit-identical to the batch aggregate under ANY arrival order or
    * micro-batch split — no in-order contract, no error envelope: the
    * one construction that lets a mean/stddev profile face a full
    * value oracle (`q_seasonal_stream`). Values scale to micro-units
    * half-up (the CUSUM discipline); Σv² runs in BigInt because at
    * 100 TB it overflows a long (~1e16 per row), stored as a string
    * cell — decimal state would hit the 38-digit encoder ceiling.
    * State per key is ≤ 24 cells regardless of stream length; `n` is
    * strictly increasing (latest = argmax n). Keyed on a bounded
    * vocabulary (event types), so NoTimeout is the correct hygiene —
    * the same contract as the KLL/MG monitor family.
    */
  def seasonalSnapshots(rows: Dataset[(String, Int, Long)])
      : Dataset[SeasonalSnapshot] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState[SeasonalSnapshot, SeasonalSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, Int, Long)],
            state: GroupState[SeasonalSnapshot]) =>
          val prev = state.getOption
            .getOrElse(SeasonalSnapshot(key, 0L, Seq.empty))
          var n = prev.n
          val cells = scala.collection.mutable.Map(
            prev.cells.map(c => c.hour -> (c.n, c.s1, BigInt(c.s2))): _*)
          it.foreach { case (_, h, v) =>
            val (cn, cs1, cs2) = cells.getOrElse(h, (0L, 0L, BigInt(0)))
            cells(h) = (cn + 1L, cs1 + v, cs2 + BigInt(v) * BigInt(v))
            n += 1L
          }
          val cur = SeasonalSnapshot(key, n,
            cells.toSeq.sortBy(_._1).map { case (h, (cn, s1, s2)) =>
              HourCell(h, cn, s1, s2.toString) })
          state.update(cur)
          Iterator.single(cur)
      }
  }

  /** Streaming per-key heavy-hitters monitoring (X112's streaming
    * form): each key carries ONE Misra–Gries sketch
    * ([[graft.ops.Freq]]) in the state store and emits its updated
    * SNAPSHOT once per micro-batch it received data in —
    * constant-memory "what dominates this stream" (k counters per key,
    * independent of stream length and item cardinality), the streaming
    * fix for the reference dashboard's per-refresh value_counts
    * recompute. `n` is strictly increasing per key, so latest =
    * argmax n through an append sink. MG's two-sided window
    * est ∈ [f − n/(k+1), f] holds for ANY single-stream arrival order
    * (and any partial merge), which is what lets the streamed state
    * face a value oracle (`q_hh_stream_bound`).
    */
  def mgSnapshots(items: Dataset[(String, String)],
      k: Int = 64): Dataset[MgSnapshot] = {
    import items.sparkSession.implicits._
    items
      .groupByKey(_._1)
      .flatMapGroupsWithState[MgBuf, MgSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)],
            state: GroupState[MgBuf]) =>
          var cur = state.getOption.getOrElse(Freq.empty(k))
          rows.foreach(r => cur = Freq.update(cur, r._2))
          state.update(cur)
          Iterator.single(MgSnapshot(key, cur))
      }
  }

  /** Streaming per-key distinct-count sketch (X106's streaming form):
    * each key carries the BOTTOM-K set of portable hash60 draws of the
    * items it has seen — k longs per key, independent of stream length
    * and item cardinality. Because the bottom-k of a SET is
    * order-independent, the streamed state is EXACTLY the batch
    * [[graft.ops.Sketches.kmvSketch]] of the same rows — hash-equal,
    * not within-a-bound — so the streamed estimate faces a full value
    * oracle (`q_kmv_stream`), and the snapshots still support the
    * X106 theta set algebra across keys/windows. `n` counts rows
    * processed (strictly increasing per emitting batch: latest =
    * argmax n through an append sink).
    */
  def kmvSnapshots(items: Dataset[(String, String)], k: Int = 64,
      salt: String = "kmv"): Dataset[KmvSnapshot] = {
    import items.sparkSession.implicits._
    require(k >= 2, s"kmvSnapshots: k must be >= 2, got $k")
    items
      .groupByKey(_._1)
      .flatMapGroupsWithState[KmvSnapshot, KmvSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)],
            state: GroupState[KmvSnapshot]) =>
          val prev = state.getOption.getOrElse(KmvSnapshot(key, 0L, Vector.empty))
          var ks = prev.ks.toVector
          var n = prev.n
          rows.foreach { r =>
            n += 1
            val h = graft.ext.PortableHash.hash60(r._2 + "|" + salt)
            val i = ks.search(h)(Ordering.Long) match {
              case scala.collection.Searching.Found(_) => -1
              case scala.collection.Searching.InsertionPoint(p) => p
            }
            // insert only a NEW draw that beats the current k-th
            if (i >= 0 && (ks.length < k || i < k)) {
              ks = (ks.take(i) :+ h) ++ ks.drop(i)
              if (ks.length > k) ks = ks.take(k)
            }
          }
          val cur = KmvSnapshot(key, n, ks)
          state.update(cur)
          Iterator.single(cur)
      }
  }

  /** Micros of a `Timestamp` — exact (getTime carries millis; getNanos
    * the full fractional second), so parquet TIMESTAMP_MICROS values
    * round-trip bit-identically through the typed encoders.
    */
  private def micros(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** [[funnelSnapshots]] on `transformWithState` — the Spark 4
    * successor API, same machine, same terminal-snapshot consumer
    * rule, but the horizon eviction runs on an EXPLICIT per-key timer
    * instead of fMGWS's implicit timeout slot, and the timer registry
    * is managed by hand: delete + re-arm each batch, and a stale
    * timer can legitimately fire for a key whose conversion already
    * cleared the state (the empty-state guard, not an error).
    * Requires the RocksDB provider — the engine rejects TWS on the
    * HDFS-backed default. Faces the SAME oracle as the fMGWS form
    * (`q_funnel_stream_tws` shares `q_funnel`'s SQL).
    */
  def funnelSnapshotsTws(rows: Dataset[UserEvent],
      steps: Seq[String], horizonSec: Long): Dataset[FunnelSnapshot] = {
    import rows.sparkSession.implicits._
    require(steps.length >= 2, "funnelSnapshotsTws: need at least 2 steps")
    val horizonUs = horizonSec * 1000000L

    class FunnelProcessor
        extends StatefulProcessor[String, UserEvent, FunnelSnapshot] {
      @transient private var state:
        org.apache.spark.sql.streaming.ValueState[FunnelSnapshot] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        state = getHandle.getValueState[FunnelSnapshot]("funnel",
          Encoders.product[FunnelSnapshot], TTLConfig.NONE)

      private def clearTimers(): Unit =
        getHandle.listTimers().foreach(getHandle.deleteTimer)

      override def handleInputRows(key: String,
          it: Iterator[UserEvent],
          timerValues: TimerValues): Iterator[FunnelSnapshot] = {
        val prev = if (state.exists()) Some(state.get()) else None
        var times = prev.map(_.times.toVector).getOrElse(Vector.empty)
        var n = prev.map(_.n).getOrElse(0L)
        it.toVector.sortBy(r => (micros(r.ts), r.event_id)).foreach { r =>
          val ts = micros(r.ts)
          n += 1
          if (times.isEmpty) {
            if (r.event_type == steps.head) times = Vector(ts)
          } else if (times.length < steps.length &&
              r.event_type == steps(times.length) && ts > times.last &&
              ts <= times.head + horizonUs) {
            times = times :+ ts
          }
        }
        if (times.isEmpty) {
          if (state.exists()) { state.clear(); clearTimers() }
          Iterator.empty
        } else if (times.length == steps.length) {
          state.clear(); clearTimers()
          Iterator.single(FunnelSnapshot(key, Long.MaxValue, times))
        } else {
          val cur = FunnelSnapshot(key, n, times)
          state.update(cur)
          clearTimers()
          getHandle.registerTimer(math.max(
            (times.head + horizonUs) / 1000L + 1L,
            timerValues.getCurrentWatermarkInMs() + 1L))
          Iterator.single(cur)
        }
      }

      override def handleExpiredTimer(key: String,
          timerValues: TimerValues,
          expiredTimerInfo: ExpiredTimerInfo): Iterator[FunnelSnapshot] = {
        if (!state.exists()) return Iterator.empty
        val s = state.get()
        state.clear()
        Iterator.single(FunnelSnapshot(key, Long.MaxValue, s.times))
      }
    }

    rows
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor, TimeMode.EventTime,
        OutputMode.Append, Encoders.product[FunnelSnapshot])
  }

  /** Streaming per-user FUNNEL tracking (X113's live form): each user
    * carries the ordered step-reach times in the state store and
    * advances the same first-occurrence machine the batch
    * [[graft.ops.Behavior.funnel]] computes — entry at the first
    * `steps(0)` event, each later step at the first event of its type
    * STRICTLY after the previous step and within the horizon of entry.
    * Rows are sorted by (ts, id) WITHIN each batch; correctness across
    * batches assumes in-order (time-ranged) delivery per key — the
    * replay harness guarantees it, and a production form would buffer
    * to the watermark first. Under that contract the streamed reach
    * times are EXACTLY the batch funnel's (first occurrence = min in
    * sorted order), so the streamed rollup faces `q_funnel`'s own
    * oracle hash-equal (`q_funnel_stream`).
    *
    * State tracks LIVE funnels only (the X78 timeout discipline —
    * callers must `withWatermark` the `ts` column):
    *   - a user who never reached `steps(0)` keeps NO state (the
    *     machine for an un-entered funnel is stateless);
    *   - conversion emits a terminal snapshot with `n = Long.MaxValue`
    *     and FREES the state (the outcome is final);
    *   - an un-converted funnel arms an event-time timeout at
    *     `entry + horizon`; when the watermark passes it the frozen
    *     outcome is equally final (in-order delivery: every event that
    *     could still advance it has ts ≤ entry + horizon and has
    *     already arrived), so eviction emits the same terminal
    *     snapshot and removes the state.
    * A post-eviction event can start a SECOND funnel (the engine no
    * longer remembers the first), but its snapshots carry small `n`
    * and a later entry time, so the consumer rule — latest = argmax
    * (n, then EARLIEST entry) — always answers with the FIRST funnel,
    * i.e. the batch semantics, regardless of watermark timing:
    * eviction is garbage collection, not a semantic knob. `n` counts
    * rows processed within the funnel's lifetime (strictly increasing
    * per live funnel).
    */
  def funnelSnapshots(rows: Dataset[UserEvent],
      steps: Seq[String], horizonSec: Long): Dataset[FunnelSnapshot] = {
    import rows.sparkSession.implicits._
    require(steps.length >= 2, "funnelSnapshots: need at least 2 steps")
    val horizonUs = horizonSec * 1000000L
    rows
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelSnapshot, FunnelSnapshot](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[UserEvent],
            state: GroupState[FunnelSnapshot]) =>
          if (state.hasTimedOut) {
            // horizon passed: the outcome froze — terminal snapshot
            val s = state.get
            state.remove()
            Iterator.single(FunnelSnapshot(key, Long.MaxValue, s.times))
          } else {
            val prev = state.getOption
            var times = prev.map(_.times.toVector).getOrElse(Vector.empty)
            var n = prev.map(_.n).getOrElse(0L)
            it.toVector.sortBy(r => (micros(r.ts), r.event_id)).foreach { r =>
              val ts = micros(r.ts)
              n += 1
              if (times.isEmpty) {
                if (r.event_type == steps.head) times = Vector(ts)
              } else if (times.length < steps.length &&
                  r.event_type == steps(times.length) && ts > times.last &&
                  ts <= times.head + horizonUs) {
                times = times :+ ts
              }
            }
            if (times.isEmpty) {
              // never entered: nothing to track, nothing to say
              if (state.exists) state.remove()
              Iterator.empty
            } else if (times.length == steps.length) {
              // converted: terminal snapshot now, state freed
              if (state.exists) state.remove()
              Iterator.single(FunnelSnapshot(key, Long.MaxValue, times))
            } else {
              val cur = FunnelSnapshot(key, n, times)
              state.update(cur)
              state.setTimeoutTimestamp(math.max(
                (times.head + horizonUs) / 1000L + 1L,
                state.getCurrentWatermarkMs() + 1L))
              Iterator.single(cur)
            }
          }
      }
  }

  /** Streaming per-user event-pair formation (X115's live form): the
    * state is ONE row — the user's last event — and each arriving
    * event emits the (from, to) transition it completes. Rows sorted
    * (ts, id) within each batch; in-order delivery per key across
    * batches (same contract as [[funnelSnapshots]]). The emitted pair
    * STREAM is exactly the batch lag-window's pair set, so any
    * downstream aggregation of the committed pairs (counts,
    * P(to\|from)) is hash-equal to the batch transition matrix
    * (`q_transitions_stream`). State per user is O(1) — the smallest
    * possible stateful enrichment.
    *
    * `maxGapSec` bounds state lifetime (the X78 timeout discipline —
    * callers must `withWatermark` the `ts` column): a pair forms ONLY
    * when the two events are at most `maxGapSec` apart (a longer
    * silence is a session boundary, not a transition), and a key idle
    * past that gap is evicted at the watermark emitting nothing.
    * Because the gap test is pure event-time arithmetic, eviction
    * timing cannot change the emitted pair set — a post-eviction
    * event's would-be pair had gap > maxGapSec and is dropped by the
    * predicate in any interleaving; state tracks ACTIVE users only.
    * The default (no gap) reproduces the plain lag semantics and never
    * arms a timeout.
    */
  def transitionPairs(rows: Dataset[UserEvent],
      maxGapSec: Long = Long.MaxValue)
      : Dataset[(String, String, String)] = {
    import rows.sparkSession.implicits._
    require(maxGapSec > 0, s"transitionPairs: maxGapSec=$maxGapSec")
    val unbounded = maxGapSec >= Long.MaxValue / 1000000L
    val gapUs = if (unbounded) Long.MaxValue else maxGapSec * 1000000L
    rows
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(String, Long, Long), (String, String, String)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[UserEvent],
            state: GroupState[(String, Long, Long)]) =>
          if (state.hasTimedOut) {
            // idle past the gap: no future event can pair with this
            // state (in-order delivery ⇒ its gap would exceed maxGap)
            state.remove()
            Iterator.empty
          } else {
            var last = state.getOption
            val out = Vector.newBuilder[(String, String, String)]
            it.toVector.sortBy(r => (micros(r.ts), r.event_id)).foreach { r =>
              val ts = micros(r.ts)
              last.foreach { case (from, lastTs, _) =>
                if (ts - lastTs <= gapUs) out += ((key, from, r.event_type))
              }
              last = Some((r.event_type, ts, r.event_id))
            }
            last.foreach { s =>
              state.update(s)
              if (!unbounded) state.setTimeoutTimestamp(math.max(
                s._2 / 1000L + gapUs / 1000L + 1L,
                state.getCurrentWatermarkMs() + 1L))
            }
            out.result().iterator
          }
      }
  }

  /** Streaming cohort-activity emission (X114's live form): per user,
    * the state is the cohort day (first active day) plus the set of
    * day-offsets already emitted; each NEW (user, day) activity emits
    * ONE (user, cohortDayEpoch, dayOffset) row — state-deduped
    * first-occurrence emission, so a plain count(*) per (cohort,
    * offset) over the committed append stream IS the distinct-user
    * retention matrix, hash-equal to the batch
    * [[graft.ops.Behavior.cohortRetention]] under the in-order
    * contract (the cohort day must be the true first day, which
    * in-order delivery guarantees).
    *
    * `retentionDays` bounds state lifetime (the X78 timeout
    * discipline — callers must `withWatermark` the `ts` column):
    * activity more than `retentionDays` after the cohort start RESETS
    * the user's cohort to that day (fixed-window-from-start
    * re-cohorting: tracking stops at the horizon and the user
    * re-enters as a NEW cohort on their next activity;
    * [[graft.ops.Behavior.cohortRetentionBounded]]
    * is the batch twin), and a key whose horizon fully passed the
    * watermark is evicted. Because the reset test is pure event-time
    * arithmetic, eviction timing cannot change the emitted rows: a
    * post-eviction event has offset > retentionDays by construction
    * (the watermark passed cohort + retention before it arrived) and
    * re-creates exactly the state the reset path would have built —
    * eviction is garbage collection; state tracks ACTIVE users only,
    * each at most `retentionDays + 1` offsets. The default (no bound)
    * reproduces the fixed-cohort semantics and never arms a timeout.
    */
  def cohortActivity(rows: Dataset[CohortEvent],
      retentionDays: Long = Long.MaxValue)
      : Dataset[(String, Long, Long)] = {
    import rows.sparkSession.implicits._
    require(retentionDays > 0, s"cohortActivity: retentionDays=$retentionDays")
    val unbounded = retentionDays >= 100000000L // ~270,000 years of days
    rows
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Seq[Long]), (String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[CohortEvent],
            state: GroupState[(Long, Seq[Long])]) =>
          if (state.hasTimedOut) {
            // horizon fully behind the watermark: any future activity
            // resets the cohort anyway — the state is dead weight
            state.remove()
            Iterator.empty
          } else {
            val days = it.map(_.epoch_day).toVector.sorted
            if (days.isEmpty) Iterator.empty
            else {
              val init = state.getOption
                .getOrElse((days.head, Vector.empty[Long]))
              var cohort = init._1
              var seen = init._2.toSet
              val out = Vector.newBuilder[(String, Long, Long)]
              days.foreach { d =>
                val off = d - cohort
                if (!unbounded && off > retentionDays) {
                  // past the tracking horizon: new cohort at this day
                  cohort = d
                  seen = Set(0L)
                  out += ((key, d, 0L))
                } else if (off >= 0 && !seen.contains(off)) {
                  seen += off
                  out += ((key, cohort, off))
                }
              }
              state.update((cohort, seen.toVector.sorted))
              if (!unbounded) state.setTimeoutTimestamp(math.max(
                (cohort + retentionDays + 1L) * 86400000L + 1L,
                state.getCurrentWatermarkMs() + 1L))
              out.result().iterator
            }
          }
      }
  }
}

/** One user event feeding the behavioral streaming states (X113/X115
  * live forms). `ts` is the event-time column callers watermark —
  * event-time timeouts require it, and keeping it in the row (rather
  * than pre-converted micros) lets the engine pre-filter late input
  * exactly as [[Stateful.ewmaAnomalies]] does.
  */
final case class UserEvent(user_id: String, event_type: String,
    ts: Timestamp, event_id: Long)

/** One user-day activity row feeding [[Stateful.cohortActivity]]:
  * `ts` is the watermark column, `epoch_day` its pre-derived day
  * (callers pin the derivation so batch and stream agree).
  */
final case class CohortEvent(user_id: String, ts: Timestamp,
    epoch_day: Long)

/** One key's running heavy-hitters state as of some micro-batch. */
final case class MgSnapshot(key: String, sketch: MgBuf)

/** One user's funnel progress as of some micro-batch: the reach time
  * (epoch micros) of each step completed so far, in step order.
  */
final case class FunnelSnapshot(key: String, n: Long, times: Seq[Long])

/** One key's running bottom-k distinct sketch as of some micro-batch. */
final case class KmvSnapshot(key: String, n: Long, ks: Seq[Long])

/** One keyed, event-timed reading feeding
  * [[Stateful.kllWindowedSnapshots]] — `ts` is the watermark column.
  */
final case class KeyedReading(key: String, ts: Timestamp, v: Double)

/** One hour-of-day cell of a key's seasonal profile: exact integer
  * partials (`s2` is Σv_micro² as a stringified BigInt — exact at any
  * scale, encoder-friendly).
  */
final case class HourCell(hour: Int, n: Long, s1: Long, s2: String)

/** One key's full seasonal profile as of some micro-batch. */
final case class SeasonalSnapshot(key: String, n: Long,
    cells: Seq[HourCell])

/** One live (bucket, sketch) pair of a key's trailing window. */
final case class KllBucket(b: Long, sk: KllBuf)

/** A key's trailing-window state: rows absorbed + live buckets. */
final case class KllWinState(n: Long, buckets: Seq[KllBucket])

/** One key's trailing-window snapshot: `buckets` are the live bucket
  * ids (ascending), `sketch` their lossless KLL merge.
  */
final case class KllWinSnapshot(key: String, n: Long,
    buckets: Seq[Long], sketch: KllBuf)

/** One key's running quantile-sketch state as of some micro-batch. */
final case class KllSnapshot(key: String, sketch: KllBuf)

/** Per-key integer CUSUM registers (X109's streaming state): scaled
  * prefix accumulators, running maxima, first-crossing micros (−1 =
  * no alarm yet), and the cumulative row count.
  */
final case class CusumState(su: Long, sd: Long, maxUp: Long, maxDn: Long,
    alarmUpUs: Long, alarmDnUs: Long, n: Long)

/** A key's CUSUM snapshot after a micro-batch (`n` strictly increasing
  * per key — latest = argmax n, as with [[KllSnapshot]]).
  */
final case class CusumSnapshot(key: String, su: Long, sd: Long,
    maxUp: Long, maxDn: Long, alarmUpUs: Long, alarmDnUs: Long, n: Long)

/** Streaming CUSUM changepoint monitor (X109's deployment shape): the
  * per-key baselines `(n₀, s₀)` are learned OFFLINE on the in-control
  * period ([[graft.ops.Drift.cusumChangepoint]]'s first-half
  * aggregation — metadata-sized, broadcast into the closure), then the
  * live stream folds the SAME all-integer recurrence row by row:
  * S⁺ += n₀·x − s₀ − κ·n₀ clamped at 0 (and the mirrored S⁻), first
  * h-crossing recorded once. Because every register is an integer and
  * rows apply in the same (ts, x, id) total order the batch windows
  * use, a time-split replay is EXACTLY the batch statistic — not
  * within-a-bound but hash-equal (`q_cusum_stream`), micro-batch
  * boundaries invisible by construction. Keys absent from `baselines`
  * are ignored (no in-control period — the batch form drops them too).
  */
object CusumStream {
  import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

  def monitor(rows: Dataset[(String, Long, Long, Long)],
      baselines: Map[String, (Long, Long)], hScaled: Long,
      slackScaled: Long): Dataset[CusumSnapshot] = {
    import rows.sparkSession.implicits._
    rows
      .filter(r => baselines.contains(r._1))
      .groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, CusumSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, Long, Long, Long)],
            state: GroupState[CusumState]) =>
          val (n0, s0) = baselines(key)
          var s = state.getOption.getOrElse(
            CusumState(0L, 0L, 0L, 0L, -1L, -1L, 0L))
          // (ts, x, id) order within the batch; time-split batches make
          // the cross-batch concatenation the global total order
          val sorted = it.toSeq.sortBy(r => (r._2, r._3, r._4))
          sorted.foreach { case (_, tsUs, x, _) =>
            val drift = slackScaled * n0
            val su = math.max(0L, s.su + (n0 * x - s0 - drift))
            val sd = math.max(0L, s.sd + (s0 - n0 * x - drift))
            val h = hScaled * n0
            s = CusumState(su, sd,
              math.max(s.maxUp, su), math.max(s.maxDn, sd),
              if (s.alarmUpUs >= 0L || su < h) s.alarmUpUs else tsUs,
              if (s.alarmDnUs >= 0L || sd < h) s.alarmDnUs else tsUs,
              s.n + 1)
          }
          state.update(s)
          Iterator.single(CusumSnapshot(key, s.su, s.sd, s.maxUp,
            s.maxDn, s.alarmUpUs, s.alarmDnUs, s.n))
      }
  }
}

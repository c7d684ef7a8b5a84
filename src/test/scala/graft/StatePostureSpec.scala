package graft

import graft.streaming.Pipeline

/** Pins the structural halves of the RocksDB state-store claim that
  * `POSTURE_10X.json`'s `state` section measures at full scale
  * (StatePosture): state rows track key cardinality on both providers,
  * eviction collapses state to the active keys, and — the provider's
  * reason to exist — the heap-backed default's `memoryUsedBytes` (which
  * IS executor heap: SizeEstimator over its in-heap version maps) grows
  * with keys while RocksDB's stays a bounded NATIVE allocation
  * (block cache + memtables), flat across a 10× key jump.
  *
  * These assertions measure a LIVE state store, so the memory readings
  * carry scheduling noise under full-suite load (one observed flake,
  * r13). Each threshold therefore gets ONE re-measurement on failure —
  * fresh queries, same thresholds: transient load can't fail the gate,
  * a real regression fails both attempts.
  */
class StatePostureSpec extends SparkSpec {

  private val K1 = 1000
  private val K10 = 10000

  /** Run `measure` (which returns the 1×/10× pair) and test `ok`; on a
    * threshold miss, measure ONCE more and assert on the fresh pair.
    */
  private def measuredAssert(
      measure: Int => (StatePosture.Meas, StatePosture.Meas))(
      ok: ((StatePosture.Meas, StatePosture.Meas)) => Unit): Unit = {
    val first = measure(1)
    try ok(first)
    catch {
      case _: org.scalatest.exceptions.TestFailedException =>
        ok(measure(2)) // the retry's failure IS the test failure
    }
  }

  test("heap provider: state memory is executor heap and grows with key cardinality; eviction collapses rows") {
    measuredAssert { attempt =>
      (StatePosture.run(spark, s"spec_heap_1_$attempt", K1,
        m => Pipeline.watermarkedRollup(m.toDF())),
        StatePosture.run(spark, s"spec_heap_10_$attempt", K10,
          m => Pipeline.watermarkedRollup(m.toDF())))
    } { case (m1, m10) =>
      assert(m1.rowsPeak === K1.toLong)
      assert(m10.rowsPeak === K10.toLong)
      // heap-resident state scales with keys: the 100 TB failure mode
      assert(m10.memUsedBytes > 3L * m1.memUsedBytes,
        s"heap state mem ${m1.memUsedBytes} -> ${m10.memUsedBytes} " +
          "did not grow with keys — is the provider actually heap-backed?")
      // watermark passed every window: state ∝ ACTIVE keys
      assert(m1.rowsAfterEvict <= 2 && m10.rowsAfterEvict <= 2)
    }
  }

  test("rocksdb provider: same state rows, flat bounded native memory across a 10x key jump") {
    measuredAssert { attempt =>
      StatePosture.withProvider(spark, Session.rocksdbStateStore) {
        (StatePosture.run(spark, s"spec_rocks_1_$attempt", K1,
          m => Pipeline.watermarkedRollup(m.toDF())),
          StatePosture.run(spark, s"spec_rocks_10_$attempt", K10,
            m => Pipeline.watermarkedRollup(m.toDF())))
      }
    } { case (m1, m10) =>
      assert(m1.rowsPeak === K1.toLong)
      assert(m10.rowsPeak === K10.toLong)
      // native allocation is bounded by conf (block cache + memtable),
      // not by key count: generous 1.5x margin over a 10x key jump, vs
      // the >3x the heap provider shows at the same jump
      assert(m10.memUsedBytes <= (1.5 * m1.memUsedBytes).toLong,
        s"rocksdb native mem ${m1.memUsedBytes} -> ${m10.memUsedBytes} " +
          "grew with keys — native bounding not in effect")
      assert(m1.rowsAfterEvict <= 2 && m10.rowsAfterEvict <= 2)
    }
  }

  test("behavior_eviction block: funnel/transition/cohort state collapses to the watermark driver after the horizons pass") {
    val json = StatePosture.behaviorEviction(spark, scales = Seq(200))
    for (op <- Seq("funnel_200", "transitions_200", "cohort_200")) {
      val block = json.split("\"" + op + "\"")(1).split("\\}")(0)
      assert(block.contains("\"state_rows_peak\": 200"),
        s"$op peak: $block")
      assert(block.contains("\"state_rows_after_evict\": 1"),
        s"$op did not evict to the driver key alone: $block")
    }
  }
}

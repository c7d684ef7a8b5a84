package graft

import org.scalatest.funsuite.AnyFunSuite

/** X144 bench window self-defense: a degraded host window is stamped in
  * the artifact (never mistakable for a regression) and the pre-run
  * probe retries boundedly before measuring through a storm.
  */
class BenchWindowSpec extends AnyFunSuite {
  private val floor = 0.067

  test("windowVerdict: ok within 4x floor, degraded above, unknown without samples") {
    assert(Bench.windowVerdict(None, floor) === "unknown")
    assert(Bench.windowVerdict(Some(floor), floor) === "ok")
    assert(Bench.windowVerdict(Some(floor * 4.0), floor) === "ok")
    assert(Bench.windowVerdict(Some(floor * 4.01), floor) === "degraded")
    assert(Bench.windowVerdict(Some(2.07), floor) === "degraded") // r17 driver re-run
  }

  test("awaitQuiet: forced-degraded probes exhaust bounded retries, sleeping between") {
    var sleeps = 0
    val (quiet, attempts) = Bench.awaitQuiet(() => Some(1.0), floor,
      attempts = 3, sleepMs = 1L, sleeper = _ => sleeps += 1)
    assert(!quiet && attempts === 3 && sleeps === 2)
  }

  test("awaitQuiet: a quiet window passes on the first attempt, no sleep") {
    var sleeps = 0
    val (quiet, attempts) = Bench.awaitQuiet(() => Some(floor * 2), floor,
      sleeper = _ => sleeps += 1)
    assert(quiet && attempts === 1 && sleeps === 0)
  }

  test("awaitQuiet: a storm that clears is ridden out, not measured through") {
    var n = 0
    val probe = () => { n += 1; Some(if (n <= 3) 5.0 else floor) }
    var sleeps = 0
    val (quiet, attempts) = Bench.awaitQuiet(probe, floor,
      sleeper = _ => sleeps += 1)
    assert(quiet && attempts === 2 && sleeps === 1)
  }

  test("awaitQuiet: a dead sentinel (no samples) is not quiet") {
    val (quiet, attempts) = Bench.awaitQuiet(() => None, floor,
      sleeper = _ => ())
    assert(!quiet && attempts === 3)
  }
}

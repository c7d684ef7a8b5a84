package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X108 — two-sample KS drift: hand-computed statistic, identical /
  * disjoint-distribution extremes, one-sided-key omission, and the
  * sketch estimate inside its deterministic envelope (exact in
  * exact mode).
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def vals(n: Int, seed: Long): Vector[Double] = {
    var x = seed
    Vector.fill(n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (x & 0xffffffL).toDouble / 1000.0
    }
  }

  test("ksExact matches the hand-computed statistic") {
    // A = {1, 2, 3}, B = {2, 3, 4}:
    //   x=1: |1/3 - 0|   = 1/3   x=2: |2/3 - 1/3| = 1/3
    //   x=3: |1 - 2/3|   = 1/3   x=4: |1 - 1|     = 0    → KS = 1/3
    val df = (Seq(1.0, 2.0, 3.0).map(("k", _, false)) ++
      Seq(2.0, 3.0, 4.0).map(("k", _, true))).toDF("g", "v", "isB")
    val out = Drift.ksExact(df, "g", "v", col("isB"))
      .as[(String, Long, Long, Double)].collect()
    assert(out === Array(("k", 3L, 3L, 0.333333)))
  }

  test("identical sides give ks 0; disjoint supports give ks 1; one-sided key omitted") {
    val same = vals(200, 3L)
    val df = (same.map(("same", _, false)) ++ same.map(("same", _, true)) ++
      vals(100, 5L).map(("apart", _, false)) ++
      vals(100, 7L).map(v => ("apart", v + 1e9, true)) ++
      vals(50, 9L).map(("only_a", _, false))).toDF("g", "v", "isB")
    val out = Drift.ksExact(df, "g", "v", col("isB"))
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("same")._4 === 0.0)
    assert(out("apart")._4 === 1.0)
    assert(!out.contains("only_a"))
  }

  test("sketch KS sits inside its deterministic envelope; exact mode is exact") {
    val rows = (vals(20000, 11L).map(("big", _, false)) ++
      vals(20000, 13L).map(v => ("big", v * 1.1 + 500.0, true)) ++
      vals(60, 15L).map(("tiny", _, false)) ++
      vals(60, 17L).map(v => ("tiny", v + 100.0, true))).toDF("g", "v", "isB")
    val exact = Drift.ksExact(rows, "g", "v", col("isB"))
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    val est = Drift.ksSketch(rows, "g", "v", col("isB"), 128)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, bn1, bn2, bks, bbound) = {
      val t = est("big"); (t._1, t._2, t._3, t._4, t._5)
    }
    assert(bn1 === 20000L && bn2 === 20000L)
    assert(math.abs(bks - exact("big")) <= bbound + 1e-9,
      s"big: |${bks} - ${exact("big")}| > $bbound")
    assert(bbound < 0.25, "bound uselessly wide at k=128, n=20k")
    // n < k on both sides: sketch IS the data, estimate equals exact
    val t = est("tiny")
    assert(t._5 === 0.0 && math.abs(t._4 - exact("tiny")) < 1e-6)
    // the audit query agrees with itself end to end
    val audit = Drift.ksSketchBound(rows, "g", "v", col("isB"), 128)
      .as[(String, Long, Long, Double, Boolean, Boolean)].collect()
    assert(audit.length === 2)
    audit.foreach { case (g, _, _, _, nOk, ksOk) =>
      assert(nOk && ksOk, s"$g audit booleans not TRUE")
    }
  }

  test("cusumChangepoint: alarm fires at the hand-computed first crossing; stationary key silent; baseline-less key dropped") {
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // cp: 20 baseline rows at 10, then a level shift to 30 at minute 20.
    // With κ=5, h=50: S⁺ grows 15/row after the shift → crosses 50 on
    // the 4th shifted row (minute 23).
    val cp = (0 until 20).map(i => ("cp", ts(i), 10.0, i.toLong)) ++
      (20 until 40).map(i => ("cp", ts(i), 30.0, i.toLong))
    val flat = (0 until 40).map(i => ("flat", ts(i), 10.0, 100L + i))
    val late = (30 until 40).map(i => ("late", ts(i), 99.0, 200L + i))
    val df = (cp ++ flat ++ late).toDF("g", "ts", "v", "id")
    val out = Drift.cusumChangepoint(df, "g", "ts", "v", "id",
        h = 50.0, slack = 5.0)
      .as[(String, Long, Long, Double, Double, Double,
        Option[java.sql.Timestamp], Option[java.sql.Timestamp])]
      .collect().map(r => r._1 -> r).toMap
    assert(!out.contains("late"), "key with empty baseline half must drop")
    val c = out("cp")
    assert(c._2 === 40L && c._3 === 20L && c._4 === 10.0)
    assert(c._5 === 300.0) // 20 shifted rows × (30−10−5)
    assert(c._6 === 0.0)
    assert(c._7 === Some(ts(23)) && c._8 === None)
    val f = out("flat")
    assert(f._4 === 10.0 && f._5 === 0.0 && f._6 === 0.0)
    assert(f._7 === None && f._8 === None)
  }

  test("cusum prefix identity matches the direct recurrence on noisy data") {
    def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 60000L)
    val xs = vals(300, 21L).map(v => v / 100.0 + 50.0) // ~[50, 218)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", ts(i), v, i.toLong) }
      .toDF("g", "ts", "v", "id")
    val kappa = 25.0
    val out = Drift.cusumChangepoint(df, "g", "ts", "v", "id",
        h = 500.0, slack = kappa)
      .as[(String, Long, Long, Double, Double, Double,
        Option[java.sql.Timestamp], Option[java.sql.Timestamp])]
      .collect().head
    // direct recurrence with the same scaled-integer arithmetic
    val n0 = 150L
    val xsS = xs.map(v => math.round(v * 1e6))
    val s0 = xsS.take(150).sum
    val kS = math.round(kappa * 1e6)
    var su = 0L; var sd = 0L; var mu = 0L; var md = 0L
    xsS.foreach { x =>
      su = math.max(0L, su + (n0 * x - s0 - kS * n0))
      sd = math.max(0L, sd + (s0 - n0 * x - kS * n0))
      mu = math.max(mu, su); md = math.max(md, sd)
    }
    def toVal(s: Long): Double =
      BigDecimal(s.toDouble / (n0 * 1000000L).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out._5 === toVal(mu), "max_cusum_up != direct recurrence")
    assert(out._6 === toVal(md), "max_cusum_dn != direct recurrence")
  }

  test("secondHalf splits on the integer epoch-micros midpoint; empty frame is all-A") {
    val df = Seq(
      ("2024-01-01 00:00:00", 1.0), ("2024-01-01 00:10:00", 2.0),
      ("2024-01-01 00:20:00", 3.0), ("2024-01-01 00:30:00", 4.0))
      .toDF("s", "v").withColumn("ts", to_timestamp(col("s")))
    val side = Drift.secondHalf(df, "ts")
    assert(df.filter(side).count() === 2L) // 00:15 midpoint: last two rows
    val empty = df.filter(lit(false))
    assert(empty.filter(Drift.secondHalf(empty, "ts")).count() === 0L)
  }
}

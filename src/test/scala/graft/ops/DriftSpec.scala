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

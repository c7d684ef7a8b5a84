package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X107 — KLL-style mergeable quantile sketch: exact-mode degeneration,
  * the guaranteed deterministic rank-error envelope (including on
  * adversarially sorted input), lossless merge across arbitrary splits,
  * CDF monotonicity/rank consistency, and the per-group DataFrame
  * aggregator against exact quartiles.
  */
class KllSpec extends SparkSpec {
  import spark.implicits._

  /** xorshift-ish deterministic value stream (no Random: portable). */
  private def vals(n: Int, seed: Long = 42L): Vector[Double] = {
    var x = seed
    Vector.fill(n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (x & 0xffffffL).toDouble / 1000.0
    }
  }

  private def build(xs: Seq[Double], k: Int): KllBuf =
    xs.foldLeft(Kll.empty(k))(Kll.update)

  private def trueRank(sorted: Vector[Double], v: Double): Long =
    sorted.count(_ <= v).toLong

  test("exact mode: n < k answers exact lower-empirical quantiles, min/max, ranks") {
    val xs = vals(100)
    val b = build(xs, k = 256)
    val sorted = xs.sorted
    assert(b.n === 100L && b.levels.length === 1)
    assert(Kll.errBound(b) === 0L)
    assert(b.minV === sorted.head && b.maxV === sorted.last)
    for (p <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
      val t = math.max(1, math.ceil(p * 100).toInt)
      assert(Kll.quantile(b, p) === sorted(t - 1), s"p=$p")
    }
    assert(Kll.rank(b, sorted(49)) === trueRank(sorted, sorted(49)))
  }

  test("guaranteed envelope holds at n=50k (random and adversarial sorted order)") {
    val base = vals(50000)
    for ((name, xs) <- Seq("random" -> base, "ascending" -> base.sorted,
        "descending" -> base.sorted.reverse)) {
      val b = build(xs, k = 256)
      val sorted = base.sorted
      val err = Kll.errBound(b)
      assert(err > 0 && err < 50000 / 20, s"$name: bound $err not sub-5%")
      for (p <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
        val t = math.ceil(p * 50000).toLong
        val r = trueRank(sorted, Kll.quantile(b, p))
        assert(math.abs(r - t) <= err,
          s"$name p=$p: true rank $r vs target $t exceeds guaranteed $err")
      }
    }
  }

  test("merge is lossless: split-merge ≡ envelope, n/min/max exact, any split") {
    val xs = vals(30000, seed = 7L)
    val sorted = xs.sorted
    for (cut <- Seq(1, 11, 15000, 29999)) {
      val (l, r) = xs.splitAt(cut)
      val m = Kll.merge(build(l, 128), build(r, 128))
      assert(m.n === 30000L)
      assert(m.minV === sorted.head && m.maxV === sorted.last)
      val err = Kll.errBound(m)
      for (p <- Seq(0.25, 0.5, 0.75)) {
        val t = math.ceil(p * 30000).toLong
        val rr = trueRank(sorted, Kll.quantile(m, p))
        assert(math.abs(rr - t) <= err, s"cut=$cut p=$p")
      }
    }
    // weight conservation through a deep merge tree (8-way)
    val parts = xs.grouped(3750).map(g => build(g, 128)).toSeq
    val deep = parts.reduce(Kll.merge)
    assert(deep.n === 30000L)
    assert(Kll.weighted(deep).map(_._2).sum === 30000L)
  }

  test("cdf is monotone in [0,1] and consistent with rank") {
    val xs = vals(20000, seed = 3L)
    val b = build(xs, k = 128)
    val splits = (0 to 20).map(i => i * 1000.0)
    val c = Kll.cdf(b, splits)
    assert(c.zip(c.tail).forall { case (a, bb) => a <= bb }, "cdf not monotone")
    assert(c.forall(x => x >= 0.0 && x <= 1.0))
    splits.foreach { s =>
      assert(Kll.cdf(b, Seq(s)).head === Kll.rank(b, s).toDouble / b.n)
    }
  }

  test("DataFrame aggregator: per-group quartiles within the guaranteed bound; small group exact") {
    val big = vals(8000).zipWithIndex.map { case (v, i) => ("hot", v, i) }
    val small = vals(50, seed = 9L).zipWithIndex.map { case (v, i) => ("cold", v, i) }
    val df = (big ++ small).toDF("g", "v", "id")
    val out = df.groupBy($"g")
      .agg(Kll.quartilesColumn(128, $"v").as("s"))
      .select($"g", $"s.n", $"s.minV", $"s.maxV", $"s.errBound", $"s.qs")
      .as[(String, Long, Double, Double, Long, Seq[Double])]
      .collect().map(r => r._1 -> r).toMap
    val hotSorted = big.map(_._2).sorted
    val (_, hn, hmin, hmax, herr, hqs) = {
      val t = out("hot"); (t._1, t._2, t._3, t._4, t._5, t._6)
    }
    assert(hn === 8000L && hmin === hotSorted.head && hmax === hotSorted.last)
    Seq(0.25, 0.5, 0.75).zip(hqs).foreach { case (p, est) =>
      val t = math.ceil(p * 8000).toLong
      val r = hotSorted.count(_ <= est).toLong
      assert(math.abs(r - t) <= herr, s"hot p=$p")
    }
    val coldSorted = small.map(_._2).sorted
    val (_, cn, _, _, cerr, cqs) = {
      val t = out("cold"); (t._1, t._2, t._3, t._4, t._5, t._6)
    }
    assert(cn === 50L && cerr === 0L)
    Seq(0.25, 0.5, 0.75).zip(cqs).foreach { case (p, est) =>
      assert(est === coldSorted(math.max(1, math.ceil(p * 50).toInt) - 1),
        s"cold p=$p not exact")
    }
  }

  test("quantileBound emits all-TRUE booleans and exact quartiles on a grouped frame") {
    val rows = vals(6000, seed = 11L).zipWithIndex.map { case (v, i) =>
      (s"t${i % 3}", v)
    }
    val out = Kll.quantileBound(rows.toDF("g", "v"), "g", "v", k = 128)
      .orderBy("g")
      .as[(String, Double, Double, Double, Long, Boolean, Boolean, Boolean, Boolean)]
      .collect()
    assert(out.length === 3)
    out.foreach { case (g, q1, med, q3, n, nOk, q1Ok, medOk, q3Ok) =>
      assert(n === 2000L, g)
      assert(nOk && q1Ok && medOk && q3Ok, s"$g bounds not all TRUE")
      assert(q1 < med && med < q3, g)
    }
  }

  test("daily partials merged across a window ≡ whole-window envelope (the X76 shape)") {
    val xs = vals(12000, seed = 5L)
    val days = xs.grouped(4000).toSeq // three "days"
    val partials = days.map(d => build(d, 128))
    val window = partials.reduce(Kll.merge)
    val sorted = xs.sorted
    val err = Kll.errBound(window)
    assert(window.n === 12000L)
    for (p <- Seq(0.25, 0.5, 0.75)) {
      val t = math.ceil(p * 12000).toLong
      val r = sorted.count(_ <= Kll.quantile(window, p)).toLong
      assert(math.abs(r - t) <= err, s"p=$p")
    }
  }

  test("sketch state survives a parquet round-trip and merges losslessly (materialized partials)") {
    val rows = vals(9000, seed = 13L).zipWithIndex.map { case (v, i) =>
      (s"g${i % 2}", i % 5, v) // (group, "day", value)
    }
    val df = rows.toDF("g", "day", "v")
    val partials = df.groupBy($"g", $"day")
      .agg(Kll.sketchColumn(128, $"v").as("sk"))
    val dir = java.nio.file.Files.createTempDirectory("kll-partials").toString
    partials.write.mode("overwrite").parquet(dir)
    val out = spark.read.parquet(dir)
      .groupBy($"g").agg(Kll.mergeQuartilesColumn(128, $"sk").as("o"))
      .select($"g", $"o.n", $"o.errBound", $"o.qs")
      .as[(String, Long, Long, Seq[Double])]
      .collect().map(r => r._1 -> r).toMap
    for (g <- Seq("g0", "g1")) {
      val mine = rows.filter(_._1 == g).map(_._3).sorted
      val (_, n, err, qs) = { val t = out(g); (t._1, t._2, t._3, t._4) }
      assert(n === mine.length.toLong, g)
      Seq(0.25, 0.5, 0.75).zip(qs).foreach { case (p, est) =>
        val t = math.ceil(p * mine.length).toLong
        val r = mine.count(_ <= est).toLong
        assert(math.abs(r - t) <= err, s"$g p=$p after parquet round-trip")
      }
    }
  }

  test("dailyQuantileBound: two-level partials-merge path emits all-TRUE booleans") {
    val rows = vals(6000, seed = 17L).zipWithIndex.map { case (v, i) =>
      (s"t${i % 3}", i % 7, v)
    }
    val out = Kll.dailyQuantileBound(rows.toDF("g", "day", "v"), "g",
        $"day", "v", k = 128)
      .orderBy("g")
      .as[(String, Double, Double, Double, Long, Boolean, Boolean, Boolean, Boolean)]
      .collect()
    assert(out.length === 3)
    out.foreach { case (g, q1, med, q3, n, nOk, q1Ok, medOk, q3Ok) =>
      assert(n === 2000L, g)
      assert(nOk && q1Ok && medOk && q3Ok, s"$g bounds not all TRUE")
      assert(q1 < med && med < q3, g)
    }
  }

  test("cdfBound: exact CDF replay plus in-envelope sketch estimates") {
    val rows = vals(5000, seed = 23L).zipWithIndex.map { case (v, i) =>
      (s"c${i % 2}", v)
    }
    val out = Kll.cdfBound(rows.toDF("g", "v"), "g", "v",
        Seq(1000.0, 8000.0), k = 128)
      .as[(String, Double, Double, Boolean)].collect()
    assert(out.length === 4)
    out.foreach { case (g, s, exact, ok) =>
      val mine = rows.filter(_._1 == g).map(_._2)
      val expect = BigDecimal(mine.count(_ <= s).toDouble / mine.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(exact === expect, s"$g@$s exact mismatch")
      assert(ok, s"$g@$s not within envelope")
    }
    intercept[IllegalArgumentException](
      Kll.cdfBound(rows.toDF("g", "v"), "g", "v", Nil))
  }

  test("config gates: odd or tiny k refused, mixed-k merge refused, empty sketch NaN") {
    intercept[IllegalArgumentException](Kll.empty(7))
    intercept[IllegalArgumentException](Kll.empty(4))
    intercept[IllegalArgumentException](
      Kll.merge(Kll.empty(64), Kll.empty(128)))
    val e = Kll.empty(64)
    assert(Kll.quantile(e, 0.5).isNaN)
    assert(Kll.cdf(e, Seq(1.0)).head.isNaN)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X112 — Misra–Gries mergeable heavy-hitters sketch: the hand-computed
  * decrement step, the guaranteed two-sided window on skewed data in
  * adversarial orders, guaranteed retention above the n/(k+1) support,
  * exact-mode degeneration, the PODS'12 merge rule, and the per-group
  * DataFrame audit.
  */
class FreqSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic zipf-ish item stream: item i appears ~c/i times —
    * real head skew, cardinality ≫ any test k (no Random: portable).
    */
  private def zipf(n: Int): Vector[String] = {
    var x = 42L
    Vector.fill(n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      val u = ((x & 0xffffffL).toDouble + 1.0) / 16777217.0
      // inverse-CDF of a discrete 1/i law truncated at 1000
      val i = math.min(1000, math.max(1, math.exp(u * math.log(1000.0)).toInt))
      s"item_$i"
    }
  }

  private def build(xs: Seq[String], k: Int): MgBuf =
    xs.foldLeft(Freq.empty(k))(Freq.update)

  private def freqs(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (kk, v) => kk -> v.size.toLong }

  private def assertWindow(b: MgBuf, f: Map[String, Long], label: String): Unit = {
    val n = b.n
    val k = b.k
    // every item — retained or evicted — sits in [f − n/(k+1), f]
    for ((item, cnt) <- f) {
      val est = Freq.estimate(b, item)
      assert(est <= cnt, s"$label: $item est $est > true $cnt")
      assert(est * (k + 1) >= cnt * (k + 1) - n,
        s"$label: $item est $est below window for true $cnt (n=$n, k=$k)")
    }
    // nothing invented: retained keys all exist with est <= f
    for ((kk, c) <- b.keys.zip(b.counts)) {
      assert(f.contains(kk) && c <= f(kk), s"$label: phantom counter $kk=$c")
    }
    assert(b.keys.length <= k, s"$label: ${b.keys.length} counters > k=$k")
  }

  test("hand-computed decrement step (k=2): counters and eviction match the classic trace") {
    // stream: a b a c  with k=2
    // a -> {a:1}; b -> {a:1,b:1}; a -> {a:2,b:1};
    // c (full, absent) -> decrement all, drop zeros -> {a:1}
    val b = build(Seq("a", "b", "a", "c"), k = 2)
    assert(b.n === 4L)
    assert(b.keys === Vector("a") && b.counts === Vector(1L))
    assert(Freq.estimate(b, "b") === 0L && Freq.estimate(b, "c") === 0L)
    // window still holds: f(a)=2 est 1 >= 2 - 4/3; f(b)=1 est 0 >= 1 - 4/3
    assertWindow(b, freqs(Seq("a", "b", "a", "c")), "trace")
  }

  test("guaranteed window holds on skewed 30k stream in random/sorted/reverse order") {
    val base = zipf(30000)
    val f = freqs(base)
    assert(f.size > 200, s"need cardinality >> k, got ${f.size}")
    for ((name, xs) <- Seq("random" -> base, "sorted" -> base.sorted,
        "reverse" -> base.sorted.reverse)) {
      assertWindow(build(xs, k = 32), f, name)
    }
  }

  test("items above the n/(k+1) support are guaranteed retained") {
    val base = zipf(30000)
    val f = freqs(base)
    val b = build(base, k = 32)
    val guaranteed = f.filter { case (_, c) => c * (b.k + 1) > b.n }
    assert(guaranteed.nonEmpty, "test needs at least one guaranteed heavy hitter")
    for ((item, _) <- guaranteed)
      assert(Freq.estimate(b, item) > 0L, s"guaranteed hitter $item evicted")
  }

  test("exact mode: cardinality <= k degenerates to exact counts") {
    val xs = Vector.tabulate(5000)(i => s"v_${i % 20}")
    val b = build(xs, k = 32)
    val f = freqs(xs)
    assert(b.keys.length === 20)
    for ((item, cnt) <- f) assert(Freq.estimate(b, item) === cnt)
    assert(Freq.errBound(b) === 5000L / 33L) // bound exists; error is 0
  }

  test("PODS'12 merge: any split keeps the combined-n window and <= k counters") {
    val base = zipf(30000)
    val f = freqs(base)
    for (cut <- Seq(1, 1000, 15000, 29999)) {
      val (l, r) = base.splitAt(cut)
      val m = Freq.merge(build(l, k = 32), build(r, k = 32))
      assert(m.n === 30000L)
      assertWindow(m, f, s"split@$cut")
    }
    // 8-way merge tree
    val parts = base.grouped(3750).map(build(_, k = 32)).toVector
    val m8 = parts.reduce(Freq.merge)
    assert(m8.n === 30000L)
    assertWindow(m8, f, "8-way")
  }

  test("per-group DataFrame audit: booleans all TRUE, exact side correct") {
    val base = zipf(8000)
    val rows = base.zipWithIndex.map { case (item, i) =>
      (if (i % 2 == 0) "g1" else "g2", item)
    }
    val df = rows.toDF("grp", "item")
    val out = Freq.heavyHittersBound(df, "grp", "item", k = 16).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getBoolean(4) && r.getBoolean(5)),
      "audit boolean violated")
    // exact side replay
    val g1 = rows.filter(_._1 == "g1").map(_._2)
    val fg1 = freqs(g1)
    val byItem = out.filter(_.getString(0) == "g1")
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(byItem === fg1)
    assert(out.filter(_.getString(0) == "g1").forall(_.getLong(3) === g1.size.toLong))
  }

  test("two-level merged audit over materialized partials stays green") {
    val base = zipf(8000)
    val rows = base.zipWithIndex.map { case (item, i) =>
      ("g", s"part_${i % 7}", item)
    }
    val df = rows.toDF("grp", "part", "item")
    val out = Freq.heavyHittersMergedBound(df, "grp", col("part"), "item", k = 16)
      .collect()
    assert(out.length === freqs(base).size)
    assert(out.forall(r => r.getBoolean(4) && r.getBoolean(5)),
      "merged audit boolean violated")
  }

  test("sketch state survives a parquet round trip") {
    val base = zipf(5000)
    val df = base.map(("g", _)).toDF("grp", "item")
    val sk = df.groupBy(col("grp")).agg(Freq.mgColumn(24, col("item")).as("sketch"))
    val dir = java.nio.file.Files.createTempDirectory("freq_rt").toString
    sk.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val merged = back.groupBy(col("grp"))
      .agg(Freq.mgMergeColumn(24, col("sketch")).as("sketch"))
      .select(col("sketch.n"), col("sketch.keys"), col("sketch.counts"))
      .as[(Long, Seq[String], Seq[Long])].head()
    assert(merged._1 === 5000L)
    assertWindow(MgBuf(24, merged._1, merged._2, merged._3), freqs(base),
      "round-trip")
  }
}

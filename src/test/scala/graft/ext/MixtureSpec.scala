package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def avail(rows: (String, Long)*): DataFrame =
    rows.toDF("domain", "tokens_avail")

  private def allocMap(out: DataFrame): Map[String, Double] =
    out.collect().map(r =>
      r.getString(0) -> r.getAs[Double]("alloc_tokens")).toMap

  test("solveBudget: allocations sum to the budget and respect caps") {
    val a = avail("web" -> 1000L, "books" -> 100L, "wiki" -> 50L)
    val out = Mixture.solveBudget(a, "domain", Map.empty, budgetTokens = 600L)
    val m = allocMap(out)
    assert(math.abs(m.values.sum - 600.0) < 1e-6)
    // uniform weights want 200 each; wiki caps at 50, books at 100, web
    // absorbs the remainder
    assert(m("wiki") === 50.0 && m("books") === 100.0 && m("web") === 450.0)
    val capped = out.collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("capped")).toMap
    assert(capped === Map("web" -> false, "books" -> true, "wiki" -> true))
  }

  test("solveBudget: uncapped allocations are proportional to weights") {
    val a = avail("a" -> 10000L, "b" -> 10000L, "c" -> 10L)
    val out = Mixture.solveBudget(a, "domain",
      Map("a" -> 3.0, "b" -> 1.0), budgetTokens = 4010L)
    val m = allocMap(out)
    assert(m("c") === 10.0) // capped
    assert(math.abs(m("a") / m("b") - 3.0) < 1e-9) // 3:1 target preserved
    assert(math.abs(m.values.sum - 4010.0) < 1e-6)
  }

  test("solveBudget: budget beyond total capacity caps everything; zero budget allocates nothing") {
    val a = avail("a" -> 100L, "b" -> 200L)
    val over = allocMap(Mixture.solveBudget(a, "domain", Map.empty, 10000L))
    assert(over === Map("a" -> 100.0, "b" -> 200.0))
    val zero = allocMap(Mixture.solveBudget(a, "domain", Map.empty, 0L))
    assert(zero === Map("a" -> 0.0, "b" -> 0.0))
  }

  test("solveBudget: maxEpochs raises capacity; epochs column feeds upsampleEpochs") {
    val a = avail("small" -> 100L, "big" -> 10000L)
    val out = Mixture.solveBudget(a, "domain", Map.empty,
      budgetTokens = 1000L, maxEpochs = 3.0)
    val rows = out.collect().map(r => r.getString(0) ->
      (r.getAs[Double]("alloc_tokens"), r.getAs[Double]("epochs"))).toMap
    // small caps at 300 (3 epochs of 100), big takes the remaining 700
    assert(rows("small") === ((300.0, 3.0)))
    assert(rows("big") === ((700.0, 0.07)))
  }

  test("solveBudget: allocation is monotone in budget") {
    val a = avail("a" -> 500L, "b" -> 2000L, "c" -> 80L)
    val w = Map("a" -> 2.0, "c" -> 5.0)
    val seq = Seq(100L, 500L, 1000L, 2580L).map(b =>
      allocMap(Mixture.solveBudget(a, "domain", w, b)))
    seq.sliding(2).foreach { case Seq(lo, hi) =>
      lo.keys.foreach(k => assert(lo(k) <= hi(k) + 1e-9,
        s"domain $k shrank when the budget grew: $lo -> $hi"))
    }
    assert(math.abs(seq.last.values.sum - 2580.0) < 1e-6) // full capacity
  }

  test("solveBudget rejects non-positive weights, budget, maxEpochs") {
    val a = avail("a" -> 10L)
    intercept[IllegalArgumentException] {
      Mixture.solveBudget(a, "domain", Map("a" -> 0.0), 10L)
    }
    intercept[IllegalArgumentException] {
      Mixture.solveBudget(a, "domain", Map.empty, -1L)
    }
    intercept[IllegalArgumentException] {
      Mixture.solveBudget(a, "domain", Map.empty, 10L, maxEpochs = 0.0)
    }
  }

  private def scoredDocs: DataFrame = Seq(
    // (id, domain, tokens, score)
    (1L, "web", 10L, 0.9), (2L, "web", 10L, 0.8), (3L, "web", 10L, 0.7),
    (4L, "web", 10L, 0.6), (5L, "web", 10L, 0.5),
    (6L, "books", 20L, 0.95), (7L, "books", 20L, 0.4)
  ).toDF("doc_id", "domain", "n_tokens", "score")

  test("fillByQuality: greedy best-first fill under the domain allocation") {
    val alloc = Seq(("web", 25.0), ("books", 20.0))
      .toDF("domain", "alloc_tokens")
    val out = Mixture.fillByQuality(scoredDocs, "doc_id", "domain",
      "n_tokens", "score", alloc)
    val keep = out.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    // web: docs 1,2 fit (20 < 25), doc 3 admitted at cum 20 < 25
    // (overshoot by part of the last doc), 4,5 rejected
    assert(keep === Map(1L -> true, 2L -> true, 3L -> true, 4L -> false,
      5L -> false, 6L -> true, 7L -> false))
    // the admitted set is a PREFIX of the quality order within a domain
    val web = out.filter(col("domain") === "web")
      .orderBy(col("score").desc, col("doc_id")).collect()
      .map(_.getAs[Boolean]("keep"))
    assert(web.dropWhile(identity).forall(!_))
  }

  test("fillThresholds + applyThresholds match fillByQuality exactly") {
    // randomized-ish corpus: many docs across 3 domains, scores on the
    // round-6 grid like the classifier emits
    val docs = (1L to 400L).map { i =>
      val dom = Seq("web", "books", "code")((i % 3).toInt)
      val score = math.round((((i * 2654435761L) % 1000) / 999.0) * 1e6) / 1e6
      (i, dom, 5L + (i * 7L) % 50L, score)
    }.toDF("doc_id", "domain", "n_tokens", "score")
    val avail = docs.groupBy("domain")
      .agg(sum("n_tokens").as("tokens_avail"))
    val alloc = Mixture.solveBudget(avail, "domain",
      Map("books" -> 2.0), budgetTokens = 3000L)
    val exact = Mixture.fillByQuality(docs, "doc_id", "domain",
      "n_tokens", "score", alloc)
    val approx = Mixture.applyThresholds(docs, "doc_id", "domain",
      "n_tokens", "score", Mixture.fillThresholds(docs, "domain",
        "n_tokens", "score", alloc))
    def keeps(df: DataFrame) = df.select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val (ek, ak) = (keeps(exact), keeps(approx))
    assert(ek === ak) // same admission set, computed without a domain sort
    // and the kept token mass per domain stays within alloc + one doc
    val spent = exact.filter(col("keep"))
      .groupBy("domain").agg(sum("n_tokens").as("spent"))
      .join(alloc, "domain").collect()
    spent.foreach { r =>
      val s = r.getAs[Long]("spent").toDouble
      val al = r.getAs[Double]("alloc_tokens")
      assert(s < al + 55.0, s"domain ${r.getString(0)}: spent $s vs $al")
    }
  }

  test("applyThresholds: zero-allocation domain keeps nothing but stays in the output") {
    val alloc = Seq(("web", 0.0), ("books", 40.0))
      .toDF("domain", "alloc_tokens")
    val th = Mixture.fillThresholds(scoredDocs, "domain", "n_tokens",
      "score", alloc)
    assert(th.filter(col("domain") === "web").count() === 0)
    val out = Mixture.applyThresholds(scoredDocs, "doc_id", "domain",
      "n_tokens", "score", th)
    assert(out.count() === 7) // no rows dropped
    assert(out.filter(col("domain") === "web" && col("keep")).count() === 0)
    assert(out.filter(col("domain") === "books" && col("keep")).count() === 2)
  }

  test("domainTokens: per-domain whitespace token inventory") {
    val d = Seq((1L, "a", "one two three"), (2L, "a", "four"),
      (3L, "b", "x y")).toDF("doc_id", "src", "text")
    val m = Mixture.domainTokens(d, "src", "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("a" -> 4L, "b" -> 2L))
  }
}

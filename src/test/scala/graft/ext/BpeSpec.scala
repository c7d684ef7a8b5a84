package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** BPE trainer checks: the distributed trainer must reproduce, merge for
  * merge, an INDEPENDENT single-machine reference implementation (the
  * classic dict-of-word-counts algorithm, written separately below — no
  * shared merge-application code), on a real corpus slice.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent reference (plain Scala, recursive merge apply) ----
  private def refApply(syms: List[String], a: String,
      b: String): List[String] = syms match {
    case x :: y :: rest if x == a && y == b => (a + b) :: refApply(rest, a, b)
    case x :: rest => x :: refApply(rest, a, b)
    case Nil => Nil
  }

  // independent code-point iteration (vs Bpe.initialSymbols' stream)
  private def refSymbols(w: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toList
  }

  private def refTrain(texts: Seq[String],
      nMerges: Int): Seq[(Int, String, String)] = {
    var words: Map[List[String], Long] = texts
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) =>
        refSymbols(w) -> g.size.toLong
      }
    (1 to nMerges).iterator.map { rank =>
      val counts = words.toSeq
        .flatMap { case (syms, n) => syms.zip(syms.tail).map(_ -> n) }
        .groupBy(_._1).map { case (p, g) => (p, g.map(_._2).sum) }
      counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.headOption match {
        case Some(((a, b), n)) if n >= 2 =>
          words = words.map { case (syms, c) => refApply(syms, a, b) -> c }
          Some((rank, a, b))
        case _ => None
      }
    }.takeWhile(_.isDefined).flatten.toSeq
  }

  private val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    .select("doc_id", "text").limit(120).cache()

  test("distributed train ≡ the independent reference, merge for merge") {
    val texts = docs.select("text").as[String].collect().toSeq
    val got = Bpe.train(docs, "text", nMerges = 12)
    val want = refTrain(texts, 12)
    assert(got.size === 12, s"only ${got.size} merges learned")
    assert(got === want)
  }

  test("pairStats argmax IS the trainer's first merge; oracled shape is total-ordered") {
    val top = Bpe.pairStats(docs, "text", 5).collect()
    val firstMerge = Bpe.train(docs, "text", 1).head
    assert((top.head.getString(0), top.head.getString(1)) ===
      (firstMerge._2, firstMerge._3))
    // strictly descending by (count, left, right): LIMIT is deterministic
    val keys = top.map(r => (-r.getLong(2), r.getString(0), r.getString(1)))
    assert(keys.toSeq === keys.sorted.toSeq)
  }

  test("segment applies merges in rank order; tokenCounts sums per doc") {
    val merges = Seq((1, "a", "b"), (2, "ab", "c"))
    val ranks = merges.map { case (r, a, b) => (a, b) -> r }.toMap
    assert(Bpe.segment("abcab", ranks) === List("abc", "ab"))
    assert(Bpe.segment("xyz", ranks) === List("x", "y", "z"))
    val out = Bpe.tokenCounts(
      Seq((1L, "abc ab"), (2L, "zz")).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 2L -> 2L)) // ["abc"],["ab"] and ["z","z"]
  }

  test("astral-plane text: symbols are code points, and pairStats still agrees with merge #1") {
    // U+1F600 is outside the BMP: UTF-16 code-unit splitting would
    // produce surrogate halves that SQL substring (and DuckDB) never see
    val emoji = new String(Character.toChars(0x1F600))
    assert(Bpe.initialSymbols(s"a${emoji}b") === List("a", emoji, "b"))
    val df = Seq((1L, s"x$emoji x$emoji x$emoji ab")).toDF("doc_id", "text")
    val firstMerge = Bpe.train(df, "text", 1).head
    val topPair = Bpe.pairStats(df, "text", 1).collect().head
    assert((topPair.getString(0), topPair.getString(1)) ===
      (firstMerge._2, firstMerge._3))
    assert((firstMerge._2, firstMerge._3) === (("x", emoji)))
  }

  test("encodeWords: greedy rank-replay per vocabulary word, top-k deterministic") {
    val merges = Seq((1, "a", "b"), (2, "ab", "c"))
    val ranks = merges.map { case (r, a, b) => (a, b) -> r }.toMap
    val df = Seq((1L, "abcab abcab xyz"), (2L, "xyz abcab")).toDF("doc_id", "text")
    val rows = Bpe.encodeWords(df, "text", merges, k = 10).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rows("abcab") === ((3L, 2L, "abc ab")))
    assert(rows("xyz") === ((2L, 3L, "x y z")))
    // each row ≡ segment() on that word
    rows.foreach { case (w, (_, nTok, toks)) =>
      val ref = Bpe.segment(w, ranks)
      assert(toks.split(" ").toList === ref && nTok === ref.length.toLong)
    }
    // k bounds the result by (count desc, word asc)
    val top1 = Bpe.encodeWords(df, "text", merges, k = 1).collect()
    assert(top1.map(_.getString(0)).toSeq === Seq("abcab"))
  }

  test("fertility: occurrence-weighted ratios match hand computation") {
    val merges = Seq((1, "a", "b"), (2, "ab", "c"))
    // abcab (n=3, 2 tokens, 5 chars), xyz (n=3, 3 tokens, 3 chars),
    // ab (n=1, 1 token, 2 chars)
    val df = Seq((1L, "abcab abcab xyz xyz"), (2L, "xyz abcab ab"))
      .toDF("doc_id", "text")
    val r = Bpe.fertility(df, "text", merges, k = 10).collect()(0)
    val occ = 3L + 3L + 1L
    val totTok = 3 * 2L + 3 * 3L + 1 * 1L
    val totChar = 3 * 5L + 3 * 3L + 1 * 2L
    assert(r.getAs[Long]("n_words") === 3L)
    assert(r.getAs[Long]("occurrences") === occ)
    assert(r.getAs[Long]("total_tokens") === totTok)
    assert(r.getAs[Double]("fertility") ===
      math.rint(totTok.toDouble / occ * 1e6) / 1e6)
    assert(r.getAs[Double]("chars_per_token") ===
      math.rint(totChar.toDouble / totTok * 1e6) / 1e6)
    assert(r.getAs[Double]("single_token_frac") ===
      math.rint(1.0 / occ * 1e6) / 1e6)
    // k cuts the inventory before the weighting: only the top word
    val top1 = Bpe.fertility(df, "text", merges, k = 1).collect()(0)
    assert(top1.getAs[Long]("n_words") === 1L)
    assert(top1.getAs[Double]("fertility") === 2.0) // abcab alone
  }

  test("sequential exhaustive merge application ≡ greedy lowest-rank-first (the oracle's equivalence)") {
    // the property the DuckDB recursive rewrite relies on, pinned on the
    // consecutive-match shapes where bracketed replace alone would fail
    val merges = Seq((1, "b", "a"), (2, "a", "a"), (3, "ba", "ba"))
    val ranks = merges.map { case (r, a, b) => (a, b) -> r }.toMap
    for (w <- Seq("babababa", "aaaaaaa", "abababab", "baab", "bbaa")) {
      var syms = Bpe.initialSymbols(w)
      merges.foreach { case (_, a, b) =>
        var prev: List[String] = Nil
        while (prev != syms) { prev = syms; syms = Bpe.applyMerge(syms, a, b) }
      }
      assert(syms === Bpe.segment(w, ranks), s"word $w")
    }
  }

  test("train stops before merging pairs that occur only once") {
    val tiny = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val merges = Bpe.train(tiny, "text", nMerges = 10)
    // "ab" occurs twice -> one merge; every pair after that is singleton
    assert(merges === Seq((1, "a", "b")))
  }
}

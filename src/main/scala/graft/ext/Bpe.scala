package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the tokenizer-
  * training pass of a training-data pipeline, Spark-shaped:
  *
  *   - the corpus first collapses to a (word, count) table — ONE
  *     aggregation over the text, after which every merge iteration
  *     touches only the distinct-word vocabulary (bounded; at 100 TB
  *     this is the difference between scanning terabytes per merge and
  *     scanning megabytes; it is also exactly how reference trainers
  *     work, on word-frequency dicts);
  *   - each iteration is one distributed pair-count aggregation over
  *     that table (weighted by word count, argmax with a lexicographic
  *     tie-break so training is DETERMINISTIC), followed by a narrow
  *     map applying the merge greedily left-to-right per word;
  *   - `localCheckpoint` truncates the per-iteration lineage so N
  *     merges cost N shallow jobs, not one N-deep recomputation.
  *
  * Simplifications vs a production tokenizer, stated: whitespace
  * pre-tokenization, no end-of-word marker, no byte fallback — the
  * DISTRIBUTION shape is the point; the symbol alphabet is orthogonal.
  */
object Bpe {

  /** (word, count) over whitespace pre-tokenization — the table every
    * merge iteration runs against.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Weighted adjacent-CHARACTER-pair statistics of the un-merged corpus
    * — iteration 1's candidate table, and the oracled window into the
    * trainer (its argmax IS the first merge). Top `k` by count, then
    * (left, right) — the trainer's exact tie-break order.
    */
  def pairStats(df: DataFrame, textCol: String, k: Int): DataFrame =
    wordCounts(df, textCol)
      .filter(length(col("w")) >= 2)
      .withColumn("i", explode(sequence(lit(1), length(col("w")) - 1)))
      .select(expr("substring(w, i, 1)").as("left"),
        expr("substring(w, i + 1, 1)").as("right"), col("n"))
      .groupBy("left", "right").agg(sum("n").as("pair_count"))
      .orderBy(desc("pair_count"), asc("left"), asc("right"))
      .limit(k)

  /** Initial symbols of a word: one per Unicode CODE POINT — matching
    * SQL `substring`'s character semantics (what [[pairStats]] and its
    * DuckDB oracle count). Scala's `String#map` iterates UTF-16 code
    * units, which would split astral-plane characters (emoji, CJK
    * extensions) into surrogate halves the oracle never sees — and leak
    * invalid half-surrogate strings into the learned merges.
    */
  def initialSymbols(w: String): List[String] =
    w.codePoints().toArray.toList
      .map(cp => new String(Character.toChars(cp)))

  /** One greedy left-to-right application of merge (a, b) to a symbol
    * sequence — the same routine the reference implementation in the
    * spec uses, and [[segment]] replays at encode time.
    */
  def applyMerge(syms: List[String], a: String, b: String): List[String] = {
    val out = List.newBuilder[String]
    var rest = syms
    while (rest.nonEmpty) rest match {
      case x :: y :: tail if x == a && y == b =>
        out += (a + b); rest = tail
      case x :: tail =>
        out += x; rest = tail
    }
    out.result()
  }

  /** Train `nMerges` BPE merges over the corpus. Returns the ordered
    * merge table (rank, left, right); stops early if no pair occurs at
    * least twice (merging singletons memorizes the corpus). Ties break
    * on (count desc, left, right) so the table is reproducible.
    */
  def train(df: DataFrame, textCol: String,
      nMerges: Int): Seq[(Int, String, String)] = {
    require(nMerges >= 1, s"bpe: nMerges=$nMerges")
    val spark = df.sparkSession
    import spark.implicits._
    // LAZY localCheckpoints: the eager form materialized each generation
    // as its own Spark job, so every merge iteration paid TWO scheduled
    // jobs (checkpoint + argmax) of driver latency on a vocabulary-sized
    // dataset — measured 52 jobs / 2.0 s of driver gap for 16 merges at
    // sf0.1. Lazily, the argmax action materializes the pending
    // generation inside its own job: one job per iteration, same
    // lineage-truncation guarantee. Retired generations need no explicit
    // bookkeeping: materializing a checkpoint truncates the child's
    // lineage, the parent generation becomes unreachable, and the
    // ContextCleaner reclaims its blocks — Dataset.unpersist cannot
    // release localCheckpoint blocks anyway (they are RDD-level, not
    // CacheManager entries).
    var words: Dataset[(List[String], Long)] =
      wordCounts(df, textCol).as[(String, Long)]
        .map { case (w, n) => (initialSymbols(w), n) }
        .localCheckpoint(false)
    val merges = Seq.newBuilder[(Int, String, String)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val top = words.flatMap { case (syms, n) =>
        syms.zip(syms.tail).map { case (a, b) => ((a, b), n) }
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), n) => (a, b, n) }
        .toDF("a", "b", "cnt")
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < 2) done = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        merges += ((rank, a, b))
        words = words.map { case (syms, n) => (applyMerge(syms, a, b), n) }
          .localCheckpoint(false)
        rank += 1
      }
    }
    merges.result()
  }

  /** Segment one word with a trained merge table (greedy by merge rank —
    * the standard BPE encode).
    */
  def segment(word: String,
      ranks: Map[(String, String), Int]): List[String] = {
    var syms = initialSymbols(word)
    var go = true
    while (go && syms.length >= 2) {
      val best = syms.zip(syms.tail)
        .flatMap(p => ranks.get(p).map(r => (r, p)))
        .sortBy(_._1).headOption
      best match {
        case Some((_, (a, b))) => syms = applyMerge(syms, a, b)
        case None => go = false
      }
    }
    syms
  }

  /** Encode the corpus vocabulary with a FROZEN merge table: the top-`k`
    * words by count (ties broken by word — deterministic), each
    * greedy-segmented by merge rank. The vocabulary-level view of the
    * encode path ([[tokenCounts]] is the same segmentation summed per
    * document): TakeOrdered bounds the result at `k` rows, and the
    * segmentation itself is a narrow map over those rows — no extra
    * shuffle beyond [[wordCounts]]'s one aggregation, at any corpus
    * scale.
    *
    * Oracle-able because the merge table is frozen: greedy
    * lowest-rank-first encode is equivalent to applying the merges
    * sequentially in rank order, each to exhaustion (rank r's pair can
    * never contain a symbol created by rank r' > r — that symbol did not
    * exist when pair r was learned), and one exhaustive pair-merge is a
    * separator-bracketed string `replace` iterated to fixpoint — which
    * ANSI SQL expresses as a recursive rewrite.
    */
  def encodeWords(df: DataFrame, textCol: String,
      merges: Seq[(Int, String, String)], k: Int): DataFrame = {
    require(merges.nonEmpty, "bpe: empty merge table")
    val spark = df.sparkSession
    import spark.implicits._
    val ranks = merges.map { case (r, a, b) => (a, b) -> r }.toMap
    // Words containing chr(31) are dropped BEFORE the top-k cut: the SQL
    // oracle brackets symbols with that separator, so such a word would
    // corrupt its bracketing (mirrored filter in the oracle's wc CTE).
    wordCounts(df, textCol)
      .filter(!col("w").contains("\u001f"))
      .orderBy(desc("n"), asc("w")).limit(k)
      .as[(String, Long)]
      .map { case (w, n) =>
        val syms = segment(w, ranks)
        (w, n, syms.length.toLong, syms.mkString(" "))
      }
      .toDF("w", "n", "n_tokens", "tokens")
  }

  /** Tokenizer fertility / compression audit (X92) over the frozen-table
    * encode path: occurrence-weighted tokens-per-word (fertility),
    * chars-per-token (compression), and the single-token word fraction,
    * aggregated from [[encodeWords]]'s bounded top-`k` inventory — the
    * one-look numbers a tokenizer change is judged by before paying for
    * a corpus re-encode. Same cost shape as [[encodeWords]] (one
    * aggregation + a k-row map); the integer weighted sums are exact, so
    * the three ratios are single divisions of identical integers in any
    * engine.
    */
  def fertility(df: DataFrame, textCol: String,
      merges: Seq[(Int, String, String)], k: Int): DataFrame =
    encodeWords(df, textCol, merges, k).agg(
      count(lit(1)).as("n_words"),
      sum(col("n")).as("occurrences"),
      sum(col("n") * col("n_tokens")).as("total_tokens"),
      round(sum(col("n") * col("n_tokens")).cast("double") /
        sum(col("n")), 6).as("fertility"),
      round(sum(col("n") * length(col("w"))).cast("double") /
        sum(col("n") * col("n_tokens")), 6).as("chars_per_token"),
      round(sum(when(col("n_tokens") === 1, col("n")).otherwise(0L))
        .cast("double") / sum(col("n")), 6).as("single_token_frac"))

  /** Per-document token counts under a trained merge table — the "how
    * many tokens is this corpus under MY tokenizer" budgeting pass
    * (compare X13's estimator, which assumes a generic tokenizer). The
    * merge table rides the closure (bounded: nMerges entries).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(Int, String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks = merges.map { case (r, a, b) => (a, b) -> r }.toMap
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val n = text.split("\\s+").iterator.filter(_.nonEmpty)
          .map(w => segment(w, ranks).length.toLong).sum
        (id, n)
      }
      .toDF(idCol, "n_bpe_tokens")
  }
}

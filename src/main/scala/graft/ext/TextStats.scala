package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data pipelines over the
  * `documents` table: token counting, quality scoring, language-ID
  * heuristic, and document fingerprinting.
  *
  * All pure narrow projections/aggregations — codegen'd expressions inside
  * the scan stage, no shuffle except the final rollup. Token counting uses
  * the separator-count identity (chars − non-space-chars + 1) rather than
  * materializing a token array where only the count is needed — at 100 TB
  * the array materialization is real memory pressure.
  */
object TextStats {

  /** Tokens are space-separated; stopword hits are counted with a
    * higher-order filter over the token array (no UDF).
    */
  val Stopwords: Seq[String] = Seq("the", "a")

  private def stopwordInList: String =
    Stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Adds `n_tokens`, `avg_word_len`, `stop_ratio`, `quality_score`.
    * Quality = length saturation × (1 − stopword density) — the shape of
    * common pretraining-corpus heuristics (length/punct/stopword ratios).
    */
  def withQuality(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens",
        length(col(textCol)) - length(regexp_replace(col(textCol), " ", "")) + 1)
      .withColumn("avg_word_len",
        round(length(regexp_replace(col(textCol), " ", "")) / col("n_tokens"), 6))
      .withColumn("stop_ratio",
        round(expr(
          s"size(filter(split($textCol, ' '), w -> w IN $stopwordInList))")
          / col("n_tokens"), 6))
      .withColumn("quality_score",
        round(least(lit(1.0), col("n_tokens") / lit(100.0))
          * (lit(1.0) - expr(
            s"size(filter(split($textCol, ' '), w -> w IN $stopwordInList))")
            / col("n_tokens")), 6))

  /** Per-language corpus stats rollup. */
  def langRollup(df: DataFrame, textCol: String, langCol: String): DataFrame =
    df.groupBy(col(langCol))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("n_chars"), 6).as("avg_chars"),
        round(avg(length(col(textCol))), 6).as("avg_len"),
        round(avg(length(col(textCol))
          - length(regexp_replace(col(textCol), " ", "")) + 1), 6).as("avg_tokens"))

  /** N-gram-free language-ID heuristic: stopword density of the English
    * function-word list. Real corpora would use per-language character
    * n-gram profiles; the operator shape (token-set membership scoring →
    * argmax label) is identical.
    */
  def langId(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("predicted_lang",
      when(expr(s"size(filter(split($textCol, ' '), w -> w IN $stopwordInList))")
        > lit(0), "en").otherwise("other"))

  /** Corpus vocabulary head: global token frequencies, top `k` by
    * (count desc, token asc) — the vocab/stopword-list extraction pass of
    * a tokenizer-training pipeline. One explode + one hash aggregation
    * (map-side partial combine collapses each partition to its distinct
    * tokens before the shuffle); the ordered limit plans as
    * TakeOrderedAndProject — per-partition partial top-k merged as k rows
    * on the driver, never a global sort, at any corpus scale.
    */
  def tokenVocab(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(k)

  /** Content fingerprint: hash of the whitespace-normalized, lowercased
    * text — the canonical key for exact-after-normalization dedup.
    */
  def fingerprint(df: DataFrame, textCol: String, out: String): DataFrame =
    df.withColumn(out,
      md5(trim(regexp_replace(lower(col(textCol)), "\\s+", " "))))

  /** LLM token budgeting: whitespace word count plus a BPE-style subword
    * estimate — greedy ≤4-char alphanumeric pieces and punctuation runs,
    * the classic ~4-chars-per-token pre-tokenizer proxy. One codegen'd
    * `regexp_count` per row, no token-array materialization; the greedy
    * character-class pattern evaluates identically in the DuckDB oracle's
    * RE2, so the estimate is value-checked cross-engine.
    */
  def withTokenEstimates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      (length(col(textCol))
        - length(regexp_replace(col(textCol), " ", "")) + 1)
        .cast("long").as("n_tokens"),
      regexp_count(col(textCol), lit("[a-z0-9]{1,4}|[^a-z0-9 ]+"))
        .cast("long").as("n_subword_est"))

  /** Within-document repetition signals — the Gopher/RefinedWeb-style
    * quality filters that catch boilerplate and degenerate generations:
    * distinct-token ratio and the duplicate-2-gram fraction
    * (1 − distinct 2-grams / total 2-grams; null for one-token docs).
    * One narrow codegen'd projection: the distinct 2-gram count reuses
    * the [[graft.plans.ShingleStrings]] kernel's per-document distinct
    * set, so there is no explode and no shuffle at any scale.
    */
  def repetitionScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    val toks = split(col(textCol), " ")
    val nTok = size(toks)
    val n2Distinct = size(call_function(
      graft.plans.GraftFunctions.ShingleStringsName, col(textCol), lit(2)))
    df.select(
      col(idCol),
      nTok.cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
      round(size(array_distinct(toks)) / nTok, 6).as("distinct_ratio"),
      when(nTok > 1, round(lit(1.0) - n2Distinct / (nTok - 1), 6))
        .cast("double").as("dup_2gram_ratio"))
  }

  /** The Gopher rule list's stopword set (Rae et al. 2021, Appendix
    * A1.1): a document must contain at least [[GopherMinStopwords]] of
    * these to pass the filter.
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  val GopherMinStopwords = 2

  /** Gopher-style RULE filter (Rae et al. 2021, Appendix A1.1) — the
    * hard quality gates pretraining pipelines apply before any scoring:
    * word count in [50, 100k], mean word length in [3, 10], ≥ 80% of
    * words containing an alphabetic character, and ≥ 2 distinct
    * stopwords present. (The original's line-shape rules — bullet-start
    * / ellipsis-end fractions — are meaningless on single-line
    * documents and omitted.) Emits the per-rule metrics plus the
    * composite `keep`, so a pipeline can both filter and audit WHY a
    * document was dropped.
    *
    * One narrow codegen'd projection per document — counts come from
    * length arithmetic and bounded array ops over the token split, no
    * shuffle, no UDF; every metric and the flag replay exactly in the
    * DuckDB oracle (integer-over-integer division is double in both
    * engines, `array_intersect`/`list_intersect` both dedup).
    */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = GopherStopwords,
      minStopwords: Int = GopherMinStopwords): DataFrame = {
    val (nWords, meanLen, alphaFrac, nStop) = gopherMetrics(textCol, stopwords)
    df.select(col(idCol),
      nWords.as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(alphaFrac, 6).as("alpha_frac"),
      nStop.as("n_stop"),
      gopherKeep(textCol, stopwords, minStopwords).as("keep"))
  }

  /** The composite keep predicate of [[gopherFilter]] as a bare boolean
    * column, for filtering inside composed pipelines without carrying
    * the audit metrics.
    */
  def gopherKeep(textCol: String,
      stopwords: Seq[String] = GopherStopwords,
      minStopwords: Int = GopherMinStopwords): Column = {
    val (nWords, meanLen, alphaFrac, nStop) = gopherMetrics(textCol, stopwords)
    nWords.between(50L, 100000L) && meanLen.between(3.0, 10.0) &&
      alphaFrac >= 0.8 && nStop >= minStopwords
  }

  private def gopherMetrics(textCol: String,
      stopwords: Seq[String]): (Column, Column, Column, Column) = {
    val t = col(textCol)
    val nWords = (length(t) - length(regexp_replace(t, " ", "")) + 1)
      .cast("long")
    val meanLen = length(regexp_replace(t, " ", "")).cast("double") / nWords
    // Column-based HOF, not a string-interpolated expr: a column name
    // with a space or keyword would fail to parse inside expr(...)
    val alphaFrac = size(filter(split(t, " "), w => w.rlike("[a-zA-Z]")))
      .cast("double") / nWords
    val nStop = size(array_intersect(split(t, " "),
      array(stopwords.map(lit): _*))).cast("long")
    (nWords, meanLen, alphaFrac, nStop)
  }

  /** Corpus-relative rarity scoring — the one quality signal that needs
    * the WHOLE corpus, not just the document: for each document, how
    * many of its distinct tokens are hapax legomena (appear in no other
    * document), and the average document-frequency of its vocabulary.
    * High hapax ratios flag OOV noise, mojibake and boilerplate IDs;
    * low average document frequency flags genuinely novel text.
    *
    * Shape at 100 TB: one explode → groupBy(token) builds the
    * document-frequency table (one shuffle; vocabulary, not corpus,
    * sized — a few million rows for natural language, so the join back
    * is a BROADCAST), then one per-document aggregation. All counts are
    * exact integers and the two ratios are single double divisions, so
    * every value replays in the DuckDB oracle.
    */
  def rarityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(array_distinct(split(col(textCol), " "))).as("__tok"))
    val dfreq = toks.groupBy(col("__tok"))
      .agg(count(lit(1)).as("__doc_freq"))
    // no broadcast hint: the doc-freq table is vocabulary-sized, usually
    // small enough that AQE broadcasts it on its own — but a noisy corpus
    // (the very thing this operator detects) can blow the vocabulary up,
    // and a hard hint would force the broadcast anyway; AQE falls back to
    // a shuffled join when the table is genuinely large
    toks.join(dfreq, Seq("__tok"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_types"),
        sum(when(col("__doc_freq") === 1, 1L).otherwise(0L)).as("n_hapax"),
        round(sum(when(col("__doc_freq") === 1, 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("hapax_ratio"),
        round(sum(col("__doc_freq")).cast("double") / count(lit(1)), 6)
          .as("avg_doc_freq"))
  }

  /** Unigram language-model scoring — the CCNet-style perplexity filter
    * (Wenzek et al. 2020): score each document by the cross-entropy of
    * its token stream under the corpus's own unigram distribution.
    * Boilerplate and template text scores LOW (its tokens are corpus-
    * frequent); mojibake and OOV noise scores HIGH — pipelines keep the
    * middle of the distribution. Emits `n_tokens`, `cross_entropy`
    * (bits/token) and `perplexity` (2^H).
    *
    * Identity used: H(d) = −(1/|d|) Σ_w log2(tf_w / N)
    *              = log2 N − avg(log2 tf_w),
    * so the corpus total N enters once per document, not once per token.
    *
    * Shape at 100 TB: one explode → groupBy(token) builds the term-
    * frequency table (vocabulary-sized, like [[rarityScore]]'s doc-freq
    * table, so the join back broadcasts under AQE); N is a 1-row
    * broadcast cross join off that same table — no second corpus pass,
    * no driver-side action; then one per-document aggregation. In a real
    * deployment the LM side would be a FROZEN reference corpus — pass it
    * as `lmCorpus` (defaults to scoring `df` against itself); tokens
    * absent from the LM corpus are dropped from the average (unsmoothed),
    * so `n_tokens` counts only in-LM tokens. A document with NO in-LM
    * token still comes back (left join): `n_tokens` 0 and null
    * cross_entropy/perplexity — the caller decides whether fully-OOV
    * means "drop" or "flag", rather than the row silently vanishing.
    */
  def lmScore(df: DataFrame, idCol: String, textCol: String,
      lmCorpus: DataFrame = null): DataFrame = {
    val corpus = Option(lmCorpus).getOrElse(df)
    val freq = corpus
      .select(explode(split(col(textCol), " ")).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__tf"))
    val total = freq.agg(sum(col("__tf")).as("__n"))
    df.select(col(idCol), explode(split(col(textCol), " ")).as("__tok"))
      .join(freq, Seq("__tok"), "left")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol), col("__n"))
      .agg(
        // count(__tf), not count(*): only in-LM tokens enter the average,
        // and a fully-OOV doc reports 0 with a null __h (avg of no rows)
        count(col("__tf")).as("n_tokens"),
        (log2(col("__n")) - avg(log2(col("__tf")))).as("__h"))
      .select(col(idCol), col("n_tokens"),
        round(col("__h"), 6).as("cross_entropy"),
        round(pow(lit(2.0), col("__h")), 6).as("perplexity"))
  }

  /** [[lmScore]] over a HASHED feature space: tokens are md5-bucketed
    * into `nBuckets` buckets (the DSIR featurization trick,
    * [[Curate]]'s `hashedFeats`), so the model table is ≤ `nBuckets`
    * rows NO MATTER the corpus vocabulary — where [[lmScore]]'s
    * vocab-sized table rides AQE's judgment (and degrades to a shuffled
    * join once a noisy corpus blows the vocabulary past the broadcast
    * threshold — the measured `lm_family` posture scenario), this one is
    * broadcastable by construction at any corpus size, and the hint is
    * therefore hard. The price is hash-collision smoothing: colliding
    * token types pool their counts, biasing per-token probabilities up
    * — acceptable for FILTERING (relative ranking), not for reporting
    * calibrated perplexities; scores here use add-1 smoothing over the
    * bucket space (every token scores — no OOV drop, collisions make
    * "unseen bucket" nearly impossible at vocab ≫ nBuckets anyway), so
    * `n_tokens` counts ALL tokens, unlike [[lmScore]]'s in-LM count.
    *
    * H(d) = log2(N + nBuckets) − avg_w(log2(c_bucket(w) + 1)), the same
    * single-corpus-pass identity as [[lmScore]].
    */
  def lmScoreHashed(df: DataFrame, idCol: String, textCol: String,
      lmCorpus: DataFrame = null, nBuckets: Int = 4096,
      salt: String = "lmh1"): DataFrame = {
    require(nBuckets > 0, "lmScoreHashed: nBuckets must be positive")
    val corpus = Option(lmCorpus).getOrElse(df)
    def bucketed(d: DataFrame, keep: Seq[Column]): DataFrame =
      d.select(keep :+ explode(split(col(textCol), " ")).as("__tok"): _*)
        .select(keep :+ pmod(
          PortableHash.hash60(concat(col("__tok"), lit("|" + salt))),
          lit(nBuckets.toLong)).as("__b"): _*)
    val freq = bucketed(corpus, Seq.empty)
      .groupBy(col("__b")).agg(count(lit(1)).as("__bf"))
    val total = freq.agg(coalesce(sum(col("__bf")), lit(0L)).as("__n"))
    bucketed(df, Seq(col(idCol)))
      .join(broadcast(freq), Seq("__b"), "left") // ≤ nBuckets rows, always
      .crossJoin(broadcast(total))
      .groupBy(col(idCol), col("__n"))
      .agg(count(lit(1)).as("n_tokens"),
        (log2(col("__n") + nBuckets)
          - avg(log2(coalesce(col("__bf"), lit(0L)) + 1))).as("__h"))
      .select(col(idCol), col("n_tokens"),
        round(col("__h"), 6).as("cross_entropy"),
        round(pow(lit(2.0), col("__h")), 6).as("perplexity"))
  }

  /** Bigram language-model scoring with stupid backoff (Brants et al.
    * 2007, "Large Language Models in Machine Translation") — the
    * context-aware upgrade of [[lmScore]]: each adjacent token pair is
    * scored log2 of c(a,b)/c(a·) when the LM corpus saw the bigram, and
    * log2 of λ·c(b)/N (backoff to the unigram, λ = 0.4 per the paper)
    * when it saw only the continuation token; pairs whose continuation
    * is fully OOV are dropped from the average (unsmoothed, like
    * [[lmScore]]). Repetitive/templated text scores LOW, disfluent
    * token-salad HIGH even when its unigrams are common — the signal
    * unigram perplexity cannot see.
    *
    * Shape at 100 TB: the per-bigram log-score is precomputed on the
    * bigram TYPE table (bigram counts joined with their per-context sums
    * — a type-sized join whose groupBy exchange is reused across both
    * sides), so the corpus-sized document stream takes exactly TWO
    * lookup joins — the seen-bigram score on (a, b) and the backoff
    * unigram on b, both against tables that broadcast under AQE — plus a
    * 1-row broadcast for N; then one per-document aggregation. Docs with
    * no bigram (≤1 token) come back with `n_bigrams` 0 and null scores
    * rather than vanishing.
    */
  def lmScoreBigram(df: DataFrame, idCol: String, textCol: String,
      lmCorpus: DataFrame = null, lambda: Double = 0.4): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    val corpus = Option(lmCorpus).getOrElse(df)
    // bigram = 2-shingle WITH multiplicity via the codegen kernel; the
    // shingle string "a b" IS the (a, b) join key (tokens are space-split
    // so the single interior space is unambiguous) — one string key, no
    // per-pair struct allocation (the HOF formulation this replaces was
    // allocation-bound like the pre-kernel jaccard path)
    def grams(d: DataFrame, keep: Seq[Column], k: Int, as: String): DataFrame =
      d.select(keep :+ explode(call_function(
        graft.plans.GraftFunctions.ShingleStringsAllName,
        col(textCol), lit(k))).as(as): _*)
    val cab = grams(corpus, Nil, 2, "__s").groupBy(col("__s"))
      .agg(count(lit(1)).as("__cab"))
      .hint("shuffle_hash")
    val ctx = cab
      .groupBy(substring_index(col("__s"), " ", 1).as("__a"))
      .agg(sum(col("__cab")).as("__ca"))
    val lpSeen = cab
      .withColumn("__a", substring_index(col("__s"), " ", 1))
      .join(ctx, Seq("__a"))
      .select(col("__s"), log2(col("__cab") / col("__ca")).as("__lp_seen"))
    val uni = grams(corpus, Nil, 1, "__b").groupBy(col("__b"))
      .agg(count(lit(1)).as("__cb"))
    val total = uni.agg(sum(col("__cb")).as("__n"))
    val perDoc = grams(df, Seq(col(idCol)), 2, "__s")
      .join(lpSeen, Seq("__s"), "left")
      .withColumn("__b", substring_index(col("__s"), " ", -1))
      .join(uni, Seq("__b"), "left")
      .crossJoin(broadcast(total))
      .withColumn("__lp",
        coalesce(col("__lp_seen"),
          log2(lit(lambda) * col("__cb") / col("__n"))))
      .groupBy(col(idCol))
      .agg(count(col("__lp")).as("n_bigrams"), (-avg(col("__lp"))).as("__h"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("__h"), 6).as("cross_entropy"),
        round(pow(lit(2.0), col("__h")), 6).as("perplexity"))
  }

  /** The full pretraining-corpus curation pipeline as ONE composed plan:
    * exact dedup after normalization (fingerprint → keep min id per
    * fingerprint), quality scoring, language-ID, then the survivor
    * selection with its token budget. Every stage is an oracled operator
    * of this module, so the composition is value-checked end-to-end in
    * DuckDB — the "switch your curation pipeline to this engine" claim,
    * verified. Scale shape: ONE scan and one shuffle — the keep-min-id
    * dedup is a window min over the fingerprint (tiny per-fp groups), not
    * a groupBy + join back, so the text is read and hashed once; scoring
    * and filters are narrow projections.
    */
  def curate(df: DataFrame, idCol: String, textCol: String,
      minQuality: Double, lang: String): DataFrame = {
    val survivors = dedupByFingerprint(df, idCol, textCol)
    langId(withQuality(survivors, textCol), textCol)
      .filter(col("quality_score") >= minQuality
        && col("predicted_lang") === lang)
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        col("quality_score"), col("fp"))
  }

  /** BM25 top-k keyword search — the text-retrieval capability next to
    * the embedding ANN family: rank documents for a small query-term set
    * by the Robertson/Lucene BM25 variant
    * (idf = ln((N − df + 0.5)/(df + 0.5) + 1), so scores stay positive).
    *
    * Scale shape: because only QUERY terms contribute, no inverted index
    * or posting explode is needed — per-term tf is a narrow codegen'd
    * array pass over the token list, staged once per term. Corpus stats
    * (N, mean doc length, per-term df) are ONE metadata-sized aggregate
    * collected to the driver (Q+2 numbers — the documented eager
    * two-phase pattern of the quantizer/bloom builds) and folded into
    * the score as literals, so the scoring pass is one scan, zero
    * shuffles, ending in TakeOrderedAndProject. Docs containing no query
    * term are excluded — they are a meaningless million-way tie at the
    * LIMIT boundary — via an `arrays_overlap` pre-filter, NOT a filter on
    * the computed score: a score predicate gets pushed below the
    * projections with the whole Q-term score expression (Q+1 splits)
    * inlined into the scan-side filter, while the overlap predicate
    * pushes down as a single split and prunes non-matching docs before
    * any per-term work runs (pinned in `TextStatsSpec`).
    */
  /** Frozen BM25 corpus statistics — N, mean doc length, and the
    * per-query-term document frequencies (aligned with the term seq they
    * were computed for): the Q+2 numbers [[bm25TopK]] folds into its
    * score as literals. Freezing them via [[bm25CorpusStats]] turns
    * [[bm25Score]] into a PURE per-row projection, which is exactly what
    * makes BM25 scoring streamable: corpus stats move on corpus
    * timescales, so production scores a live stream against stats frozen
    * from the indexed batch corpus (refreshed on index rebuilds) — the
    * same freeze-then-probe split as the minhash band index and the IVF
    * quantizer.
    */
  final case class Bm25Stats(n: Double, avgdl: Double, dfs: Seq[Double])

  /** The tf projection shared by stats and scoring: per-term token counts
    * over a pre-materialized `__toks` array. The token array lives in its
    * OWN projection: with Q terms the per-term tf expressions reference
    * it Q+1 times, and relying on codegen subexpression elimination to
    * dedupe an inline `split(text)` under each `filter` HOF is fragile at
    * large Q. CollapseProject keeps the two projects separate (an alias
    * that is non-cheap and multiply-referenced is never inlined), so each
    * document is split exactly once per pass — pinned in `TextStatsSpec`.
    */
  private def bm25TfProj(d: DataFrame, idCol: String,
      terms: Seq[String]): DataFrame = d.select(
    col(idCol) +: size(col("__toks")).cast("double").as("__dl") +:
      terms.zipWithIndex.map { case (t, i) =>
        size(filter(col("__toks"), x => x === lit(t)))
          .cast("double").as(s"__tf_$i")
      }: _*)

  /** Corpus stats for [[bm25Score]]: ONE metadata-sized aggregate
    * collected to the driver (Q+2 numbers — the documented eager
    * two-phase pattern of the quantizer/bloom builds). Batch-only by
    * nature (a global aggregate has no finite streaming answer); stats
    * are computed over ALL docs — the presence filter scoring applies
    * must not distort them.
    */
  def bm25CorpusStats(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): Bm25Stats = {
    require(terms.nonEmpty, "bm25CorpusStats: no query terms")
    require(!df.isStreaming,
      "bm25CorpusStats is an eager global aggregate: freeze stats from " +
        "the batch corpus, then bm25Score the stream against them")
    val toksAll = df.select(col(idCol), split(col(textCol), " ").as("__toks"))
    val stats = bm25TfProj(toksAll, idCol, terms).agg(
      count(lit(1)).cast("double").as("n"),
      avg(col("__dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"__tf_$i") > 0, 1.0).otherwise(0.0)).as(s"df_$i")): _*)
      .collect().head
    Bm25Stats(stats.getDouble(0), stats.getDouble(1),
      terms.indices.map(i => stats.getDouble(2 + i)))
  }

  /** BM25 score of every document that contains ≥1 query term, against
    * FROZEN corpus stats — a pure narrow projection (one split, Q array
    * passes, zero shuffles, no aggregation), so it runs unchanged on a
    * batch frame or an unbounded stream (the streaming-ingest relevance
    * router: measured in `STREAM_ENVELOPE.json` as `bm25_stream`). Docs
    * containing no query term are excluded via an `arrays_overlap`
    * pre-filter, NOT a filter on the computed score: a score predicate
    * gets pushed below the projections with the whole Q-term score
    * expression (Q+1 splits) inlined into the scan-side filter, while the
    * overlap predicate pushes down as a single split and prunes
    * non-matching docs before any per-term work runs (pinned in
    * `TextStatsSpec`).
    */
  def bm25Score(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], stats: Bm25Stats, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Score: no query terms")
    require(stats.dfs.length == terms.length,
      s"bm25Score: stats carry ${stats.dfs.length} term frequencies for " +
        s"${terms.length} terms — frozen for a different query")
    val toks = df.select(col(idCol), split(col(textCol), " ").as("__toks"))
    val kept = toks.filter(
      arrays_overlap(col("__toks"), array(terms.map(lit): _*)))
    val score = terms.indices.map { i =>
      val dfT = stats.dfs(i)
      val idf = math.log((stats.n - dfT + 0.5) / (dfT + 0.5) + 1.0)
      lit(idf) * col(s"__tf_$i") * lit(k1 + 1.0) /
        (col(s"__tf_$i") + lit(k1) * (lit(1.0 - b)
          + lit(b) * col("__dl") / lit(stats.avgdl)))
    }.reduce(_ + _)
    bm25TfProj(kept, idCol, terms)
      .select(col(idCol), round(score, 6).as("bm25"))
  }

  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(!df.isStreaming,
      "bm25TopK collects corpus stats eagerly and is batch-only; on a " +
        "stream, freeze bm25CorpusStats from the batch corpus and run " +
        "bm25Score on the stream (global top-k has no streaming answer)")
    bm25Score(df, idCol, textCol, terms,
        bm25CorpusStats(df, idCol, textCol, terms), k1, b)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** Exact dedup after normalization: keep the lowest id per
    * [[fingerprint]] via a window min (ONE shuffle on the fingerprint,
    * no groupBy + join-back — the text is read and hashed once). The
    * shared first stage of [[curate]] and [[Curate.curateFull]]; the
    * survivor carries its `fp` column.
    */
  def dedupByFingerprint(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    fingerprint(df, textCol, "fp")
      .withColumn("__keep",
        min(col(idCol)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("fp"))))
      .filter(col(idCol) === col("__keep"))
      .drop("__keep")

  /** Smoothed unigram distributions of two corpora joined over their
    * UNION vocabulary, with the per-token KL(A‖B) contribution — the
    * shared core of [[divergenceTopK]] and [[corpusDivergence]].
    * Laplace add-one smoothing over the union vocab keeps every log
    * finite: p(t) = (c(t) + 1) / (N + V). Token counts are exact longs;
    * V and the two N totals ride in as a broadcast 1-row cross join (no
    * driver action), so each p and each `ln` evaluates on identical
    * doubles in any IEEE engine.
    */
  private def divergenceTerms(dfA: DataFrame, dfB: DataFrame,
      textCol: String): DataFrame = {
    def counts(d: DataFrame, as: String): DataFrame =
      d.select(explode(split(col(textCol), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("token")).agg(count(lit(1)).as(as))
    val joined = counts(dfA, "n_a")
      .join(counts(dfB, "n_b"), Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val totals = joined.agg(
      count(lit(1)).as("__v"),
      sum(col("n_a")).as("__na"),
      sum(col("n_b")).as("__nb"))
    joined.crossJoin(broadcast(totals))
      .withColumn("p_a",
        (col("n_a") + lit(1L)) / (col("__na") + col("__v")))
      .withColumn("p_b",
        (col("n_b") + lit(1L)) / (col("__nb") + col("__v")))
      .withColumn("kl_term", col("p_a") * log(col("p_a") / col("p_b")))
  }

  /** Corpus-divergence drill-down: the top-`k` tokens by their KL(A‖B)
    * contribution — WHICH tokens make corpus A read differently from
    * corpus B (the domain-shift / contamination-drift audit run before
    * mixing a new source into a pretraining recipe; [[Curate.dsirWeights]]
    * RESAMPLES toward a target, this op EXPLAINS the gap). Per-token
    * smoothed probabilities and the signed nats contribution, ordered by
    * (rounded contribution desc, token asc) so the cut is deterministic
    * cross-engine.
    *
    * Shape at 100 TB: two explode→groupBy(token) passes (vocabulary-
    * sized output), one vocab-sized full-outer join, a 1-row broadcast
    * totals frame, and a TakeOrderedAndProject limit — never a global
    * sort, nothing corpus-sized past the first aggregation.
    */
  def divergenceTopK(dfA: DataFrame, dfB: DataFrame, textCol: String,
      k: Int): DataFrame =
    divergenceTerms(dfA, dfB, textCol)
      .select(col("token"), col("n_a"), col("n_b"),
        round(col("p_a"), 6).as("p_a"),
        round(col("p_b"), 6).as("p_b"),
        round(col("kl_term"), 6).as("kl_nats"))
      .orderBy(col("kl_nats").desc, col("token"))
      .limit(k)

  /** Scalar corpus-divergence summary — one row: union vocabulary size,
    * per-side token totals and distinct-type counts, shared-type count,
    * and the smoothed KL(A‖B) in nats. The single number a mixing
    * pipeline tracks per (source, reference) pair release-over-release;
    * [[divergenceTopK]] is its drill-down. Same two-scan vocab-sized
    * shape, ending in one scalar aggregation.
    */
  /** Vocabulary-coverage / OOV audit (X96): fix the vocabulary at the
    * corpus's top-`topV` words and report, per group (source, lang, …),
    * the fraction of token OCCURRENCES falling outside it — the
    * coverage number a tokenizer/vocab choice is sanity-checked against
    * per source before training (a domain with a high OOV rate under
    * the shared vocab is about to be tokenized into fragments).
    *
    * Shape: ONE corpus explode collapses to (group, word) counts —
    * everything after runs on that vocab-type-sized frame: the top-V
    * cut re-aggregates it per word (the (group, word) exchange is
    * reused across the two consumers, so the corpus is scanned once)
    * and broadcasts V rows back; ties at the V boundary break on the
    * word, so the cut is deterministic in any engine.
    */
  def vocabularyCoverage(df: DataFrame, textCol: String,
      groupCol: String, topV: Int): DataFrame = {
    require(topV >= 1, "vocabularyCoverage: topV must be >= 1")
    val gw = df
      .select(col(groupCol), explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col(groupCol), col("w")).agg(count(lit(1)).as("__n"))
    val vocab = gw.groupBy(col("w")).agg(sum(col("__n")).as("__t"))
      .orderBy(col("__t").desc, col("w")).limit(topV)
      .select(col("w"), lit(1L).as("__in"))
    gw.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col(groupCol))
      .agg(sum(col("__n")).as("n_tokens"),
        sum(when(col("__in").isNull, col("__n")).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
  }

  /** Count-min sketch over token occurrences (X97, Cormode &
    * Muthukrishnan 2005): `d` independent hash rows × `w` counter
    * buckets — the CONSTANT-SIZE frequency structure (d×w rows
    * regardless of corpus size, vs the unbounded (token, count) table)
    * that heavy-hitter tracking keeps resident at 100 TB or in a
    * stream. One corpus explode fans each token occurrence into its d
    * (row, bucket) cells; ONE map-side-combinable aggregation collapses
    * to ≤ d×w rows per task before the shuffle. Buckets come from the
    * engine-portable [[PortableHash.hash60]], so sketch CONTENTS (not
    * just estimates) replay bit-identically in the oracle. Sketches are
    * mergeable by cellwise addition (spec-pinned).
    */
  def cmSketch(df: DataFrame, textCol: String, d: Int = 4,
      w: Int = 256): DataFrame = {
    require(d >= 1, "cmSketch: d must be >= 1")
    require(w >= 1, "cmSketch: w must be >= 1")
    df.select(explode(split(col(textCol), " ")).as("__w"))
      .filter(length(col("__w")) > 0)
      .select(posexplode(array((0 until d).map(r =>
        pmod(PortableHash.hash60(concat(col("__w"), lit(s"|cm$r"))),
          lit(w.toLong))): _*)))
      .withColumnRenamed("pos", "r").withColumnRenamed("col", "bucket")
      .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from a [[cmSketch]]: each candidate token's count
    * estimate is the MINIMUM of its d bucket counters — never below the
    * true count (every occurrence landed in all d of its cells; the
    * one-sided CM guarantee), above it only by bucket collisions. The
    * candidate side explodes into d (row, bucket) probes and joins the
    * d×w sketch — broadcast-sized by construction.
    */
  def cmEstimate(sketch: DataFrame, candidates: DataFrame,
      tokenCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 1, "cmEstimate: d and w must be >= 1")
    candidates
      .select(col(tokenCol), posexplode(array((0 until d).map(r =>
        pmod(PortableHash.hash60(concat(col(tokenCol), lit(s"|cm$r"))),
          lit(w.toLong))): _*)))
      .withColumnRenamed("pos", "r").withColumnRenamed("col", "bucket")
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(col(tokenCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  def corpusDivergence(dfA: DataFrame, dfB: DataFrame,
      textCol: String): DataFrame =
    divergenceTerms(dfA, dfB, textCol)
      .agg(
        count(lit(1)).as("vocab_union"),
        sum(when(col("n_a") > 0 && col("n_b") > 0, 1L).otherwise(0L))
          .as("vocab_shared"),
        sum(col("n_a")).as("tokens_a"),
        sum(col("n_b")).as("tokens_b"),
        sum(when(col("n_a") > 0, 1L).otherwise(0L)).as("types_a"),
        sum(when(col("n_b") > 0, 1L).otherwise(0L)).as("types_b"),
        round(sum(col("kl_term")), 6).as("kl_ab_nats"))
}

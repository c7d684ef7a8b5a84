package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: deterministic
  * train/val/test splits, hash sampling, and PII redaction.
  *
  * Everything here is a narrow, shuffle-free projection (the 100 TB
  * posture: curation decisions ride along with the scan, never a join or
  * a global pass), and everything is content/key-deterministic — no
  * `rand()`, so assignments survive retries, reshuffles, partial re-runs
  * and even engine changes (the md5 draw replays in any SQL engine).
  */
object Curate {

  /** Key-derived uniform in [0, 1): [[PortableHash.uniform01]] of
    * `key|salt` — the same construction every oracle replays. Changing
    * `salt` re-draws every key independently.
    *
    * A NULL key fails loudly at execution: a null md5 draw would
    * otherwise make [[assignSplits]] silently route the row to the last
    * split (every `when` is null → `.otherwise`) while [[sampleByHash]]
    * silently drops it — inconsistent, invisible semantics for a
    * reproducibility-focused API. Callers with nullable keys must
    * coalesce or filter explicitly first.
    */
  private def uniformDraw(keyCol: Column, salt: String): Column = {
    val k = keyCol.cast("string")
    val checked = when(k.isNull, raise_error(lit(
      "graft.ext.Curate: NULL key in deterministic draw — coalesce or " +
        "filter null keys before split/sample assignment"))).otherwise(k)
    PortableHash.uniform01(concat(checked, lit("|" + salt)))
  }

  /** Deterministic split assignment: each row draws its uniform from
    * md5(key|salt) and lands in the first split whose cumulative weight
    * exceeds the draw. Adds `u` (the draw, 6dp) and `split`.
    *
    * Weights must sum to 1. Prefer binary-exact weights (0.75, 0.125, …):
    * cumulative sums of decimal weights like 0.1 differ in the last ulp
    * between engines/orders, and a reproducible split must not depend on
    * float-literal folding.
    */
  def assignSplits(df: DataFrame, keyCol: String, salt: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    require(splits.forall { case (_, w) => w >= 0.0 && w <= 1.0 },
      "each split weight must be in [0,1]") // 1.5/-0.5 sums to 1 but
    // yields an unreachable split
    val u = uniformDraw(col(keyCol), salt)
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val assigned = splits.init.zip(cum.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), bound)) =>
        Some(acc.fold(when(u < bound, name))(_.when(u < bound, name)))
      }
      .fold(lit(splits.head._1))(_.otherwise(splits.last._1))
    df.withColumn("u", round(u, 6)).withColumn("split", assigned)
  }

  /** Deterministic Bernoulli sample: keep rows whose draw falls below
    * `fraction`. The same row set is selected on every run and engine —
    * the reproducible form of `df.sample(fraction)`.
    */
  def sampleByHash(df: DataFrame, keyCol: String, salt: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    df.filter(uniformDraw(col(keyCol), salt) < fraction)
  }

  /** Per-stratum deterministic sampling — the reproducible form of
    * `df.stat.sampleBy`: each stratum keeps its own fraction of rows via
    * the same md5 draw; strata absent from `fractions` are dropped.
    * Ordered pairs (not a Map) so the generated plan is stable. The
    * shape quota-balances a corpus (e.g. per-language budgets) in one
    * shuffle-free pass.
    */
  def sampleStratified(df: DataFrame, keyCol: String, strataCol: String,
      salt: String, fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty
        && fractions.forall { case (_, f) => f >= 0.0 && f <= 1.0 },
      "fractions must be in [0,1]")
    val frac = fractions.foldLeft(Option.empty[Column]) {
      case (acc, (stratum, f)) =>
        Some(acc.fold(when(col(strataCol) === stratum, f))(
          _.when(col(strataCol) === stratum, f)))
    }.get.otherwise(lit(0.0))
    df.filter(uniformDraw(col(keyCol), salt) < frac)
  }

  /** The hot-segment index for [[dropBoilerplateWith]]: the distinct
    * [[PortableHash.hash60]] values of segments appearing in ≥ `minDocs`
    * documents — the freeze side of the freeze-then-score split (the
    * boilerplate twin of the BM25 corpus-stats / minhash band-index
    * recipe). Boilerplate is by definition the repeated MINORITY of
    * segment space, so the index is small (segment-cardinality shrinks
    * to the hot tail); it is refreshed at corpus cadence, not per
    * document.
    */
  def boilerplateIndex(df: DataFrame, idCol: String, textCol: String,
      minDocs: Long, chunkTokens: Int = 0,
      delim: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2 (got $minDocs)")
    val ex = df
      .select(col(idCol), explode(segmentArray(textCol, chunkTokens, delim))
        .as("seg"))
      .withColumn("seg", trim(col("seg")))
      .where(col("seg") =!= "")
      .withColumn("h", PortableHash.hash60(col("seg")))
    ex.groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("h"))
  }

  /** STREAM-runnable boilerplate removal: clean each arriving document
    * against a FROZEN hot-segment set — a pure per-row projection (the
    * hot hashes ride along as a literal array, membership is
    * `array_contains` inside higher-order functions), so the streaming
    * engine runs it with no state, no watermark, no shuffle. Same output
    * contract as [[dropBoilerplate]] (`n_segs`, `n_boiler`, `<out>`,
    * NULL `<out>` when a doc has no segments) — parity with the batch
    * form on a shared corpus is spec-pinned. `maxIndex` bounds the
    * literal (a hot set past ~10k entries should become a stream-static
    * join instead; failing loudly beats a megabyte-scale plan).
    */
  def dropBoilerplateWith(df: DataFrame, idCol: String, textCol: String,
      hotHashes: Seq[Long], out: String, chunkTokens: Int = 0,
      delim: String = "\n", maxIndex: Int = 10000): DataFrame = {
    require(hotHashes.length <= maxIndex,
      s"dropBoilerplateWith: ${hotHashes.length} hot segments exceeds " +
        s"maxIndex $maxIndex — use a stream-static join at this scale")
    val joiner = if (chunkTokens > 0) " " else delim
    val hot = array(hotHashes.map(lit): _*)
    val segs = filter(
      transform(segmentArray(textCol, chunkTokens, delim), s => trim(s)),
      s => s =!= "")
    val isHot: Column => Column =
      s => array_contains(hot, PortableHash.hash60(s))
    val kept = filter(segs, s => !isHot(s))
    df.withColumn("n_segs", size(segs).cast("long"))
      .withColumn("n_boiler", (size(segs) - size(kept)).cast("long"))
      .withColumn(out,
        when(col("n_segs") > 0, concat_ws(joiner, kept)))
  }

  /** The segment array of a document — [[dropBoilerplate]]'s
    * segmentation, shared with the index/stream forms so the three can
    * never disagree on what a "segment" is. `chunkTokens > 0` cuts the
    * whitespace token stream into fixed windows (guarded against the
    * descending-sequence trap on empty docs); otherwise a `delim` regex
    * split.
    */
  private def segmentArray(textCol: String, chunkTokens: Int,
      delim: String): Column = {
    val toks = split(col(textCol), " ")
    if (chunkTokens > 0) {
      val nSeg = ceil(size(toks) / lit(chunkTokens.toDouble)).cast("int")
      when(nSeg > 0,
        transform(sequence(lit(0), nSeg - lit(1)),
          i => concat_ws(" ",
            slice(toks, i * chunkTokens + 1, lit(chunkTokens)))))
        .otherwise(array())
    } else split(col(textCol), delim)
  }

  /** Overlapping token-window chunking — the RAG / long-context split
    * ([[segmentArray]] is the non-overlapping form): each chunk shares
    * `overlap` tokens with its predecessor so no boundary-spanning fact
    * is lost to a hard cut. Chunk `i` starts at token `i · step`
    * (`step = chunkTokens − overlap`); the tail chunk may run short;
    * `ceil(max(n − overlap, 1) / step)` chunks total, so every
    * non-empty document yields at least one. ONE narrow explode over
    * codegen'd array ops — no shuffle, no join, any corpus size —
    * keyed (id, chunk_idx) for the downstream embed/index pass.
    */
  def chunkOverlapping(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0,
      s"chunkOverlapping: chunkTokens must be positive: $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"chunkOverlapping: overlap $overlap not in [0, $chunkTokens)")
    val step = chunkTokens - overlap
    val toks = filter(split(col(textCol), " "), t => length(t) > 0)
    df.select(col(idCol), toks.as("__t"))
      .withColumn("__n", size(col("__t")).cast("long"))
      .filter(col("__n") > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        ceil(greatest(col("__n") - lit(overlap.toLong), lit(1L))
          .cast("double") / lit(step.toDouble)).cast("long") - 1)))
      .select(col(idCol), col("chunk_idx"),
        concat_ws(" ", slice(col("__t"),
          (col("chunk_idx") * step + 1).cast("int"),
          lit(chunkTokens))).as("chunk_text"),
        least(lit(chunkTokens.toLong),
          col("__n") - col("chunk_idx") * step).as("n_tokens"))
  }

  /** EXACT-N per-group deterministic sample — the quota form the
    * fraction-based [[sampleStratified]] can't promise ("give me exactly
    * 50 eval docs per language"): within each stratum, the `n` rows with
    * the smallest md5 draws win. Key-deterministic like every draw here
    * — rerunnable, engine-portable, and a superset property holds
    * (growing `n` only adds rows; the draw order never reshuffles).
    *
    * Scale shape: the naive form is one `row_number` window per stratum
    * — a hot stratum (billions of rows) SORTS in a single task, the
    * ntile trap [[curriculumBins]] avoids. This is the two-phase escape:
    * per-stratum counts (one map-side-combinable agg, group-cardinality
    * sized — broadcasts back), a draw pre-filter at `safety · n / cnt`
    * that keeps ~`safety·n` expected survivors per stratum, and the
    * exact rank only over the survivors — the window partition is
    * bounded by the safety margin, not by the stratum. The pre-filter
    * is PART of the defined semantics (both engines replay it), and a
    * shortfall needs the smallest-draw count to undershoot `n` by
    * `safety`× — Chernoff-improbable and, being key-deterministic,
    * identical in every engine if it ever happens. Strata with fewer
    * than `n` rows keep everything (the threshold caps at 1).
    */
  def sampleExactN(df: DataFrame, keyCol: String, strataCol: String,
      n: Int, salt: String, safety: Double = 4.0): DataFrame = {
    require(n > 0, s"n must be positive (got $n)")
    require(safety >= 1.0, s"safety must be >= 1 (got $safety)")
    val cnt = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("__u"), col(keyCol))
    df.withColumn("__u", uniformDraw(col(keyCol), salt))
      .join(broadcast(cnt), Seq(strataCol))
      .filter(col("__u") < least(lit(1.0),
        lit(safety * n) / col("__cnt")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__cnt", "__rn")
  }

  /** Domain-mixing plan: given target mixture weights per group (source,
    * language, domain — the DoReMi/Pile-style recipe) and a total token
    * budget, compute each group's available tokens, its target share of
    * the budget, and the deterministic sampling fraction that achieves it
    * (capped at 1 — you cannot sample more than a group has; an
    * under-supplied group is reported, not silently re-weighted, so the
    * recipe stays auditable). Groups outside the recipe get fraction 0.
    *
    * One group-sized aggregation (map-side combinable, one shuffle);
    * `fraction` is kept at full double precision for [[mixSample]] —
    * round only for display.
    */
  def mixFractions(df: DataFrame, groupCol: String, textCol: String,
      targets: Seq[(String, Double)], budgetTokens: Long): DataFrame = {
    require(targets.nonEmpty
        && math.abs(targets.map(_._2).sum - 1.0) < 1e-9,
      "mixture weights must sum to 1")
    require(budgetTokens > 0, "budgetTokens must be positive")
    val nTok = (length(col(textCol))
      - length(regexp_replace(col(textCol), " ", "")) + 1).cast("long")
    val weight = targets.foldLeft(Option.empty[Column]) {
      case (acc, (g, w)) =>
        Some(acc.fold(when(col(groupCol) === g, w))(
          _.when(col(groupCol) === g, w)))
    }.get.otherwise(lit(0.0))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(nTok).as("avail_tokens"))
      .withColumn("target_tokens", weight * budgetTokens)
      .withColumn("fraction",
        least(lit(1.0), col("target_tokens") / col("avail_tokens")))
  }

  /** Apply a [[mixFractions]] plan: keep each row iff its deterministic
    * md5 draw falls below its group's fraction. The fractions table is
    * group-sized (tiny) and broadcast; the draw is the same salted
    * construction as [[sampleByHash]], so the selected set is stable
    * across runs, engines and partitionings. Expected output token count
    * ≈ min(budget, available) per group.
    */
  def mixSample(df: DataFrame, idCol: String, groupCol: String,
      textCol: String, salt: String, targets: Seq[(String, Double)],
      budgetTokens: Long): DataFrame = {
    val fr = mixFractions(df, groupCol, textCol, targets, budgetTokens)
      .select(col(groupCol), col("fraction"))
    df.join(broadcast(fr), Seq(groupCol))
      .filter(uniformDraw(col(idCol), salt) < col("fraction"))
      .drop("fraction")
  }

  /** Hashed n-gram features (unigrams + bigrams, md5 → one of `nBuckets`
    * buckets) — the fixed-dimension text featurization of DSIR-style data
    * selection (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): hashing bounds the model table at `nBuckets`
    * rows NO MATTER the corpus vocabulary, which is what makes the
    * importance models broadcastable at 100 TB where a vocab-sized table
    * (cf. [[TextStats.rarityScore]]) keeps growing. One row per feature
    * OCCURRENCE (multiplicity preserved), portable md5 bucket assignment
    * so the whole featurization replays in DuckDB.
    */
  private def hashedFeats(df: DataFrame, idCol: String, textCol: String,
      nBuckets: Int, salt: String,
      carryCols: Seq[String] = Seq.empty): DataFrame = {
    val toks = split(col(textCol), " ")
    val bi = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val keep = col(idCol) +: carryCols.map(col)
    Scale.fanOut(df)
      .select(keep :+ explode(concat(toks, bi)).as("__g"): _*)
      .select(keep :+
        pmod(PortableHash.hash60(concat(col("__g"), lit("|" + salt))),
          lit(nBuckets.toLong)).as("bucket"): _*)
  }

  /** DSIR-style importance weights: per raw doc, the log-likelihood ratio
    * of a TARGET-domain hashed-n-gram unigram model over a RAW-corpus one
    * (add-1 smoothing over the `nBuckets` feature space) — docs that look
    * like the target domain score high, and resampling raw data by these
    * weights shifts its distribution toward the target (the published
    * importance-resampling recipe for pretraining data selection).
    *
    * Scale shape: both models are aggregates onto the FIXED `nBuckets`
    * feature space (never vocab-sized — the point of hashing), re-joined
    * to the per-doc feature counts broadcast-style (AQE sees the
    * bucket-sized sides); the corpus totals are a 1-row crossJoin like
    * the perplexity N. One explode pass per corpus, everything else
    * bucket- or doc-sized. Returns (idCol, n_feats, log_weight).
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, nBuckets: Int = 4096,
      salt: String = "dsir1"): DataFrame = {
    require(nBuckets > 0, "dsirWeights: nBuckets must be positive")
    // BOTH corpora explode in ONE pass over their tagged union, and one
    // (side, doc, bucket) aggregation is the single exchange everything
    // downstream rolls up from. The previous shape built the target and
    // raw models from separate hashedFeats lineages; the broadcast
    // `totals` subtree then re-executed each explode a second time
    // (exchange reuse does not cross the broadcast boundary) — measured
    // at sf0.1 as the whole pipeline running twice. localCheckpoint cuts
    // the lineage so the exploded aggregation is computed exactly once
    // (guide §1.2: don't compute things twice; §5: localCheckpoint for
    // a reused intermediate whose fault tolerance is not critical).
    val tagged = raw
      .select(col(idCol), col(textCol), lit(false).as("__tgt"))
      .unionByName(target
        .select(col(idCol), col(textCol), lit(true).as("__tgt")))
    val grouped = hashedFeats(tagged, idCol, textCol, nBuckets, salt,
      carryCols = Seq("__tgt"))
      .groupBy(col("__tgt"), col(idCol), col("bucket"))
      .agg(count(lit(1)).as("__m"))
      .localCheckpoint(false)
    // target model, raw per-doc counts, raw model: small rollups over
    // the checkpointed aggregation — same integer counts as the
    // two-lineage form (the __tgt flag keeps the corpora separate even
    // if a doc id appeared in both)
    val tgtC = grouped.filter(col("__tgt"))
      .groupBy(col("bucket")).agg(sum(col("__m")).as("__ct"))
    val docF = grouped.filter(!col("__tgt"))
      .select(col(idCol), col("bucket"), col("__m"))
    val rawC = docF.groupBy(col("bucket")).agg(sum(col("__m")).as("__cr"))
    // both corpus totals in ONE aggregation over the checkpointed frame
    val totals = grouped.agg(
      coalesce(sum(when(col("__tgt"), col("__m"))), lit(0L)).as("__t"),
      coalesce(sum(when(!col("__tgt"), col("__m"))), lit(0L)).as("__r"))
    docF
      .join(tgtC, Seq("bucket"), "left")
      .withColumn("__ct", coalesce(col("__ct"), lit(0L)))
      .join(rawC, Seq("bucket")) // inner: every doc bucket is in rawC
      .crossJoin(broadcast(totals))
      .withColumn("__lw", col("__m")
        * (log((col("__ct") + 1).cast("double")
            / (col("__t") + nBuckets).cast("double"))
          - log((col("__cr") + 1).cast("double")
            / (col("__r") + nBuckets).cast("double"))))
      .groupBy(col(idCol))
      .agg(sum(col("__m")).as("n_feats"),
        round(sum(col("__lw")), 6).as("log_weight"))
  }

  /** Gumbel-top-k importance resampling over [[dsirWeights]] — the
    * published selection step: adding Gumbel noise to the log weights and
    * taking the top k draws a WITHOUT-REPLACEMENT sample distributed as
    * softmax(log weights), preserving diversity where a plain top-k would
    * take one dense cluster of near-identical target-like docs. The noise
    * is the deterministic portable-md5 uniform (g = −ln(−ln u)), so the
    * selected set is stable across runs and engines and the whole draw
    * replays in the oracle. LIMIT boundary on the ROUNDED key + id.
    */
  def dsirSample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, nBuckets: Int = 4096,
      salt: String = "dsir1"): DataFrame =
    dsirWeights(raw, target, idCol, textCol, nBuckets, salt)
      .withColumn("__u", PortableHash.uniform01(
        concat(col(idCol).cast("string"), lit("|g|" + salt))))
      .withColumn("gumbel_key",
        round(col("log_weight") - log(-log(col("__u"))), 6))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("log_weight"), col("gumbel_key"))

  /** Curriculum bins: assign every row to one of `nBins` quantile bins of
    * `scoreCol` (bin 1 = lowest) — the construction behind
    * quality-ordered curricula and quality-stratified mixing. NOT a
    * global `ntile` window (a single-partition sort of the whole corpus —
    * the one shape that cannot scale): the `nBins − 1` interior exact
    * quantile boundaries are ONE aggregation (metadata-sized result,
    * 1-row crossJoin broadcast back) and assignment is a narrow
    * projection counting boundaries below the row's score. At 100 TB
    * swap the exact percentile for `percentile_approx` — same plan,
    * sketch-mergeable boundary pass; exact here so the bin edges replay
    * bit-for-bit in the oracle. Both sides compare at 6-dp rounding so an
    * engine ulp in the interpolated boundary cannot flip a bin.
    */
  def curriculumBins(df: DataFrame, idCol: String, scoreCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "curriculumBins: need at least 2 bins")
    val ps = (1 until nBins).map(i => i.toDouble / nBins)
    val bounds = df.agg(
      expr(s"percentile(`$scoreCol`, array(${ps.mkString(", ")}))")
        .as("__bs"))
    df.crossJoin(broadcast(bounds))
      .select(col(idCol), round(col(scoreCol), 6).as(scoreCol),
        (lit(1) + size(filter(col("__bs"),
          b => round(b, 6) < round(col(scoreCol), 6)))).as("bin"))
  }

  /** Epoch upsampling — the "repeat the good data" knob of a pretraining
    * mixture (Wikipedia 3×, books 2.5×, web 1×): each row is replicated
    * `floor(w)` times plus one more with probability `frac(w)`, the
    * fractional draw deterministic per (key, salt) through the portable
    * md5 — so weight 2.5 yields EXACTLY the right expected token count
    * and the same copies on every run and engine. One narrow
    * explode — no shuffle, no join; output carries `epoch` (1-based
    * copy index) so downstream shuffles can interleave copies instead
    * of clustering them. Weight 0 drops the group (a mixture is also a
    * filter); weights must be non-negative.
    */
  def upsampleEpochs(df: DataFrame, idCol: String, groupCol: String,
      epochs: Map[String, Double], salt: String,
      default: Double = 1.0): DataFrame = {
    require(epochs.values.forall(_ >= 0) && default >= 0,
      s"upsampleEpochs: negative weight in $epochs / $default")
    val w = epochs.foldLeft(lit(default)) { case (acc, (g, wt)) =>
      when(col(groupCol) === g, lit(wt)).otherwise(acc)
    }
    df.withColumn("__w", w)
      .withColumn("__n", floor(col("__w")).cast("int") +
        when(uniformDraw(col(idCol), salt) < col("__w") - floor(col("__w")),
          1).otherwise(0))
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(1), col("__n"))))
      .drop("__w", "__n")
  }

  /** Deterministic corpus shuffle with SCALABLE global enumeration —
    * the reproducible "shuffle the corpus before training" pass. Each
    * row draws its position key from the portable md5 (same draw every
    * run/engine), and the global 0-based `shuffle_pos` is assigned
    * WITHOUT a single-partition global sort (`row_number()` over an
    * unpartitioned window is the anti-pattern — one task sorts 100 TB):
    * range-partition by (draw, key) + in-partition sort gives a
    * globally sorted layout across `nParts` tasks; per-partition row
    * counts (nParts numbers to the driver) prefix-sum into offsets; and
    * `monotonically_increasing_id`'s (partition << 33 | local counter)
    * structure converts to the global position arithmetically. Two
    * passes over the data, both parallel — the zipWithIndex idiom in
    * pure DataFrame API.
    */
  def shufflePositions(df: DataFrame, idCol: String, salt: String,
      nParts: Int): DataFrame = {
    require(nParts >= 1, s"shufflePositions: nParts=$nParts")
    // localCheckpoint PINS the partitioning: repartitionByRange SAMPLES
    // to pick boundaries, seeded per-execution — without materializing,
    // the counts pass and the final pass are independent executions
    // whose boundaries (and so per-partition counts) can differ once
    // partitions exceed the sample, silently duplicating/skipping
    // positions. It also makes the second pass read blocks, not re-sort.
    val sorted = df
      .withColumn("__k", uniformDraw(col(idCol), salt))
      .repartitionByRange(nParts, col("__k"), col(idCol))
      .sortWithinPartitions(col("__k"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint()
    val counts = sorted.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until nParts).scanLeft(0L) {
      (acc, p) => acc + counts.getOrElse(p, 0L)
    }
    // offsets ride a broadcast join (nParts rows), not a when-chain —
    // thousands of partitions must not become thousands of codegen
    // branches in the row projection
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = (0 until nParts).map(p => (p, offsets(p)))
      .toDF("__pid", "__off")
    sorted
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("shuffle_pos",
        col("__off") + (col("__mid") - (col("__pid").cast("long") * (1L << 33))))
      .drop("__k", "__pid", "__mid", "__off")
  }

  /** Deterministic weighted systematic sampling (X116): inclusion
    * probability ∝ weight, WITHOUT randomness — the classic cumulative-
    * weight stride selection over a portable-hash order. Row i (in
    * ascending (hash60(key|salt), key) order, cumulative exclusive
    * weight C_i, total W) is emitted with
    *
    *   n_copies = floor((C_i + w_i)·m / W) − floor(C_i·m / W)
    *
    * — the count of the m stride points j·W/m landing inside its weight
    * interval. Σ n_copies = m EXACTLY, every arithmetic step is integer
    * (bigint products — requires m·W < 2^63, i.e. fine up to ~10^14
    * total token-weight at m=10^4), and the hash order is the portable
    * md5 draw, so the SELECTED MULTISET replays bit-identically in any
    * engine: a FULL value oracle on a weighted sampler, where an
    * `A-ExpJ`-style `u^(1/w)` key would hinge on cross-engine `pow`
    * ulps. Rows with heavy weight (≥ W/m) are always selected, with
    * proportional multiplicity — standard systematic-sampling
    * semantics (the DSIR/upsampling shape X79 consumes).
    *
    * Scale shape: the [[shufflePositions]] two-pass idiom with weights —
    * NO unpartitioned window. Range-partition by the draw (pinned by
    * `localCheckpoint`, same reasoning as X80), per-partition weight
    * sums (nParts longs) prefix into offsets on the driver, and the
    * in-partition exclusive cumsum runs under a window PARTITIONED by
    * the range bucket. Two parallel passes, broadcast offsets.
    *
    * Null, non-positive, and NON-INTEGRAL weights are refused loudly
    * (a silent drop or truncation would skew every downstream
    * mixture); fractional-weight callers scale to integer units first.
    */
  def weightedSystematicSample(df: DataFrame, idCol: String,
      weightCol: String, salt: String, m: Int, nParts: Int): DataFrame = {
    require(m >= 1, s"weightedSystematicSample: m=$m")
    require(nParts >= 1, s"weightedSystematicSample: nParts=$nParts")
    val spark = df.sparkSession
    import spark.implicits._
    // Non-integral weights are ALSO refused: casting 0.6 to long would
    // silently drop the row (and 1.9 would halve its inclusion mass),
    // skewing the mixture the doc promises to protect. Callers with
    // fractional weights must scale to integer units first.
    val wChecked = when(col(weightCol).isNull || col(weightCol) <= 0 ||
        col(weightCol).cast("double") =!=
          col(weightCol).cast("long").cast("double"),
      raise_error(lit("graft.ext.Curate: null/non-positive/non-integral " +
        "weight in weightedSystematicSample — scale fractional weights " +
        "to integer units first")))
      .otherwise(col(weightCol).cast("long"))
    val sorted = df
      .withColumn("__k", PortableHash.hash60(
        concat(col(idCol).cast("string"), lit("|" + salt))))
      .withColumn("__w", wChecked)
      .repartitionByRange(nParts, col("__k"), col(idCol))
      .sortWithinPartitions(col("__k"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val wsums = sorted.groupBy("__pid").agg(sum("__w").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until nParts).scanLeft(0L) {
      (acc, p) => acc + wsums.getOrElse(p, 0L)
    }
    val totalW = offsets.last
    require(totalW > 0, "weightedSystematicSample: empty input")
    val offsetDf = (0 until nParts).map(p => (p, offsets(p)))
      .toDF("__pid", "__off")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("__k"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    sorted
      .withColumn("__local", coalesce(sum(col("__w")).over(win), lit(0L)))
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("__c", col("__off") + col("__local"))
      .withColumn("n_copies",
        expr(s"(__c + __w) * ${m}L DIV ${totalW}L - __c * ${m}L DIV ${totalW}L"))
      .filter(col("n_copies") > 0)
      .select(col(idCol), col("__w").as("weight"), col("n_copies"))
  }

  /** Email / IPv4 / phone patterns shared by count and redaction. Written
    * in the common subset of Java regex and RE2 (no backreferences, no
    * lookaround) so the DuckDB oracle evaluates them identically.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhonePattern = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** PII scrubbing: counts each PII class on the ORIGINAL text, then
    * redacts in a fixed order (emails, then IPv4s, then phone-shaped
    * digit runs — the earlier passes consume the digits that would
    * otherwise double-match). Adds `n_emails`/`n_ips`/`n_phones` and
    * `<out>` with `<EMAIL>`/`<IP>`/`<PHONE>` placeholders.
    */
  def redactPii(df: DataFrame, textCol: String, out: String): DataFrame =
    df.withColumn("n_emails", regexp_count(col(textCol), lit(EmailPattern)))
      .withColumn("n_ips", regexp_count(col(textCol), lit(Ipv4Pattern)))
      .withColumn("n_phones", regexp_count(col(textCol), lit(PhonePattern)))
      .withColumn(out,
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
            Ipv4Pattern, "<IP>"),
          PhonePattern, "<PHONE>"))

  /** The modern pretraining front-end, end-to-end as ONE composed plan:
    * exact dedup after normalization (fingerprint window-min, the
    * [[TextStats.curate]] shape) → Gopher rule gate
    * ([[TextStats.gopherKeep]]) → deterministic split assignment
    * ([[assignSplits]]) → per-split sequence packing
    * ([[packSequences]]). Every stage is an individually-oracled
    * operator, and the composition itself is value-checked end-to-end
    * in DuckDB (`q_curation_full`).
    *
    * Scale shape: exactly TWO shuffles for the whole pipeline — the
    * fingerprint window and the split-keyed packing window; the rule
    * gate and the split draw ride along as narrow projections.
    */
  def curateFull(df: DataFrame, idCol: String, textCol: String,
      salt: String, splits: Seq[(String, Double)], budgetTokens: Long,
      minStopwords: Int = TextStats.GopherMinStopwords): DataFrame = {
    val deduped = TextStats.dedupByFingerprint(df, idCol, textCol).drop("fp")
    val ruled = deduped.filter(
      TextStats.gopherKeep(textCol, minStopwords = minStopwords))
    packSequences(assignSplits(ruled, idCol, salt, splits),
      idCol, textCol, "split", budgetTokens)
  }

  /** Sequence packing — assign each document to the fixed-token-budget
    * training sequence it lands in under GPT-style concat-and-chunk:
    * documents are concatenated in deterministic (`shardCol`, `idCol`)
    * order and cut every `budgetTokens`; a document's pack is where its
    * first token falls. Adds `n_tokens`, `start_tok` (the document's
    * offset in the shard's token stream) and `pack_id`.
    *
    * Packing is shard-local (`pack_id` is per-shard): a single global
    * stream would serialize 100 TB through one cumulative sum, while a
    * shard (source, split, date bucket …) bounds each window partition —
    * the same layout training jobs shard data files by anyway. The
    * cumulative sum is exact integer arithmetic over the whitespace
    * token identity, so every value replays in the DuckDB oracle.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      shardCol: String, budgetTokens: Long): DataFrame = {
    val nTok = (length(col(textCol))
      - length(regexp_replace(col(textCol), " ", "")) + 1).cast("long")
    packCounted(df.select(col(idCol), col(shardCol), nTok.as("n_tokens")),
      idCol, shardCol, "n_tokens", budgetTokens)
  }

  /** [[packSequences]] over an already-counted frame — the form for
    * pipelines that carry `tokensCol` from an earlier stage (e.g. the
    * classifier feature pass), saving the text re-scan the textCol form
    * pays. Output (`n_tokens`, `start_tok`, `pack_id`) is identical
    * when the count convention matches.
    */
  def packCounted(df: DataFrame, idCol: String, shardCol: String,
      tokensCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    // ROWS, not the default RANGE frame: RANGE treats tied ids as peers
    // and would hand every tied row the same (wrong) cumulative sum —
    // the oracle replays the explicit ROWS frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.select(col(idCol), col(shardCol),
        col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("start_tok",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack_id", expr(s"start_tok DIV $budgetTokens"))
  }

  /** Pack-level rollup of [[packSequences]] — docs per sequence and the
    * tokens that START in it (the fill-level audit you run after
    * packing; a tail pack under budget or a shard full of 1-doc packs
    * means the budget or shard key is wrong). One map-side-combinable
    * aggregation on top of the packing window.
    */
  def packSummary(packed: DataFrame, shardCol: String): DataFrame =
    packed.groupBy(col(shardCol), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("start_tok")).as("first_start"))

  /** Cross-document boilerplate removal (the C4 / RefinedWeb line-dedup
    * stage): segment every document, count each distinct segment's
    * document frequency across the corpus, and strip the segments that
    * appear in ≥ `minDocs` documents — nav bars, cookie banners,
    * "subscribe now" footers — while preserving the order of what
    * survives. Emits one row per input document: `n_segs`,
    * `n_boiler` (segment INSTANCES dropped, so a doc repeating its own
    * hot line counts each copy), and `<out>` = the surviving segments
    * re-joined in original order ("" when everything was boilerplate;
    * a doc with no segments at all keeps `n_segs = 0` and a NULL
    * `<out>` — nothing was removed because nothing was there).
    *
    * Segmentation is pluggable: `chunkTokens > 0` cuts the whitespace
    * token stream into consecutive fixed-size windows (the form that
    * gives single-line corpora like the synthetic testdata a real
    * segment granularity); otherwise documents split on the `delim`
    * regex (the production "\n" line mode). Blank segments are dropped
    * before counting — runs of delimiters are not boilerplate evidence.
    *
    * Scale shape (100 TB): ONE corpus scan, TWO shuffles, ZERO joins.
    * The corpus explodes once (`posexplode_outer` of the pre-filtered
    * segment array, so a segment-less document keeps a null carrier row
    * — no join-back needed to resurrect it); everything shuffles on
    * [[PortableHash.hash60]] of the segment — an 8-byte key instead of
    * the segment string — and BOTH doc-frequency steps ride that one
    * exchange: a `lag` flag marks each (segment, doc)'s first instance
    * under the (id, pos) sort, and a whole-partition windowed sum turns
    * the flags into the distinct-doc count (≡ `countDistinct`, without
    * the aggregate whose partial pass would force a second, different
    * exchange). The per-doc regroup is the second and last shuffle;
    * `collect_list` there is bounded by one document's segments. An
    * ultra-hot segment concentrates its window partition in one task —
    * the sort is external (spills, never OOMs), and the pathological
    * case (a segment in EVERY doc) is exactly the boilerplate a cheaper
    * upstream exact-dedup pass already collapses.
    */
  def dropBoilerplate(df: DataFrame, idCol: String, textCol: String,
      minDocs: Long, out: String, chunkTokens: Int = 0,
      delim: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2 (got $minDocs): " +
      "at 1 every segment is boilerplate and the output is empty")
    val joiner = if (chunkTokens > 0) " " else delim
    val segsF = filter(
      transform(segmentArray(textCol, chunkTokens, delim), s => trim(s)),
      s => s =!= "")
    val ex = df
      .select(col(idCol), posexplode_outer(segsF).as(Seq("pos", "seg")))
      .withColumn("h", PortableHash.hash60(col("seg")))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col(idCol), col("pos"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h"))
    val prev = lag(col(idCol), 1).over(wOrd)
    val flagged = ex
      .withColumn("__m",
        when(col("seg").isNotNull &&
          (prev.isNull || prev =!= col(idCol)), 1L).otherwise(0L))
      .withColumn("__df", sum(col("__m")).over(wAll))
    flagged.groupBy(col(idCol))
      .agg(
        count(col("seg")).as("n_segs"),
        sum(when(col("__df") >= minDocs && col("seg").isNotNull, 1L)
          .otherwise(0L)).as("n_boiler"),
        concat_ws(joiner, transform(
          array_sort(collect_list(
            when(col("__df") < minDocs && col("seg").isNotNull,
              struct(col("pos"), col("seg"))))),
          s => s.getField("seg"))).as(out))
      .select(col(idCol), col("n_segs"), col("n_boiler"),
        when(col("n_segs") > 0, col(out)).as(out))
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash),
  * key-based, exact n-gram Jaccard on shingle-share candidates, MinHash
  * signatures with LSH banding, and SimHash with chunk-based banding.
  *
  * Scale posture: every variant avoids the all-pairs O(n²) comparison.
  * Candidates come from equality joins on content keys (hash / shingle /
  * band / chunk), so the only shuffles are hash-partitioned on those keys
  * and the pair set is proportional to true collisions, not n².
  */
/** Raised when [[Dedup.connectedComponents]] fails to converge within its
  * round budget — the pair graph's diameter exceeds `maxIters`, which a
  * legitimately chainy near-dup corpus can do. Distinct from
  * `IllegalArgumentException` (a usage error) so callers of
  * [[Dedup.resolveByComponents]] can catch it and retry with a larger
  * `maxIters` instead of treating it as a bug.
  */
final class ConvergenceException(msg: String) extends RuntimeException(msg)

object Dedup {

  /** One-row exact-duplication summary over a content hash
    * (SHA-256 of the raw text).
    */
  def exactSummary(df: DataFrame, textCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(sha2(col(textCol), 256)).as("n_unique"),
      (count(lit(1)) - countDistinct(sha2(col(textCol), 256))).as("n_dup_rows"))

  /** Key-based dedup: one surviving row id per key group + group size —
    * `groupBy(keys).agg(min(id), count)` is the scalable form of
    * `dropDuplicates` that also reports what was collapsed.
    */
  def byKeys(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct k-token shingles per document: (id, shingle) pairs. The
    * [[graft.plans.ShingleStrings]] kernel emits the per-document distinct
    * set in one codegen'd projection — per-doc distinct ≡ distinct
    * (id, shingle) pairs, with no string-shuffle and none of the HOF
    * formulation's per-position allocation.
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    Scale.fanOut(df).select(col(idCol),
        explode(call_function(graft.plans.GraftFunctions.ShingleStringsName,
          col(textCol), lit(k))).as("shingle"))
  }

  /** Distinct shingles keyed by 64-bit hash instead of the string — the
    * join/shuffle currency for jaccard and minhash. Hashing before the
    * shuffle cuts exchange volume ~8× (8-byte key vs ~50-byte string) and
    * set sizes/intersections are unchanged modulo 64-bit collisions
    * (~1e-19 per pair). The [[graft.plans.ShingleHashes]] kernel emits the
    * per-document DISTINCT set, so no global `.distinct()` shuffle is
    * needed — distinct (id, sh) pairs ≡ per-document distinct hashes.
    */
  private def hashedShingles(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    docShingleSets(df, idCol, textCol, k)
      .select(col(idCol), explode(col("sh_set")).as("sh"))

  /** Exact n-gram Jaccard over candidate pairs that share ≥1 k-shingle.
    *
    * Single-scan plan: one narrow projection per document computes the
    * distinct hashed-shingle array AND its size (`n_sh`) — per-doc set
    * sizes cost zero extra scans and zero joins. The explode carries
    * `n_sh` alongside each shingle; one shuffle groups shingles into
    * buckets; pairs are expanded inside each bucket's sorted (id, n_sh)
    * struct array (d1 < d2 by construction) with both counts riding along,
    * and a final pair-keyed aggregation counts shared shingles. Total:
    * 1 scan, 2 shuffles, 0 joins (vs 3 scans + 2 count-joins for the
    * naive shingle/count/join formulation). Pair volume stays Σ|bucket|²,
    * proportional to true collisions, never n².
    *
    * Stop-gram guard: a shingle appearing in more than `maxDocFreq`
    * documents is a stop-gram — it contributes ~|bucket|²/2 candidate
    * structs materialized in ONE row of ONE task, the classic LSH hot-key
    * OOM. Buckets above the cap are dropped from candidate generation and
    * from `shared` counts (standard dedup practice); `n1`/`n2` remain the
    * TRUE full set sizes, so the reported jaccard is a lower bound for
    * pairs that also shared dropped stop-grams and exact for all others.
    * Use [[hotShingles]] to audit what a given cap drops.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, maxDocFreq: Int = 1000): DataFrame =
    docShingleSets(Scale.fanOut(df), idCol, textCol, k)
      .select(col(idCol), col("n_sh"), explode(col("sh_set")).as("sh"))
      .groupBy(col("sh"))
      .agg(sort_array(collect_list(struct(col(idCol).as("id"),
        col("n_sh").as("n")))).as("ids"))
      .filter(size(col("ids")).between(2, maxDocFreq))
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ids) - 1),
          |  i -> transform(slice(ids, i + 1, size(ids) - i),
          |    x -> struct(element_at(ids, i).id AS d1, x.id AS d2,
          |                element_at(ids, i).n AS n1, x.n AS n2))))""".stripMargin))
        .as("p"))
      .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"),
        col("p.n1").as("n1"), col("p.n2").as("n2"))
      .agg(count(lit(1)).as("shared"))
      .select(col("d1"), col("d2"), col("shared"), col("n1"), col("n2"),
        round(col("shared") / (col("n1") + col("n2") - col("shared")), 6)
          .as("jaccard"))

  /** SimHash threshold audit — the [[minhashJaccardEstimate]] twin for
    * the hamming side of the house: for every exact candidate pair, the
    * portable-SimHash hamming distance (the quantity
    * [[simhashCandidates]]' `maxDist` acts on) next to the true n-gram
    * jaccard. Plot hamming vs jaccard to pick `maxDist` for a corpus
    * instead of inheriting 3.
    */
  def simhashJaccardAudit(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val pairs = ngramJaccardPairs(df, idCol, textCol, k)
      .select(col("d1"), col("d2"), col("jaccard"))
    // shuffle_hash for the same reason as [[bandedPairs]]: broadcast of the
    // tiny pair side would leave each signature join side without an
    // exchange, so the whole token-explode + 64-sum pipeline would run
    // twice; hinted, both sides shuffle on the SAME id partitioning and
    // the planner reuses one exchange — one signature computation.
    val sigs = simhashPortable(df, idCol, textCol).hint("shuffle_hash")
    pairs
      .join(sigs.as("a"), col("d1") === col(s"a.$idCol"))
      .join(sigs.as("b"), col("d2") === col(s"b.$idCol"))
      .select(col("d1"), col("d2"), col("jaccard"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS INT)").as("hamming"))
  }

  /** Resolve near-duplicate candidate pairs into the surviving corpus —
    * the step that turns a pair list ([[ngramJaccardPairs]],
    * [[minhashCandidatesPortable]], [[Similarity.nearDupPairs]] all
    * qualify: any frame with a `d2` drop side where d1 < d2) back into a
    * deduplicated document set. Greedy keep-lowest-id: every reported
    * pair drops its d2, so each duplicate cluster keeps its smallest id.
    * (Greedy, not connected components: in a chain a<b<c with pairs
    * (a,b),(b,c), both b and c are dropped even if (a,c) was never
    * reported — the standard one-pass canonicalization pretraining
    * pipelines use; exact CC needs iteration and rarely changes which
    * text survives.)
    *
    * 100 TB posture: the drop set is `distinct(d2)` — proportional to the
    * number of near-duplicates, a small fraction of the corpus — so AQE
    * turns the left-anti join into a broadcast; the corpus itself is
    * never shuffled.
    */
  def resolveNearDups(df: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("d2").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Connected components over a near-dup pair list: every document that
    * appears in a pair is labeled with the MINIMUM id reachable through
    * the pair graph — the transitive closure that [[resolveNearDups]]'s
    * greedy pairwise drop approximates. Needed whenever near-dup clusters
    * are not cliques: banding emits A–B and B–C but can miss A–C for
    * borderline pairs, and cluster-level decisions (keep one survivor per
    * CLUSTER, audit cluster sizes) need the component, not the pair.
    *
    * Implementation is min-label propagation with POINTER JUMPING (the
    * hash-to-min shape): each round every node takes the min of its own
    * component, its neighbors' components, and its candidate component's
    * OWN component — two hash joins + one aggregation, all partitioned
    * on id-typed keys, with each round's labels `localCheckpoint`ed so
    * lineage (and the LSH plan that produced the pairs) is computed
    * exactly once, not once per round. The label-of-label jump halves
    * chain depth per round, so rounds needed = O(log diameter) of the
    * largest cluster (spec-pinned: a 30-node path converges in ≤8 rounds,
    * not 29) — near-dup clusters are dense, so 2-3 in practice;
    * `maxIters` bounds the pathological path
    * graph and a non-converged exit raises [[ConvergenceException]]
    * (retry with a larger `maxIters` for chainy corpora) rather than
    * returning a half-propagated labeling or masquerading as a usage
    * error. The per-round convergence check is a 1-row
    * driver action — the same metadata-sized eager pattern as the index
    * builds. Batch-only.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "d1",
      bCol: String = "d2", maxIters: Int = 25): DataFrame =
    connectedComponentsWithRounds(pairs, aCol, bCol, maxIters)._1

  /** [[connectedComponents]] plus the number of propagation rounds it
    * took to converge — the scale-posture observable: rounds track the
    * diameter of the largest cluster, not the corpus size, so they
    * should stay flat as data grows (pinned by `Posture`'s 1× vs 10×
    * resolution section).
    */
  def connectedComponentsWithRounds(pairs: DataFrame, aCol: String = "d1",
      bCol: String = "d2", maxIters: Int = 25): (DataFrame, Int) = {
    require(!pairs.isStreaming, "connectedComponents is batch-only")
    // LAZY localCheckpoints (same shape as Bpe.train): the eager form
    // scheduled a separate materialization job per round before the
    // convergence count; lazily, the count action materializes the
    // round's labels inside its own job — one job per round, identical
    // lineage truncation. Retired generations need no bookkeeping:
    // materializing a round's checkpoint truncates its lineage, the
    // previous round's labels become unreachable, and the
    // ContextCleaner reclaims their blocks (Dataset.unpersist cannot
    // release localCheckpoint blocks — they are RDD-level, not
    // CacheManager entries).
    val edges = pairs
      .select(col(aCol).as("id"), col(bCol).as("nbr"))
      .union(pairs.select(col(bCol).as("id"), col(aCol).as("nbr")))
      .distinct()
      .localCheckpoint(false)
    var labels = edges.select(col("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(false)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxIters) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "nbr"), "nbr")
        .groupBy(col("id"))
        .agg(min(col("component")).as("__nbr_comp"))
      val stepped = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("component").as("__old"),
          least(col("component"),
            coalesce(col("__nbr_comp"), col("component"))).as("__c1"))
      // pointer jump (hash-to-min shape): follow the candidate label to
      // ITS label and take the min — labels always name a node in the
      // same component, so the invariant holds while chain depth halves
      // per round. Turns worst-case rounds from O(diameter) into
      // O(log diameter) for one extra id-keyed hash join per round —
      // the difference between 25 rounds and ~8 on a chainy pair graph.
      val next = stepped
        .join(labels.select(col("id").as("__c1"), col("component").as("__cc")),
          Seq("__c1"), "left")
        .select(col("id"), col("__old"),
          least(col("__c1"), coalesce(col("__cc"), col("__c1"))).as("component"))
        .localCheckpoint(false)
      changed = next.filter(col("component") < col("__old")).count()
      labels = next.select(col("id"), col("component"))
      round += 1
    }
    if (changed != 0) throw new ConvergenceException(
      s"connectedComponents did not converge in $maxIters rounds — the " +
        "pair graph has a cluster of diameter > maxIters; retry with a " +
        "larger maxIters (cost is one join+agg per extra round)")
    (labels, round)
  }

  /** Cluster-exact near-dup resolution: keep one survivor (the minimum
    * id) per CONNECTED COMPONENT of the pair graph, plus every unpaired
    * document. Strictly stronger than [[resolveNearDups]]'s greedy
    * pairwise drop — greedy keeps any node that only ever appears as
    * `d1` (pairs 2–3 and 1–3 keep BOTH 1 and 2, though 1~3~2 makes them
    * transitive duplicates); component resolution keeps exactly one per
    * cluster. The drop set (paired non-minima) is near-dup-sized, so the
    * anti-join broadcasts and the corpus is never shuffled, same as the
    * greedy form.
    */
  def resolveByComponents(df: DataFrame, idCol: String,
      pairs: DataFrame, maxIters: Int = 25): DataFrame =
    df.join(
      connectedComponents(pairs, maxIters = maxIters)
        .filter(col("id") =!= col("component"))
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")

  /** Per-document distinct hashed-shingle set + its size, in one narrow
    * codegen'd projection — no shuffle, no second scan, no per-position
    * allocation (see [[graft.plans.TextHashKernels]]; the HOF formulation
    * this replaces was GC-bound: 2.8 s GC in a 7.2 s task at sf0.1). The
    * shared front-end of [[ngramJaccardPairs]], [[hotShingles]] and
    * [[minhashSignatures]].
    */
  private def docShingleSets(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    // no blanket fan-out here (r19, measured): this kernel is one xxhash
    // per shingle, and cheap-downstream callers (q_minhash_sig,
    // q_hot_shingles) regressed under the parallelism floor's shuffle;
    // heavy-downstream callers (the jaccard pair expansion) fan out at
    // their own call sites instead.
    df.select(col(idCol),
        call_function(graft.plans.GraftFunctions.ShingleName,
          col(textCol), lit(k)).as("sh_set"))
      .filter(size(col("sh_set")) > 0)
      .withColumn("n_sh", size(col("sh_set")).cast("long"))
  }

  /** Train/eval contamination sweep (benchmark decontamination): for each
    * eval document, the fraction of its distinct k-token shingles that
    * appear ANYWHERE in the training corpus. The canonical pre-release
    * check that a training set does not leak the eval set.
    *
    * Shape: one distinct-shingle pass per side (the codegen'd kernel
    * emits per-document distinct sets, so "distinct corpus shingles" is
    * one groupBy, not a text re-scan), one equality join on the shingle,
    * one per-eval-doc count. Work is linear in corpus shingles and the
    * join is hash-partitioned on the shingle key — at real scale the eval
    * side is tiny and broadcasts, and nothing here is all-pairs.
    */
  def contamination(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    graft.plans.GraftFunctions.register(train.sparkSession)
    // NOT fanned out (r19, measured): the shingle kernel here has no
    // per-shingle md5 work, so the parallelism floor's text shuffle cost
    // exceeded the kernel win (+0.24 s at sf0.1); the md5-permutation
    // lanes keep the fan-out.
    val evalSh = eval.select(col(idCol),
        call_function(graft.plans.GraftFunctions.ShingleStringsName,
          col(textCol), lit(k)).as("__sh_set"))
      .filter(size(col("__sh_set")) > 0)
      .select(col(idCol), size(col("__sh_set")).cast("long").as("n_sh"),
        explode(col("__sh_set")).as("shingle"))
    val trainSh = train.select(
        explode(call_function(graft.plans.GraftFunctions.ShingleStringsName,
          col(textCol), lit(k))).as("shingle"))
      .distinct()
      .withColumn("__hit", lit(1))
    evalSh.join(trainSh, Seq("shingle"), "left")
      .groupBy(col(idCol), col("n_sh"))
      .agg(count(col("__hit")).as("n_shared"))
      .select(col(idCol), col("n_sh"), col("n_shared"),
        round(col("n_shared") / col("n_sh"), 6).as("contamination"))
  }

  /** [[contamination]]'s sketch path for a training corpus too large to
    * join: the train side collapses to ONE bloom filter — Catalyst's own
    * `BloomFilterAggregate` over the hashed-shingle kernel, partial
    * sketches merged map-side, so the train shingles are NEVER shuffled,
    * deduplicated, or joined — and the eval side probes it with the
    * codegen'd `might_contain`. The result upper-bounds the exact
    * semi-join fraction (false positives only; rate set by
    * `expectedShingles`): the standard decontamination shape when train
    * is 100 TB and eval is a benchmark suite.
    *
    * The sketch is collected to the driver and baked in as a binary
    * literal — `might_contain` requires a constant/scalar-subquery bloom,
    * and the filter is index metadata exactly like the IVF quantizer
    * (`expectedShingles` defaults to ~1 MB of literal at 3% fpp).
    * Batch-only, like every eager two-phase operator here.
    */
  def contaminationBloom(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int,
      expectedShingles: Long = 1000000L): DataFrame = {
    require(!train.isStreaming && !eval.isStreaming,
      "contaminationBloom collects the train-side sketch eagerly and is " +
        "batch-only; on a stream, build the bloom from the batch corpus " +
        "once and probe it inside foreachBatch")
    graft.plans.GraftFunctions.register(train.sparkSession)
    // not fanned out — same measured rationale as [[contamination]]
    val bloomBytes = train
      .select(explode(call_function(graft.plans.GraftFunctions.ShingleName,
        col(textCol), lit(k))).as("__h"))
      .agg(call_function(graft.plans.GraftFunctions.BloomAggName,
        col("__h"), lit(expectedShingles)).as("__bloom"))
      .collect().head.getAs[Array[Byte]](0)
    val evalSh = eval.select(col(idCol),
        call_function(graft.plans.GraftFunctions.ShingleName,
          col(textCol), lit(k)).as("__hs"))
      .filter(size(col("__hs")) > 0)
      .select(col(idCol), size(col("__hs")).cast("long").as("n_sh"),
        explode(col("__hs")).as("__h"))
    evalSh
      .groupBy(col(idCol), col("n_sh"))
      .agg(sum(when(
        call_function(graft.plans.GraftFunctions.BloomMightContainName,
          lit(bloomBytes), col("__h")), 1L).otherwise(0L)).as("n_might"))
      .select(col(idCol), col("n_sh"), col("n_might"),
        round(col("n_might") / col("n_sh"), 6).as("contamination_ub"))
  }

  /** Diagnostic: shingles whose document frequency exceeds `maxDocFreq`
    * (the ones [[ngramJaccardPairs]] drops), with their frequency —
    * audit the stop-gram guard before trusting a cap on a new corpus.
    */
  def hotShingles(df: DataFrame, idCol: String, textCol: String,
      k: Int, maxDocFreq: Int): DataFrame =
    docShingleSets(df, idCol, textCol, k)
      .select(explode(col("sh_set")).as("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") > maxDocFreq)

  /** Memorization-risk scoring: per document, how much of it is made of
    * spans DUPLICATED ACROSS the corpus — `n_dup` of its `n_sh` distinct
    * k-token shingles appear in at least `minDocs` documents (itself
    * included), `dup_frac` is the coverage ratio and `max_doc_freq` the
    * doc's hottest shingle. Cross-doc repeated spans are the canonical
    * memorization amplifier in LLM training corpora (the motivation for
    * span-level dedup in Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better"); this is the AUDIT that finds the
    * documents carrying them — complementary to [[hotShingles]] (which
    * ranks the spans) and the within-doc repetition score (which never
    * looks across documents).
    *
    * Shape: the per-doc distinct sets come from the codegen'd shingle
    * kernel (one narrow pass, no `.distinct()` shuffle); the doc-frequency
    * is an unordered `count(*) OVER (PARTITION BY sh)` window — NOT a
    * groupBy + join-back, which would run the shingle kernel and the
    * parquet scan TWICE (Spark plans the two sides of a self-join as two
    * scans) and, worse, at 100 TB the auto-broadcast threshold can pick a
    * broadcast join whose build side is the corpus-wide shingle-TYPE
    * table. The window shuffles once on the 8-byte hash and counts each
    * hash partition in place (frame = whole partition; the only sort is
    * WindowExec's within-partition ordering on the 8-byte key — never a
    * global sort); the per-doc rollup is the second and last shuffle.
    * Total: 1 scan, 2 shuffles, 0 joins — work linear in corpus shingles,
    * the same [[TextStats.dedupByFingerprint]] window-attach idiom.
    *
    * Trade, stated honestly: WindowExec buffers each shingle GROUP in one
    * task, so a corpus-wide stop-gram (boilerplate header in most of N
    * docs — exactly what this audit exists to surface) spills its ~N rows
    * through ExternalAppendOnlyUnsafeRowArray in a single task rather
    * than streaming through a hash join. The join form bounds task state
    * but pays the double scan + broadcast hazard above; unlike
    * [[ngramJaccardPairs]] a `maxDocFreq` cap is NOT applicable here,
    * because the hot span is the signal (`max_doc_freq` is an output).
    * Spill, not OOM, is the failure mode, and the audit is an offline
    * sweep — the window side of the trade is the right default.
    * Counting on 64-bit hashes ≡ counting on strings modulo ~1e-19
    * collisions (the oracle replays strings, like q_ngram_jaccard).
    */
  def duplicateSpanCoverage(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 1, "duplicateSpanCoverage: minDocs must be >= 1")
    import org.apache.spark.sql.expressions.Window
    hashedShingles(df, idCol, textCol, k)
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("__df") >= minDocs, 1L).otherwise(0L)).as("n_dup"),
        max(col("__df")).as("max_doc_freq"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_sh"), 6))
  }

  /** Exact duplicate-span REMOVAL (X91): rewrite each document with every
    * cross-document duplicated span cut out — the repair step behind the
    * [[duplicateSpanCoverage]] audit (Lee et al. 2022 remove the exact
    * substrings themselves rather than whole documents, because a
    * boilerplate header shared by a million pages should not cost the
    * million distinct bodies attached to it).
    *
    * Semantics: a token position is covered iff any k-token shingle
    * window containing it occurs in ≥ `minDocs` distinct documents
    * (cross-doc occurrences only — within-doc repetition is X15's
    * score). Covered tokens are dropped; survivors re-join with single
    * spaces. Output per doc: `n_tokens`, `n_removed`, `n_spans` (maximal
    * removed runs), `text_clean`.
    *
    * Shape, all corpus-linear: one explode to (doc, start, shingleHash);
    * doc-frequency via distinct (doc, hash) → one groupBy on the 8-byte
    * hash (map-side partial combine; output is shingle-TYPE-sized);
    * one hash-keyed join flags duplicated starts; flagged starts expand
    * ×k into covered positions and collapse to ONE per-doc sorted array
    * (doc-bounded state — documents are KB-scale); one id-keyed join
    * back to the token arrays, after which counting, span-run detection,
    * and text reconstruction are narrow codegen'd array ops (per-doc
    * cost O(tokens × covered), both doc-bounded). Nothing pairwise,
    * nothing corpus-sized in one task. Hash-vs-string counting caveat as
    * in [[duplicateSpanCoverage]]; the oracle replays strings.
    */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minDocs: Int = 2): DataFrame = {
    require(k >= 1, "removeDuplicateSpans: k must be >= 1")
    require(minDocs >= 2,
      "removeDuplicateSpans: minDocs must be >= 2 (cross-doc duplication)")
    val toks = spanToks(df, idCol, textCol)
    val starts = spanStarts(toks, idCol, k)
    val dup = starts.select(col(idCol), col("__sh")).distinct()
      .groupBy(col("__sh")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col("__sh"))
    cutSpans(toks, starts.join(dup, "__sh"), idCol, k)
  }

  /** The persisted shingle doc-frequency index of a corpus — X91's
    * corpus-side state as a public write-side frame (`sh`, `df`), the
    * [[minhashBandIndex]] pattern for spans: build once per corpus
    * snapshot and store it; batch ingests consult it through
    * [[removeDuplicateSpansIncremental]] instead of re-counting the
    * corpus. Output is shingle-TYPE-sized.
    */
  def spanDfIndex(corpus: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame =
    spanStarts(spanToks(corpus, idCol, textCol), idCol, k)
      .select(col(idCol), col("__sh")).distinct()
      .groupBy(col("__sh")).agg(count(lit(1)).as("df"))
      .select(col("__sh").as("sh"), col("df"))

  /** Incremental duplicate-span removal — the corpus-INGESTION shape of
    * [[removeDuplicateSpans]] (the [[incrementalMinhashCandidates]]
    * pattern): a NEW batch's spans are cut when their combined
    * distinct-doc frequency across batch + corpus reaches `minDocs`,
    * with the corpus contributing only its pre-built [[spanDfIndex]] —
    * corpus text is never re-scanned and old documents are never
    * rewritten (their spans were cut at their OWN ingestion). With
    * disjoint ids, the output equals the full [[removeDuplicateSpans]]
    * over corpus ∪ batch restricted to batch documents (spec-pinned).
    * Join cost is proportional to the BATCH's shingles; the index side
    * is one scan of a shingle-TYPE-sized frame.
    */
  def removeDuplicateSpansIncremental(batch: DataFrame, index: DataFrame,
      idCol: String, textCol: String, k: Int = 8,
      minDocs: Int = 2): DataFrame = {
    require(k >= 1, "removeDuplicateSpansIncremental: k must be >= 1")
    require(minDocs >= 2,
      "removeDuplicateSpansIncremental: minDocs must be >= 2")
    val toks = spanToks(batch, idCol, textCol)
    val starts = spanStarts(toks, idCol, k)
    val bdf = starts.select(col(idCol), col("__sh")).distinct()
      .groupBy(col("__sh")).agg(count(lit(1)).as("__bdf"))
    val dup = bdf
      .join(index.select(col("sh").as("__sh"), col("df").as("__cdf")),
        Seq("__sh"), "left")
      .filter(col("__bdf") + coalesce(col("__cdf"), lit(0L)) >= minDocs)
      .select(col("__sh"))
    cutSpans(toks, starts.join(dup, "__sh"), idCol, k)
  }

  /** Winnowing fingerprints (X95, Schleimer et al. 2003 — the MOSS
    * algorithm): per document, the k-shingle hash sequence is scanned
    * with a sliding window of `w` consecutive hashes and each window's
    * MINIMUM is selected — the selected (distinct) hashes are the
    * document's fingerprints, ~2/(w+1) of its shingles in expectation.
    * The winnowing guarantee: any two documents sharing a run of
    * ≥ w+k−1 consecutive tokens share at least one fingerprint — so the
    * fingerprint set is a dup DETECTOR like the full shingle set at a
    * fraction of its index size, the standard lighter-weight alternative
    * to MinHash when position-anchored matches (plagiarism spans, exact
    * crawl overlap) are the target.
    *
    * Shape: ONE narrow projection builds the ordered hash array and its
    * window minima per document (codegen'd array ops; O(tokens × w) per
    * doc — the O(n) deque scan is not expressible as a narrow array op,
    * and w is a small constant), one explode of the ~n/w selected
    * hashes, one distinct. Hashes are the PORTABLE md5-hex-prefix form
    * ([[minhashSignaturesPortable]]'s convention): fixed-width lowercase
    * hex minima order lexicographically ≡ numerically in any engine, so
    * the SELECTION (not just equality) replays in the oracle.
    *
    * Documents with fewer than `w` windows winnow their whole (short)
    * hash sequence as one window; docs shorter than `k` tokens yield no
    * fingerprints.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1, "winnowFingerprints: k must be >= 1")
    require(w >= 1, "winnowFingerprints: w must be >= 1")
    Scale.fanOut(df).select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), expr(
        s"""IF(size(__toks) >= $k,
           |   transform(sequence(1, size(__toks) - ${k - 1}),
           |     p -> substring(md5(concat(
           |       array_join(slice(__toks, p, $k), ' '),
           |       '|wn')), 1, 15)),
           |   CAST(array() AS ARRAY<STRING>))""".stripMargin).as("__h"))
      .select(col(idCol), explode(expr(
        s"""IF(size(__h) = 0, CAST(array() AS ARRAY<STRING>),
           |  array_distinct(transform(
           |    sequence(1, greatest(size(__h) - ${w - 1}, 1)),
           |    j -> array_min(slice(__h, j, $w)))))""".stripMargin))
        .as("fp"))
  }

  /** Candidate pairs from shared winnowing fingerprints: one
    * fingerprint-keyed self-join (d1 < d2) counting shared fingerprints
    * per pair — Σ|bucket|² like every generator here, with the same
    * value-checked `maxBucket` hot-bucket cap (a corpus-wide boilerplate
    * fingerprint would otherwise expand |bucket|²/2 pairs in one task)
    * and the [[bandedPairs]] `shuffle_hash` hint so the fingerprint
    * pipeline is computed ONCE behind a reused exchange, not once per
    * join side. Index size is the winnowed ~2/(w+1) fraction —
    * the reason to winnow instead of bucketing full shingle sets.
    */
  def winnowCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, maxBucket: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fps = winnowFingerprints(df, idCol, textCol, k, w)
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .filter(col("__bn") <= maxBucket)
      .select(col(idCol), col("fp"))
      .hint("shuffle_hash")
    fps.as("a")
      .join(fps.as("b"),
        col("a.fp") === col("b.fp")
          && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .agg(count(lit(1)).as("n_shared"))
  }

  private def spanToks(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    Scale.fanOut(df).select(col(idCol), split(col(textCol), " ").as("__toks"))

  /** (doc, 1-based start, shingle hash); docs shorter than k yield none. */
  private def spanStarts(toks: DataFrame, idCol: String,
      k: Int): DataFrame =
    toks
      .select(col(idCol), posexplode(expr(
        s"""IF(size(__toks) >= $k,
           |   transform(sequence(1, size(__toks) - ${k - 1}),
           |     p -> xxhash64(array_join(slice(__toks, p, $k), ' '))),
           |   CAST(array() AS ARRAY<BIGINT>))""".stripMargin)))
      .select(col(idCol), (col("pos") + 1).as("__p"), col("col").as("__sh"))

  /** Shared removal tail: expand flagged starts ×k into per-doc sorted
    * covered-position arrays (doc-bounded state), join back, and rebuild
    * counts + text in narrow codegen'd array ops.
    */
  private def cutSpans(toks: DataFrame, flagged: DataFrame, idCol: String,
      k: Int): DataFrame = {
    val covered = flagged
      .select(col(idCol),
        explode(expr(s"sequence(__p, __p + ${k - 1})")).as("__cp"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("__cp"))).as("__cov"))
    toks.join(covered, Seq(idCol), "left")
      .withColumn("__cov",
        coalesce(col("__cov"), expr("CAST(array() AS ARRAY<INT>)")))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(col("__cov")).cast("long").as("n_removed"),
        // a covered position opens a new span iff position-1 is uncovered
        expr("size(filter(__cov, p -> NOT array_contains(__cov, p - 1)))")
          .cast("long").as("n_spans"),
        expr("""array_join(
               |  filter(transform(__toks,
               |    (t, i) -> IF(array_contains(__cov, i + 1), NULL, t)),
               |  t -> t IS NOT NULL), ' ')""".stripMargin).as("text_clean"))
  }

  /** MinHash signature: `nPerms` permutation minima over the document's
    * k-shingle set, all in ONE grouped aggregation pass (each "permutation"
    * is the same 64-bit hash salted with the permutation index). Output:
    * id + sig_0..sig_{n−1} columns.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int, nPerms: Int): DataFrame = {
    val sh = hashedShingles(df, idCol, textCol, k)
    val aggs: Seq[Column] = (0 until nPerms)
      .map(p => min(xxhash64(col("sh"), lit(p))).as(s"sig_$p"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over MinHash signatures: hash `rowsPerBand` consecutive
    * signature components per band; docs sharing any (band, bandHash)
    * bucket are near-dup candidates. Returns candidate pairs (d1 < d2)
    * with the number of colliding bands.
    */
  def minhashCandidates(signatures: DataFrame, idCol: String,
      nPerms: Int, rowsPerBand: Int, maxBucket: Int = 1000): DataFrame =
    bandedPairs(signatures, idCol, nPerms, rowsPerBand,
      comps => hash(comps: _*), maxBucket)

  /** Shared LSH banding tail: explode each signature into its band keys,
    * bucket-equality self-join (d1 < d2), count colliding bands per pair.
    * `bandKey` maps a band's signature components to the join key — an
    * engine hash for the fast path, the raw component tuple for the
    * oracle-portable path.
    *
    * The self-join is hinted `shuffle_hash`: a broadcast self-join would
    * compute the whole signature pipeline (scan → shingle → hash → agg)
    * TWICE, once per side, because the broadcast side has no exchange for
    * `ReuseExchange` to unify. Forcing a shuffled join gives both sides an
    * identical hash-partitioned exchange on (band, band_key), which the
    * planner dedupes into one — one document scan, one signature
    * computation, at any scale. (Persisting the signature frame would do
    * the same at small SF but turns into cluster-wide cache pressure at
    * 100 TB; a reused shuffle is exactly one exchange on local disk.)
    *
    * `maxBucket` is the banding twin of [[ngramJaccardPairs]]'s stop-gram
    * guard: a band bucket of m docs yields m²/2 candidate pairs in one
    * task, so a degenerate corpus (millions of identical documents) OOMs
    * the join without a cap. Buckets above the cap are dropped — standard
    * LSH practice; members of such a bucket are near-exact duplicates
    * that the cheaper exact/fingerprint dedup already collapses. The
    * bucket count is a window over the SAME (band, band_key) partitioning
    * the join shuffles on, so the guard adds no exchange.
    */
  private def bandedPairs(signatures: DataFrame, idCol: String,
      nPerms: Int, rowsPerBand: Int,
      bandKey: Seq[Column] => Column, maxBucket: Int = 1000): DataFrame = {
    val banded = bandRows(signatures, idCol, nPerms, rowsPerBand,
      bandKey, maxBucket)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band")
          && col("a.band_key") === col("b.band_key")
          && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** One (band, band_key) struct per band over `sig_*` columns — the
    * band-key construction shared by every banding consumer.
    */
  private def bandStructs(nPerms: Int, rowsPerBand: Int,
      bandKey: Seq[Column] => Column): Seq[Column] =
    (0 until nPerms / rowsPerBand).map { b =>
      val comps = (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), bandKey(comps).as("band_key"))
    }

  /** The banding front half of [[bandedPairs]]: one (id, band, band_key)
    * row per band, hot buckets capped, `shuffle_hash`-hinted for the
    * exchange-reuse join posture. Shared with
    * [[incrementalMinhashCandidates]].
    */
  private def bandRows(signatures: DataFrame, idCol: String,
      nPerms: Int, rowsPerBand: Int,
      bandKey: Seq[Column] => Column, maxBucket: Int): DataFrame = {
    val bandCols = bandStructs(nPerms, rowsPerBand, bandKey)
    signatures
      .select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.band_key").as("band_key"))
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("band_key"))))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")
      .hint("shuffle_hash")
  }

  /** Incremental LSH candidates — the corpus-INGESTION shape: near-dup
    * candidate pairs of a NEW batch against itself (`against = 'batch'`,
    * `d1 < d2`) and against the EXISTING corpus (`against = 'corpus'`,
    * `d1` = batch id, `d2` = corpus id), with old–old pairs never
    * enumerated anywhere: that work was already done when those documents
    * were ingested. At 100 TB this is the daily-crawl loop — join cost is
    * proportional to the BATCH's collisions, not the corpus's; the corpus
    * side contributes one signature scan (in production, a persisted band
    * index instead — these band rows ARE its write-side schema).
    *
    * Both joins key on (band, band_key): the batch-batch self-join reuses
    * one exchange like [[bandedPairs]]; the batch-corpus join hash-
    * partitions each side once. The hot-bucket cap applies PER SIDE — a
    * batch doc colliding into a degenerate historical bucket is exactly
    * the |old|×|new|-pairs-in-one-task OOM the cap exists for. Ids must
    * be disjoint across the two inputs (callers own id allocation).
    */
  def incrementalMinhashCandidates(batch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, k: Int, nPerms: Int,
      rowsPerBand: Int, maxBucket: Int = 1000): DataFrame = {
    def bands(df: DataFrame) = bandRows(
      minhashSignaturesPortable(df, idCol, textCol, k, nPerms),
      idCol, nPerms, rowsPerBand, comps => concat_ws("|", comps: _*),
      maxBucket)
    val nb = bands(batch)
    val ob = bands(corpus)
    val batchBatch = nb.as("a")
      .join(nb.as("b"),
        col("a.band") === col("b.band")
          && col("a.band_key") === col("b.band_key")
          && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .agg(count(lit(1)).as("n_bands"))
      .withColumn("against", lit("batch"))
    val batchCorpus = nb.as("a")
      .join(ob.as("b"),
        col("a.band") === col("b.band")
          && col("a.band_key") === col("b.band_key")
          // ids must be disjoint across batch and corpus (callers own id
          // allocation); this inequality costs nothing on the hash join
          // and keeps an accidental overlap from reporting a document as
          // its own corpus near-dup
          && col(s"a.$idCol") =!= col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .agg(count(lit(1)).as("n_bands"))
      .withColumn("against", lit("corpus"))
    batchBatch.union(batchCorpus)
  }

  /** The persisted band index of a corpus — [[incrementalMinhashCandidates]]'
    * corpus-side band rows as a public write-side frame (id, band,
    * band_key), hot buckets capped. Build once per corpus snapshot and
    * store it; batch ingests join it, and [[streamingCorpusCollisions]]
    * probes it from a stream.
    */
  def minhashBandIndex(corpus: DataFrame, idCol: String, textCol: String,
      k: Int, nPerms: Int, rowsPerBand: Int,
      maxBucket: Int = 1000): DataFrame =
    bandRows(minhashSignaturesPortable(corpus, idCol, textCol, k, nPerms),
      idCol, nPerms, rowsPerBand, comps => concat_ws("|", comps: _*),
      maxBucket)

  /** Per-ROW portable MinHash signatures (`keepCols` + `sig_0..sig_{n-1}`)
    * — the streaming-safe twin of [[minhashSignaturesPortable]]: each
    * permutation minimum is taken over the document's own distinct
    * shingle array (the [[graft.plans.ShingleStrings]] kernel) in narrow
    * stateless projections, so it runs in a streaming micro-batch with no
    * aggregation, no watermark and no state. Values are identical to the
    * grouped form by construction (same distinct shingle set, same salted
    * md5, same minimum — parity pinned in `DedupSpec`); a document too
    * short to have a k-shingle gets null signatures (the grouped form
    * drops it). The grouped form stays preferred for BATCH corpora: its
    * exploded hashes feed the shuffle directly instead of materializing
    * per-row hash arrays.
    */
  def withMinhashSigs(df: DataFrame, keepCols: Seq[String], textCol: Column,
      k: Int, nPerms: Int): DataFrame = {
    require(nPerms % 2 == 0, "nPerms must be even (two 60-bit hashes per md5)")
    val keep = keepCols.map(col)
    graft.plans.GraftFunctions.register(df.sparkSession)
    // Three staged projections so single-md5-per-shingle holds
    // STRUCTURALLY, with no reliance on codegen common-subexpression
    // elimination (interpreted fallback used to pay the md5 twice):
    //   1. shingle kernel once into __sh;
    //   2. per permutation pair j, ONE md5 pass — both minima fold in one
    //      aggregate() whose lambda reads the bound hash variable twice
    //      (a variable read, never a re-evaluation);
    //   3. unpack the (m1, m2) structs into sig_{2j}, sig_{2j+1}.
    // CollapseProject keeps the stages apart: it only inlines expressions
    // that are cheap or referenced once, and __sh / __p_j are neither.
    val sentinel = lit("g") // sorts after every 15-char lowercase-hex string
    val withSh = Scale.fanOut(df).select(keep :+ call_function(
      graft.plans.GraftFunctions.ShingleStringsName, textCol, lit(k))
      .as("__sh"): _*)
    val staged = withSh.select(keep ++ (0 until nPerms / 2).map { j =>
      when(size(col("__sh")) > 0,
        aggregate(
          transform(col("__sh"), s => md5(concat(s, lit(s"|$j")))),
          struct(sentinel.as("m1"), sentinel.as("m2")),
          (acc, h) => struct(
            least(acc.getField("m1"), substring(h, 1, 15)).as("m1"),
            least(acc.getField("m2"), substring(h, 17, 15)).as("m2"))))
        .as(s"__p_$j")
    }: _*)
    staged.select(keep ++ (0 until nPerms / 2).flatMap { j =>
      Seq(col(s"__p_$j").getField("m1").as(s"sig_${2 * j}"),
        col(s"__p_$j").getField("m2").as(s"sig_${2 * j + 1}"))
    }: _*)
  }

  /** Flag STREAM documents that near-duplicate an existing corpus: the
    * stream side computes its banded signature as a stateless narrow
    * projection ([[withMinhashSigs]] — no aggregation, no watermark)
    * and equi-joins the corpus's [[minhashBandIndex]]. Stream-static
    * inner joins keep no state in Structured Streaming — each micro-batch
    * probes the static side and moves on — and the index's hot-bucket cap
    * bounds the fan-out of any one stream row. Emits one row per
    * (stream doc, corpus doc, band) collision; distinct/threshold
    * decisions stay with the caller.
    */
  def streamingCorpusCollisions(stream: DataFrame, bandIndex: DataFrame,
      idCol: String, textCol: String, k: Int, nPerms: Int,
      rowsPerBand: Int): DataFrame = {
    val streamBands = withMinhashSigs(stream, Seq(idCol), col(textCol),
        k, nPerms)
      .filter(col("sig_0").isNotNull) // shingle-less docs match nothing
      .select(col(idCol), explode(array(bandStructs(nPerms, rowsPerBand,
        comps => concat_ws("|", comps: _*)): _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"),
        col("bb.band_key").as("band_key"))
    streamBands.join(
        bandIndex.select(col(idCol).as("corpus_id"), col("band"),
          col("band_key")),
        Seq("band", "band_key"))
      .select(col(idCol), col("corpus_id"), col("band"))
  }

  /** Fully oracle-able MinHash LSH: signatures from the portable md5 hash
    * over STRING shingles salted with the permutation index, banded by the
    * RAW component tuple (joined as a string key) instead of an
    * engine-specific band hash — every step replays identically in DuckDB
    * SQL, giving the banding stage a real correctness oracle. Same shape
    * as [[minhashSignatures]]→[[minhashCandidates]]: one shingle pass, one
    * grouped agg for all permutation minima, band-equality join, pair
    * count. Hashing the band key is only a key-width optimization; tuple
    * equality ≡ band-hash equality semantics (minus hash collisions).
    */
  def minhashCandidatesPortable(df: DataFrame, idCol: String, textCol: String,
      k: Int, nPerms: Int, rowsPerBand: Int, maxBucket: Int = 1000): DataFrame =
    bandedPairs(minhashSignaturesPortable(df, idCol, textCol, k, nPerms),
      idCol, nPerms, rowsPerBand,
      comps => concat_ws("|", comps: _*), maxBucket)

  /** The engine-portable MinHash signature frame (`sig_0..sig_{n-1}` as
    * fixed-width hex strings): one shingle pass, one grouped agg for all
    * permutation minima. Each md5 yields TWO independent 60-bit
    * permutation hashes (hex chars 1-15 and 17-31), halving the md5
    * count; the shared md5 subexpression is computed once by codegen
    * CSE.
    *
    * The permutation minima AGGREGATE over the hashes parsed to 60-bit
    * LONGS, re-formatted to the same fixed-width lowercase hex AFTER the
    * aggregation (numeric min ≡ lexicographic min of fixed-width hex, so
    * output values are byte-identical to the all-string form and to the
    * DuckDB oracle). The string form forced SortAggregate — min(string)
    * has an immutable agg buffer, so the plan paid a per-partition sort
    * plus a post-shuffle sort of every (id, nPerms-hash) row; with long
    * buffers both aggregation halves run as codegen'd HashAggregate and
    * the two Sort nodes disappear (guide §1.2/§4: make the stage shape
    * right before tuning inside it). Shared by
    * [[minhashCandidatesPortable]] and [[minhashJaccardEstimate]].
    */
  def minhashSignaturesPortable(df: DataFrame, idCol: String,
      textCol: String, k: Int, nPerms: Int): DataFrame = {
    require(nPerms % 2 == 0, "nPerms must be even (two 60-bit hashes per md5)")
    val sh = shingles(df, idCol, textCol, k)
    val withH = sh.select(col(idCol) +: (0 until nPerms / 2).flatMap { j =>
      val m = md5(concat(col("shingle"), lit(s"|$j")))
      Seq(conv(substring(m, 1, 15), 16, 10).cast("long").as(s"__h_${2 * j}"),
        conv(substring(m, 17, 15), 16, 10).cast("long").as(s"__h_${2 * j + 1}"))
    }: _*)
    val aggs: Seq[Column] = (0 until nPerms)
      .map(p => min(col(s"__h_$p")).as(s"__m_$p"))
    withH.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol) +: (0 until nPerms).map(p =>
        lower(lpad(hex(col(s"__m_$p")), 15, "0")).as(s"sig_$p")): _*)
  }

  /** LSH parameter audit — for every exact near-dup candidate pair, the
    * MinHash ESTIMATE of jaccard (fraction of agreeing permutation
    * minima, the quantity banding thresholds act on) next to the TRUE
    * n-gram jaccard. This is how you validate that `nPerms` is large
    * enough and pick `rowsPerBand` before trusting the sketch on a new
    * corpus: plot est vs truth, check the spread.
    *
    * Shape: the exact pair list (small — true near-dups only) joins the
    * signature frame twice on the document id. The signature side is
    * hinted `shuffle_hash` for the same reason as [[bandedPairs]]: a
    * broadcast of the tiny pair side leaves the expensive md5-signature
    * pipeline without an exchange on either join, so it would be computed
    * TWICE (once per sig side); hinted, both sig sides shuffle on the
    * same id partitioning and the planner reuses one exchange — one
    * shingle pass, one signature aggregation, at any scale.
    */
  def minhashJaccardEstimate(df: DataFrame, idCol: String, textCol: String,
      k: Int, nPerms: Int): DataFrame = {
    val sigs = minhashSignaturesPortable(df, idCol, textCol, k, nPerms)
      .hint("shuffle_hash")
    val pairs = ngramJaccardPairs(df, idCol, textCol, k)
      .select(col("d1"), col("d2"), col("jaccard"))
    val matches = (0 until nPerms)
      .map(p => when(col(s"a.sig_$p") === col(s"b.sig_$p"), 1L).otherwise(0L))
      .reduce(_ + _)
    pairs
      .join(sigs.as("a"), col("d1") === col(s"a.$idCol"))
      .join(sigs.as("b"), col("d2") === col(s"b.$idCol"))
      .select(col("d1"), col("d2"), col("jaccard"),
        matches.as("n_match"),
        round(matches.cast("double") / nPerms, 6).as("jaccard_est"))
  }

  /** 64-bit SimHash over the token multiset: per-token 64-bit hash,
    * bit-wise ±1 vote, sign → bit — all inside the codegen'd
    * [[graft.plans.SimHash64]] kernel, one narrow projection per document.
    * Replaces an explode-over-tokens + 64-conditional-sum aggregation
    * (which shuffled every token) with zero shuffles; bit-identical output.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    // null-text docs are dropped, matching the aggregation formulation
    // this replaces (explode of a null token array emitted no rows)
    Scale.fanOut(df.filter(col(textCol).isNotNull))
      .select(col(idCol),
        call_function(graft.plans.GraftFunctions.SimHashName, col(textCol))
          .as("simhash"))
  }

  /** Engine-portable 60-bit token hash ([[PortableHash.hash60]]) —
    * computable identically in the DuckDB oracle, unlike `xxhash64`,
    * which no other engine reproduces. Used by the oracle-checked
    * signature queries; the xxhash64 kernels remain the fast path.
    */
  private def portableHash(c: Column): Column = PortableHash.hash60(c)

  /** SimHash over the portable md5 token hash — same vote semantics as
    * [[simhash]] (multiset, ±1, sign) expressed as the 64-conditional-sum
    * aggregation, so a DuckDB oracle can replay it bit-for-bit. Bits
    * 60–63 carry no entropy (60-bit hash) and resolve to 0 votes → 0 bits,
    * identically in both engines.
    */
  def simhashPortable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("__w"))
      .withColumn("__h", portableHash(col("__w")))
    val bitAggs: Seq[Column] = (0 until 64).map { b =>
      sum(when(expr(s"(__h >> $b) & 1") === 1, 1).otherwise(-1)).as(s"__b$b")
    }
    val votes = toks.groupBy(col(idCol)).agg(bitAggs.head, bitAggs.tail: _*)
    val sig = (0 until 64)
      .map(b => when(col(s"__b$b") > 0, expr(s"CAST(1 AS BIGINT) << $b"))
        .otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    votes.select(col(idCol), sig.as("simhash"))
  }

  /** SimHash near-dup candidates: band the 64-bit signature into four
    * 16-bit chunks; Hamming distance ≤ 3 guarantees ≥1 identical chunk
    * (pigeonhole), so chunk-equality buckets are a complete candidate set
    * for distance ≤ 3 — verified exactly with bit_count(xor).
    *
    * Hinted `shuffle_hash` for the same reason as [[bandedPairs]]: the
    * identical exchanges on (chunk, v) are deduped by the planner, so the
    * signature pipeline upstream runs once instead of once per join side.
    * `maxBucket` is the same hot-bucket OOM guard as [[bandedPairs]],
    * riding the join's own (chunk, v) partitioning.
    */
  def simhashCandidates(sigs: DataFrame, idCol: String, maxDist: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val chunks = (0 until 4).map(c =>
      struct(lit(c).as("chunk"), expr(s"(simhash >> ${c * 16}) & 65535").as("v")))
    val banded = sigs
      .select(col(idCol), col("simhash"), explode(array(chunks: _*)).as("cc"))
      .select(col(idCol), col("simhash"), col("cc.chunk").as("chunk"), col("cc.v").as("v"))
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("chunk"), col("v"))))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")
      .hint("shuffle_hash")
    banded.as("a")
      .join(banded.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.v") === col("b.v")
          && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Smallest `maxDist` meeting a recall target on TRUE near-duplicates
    * — the operational knob [[simhashJaccardAudit]] exists to inform,
    * closed into a recommendation the way `Similarity.tuneNProbe` does
    * for IVF probes (inheriting `maxDist = 3` is what made the 10×
    * posture superlinear: threshold-edge hamming-3 collisions on short
    * docs, not duplicates). A "true" pair is an exact-audit pair with
    * n-gram jaccard ≥ `jaccardThreshold`; recall(d) is the fraction the
    * banding would catch at `maxDist = d`. The search space is 0..3 —
    * the 4×16-bit banding's completeness bound (pigeonhole: only
    * hamming ≤ 3 guarantees a shared chunk) — so if even 3 misses the
    * target, the answer is 3 with its sub-target recall reported:
    * SimHash banding cannot reach it and the jaccard-side generators
    * (minhash LSH) are the right tool for that corpus.
    *
    * Returns (maxDist, recall at it, candidate pairs at it — the
    * verification mass the knob trades against recall). Cost: one exact
    * audit + one banding pass, both bucket-bounded; at 100 TB this is a
    * deploy-time calibration over a corpus SAMPLE, amortized like any
    * index calibration.
    */
  def tuneMaxDist(df: DataFrame, idCol: String, textCol: String, k: Int,
      jaccardThreshold: Double = 0.8, targetRecall: Double = 0.95,
      maxBucket: Int = 1000): (Int, Double, Long) = {
    require(targetRecall > 0 && targetRecall <= 1,
      s"tuneMaxDist: targetRecall $targetRecall not in (0, 1]")
    val curve = maxDistCurve(df, idCol, textCol, k, jaccardThreshold,
      maxBucket)
    curve.find(_._2 >= targetRecall).getOrElse(curve.last)
  }

  /** The whole recall/cost curve behind [[tuneMaxDist]]: for each
    * `maxDist` 0..3, (d, recall of true pairs, candidate pairs to
    * verify). One exact audit + one banding pass, both histogrammed by
    * hamming so every d is answered from driver-side cumulative sums
    * (≤ 65 rows collected). Reading the curve is how a corpus owner
    * sees WHICH tool they need: if recall at d = 3 (the banding
    * completeness bound) is still short of target, no SimHash knob
    * reaches it and the jaccard-side generators (minhash LSH,
    * winnowing) are the right family — the tuner can only report that
    * honestly, not fix it.
    */
  /** The [[chooseNearDupGenerator]] verdict: which candidate generator
    * the policy picked, the tuned simhash radius when banding sufficed,
    * the measured recall at the banding completeness bound (the number
    * that made the call), and the chosen generator's candidate frame.
    */
  final case class NearDupPlan(generator: String, tunedMaxDist: Option[Int],
      bandingRecallBound: Double, candidates: DataFrame)

  /** X105 — the r14 tuner verdict as EXECUTABLE POLICY instead of an
    * artifact footnote. Decision rule: calibrate the simhash-banding
    * recall curve on the corpus (one [[maxDistCurve]] pass — at 100 TB,
    * on a sample, like any index calibration); if recall at the banding
    * completeness bound (hamming ≤ 3) meets `targetRecall`, simhash
    * banding at the TUNED radius is the generator (constant 4-chunk
    * index — the cheaper shape when it suffices); otherwise NO simhash
    * knob reaches the target on this corpus (r14's honest negative:
    * 0.751 at the bound on the documents table) and the jaccard-side
    * minhash LSH is chosen — measured exactly-linear pair growth at 10×
    * (`POSTURE_10X.json` `minhash_banding`) with recall set by its
    * (nPerms, rowsPerBand) S-curve rather than a hamming radius.
    * Both candidate frames share the (d1, d2, n) pair shape, so the
    * downstream resolution stages ([[greedySurvivors]], components,
    * cluster-exact) compose with either.
    */
  def chooseNearDupGenerator(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, jaccardThreshold: Double = 0.8,
      targetRecall: Double = 0.95, maxBucket: Int = 1000,
      nPerms: Int = 32, rowsPerBand: Int = 4): NearDupPlan = {
    require(targetRecall > 0 && targetRecall <= 1,
      s"chooseNearDupGenerator: targetRecall $targetRecall not in (0, 1]")
    val curve = maxDistCurve(df, idCol, textCol, k, jaccardThreshold,
      maxBucket)
    val bound = curve.last._2 // recall at the d=3 completeness bound
    curve.find(_._2 >= targetRecall) match {
      case Some((d, _, _)) =>
        NearDupPlan("simhash", Some(d), bound,
          simhashCandidates(simhashPortable(df, idCol, textCol), idCol,
            maxDist = d, maxBucket = maxBucket))
      case None =>
        NearDupPlan("minhash", None, bound,
          minhashCandidatesPortable(df, idCol, textCol, k, nPerms,
            rowsPerBand, maxBucket))
    }
  }

  def maxDistCurve(df: DataFrame, idCol: String, textCol: String, k: Int,
      jaccardThreshold: Double = 0.8,
      maxBucket: Int = 1000): Seq[(Int, Double, Long)] = {
    val trueHist = simhashJaccardAudit(df, idCol, textCol, k)
      .filter(col("jaccard") >= jaccardThreshold)
      .groupBy(col("hamming")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val candHist = simhashCandidates(
        simhashPortable(df, idCol, textCol), idCol,
        maxDist = 3, maxBucket = maxBucket)
      .groupBy(col("hamming")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val totalTrue = trueHist.values.sum
    def recallAt(d: Int): Double =
      if (totalTrue == 0) 1.0 // vacuous: nothing to recall
      else (0 to d).map(h => trueHist.getOrElse(h, 0L)).sum.toDouble / totalTrue
    def candAt(d: Int): Long = (0 to d).map(h => candHist.getOrElse(h, 0L)).sum
    (0 to 3).map(d => (d, recallAt(d), candAt(d)))
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"), // near-dup of 1
    (3L, "completely different words about spark query engines here"),
    (4L, "the quick brown fox jumps over the lazy dog today")    // exact dup of 1
  ).toDF("doc_id", "text")

  test("contamination: leaked eval doc scores 1.0, clean doc scores 0.0") {
    val train = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "completely different words about spark query engines here")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // verbatim leak
      (2L, "unrelated evaluation prompt with its own private tokens entirely"),
      (3L, "the quick brown fox jumps over the lazy dog tonight") // partial overlap
    ).toDF("doc_id", "text")
    val r = Dedup.contamination(train, eval, "doc_id", "text", k = 5)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Double]("contamination") === 1.0)
    assert(r(1).getAs[Double]("contamination") === 0.0)
    val partial = r(2).getAs[Double]("contamination")
    assert(partial > 0.0 && partial < 1.0, partial)
    // shares everything except the shingles crossing the changed last token
    assert(r(2).getAs[Long]("n_shared") === r(2).getAs[Long]("n_sh") - 1)
  }

  test("contaminationBloom refuses streaming frames at the API") {
    val stream = spark.readStream.format("rate").load()
      .selectExpr("value AS doc_id", "CAST(value AS STRING) AS text")
    val batch = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.contaminationBloom(stream, batch, "doc_id", "text", k = 2)
    }
    assert(e.getMessage.contains("batch-only"))
  }

  test("contaminationBloom upper-bounds the exact sweep and nails the leaked doc") {
    val train = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "completely different words about spark query engines here")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "unrelated evaluation prompt with its own private tokens entirely")
    ).toDF("doc_id", "text")
    val exact = Dedup.contamination(train, eval, "doc_id", "text", k = 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    val bloom = Dedup.contaminationBloom(train, eval, "doc_id", "text", k = 5)
      .orderBy("doc_id").collect()
    // verbatim leak: every shingle might-contains -> exactly 1.0
    assert(bloom(0).getAs[Double]("contamination_ub") === 1.0)
    // the sketch can only over-count (false positives), never miss
    bloom.foreach { r =>
      assert(r.getAs[Long]("n_might") >= exact(r.getAs[Long]("doc_id")))
    }
    // at this corpus size false positives are absent: bound is tight
    assert(bloom(1).getAs[Long]("n_might") === exact(2L))
  }

  test("simhashCandidates hot-bucket cap drops degenerate identical-signature blocks") {
    // 50 identical signatures = every chunk bucket holds 50 docs; plus one
    // honest near-dup pair (hamming 1) in its own buckets
    val hot = (1L to 50L).map(i => (i, 0x1111111111111111L))
    val pair = Seq((2001L, 0x0123456789ABCDEFL), (2002L, 0x0123456789ABCDEEL))
    val sigs = (hot ++ pair).toDF("doc_id", "simhash")
    val capped = Dedup.simhashCandidates(sigs, "doc_id", maxDist = 3, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(capped === Seq((2001L, 2002L))) // hot block suppressed, real pair kept
    // under the default cap the block is within bounds and fully pairs up
    val uncapped = Dedup.simhashCandidates(sigs, "doc_id", maxDist = 3).count()
    assert(uncapped === 50L * 49 / 2 + 1)
  }

  test("exactSummary counts content-hash duplicates") {
    val r = Dedup.exactSummary(docs, "text").collect().head
    assert(r.getAs[Long]("n_docs") === 4)
    assert(r.getAs[Long]("n_unique") === 3)
    assert(r.getAs[Long]("n_dup_rows") === 1)
  }

  test("ngramJaccardPairs finds near-dups through shared shingles, never unrelated pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 5)
      .orderBy("d1", "d2").collect()
    val keys = pairs.map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(keys.contains((1L, 2L))) // near-dup pair found
    assert(keys.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(!keys.exists { case (a, b) => a == 3L || b == 3L }) // unrelated absent
    val exact = pairs.find(r => r.getAs[Long]("d1") == 1L && r.getAs[Long]("d2") == 4L).get
    assert(exact.getAs[Double]("jaccard") === 1.0)
  }

  test("minhashJaccardEstimate: identical docs estimate 1.0, estimates stay in [0,1]") {
    val r = Dedup.minhashJaccardEstimate(docs, "doc_id", "text", k = 5, nPerms = 16)
      .collect()
      .map(x => (x.getAs[Long]("d1"), x.getAs[Long]("d2")) ->
        (x.getAs[Double]("jaccard"), x.getAs[Long]("n_match"),
          x.getAs[Double]("jaccard_est"))).toMap
    // exact dup (1,4): every permutation minimum agrees
    assert(r((1L, 4L)) === ((1.0, 16L, 1.0)))
    // every candidate pair carries an estimate in range
    r.values.foreach { case (_, m, est) =>
      assert(m >= 0L && m <= 16L && est >= 0.0 && est <= 1.0)
    }
  }

  test("simhashJaccardAudit: identical docs at hamming 0, every pair in range") {
    val r = Dedup.simhashJaccardAudit(docs, "doc_id", "text", k = 5)
      .collect()
      .map(x => (x.getAs[Long]("d1"), x.getAs[Long]("d2")) ->
        (x.getAs[Double]("jaccard"), x.getAs[Int]("hamming"))).toMap
    assert(r((1L, 4L)) === ((1.0, 0))) // exact dup: identical signature
    r.values.foreach { case (_, h) => assert(h >= 0 && h <= 64) }
  }

  test("tuneMaxDist: strict threshold needs only hamming 0; knob and cost are monotone in the target") {
    // only the exact dup (1,4) clears jaccard 0.95, and identical docs
    // hash to identical signatures — the minimal knob catches it
    val (d0, r0, c0) = Dedup.tuneMaxDist(docs, "doc_id", "text", k = 5,
      jaccardThreshold = 0.95, targetRecall = 1.0)
    assert(d0 === 0 && r0 === 1.0)
    assert(c0 >= 1) // at least the (1,4) candidate pair at hamming 0

    // loosening the true-pair definition can only RAISE the tuned knob,
    // and the verification mass follows it monotonically
    val (d1, r1, c1) = Dedup.tuneMaxDist(docs, "doc_id", "text", k = 5,
      jaccardThreshold = 0.3, targetRecall = 1.0)
    assert(d1 >= d0 && c1 >= c0)
    // the contract: either the target was met, or the banding bound (3)
    // was hit and the sub-target recall is reported honestly
    assert(r1 === 1.0 || d1 === 3)

    // deterministic re-tune (the tuneNProbe pin)
    assert(Dedup.tuneMaxDist(docs, "doc_id", "text", k = 5,
      jaccardThreshold = 0.3, targetRecall = 1.0) === ((d1, r1, c1)))

    assertThrows[IllegalArgumentException] {
      Dedup.tuneMaxDist(docs, "doc_id", "text", k = 5, targetRecall = 0.0)
    }
  }

  test("resolveNearDups keeps the lowest id of each cluster and all singletons") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 5)
      .filter($"jaccard" >= 0.8)
    val survivors = Dedup.resolveNearDups(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // only the exact pair (1,4) clears 0.8 — 4 drops, its canonical 1
    // stays; 2 (low-jaccard near-dup at k=5) and unrelated 3 survive
    assert(survivors === Seq(1L, 2L, 3L))
    // at a loose floor the shared-shingle pair (1,2) also collapses
    val loose = Dedup.resolveNearDups(docs, "doc_id",
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 5))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(loose === Seq(1L, 3L))
  }

  test("connectedComponents: transitive closure over a path graph plus an island") {
    // 1-2-3-4 is a PATH (no 1-3, 1-4, 2-4 edges — the shape banding
    // produces and greedy pairwise resolution mislabels); 10-11 is a
    // separate island. Min-label needs 3 propagation rounds for the path.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("d1", "d2")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    // non-convergence inside the bound raises the dedicated exception
    // (distinguishable from a usage error) instead of returning a
    // half-propagated labeling
    val long = (1L until 30L).map(i => (i, i + 1)).toDF("d1", "d2")
    val e = intercept[graft.ext.ConvergenceException] {
      Dedup.connectedComponents(long, maxIters = 3)
    }
    assert(e.getMessage.contains("did not converge"))
    // pointer jumping makes rounds O(log diameter): the 30-node path
    // (diameter 29) must converge well inside the default budget instead
    // of needing 29 propagation rounds
    val (ok, rounds) = Dedup.connectedComponentsWithRounds(long)
    assert(ok.select("component").distinct().count() === 1L)
    assert(rounds <= 8, s"expected O(log d) convergence, took $rounds rounds")
  }

  test("incrementalMinhashCandidates: batch pairs vs self and corpus, never old-old") {
    // corpus already holds the near-identical docs 1 and 2; the batch
    // brings 10 (a near-dup of 1/2) and 11 (novel)
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different words about spark query engines here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "novel content that matches nothing in the existing corpus at all"))
      .toDF("doc_id", "text")
    val cands = Dedup.incrementalMinhashCandidates(batch, corpus,
        "doc_id", "text", k = 5, nPerms = 16, rowsPerBand = 2)
      .collect()
    val byKind = cands.groupBy(_.getAs[String]("against"))
    // 10 collides with BOTH 1 and 2 in the corpus, on all 8 bands
    val vsCorpus = byKind("corpus")
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("n_bands"))).toSet
    assert(vsCorpus === Set((10L, 1L, 8L), (10L, 2L, 8L)))
    // no batch-batch pair (10 and 11 share nothing), and the old-old
    // exact pair (1,2) is NEVER emitted — that work was done at ingest
    assert(!byKind.contains("batch"))
    assert(!cands.exists(r => r.getLong(0) <= 3L))
    // an id that (wrongly) appears on both sides must not be reported as
    // its own corpus near-dup — the join's id-inequality guard holds even
    // when callers violate the disjoint-id contract
    val overlap = Dedup.incrementalMinhashCandidates(
        batch, batch.limit(1), "doc_id", "text",
        k = 5, nPerms = 16, rowsPerBand = 2)
      .collect()
    assert(!overlap.exists(r => r.getLong(0) == r.getLong(1)))
  }

  test("withMinhashSigs (per-row, streaming-safe) matches the grouped signatures") {
    val sigs = Dedup.withMinhashSigs(docs, Seq("doc_id"), col("text"),
      k = 5, nPerms = 16)
    // single-md5-per-shingle is structural: CollapseProject must NOT have
    // inlined the per-pair fold into both sig columns (that would double
    // the md5 pass exactly when codegen CSE is unavailable) — one
    // aggregate() per permutation PAIR survives optimization, not one per
    // signature column
    // plan pin on a non-local child (ConvertToLocalRelation folds the
    // whole projection away over a LocalRelation, hiding the shape)
    val planPin = Dedup.withMinhashSigs(docs.repartition(2), Seq("doc_id"),
      col("text"), k = 5, nPerms = 16)
    val nFolds = planPin.queryExecution.optimizedPlan.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.map(_.collect {
          case a: org.apache.spark.sql.catalyst.expressions.ArrayAggregate => a
        }.size).sum
    }.sum
    assert(nFolds === 8, s"expected 8 per-pair folds, saw $nFolds")
    val perRow = sigs
      .filter(col("sig_0").isNotNull)
      .orderBy("doc_id").collect().map(_.toSeq)
    val grouped = Dedup.minhashSignaturesPortable(docs, "doc_id", "text",
        k = 5, nPerms = 16)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(perRow.toSeq === grouped.toSeq)
  }

  test("resolveByComponents keeps one survivor per cluster where greedy keeps two") {
    // pairs 2-3 and 1-3: node 2 never appears as d2, so the greedy drop
    // keeps BOTH 1 and 2 even though 1~3~2 is one transitive cluster
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "unpaired"))
      .toDF("doc_id", "text")
    val pairs = Seq((2L, 3L), (1L, 3L)).toDF("d1", "d2")
    val greedy = Dedup.resolveNearDups(corpus, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(greedy === Seq(1L, 2L, 9L)) // 2 survives greedy
    val exact = Dedup.resolveByComponents(corpus, "doc_id", pairs)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(exact === Seq(1L, 9L)) // one survivor per cluster + unpaired
  }

  test("minhash: identical docs have identical signatures; banding buckets them") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", k = 3, nPerms = 16)
    val s1 = sigs.filter($"doc_id" === 1L).drop("doc_id").collect().head
    val s4 = sigs.filter($"doc_id" === 4L).drop("doc_id").collect().head
    assert(s1 === s4)
    val cands = Dedup.minhashCandidates(sigs, "doc_id", nPerms = 16, rowsPerBand = 2)
    val pairs = cands.collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(pairs.contains((1L, 4L)))
    assert(cands.filter($"d1" === 1L && $"d2" === 4L).collect().head
      .getAs[Long]("n_bands") === 8) // all bands collide for identical docs
  }

  test("simhash: hamming 0 for identical docs, small for near-dups, candidates found") {
    val sigs = Dedup.simhash(docs, "doc_id", "text")
    val m = sigs.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(m(1L) === m(4L))
    val ham12 = java.lang.Long.bitCount(m(1L) ^ m(2L))
    val ham13 = java.lang.Long.bitCount(m(1L) ^ m(3L))
    assert(ham12 < ham13) // near-dup closer than unrelated
    val cands = Dedup.simhashCandidates(sigs, "doc_id", maxDist = 3)
    val pairs = cands.collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("minhash signatures: portable md5 twin matches the engine kernel in shape and banded verdicts") {
    // the two signature families hash differently by design (engine
    // xxhash64 vs portable md5), so value parity is impossible — what
    // must agree is everything hash-independent: which docs get a
    // signature, the signature schema, and the banded candidate verdicts
    // where hashing cannot disagree (an exact dup collides in ALL bands
    // under any hash family; a doc sharing zero shingles collides in
    // none)
    val d = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"), // exact dup of 1: all bands collide
      (3L, "q r s t u v w x y z"), // zero shared shingles: no bands
      (4L, "one two"))             // < k tokens: no signature at all
      .toDF("doc_id", "text")
    val eng = Dedup.minhashSignatures(d, "doc_id", "text", k = 5,
      nPerms = 16)
    val por = Dedup.minhashSignaturesPortable(d, "doc_id", "text", k = 5,
      nPerms = 16)
    assert(eng.columns.toSeq === por.columns.toSeq)
    assert(eng.collect().map(_.getLong(0)).sorted.toSeq ===
      por.collect().map(_.getLong(0)).sorted.toSeq)
    def pairs(c: org.apache.spark.sql.DataFrame) = c.collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
        r.getAs[Long]("n_bands"))).toSet
    assert(pairs(Dedup.minhashCandidates(eng, "doc_id", nPerms = 16,
      rowsPerBand = 2)) === Set((1L, 2L, 8L)))
    assert(pairs(Dedup.minhashCandidatesPortable(d, "doc_id", "text",
      k = 5, nPerms = 16, rowsPerBand = 2)) === Set((1L, 2L, 8L)))
  }

  test("duplicateSpanCoverage: shared spans counted, hottest span surfaced") {
    val d = Seq(
      (1L, "x y z w"), // shingles {x y z, y z w}
      (2L, "x y z q"), // shares "x y z" with doc 1
      (3L, "p q r s")  // no shared spans
    ).toDF("doc_id", "text")
    val r = Dedup.duplicateSpanCoverage(d, "doc_id", "text", k = 3,
        minDocs = 2)
      .orderBy("doc_id").collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("n_sh"),
        x.getAs[Long]("n_dup"), x.getAs[Long]("max_doc_freq"),
        x.getAs[Double]("dup_frac")))
    assert(r.toSeq === Seq(
      (1L, 2L, 1L, 2L, 0.5),
      (2L, 2L, 1L, 2L, 0.5),
      (3L, 2L, 0L, 1L, 0.0)))
    // doc-frequency comes from an unordered window, never a groupBy +
    // join-back: ONE source scan (the join formulation plans two), zero
    // joins
    val physical = Dedup.duplicateSpanCoverage(d, "doc_id", "text", k = 3,
      minDocs = 2).queryExecution.executedPlan.toString
    assert(physical.split("TableScan", -1).length - 1 === 1, physical)
    assert(physical.contains("Window"), physical)
    assert(!physical.contains("Join"), physical)
  }

  test("removeDuplicateSpans: cross-doc span cut, unique text kept") {
    val d = Seq(
      (1L, "a b c d e f"), // shares "c d e" with doc 2
      (2L, "x y c d e z"),
      (3L, "p q r s t u")  // untouched
    ).toDF("doc_id", "text")
    val r = Dedup.removeDuplicateSpans(d, "doc_id", "text", k = 3,
        minDocs = 2)
      .orderBy("doc_id").collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("n_tokens"),
        x.getAs[Long]("n_removed"), x.getAs[Long]("n_spans"),
        x.getAs[String]("text_clean")))
    assert(r.toSeq === Seq(
      (1L, 6L, 3L, 1L, "a b f"),
      (2L, 6L, 3L, 1L, "x y z"),
      (3L, 6L, 0L, 0L, "p q r s t u")))
  }

  test("removeDuplicateSpans: within-doc repetition alone is not cut") {
    val d = Seq(
      (1L, "a b c a b c"), // "a b c" twice, but only in THIS doc
      (2L, "x y z w v u")
    ).toDF("doc_id", "text")
    val r = Dedup.removeDuplicateSpans(d, "doc_id", "text", k = 3,
        minDocs = 2)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_removed") === 0L)
    assert(r(0).getAs[String]("text_clean") === "a b c a b c")
  }

  test("removeDuplicateSpans: overlapping windows merge into one span") {
    // "a b c d" shared whole: doc-1 starts 1 and 2 both duplicated,
    // covering 1..4 as ONE maximal run
    val d = Seq(
      (1L, "a b c d x"),
      (2L, "a b c d y")
    ).toDF("doc_id", "text")
    val r = Dedup.removeDuplicateSpans(d, "doc_id", "text", k = 3,
        minDocs = 2)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_removed") === 4L)
    assert(r(0).getAs[Long]("n_spans") === 1L)
    assert(r(0).getAs[String]("text_clean") === "x")
  }

  test("removeDuplicateSpans: disjoint shared spans count separately") {
    val d = Seq(
      (1L, "a b c q q x y z"), // shares "a b c" and "x y z" with doc 2/3
      (2L, "a b c m m m m m"),
      (3L, "n n n n n x y z")
    ).toDF("doc_id", "text")
    val r = Dedup.removeDuplicateSpans(d, "doc_id", "text", k = 3,
        minDocs = 2)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_spans") === 2L)
    assert(r(0).getAs[String]("text_clean") === "q q")
  }

  test("removeDuplicateSpans: full coverage empties the doc") {
    val d = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val r = Dedup.removeDuplicateSpans(d, "doc_id", "text", k = 3,
        minDocs = 2)
      .orderBy("doc_id").collect()
    assert(r.forall(_.getAs[String]("text_clean") === ""))
    assert(r.forall(_.getAs[Long]("n_removed") === 3L))
  }

  test("incremental span removal ≡ full run restricted to the batch") {
    val corpus = Seq(
      (2L, "a b c d e f"),  // shares "c d e" with batch doc 1
      (4L, "m c d e n o"),  // second corpus holder of "c d e"
      (6L, "p q r s t u")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "z z c d e w"),  // "c d e" already duplicated IN THE CORPUS
      (3L, "k l m n o q"),  // unique
      (5L, "k l m n o r")   // shares "k l m" + "l m n" + "m n o" with 3
    ).toDF("doc_id", "text")
    val idx = Dedup.spanDfIndex(corpus, "doc_id", "text", k = 3)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_removed"), r.getAs[Long]("n_spans"),
        r.getAs[String]("text_clean"))).sortBy(_._1).toSeq
    val inc = canon(Dedup.removeDuplicateSpansIncremental(batch, idx,
      "doc_id", "text", k = 3, minDocs = 2))
    val full = canon(Dedup.removeDuplicateSpans(corpus.union(batch),
        "doc_id", "text", k = 3, minDocs = 2)
      .filter(col("doc_id") % 2 === 1))
    assert(inc === full)
    // the corpus-only duplicate reaches the batch through the index
    assert(inc.head === ((1L, 3L, 1L, "z z w")))
    // batch-internal duplication is caught without any index hit
    assert(inc(1)._4 === "q" && inc(2)._4 === "r")
  }

  test("winnowing: guarantee, compression, short docs, pair detection") {
    // docs 1 and 2 share a run of 10 tokens >= w+k-1 = 8 → MUST pair
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    val d = Seq(
      (1L, s"a b c $shared d e"),
      (2L, s"x y $shared z w v"),
      (3L, "p q r s t u m n o k l j"), // no overlap
      (4L, "t1 t2 t3") // shorter than k → no fingerprints
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(d, "doc_id", "text", k = 5, w = 4)
    val byDoc = fps.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!byDoc.contains(4L)) // < k tokens → nothing
    // compression: selected fingerprints are a strict subset of shingles
    val nSh1 = 15 - 5 + 1 // doc 1: 15 tokens → 11 shingles
    assert(byDoc(1L) < nSh1 && byDoc(1L) >= nSh1 / 4)
    val pairs = Dedup.winnowCandidates(d, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // the winnowing guarantee
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // determinism
    val again = Dedup.winnowCandidates(d, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === pairs)
  }

  test("removeDuplicateSpans: docs shorter than k and minDocs gate") {
    val d = Seq(
      (1L, "a b"),        // shorter than k — no shingles, untouched
      (2L, "a b c d e"),
      (3L, "a b c d e")
    ).toDF("doc_id", "text")
    val strict = Dedup.removeDuplicateSpans(d, "doc_id", "text", k = 3,
        minDocs = 3) // only 2 docs share — below the gate
      .collect()
    assert(strict.forall(_.getAs[Long]("n_removed") === 0L))
    intercept[IllegalArgumentException] {
      Dedup.removeDuplicateSpans(d, "doc_id", "text", k = 3, minDocs = 1)
    }
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters on orthogonal axes + the query in cluster A
  private val vecs = Seq(
    (0L, 0, Array(1.0f, 0.0f, 0.0f)),
    (1L, 0, Array(0.9f, 0.1f, 0.0f)),
    (2L, 0, Array(0.95f, 0.05f, 0.0f)),
    (3L, 1, Array(0.0f, 1.0f, 0.0f)),
    (4L, 1, Array(0.0f, 0.9f, 0.1f))
  ).toDF("vec_id", "label", "embedding")

  test("brute-force cosine top-k is exact and ordered") {
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 2).collect()
    assert(top.map(_.getAs[Long]("vec_id")).toSeq === Seq(2L, 1L))
    assert(top.head.getAs[Double]("cosine") > 0.99)
  }

  test("sq8TopK: quantized ranking matches exact on separated clusters; error bounded") {
    val top = Similarity.sq8TopK(vecs, "vec_id", "embedding", 0L, 2).collect()
    // 8-bit range quantization cannot confuse the two orthogonal
    // clusters: the quantized ranking equals the exact one
    assert(top.map(_.getAs[Long]("vec_id")).toSeq === Seq(2L, 1L))
    // and the quantized cosine stays within the per-component step bound
    // of the exact score (range [0,1] -> step ~1/255; cosine error well
    // under d * step for unit-ish vectors — assert a conservative 0.02)
    val exact = Similarity.bruteForceTopKNative(vecs, "vec_id", "embedding",
        0L, 2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine")).toMap
    top.foreach { r =>
      val err = math.abs(r.getAs[Double]("cosine_sq8")
        - exact(r.getAs[Long]("vec_id")))
      assert(err < 0.02, s"quantization error $err")
    }
  }

  test("pqTopK: per-subspace codebook ADC keeps the query's cluster on top; deterministic, join-free") {
    // two clusters separated in BOTH subspaces (dims 1-2 and 3-4), so
    // 2-entry-per-subspace codebooks reconstruct each cluster at its
    // centroid and the ADC ranking puts the query's cluster-mates first
    val d = Seq(
      (0L, 0, Array(1.0f, 0.0f, 1.0f, 0.0f)),
      (1L, 0, Array(0.9f, 0.1f, 0.9f, 0.1f)),
      (2L, 0, Array(0.95f, 0.05f, 0.97f, 0.03f)),
      (3L, 1, Array(0.0f, 1.0f, 0.0f, 1.0f)),
      (4L, 1, Array(0.1f, 0.9f, 0.1f, 0.9f)))
      .toDF("vec_id", "label", "embedding")
    def run() = Similarity.pqTopK(d, "vec_id", "embedding", queryId = 0L,
      k = 4, m = 2, codebookK = 2)
    val rows = run().collect()
    assert(rows.length === 4)
    assert(rows.take(2).map(_.getLong(0)).toSet === Set(1L, 2L))
    rows.foreach(r =>
      assert(math.abs(r.getAs[Double]("cosine_pq")) <= 1.0 + 1e-6))
    // deterministic end to end (seeded Lloyd, id tie-breaks)
    assert(run().collect().map(_.getLong(0)).toSeq ===
      rows.map(_.getLong(0)).toSeq)
    // encode + ADC lookup is one narrow projection: no join anywhere
    val physical = run().queryExecution.executedPlan.toString
    assert(!physical.contains("Join"), physical)
    // dim 4 does not split into 3 subspaces
    assertThrows[IllegalArgumentException] {
      Similarity.pqTopK(d, "vec_id", "embedding", 0L, 2, m = 3)
    }
    // two-stage: with the whole corpus shortlisted, the exact rerank IS
    // the exact ranking — codebook error cannot survive the refine pass
    val rr = Similarity.pqRerankTopK(d, "vec_id", "embedding", 0L, k = 2,
      shortlist = 4, m = 2, codebookK = 2)
      .collect().map(_.getLong(0)).toSeq
    val exact = Similarity.bruteForceTopKNative(d, "vec_id", "embedding",
      0L, 2).collect().map(_.getLong(0)).toSeq
    assert(rr === exact)
    // serving split: a pre-built pqEncode codes frame yields the
    // IDENTICAL ranking (the q_ann_pq_rerank_codes oracle pins this at
    // sf0.01 too), with the float column read only for the shortlist
    val books = Similarity.pqCodebooks(d, "vec_id", "embedding",
      m = 2, codebookK = 2)
    val codes = Similarity.pqEncode(d, "vec_id", "embedding", books)
    val rrCodes = Similarity.pqRerankTopK(d, "vec_id", "embedding", 0L,
        k = 2, shortlist = 4, m = 2, codebookK = 2,
        books = Some(books), codes = Some(codes))
      .collect().map(_.getLong(0)).toSeq
    assert(rrCodes === rr)
    // a codes frame missing a code column fails loudly
    assertThrows[IllegalArgumentException] {
      Similarity.pqTopK(d, "vec_id", "embedding", 0L, 2, m = 2,
        codebookK = 2, keepCols = Seq.empty, books = Some(books),
        codes = Some(codes.withColumnRenamed("__code_1", "__nope")))
    }
    assertThrows[IllegalArgumentException] {
      Similarity.pqRerankTopK(d, "vec_id", "embedding", 0L, k = 4,
        shortlist = 2)
    }
  }

  test("cosine of orthogonal vectors is 0, identical is 1") {
    val r = vecs.select(
      Similarity.cosine(
        col("embedding").cast("array<double>"),
        array(lit(1.0), lit(0.0), lit(0.0))).as("c"))
      .orderBy(col("c")).collect()
    assert(math.abs(r.head.getAs[Double]("c")) < 1e-12)      // (0,1,0)
    assert(math.abs(r.last.getAs[Double]("c") - 1.0) < 1e-12) // (1,0,0)
  }

  test("IVF probe with nProbe=1 searches only the query's cluster and agrees on top-k") {
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_ext")
      .toString + "/emb"
    // k=2 Lloyd recovers the two orthogonal clusters (see trainQuantizer
    // test below), so the layout has one partition per cluster
    Similarity.writeIvfLayout(vecs, "vec_id", "embedding",
      Similarity.trainQuantizer(vecs, "vec_id", "embedding",
        k = 2, iters = 2, salt = "t"), path)
    val top = Similarity.ivfProbe(spark, path, "vec_id", "embedding",
      queryVec = Seq(1.0, 0.0, 0.0), k = 2, nProbe = 1,
      excludeId = Some(0L)).collect()
    assert(top.map(_.getAs[Long]("vec_id")).toSeq === Seq(2L, 1L))
    // cluster B never scanned: both hits come from the one probed bucket
    assert(top.map(_.getAs[Int]("ivf_bucket")).distinct.length === 1)
    // hard negatives for an anchor in cluster A (label 0): with both
    // buckets probed, every returned row is label 1 — the same-label
    // near-duplicates that dominate plain top-k are filtered BEFORE the
    // rank, so the closest cross-label vectors surface
    val negs = Similarity.ivfHardNegatives(spark, path, "vec_id",
      "embedding", "label",
      anchors = Seq((0L, 0, Seq(1.0, 0.0, 0.0))), k = 2, nProbe = 2)
      .collect()
    assert(negs.length === 2)
    assert(negs.forall(_.getAs[Int]("label") === 1))
    assert(negs.forall(_.getAs[Long]("qid") === 0L))
  }

  test("residual PQ recovers within-cluster ranking that raw PQ collapses") {
    // two tight coarse clusters; cluster A's members deviate ±y from the
    // centroid. Raw-PQ codebooks (K=2/subspace) spend both entries
    // separating cluster A from B, so every A member encodes IDENTICALLY
    // and the ADC score cannot rank inside the cluster; residual
    // codebooks see only the deviations (x − c_bucket) and split the +y
    // members from the −y members — the faiss-encoding win, on data
    // where clusters are real (the isotropic-testdata numbers in
    // ANN_RECALL.json show ~no gain there, as theory predicts).
    val d = Seq(
      (0L, 0, Array(1.0f, 0.2f, 1.0f, 0.2f)),    // A, +y (the query)
      (1L, 0, Array(1.0f, 0.18f, 1.0f, 0.18f)),  // A, +y — true nearest
      (2L, 0, Array(1.0f, -0.2f, 1.0f, -0.2f)),  // A, −y
      (3L, 0, Array(1.0f, -0.18f, 1.0f, -0.18f)),// A, −y
      (4L, 1, Array(0.0f, 1.0f, 0.0f, 1.0f)),    // B
      (5L, 1, Array(0.1f, 0.9f, 0.1f, 0.9f)))    // B
      .toDF("vec_id", "label", "embedding")
    val cents = Similarity.trainQuantizer(d, "vec_id", "embedding",
      k = 2, iters = 2, salt = "rspec")
    val q = Seq(1.0, 0.2, 1.0, 0.2)

    val rawPath = java.nio.file.Files
      .createTempDirectory("graft_rpq_raw").toString + "/emb"
    Similarity.writeIvfLayout(d, "vec_id", "embedding", cents, rawPath,
      pqBooks = Similarity.pqCodebooks(d, "vec_id", "embedding",
        m = 2, codebookK = 2))
    val resPath = java.nio.file.Files
      .createTempDirectory("graft_rpq_res").toString + "/emb"
    Similarity.writeIvfLayout(d, "vec_id", "embedding", cents, resPath,
      pqBooks = Similarity.pqCodebooksResidual(d, "vec_id", "embedding",
        cents, m = 2, codebookK = 2),
      pqResidual = true)
    assert(!Similarity.layoutPqResidual(spark, rawPath))
    assert(Similarity.layoutPqResidual(spark, resPath))

    // raw layout: every cluster-A member carries the SAME code vector —
    // the within-cluster signal is gone at write time
    val rawCodes = spark.read.parquet(rawPath)
      .filter(col("vec_id") < 4).select("pq_code")
      .collect().map(_.getSeq[Int](0)).toSeq
    assert(rawCodes.distinct.length === 1, rawCodes)
    // residual layout: the +y and −y members encode differently
    val resCodes = spark.read.parquet(resPath)
      .filter(col("vec_id") < 4).select("vec_id", "pq_code")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(resCodes(0L) === resCodes(1L))
    assert(resCodes(2L) === resCodes(3L))
    assert(resCodes(0L) !== resCodes(2L), resCodes)

    // probe consequence: raw ADC ties all three cluster-mates (identical
    // codes → identical scores, order is the id tie-break)…
    val raw = Similarity.ivfPqProbe(spark, rawPath, "vec_id", q,
      k = 3, nProbe = 1, excludeId = Some(0L)).collect()
    assert(raw.map(_.getAs[Double]("cosine_pq")).distinct.length === 1,
      raw.mkString(", "))
    // …while the residual probe ranks the true +y mate STRICTLY first
    val res = Similarity.ivfPqProbe(spark, resPath, "vec_id", q,
      k = 3, nProbe = 1, excludeId = Some(0L)).collect()
    assert(res.head.getLong(0) === 1L, res.mkString(", "))
    assert(res.head.getAs[Double]("cosine_pq") >
      res(1).getAs[Double]("cosine_pq"), res.mkString(", "))
  }

  test("centroids: mean vector per bucket, dims in order") {
    val c = Similarity.centroids(vecs, "label", "embedding")
      .filter($"label" === 1).select("centroid").as[Seq[Double]].collect().head
    assert(math.abs(c(0) - 0.0) < 1e-6)
    assert(math.abs(c(1) - 0.95) < 1e-6)
    assert(math.abs(c(2) - 0.05) < 1e-6)
  }

  test("srpBucket: deterministic, direction-sensitive, negation flips every sign bit") {
    val df = Seq(
      (1L, Array(0.5, -0.25, 0.125, 1.0)),
      (2L, Array(0.5, -0.25, 0.125, 1.0)),   // identical direction
      (3L, Array(-0.5, 0.25, -0.125, -1.0)), // exact negation
      (4L, Array(1.0, 0.5, -0.25, 0.125))
    ).toDF("id", "v")
    val b = df.select(col("id"),
        Similarity.srpBucket(col("v"), dim = 4, nPlanes = 4, salt = "t").as("b"))
      .orderBy("id").collect().map(_.getInt(1))
    assert(b(0) === b(1))          // same vector, same bucket
    assert(b(2) === (b(0) ^ 15))   // every sign flips under negation
    assert(b.forall(x => x >= 0 && x < 16))
    // scaling preserves direction -> same bucket
    val scaled = df.filter($"id" === 1)
      .select(Similarity.srpBucket(expr("transform(v, x -> x * 7.5)"),
        dim = 4, nPlanes = 4, salt = "t").as("b"))
      .collect().head.getInt(0)
    assert(scaled === b(0))
  }

  test("nearDupPairsSRP finds the near-identical pair through the LSH bucket") {
    val srp = Similarity.nearDupPairsSRP(vecs, "vec_id", "embedding",
      dim = 3, nPlanes = 2, salt = "t", threshold = 0.9).collect()
    val pairs = srp.map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    // cluster-A vectors are near-identical in direction; at 2 planes they
    // collide and survive the 0.9 cosine floor
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)) || pairs.contains((0L, 1L)),
      srp.mkString(", "))
    // every reported pair really is above the floor
    assert(srp.forall(_.getAs[Double]("cosine") > 0.9))
  }

  test("trainQuantizer recovers the two clusters; kmeansAudit reports them") {
    val cents = Similarity.trainQuantizer(vecs, "vec_id", "embedding",
      k = 2, iters = 2, salt = "t")
    assert(cents.length === 2)
    assert(cents.forall(_._2.length === 3))
    val audit = Similarity.kmeansAudit(vecs, "vec_id", "embedding",
      k = 2, iters = 2, salt = "t").collect()
    assert(audit.map(_.getAs[Long]("n")).sorted.toSeq === Seq(2L, 3L))
    // each recovered cluster is tight around its trained centroid
    assert(audit.forall(_.getAs[Double]("avg_cos") > 0.99), audit.mkString(", "))
    // the whole run is deterministic: seeds, assignments, updates
    val again = Similarity.trainQuantizer(vecs, "vec_id", "embedding",
      k = 2, iters = 2, salt = "t")
    assert(again === cents)
  }

  test("semanticDupPairs: trained clusters generate candidates, cross-cluster never scored") {
    val cents = Similarity.trainQuantizer(vecs, "vec_id", "embedding",
      k = 2, iters = 2, salt = "t")
    val pairs = Similarity.semanticDupPairs(vecs, "vec_id", "embedding",
      cents, threshold = 0.9).collect()
    val ids = pairs.map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    // all three cluster-A pairs clear 0.9; cluster B's one pair does too
    assert(ids === Set((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L)))
    assert(pairs.forall(_.getAs[Double]("cosine") > 0.9))
    // no pair straddles the two trained clusters (orthogonal axes)
    val a = Set(0L, 1L, 2L)
    assert(ids.forall { case (x, y) => a.contains(x) == a.contains(y) })
  }

  test("nearDupPairs hot-bucket cap drops the degenerate bucket, keeps the rest") {
    // bucket 0 holds 3 near-identical vectors, bucket 1 holds 2: a cap of
    // 2 suppresses the hot bucket's 3 pairs but keeps bucket 1's pair
    val capped = Similarity.nearDupPairs(vecs, "vec_id", "embedding",
        "label", threshold = 0.3, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(capped === Seq((3L, 4L)))
    // the default cap doesn't bind: all within-bucket pairs above the floor
    val uncapped = Similarity.nearDupPairs(vecs, "vec_id", "embedding",
      "label", threshold = 0.3).count()
    assert(uncapped === 4L) // 3 pairs in bucket 0 + 1 in bucket 1
  }
}

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("vocabularyCoverage: per-group OOV under the deterministic top-V cut") {
    val docs = Seq(
      ("A", "x x y"), ("B", "x z")).toDF("source", "text")
    // counts: x=3, y=1, z=1; top-2 by (count desc, word asc) = {x, y}
    val r = TextStats.vocabularyCoverage(docs, "text", "source", topV = 2)
      .collect().map(x => x.getString(0) ->
        ((x.getAs[Long]("n_tokens"), x.getAs[Long]("n_oov"),
          x.getAs[Double]("oov_rate")))).toMap
    assert(r("A") === ((3L, 0L, 0.0)))
    assert(r("B") === ((2L, 1L, 0.5))) // z is OOV
    // V >= #types → zero OOV everywhere
    val all = TextStats.vocabularyCoverage(docs, "text", "source", topV = 10)
      .collect()
    assert(all.forall(_.getAs[Long]("n_oov") === 0L))
    intercept[IllegalArgumentException] {
      TextStats.vocabularyCoverage(docs, "text", "source", topV = 0)
    }
  }

  test("count-min sketch: one-sided guarantee, exactness, mergeability") {
    val a = Seq((1L, "x x x y z"), (2L, "y z w v u t")).toDF("doc_id", "text")
    val b = Seq((3L, "x q p o n m l k")).toDF("doc_id", "text")
    def est(docs: org.apache.spark.sql.DataFrame, d: Int, w: Int) = {
      val sk = TextStats.cmSketch(docs, "text", d, w)
      val truth = docs.select(explode(split(col("text"), " ")).as("t"))
        .groupBy("t").count()
      TextStats.cmEstimate(sk, truth.select(col("t")), "t", d, w)
        .join(truth, Seq("t")).collect()
        .map(r => r.getString(0) ->
          ((r.getAs[Long]("est"), r.getAs[Long]("count")))).toMap
    }
    // tiny w forces collisions; the estimate must NEVER undercount
    val tight = est(a.union(b), d = 2, w = 4)
    assert(tight.values.forall { case (e, t) => e >= t })
    assert(tight("x")._1 >= 4L) // 4 occurrences across both frames
    // w comfortably above #types → exact for every token
    val exact = est(a.union(b), d = 2, w = 512)
    assert(exact.values.forall { case (e, t) => e === t })
    // mergeability: sketch(a ∪ b) = cellwise sum of the two sketches
    def cells(docs: org.apache.spark.sql.DataFrame) =
      TextStats.cmSketch(docs, "text", 2, 4).collect()
        .map(r => (r.getAs[Int]("r"), r.getAs[Long]("bucket")) ->
          r.getAs[Long]("cnt")).toMap
    val merged = (cells(a).keySet ++ cells(b).keySet).map { k =>
      k -> (cells(a).getOrElse(k, 0L) + cells(b).getOrElse(k, 0L))
    }.toMap
    assert(cells(a.union(b)) === merged)
    intercept[IllegalArgumentException] {
      TextStats.cmSketch(a, "text", d = 0, w = 4)
    }
  }

  test("tokenVocab: global counts, deterministic tie-break, driver-merged top-k plan") {
    val docs = Seq(
      (1L, "a b a"), (2L, "b c"), (3L, "a"), (4L, "d c")).toDF("doc_id", "text")
    val top = TextStats.tokenVocab(docs, "text", k = 3).collect()
    // a:3; b and c tie at 2 and break alphabetically; d:1 misses the cut
    assert(top.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 3L), ("b", 2L), ("c", 2L)))
    // ordered limit plans as TakeOrderedAndProject (per-partition partial
    // top-k, k-row driver merge) — never a global Sort
    val plan = TextStats.tokenVocab(docs, "text", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("bm25TopK ranks by term frequency with length normalization; zero-score docs excluded") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha rare beta"),
      (3L, "rare rare alpha"),
      (4L, "beta gamma delta")).toDF("doc_id", "text")
    val top = TextStats.bm25TopK(docs, "doc_id", "text", Seq("rare"), k = 3)
      .collect()
    // tf 2 outranks tf 1 at equal length; docs without the term (a
    // meaningless k-way tie at 0) never enter the top-k
    assert(top.map(_.getLong(0)).toSeq === Seq(3L, 2L))
    assert(top.forall(_.getDouble(1) > 0))
  }

  test("bm25TopK splits each document at most twice, independent of term count") {
    // with Q terms the token array is referenced Q+1 times; the staged
    // `__toks` projection must survive optimization (CollapseProject
    // never inlines a multiply-referenced non-cheap alias), and the
    // no-term-present exclusion must reach the scan as an
    // arrays_overlap predicate — NOT as a score predicate, which would
    // inline the whole Q-term score (Q+1 splits) into the scan-side
    // filter. Budget: 1 split in the pushed presence filter + 1 in the
    // token projection = 2, at any Q. Parquet-backed input: a local Seq
    // relation constant-folds to a LocalRelation and proves nothing.
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val terms = (1 to 12).map(i => s"t$i") :+ "rare"
    val plan = TextStats.bm25TopK(docs, "doc_id", "text", terms, k = 5)
      .queryExecution.optimizedPlan.toString
    assert(plan.split("split\\(text", -1).length - 1 <= 2, plan)
    assert(plan.contains("arrays_overlap"), plan)
  }

  test("token count, word length, stopword ratio, quality") {
    val df = Seq((1L, "the cat sat on a mat")).toDF("doc_id", "text")
    val r = TextStats.withQuality(df, "text").collect().head
    assert(r.getAs[Int]("n_tokens") === 6)
    // non-space chars = 20 - 5 = 15 → avg word len 15/6
    assert(math.abs(r.getAs[Double]("avg_word_len") - 15.0 / 6) < 1e-4)
    assert(math.abs(r.getAs[Double]("stop_ratio") - 2.0 / 6) < 1e-4)
    // quality = (6/100) · (1 − 2/6)
    assert(math.abs(r.getAs[Double]("quality_score") - 0.06 * (1 - 2.0 / 6)) < 1e-4)
  }

  test("rarityScore: hapax counts and avg doc frequency over the distinct vocab") {
    val docs = Seq((1L, "a b c"), (2L, "a b d"), (3L, "a x a")).toDF("doc_id", "text")
    val r = TextStats.rarityScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // df: a=3, b=2, c=1, d=1, x=1 (token 'a' repeated within doc 3 counts once)
    assert(r(0).getAs[Long]("n_types") === 3L)
    assert(r(0).getAs[Long]("n_hapax") === 1L) // c
    assert(r(0).getAs[Double]("avg_doc_freq") === 2.0) // (3+2+1)/3
    assert(r(2).getAs[Long]("n_types") === 2L)
    assert(r(2).getAs[Double]("hapax_ratio") === 0.5) // x of {a, x}
  }

  test("lmScore: unigram cross-entropy and perplexity by hand") {
    // corpus tf: a=2, b=2, c=1, N=5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = TextStats.lmScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc1: H = log2 5 - (log2 2 + log2 2 + log2 2)/3 = log2 5 - 1
    //       ppl = 2^H = 5/2 exactly
    assert(r(0).getAs[Long]("n_tokens") === 3L)
    assert(r(0).getAs[Double]("cross_entropy") === 1.321928)
    assert(r(0).getAs[Double]("perplexity") === 2.5)
    // doc2: H = log2 5 - (log2 2 + log2 1)/2; ppl = 5/sqrt(2)
    assert(r(1).getAs[Double]("cross_entropy") === 1.821928)
    assert(r(1).getAs[Double]("perplexity") === 3.535534)
  }

  test("lmScore against a frozen corpus: OOV dropped, fully-OOV doc kept as null") {
    val frozen = Seq((100L, "a a b")).toDF("doc_id", "text") // tf: a=2, b=1, N=3
    val docs = Seq((1L, "a zz"), (2L, "qq zz")).toDF("doc_id", "text")
    val r = TextStats.lmScore(docs, "doc_id", "text", frozen)
      .orderBy("doc_id").collect()
    assert(r.length === 2) // the fully-OOV doc does NOT vanish
    // doc1: only 'a' is in-LM -> n_tokens 1, H = log2 3 - log2 2
    assert(r(0).getAs[Long]("n_tokens") === 1L)
    assert(r(0).getAs[Double]("perplexity") === 1.5)
    // doc2: no in-LM token -> 0 tokens, null score
    assert(r(1).getAs[Long]("n_tokens") === 0L)
    assert(r(1).isNullAt(r(1).fieldIndex("cross_entropy")))
    assert(r(1).isNullAt(r(1).fieldIndex("perplexity")))
  }

  test("lmScoreHashed: bucket-pooled scores, all tokens count, constant-size model") {
    // nBuckets=1 pools EVERY token into one bucket: model = {b0: N},
    // so each token scores log2((N+1)/(N+1)) = 0 and H = 0 exactly —
    // pins the add-1 identity and that NO token is dropped (unlike
    // lmScore's OOV drop: 'zz' never appears in the frozen corpus)
    val frozen = Seq((100L, "a a b")).toDF("doc_id", "text") // N = 3
    val docs = Seq((1L, "a zz"), (2L, "qq zz")).toDF("doc_id", "text")
    val one = TextStats.lmScoreHashed(docs, "doc_id", "text", frozen,
      nBuckets = 1).orderBy("doc_id").collect()
    assert(one.map(_.getAs[Long]("n_tokens")).toSeq === Seq(2L, 2L))
    assert(one.map(_.getAs[Double]("cross_entropy")).toSeq === Seq(0.0, 0.0))
    assert(one.map(_.getAs[Double]("perplexity")).toSeq === Seq(1.0, 1.0))
    // self-corpus at the default width: same row count and n_tokens as
    // the corpus token count — every doc scores, none vanish
    val self = TextStats.lmScoreHashed(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(self.length === 2)
    assert(self.forall(_.getAs[Long]("n_tokens") === 2L))
    assert(self.forall(!_.isNullAt(self.head.fieldIndex("cross_entropy"))))
  }

  test("lmScoreHashed model join stays broadcast with auto-broadcast disabled") {
    // the whole point of the hashed twin: the model side is <= nBuckets
    // rows BY CONSTRUCTION, so its broadcast is a hard hint that no
    // planner threshold can degrade — pinned by disabling auto-broadcast
    // and asserting the join strategy survives
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(k)
    spark.conf.set(k, "-1")
    try {
      val docs = Seq((1L, "a b c"), (2L, "c d")).toDF("doc_id", "text")
      val plan = TextStats.lmScoreHashed(docs, "doc_id", "text")
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") ||
        plan.contains("BroadcastNestedLoopJoin"))
      assert(!plan.contains("SortMergeJoin"))
    } finally spark.conf.set(k, prev)
  }

  test("lmScoreBigram: seen bigrams use context counts, unseen back off, OOV drops") {
    // frozen LM corpus: bigrams (a,b)x2, (b,a), (a,c); ctx a=3, b=1;
    // unigrams a=3, b=2, c=1, N=6
    val frozen = Seq((100L, "a b a b a c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"),     // seen: lp = log2(2/3)
      (2L, "b c"),     // unseen bigram, c in vocab: lp = log2(0.4 * 1/6)
      (3L, "a zz"),    // continuation OOV -> dropped -> 0 scored, null h
      (4L, "solo"))    // no bigram at all -> kept with n_bigrams 0
      .toDF("doc_id", "text")
    val r = TextStats.lmScoreBigram(docs, "doc_id", "text", frozen)
      .orderBy("doc_id").collect()
    assert(r.length === 4)
    assert(r(0).getAs[Long]("n_bigrams") === 1L)
    assert(r(0).getAs[Double]("cross_entropy") ===
      math.rint(-math.log(2.0 / 3) / math.log(2) * 1e6) / 1e6)
    assert(r(1).getAs[Long]("n_bigrams") === 1L)
    assert(r(1).getAs[Double]("cross_entropy") ===
      math.rint(-math.log(0.4 / 6) / math.log(2) * 1e6) / 1e6)
    assert(r(2).getAs[Long]("n_bigrams") === 0L)
    assert(r(2).isNullAt(r(2).fieldIndex("perplexity")))
    assert(r(3).getAs[Long]("n_bigrams") === 0L)
  }

  test("gopherFilter: per-rule metrics and the composite keep flag") {
    val good = (Seq("the", "of") ++ Seq.fill(58)("word")).mkString(" ")
    val short = "the of tiny doc"
    val numeric = (Seq("the", "of") ++ Seq.fill(58)("12345")).mkString(" ")
    val df = Seq((1L, good), (2L, short), (3L, numeric)).toDF("doc_id", "text")
    val r = TextStats.gopherFilter(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_words") === 60L)
    assert(r(0).getAs[Long]("n_stop") === 2L)
    assert(r(0).getAs[Double]("alpha_frac") === 1.0)
    assert(r(0).getAs[Boolean]("keep"))
    // 4 words < 50 fails the length rule despite both stopwords
    assert(r(1).getAs[Long]("n_words") === 4L && !r(1).getAs[Boolean]("keep"))
    // 58/60 digit-only words -> alpha_frac 2/60 fails the 80% rule
    assert(math.abs(r(2).getAs[Double]("alpha_frac") - 2.0 / 60) < 1e-6)
    assert(!r(2).getAs[Boolean]("keep"))
  }

  test("fingerprint is whitespace/case-insensitive") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other")).toDF("doc_id", "text")
    val fp = TextStats.fingerprint(df, "text", "fp").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp")).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary payload plumbing: typed records round-trip with byte-exact sizes") {
    val df = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(Multimodal.records(spark, df))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes === 3)
    assert(math.abs(feats(1L).byte_mean - ('a' + 'b' + 'c') / 3.0) < 1e-6)
    assert(feats(2L).n_bytes === 0)
    assert(feats(2L).byte_mean === 0.0) // empty payload guard
  }

  test("image decode: real ImageIO round-trip recovers dims, bands, and pixels") {
    val df = Seq((0L, "x"), (7L, "y"), (123L, "z")).toDF("doc_id", "text")
    val recs = Multimodal.attachImages(spark, df)
    val feats = Multimodal.decodeImages(recs)
      .collect().map(f => f.doc_id -> f).toMap
    for (id <- Seq(0L, 7L, 123L)) {
      val (w, h) = Multimodal.fixtureDims(id)
      assert(feats(id).decoded)
      assert(feats(id).width === Some(w))
      assert(feats(id).height === Some(h))
      assert(feats(id).channels === Some(3)) // TYPE_INT_RGB
    }
    // PNG is lossless: every pixel of a decoded payload matches the
    // deterministic fixture function bit-for-bit
    val payload = recs.filter(_.doc_id == 123L).collect().head.payload
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    val (w, h) = Multimodal.fixtureDims(123L)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) & 0xffffff) === Multimodal.fixturePixel(123L, x, y),
        s"pixel ($x,$y)")
  }

  test("image decode: an undecodable payload degrades to decoded=false, not a crash") {
    val junk = Seq(MediaRecord(9L, Array[Byte](1, 2, 3, 4), "image/png", 4))
      .toDS()
    val f = Multimodal.decodeImages(junk).collect().head
    assert(!f.decoded)
    assert(f.width === None && f.height === None && f.channels === None)
  }
}

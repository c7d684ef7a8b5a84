package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurateSpec extends SparkSpec {
  import spark.implicits._

  test("chunkOverlapping: sliding token windows, overlap carried, tail short, empty doc dropped") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens; chunk 5, overlap 2 → starts 0,3,6
      (2L, "x y"), // shorter than one chunk → exactly one
      (3L, " ")) // no tokens after the filter → no chunks
      .toDF("doc_id", "text")
    val out = Curate.chunkOverlapping(d, "doc_id", "text",
        chunkTokens = 5, overlap = 2)
      .orderBy("doc_id", "chunk_idx").collect()
    val c1 = out.filter(_.getLong(0) == 1L)
    assert(c1.map(_.getString(2)).toSeq ===
      Seq("a b c d e", "d e f g h", "g h i j"))
    assert(c1.map(_.getLong(3)).toSeq === Seq(5L, 5L, 4L))
    // consecutive chunks share exactly `overlap` tokens — the no-lost-
    // boundary property the op exists for
    c1.sliding(2).foreach { case Array(p, n) =>
      assert(p.getString(2).split(" ").takeRight(2).toSeq ===
        n.getString(2).split(" ").take(2).toSeq)
    }
    val c2 = out.filter(_.getLong(0) == 2L)
    assert(c2.map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSeq ===
      Seq((0L, "x y", 2L)))
    assert(!out.exists(_.getLong(0) == 3L))
    assertThrows[IllegalArgumentException](
      Curate.chunkOverlapping(d, "doc_id", "text", 5, 5))
    assertThrows[IllegalArgumentException](
      Curate.chunkOverlapping(d, "doc_id", "text", 0, 0))
  }

  test("assignSplits is deterministic, complete, and roughly proportional") {
    val ids = (0L until 2000L).toDF("id")
    val splits = Seq(("train", 0.75), ("val", 0.125), ("test", 0.125))
    val a = Curate.assignSplits(ids, "id", "v1", splits)
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test")) // all splits hit
    assert(counts.values.sum === 2000L)                   // total partition
    // proportions within a loose binomial envelope
    assert(math.abs(counts("train") - 1500.0) < 120, counts)
    assert(math.abs(counts("val") - 250.0) < 80, counts)
    // identical on a rerun (no rand() anywhere)
    val b = Curate.assignSplits(ids, "id", "v1", splits)
    assert(a.orderBy("id").collect().toSeq === b.orderBy("id").collect().toSeq)
    // a different salt re-draws: some assignments must move
    val c = Curate.assignSplits(ids, "id", "v2", splits)
    assert(a.join(c, "id").filter(a("split") =!= c("split")).count() > 0)
  }

  test("assignSplits rejects weights that do not sum to 1") {
    val e = intercept[IllegalArgumentException] {
      Curate.assignSplits(Seq(1L).toDF("id"), "id", "s",
        Seq(("a", 0.5), ("b", 0.3)))
    }
    assert(e.getMessage.contains("sum to 1"))
  }

  test("a NULL key fails loudly in splits and samples alike") {
    // without the guard, assignSplits would silently route null keys to
    // the LAST split while sampleByHash silently dropped them
    val rows = Seq(Option(1L), None).toDF("id")
    def deepMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
    val e1 = intercept[Throwable] {
      Curate.assignSplits(rows, "id", "s",
        Seq(("train", 0.5), ("test", 0.5))).collect()
    }
    assert(deepMsg(e1).contains("NULL key"))
    val e2 = intercept[Throwable] {
      Curate.sampleByHash(rows, "id", "s", 0.5).collect()
    }
    assert(deepMsg(e2).contains("NULL key"))
  }

  test("sampleByHash keeps a stable subset of about the requested fraction") {
    val ids = (0L until 2000L).toDF("id")
    val s1 = Curate.sampleByHash(ids, "id", "s", 0.25)
    val n = s1.count()
    assert(math.abs(n - 500.0) < 90, n)
    // subset property: sampling at a larger fraction strictly grows the set
    val s2 = Curate.sampleByHash(ids, "id", "s", 0.5)
    assert(s1.except(s2).count() === 0) // nested samples, same salt
  }

  test("sampleStratified applies per-stratum fractions and drops unbudgeted strata") {
    val rows = (0L until 3000L).map(i =>
      (i, Seq("en", "es", "xx")((i % 3).toInt))).toDF("id", "lang")
    val s = Curate.sampleStratified(rows, "id", "lang", "t",
      Seq("en" -> 0.5, "es" -> 0.125))
    val counts = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("xx"))                       // unbudgeted: dropped
    assert(math.abs(counts("en") - 500.0) < 90, counts)  // 1000 × 0.5
    assert(math.abs(counts("es") - 125.0) < 60, counts)  // 1000 × 0.125
    // deterministic rerun
    assert(s.count() === Curate.sampleStratified(rows, "id", "lang", "t",
      Seq("en" -> 0.5, "es" -> 0.125)).count())
  }

  test("mixFractions: target shares, the cap, and unbudgeted groups at 0") {
    val ten = Seq.fill(10)("t").mkString(" ") // 10 tokens
    val docs = Seq((1L, "a", ten), (2L, "a", ten), (3L, "b", ten),
      (4L, "c", ten)).toDF("id", "grp", "text")
    val fr = Curate.mixFractions(docs, "grp", "text",
        Seq("a" -> 0.75, "b" -> 0.25), budgetTokens = 16L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("avail_tokens"), r.getAs[Double]("fraction"))).toMap
    assert(fr("a") === ((20L, 0.6)))  // 12 of 20 available tokens
    assert(fr("b") === ((10L, 0.4)))  // 4 of 10
    assert(fr("c")._2 === 0.0)        // outside the recipe
    // an over-asked group caps at 1.0 (cannot sample more than it has)
    val capped = Curate.mixFractions(docs, "grp", "text",
        Seq("a" -> 0.75, "b" -> 0.25), budgetTokens = 100L)
      .filter(col("grp") === "a").collect().head.getAs[Double]("fraction")
    assert(capped === 1.0)
  }

  test("mixSample applies the per-group fractions deterministically") {
    val ten = Seq.fill(10)("t").mkString(" ")
    val docs = (0L until 300L).map(i =>
      (i, if (i % 3 == 0) "a" else "b", ten)).toDF("id", "grp", "text")
    // budget huge for a (fraction 1.0), none for b beyond its 25% share
    val s = Curate.mixSample(docs, "id", "grp", "text", "m",
      Seq("a" -> 0.75, "b" -> 0.25), budgetTokens = 2000L)
    val counts = s.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") === 100L) // fraction capped at 1.0: all of group a
    // b: fraction = 500/2000 = 0.25 of 200 docs ≈ 50, binomial envelope
    assert(math.abs(counts("b") - 50.0) < 30, counts)
    // deterministic rerun selects the identical set
    val again = Curate.mixSample(docs, "id", "grp", "text", "m",
      Seq("a" -> 0.75, "b" -> 0.25), budgetTokens = 2000L)
    assert(s.select("id").except(again.select("id")).count() === 0)
    assert(s.count() === again.count())
  }

  test("redactPii counts and redacts emails, IPv4s and phone numbers") {
    val docs = Seq(
      (1L, "contact alice@example.com or bob.smith+x@sub.domain.org today"),
      (2L, "server at 192.168.0.1 and 10.0.0.255 responded"),
      (3L, "call +1 (555) 123-4567 now"),
      (4L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val r = Curate.redactPii(docs, "text", "red")
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("n_emails") === 2)
    assert(r(0).getAs[String]("red") === "contact <EMAIL> or <EMAIL> today")
    assert(r(1).getAs[Int]("n_ips") === 2)
    assert(r(1).getAs[String]("red") === "server at <IP> and <IP> responded")
    assert(r(2).getAs[Int]("n_phones") === 1)
    assert(r(2).getAs[String]("red") === "call <PHONE> now")
    assert(r(3).getAs[Int]("n_emails") + r(3).getAs[Int]("n_ips")
      + r(3).getAs[Int]("n_phones") === 0)
    assert(r(3).getAs[String]("red") === "nothing sensitive here at all")
  }

  test("repetitionScore: degenerate repetition scores high, varied text low") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),   // 6 tokens, 1 distinct
      (2L, "all six tokens here are unique"),  // 6 tokens, 6 distinct
      (3L, "one")                              // single token: no 2-grams
    ).toDF("doc_id", "text")
    val r = TextStats.repetitionScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_distinct_tokens") === 1L)
    // 5 total 2-grams, 1 distinct ("spam spam") -> dup ratio 0.8
    assert(r(0).getAs[Double]("dup_2gram_ratio") === 0.8)
    assert(r(1).getAs[Double]("distinct_ratio") === 1.0)
    assert(r(1).getAs[Double]("dup_2gram_ratio") === 0.0)
    assert(r(2).isNullAt(r(2).fieldIndex("dup_2gram_ratio")))
  }

  test("curateFull: dup and rule-failing docs drop before packing") {
    val body = (Seq.fill(59)("the") :+ "end").mkString(" ")
    val docs = Seq(
      (1L, body),
      (2L, body),       // exact dup: window-min keeps doc 1
      (3L, "tiny doc")  // fails the 50-word rule
    ).toDF("doc_id", "text")
    val r = Curate.curateFull(docs, "doc_id", "text", "v1",
        Seq(("train", 0.75), ("val", 0.125), ("test", 0.125)),
        budgetTokens = 2048L, minStopwords = 1)
      .collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L))
    assert(r.head.getAs[Long]("start_tok") === 0L)
    assert(r.head.getAs[Long]("n_tokens") === 60L)
  }

  test("packSequences: concat-and-chunk offsets, shard-local, budget boundary") {
    // shard A token stream: 3 + 4 + 3 docs against a budget of 5:
    // starts 0, 3, 7 -> packs 0, 0, 1; shard B restarts at 0
    val docs = Seq(
      (1L, "a", "x x x"),
      (2L, "a", "x x x x"),
      (3L, "a", "x x x"),
      (9L, "b", "y y y y y y")
    ).toDF("doc_id", "src", "text")
    val r = Curate.packSequences(docs, "doc_id", "text", "src", 5L)
      .orderBy("doc_id").collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("start_tok"),
        x.getAs[Long]("pack_id")))
    assert(r.toSeq === Seq((1L, 0L, 0L), (2L, 3L, 0L), (3L, 7L, 1L),
      (9L, 0L, 0L)))
  }

  test("packSequences gives tied ids distinct offsets (ROWS, not RANGE peers)") {
    val tied = Seq((1L, "a", "x x x"), (1L, "a", "x x x"))
      .toDF("doc_id", "src", "text")
    val starts = Curate.packSequences(tied, "doc_id", "text", "src", 5L)
      .select("start_tok").as[Long].collect().sorted.toSeq
    // the default RANGE frame would hand BOTH peers start 3
    assert(starts === Seq(0L, 3L))
  }

  test("curriculumBins: quantile bins without a global sort window") {
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "score")
    val bins = Curate.curriculumBins(df, "id", "score", nBins = 2)
      .orderBy("id").collect().map(_.getAs[Int]("bin")).toSeq
    // median of 1..10 is 5.5: scores 1-5 → bin 1, 6-10 → bin 2
    assert(bins === Seq(1, 1, 1, 1, 1, 2, 2, 2, 2, 2))
    val deciles = Curate.curriculumBins(df, "id", "score", nBins = 10)
      .orderBy("id").collect().map(_.getAs[Int]("bin")).toSeq
    // 10 distinct scores over 10 bins: interior boundaries interpolate
    // strictly between adjacent scores, one score per bin
    assert(deciles === (1 to 10).toSeq)
    // the plan must not contain a single-partition global sort window
    val plan = Curate.curriculumBins(df, "id", "score", nBins = 10)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("dsirWeights: target-like raw docs outrank alien ones; hand-checked") {
    val target = Seq((100L, "apple banana"), (101L, "apple cherry"))
      .toDF("doc_id", "text")
    val raw = Seq((1L, "apple banana"), (2L, "zebra quokka"))
      .toDF("doc_id", "text")
    val w = Curate.dsirWeights(raw, target, "doc_id", "text",
        nBuckets = 64, salt = "t")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // unigrams + bigrams of a 2-token doc = 3 feature occurrences
    assert(w(1L)._1 === 3L)
    assert(w(2L)._1 === 3L)
    // the doc sharing the target's vocabulary imports more likelihood
    assert(w(1L)._2 > w(2L)._2)

    // independent driver-side recomputation of the whole pipeline
    def bucket(g: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((g + "|t").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 64
    }
    def feats(text: String): Seq[Long] = {
      val t = text.split(" ").toSeq
      (t ++ t.sliding(2).filter(_.length == 2).map(_.mkString(" ")))
        .map(bucket)
    }
    val tf = Seq("apple banana", "apple cherry").flatMap(feats)
    val rf = Seq("apple banana", "zebra quokka").flatMap(feats)
    val tc = tf.groupBy(identity).view.mapValues(_.size).toMap
    val rc = rf.groupBy(identity).view.mapValues(_.size).toMap
    def logw(text: String): Double = feats(text).map(b =>
      math.log((tc.getOrElse(b, 0) + 1) / (tf.size.toDouble + 64))
        - math.log((rc(b) + 1) / (rf.size.toDouble + 64))).sum
    assert(math.abs(w(1L)._2 - logw("apple banana")) < 1e-5)
    assert(math.abs(w(2L)._2 - logw("zebra quokka")) < 1e-5)
  }

  test("dsirSample: deterministic Gumbel top-k, a without-replacement subset of raw") {
    val target = Seq((100L, "apple banana apple")).toDF("doc_id", "text")
    val raw = (1L to 20L).map(i =>
        (i, if (i % 3 == 0) "apple banana fruit" else s"noise$i words here"))
      .toDF("doc_id", "text")
    def draw() = Curate.dsirSample(raw, target, "doc_id", "text",
      k = 5, nBuckets = 64, salt = "t").collect()
    val s1 = draw()
    assert(s1.length === 5)
    assert(s1.map(_.getLong(0)).distinct.length === 5) // no replacement
    // keys descend, ties impossible at distinct md5 draws
    val keys = s1.map(_.getAs[Double]("gumbel_key")).toSeq
    assert(keys === keys.sorted.reverse)
    // fully deterministic: the same call selects the same set in order
    assert(draw().map(_.getLong(0)).toSeq === s1.map(_.getLong(0)).toSeq)
  }

  test("sampleExactN: exact quotas, superset on n growth, small strata kept whole") {
    val rows = (0L until 300L).map(i => (i, s"g${i % 3}")) ++
      Seq((1000L, "tiny"), (1001L, "tiny")) // stratum under n
    val df = rows.toDF("id", "g")
    val s10 = Curate.sampleExactN(df, "id", "g", n = 10, salt = "q")
      .select("id", "g").collect().map(r => (r.getLong(0), r.getString(1)))
    val by = s10.groupBy(_._2).view.mapValues(_.length).toMap
    assert(by === Map("g0" -> 10, "g1" -> 10, "g2" -> 10, "tiny" -> 2))
    // deterministic across reruns
    val again = Curate.sampleExactN(df, "id", "g", n = 10, salt = "q")
      .select("id", "g").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(again.sortBy(_._1).toSeq === s10.sortBy(_._1).toSeq)
    // superset: n=20 contains every n=10 winner (draw order is fixed)
    val s20 = Curate.sampleExactN(df, "id", "g", n = 20, salt = "q")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s10.map(_._1).toSet.subsetOf(s20))
    // a different salt re-draws
    val alt = Curate.sampleExactN(df, "id", "g", n = 10, salt = "q2")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(alt !== s10.map(_._1).toSet)
    assert(intercept[IllegalArgumentException] {
      Curate.sampleExactN(df, "id", "g", n = 0, salt = "q")
    }.getMessage.contains("positive"))
  }

  test("dropBoilerplate strips hot lines, keeps order, handles edge docs") {
    val docs = Seq(
      (1L, "intro A\nSUBSCRIBE NOW\nbody one"),
      (2L, "other text\nSUBSCRIBE NOW\nbody two"),
      (3L, "SUBSCRIBE NOW\n\nSUBSCRIBE NOW"),
      (4L, "unique only"),
      (5L, "")).toDF("doc_id", "text")
    val out = Curate.dropBoilerplate(docs, "doc_id", "text",
        minDocs = 3L, out = "clean").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
    // "SUBSCRIBE NOW" is in 3 docs -> boilerplate at minDocs=3
    assert(out(1L) === ((3L, 1L, Some("intro A\nbody one"))))
    assert(out(2L) === ((3L, 1L, Some("other text\nbody two"))))
    // both INSTANCES in doc 3 drop (blank line never counted); "" result
    assert(out(3L) === ((2L, 2L, Some(""))))
    assert(out(4L) === ((1L, 0L, Some("unique only"))))
    // an empty doc survives the pipeline with nothing counted
    assert(out(5L) === ((0L, 0L, None)))
  }

  test("dropBoilerplate chunk mode segments the token stream; empty text safe") {
    val docs = Seq(
      (1L, "a b c d e"),   // segs: "a b c", "d e"
      (2L, "a b c x y z"), // segs: "a b c", "x y z"
      (3L, "")).toDF("doc_id", "text")
    val out = Curate.dropBoilerplate(docs, "doc_id", "text",
        minDocs = 2L, out = "clean", chunkTokens = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
    assert(out(1L) === ((2L, 1L, Some("d e"))))
    assert(out(2L) === ((2L, 1L, Some("x y z"))))
    // nSeg = 0 guard: no descending-sequence blowup on an empty doc
    assert(out(3L) === ((0L, 0L, None)))
  }

  test("dropBoilerplateWith: frozen-index stream form matches the batch op; runs on a real stream") {
    val docs = Seq(
      (1L, "intro A\nSUBSCRIBE NOW\nbody one"),
      (2L, "other text\nSUBSCRIBE NOW\nbody two"),
      (3L, "SUBSCRIBE NOW\n\nSUBSCRIBE NOW"),
      (4L, "unique only"),
      (5L, "")).toDF("doc_id", "text")
    val hot = Curate.boilerplateIndex(docs, "doc_id", "text", minDocs = 3L)
      .collect().map(_.getLong(0)).toSeq
    assert(hot.length === 1) // exactly the SUBSCRIBE NOW line
    // parity: the stateless per-row form ≡ the batch two-shuffle form
    val batch = Curate.dropBoilerplate(docs, "doc_id", "text",
        minDocs = 3L, out = "clean")
      .select("doc_id", "n_segs", "n_boiler", "clean")
    val streamForm = Curate.dropBoilerplateWith(docs, "doc_id", "text",
        hot, out = "clean")
      .select("doc_id", "n_segs", "n_boiler", "clean")
    assert(batch.exceptAll(streamForm).isEmpty
      && streamForm.exceptAll(batch).isEmpty,
      streamForm.orderBy("doc_id").collect().mkString("\n"))
    // and it genuinely runs on an unbounded stream — no state, no
    // watermark, append mode
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = Curate.dropBoilerplateWith(mem.toDF().toDF("doc_id", "text"),
        "doc_id", "text", hot, out = "clean")
      .writeStream.format("memory").queryName("boiler_stream")
      .outputMode("append").start()
    try {
      mem.addData((10L, "fresh words\nSUBSCRIBE NOW"), (11L, "all new"))
      q.processAllAvailable()
      val got = spark.table("boiler_stream")
        .select("doc_id", "n_boiler", "clean").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got === Set((10L, 1L, "fresh words"), (11L, 0L, "all new")))
    } finally q.stop()
    // the literal-size guard fails loudly
    assert(intercept[IllegalArgumentException] {
      Curate.dropBoilerplateWith(docs, "doc_id", "text",
        (1L to 20L).toSeq, out = "c", maxIndex = 10)
    }.getMessage.contains("maxIndex"))
  }

  test("dropBoilerplate plan: ONE corpus scan, TWO exchanges, no join") {
    // the r11 self-review found the first cut ran THREE scans and FOUR
    // exchanges (groupBy + join + resurrect-join); the lag-flag windowed
    // rewrite is pinned here so the plan can't regress
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Curate.dropBoilerplate(docs, "doc_id", "text", 2L, "clean",
      chunkTokens = 3)
    out.collect() // finalize the adaptive plan
    val finalPlan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val nScans = "FileScan parquet".r.findAllIn(finalPlan).length
    assert(nScans === 1, s"$nScans scans:\n$finalPlan")
    val nEx = "Exchange hashpartitioning".r.findAllIn(finalPlan).length
    assert(nEx === 2, s"$nEx exchanges:\n$finalPlan")
    assert(!finalPlan.contains("Join"), finalPlan)
  }

  test("dropBoilerplate rejects a degenerate minDocs") {
    val e = intercept[IllegalArgumentException] {
      Curate.dropBoilerplate(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", minDocs = 1L, out = "clean")
    }
    assert(e.getMessage.contains("minDocs"))
  }

  test("near-dup generator policy: the tuner verdict picks minhash on this corpus at 0.95 recall") {
    // r14's tuneMaxDist proved simhash banding tops out at ~0.75 recall
    // on the documents corpus (the hamming<=3 completeness bound); the
    // policy must therefore pick minhash for a 0.95 target — the honest
    // artifact as an executable decision, not a footnote
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val plan = graft.ext.Dedup.chooseNearDupGenerator(
      docs, "doc_id", "text", k = 5, targetRecall = 0.95)
    assert(plan.generator === "minhash",
      s"picked ${plan.generator} with banding bound ${plan.bandingRecallBound}")
    assert(plan.bandingRecallBound < 0.95)
    assert(plan.tunedMaxDist.isEmpty)
    // the chosen generator's candidates are the standard pair frame the
    // resolution stages consume
    assert(plan.candidates.columns.toSeq.take(2) === Seq("d1", "d2"))
    assert(plan.candidates.count() > 0)

    // a target UNDER the measured bound flips the choice to the tuned
    // simhash radius — banding is the cheaper generator when it suffices
    val cheap = graft.ext.Dedup.chooseNearDupGenerator(
      docs, "doc_id", "text", k = 5,
      targetRecall = math.max(0.05, plan.bandingRecallBound / 2))
    assert(cheap.generator === "simhash")
    assert(cheap.tunedMaxDist.nonEmpty && cheap.tunedMaxDist.get <= 3)
  }

  test("weightedSystematicSample: sum of copies = m exactly; heavy rows multi-selected; deterministic") {
    // 200 rows of weight 1..200; one whale of weight 10000 (> W/m stride)
    val rows = (1L to 200L).map(i => (i, i)) :+ (999L, 10000L)
    val df = rows.toDF("id", "w")
    val out = Curate.weightedSystematicSample(df, "id", "w", "s1",
      m = 40, nParts = 4).collect()
    val total = rows.map(_._2).sum // 20100 + 10000 = 30100
    assert(out.map(_.getLong(2)).sum === 40L)
    // the whale holds w·m/W ≈ 13.3 stride points → 13 or 14 copies
    val whale = out.find(_.getLong(0) === 999L).get.getLong(2)
    assert(whale >= 10000L * 40 / total && whale <= 10000L * 40 / total + 1)
    // inclusion ∝ weight: nothing below its guaranteed floor, nothing above ceil
    for (r <- out) {
      val w = r.getLong(1)
      assert(r.getLong(2) >= w * 40 / total)
      assert(r.getLong(2) <= w * 40 / total + 1)
    }
    // deterministic: a re-run with different partitioning is identical
    val out2 = Curate.weightedSystematicSample(df, "id", "w", "s1",
      m = 40, nParts = 7).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq ===
      out2.map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq)
    // a different salt draws a different order (selection can differ)
    val out3 = Curate.weightedSystematicSample(df, "id", "w", "s2",
      m = 40, nParts = 4).collect()
    assert(out3.map(_.getLong(2)).sum === 40L)
  }

  test("weightedSystematicSample: null or non-positive weight fails loudly") {
    val df = Seq((1L, 5L), (2L, 0L)).toDF("id", "w")
    val ex = intercept[Exception] {
      Curate.weightedSystematicSample(df, "id", "w", "s1", m = 2,
        nParts = 2).collect()
    }
    def hits(t: Throwable): Boolean = t != null &&
      (t.getMessage != null && t.getMessage.contains("non-integral") ||
        hits(t.getCause))
    assert(hits(ex))
  }

  test("weightedSystematicSample: fractional weight refused, not truncated") {
    // 0.6 would cast to 0 (silent drop) and 1.9 to 1 (halved mass) —
    // the contract refuses both instead of skewing the mixture
    val df = Seq((1L, 0.6), (2L, 1.9), (3L, 4.0)).toDF("id", "w")
    val ex = intercept[Exception] {
      Curate.weightedSystematicSample(df, "id", "w", "s1", m = 2,
        nParts = 2).collect()
    }
    def hits(t: Throwable): Boolean = t != null &&
      (t.getMessage != null && t.getMessage.contains("non-integral") ||
        hits(t.getCause))
    assert(hits(ex))
    // integer-valued doubles still pass the integrality guard
    val ok = Curate.weightedSystematicSample(
      Seq((1L, 2.0), (2L, 3.0)).toDF("id", "w"), "id", "w", "s1",
      m = 5, nParts = 2).collect()
    assert(ok.map(_.getLong(2)).sum === 5L)
  }
}

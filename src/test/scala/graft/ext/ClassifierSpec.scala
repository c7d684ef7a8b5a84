package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("textFeatures: exact counts on known documents") {
    val d = Seq(
      (1L, "the cat sat on a mat"), // 6 tokens, 2 stopwords, 15 chars
      (2L, "x")) // 1 token, 0 stopwords
      .toDF("doc_id", "text")
    val out = Classifier.textFeatures(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 6L)
    assert(out(0).getDouble(2) === 0.06) // least(1, 6/100)
    assert(math.abs(out(0).getDouble(3) - 15.0 / 6 / 10) < 1e-12)
    assert(math.abs(out(0).getDouble(4) - 2.0 / 6) < 1e-12)
    assert(out(1).getLong(1) === 1L)
    assert(out(1).getDouble(4) === 0.0)
  }

  test("gradientStep from zero weights: sigmoid is exactly 0.5, gradient closed-form") {
    // two rows, one feature: x = 1 with y = 1, x = 3 with y = 0
    // grad_b = avg(0.5 - y) = ((-0.5) + 0.5)/2 = 0
    // grad_w = avg((0.5 - y) * x) = ((-0.5)(1) + (0.5)(3))/2 = 0.5
    val d = Seq((1.0, 1), (3.0, 0)).toDF("f", "y")
    val (b, w) = Classifier.gradientStep(d, Seq("f"), "y", 0.0, Seq(0.0), 1.0)
    assert(b === 0.0)
    assert(w === Seq(-0.5))
    assertThrows[IllegalArgumentException](
      Classifier.gradientStep(d, Seq("f"), "y", 0.0, Seq(0.0, 0.0), 1.0))
    assertThrows[IllegalArgumentException](
      Classifier.gradientStep(d.limit(0), Seq("f"), "y", 0.0, Seq(0.0), 1.0))
  }

  test("train converges on linearly separable data and is deterministic") {
    // y = 1 iff f1 > 0.5; margin 0.2 either side
    val d = ((0 until 50).map(i => (0.8 + (i % 10) * 0.01, 1)) ++
      (0 until 50).map(i => (0.2 - (i % 10) * 0.01, 0)))
      .toDF("f1", "y").cache()
    val (b, w) = Classifier.train(d, Seq("f1"), "y", iters = 200, lr = 2.0)
    val ev = Classifier.evaluate(d, Seq("f1"), "y", b, w).head()
    assert(ev.getLong(0) === 100L)
    assert(ev.getDouble(2) === 1.0, s"accuracy ${ev.getDouble(2)}")
    // loss strictly better than the zero model (ln 2)
    assert(ev.getDouble(1) < 0.2)
    val (b2, w2) = Classifier.train(d, Seq("f1"), "y", iters = 200, lr = 2.0)
    assert(math.abs(b - b2) < 1e-9 && math.abs(w.head - w2.head) < 1e-9)
    d.unpersist()
  }

  test("distillation: learned filter approximates the product heuristic on text") {
    // documents-shaped corpus: variable length and stopword density so the
    // heuristic label y = f_len * (1 - f_stop) > 0.5 is non-degenerate
    val docs = (0 until 200).map { i =>
      val n = 20 + (i * 7) % 160 // 20..179 tokens
      val stopEvery = 3 + i % 9
      val toks = (0 until n).map(j =>
        if (j % stopEvery == 0) "the" else s"w${(i + j) % 50}")
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val feats = Classifier.textFeatures(docs, "doc_id", "text")
      .withColumn("y", Classifier.heuristicLabel(0.5)).cache()
    val nPos = feats.filter(col("y") === 1).count()
    assert(nPos > 40 && nPos < 160, s"degenerate labels: $nPos/200 positive")
    val cols = Seq("f_len", "f_wlen", "f_stop")
    val (b, w) = Classifier.train(feats, cols, "y", iters = 300, lr = 5.0)
    val ev = Classifier.evaluate(feats, cols, "y", b, w).head()
    assert(ev.getDouble(2) >= 0.9,
      s"distilled accuracy ${ev.getDouble(2)} < 0.9 (b=$b w=$w)")
    // scoring pass agrees with the unrounded decision rule except on
    // rows the 6-decimal score rounding puts ON the 0.5 boundary
    val scored = Classifier.scoreWith(feats, cols, b, w, "score")
      .withColumn("p_raw",
        Classifier.logisticScore(b, cols.zip(w)))
    val disagree = scored
      .filter(col("score_keep") =!= (col("p_raw") >= 0.5)).collect()
    assert(disagree.forall(r =>
        math.abs(r.getAs[Double]("p_raw") - 0.5) < 5e-7),
      s"non-boundary keep disagreement: ${disagree.mkString(";")}")
    assert(disagree.length <= 10)
    feats.unpersist()
  }

  test("frozen serving weights reproduce training on the sf0.001 documents table") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
    val feats = Classifier.textFeatures(docs, "doc_id", "text")
      .withColumn("y", Classifier.heuristicLabel(0.5)).cache()
    val cols = Seq("f_len", "f_wlen", "f_stop")
    val (b, w) = Classifier.train(feats, cols, "y",
      graft.SparkEntry.QualityClassifierIters,
      graft.SparkEntry.QualityClassifierLr)
    // the frozen table is the sf0.001 run rounded to 6 decimals; retrain
    // must land within the rounding radius or the freeze is stale
    val frozen = graft.SparkEntry.QualityClassifierWeights
    assert(math.abs(b - frozen.head) < 1e-5,
      s"stale frozen bias: trained $b vs frozen ${frozen.head}")
    cols.indices.foreach { i =>
      assert(math.abs(w(i) - frozen(i + 1)) < 1e-5,
        s"stale frozen w$i: trained ${w(i)} vs frozen ${frozen(i + 1)}")
    }
    // the frozen model actually separates: accuracy well above the prior
    val ev = Classifier.evaluate(feats, cols, "y", frozen.head, frozen.tail)
      .head()
    assert(ev.getDouble(2) >= 0.85,
      s"frozen-weight accuracy ${ev.getDouble(2)} < 0.85")
    feats.unpersist()
  }

  test("corpusDivergence: identical corpora give zero KL; disjoint give positive") {
    val a = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val same = TextStats.corpusDivergence(a, a, "text").head()
    assert(same.getLong(0) === 3L) // union vocab
    assert(same.getLong(1) === 3L) // shared
    assert(same.getDouble(6) === 0.0)
    val b = Seq((3L, "x y z x")).toDF("doc_id", "text")
    val dis = TextStats.corpusDivergence(a, b, "text").head()
    assert(dis.getLong(0) === 6L && dis.getLong(1) === 0L)
    assert(dis.getLong(2) === 5L && dis.getLong(3) === 4L)
    assert(dis.getDouble(6) > 0.0)
  }

  test("divergenceTopK: over-represented token leads, smoothing keeps absent tokens finite") {
    val a = Seq((1L, "hot hot hot hot common")).toDF("doc_id", "text")
    val b = Seq((2L, "common common cold")).toDF("doc_id", "text")
    val top = TextStats.divergenceTopK(a, b, "text", 10).collect()
    assert(top.head.getString(0) === "hot") // biggest positive contribution
    val cold = top.find(_.getString(0) == "cold").get
    assert(cold.getLong(1) === 0L && cold.getLong(2) === 1L)
    // absent-from-A token: p_a is the smoothing floor, term finite & negative
    assert(cold.getDouble(5) < 0.0)
    assert(top.length === 3)
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the learned successor to the
  * hard-rule gates in [[graft.ext.TextStats.gopherFilter]]: a logistic
  * classifier distilled from cheap weak-supervision labels, then applied
  * to the full corpus as a smooth, calibrated score (the
  * fastText-classifier pattern of CCNet / DCLM / FineWeb-Edu pipelines,
  * with the reference's heuristic quality signals as the feature space;
  * quality heuristics themselves mirror `streamlit_dashboard.py`'s
  * text-metric family).
  *
  * Shape at 100 TB, by stage:
  *  - **Features** ([[textFeatures]]): one narrow codegen'd projection —
  *    length arithmetic and bounded array ops per row, no shuffle, no
  *    UDF; every value replays exactly in the DuckDB oracle.
  *  - **Training** ([[train]]): full-batch gradient descent, each step
  *    ONE corpus scan ending in a single (d+1)-component average (map-
  *    side partial combine; d+1 doubles cross the driver per step — the
  *    weight vector is index METADATA, same two-phase posture as
  *    [[graft.ext.Similarity.trainQuantizer]]'s centroids). At real
  *    scale you train on a [[Curate.sampleByHash]] sample: logistic
  *    regression on 100 TB buys nothing over the same model on a
  *    deterministic 0.1 % sample, and the SCORING pass is where the
  *    model earns its keep.
  *  - **Scoring** ([[scoreWith]]): weights baked in as literals — a
  *    narrow whole-stage-codegen projection, zero shuffle at any scale.
  *
  * Determinism: features and labels are exact integer/double arithmetic;
  * training is deterministic given a fixed partitioning up to float
  * summation order (weights pinned to 1e-6 in `ClassifierSpec`); frozen
  * serving weights (the [[graft.SparkEntry]] pattern shared with the
  * frozen BPE merge table) make the scoring pass bit-stable across runs
  * AND engines — the score rounds its logit to 6 decimals BEFORE the
  * sigmoid so both engines exponentiate the identical double.
  */
object Classifier {

  /** The distillation feature space over a documents table: three
    * bounded, engine-portable signals per document —
    * `f_len` (length saturation, `least(1, n_tokens/100)`), `f_wlen`
    * (mean word length / 10) and `f_stop` (stopword density of
    * `stopwords`). One narrow projection; all three are exact
    * integer-count arithmetic over the whitespace tokenization, so the
    * DuckDB oracle replays them bit-identically.
    */
  def textFeatures(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = TextStats.Stopwords): DataFrame = {
    val t = col(textCol)
    val nTok = (length(t) - length(regexp_replace(t, " ", "")) + 1)
      .cast("long")
    val nStop = size(filter(split(t, " "),
      w => w.isInCollection(stopwords))).cast("long")
    df.select(col(idCol),
      nTok.as("n_tokens"),
      least(lit(1.0), nTok / lit(100.0)).as("f_len"),
      (length(regexp_replace(t, " ", "")).cast("double") / nTok / lit(10.0))
        .as("f_wlen"),
      (nStop.cast("double") / nTok).as("f_stop"))
  }

  /** The weak-supervision label the demo distills: the reference-shaped
    * composite heuristic `f_len * (1 - f_stop) > threshold` (exactly
    * [[TextStats.withQuality]]'s unrounded `quality_score`, thresholded).
    * The decision surface is a PRODUCT of features — curved, so a linear
    * model cannot memorize it; the spec pins how well the distillation
    * approximates it. Exact double arithmetic, replays in the oracle.
    */
  def heuristicLabel(threshold: Double = 0.5): Column =
    (col("f_len") * (lit(1.0) - col("f_stop")) > lit(threshold))
      .cast("int")

  /** Logistic score `sigma(bias + w · x)` over feature COLUMNS with
    * driver-resident weights baked in as literals. The logit is rounded
    * to 6 decimals before the sigmoid: `exp` is the one non-rational
    * step in the whole operator, and rounding its input first means any
    * two IEEE engines exponentiate the identical double — the score then
    * differs across engines by at most one ulp of `exp`, absorbed by the
    * caller's 6-decimal output rounding.
    */
  def logisticScore(bias: Double, weights: Seq[(String, Double)]): Column = {
    val z = weights.foldLeft(lit(bias): Column) { case (acc, (c, w)) =>
      acc + col(c) * lit(w)
    }
    lit(1.0) / (lit(1.0) + exp(-round(z, 6)))
  }

  /** One full-batch gradient-descent step on log-loss: returns the
    * updated `(bias, weights)` after `w -= lr * avg((p - y) * x)`. ONE
    * scan — the d+1 gradient components are a single grouped-free
    * average (HashAggregate with map-side partials), so the step costs
    * one job and ships d+1 doubles to the driver regardless of corpus
    * size.
    */
  def gradientStep(df: DataFrame, featureCols: Seq[String],
      labelCol: String, bias: Double, weights: Seq[Double],
      lr: Double): (Double, Seq[Double]) = {
    val row = gradientFrame(df, featureCols, labelCol, bias, weights).head()
    require(!row.isNullAt(1),
      "gradientStep: empty input — cannot train on zero rows")
    val g = (1 to featureCols.length + 1).map(row.getDouble)
    (bias - lr * g.head,
      weights.zip(g.tail).map { case (w, gw) => w - lr * gw })
  }

  /** The full-batch log-loss gradient as a 1-row frame: `n` plus
    * `g_bias` and one `g_<feature>` per feature column (unrounded
    * averages of `(p − y)` and `(p − y)·x`). [[gradientStep]] consumes
    * it; it is also the oracle surface — at zero weights the sigmoid is
    * EXACTLY 0.5 (no transcendental), so a zero-init step replays
    * rationally in any engine.
    */
  def gradientFrame(df: DataFrame, featureCols: Seq[String],
      labelCol: String, bias: Double, weights: Seq[Double]): DataFrame = {
    require(featureCols.length == weights.length,
      s"gradientFrame: ${featureCols.length} features vs ${weights.length} weights")
    val p = logisticScore(bias, featureCols.zip(weights))
    val err = p - col(labelCol).cast("double")
    val aggs = count(lit(1)).as("n") +: avg(err).as("g_bias") +:
      featureCols.map(c => avg(err * col(c)).as(s"g_$c"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Full-batch GD training from zero init: `iters` calls of
    * [[gradientStep]] (each one scan; cache the feature frame for
    * multi-step training, exactly as a k-means caller would).
    */
  def train(df: DataFrame, featureCols: Seq[String], labelCol: String,
      iters: Int, lr: Double): (Double, Seq[Double]) = {
    require(iters >= 0, "train: iters must be non-negative")
    var b = 0.0
    var w = Seq.fill(featureCols.length)(0.0)
    (0 until iters).foreach { _ =>
      val (nb, nw) = gradientStep(df, featureCols, labelCol, b, w, lr)
      b = nb; w = nw
    }
    (b, w)
  }

  /** Model audit for given weights — one row: `n`, mean log-loss and
    * accuracy against `labelCol`. Same one-scan scalar-aggregate shape
    * as the gradient step. Log-loss is clamped at 1e-12 so a saturated
    * score on a mislabeled row reports a large finite loss, not -inf.
    */
  def evaluate(df: DataFrame, featureCols: Seq[String], labelCol: String,
      bias: Double, weights: Seq[Double]): DataFrame = {
    val p = logisticScore(bias, featureCols.zip(weights))
    val y = col(labelCol).cast("double")
    val eps = lit(1e-12)
    df.agg(
      count(lit(1)).as("n"),
      round(avg(-(y * log(greatest(p, eps)) +
        (lit(1.0) - y) * log(greatest(lit(1.0) - p, eps)))), 6)
        .as("log_loss"),
      round(avg(((p >= 0.5) === (y > 0.5)).cast("double")), 6)
        .as("accuracy"))
  }

  /** Corpus scoring with frozen weights: adds `out` = the 6-decimal
    * logistic score and `<out>_keep` = score >= 0.5. Narrow codegen'd
    * projection — the serving pass of the distilled filter.
    */
  def scoreWith(df: DataFrame, featureCols: Seq[String], bias: Double,
      weights: Seq[Double], out: String): DataFrame = {
    require(featureCols.length == weights.length,
      s"scoreWith: ${featureCols.length} features vs ${weights.length} weights")
    val s = round(logisticScore(bias, featureCols.zip(weights)), 6)
    df.withColumn(out, s).withColumn(s"${out}_keep", s >= 0.5)
  }
}

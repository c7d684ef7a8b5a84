package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable quantile/CDF sketch state: a KLL-style compactor hierarchy
  * (Karnin/Lang/Liberty 2016's structure with fixed per-level capacity —
  * the MRL-family baseline the KLL paper refines) over doubles.
  *
  * `levels(h)` holds items of weight 2^h; `levels(0)` is the insert
  * buffer. When a level reaches capacity `k` it compacts: sort, retain
  * the odd leftover (zero error — it keeps its weight), promote every
  * second item of the remaining pairs to the next level at double
  * weight. The parity (`coins(h)`, a deterministic alternating counter)
  * picks which member of each pair survives, so a single compaction
  * perturbs any rank by at most the level weight 2^h.
  *
  * Total weight is conserved exactly (= n), so the deterministic
  * worst-case rank error is Σ_h (compactions at h)·2^h ≤ H·n/(k−1) —
  * a GUARANTEED bound, independent of data order, merge order, and coin
  * quality (unlike the probabilistic KLL bound). [[Kll.errBound]] adds
  * the read-side slack (one max-weight item) and is what the oracled
  * query pins.
  */
case class KllBuf(k: Int, n: Long, minV: Double, maxV: Double,
    coins: Seq[Long], levels: Seq[Seq[Double]])

/** Finished per-group summary: count, exact extremes, structure depth,
  * the guaranteed rank-error bound, and the requested quantiles.
  */
case class KllOut(n: Long, minV: Double, maxV: Double, numLevels: Int,
    errBound: Long, qs: Seq[Double])

/** KLL-style mergeable quantile sketch (X107) — the CDF twin of X69's
  * fixed-range histogram and X76's HLL partials: a CONSTANT-SIZE
  * (≤ ~H·k doubles), LOSSLESSLY-MERGEABLE summary of a value
  * distribution that needs no a-priori range or bin width.
  *
  * Why not `percentile_approx`: Spark's GK sketch answers one
  * aggregation and is gone — its state is not a value you can
  * materialize per partition/day and merge across arbitrary windows.
  * This sketch IS that state (the same partial-merge shape as X69/X76):
  * build one per day at ingest, answer any date-range quantile by
  * merging the partials — never re-scanning the 100 TB of history.
  *
  * Distribution shape: the [[KllQuantiles]] aggregator is a typed
  * `Aggregator` (Spark plans it as a TypedImperativeAggregate — the
  * buffer lives as an object, serialized only at the partial/final
  * shuffle boundary), so per-partition sketches combine map-side and
  * the shuffle moves ≤ ~H·k doubles per group, not rows.
  *
  * Reference anchor: the dashboard's percentile panels
  * (streamlit_dashboard.py:657 describe()-quartiles) recompute from raw
  * rows per refresh; this is the bounded-memory incremental form.
  */
object Kll {

  /** Empty sketch with per-level capacity `k` (≥ 8, even). */
  def empty(k: Int): KllBuf = {
    require(k >= 8 && k % 2 == 0, s"k must be even and >= 8, got $k")
    KllBuf(k, 0L, Double.PositiveInfinity, Double.NegativeInfinity,
      Vector.empty, Vector.empty)
  }

  /** One streaming insert: O(1) amortized, O(k log k) every k-th. */
  def update(b: KllBuf, v: Double): KllBuf = {
    val l0: Seq[Double] =
      if (b.levels.isEmpty) Vector(v) else v +: b.levels.head.toVector
    val lv = if (b.levels.isEmpty) Vector(l0)
      else l0 +: b.levels.toVector.drop(1)
    val cs = if (b.coins.isEmpty) Vector(0L) else b.coins
    compactAll(b.copy(n = b.n + 1, minV = math.min(b.minV, v),
      maxV = math.max(b.maxV, v), coins = cs, levels = lv))
  }

  /** Lossless merge: level-wise concatenation, then re-compaction. The
    * worst-case bound survives ANY merge tree (error accounting is per
    * compaction, and total weight through each level stays ≤ n).
    */
  def merge(a: KllBuf, b: KllBuf): KllBuf = {
    require(a.k == b.k, s"cannot merge sketches of different k: ${a.k} vs ${b.k}")
    val h = math.max(a.levels.length, b.levels.length)
    val lv = Vector.tabulate(h) { i =>
      val x = if (i < a.levels.length) a.levels(i) else Nil
      val y = if (i < b.levels.length) b.levels(i) else Nil
      (x ++ y).toVector: Seq[Double]
    }
    val cs = Vector.tabulate(h) { i =>
      (if (i < a.coins.length) a.coins(i) else 0L) +
        (if (i < b.coins.length) b.coins(i) else 0L)
    }
    compactAll(KllBuf(a.k, a.n + b.n, math.min(a.minV, b.minV),
      math.max(a.maxV, b.maxV), cs, lv))
  }

  @annotation.tailrec
  private def compactAll(b: KllBuf): KllBuf = {
    val h = b.levels.indexWhere(_.size >= b.k)
    if (h < 0) b else compactAll(compactLevel(b, h))
  }

  private def compactLevel(b: KllBuf, h: Int): KllBuf = {
    val sorted = b.levels(h).sorted
    val odd = sorted.length % 2 == 1
    val body = if (odd) sorted.init else sorted
    val leftover: Seq[Double] = if (odd) Vector(sorted.last) else Vector.empty
    val offset = (b.coins(h) % 2).toInt
    val promoted = Vector.tabulate(body.length / 2)(i => body(2 * i + offset))
    val grown = b.levels.length == h + 1
    val lv0 = if (grown) b.levels.toVector :+ (Vector.empty: Seq[Double])
      else b.levels.toVector
    val cs0 = if (grown) b.coins.toVector :+ 0L else b.coins.toVector
    val lv = lv0.updated(h, leftover)
      .updated(h + 1, (lv0(h + 1) ++ promoted).toVector: Seq[Double])
    b.copy(coins = cs0.updated(h, cs0(h) + 1L), levels = lv)
  }

  /** All retained items with their weights, sorted by value. */
  def weighted(b: KllBuf): Seq[(Double, Long)] =
    b.levels.zipWithIndex.flatMap { case (items, h) =>
      items.map(v => (v, 1L << h))
    }.sortBy(_._1)

  /** Estimated rank of `v`: total weight of retained items ≤ v. */
  def rank(b: KllBuf, v: Double): Long =
    b.levels.zipWithIndex.map { case (items, h) =>
      items.count(_ <= v).toLong << h
    }.sum

  /** Quantile read at probability `p`: the retained value whose
    * cumulative weight first reaches rank ceil(p·n) (the lower
    * empirical quantile — exact when no compaction has happened).
    */
  def quantile(b: KllBuf, p: Double): Double = {
    require(p >= 0.0 && p <= 1.0, s"p out of [0,1]: $p")
    if (b.n == 0L) Double.NaN
    else {
      val t = math.max(1L, math.ceil(p * b.n).toLong)
      var cum = 0L
      val it = weighted(b).iterator
      var res = b.maxV
      var found = false
      while (it.hasNext && !found) {
        val (v, w) = it.next()
        cum += w
        if (cum >= t) { res = v; found = true }
      }
      res
    }
  }

  /** Empirical CDF at each split: estimated rank / n. */
  def cdf(b: KllBuf, splits: Seq[Double]): Seq[Double] =
    if (b.n == 0L) splits.map(_ => Double.NaN)
    else splits.map(s => rank(b, s).toDouble / b.n)

  /** The GUARANTEED worst-case rank error of any [[quantile]] /
    * [[rank]] answer: H·n/(k−1) accumulated compaction error plus one
    * max-weight item of read-side discretization slack. Deterministic —
    * holds for every data order and merge tree, so the oracled bound
    * query can pin it without flake risk.
    */
  def errBound(b: KllBuf): Long = {
    val h = b.levels.length
    if (h <= 1) 0L
    else (h.toLong * b.n) / (b.k - 1) + (1L << (h - 1)) + 1L
  }

  /** Typed aggregator: per-group KLL sketch finishing into count,
    * exact min/max, depth, guaranteed error bound, and the quantiles at
    * `probs`. Buffers merge map-side; shuffle volume per group is the
    * sketch, not the rows.
    */
  class KllQuantiles(k: Int, probs: Seq[Double])
      extends Aggregator[Double, KllBuf, KllOut] {
    override def zero: KllBuf = empty(k)
    override def reduce(b: KllBuf, a: Double): KllBuf = update(b, a)
    override def merge(x: KllBuf, y: KllBuf): KllBuf = Kll.merge(x, y)
    override def finish(b: KllBuf): KllOut =
      KllOut(b.n, b.minV, b.maxV, b.levels.length, errBound(b),
        probs.map(p => quantile(b, p)))
    override def bufferEncoder: Encoder[KllBuf] = ExpressionEncoder[KllBuf]()
    override def outputEncoder: Encoder[KllOut] = ExpressionEncoder[KllOut]()
  }

  /** Raw sketch-state aggregator — the partial you materialize per
    * day/partition and [[merge]] across arbitrary windows later (the
    * X76 `dailyUniqueSketch` shape, for quantiles).
    */
  class KllSketchAgg(k: Int) extends Aggregator[Double, KllBuf, KllBuf] {
    override def zero: KllBuf = empty(k)
    override def reduce(b: KllBuf, a: Double): KllBuf = update(b, a)
    override def merge(x: KllBuf, y: KllBuf): KllBuf = Kll.merge(x, y)
    override def finish(b: KllBuf): KllBuf = b
    override def bufferEncoder: Encoder[KllBuf] = ExpressionEncoder[KllBuf]()
    override def outputEncoder: Encoder[KllBuf] = ExpressionEncoder[KllBuf]()
  }

  /** Merge aggregator over MATERIALIZED sketch states (the read side of
    * [[KllSketchAgg]]): input rows are `KllBuf` structs — e.g. per-day
    * partials persisted to parquet — merged losslessly and finished into
    * quantile answers. This is the two-level shape that never re-scans
    * history: stage 1 sketches each day's rows once at ingest; any later
    * window query aggregates only the tiny partials.
    */
  class KllMergeQuantiles(k: Int, probs: Seq[Double])
      extends Aggregator[KllBuf, KllBuf, KllOut] {
    override def zero: KllBuf = empty(k)
    override def reduce(b: KllBuf, a: KllBuf): KllBuf = Kll.merge(b, a)
    override def merge(x: KllBuf, y: KllBuf): KllBuf = Kll.merge(x, y)
    override def finish(b: KllBuf): KllOut =
      KllOut(b.n, b.minV, b.maxV, b.levels.length, errBound(b),
        probs.map(p => quantile(b, p)))
    override def bufferEncoder: Encoder[KllBuf] = ExpressionEncoder[KllBuf]()
    override def outputEncoder: Encoder[KllOut] = ExpressionEncoder[KllOut]()
  }

  /** DataFrame-facing quartile column. */
  def quartilesColumn(k: Int, c: Column): Column = {
    val fn = udaf(new KllQuantiles(k, Seq(0.25, 0.5, 0.75)))
    fn(c.cast("double"))
  }

  /** Raw sketch-state column (a `KllBuf` struct — materializable). */
  def sketchColumn(k: Int, c: Column): Column = {
    val fn = udaf(new KllSketchAgg(k))
    fn(c.cast("double"))
  }

  /** Quartile column over materialized `KllBuf` struct rows. A product
    * input encoder flattens to one argument per case-class field, so
    * the struct column is expanded here — callers just pass the struct.
    */
  def mergeQuartilesColumn(k: Int, sketches: Column): Column = {
    val fn = udaf(new KllMergeQuantiles(k, Seq(0.25, 0.5, 0.75)),
      ExpressionEncoder[KllBuf]())
    fn(Seq("k", "n", "minV", "maxV", "coins", "levels")
      .map(sketches.getField): _*)
  }

  /** The value-checked CONTRACT query (the `q_quantiles_approx_bound`
    * recipe with the custom sketch and its DETERMINISTIC envelope):
    * exact per-group quartiles next to booleans asserting each KLL
    * answer's true rank interval [lt+1, le] intersects
    * [target − errBound, target + errBound] — where errBound is the
    * sketch's own guaranteed worst case, so TRUE is a theorem, not a
    * probabilistic expectation. `n_ok` additionally pins the sketch's
    * internal count against the group row count (weight conservation).
    * The DuckDB oracle replays the exact side and pins every boolean to
    * literal TRUE; a Spark-side violation hash-mismatches.
    *
    * Two aggregations over the input (sketch pass, rank-count pass
    * against the broadcast per-group sketch answers); group cardinality
    * bounds the broadcast side.
    */
  def quantileBound(df: DataFrame, key: String, c: String,
      k: Int = 256): DataFrame = {
    val ap = df.filter(col(c).isNotNull)
      .groupBy(col(key))
      .agg(quartilesColumn(k, col(c)).as("__kll"))
      .withColumnRenamed(key, "__apk")
    rankAudit(df, key, c, ap)
  }

  /** [[quantileBound]]'s two-level twin (X76's `dailyUniqueSketch`
    * shape for quantiles): stage 1 sketches per (key, day) — the
    * partial you'd persist at ingest; stage 2 merges ONLY the partials
    * per key. Answers carry the merged sketch's own guaranteed bound,
    * so the same rank audit pins that the materialize-then-merge path
    * loses nothing it promised.
    */
  def dailyQuantileBound(df: DataFrame, key: String, day: Column,
      c: String, k: Int = 256): DataFrame = {
    val partials = df.filter(col(c).isNotNull)
      .groupBy(col(key), day.as("__day"))
      .agg(sketchColumn(k, col(c)).as("__sk"))
    val ap = partials.groupBy(col(key))
      .agg(mergeQuartilesColumn(k, col("__sk")).as("__kll"))
      .withColumnRenamed(key, "__apk")
    rankAudit(df, key, c, ap)
  }

  /** CDF-read audit (the [[cdf]] read path value-checked): per (key,
    * split) the sketch's estimated CDF next to the EXACT empirical CDF
    * — exact_cdf is fully replayable (integer count ratio, IEEE-exact
    * division), and `cdf_ok` pins \|est − exact\| ≤ errBound/n, the
    * same deterministic envelope as the quantile reads. Splits are
    * caller-fixed literals so both engines evaluate the same points.
    */
  def cdfBound(df: DataFrame, key: String, c: String,
      splits: Seq[Double], k: Int = 256): DataFrame = {
    require(splits.nonEmpty, "cdfBound: need at least one split")
    import df.sparkSession.implicits._
    val v = col(c).cast("double")
    val sketches = df.filter(v.isNotNull)
      .groupBy(col(key))
      .agg(sketchColumn(k, col(c)).as("__sk"))
      .withColumnRenamed(key, "__ck")
      .as[(String, KllBuf)]
    val ests = sketches.flatMap { case (kk, b) =>
      splits.map(s => (kk, s, rank(b, s).toDouble / b.n,
        errBound(b).toDouble / b.n))
    }.toDF("__ck", "split", "__est", "__eps")
    val exact = df.filter(v.isNotNull)
      .groupBy(col(key))
      .agg(count(lit(1)).as("__n"),
        splits.zipWithIndex.map { case (s, i) =>
          sum(when(v <= lit(s), 1L).otherwise(0L)).as(s"__le_$i")
        }: _*)
    val exploded = splits.zipWithIndex.map { case (s, i) =>
      exact.select(col(key), lit(s).as("__split"),
        (col(s"__le_$i").cast("double") / col("__n").cast("double"))
          .as("__exact"))
    }.reduce(_ unionByName _)
    exploded.join(ests,
        col(key) === col("__ck") && col("__split") === col("split"))
      .select(col(key), col("split"),
        round(col("__exact"), 6).as("exact_cdf"),
        (abs(col("__est") - col("__exact")) <= col("__eps") + lit(1e-12))
          .as("cdf_ok"))
  }

  /** Audit EXTERNALLY-BUILT sketch states against the raw rows they
    * summarize — the gate behind the STREAMING form
    * ([[graft.streaming.Stateful.kllSnapshots]]): `sketches` carries one
    * final `KllBuf` struct per key (column `sketch`); its quartile reads
    * are certified by the same rank audit. Because the sketch's bound is
    * order-independent, this holds for state built in ANY micro-batch
    * arrival order. Keys with multiple rows would DOUBLE-COUNT (cumulative
    * snapshots are not disjoint partials) — callers pick the latest
    * snapshot (argmax n) first.
    */
  def sketchBound(df: DataFrame, key: String, c: String,
      sketches: DataFrame, k: Int = 256): DataFrame = {
    val ap = sketches.groupBy(col(key))
      .agg(mergeQuartilesColumn(k, col("sketch")).as("__kll"))
      .withColumnRenamed(key, "__apk")
    rankAudit(df, key, c, ap)
  }

  /** Shared audit: join the raw rows to the per-group sketch answers
    * `ap` (`__apk`, `__kll: KllOut`) and certify each answer's true
    * rank interval against the sketch's own guaranteed bound.
    */
  private def rankAudit(df: DataFrame, key: String, c: String,
      ap: DataFrame): DataFrame = {
    val v = col(c).cast("double")
    val targets = Seq(("q1", 0.25, 1), ("med", 0.5, 2), ("q3", 0.75, 3))
    val aggs: Seq[Column] =
      expr(s"percentile($c, array(0.25, 0.5, 0.75))").as("__q") +:
        count(lit(1)).as("n") +:
        count(v).as("__nn") +:
        max(col("__kll.n")).as("__kn") +:
        max(col("__kll.errBound")).as("__kerr") +:
        targets.flatMap { case (nm, _, i) => Seq(
          sum(when(v <= element_at(col("__kll.qs"), i), 1L).otherwise(0L))
            .as(s"__le_$nm"),
          sum(when(v < element_at(col("__kll.qs"), i), 1L).otherwise(0L))
            .as(s"__lt_$nm"))
        }
    // Left join + null-safe key equality: an all-NULL-value group is
    // absent from the sketch side but must still emit a row (vacuously
    // TRUE bounds), matching DuckDB's GROUP BY.
    val ranks = df.join(broadcast(ap), col(key) <=> col("__apk"), "left")
      .groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
    val qOks = targets.map { case (nm, p, _) =>
      // target rank = ceil(p·nn) (the sketch's own read convention);
      // accept iff the returned value's true rank interval intersects
      // the guaranteed window.
      val target = ceil(col("__nn").cast("double") * p)
      val w = col("__kerr").cast("double")
      (col("__nn") === 0L ||
        (col(s"__le_$nm") >= target - w &&
          (col(s"__lt_$nm") + 1) <= target + w)).as(s"${nm}_ok")
    }
    ranks.select(
      col(key) +:
        round(element_at(col("__q"), 1), 6).as("q1") +:
        round(element_at(col("__q"), 2), 6).as("median") +:
        round(element_at(col("__q"), 3), 6).as("q3") +:
        col("n") +:
        (col("__nn") === coalesce(col("__kn"), lit(0L))).as("n_ok") +:
        qOks: _*)
  }
}

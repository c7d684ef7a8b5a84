package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable Misra–Gries frequency-sketch state: at most `k` (item,
  * count) counters summarizing `n` observed items. `keys`/`counts` are
  * parallel sequences (a materializable struct, like [[KllBuf]]).
  *
  * Invariant carried by every construction path (stream update and
  * summary merge alike): for EVERY item x — retained or evicted —
  *
  *   f(x) − n/(k+1)  ≤  est(x)  ≤  f(x)
  *
  * where f is the true frequency and est reads 0 for absent items.
  * Deterministic and independent of data order and merge tree, so an
  * oracled audit can pin the booleans as theorems.
  */
case class MgBuf(k: Int, n: Long, keys: Seq[String], counts: Seq[Long])

/** Misra–Gries heavy-hitters sketch (X112) — the frequency-domain twin
  * of X107's KLL rank bound and the DETERMINISTIC counterpart of X97's
  * count-min sketch: CM's overestimate is probabilistic over hash
  * collisions; MG's two-sided window est ∈ [f − n/(k+1), f] is a
  * worst-case guarantee with NO hash and NO failure probability, and —
  * unlike CM's fixed d×w grid — the state is k counters that merge
  * losslessly up any tree (Agarwal et al., "Mergeable Summaries",
  * PODS 2012: pointwise-sum then subtract the (k+1)-th largest count,
  * which preserves the n/(k+1) envelope for the COMBINED n).
  *
  * Consequences the audits lean on:
  *  - any item with f(x) > n/(k+1) is GUARANTEED retained (its lower
  *    bound is positive), so a support threshold φ > 1/(k+1) has no
  *    false negatives — the candidate set for an exact rescan;
  *  - an evicted item has f(x) ≤ n/(k+1) — absence is informative;
  *  - both hold for per-partition partials merged in ANY order, which
  *    is the 100 TB shape: k counters per (group, partition) at ingest,
  *    window queries merge partials and never re-scan rows. Same
  *    reasoning makes micro-batch arrival order irrelevant, so the
  *    streaming form is oracle-able.
  *
  * Reference anchor: the dashboard's per-type frequency panels
  * (streamlit_dashboard.py value_counts) recompute full (item, count)
  * tables per refresh — unbounded in the item cardinality; this is the
  * constant-size summary that answers the same "what dominates" question
  * with a guaranteed error window.
  */
object Freq {

  /** Empty sketch with capacity `k` (≥ 1). */
  def empty(k: Int): MgBuf = {
    require(k >= 1, s"k must be >= 1, got $k")
    MgBuf(k, 0L, Vector.empty, Vector.empty)
  }

  /** One streaming insert. Increment a live counter, else claim a free
    * slot, else the classic decrement-all step (one unit off all k
    * counters AND the arriving item — k+1 units of discarded weight per
    * decrement event, hence ≤ n/(k+1) events total).
    */
  def update(b: MgBuf, x: String): MgBuf = {
    if (x == null) b
    else {
      val i = b.keys.indexOf(x)
      if (i >= 0)
        b.copy(n = b.n + 1, counts = b.counts.updated(i, b.counts(i) + 1L))
      else if (b.keys.length < b.k)
        b.copy(n = b.n + 1, keys = b.keys.toVector :+ x,
          counts = b.counts.toVector :+ 1L)
      else {
        val kept = b.keys.iterator.zip(b.counts.iterator)
          .map { case (kk, c) => (kk, c - 1L) }.filter(_._2 > 0L).toVector
        MgBuf(b.k, b.n + 1, kept.map(_._1), kept.map(_._2))
      }
    }
  }

  /** Lossless summary merge (PODS'12 rule): pointwise-sum the counter
    * sets; if more than k survive, subtract the (k+1)-th largest count
    * from every counter and drop the non-positive — at most k counts
    * exceed that pivot, so the result fits, and the subtracted pivot is
    * exactly the extra error the combined n/(k+1) envelope absorbs.
    */
  def merge(a: MgBuf, b: MgBuf): MgBuf = {
    require(a.k == b.k, s"cannot merge sketches of different k: ${a.k} vs ${b.k}")
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    a.keys.iterator.zip(a.counts.iterator).foreach { case (kk, c) =>
      m.update(kk, m.getOrElse(kk, 0L) + c) }
    b.keys.iterator.zip(b.counts.iterator).foreach { case (kk, c) =>
      m.update(kk, m.getOrElse(kk, 0L) + c) }
    val n = a.n + b.n
    if (m.size <= a.k)
      MgBuf(a.k, n, m.keys.toVector, m.values.toVector)
    else {
      val pivot = m.values.toVector.sorted(Ordering[Long].reverse)(a.k)
      val kept = m.iterator.map { case (kk, c) => (kk, c - pivot) }
        .filter(_._2 > 0L).toVector
      MgBuf(a.k, n, kept.map(_._1), kept.map(_._2))
    }
  }

  /** Point estimate: the retained count, 0 if evicted/never seen. */
  def estimate(b: MgBuf, x: String): Long = {
    val i = b.keys.indexOf(x)
    if (i >= 0) b.counts(i) else 0L
  }

  /** The guaranteed error window: every estimate is within
    * [f − errBound, f]. Integer floor — the audits compare in exact
    * integer arithmetic (est·(k+1) ≥ f·(k+1) − n) instead.
    */
  def errBound(b: MgBuf): Long = b.n / (b.k + 1)

  /** Raw sketch-state aggregator — the partial you materialize per
    * (group, partition/day) and [[merge]] across windows later.
    */
  class MgSketchAgg(k: Int) extends Aggregator[String, MgBuf, MgBuf] {
    override def zero: MgBuf = empty(k)
    override def reduce(b: MgBuf, a: String): MgBuf = update(b, a)
    override def merge(x: MgBuf, y: MgBuf): MgBuf = Freq.merge(x, y)
    override def finish(b: MgBuf): MgBuf = b
    override def bufferEncoder: Encoder[MgBuf] = ExpressionEncoder[MgBuf]()
    override def outputEncoder: Encoder[MgBuf] = ExpressionEncoder[MgBuf]()
  }

  /** Merge aggregator over MATERIALIZED sketch states (the read side of
    * [[MgSketchAgg]]): input rows are `MgBuf` structs.
    */
  class MgMergeAgg(k: Int) extends Aggregator[MgBuf, MgBuf, MgBuf] {
    override def zero: MgBuf = empty(k)
    override def reduce(b: MgBuf, a: MgBuf): MgBuf = Freq.merge(b, a)
    override def merge(x: MgBuf, y: MgBuf): MgBuf = Freq.merge(x, y)
    override def finish(b: MgBuf): MgBuf = b
    override def bufferEncoder: Encoder[MgBuf] = ExpressionEncoder[MgBuf]()
    override def outputEncoder: Encoder[MgBuf] = ExpressionEncoder[MgBuf]()
  }

  /** Per-group sketch column (an `MgBuf` struct — materializable).
    * Partials combine map-side; the shuffle moves ≤ k counters per
    * group, never rows.
    */
  def mgColumn(k: Int, c: Column): Column = {
    val fn = udaf(new MgSketchAgg(k))
    fn(c.cast("string"))
  }

  /** Sketch column over materialized `MgBuf` struct rows (field-expanded
    * like [[Kll.mergeQuartilesColumn]] — callers pass the struct).
    */
  def mgMergeColumn(k: Int, sketches: Column): Column = {
    val fn = udaf(new MgMergeAgg(k), ExpressionEncoder[MgBuf]())
    fn(Seq("k", "n", "keys", "counts").map(sketches.getField): _*)
  }

  /** The value-checked CONTRACT query: per (group, item) the EXACT count
    * (replayable) next to booleans certifying the sketch estimate's
    * guaranteed window — `upper_ok`: est ≤ cnt; `lower_ok`:
    * est·(k+1) ≥ cnt·(k+1) − n, ALL-INTEGER so no FP shape can differ
    * cross-engine. Both are theorems for EVERY item (retained items by
    * the decrement accounting; evicted items because eviction itself
    * proves f ≤ n/(k+1)), for any data order — the DuckDB oracle replays
    * (group, item, cnt, n) and pins the booleans to literal TRUE.
    *
    * Cost shape: the exact side is the one (group, item) aggregation
    * the audit needs anyway; the sketch side is ≤ k counters per group,
    * broadcast back. At 100 TB you ship ONLY the sketch.
    */
  def heavyHittersBound(items: DataFrame, group: String, item: String,
      k: Int): DataFrame =
    audit(items, group, item, k,
      items.groupBy(col(group))
        .agg(mgColumn(k, col(item)).as("__mg"))
        .withColumnRenamed(group, "__g"))

  /** [[heavyHittersBound]]'s two-level twin (the X76/X107 partial
    * shape): stage 1 sketches per (group, `part`) — the partial you'd
    * persist at ingest; stage 2 merges ONLY the partials per group.
    * The merge rule preserves the combined-n envelope, so the SAME
    * audit certifies that the materialize-then-merge path kept the
    * guarantee without re-scanning rows.
    */
  def heavyHittersMergedBound(items: DataFrame, group: String,
      part: Column, item: String, k: Int): DataFrame = {
    val partials = items.groupBy(col(group), part.as("__part"))
      .agg(mgColumn(k, col(item)).as("__sk"))
    audit(items, group, item, k,
      partials.groupBy(col(group))
        .agg(mgMergeColumn(k, col("__sk")).as("__mg"))
        .withColumnRenamed(group, "__g"))
  }

  /** Audit EXTERNALLY-BUILT sketch states (column `__mg`, key `__g`)
    * against the raw rows they summarize — shared by the batch,
    * merged, and streaming gates. Valid for state built in ANY
    * micro-batch arrival order (the merge-tree-independent envelope).
    */
  private[graft] def audit(items: DataFrame, group: String, item: String,
      k: Int, sketches: DataFrame): DataFrame = {
    val exact = items.groupBy(col(group), col(item))
      .agg(count(lit(1)).as("cnt"))
    val totals = items.groupBy(col(group)).agg(count(lit(1)).as("n"))
      .withColumnRenamed(group, "__t")
    val pos = array_position(col("__mg.keys"), col(item))
    val est = when(pos > 0,
      element_at(col("__mg.counts"), pos.cast("int"))).otherwise(0L)
    exact
      .join(broadcast(totals), col(group) === col("__t"))
      .join(broadcast(sketches), col(group) === col("__g"))
      .select(col(group), col(item), col("cnt"), col("n"),
        (est <= col("cnt")).as("upper_ok"),
        (est * lit((k + 1).toLong) >=
          col("cnt") * lit((k + 1).toLong) - col("n")).as("lower_ok"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.PortableHash

/** KMV (k-minimum-values / bottom-k theta) distinct sketches with SET
  * OPERATIONS (X106) — the capability X76's HLL rollup lacks: HLL
  * sketches union losslessly but cannot intersect or difference, while
  * audience/contamination questions are exactly "how many uniques does
  * day A share with day B" (cross-day retention, split overlap, feed
  * vs store reconciliation). The KMV sample IS a uniform bottom-k
  * sample of the key's hash space, so union, intersection and
  * difference all estimate from the same arrays (the published theta-
  * sketch algebra: trim to the smaller threshold τ, count survivors,
  * scale by 1/τ).
  *
  * Engine-portable by construction: draws are [[PortableHash.hash60]]
  * (md5-prefix bigints), so the sketch CONTENTS — not just their
  * estimates — replay bit-identically in the DuckDB oracle, and every
  * estimator below is deterministic arithmetic over them
  * (`q_sketch_setops` value-checks estimates cross-engine; accuracy is
  * spec-asserted separately on controlled corpora).
  *
  * Scale shape: one hash projection, then a two-phase bottom-k — per
  * (group, input-partition) partial bottom-k (agg state bounded by the
  * partition's distinct hashes — the same partition-sizing contract
  * every hash agg rides), then a merge of ≤ k-element arrays per
  * group. No global sort, no single-task group bottleneck; sketches
  * are k longs regardless of group cardinality, so day × 10⁹ uniques
  * still ships k values. Set ops are O(k²) array ops per group PAIR —
  * driver-free, and k is a constant.
  */
object Sketches {

  /** 2^60 as a bigint threshold: a sketch with fewer than k entries is
    * EXACT, which the algebra expresses as τ = 2^60 (every draw kept).
    */
  private val ThetaExact = 1152921504606846976L

  /** Bottom-k sketch of `keyCol`'s distinct values per group: `kmv` is
    * the ascending array of the k smallest distinct hash60 draws (fewer
    * = the group is exact). Deterministic, so the window-ranked oracle
    * form selects the identical set. Null keys are excluded BEFORE
    * hashing — a null key is not a distinct value, and keeping it
    * would diverge from any SQL oracle whose ranked list retains a
    * NULL hash inside the bottom-k (oracles add the matching
    * `WHERE key IS NOT NULL` so both engines agree by construction).
    */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int, salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"kmvSketch: k must be >= 2, got $k")
    val gs = groupCols.map(col)
    df.filter(col(keyCol).isNotNull)
      .select(gs :+ PortableHash.hash60(
        concat(col(keyCol).cast("string"), lit(s"|$salt"))).as("__h"): _*)
      // phase 1: per (group, input partition) partial bottom-k — state
      // bounded by one partition's rows, completes map-side
      .groupBy(gs :+ spark_partition_id().as("__p"): _*)
      .agg(slice(array_sort(collect_set(col("__h"))), 1, k).as("__ks"))
      // phase 2: merge ≤ k-element partials; cross-partition duplicate
      // hashes (same key in two partitions) dedupe here
      .groupBy(gs: _*)
      .agg(slice(array_sort(array_distinct(flatten(
        collect_list(col("__ks"))))), 1, k).as("kmv"))
  }

  /** The sketch's own distinct estimate: exact size when the group
    * never filled the sketch, else the classic (k−1)/U(k) with the
    * k-th smallest draw mapped to (0, 1].
    */
  def kmvEstimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(PortableHash.Pow60)
        / element_at(kmv, k).cast("double"))

  /** θ of one sketch: its k-th draw when full, 2^60 (exact) otherwise. */
  private def theta(kmv: Column, k: Int): Column =
    when(size(kmv) < k, lit(ThetaExact))
      .otherwise(element_at(kmv, k))

  /** Set-operation estimates over two sketch columns `a`, `b` (built
    * with the same k and salt). Returns a struct column with
    * `est_union`, `est_intersection`, `est_difference` (= A \ B):
    * trim both samples to τ = min(θa, θb), count survivors by
    * membership, scale by 2^60/τ; the union estimate re-sketches the
    * merged draws. When both groups are exact the estimates ARE the
    * exact counts (τ = 2^60 keeps every draw and the scale is 1).
    */
  def kmvSetOps(a: Column, b: Column, k: Int): Column = {
    val tau = least(theta(a, k), theta(b, k))
    val aT = filter(a, x => x <= tau)
    val scale = lit(PortableHash.Pow60) / tau.cast("double")
    val nInter = size(filter(aT, x => exists(b, y => y === x)))
    val nDiff = size(aT) - nInter
    val merged = slice(array_sort(array_distinct(concat(a, b))), 1, k)
    struct(
      kmvEstimate(merged, k).as("est_union"),
      (nInter.cast("double") * scale).as("est_intersection"),
      (nDiff.cast("double") * scale).as("est_difference"))
  }

  /** Cross-day audience algebra on the events table — the oracled
    * composition (`q_sketch_setops`): per-day KMV sketches of
    * `keyCol`, self-joined on CONSECUTIVE days, estimates next to the
    * exact counts so the artifact reads as a calibration table. All
    * estimate arithmetic is deterministic over portable draws — the
    * oracle recomputes identical values, not just bounds.
    */
  def dailyOverlap(df: DataFrame, tsCol: String, keyCol: String,
      k: Int): DataFrame = {
    // null keys excluded up front (both the sketch AND the exact side —
    // the oracle's days CTE carries the same IS NOT NULL predicate)
    val days = df.filter(col(keyCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"),
        col(keyCol).cast("string").as("__k")).distinct()
    val sk = kmvSketch(days, Seq("day"), "__k", k)
    val exact = days.groupBy(col("day"))
      .agg(count(lit(1)).as("__n")) // days is already distinct
    val inter = days.as("x").join(days.as("y"),
        col("x.__k") === col("y.__k")
          && col("y.day") === date_add(col("x.day"), 1))
      .groupBy(col("x.day").as("day"))
      .agg(count(lit(1)).as("__ni"))
    val both = sk.as("a")
      .join(sk.as("b"), col("b.day") === date_add(col("a.day"), 1))
      .select(col("a.day").as("day_a"), col("b.day").as("day_b"),
        kmvSetOps(col("a.kmv"), col("b.kmv"), k).as("ops"))
    both
      .join(exact.as("ea"), col("day_a") === col("ea.day"))
      .join(exact.as("eb"), col("day_b") === col("eb.day"))
      .join(inter, col("day_a") === inter("day"))
      .select(col("day_a"), col("day_b"),
        round(col("ops.est_union"), 4).as("est_union"),
        round(col("ops.est_intersection"), 4).as("est_intersection"),
        round(col("ops.est_difference"), 4).as("est_difference"),
        (col("ea.__n") + col("eb.__n") - col("__ni")).as("exact_union"),
        col("__ni").as("exact_intersection"),
        (col("ea.__n") - col("__ni")).as("exact_difference"))
  }
}

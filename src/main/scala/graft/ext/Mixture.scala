package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mixture construction — the step between curation and training that
  * decides HOW MUCH of each source goes into the run: allocate a global
  * token budget across domains toward target weights under per-domain
  * capacity caps (water-filling), then fill each domain's allocation
  * with its best documents (reference quality signals live in
  * `streamlit_dashboard.py`'s metric family; the learned score comes
  * from [[Classifier]]).
  *
  * Division of labour with the neighbouring ops: [[Curate.upsampleEpochs]]
  * APPLIES a given per-domain epoch map; [[Curate.dsirWeights]] reweights
  * toward a target corpus distribution; [[TextStats.corpusDivergence]]
  * EXPLAINS a gap. This module COMPUTES the epoch map in the first place
  * — the knob the others consume.
  *
  * Shape at 100 TB: [[domainTokens]] is one corpus scan ending in a
  * #domains-row aggregate; [[solveBudget]] then runs entirely on that
  * domain-metadata frame (tens of rows — the unpartitioned windows it
  * uses are bounded by #domains, never by the corpus, the same
  * metadata-frame license as [[Similarity]] codebooks); [[fillByQuality]]
  * is one corpus-sized window per domain plus a broadcast join of the
  * #domains allocation frame.
  */
object Mixture {

  /** Per-domain whitespace-token inventory: one corpus scan →
    * (`domainCol`, `tokens_avail`) with #domains output rows. The input
    * side of [[solveBudget]].
    */
  def domainTokens(df: DataFrame, domainCol: String,
      textCol: String): DataFrame = {
    val t = col(textCol)
    df.groupBy(col(domainCol))
      .agg(sum((length(t) - length(regexp_replace(t, " ", "")) + 1)
        .cast("long")).as("tokens_avail"))
  }

  /** Water-filling token-budget allocation: give each domain `d` an
    * allocation proportional to its target weight `w_d`, capped at its
    * capacity `c_d = tokens_avail · maxEpochs`, so that the allocations
    * sum to `min(budget, Σc)` — the classic capped-proportional
    * projection (the DoReMi/Pile-style "mixture weights meet finite
    * sources" reconciliation).
    *
    * Construction (all on the #domains metadata frame): sort domains by
    * `r_d = c_d / w_d` ascending (tie: domain name); a domain is capped
    * iff its proportional share of what remains after all
    * earlier-sorted domains take their caps already exceeds its cap —
    * `c_d · (W − prevW) ≤ w_d · (B − prevC)` — which is a PREFIX of the
    * sort order (once one row fails, every later row has larger `r` and
    * a strictly lower water level, so it fails too); the final water
    * level `t* = (B − Σ_capped c) / (W − Σ_capped w)` spreads the rest,
    * `alloc_d = capped ? c_d : w_d · t*`.
    *
    * Cross-engine determinism: with integer-representable capacities
    * (e.g. `maxEpochs` 1.0 or 2.0) and exact weights, every sum is
    * order-free and the one division `t*` evaluates on identical
    * doubles in any IEEE engine; outputs round to 6.
    *
    * Output per domain: `tokens_avail`, `weight`, `capped`,
    * `alloc_tokens` (Σ = min(budget, Σc) by construction), `epochs`
    * (= alloc / avail — feed straight into [[Curate.upsampleEpochs]]).
    * Weights must be strictly positive (filter a domain out to exclude
    * it); a zero-token domain caps at 0 and absorbs nothing.
    */
  def solveBudget(avail: DataFrame, domainCol: String,
      weights: Map[String, Double], budgetTokens: Long,
      maxEpochs: Double = 1.0, default: Double = 1.0): DataFrame = {
    require(budgetTokens >= 0, s"solveBudget: negative budget $budgetTokens")
    require(maxEpochs > 0, s"solveBudget: maxEpochs must be positive")
    require(weights.values.forall(_ > 0) && default > 0,
      s"solveBudget: weights must be strictly positive (filter a domain " +
        s"out to exclude it); got $weights / default=$default")
    val w = weights.foldLeft(lit(default)) { case (acc, (g, wt)) =>
      when(col(domainCol) === g, lit(wt)).otherwise(acc)
    }
    // #domains-sized frame from here on: unpartitioned windows are the
    // metadata-frame license, not a corpus sort.
    val base = avail.select(col(domainCol), col("tokens_avail"),
      w.as("weight"),
      (col("tokens_avail").cast("double") * lit(maxEpochs)).as("capacity"))
    val ord = Window
      .orderBy(col("capacity") / col("weight"), col(domainCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = base.agg(
      sum(col("capacity")).as("__capTotal"),
      sum(col("weight")).as("__wTotal"))
    val staged = base
      .withColumn("__prevC", coalesce(sum(col("capacity")).over(ord), lit(0.0)))
      .withColumn("__prevW", coalesce(sum(col("weight")).over(ord), lit(0.0)))
      .crossJoin(broadcast(totals))
      .withColumn("__b", least(lit(budgetTokens.toDouble), col("__capTotal")))
      .withColumn("capped",
        col("capacity") * (col("__wTotal") - col("__prevW")) <=
          col("weight") * (col("__b") - col("__prevC")))
    val cappedTotals = staged.agg(
      coalesce(sum(when(col("capped"), col("capacity"))), lit(0.0))
        .as("__capC"),
      coalesce(sum(when(col("capped"), col("weight"))), lit(0.0))
        .as("__capW"))
    val alloc = staged.crossJoin(broadcast(cappedTotals))
      .withColumn("__t",
        when(col("__wTotal") - col("__capW") > 0,
          (col("__b") - col("__capC")) / (col("__wTotal") - col("__capW")))
          .otherwise(lit(0.0)))
      .withColumn("__alloc",
        when(col("capped"), col("capacity"))
          .otherwise(least(col("capacity"), col("weight") * col("__t"))))
    alloc.select(col(domainCol), col("tokens_avail"),
      round(col("weight"), 6).as("weight"), col("capped"),
      round(col("__alloc"), 6).as("alloc_tokens"),
      round(when(col("tokens_avail") > 0,
        col("__alloc") / col("tokens_avail")).otherwise(lit(0.0)), 6)
        .as("epochs"))
  }

  /** Fill each domain's token allocation with its highest-quality
    * documents: rank docs within a domain by (`scoreCol` desc, `idCol`
    * asc), run the token sum, and keep a doc iff the tokens consumed
    * BEFORE it are still under the domain's `alloc_tokens` — greedy
    * best-first fill, overshooting by at most the last admitted doc
    * (the FineWeb-Edu-style "take the top of the score distribution,
    * but by token budget rather than a fixed threshold").
    *
    * `alloc` is the #domains output of [[solveBudget]] (broadcast).
    * Output adds `cum_before` and `keep` to the scored rows.
    *
    * Scale note: the per-domain window sorts each domain in one task —
    * fine up to domains of ~single-executor size. Past that, the
    * bounded-histogram twin [[fillThresholds]] + [[applyThresholds]]
    * computes the same admission rule through a 4096-bin score
    * histogram (per-domain state bounded by bins, never by docs).
    */
  def fillByQuality(scored: DataFrame, idCol: String, domainCol: String,
      tokensCol: String, scoreCol: String, alloc: DataFrame): DataFrame = {
    val win = Window.partitionBy(col(domainCol))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    scored
      .join(broadcast(alloc.select(col(domainCol), col("alloc_tokens"))),
        Seq(domainCol))
      .withColumn("cum_before",
        coalesce(sum(col(tokensCol)).over(win), lit(0L)))
      .withColumn("keep", col("cum_before") < col("alloc_tokens"))
  }

  /** The scale twin of [[fillByQuality]]'s ranking pass: per-domain
    * score thresholds from a bounded histogram. Scores (in [0, 1])
    * bucket into `bins` equal cells; per-(domain, bin) token sums
    * aggregate corpus-wide (output ≤ #domains × bins rows); a
    * descending running sum over each domain's bins finds the MARGINAL
    * bin — the highest-score bin at which admitting everything above
    * it still fits `alloc_tokens`. Docs strictly above the marginal
    * bin are admitted outright; the marginal bin itself gets the
    * leftover budget (`rem_tokens`), to be spent by [[applyThresholds]].
    * Per-domain solver state is `bins` rows regardless of corpus size —
    * no domain ever sorts in one task.
    *
    * Output per domain: `bin_floor` (score at the marginal bin's lower
    * edge), `marginal_bin`, `rem_tokens`.
    */
  def fillThresholds(scored: DataFrame, domainCol: String,
      tokensCol: String, scoreCol: String, alloc: DataFrame,
      bins: Int = 4096): DataFrame = {
    require(bins > 0, s"fillThresholds: bins must be positive, got $bins")
    val bin = least(floor(col(scoreCol) * bins).cast("long"),
      lit(bins - 1L))
    val hist = scored.withColumn("__bin", bin)
      .groupBy(col(domainCol), col("__bin"))
      .agg(sum(col(tokensCol)).as("__binTok"))
    // tokens in bins STRICTLY ABOVE this one (descending prefix):
    val above = Window.partitionBy(col(domainCol))
      .orderBy(col("__bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = hist
      .withColumn("__above", coalesce(sum(col("__binTok")).over(above),
        lit(0L)))
      .join(broadcast(alloc.select(col(domainCol), col("alloc_tokens"))),
        Seq(domainCol))
      .filter(col("__above") < col("alloc_tokens"))
    // marginal bin = the LOWEST bin still (partially) admitted.
    run.groupBy(col(domainCol))
      .agg(min(col("__bin")).as("marginal_bin"),
        min_by(col("alloc_tokens") - col("__above"), col("__bin"))
          .as("rem_tokens"),
        (min(col("__bin")).cast("double") / bins).as("bin_floor"))
  }

  /** Admission under [[fillThresholds]]' per-domain marginal bin: docs
    * in bins above it keep outright; docs IN the marginal bin spend its
    * `rem_tokens` leftover in (score desc, id asc) order — a window
    * over the marginal bin's slice only (1/`bins` of the domain), not
    * the domain. Same greedy semantics as [[fillByQuality]]; the two
    * admission sets coincide whenever scores order consistently with
    * bins (always, up to ties inside one bin resolved identically).
    */
  def applyThresholds(scored: DataFrame, idCol: String, domainCol: String,
      tokensCol: String, scoreCol: String, thresholds: DataFrame,
      bins: Int = 4096): DataFrame = {
    require(bins > 0, s"applyThresholds: bins must be positive, got $bins")
    val bin = least(floor(col(scoreCol) * bins).cast("long"),
      lit(bins - 1L))
    // partitioned by (domain, bin): only the marginal bin's slice ever
    // sorts together — 1/bins of the domain, never the domain.
    val margWin = Window.partitionBy(col(domainCol), col("__bin"))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // left join: a zero-allocation domain has NO thresholds row (every
    // bin was over budget) — its docs stay in the output with keep=false.
    scored.withColumn("__bin", bin)
      .join(broadcast(thresholds
        .select(col(domainCol), col("marginal_bin"), col("rem_tokens"))),
        Seq(domainCol), "left")
      .withColumn("__margBefore",
        when(col("__bin") === col("marginal_bin"),
          coalesce(sum(col(tokensCol)).over(margWin), lit(0L))))
      .withColumn("keep",
        coalesce(col("__bin") > col("marginal_bin") ||
          (col("__bin") === col("marginal_bin") &&
            col("__margBefore") < col("rem_tokens")), lit(false)))
      .drop("__margBefore", "__bin")
  }
}

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
    */
  private def uniformDraw(keyCol: Column, salt: String): Column =
    PortableHash.uniform01(concat(keyCol.cast("string"), lit("|" + salt)))

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
    require(budgetTokens > 0, "budgetTokens must be positive")
    val nTok = (length(col(textCol))
      - length(regexp_replace(col(textCol), " ", "")) + 1).cast("long")
    // ROWS, not the default RANGE frame: RANGE treats tied ids as peers
    // and would hand every tied row the same (wrong) cumulative sum —
    // the oracle replays the explicit ROWS frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.select(col(idCol), col(shardCol), nTok.as("n_tokens"))
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
}

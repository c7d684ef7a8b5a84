package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation (X90): graded ranking metrics — MRR,
  * DCG@k / nDCG@k, precision@k, recall@k — over a retrieval run joined
  * against a relevance-judgment table (qrels). This is the measurement
  * half of the retrieval stack (BM25 / ANN serve the run; X50/X55's
  * recall audits grade ANN against the exact float ranking; THIS grades
  * any run against human-or-heuristic judgments — the step that decides
  * whether a retriever is good enough to mine training data with).
  *
  * Scale shape: the run is (#queries × k) rows by construction — tiny
  * next to the corpus. One equi-join run↔qrels on (query, doc), one
  * per-query aggregation bounded by k rows, and one window over each
  * query's judged set for the ideal ranking (partition size = that
  * query's relevant-set size, never the corpus). Nothing here touches
  * the document corpus itself.
  *
  * Determinism: gains use exact powers of two minus one over integer
  * grades (integer-representable doubles); `log2` is the only
  * transcendental and every reported double rounds to 6 decimals, the
  * repo-wide cross-engine convention.
  */
object Eval {

  /** Per-query ranking metrics.
    *
    * @param run   retrieval result: one row per (query, doc) with a
    *              1-based `rankCol`; rows with rank > k are ignored.
    * @param qrels relevance judgments: (query, doc, grade); grade > 0
    *              means relevant, graded gains are 2^grade − 1. Docs
    *              absent from qrels count as grade 0.
    * @return one row per query in the run: n_results, n_rel (judged
    *         relevant for the query), n_rel_ret (relevant among the
    *         top-k results), mrr, dcg, idcg, ndcg, precision_k,
    *         recall_k. Queries with no judged-relevant docs report
    *         ndcg/recall 0 rather than NULL.
    */
  def rankingMetrics(run: DataFrame, qrels: DataFrame, qidCol: String,
      docCol: String, rankCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, "rankingMetrics: k must be >= 1")
    val rel = qrels
      .filter(col(relCol) > 0)
      .select(col(qidCol), col(docCol), col(relCol).cast("double").as("__rel"))

    val graded = run
      .filter(col(rankCol) <= k)
      .join(rel, Seq(qidCol, docCol), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0.0)))
      .withColumn("__gain",
        (pow(lit(2.0), col("__rel")) - lit(1.0)) / log2(col(rankCol) + lit(1.0)))
    val perQuery = graded
      .groupBy(col(qidCol))
      .agg(
        count(lit(1)).as("n_results"),
        sum(when(col("__rel") > 0, 1L).otherwise(0L)).as("n_rel_ret"),
        min(when(col("__rel") > 0, col(rankCol))).as("__first_rel"),
        sum(col("__gain")).as("__dcg"))

    // Ideal ranking: each query's judged docs by grade desc (doc id
    // tie-break), gains of the top k — partition size is the judged set.
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("__rel").desc, col(docCol))
    val ideal = rel
      .withColumn("__irank", row_number().over(w))
      .groupBy(col(qidCol))
      .agg(
        count(lit(1)).as("n_rel"),
        sum(when(col("__irank") <= k,
          (pow(lit(2.0), col("__rel")) - lit(1.0)) /
            log2(col("__irank") + lit(1.0)))).as("__idcg"))

    perQuery.join(ideal, Seq(qidCol), "left")
      .select(
        col(qidCol),
        col("n_results"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("n_rel_ret"),
        round(coalesce(lit(1.0) / col("__first_rel"), lit(0.0)), 6).as("mrr"),
        round(col("__dcg"), 6).as("dcg"),
        round(coalesce(col("__idcg"), lit(0.0)), 6).as("idcg"),
        round(when(col("__idcg") > 0, col("__dcg") / col("__idcg"))
          .otherwise(lit(0.0)), 6).as("ndcg"),
        round(col("n_rel_ret").cast("double") / k, 6).as("precision_k"),
        round(when(coalesce(col("n_rel"), lit(0L)) > 0,
            col("n_rel_ret").cast("double") / col("n_rel"))
          .otherwise(lit(0.0)), 6).as("recall_k"))
  }

  /** Macro average of [[rankingMetrics]] over queries: one row with the
    * query count and the unweighted mean of each metric (each query
    * counts equally, the IR-standard macro convention). Averages are
    * taken over the already-6-rounded per-query values so the macro
    * replays engine-independently.
    */
  def macroMetrics(perQuery: DataFrame, qidCol: String): DataFrame =
    perQuery.agg(
      count(col(qidCol)).as("n_queries"),
      round(avg(col("mrr")), 6).as("mrr"),
      round(avg(col("ndcg")), 6).as("ndcg"),
      round(avg(col("precision_k")), 6).as("precision_k"),
      round(avg(col("recall_k")), 6).as("recall_k"))
}

package graft.ext

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, Long, Int)*): DataFrame =
    rows.toDF("qid", "doc", "rnk")

  private def qrels(rows: (Long, Long, Double)*): DataFrame =
    rows.toDF("qid", "doc", "rel")

  private def metrics(r: DataFrame, j: DataFrame, k: Int) =
    Eval.rankingMetrics(r, j, "qid", "doc", "rnk", "rel", k)
      .collect().map(x => x.getAs[Long]("qid") -> x).toMap

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("rankingMetrics: hand-computed graded DCG/nDCG/MRR on one query") {
    // ranks: 1 → rel 0, 2 → rel 2, 3 → rel 1; one more relevant doc
    // (grade 2) not retrieved
    val r = run((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    val j = qrels((1L, 11L, 2.0), (1L, 12L, 1.0), (1L, 99L, 2.0))
    val m = metrics(r, j, k = 10)(1L)
    val dcg = 3.0 / log2(3.0) + 1.0 / log2(4.0)
    val idcg = 3.0 / log2(2.0) + 3.0 / log2(3.0) + 1.0 / log2(4.0)
    assert(m.getAs[Long]("n_results") === 3L)
    assert(m.getAs[Long]("n_rel") === 3L)
    assert(m.getAs[Long]("n_rel_ret") === 2L)
    assert(m.getAs[Double]("mrr") === 0.5) // first relevant at rank 2
    assert(math.abs(m.getAs[Double]("dcg") - dcg) < 1e-5)
    assert(math.abs(m.getAs[Double]("idcg") - idcg) < 1e-5)
    assert(math.abs(m.getAs[Double]("ndcg") - dcg / idcg) < 1e-5)
    assert(math.abs(m.getAs[Double]("precision_k") - 0.2) < 1e-9)
    assert(math.abs(m.getAs[Double]("recall_k") - 2.0 / 3.0) < 1e-5)
  }

  test("rankingMetrics: ideal ranking at rank 1 scores ndcg 1") {
    val r = run((1L, 10L, 1), (1L, 11L, 2))
    val j = qrels((1L, 10L, 1.0))
    val m = metrics(r, j, k = 10)(1L)
    assert(m.getAs[Double]("ndcg") === 1.0)
    assert(m.getAs[Double]("mrr") === 1.0)
    assert(m.getAs[Double]("recall_k") === 1.0)
  }

  test("rankingMetrics: query with no relevant docs reports zeros") {
    val r = run((1L, 10L, 1), (1L, 11L, 2))
    val j = qrels((2L, 10L, 1.0)) // judgments for a DIFFERENT query
    val m = metrics(r, j, k = 10)(1L)
    assert(m.getAs[Long]("n_rel") === 0L)
    assert(m.getAs[Double]("mrr") === 0.0)
    assert(m.getAs[Double]("ndcg") === 0.0)
    assert(m.getAs[Double]("recall_k") === 0.0)
  }

  test("rankingMetrics: results past k are ignored") {
    val r = run((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    val j = qrels((1L, 12L, 1.0)) // only the rank-3 doc is relevant
    val m = metrics(r, j, k = 2)(1L)
    assert(m.getAs[Long]("n_results") === 2L)
    assert(m.getAs[Long]("n_rel_ret") === 0L)
    assert(m.getAs[Double]("mrr") === 0.0)
    // idcg counts the judged doc even though it fell outside the cut
    assert(m.getAs[Double]("idcg") > 0.0)
    assert(m.getAs[Double]("ndcg") === 0.0)
  }

  test("rankingMetrics: grade-0 qrels rows are not relevant") {
    val r = run((1L, 10L, 1))
    val j = qrels((1L, 10L, 0.0))
    val m = metrics(r, j, k = 5)(1L)
    assert(m.getAs[Long]("n_rel") === 0L && m.getAs[Double]("mrr") === 0.0)
  }

  test("macroMetrics: unweighted mean over queries") {
    val r = run((1L, 10L, 1), (2L, 10L, 1))
    val j = qrels((1L, 10L, 1.0)) // query 1 perfect, query 2 zero
    val per = Eval.rankingMetrics(r, j, "qid", "doc", "rnk", "rel", 5)
    val m = Eval.macroMetrics(per, "qid").collect()(0)
    assert(m.getAs[Long]("n_queries") === 2L)
    assert(m.getAs[Double]("mrr") === 0.5)
    assert(m.getAs[Double]("ndcg") === 0.5)
    assert(m.getAs[Double]("recall_k") === 0.5)
  }

  test("rankingMetrics: degenerate k rejected") {
    intercept[IllegalArgumentException] {
      Eval.rankingMetrics(run((1L, 10L, 1)), qrels((1L, 10L, 1.0)),
        "qid", "doc", "rnk", "rel", k = 0)
    }
  }
}

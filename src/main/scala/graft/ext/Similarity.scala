package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline: the query vector(s) are
  * broadcast and the corpus is scanned once — O(n·d) with no shuffle of the
  * corpus, and the top-k is a TakeOrderedAndProject (per-partition heaps +
  * driver merge of k×partitions rows), never a global sort.
  *
  * The IVF variant is the scale path: corpus vectors are bucketed by a
  * coarse quantizer (here: nearest of the per-label centroids), and the
  * query probes only the closest bucket(s) — at 100 TB this turns a full
  * scan into a pruned partition read when the bucket id is a partition key.
  *
  * All arithmetic is on `array<double>` via codegen'd higher-order
  * functions (`zip_with` + `aggregate`) — floats are cast up ONCE so the
  * accumulation is double-precision.
  */
object Similarity {

  /** Sequential-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  private def withDoubleVec(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("__e", col(vecCol).cast("array<double>"))

  /** Exact top-k most-cosine-similar corpus rows to the row `queryId`
    * (excluded from results). Deterministic tiebreak on id.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val emb = withDoubleVec(df, vecCol)
    val qv = emb.filter(col(idCol) === queryId).select(col("__e").as("__qe"))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(qv))
      .withColumn("__cos", cosine(col("__e"), col("__qe")))
      .orderBy(col("__cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("label"), round(col("__cos"), 6).as("cosine"))
  }

  /** [[bruteForceTopK]] with the native codegen'd
    * [[graft.plans.CosineSimilarity]] expression instead of the
    * interpreted higher-order-function formulation — same results
    * bit-for-bit (same summation order), one fused allocation-free loop
    * inside whole-stage codegen. This is the variant to use on large
    * corpora.
    */
  def bruteForceTopKNative(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    val emb = withDoubleVec(df, vecCol)
    val qv = emb.filter(col(idCol) === queryId).select(col("__e").as("__qe"))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(qv))
      .withColumn("__cos",
        call_function(graft.plans.GraftFunctions.CosineName,
          col("__e"), col("__qe")))
      .orderBy(col("__cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("label"), round(col("__cos"), 6).as("cosine"))
  }

  /** Per-bucket centroids: mean vector per `bucketCol`, computed with
    * posexplode + per-(bucket, dim) average + re-assembly ordered by dim —
    * a constant-size result (buckets × d) from one shuffle.
    */
  def centroids(df: DataFrame, bucketCol: String, vecCol: String): DataFrame =
    withDoubleVec(df, vecCol)
      .select(col(bucketCol), posexplode(col("__e")).as(Seq("__pos", "__v")))
      .groupBy(col(bucketCol), col("__pos"))
      .agg(avg(col("__v")).as("__m"))
      .groupBy(col(bucketCol))
      .agg(array_sort(collect_list(struct(col("__pos"), col("__m")))).as("__s"))
      .select(col(bucketCol),
        expr("transform(__s, x -> x.__m)").as("centroid"))

  /** IVF-style approximate top-k: probe only the `nProbe` buckets whose
    * centroids are closest to the query vector, then exact cosine within
    * them. Buckets here are the `label` partitions (a stand-in coarse
    * quantizer); the plumbing — centroid table broadcast, bucket pruning
    * before the scan — is the real thing.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, bucketCol: String,
      queryId: Long, k: Int, nProbe: Int = 1): DataFrame = {
    val emb = withDoubleVec(df, vecCol)
    val qv = emb.filter(col(idCol) === queryId).select(col("__e").as("__qe"))
    val cents = centroids(df, bucketCol, vecCol)
    val probed = cents.crossJoin(broadcast(qv))
      .withColumn("__cdist", cosine(col("centroid"), col("__qe")))
      .orderBy(col("__cdist").desc)
      .limit(nProbe)
      .select(col(bucketCol))
    emb.filter(col(idCol) =!= queryId)
      .join(broadcast(probed), Seq(bucketCol))
      .crossJoin(broadcast(qv))
      .withColumn("__cos", cosine(col("__e"), col("__qe")))
      .orderBy(col("__cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col(bucketCol), round(col("__cos"), 6).as("cosine"))
  }

  /** Per-bucket embedding stats: count, mean L2 norm, mean first
    * component — corpus health checks before similarity work.
    */
  def stats(df: DataFrame, bucketCol: String, vecCol: String): DataFrame =
    withDoubleVec(df, vecCol)
      .groupBy(col(bucketCol))
      .agg(
        count(lit(1)).as("n"),
        round(avg(sqrt(dot(col("__e"), col("__e")))), 6).as("avg_norm"),
        round(avg(element_at(col("__e"), 1)), 6).as("avg_c0"))
}

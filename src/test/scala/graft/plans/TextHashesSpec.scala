package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity proofs for the text-hash kernels: each kernel must be
  * bit-identical to the higher-order-function / aggregation formulation it
  * replaced, so every downstream oracle (jaccard counts, minhash minima,
  * simhash candidate sets) is unchanged by the codegen fast path.
  */
class TextHashesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"),
    (3L, "one two"),                   // fewer tokens than k → empty set
    (4L, "a a a a a a a a a a"),       // all shingles identical → 1 hash
    (5L, "x  y  z double  spaces here and more and more tokens"), // empty tokens
    (6L, "")                           // empty text → 1 empty token
  ).toDF("doc_id", "text")

  test("ShingleHashes matches xxhash64(concat_ws(' ', slice(...))) exactly") {
    GraftFunctions.register(spark)
    val k = 5
    val kernel = docs.select($"doc_id",
      call_function(GraftFunctions.ShingleName, $"text", lit(k)).as("s"))
    val hof = docs.select($"doc_id", split($"text", " ").as("__t"))
      .select($"doc_id", expr(
        s"""array_sort(array_distinct(CASE WHEN size(__t) >= $k
           |THEN transform(sequence(1, size(__t) - ${k - 1}),
           |  i -> xxhash64(concat_ws(' ', slice(__t, i, $k))))
           |ELSE array() END))""".stripMargin).as("s"))
    val km = kernel.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hm = hof.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(km.keySet === hm.keySet)
    km.keySet.foreach { id => assert(km(id) === hm(id), s"doc $id") }
    assert(km(3L).isEmpty)      // too short
    assert(km(4L).length === 1) // one distinct shingle
  }

  test("ShingleStrings matches concat_ws(' ', slice(...)) distinct sets exactly") {
    GraftFunctions.register(spark)
    val k = 5
    val kernel = docs.select($"doc_id",
      call_function(GraftFunctions.ShingleStringsName, $"text", lit(k)).as("s"))
    val hof = docs.select($"doc_id", split($"text", " ").as("__t"))
      .select($"doc_id", expr(
        s"""array_distinct(CASE WHEN size(__t) >= $k
           |THEN transform(sequence(1, size(__t) - ${k - 1}),
           |  i -> concat_ws(' ', slice(__t, i, $k)))
           |ELSE array() END)""".stripMargin).as("s"))
    val km = kernel.collect().map(r => r.getLong(0) -> r.getSeq[String](1).sorted).toMap
    val hm = hof.collect().map(r => r.getLong(0) -> r.getSeq[String](1).sorted).toMap
    assert(km === hm)
  }

  test("SimHash64 matches the 64-conditional-sum aggregation exactly") {
    GraftFunctions.register(spark)
    val kernel = Dedup64Ref.kernelSimhash(docs)
    val agg = Dedup64Ref.aggSimhash(docs)
    assert(kernel === agg)
  }

  test("kernel shingling leaves ONE hash exchange in the minhash signature plan") {
    // pre-kernel, hashedShingles did a global .distinct() (an extra
    // HASH shuffle of every shingle) before the signature groupBy; the
    // per-doc distinct inside the kernel makes the groupBy exchange the
    // only hash exchange. (Scale.fanOut may additionally insert ONE
    // round-robin exchange below the kernel when the scan has fewer
    // splits than cores — that is the r19 parallelism floor, not a
    // return of the distinct shuffle, so the assertion counts hash
    // partitionings specifically.)
    val docs001 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.ext.Dedup
      .minhashSignatures(docs001, "doc_id", "text", k = 5, nPerms = 4)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, plan)
  }

  test("kernel expressions stay inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // spark.range (not a LocalRelation, which the optimizer would fold
    // eagerly on the driver) so the projection actually hits codegen
    val plan = spark.range(10)
      .select(concat_ws(" ", lit("tok"), $"id".cast("string"), lit("a b c d")).as("text"))
      .select(
        call_function(GraftFunctions.ShingleName, $"text", lit(4)),
        call_function(GraftFunctions.SimHashName, $"text"))
      .queryExecution.executedPlan
    // The projection must be compiled (the `*(n)` WholeStageCodegen
    // marker), not fall back to interpreted row-at-a-time evaluation.
    assert(plan.toString.contains("*(1) Project [graft_shingle_hashes"), plan.toString)
  }
}

/** The pre-kernel SimHash formulation, kept verbatim as the reference
  * semantics for the parity test above.
  */
private object Dedup64Ref {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._

  def kernelSimhash(df: DataFrame): Map[Long, Long] =
    graft.ext.Dedup.simhash(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  def aggSimhash(df: DataFrame): Map[Long, Long] = {
    val toks = df
      .select(col("doc_id"), explode(split(col("text"), " ")).as("__w"))
      .withColumn("__h", xxhash64(col("__w")))
    val bitAggs: Seq[Column] = (0 until 64).map { b =>
      sum(when(expr(s"(__h >> $b) & 1") === 1, 1).otherwise(-1)).as(s"__b$b")
    }
    val votes = toks.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
    val sig = (0 until 64)
      .map(b => when(col(s"__b$b") > 0, expr(s"CAST(1 AS BIGINT) << $b"))
        .otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    votes.select(col("doc_id"), sig.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }
}

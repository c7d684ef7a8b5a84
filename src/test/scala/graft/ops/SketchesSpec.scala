package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KMV/theta set-operation sketches (X106): accuracy on a controlled
  * overlap, exact-mode degeneration, mergeability, and plan-shape
  * determinism (two-phase bottom-k ≡ the window-ranked oracle form).
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val k = 512

  // A = [0, 10000), B = [5000, 15000): |A|=|B|=10000, ∩=5000, ∪=15000
  private lazy val data = spark.range(0, 10000)
      .select(lit("A").as("g"), col("id"))
    .union(spark.range(5000, 15000).select(lit("B").as("g"), col("id")))

  test("set-operation estimates land within the k=512 error envelope on a known overlap") {
    val sk = Sketches.kmvSketch(data, Seq("g"), "id", k)
    val row = sk.filter(col("g") === "A").select(col("kmv").as("a"))
      .crossJoin(sk.filter(col("g") === "B").select(col("kmv").as("b")))
      .select(Sketches.kmvSetOps(col("a"), col("b"), k).as("ops"))
      .select("ops.est_union", "ops.est_intersection", "ops.est_difference")
      .head()
    val (u, i, d) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    // ~1/sqrt(k) ≈ 4.4% base error; 10% is a comfortable gate that
    // still catches an off-by-τ or membership bug outright
    assert(math.abs(u - 15000) / 15000.0 < 0.10, s"union est $u")
    assert(math.abs(i - 5000) / 5000.0 < 0.10, s"intersection est $i")
    assert(math.abs(d - 5000) / 5000.0 < 0.10, s"difference est $d")
  }

  test("groups smaller than k degrade to EXACT set algebra") {
    val small = spark.range(0, 100).select(lit("A").as("g"), col("id"))
      .union(spark.range(60, 160).select(lit("B").as("g"), col("id")))
    val sk = Sketches.kmvSketch(small, Seq("g"), "id", k)
    val row = sk.filter(col("g") === "A").select(col("kmv").as("a"))
      .crossJoin(sk.filter(col("g") === "B").select(col("kmv").as("b")))
      .select(Sketches.kmvSetOps(col("a"), col("b"), k).as("ops"))
      .select("ops.est_union", "ops.est_intersection", "ops.est_difference")
      .head()
    assert(row.getDouble(0) === 160.0)
    assert(row.getDouble(1) === 40.0)
    assert(row.getDouble(2) === 60.0)
  }

  test("sketches are mergeable: bottom-k of two sketches == sketch of the unioned data") {
    val sk = Sketches.kmvSketch(data, Seq("g"), "id", k)
    val merged = sk.filter(col("g") === "A").select(col("kmv").as("a"))
      .crossJoin(sk.filter(col("g") === "B").select(col("kmv").as("b")))
      .select(slice(array_sort(array_distinct(concat(col("a"), col("b")))),
        1, k).as("m"))
      .as[Seq[Long]].head()
    val direct = Sketches.kmvSketch(
      data.select(lit("all").as("g"), col("id")), Seq("g"), "id", k)
      .select(col("kmv")).as[Seq[Long]].head()
    assert(merged === direct)
  }

  test("two-phase bottom-k selects the identical draws as the window-ranked oracle form") {
    val twoPhase = Sketches.kmvSketch(data, Seq("g"), "id", k)
      .select(col("g"), col("kmv"))
    val ranked = data
      .select(col("g"), graft.ext.PortableHash.hash60(
        concat(col("id").cast("string"), lit("|kmv"))).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("h"))))
      .filter(col("rn") <= k)
      .groupBy(col("g")).agg(sort_array(collect_list(col("h"))).as("kmv"))
    assert(twoPhase.as[(String, Seq[Long])].collect().sortBy(_._1).toSeq
      === ranked.as[(String, Seq[Long])].collect().sortBy(_._1).toSeq)
  }
}

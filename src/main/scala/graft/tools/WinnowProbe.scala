package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Session
import graft.ext.Dedup
import graft.sources.Tables

/** Throwaway profiling main for the r15 winnow time-growth audit
  * (VERDICT r14 #3): times winnowCandidates VARIANTS at 1x vs 10x to
  * find which stage carries the 2.82x superlinear time term —
  * fingerprint construction, the sort-window bucket cap, or the
  * self-join. Not part of the library surface.
  */
object WinnowProbe {
  private def tenX(base: DataFrame, stride: Long): DataFrame =
    (1 until 10).map { s =>
      base.select(
        (col("doc_id") + lit(s * stride)).as("doc_id"),
        array_join(
          transform(split(col("text"), " "), w => concat(w, lit(s"_$s"))),
          " ").as("text"))
    }.foldLeft(base)(_ union _)

  // variant A: current shape (sort-window cap + shuffle_hash self-join)
  private def current(df: DataFrame): DataFrame =
    Dedup.winnowCandidates(df, "doc_id", "text", k = 5, w = 4)

  // variant B: fingerprints only (no cap, no join) — isolates construction
  private def fpOnly(df: DataFrame): DataFrame =
    Dedup.winnowFingerprints(df, "doc_id", "text", k = 5, w = 4)
      .groupBy().agg(count(lit(1)).as("n"))

  // variant C: hash-agg hot-fp cap (broadcast anti-join) + self-join —
  // removes the sort exchange of the window cap
  private def hashCap(df: DataFrame): DataFrame = {
    val fps0 = Dedup.winnowFingerprints(df, "doc_id", "text", k = 5, w = 4)
    val hot = fps0.groupBy(col("fp")).agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > 1000).select("fp")
    val fps = fps0.join(broadcast(hot), Seq("fp"), "left_anti")
      .hint("shuffle_hash")
    fps.as("a")
      .join(fps.as("b"),
        col("a.fp") === col("b.fp")
          && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_shared"))
  }

  // variant D: numeric join key — xxhash64 the selected fp before the
  // cap+join so exchanges/compares run on bigint, not 15-char strings
  private def numericKey(df: DataFrame): DataFrame = {
    val fps0 = Dedup.winnowFingerprints(df, "doc_id", "text", k = 5, w = 4)
      .select(col("doc_id"), xxhash64(col("fp")).as("fp"))
    val hot = fps0.groupBy(col("fp")).agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > 1000).select("fp")
    val fps = fps0.join(broadcast(hot), Seq("fp"), "left_anti")
      .hint("shuffle_hash")
    fps.as("a")
      .join(fps.as("b"),
        col("a.fp") === col("b.fp")
          && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_shared"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = Session.local(cpus)
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val stride = math.max(1000000L,
      base.agg(max(col("doc_id"))).head.getLong(0) + 1L)
    val scratch = java.nio.file.Files.createTempDirectory("graft_winprobe")
    base.write.mode("overwrite").parquet(s"$scratch/d1")
    tenX(base, stride).write.mode("overwrite").parquet(s"$scratch/d10")
    val c1 = spark.read.parquet(s"$scratch/d1")
    val c10 = spark.read.parquet(s"$scratch/d10")
    val variants: Seq[(String, DataFrame => DataFrame)] = Seq(
      "current" -> current, "fp_only" -> fpOnly,
      "hash_cap" -> hashCap, "numeric_key" -> numericKey)
    // warmup
    variants.foreach { case (_, f) => f(c1).count(); () }
    variants.foreach { case (name, f) =>
      def t(d: DataFrame): (Double, Long) = {
        val runs = (1 to 3).map { _ =>
          var n = 0L
          val t0 = System.nanoTime()
          n = f(d).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        (runs.map(_._1).min, runs.head._2)
      }
      val (s1, n1) = t(c1)
      val (s10, n10) = t(c10)
      println(f"PROBE $name%-12s sec1=$s1%6.2f sec10=$s10%6.2f growth=${s10 / s1}%5.2f rows1=$n1 rows10=$n10")
    }
    spark.stop()
  }
}

package graft.sources

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-evaluation state for the nondeterministic-batch tests: the
  * suite runs local-mode, so executor tasks share the JVM with the
  * driver and these statics observe exactly how many times a batch
  * lineage was executed (and let a task fire a racing metadata commit
  * mid-staging, deterministically).
  */
object OccSinglePassWriteSpec {
  val evals = new AtomicLong(0L)
  val fired = new AtomicBoolean(false)
  @volatile var raceDir: String = _
  @volatile var raceSession: SparkSession = _
}

/** X140 single-pass write validation: a write batch's lineage executes
  * EXACTLY ONCE (the staging write), and CHECK constraints + GENERATED
  * column agreement are validated against the STAGED BYTES in the same
  * scan that builds the per-file stats — so the validated bytes ARE
  * the committed bytes even for nondeterministic batches, refused
  * writes delete their staged files, and racing metadata changes
  * (constraints, generation rules, column mapping) are surfaced
  * instead of committing stale bytes.
  */
class OccSinglePassWriteSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_spw").toString + "/t"

  private def partFiles(dir: String): Set[String] = {
    val d = new java.io.File(dir)
    Option(d.list()).map(_.toSet).getOrElse(Set.empty)
      .filter(_.startsWith("part-"))
  }

  test("nondeterministic batch: staged bytes are the validated bytes, lineage runs once") {
    val dir = freshDir()
    OccTable.init(Seq((0L, 0L)).toDF("id", "v"), dir)
    OccTable.addCheckConstraint(spark, dir, "v_lt_10", "v < 10")
    OccSinglePassWriteSpec.evals.set(0L)
    val next = udf(() => OccSinglePassWriteSpec.evals.getAndIncrement())
      .asNondeterministic()
    // the ONE execution yields v = 0..9 (all < 10); ANY re-evaluation
    // would yield 10..19, which violates — so the pre-X140 path
    // (validate the lineage, then re-execute it to stage) would have
    // committed violating bytes after a passing validation
    val batch = spark.range(1L, 11L).toDF("id")
      .repartition(1).withColumn("v", next())
    OccTable.append(batch, dir)
    val got = OccTable.read(spark, dir)()
      .filter(col("id") >= 1L).select("v").as[Long].collect().sorted
    assert(got.toSeq === (0L to 9L),
      "committed bytes must be the single staged evaluation")
    assert(OccSinglePassWriteSpec.evals.get() === 10L,
      "the batch lineage must execute exactly once (staging)")
  }

  test("refused batch deletes its staged files — no unreferenced garbage") {
    val dir = freshDir()
    OccTable.init(Seq((1L, 5.0)).toDF("id", "v"), dir,
      statsColumns = Seq("v"))
    OccTable.addCheckConstraint(spark, dir, "v_pos", "v > 0")
    val before = partFiles(dir)
    val e = intercept[OccTable.ConstraintViolationException] {
      OccTable.append(Seq((2L, -1.0)).toDF("id", "v"), dir,
        statsColumns = Seq("v"))
    }
    assert(e.getMessage.contains("v_pos"))
    assert(partFiles(dir) === before,
      "a refused append must leave no staged part files behind")
    // same contract for the rewrite lane (stale generated column)
    OccTable.addGeneratedColumn(spark, dir, "id", "cast(v as bigint) - 4")
    val before2 = partFiles(dir)
    assertThrows[OccTable.ConstraintViolationException] {
      OccTable.rewrite(spark, dir, d => d.withColumn("v", col("v") + 1))
    }
    assert(partFiles(dir) === before2)
  }

  test("a batch omitting a nullable constrained column validates as NULL (SQL CHECK)") {
    val dir = freshDir()
    OccTable.init(Seq((1L, Some(2.0))).toDF("id", "v"), dir)
    OccTable.addCheckConstraint(spark, dir, "v_pos", "v > 0")
    // additive omission: v reads as NULL for these rows, and NULL
    // passes CHECK — the write must succeed, not fail analysis
    OccTable.append(Seq(2L, 3L).toDF("id"), dir)
    val t = OccTable.read(spark, dir)()
    assert(t.count() === 3L)
    assert(t.filter(col("v").isNull).count() === 2L)
    // but a constraint NULL violates (IS NOT NULL shape) refuses the
    // omission — and leaves no staged garbage
    val dir2 = freshDir()
    OccTable.init(Seq((1L, Some(2.0))).toDF("id", "v"), dir2)
    OccTable.addCheckConstraint(spark, dir2, "v_set", "v IS NOT NULL")
    val before = partFiles(dir2)
    assertThrows[OccTable.ConstraintViolationException] {
      OccTable.append(Seq(4L).toDF("id"), dir2)
    }
    assert(partFiles(dir2) === before)
    assert(OccTable.read(spark, dir2)().count() === 1L)
  }

  test("nondeterministic declared rules are refused at declaration") {
    val dir = freshDir()
    OccTable.init(Seq((1L, 0.5)).toDF("id", "r"), dir)
    val e1 = intercept[IllegalArgumentException] {
      OccTable.addCheckConstraint(spark, dir, "coin", "rand() < 2")
    }
    assert(e1.getMessage.contains("nondeterministic"))
    val e2 = intercept[IllegalArgumentException] {
      OccTable.addGeneratedColumn(spark, dir, "r", "rand()")
    }
    assert(e2.getMessage.contains("nondeterministic"))
    assert(OccTable.snapshot(spark, dir).constraints.isEmpty)
    assert(OccTable.snapshot(spark, dir).gencols.isEmpty)
  }

  test("append racing a column-mapping change is refused, staged files discarded") {
    val dir = freshDir()
    OccTable.init(Seq((1L, 1L)).toDF("a", "b"), dir)
    OccSinglePassWriteSpec.fired.set(false)
    OccSinglePassWriteSpec.raceDir = dir
    OccSinglePassWriteSpec.raceSession = spark
    // the batch lineage itself commits a RENAME while the append is
    // staging (local mode: task and driver share a JVM) — the
    // deterministic form of a writer racing a mapping change
    val sneak = udf((x: Long) => {
      if (OccSinglePassWriteSpec.fired.compareAndSet(false, true))
        OccTable.renameColumn(OccSinglePassWriteSpec.raceSession,
          OccSinglePassWriteSpec.raceDir, "a", "z")
      x
    }).asNondeterministic()
    val batch = Seq((2L, 2L)).toDF("a", "b")
      .repartition(1).withColumn("a", sneak(col("a")))
    val before = partFiles(dir)
    val e = intercept[IllegalStateException] { OccTable.append(batch, dir) }
    assert(e.getMessage.contains("column mapping"))
    assert(partFiles(dir) === before,
      "the unrepresentable staged files must be deleted")
    // the rename won; the append never half-landed
    val t = OccTable.read(spark, dir)()
    assert(t.columns.toSeq === Seq("z", "b"))
    assert(t.count() === 1L)
  }

  test("commit gate: adds conflict with an intervening mapping commit") {
    val dir = freshDir()
    OccTable.init(Seq((1L, 1L)).toDF("a", "b"), dir)
    // first rename declares the column_mapping FEATURE; the gate under
    // test is the mapping-change conflict, so race the SECOND rename
    OccTable.renameColumn(spark, dir, "b", "b2")
    val v0 = OccTable.snapshot(spark, dir).version
    OccTable.renameColumn(spark, dir, "a", "c")
    val e = intercept[OccTable.ConcurrentWriteException] {
      OccTable.commitActions(spark, dir, Seq("part-fake"), Seq.empty, v0,
        op = Some("append"))
    }
    assert(e.getMessage.contains("column mapping"))
  }

  test("overwriteSchema keeps the generated-column invariant") {
    val dir = freshDir()
    OccTable.init(Seq((1L, 2L, 3L)).toDF("a", "b", "total"), dir)
    OccTable.addGeneratedColumn(spark, dir, "total", "a + b")
    // a migration that changes a source column but keeps the stale
    // generated value is refused — readers can rely on name = expr
    assertThrows[OccTable.ConstraintViolationException] {
      OccTable.rewrite(spark, dir,
        d => d.withColumn("a", col("a") + lit(10L)),
        overwriteSchema = true)
    }
    assert(OccTable.read(spark, dir)().select("total").as[Long].head === 3L)
    // one that drops the generated column gets it recomputed into the
    // overwritten schema
    OccTable.rewrite(spark, dir,
      d => d.select((col("a") + lit(10L)).as("a"), col("b")),
      overwriteSchema = true)
    val r = OccTable.read(spark, dir)().collect().head
    assert(r.getAs[Long]("total") ===
      r.getAs[Long]("a") + r.getAs[Long]("b"))
  }

  test("over-cap merge stays correct without broadcasting source keys") {
    val dir = freshDir()
    OccTable.init((1L to 20L).map(i => (i, i * 10L)).toDF("k", "v"), dir,
      statsColumns = Seq("k"))
    val src = Seq((5L, 999L), (25L, 250L)).toDF("k", "v")
    val res = OccTable.merge(spark, dir, src, Seq("k"), maxDriverKeys = 1)
    assert(res.candidateFiles > 0)
    val out = OccTable.read(spark, dir)().as[(Long, Long)].collect().toMap
    assert(out(5L) === 999L && out(25L) === 250L && out.size === 21)
  }
}

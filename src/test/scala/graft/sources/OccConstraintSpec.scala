package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X132 CHECK constraints: declared invariants hold for every row any
  * reader ever sees — adding validates existing data, every writing
  * verb refuses violating batches at the commit boundary, NULL passes
  * (SQL semantics), and the declaration survives checkpoint +
  * truncation because it is log state.
  */
class OccConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_chk").toString + "/t"

  test("add validates existing rows; append/merge/rewrite refuse violations; NULL passes; drop lifts") {
    val dir = freshDir()
    OccTable.init((1L to 10L).map(i => (i, Some(i * 1.0)))
      .toDF("id", "v"), dir)
    OccTable.addCheckConstraint(spark, dir, "v_positive", "v > 0")

    // violating batch refused by name, table unchanged
    val bad = Seq((11L, Some(-1.0))).toDF("id", "v")
    val e = intercept[OccTable.ConstraintViolationException] {
      OccTable.append(bad, dir)
    }
    assert(e.getMessage.contains("v_positive"))
    assert(OccTable.read(spark, dir)().count() === 10L)

    // valid batch and NULL both pass (CHECK fails only on FALSE)
    OccTable.append(Seq((11L, Some(2.0)), (12L, Option.empty[Double]))
      .toDF("id", "v"), dir)
    assert(OccTable.read(spark, dir)().count() === 12L)

    // merge source and rewrite output face the same gate
    assertThrows[OccTable.ConstraintViolationException] {
      OccTable.merge(spark, dir,
        Seq((5L, Some(-5.0))).toDF("id", "v"), Seq("id"))
    }
    assertThrows[OccTable.ConstraintViolationException] {
      OccTable.rewrite(spark, dir, d => d.withColumn("v", -col("v")))
    }

    // the declaration is log state: survives checkpoint + truncation
    OccTable.checkpoint(spark, dir)
    OccTable.truncateLog(spark, dir)
    assert(OccTable.snapshot(spark, dir).constraints ===
      Map("v_positive" -> "v > 0"))
    assertThrows[OccTable.ConstraintViolationException] {
      OccTable.append(bad, dir)
    }

    // drop lifts the gate; re-adding over now-violating data refuses
    OccTable.dropCheckConstraint(spark, dir, "v_positive")
    OccTable.append(bad, dir)
    assert(OccTable.read(spark, dir)().count() === 13L)
    val e2 = intercept[OccTable.ConstraintViolationException] {
      OccTable.addCheckConstraint(spark, dir, "v_positive", "v > 0")
    }
    assert(e2.getMessage.contains("existing table data"))

    // duplicate-name and unknown-drop refusals
    OccTable.addCheckConstraint(spark, dir, "id_pos", "id > 0")
    assertThrows[IllegalArgumentException] {
      OccTable.addCheckConstraint(spark, dir, "id_pos", "id >= 0")
    }
    assertThrows[IllegalArgumentException] {
      OccTable.dropCheckConstraint(spark, dir, "nope")
    }
    // the ops surface in history — the FIRST add_constraint was
    // absorbed by checkpoint+truncation above (its commit file is gone,
    // its declaration lives on in the checkpoint), so one of each
    // post-truncation verb remains addressable
    val ops = OccTable.history(spark, dir)
      .select("operation").as[String].collect()
    assert(ops.count(_ == "add_constraint") === 1)
    assert(ops.count(_ == "drop_constraint") === 1)
  }

  test("zero-row writes pass constraint enforcement (sum-over-empty is not a violation)") {
    val dir = freshDir()
    OccTable.init((1L to 10L).map(i => (i, i * 1.0)).toDF("id", "v"), dir)
    OccTable.addCheckConstraint(spark, dir, "v_positive", "v > 0")

    // empty append batch: enforced, passes, commits
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    OccTable.append(empty, dir)
    assert(OccTable.read(spark, dir)().count() === 10L)

    // delete-only CDC merge batch: inserts frame is EMPTY after the
    // delete-flag filter — must delete the row, not NPE
    val delOnly = Seq((5L, 5.0, true)).toDF("id", "v", "__del")
    OccTable.merge(spark, dir, delOnly, Seq("id"),
      deleteCol = Some("__del"))
    assert(OccTable.read(spark, dir)().count() === 9L)
    assert(OccTable.read(spark, dir)()
      .filter(col("id") === 5L).count() === 0L)
  }

  test("a CHECK constraint landing after a writer's read conflicts the writer's commit (TOCTOU)") {
    val dir = freshDir()
    OccTable.init((1L to 10L).map(i => (i, i * 1.0)).toDF("id", "v"), dir)
    val staleVersion = OccTable.snapshot(spark, dir).version
    OccTable.addCheckConstraint(spark, dir, "v_positive", "v > 0")
    // a data-adding commit validated against the PRE-constraint
    // snapshot must fail as a conflict so the writer re-snapshots and
    // re-enforces — Delta's metadata-changed conflict
    val e = intercept[OccTable.ConcurrentWriteException] {
      OccTable.commitActions(spark, dir, Seq("part-raced.parquet"),
        Seq.empty, staleVersion, op = Some("append"))
    }
    assert(e.getMessage.contains("CHECK constraint"))

    // the public retry path lands valid batches and refuses violating
    // ones against the REFRESHED constraint set
    OccTable.append(Seq((11L, 2.0)).toDF("id", "v"), dir)
    assert(OccTable.read(spark, dir)().count() === 11L)

    // the SCHEMA-CHANGING shape of the same race: a rename validated
    // before the constraint landed must conflict too, or it could
    // commit a schema the new expression no longer resolves against
    val stale2 = OccTable.snapshot(spark, dir).version
    OccTable.addCheckConstraint(spark, dir, "id_pos", "id > 0")
    val e2 = intercept[OccTable.ConcurrentWriteException] {
      OccTable.commitActions(spark, dir, Seq.empty, Seq.empty, stale2,
        newSchemaJson = Some(OccTable.snapshot(spark, dir)
          .schema.get.json),
        op = Some("rename_column"))
    }
    assert(e2.getMessage.contains("CHECK constraint"))
  }
}

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
}

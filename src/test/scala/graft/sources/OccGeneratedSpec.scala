package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X138 generated columns: `GENERATED ALWAYS AS` — a declared rule
  * COMPUTES the column when a write omits it and REFUSES writes that
  * supply different values, so `name = expr` holds for every row any
  * reader sees. The canonical composition is partition-by-generated:
  * the ingest carries only the timestamp, the engine derives the
  * day bucket, and partition pruning works off the log.
  */
class OccGeneratedSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_gencol").toString + "/t"

  test("absent column computed, supplied column validated, mismatch refused") {
    val dir = freshDir()
    OccTable.init(Seq((1L, 10.0, 20.0)).toDF("id", "a", "total"), dir)
    OccTable.addGeneratedColumn(spark, dir, "total", "a * 2")

    // batch WITHOUT the column: computed
    OccTable.append(Seq((2L, 5.0)).toDF("id", "a"), dir)
    val rows = OccTable.read(spark, dir)()
      .select("id", "total").as[(Long, Double)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((1L, 20.0), (2L, 10.0)))

    // batch WITH matching values: accepted
    OccTable.append(Seq((3L, 1.0, 2.0)).toDF("id", "a", "total"), dir)
    assert(OccTable.read(spark, dir)().count() === 3L)

    // batch WITH a mismatch: refused by name, table unchanged
    val e = intercept[OccTable.ConstraintViolationException] {
      OccTable.append(Seq((4L, 1.0, 99.0)).toDF("id", "a", "total"), dir)
    }
    assert(e.getMessage.contains("GENERATED"))
    assert(e.getMessage.contains("total"))
    assert(OccTable.read(spark, dir)().count() === 3L)

    // merge inserts face the same gate; computed when absent
    OccTable.merge(spark, dir, Seq((5L, 4.0)).toDF("id", "a"), Seq("id"))
    assert(OccTable.read(spark, dir)().filter(col("id") === 5L)
      .select("total").as[Double].head() === 8.0)
    assertThrows[OccTable.ConstraintViolationException] {
      OccTable.merge(spark, dir,
        Seq((6L, 4.0, 0.0)).toDF("id", "a", "total"), Seq("id"))
    }

    // a rewrite that drops the column gets it recomputed; one that
    // breaks the invariant is refused
    OccTable.rewrite(spark, dir, d => d.drop("total"))
    assert(OccTable.read(spark, dir)().filter(col("id") === 2L)
      .select("total").as[Double].head() === 10.0)
    assertThrows[OccTable.ConstraintViolationException] {
      OccTable.rewrite(spark, dir,
        d => d.withColumn("a", col("a") + 1))
    }
  }

  test("declare validates existing data; non-empty table without the column refuses; drop lifts the rule") {
    val dir = freshDir()
    OccTable.init(Seq((1L, 10.0, 99.0)).toDF("id", "a", "total"), dir)
    // existing rows violate the candidate rule: refused
    val e = intercept[OccTable.ConstraintViolationException] {
      OccTable.addGeneratedColumn(spark, dir, "total", "a * 2")
    }
    assert(e.getMessage.contains("existing table data"))
    // a rule for a column the non-empty table lacks: refused (no
    // implicit backfill rewrite)
    assertThrows[IllegalArgumentException] {
      OccTable.addGeneratedColumn(spark, dir, "day", "cast(id % 7 as bigint)")
    }
    // self-reference refused at declaration
    assertThrows[IllegalArgumentException] {
      OccTable.addGeneratedColumn(spark, dir, "total", "total")
    }
    // fix the data, declare, drop — a post-drop mismatch is accepted
    OccTable.rewrite(spark, dir, d => d.withColumn("total", col("a") * 2))
    OccTable.addGeneratedColumn(spark, dir, "total", "a * 2")
    OccTable.dropGeneratedColumn(spark, dir, "total")
    OccTable.append(Seq((2L, 1.0, 123.0)).toDF("id", "a", "total"), dir)
    assert(OccTable.read(spark, dir)().count() === 2L)
    // history stamps both verbs
    val ops = OccTable.history(spark, dir)
      .select("operation").as[String].collect()
    assert(ops.contains("add_gencol") && ops.contains("drop_gencol"))
  }

  test("partition-by-generated: ingest carries only ts, pruning works, rule survives checkpoint + clone; rename gated") {
    val dir = freshDir()
    // empty-shaped init: one seed row carrying the generated column so
    // the schema records it, then declare
    OccTable.init(Seq((0L, 0L, 0L)).toDF("id", "tsm", "bucket")
      .filter(lit(false)), dir)
    OccTable.addGeneratedColumn(spark, dir, "bucket", "tsm div 100")
    // appends carry only (id, tsm); the engine computes the bucket and
    // partitions by it
    OccTable.append((1L to 200L).map(i => (i, i)).toDF("id", "tsm"),
      dir, partitionBy = Seq("bucket"))
    val snap = OccTable.snapshot(spark, dir)
    assert(snap.pvs.nonEmpty)
    val pruned = OccTable.readPartitionPruned(spark, dir,
      Seq("bucket" -> "1"))
    assert(pruned.inputFiles.length < snap.files.size)
    assert(pruned.select("id").as[Long].collect().sorted.toSeq ===
      (100L to 199L))

    // the rule is log state: survives checkpoint + truncation + clone
    OccTable.checkpoint(spark, dir)
    OccTable.truncateLog(spark, dir)
    assert(OccTable.snapshot(spark, dir).gencols ===
      Map("bucket" -> "tsm div 100"))
    val dir2 = freshDir()
    val cloned = OccTable.clone(spark, dir, dir2)
    assert(cloned.gencols === Map("bucket" -> "tsm div 100"))
    OccTable.append(Seq((1000L, 1000L)).toDF("id", "tsm"), dir2)
    assert(OccTable.read(spark, dir2)()
      .filter(col("id") === 1000L).select("bucket").as[Long]
      .head() === 10L)

    // renaming the generated column, or a column its rule reads,
    // refuses until the rule is dropped
    assertThrows[IllegalArgumentException] {
      OccTable.renameColumn(spark, dir, "bucket", "b2")
    }
    assertThrows[IllegalArgumentException] {
      OccTable.renameColumn(spark, dir, "tsm", "ts2")
    }
    OccTable.dropGeneratedColumn(spark, dir, "bucket")
    OccTable.renameColumn(spark, dir, "tsm", "ts2")
    assert(OccTable.read(spark, dir)().columns.toSeq ===
      Seq("id", "ts2", "bucket"))
  }

  test("schema overwrite and restore refuse shapes a surviving rule cannot analyze against") {
    val dir = freshDir()
    OccTable.init(Seq((1L, 1.0)).toDF("id", "b"), dir)         // v0
    // evolution adds a AND total; v0's row reads both as NULL, which
    // satisfies the rule null-safely (a*2 of NULL is NULL)
    OccTable.append(Seq((2L, 2.0, 5.0, 10.0))
      .toDF("id", "b", "a", "total").coalesce(1), dir)         // v1
    OccTable.addGeneratedColumn(spark, dir, "total", "a * 2")  // v2
    // an overwrite that drops the rule's source column would wedge
    // every later write inside generation — refused by name up front
    val e = intercept[IllegalArgumentException] {
      OccTable.rewrite(spark, dir, d => d.select("id", "total"),
        overwriteSchema = true)
    }
    assert(e.getMessage.contains("generated column"))
    // restoring to the pre-evolution schema (no 'a', no 'total')
    // breaks the surviving rule the same way — refused, table intact
    assertThrows[IllegalArgumentException] {
      OccTable.restore(spark, dir, 0L)
    }
    assert(OccTable.read(spark, dir)().count() === 2L)
    // dropping the rule unblocks both
    OccTable.dropGeneratedColumn(spark, dir, "total")
    OccTable.restore(spark, dir, 0L)
    assert(OccTable.read(spark, dir)().columns.toSeq === Seq("id", "b"))
  }
}

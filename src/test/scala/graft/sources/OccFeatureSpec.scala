package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X139 table-feature gate (Delta protocol/table-features parity): the
  * first commit using deletion vectors / column mapping / generated
  * columns declares the feature in the log, and a reader that does not
  * implement a declared feature refuses BY NAME at snapshot time —
  * never silently serving deleted rows or misnamed columns.
  */
class OccFeatureSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_feature").toString + "/t"

  test("features accumulate on first use, survive checkpoint + truncation, ride the clone") {
    val dir = freshDir()
    OccTable.init((1L to 100L).map(i => (i, i * 2.0)).toDF("id", "v")
      .coalesce(1), dir, statsColumns = Seq("id"))
    assert(OccTable.snapshot(spark, dir).features === Set.empty)

    OccTable.deleteRangeDv(spark, dir, "id", 1.0, 5.0)
    assert(OccTable.snapshot(spark, dir).features ===
      Set("deletion_vectors"))
    OccTable.renameColumn(spark, dir, "v", "reading")
    OccTable.addGeneratedColumn(spark, dir, "reading", "cast(id * 2 as double)")
    // X146 split: generated columns are a WRITER-ONLY feature (readers
    // serve the materialized bytes), mapping/DVs gate readers
    val all = Set("deletion_vectors", "column_mapping")
    val allW = Set("generated_columns")
    assert(OccTable.snapshot(spark, dir).features === all)
    assert(OccTable.snapshot(spark, dir).wfeatures === allW)

    // re-using a feature does NOT re-declare it (one line, ever)
    OccTable.deleteRangeDv(spark, dir, "id", 6.0, 7.0)
    OccTable.checkpoint(spark, dir)
    OccTable.truncateLog(spark, dir)
    assert(OccTable.snapshot(spark, dir).features === all)
    assert(OccTable.snapshot(spark, dir).wfeatures === allW)

    val dir2 = freshDir()
    assert(OccTable.clone(spark, dir, dir2).features === all)
    assert(OccTable.snapshot(spark, dir2).features === all)
    assert(OccTable.snapshot(spark, dir2).wfeatures === allW)
  }

  test("writer-only features: readers tolerate, every committing verb refuses") {
    val dir = freshDir()
    OccTable.init((1L to 10L).map(i => (i, i * 2.0)).toDF("id", "v")
      .coalesce(1), dir)
    // a NEWER engine declares a writer-only feature this build lacks
    val fsys = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v1 = new Path(s"$dir/_graft_occ/v${"%020d".format(1L)}")
    val out = fsys.create(v1, false)
    out.write("op future_verb\nwfeature quantum_merge\n".getBytes("UTF-8"))
    out.close()
    // READS keep working — the data is materialized
    assert(OccTable.read(spark, dir)().count() === 10L)
    assert(OccTable.snapshot(spark, dir).wfeatures ===
      Set("quantum_merge"))
    // WRITES refuse by name: enforcing a contract this build cannot
    // read would corrupt the table
    val e = intercept[OccTable.UnsupportedTableFeatureException] {
      OccTable.append(Seq((11L, 22.0)).toDF("id", "v"), dir)
    }
    assert(e.unsupported === Set("quantum_merge"))
    assertThrows[OccTable.UnsupportedTableFeatureException] {
      OccTable.rewrite(spark, dir, d => d)
    }
    assertThrows[OccTable.UnsupportedTableFeatureException] {
      OccTable.addCheckConstraint(spark, dir, "c", "v > 0")
    }
    // a checkpoint would re-serialize metadata it cannot parse — refuse
    assertThrows[OccTable.UnsupportedTableFeatureException] {
      OccTable.checkpoint(spark, dir)
    }
  }

  test("constraints declare the check_constraints writer feature") {
    val dir = freshDir()
    OccTable.init(Seq((1L, 2.0)).toDF("id", "v"), dir)
    OccTable.addCheckConstraint(spark, dir, "v_pos", "v > 0")
    val snap = OccTable.snapshot(spark, dir)
    assert(snap.wfeatures === Set("check_constraints"))
    assert(snap.features === Set.empty)
    // second constraint does not re-declare
    OccTable.addCheckConstraint(spark, dir, "id_pos", "id > 0")
    OccTable.checkpoint(spark, dir)
    OccTable.truncateLog(spark, dir)
    assert(OccTable.snapshot(spark, dir).wfeatures ===
      Set("check_constraints"))
  }

  test("a feature declared after a writer's read conflicts the writer's commit (TOCTOU)") {
    val dir = freshDir()
    OccTable.init((1L to 100L).map(i => (i, i * 2.0)).toDF("id", "v")
      .coalesce(1), dir, statsColumns = Seq("id"))
    val stale = OccTable.snapshot(spark, dir).version
    OccTable.deleteRangeDv(spark, dir, "id", 1.0, 5.0) // declares the feature
    // a write validated against the pre-feature snapshot must fail as
    // a conflict so the writer re-snapshots and honors (or refuses)
    // the feature's write contract
    val e = intercept[OccTable.ConcurrentWriteException] {
      OccTable.commitActions(spark, dir, Seq("part-raced.parquet"),
        Seq.empty, stale, op = Some("append"))
    }
    assert(e.getMessage.contains("FEATURE"))
    // the public retry path still lands appends afterwards
    OccTable.append(Seq((200L, 1.0)).toDF("id", "v"), dir)
    assert(OccTable.read(spark, dir)().count() === 96L)
  }

  test("an undeclared future feature refuses by name; history below it stays readable") {
    val dir = freshDir()
    OccTable.init((1L to 10L).map(i => (i, i * 2.0)).toDF("id", "v")
      .coalesce(1), dir) // v0
    OccTable.append(Seq((11L, 22.0)).toDF("id", "v").coalesce(1),
      dir) // v1
    // a NEWER engine commits v2 with a feature this build lacks
    val fsys = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v2 = new Path(s"$dir/_graft_occ/v${"%020d".format(2L)}")
    val out = fsys.create(v2, false)
    out.write("op future_verb\nfeature time_crystals\n".getBytes("UTF-8"))
    out.close()

    val e = intercept[OccTable.UnsupportedTableFeatureException] {
      OccTable.snapshot(spark, dir)
    }
    assert(e.unsupported === Set("time_crystals"))
    assert(e.getMessage.contains("time_crystals"))
    // every read path refuses identically (they all fold the snapshot)
    assertThrows[OccTable.UnsupportedTableFeatureException] {
      OccTable.read(spark, dir)()
    }
    // time travel BELOW the declaring version still serves (the fold
    // never reaches the feature line)
    assert(OccTable.readAt(spark, dir, 1L)().count() === 11L)
    assert(OccTable.readAt(spark, dir, 0L)().count() === 10L)
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** X137 column mapping: RENAME/DROP COLUMN as pure metadata commits —
  * physical names never change, zero bytes move, readers alias
  * physical→logical at scan time, and every pruning lookup (stats,
  * partition values, bloom sidecars) translates through the mapping.
  * The two resurrection shapes (re-add a dropped name, add a column
  * shadowing a renamed column's physical name) refuse loudly.
  */
class OccColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_colmap").toString + "/t"

  /** 400 rows, 4 range-clustered files, stats on id, bloom on user. */
  private def initTable(dir: String): Unit = {
    val df = (1L to 400L).map(i => (i, s"u$i", i * 2.0))
      .toDF("id", "user", "v")
      .repartitionByRange(4, col("id"))
    OccTable.init(df, dir, statsColumns = Seq("id"),
      bloomColumns = Seq(OccBloom.BloomCol("user", 200L, 0.01)))
  }

  test("widening composes with rename: mapped pre-widening files promote under the new name") {
    val dir = freshDir()
    // gen 1: int metric under physical name 'v'
    OccTable.init((1L to 10L).map(i => (i, (i * 10).toInt))
      .toDF("id", "v").withColumn("v", col("v").cast("int")).coalesce(1),
      dir, statsColumns = Seq("v"))
    OccTable.renameColumn(spark, dir, "v", "metric") // physical stays 'v'
    OccTable.widenColumn(spark, dir, "metric",
      org.apache.spark.sql.types.LongType)
    val snap = OccTable.snapshot(spark, dir)
    assert(snap.colmap("metric") === "v")
    assert(snap.schema.get("metric").dataType ===
      org.apache.spark.sql.types.LongType)
    // gen 2: long values beyond int range, written under physical 'v'
    OccTable.append(Seq((11L, 3000000011L)).toDF("id", "metric")
      .coalesce(1), dir, statsColumns = Seq("metric"))
    val out = OccTable.read(spark, dir)().select("id", "metric")
      .as[(Long, Long)].collect().toMap
    assert(out(1L) === 10L && out(11L) === 3000000011L && out.size === 11)
    // stats keyed under physical 'v' still prune through rename+widen
    assert(OccTable.pruneFileSet(spark, dir,
      OccTable.snapshot(spark, dir), Seq.empty,
      Seq(("metric", 3000000000.0, 4000000000.0)), Seq.empty).size === 1)
    // rename AFTER the widening keeps serving both generations
    OccTable.renameColumn(spark, dir, "metric", "m2")
    assert(OccTable.read(spark, dir)().filter(col("id") === 1L)
      .select("m2").as[Long].head === 10L)
  }

  test("rename is pure metadata: same files, logical reads, stats + bloom pruning translate") {
    val dir = freshDir()
    initTable(dir)
    val pre = OccTable.snapshot(spark, dir)
    OccTable.renameColumn(spark, dir, "v", "reading")
    val post = OccTable.snapshot(spark, dir)
    // zero file churn, mapping recorded, schema renamed in place
    assert(post.files === pre.files)
    assert(post.colmap === Map("id" -> "id", "user" -> "user",
      "reading" -> "v"))
    assert(post.schema.get.fieldNames.toSeq ===
      Seq("id", "user", "reading"))

    val t = OccTable.read(spark, dir)()
    assert(t.columns.toSeq === Seq("id", "user", "reading"))
    assert(t.filter(col("id") === 42L).select("reading")
      .as[Double].collect().toSeq === Seq(84.0))

    // stats pruning via the (unrenamed) id column still bites and the
    // renamed column projects through it
    val pruned = OccTable.readPruned(spark, dir, "id", 1.0, 100.0)
    assert(pruned.inputFiles.length < post.files.size)
    assert(pruned.agg(sum("reading")).head.getDouble(0) ===
      (1L to 100L).map(_ * 2.0).sum)

    // bloom lookup translates: sidecars were built under 'user' and a
    // rename of user must keep probing them
    OccTable.renameColumn(spark, dir, "user", "account")
    val snap2 = OccTable.snapshot(spark, dir)
    val cand = OccTable.bloomPrunedFiles(spark, dir, snap2,
      "account", Seq("u42"))
    assert(cand.size < snap2.files.size)
    val got = OccTable.readEqualityPruned(spark, dir, "account",
      Seq("u42")).select("id").as[Long].collect().toSeq
    assert(got === Seq(42L))

    // rename the STATS column and prune through the new name
    OccTable.renameColumn(spark, dir, "id", "event_id")
    val pruned2 = OccTable.readPruned(spark, dir, "event_id", 1.0, 100.0)
    assert(pruned2.inputFiles.length < 4)
    assert(pruned2.count() === 100L)
  }

  test("writes after a rename stage under PHYSICAL names; merge keys on a renamed column") {
    val dir = freshDir()
    initTable(dir)
    OccTable.renameColumn(spark, dir, "v", "reading")
    val pre = OccTable.snapshot(spark, dir)

    // append in the NEW logical shape
    OccTable.append(Seq((500L, "u500", 1000.0))
      .toDF("id", "user", "reading").coalesce(1), dir,
      statsColumns = Seq("id"))
    val post = OccTable.snapshot(spark, dir)
    val newFile = post.files.filterNot(pre.files.toSet)
    assert(newFile.size === 1)
    // the staged file carries the PHYSICAL column name
    val raw = spark.read.parquet(s"$dir/${newFile.head}")
    assert(raw.columns.contains("v") && !raw.columns.contains("reading"))
    // and its stats landed under the physical key, so pruning on the
    // logical name finds the new row
    assert(OccTable.readPruned(spark, dir, "id", 450.0, 600.0)
      .select("reading").as[Double].collect().toSeq === Seq(1000.0))

    // merge whose key column is renamed-away ('id' still) and whose
    // payload is the renamed column
    val res = OccTable.merge(spark, dir,
      Seq((42L, "u42", -1.0)).toDF("id", "user", "reading"),
      Seq("id"), statsColumns = Seq("id"))
    assert(res.candidateFiles < res.totalFiles)
    assert(OccTable.read(spark, dir)().filter(col("id") === 42L)
      .select("reading").as[Double].collect().toSeq === Seq(-1.0))
    assert(OccTable.read(spark, dir)().count() === 401L)
  }

  test("drop column: files untouched, bytes unread, tombstone blocks re-add and shadowing rename") {
    val dir = freshDir()
    initTable(dir)
    val pre = OccTable.snapshot(spark, dir)
    OccTable.dropColumn(spark, dir, "v")
    val post = OccTable.snapshot(spark, dir)
    assert(post.files === pre.files)
    assert(post.colTombs === Set("v"))
    val t = OccTable.read(spark, dir)()
    assert(t.columns.toSeq === Seq("id", "user"))
    assert(t.count() === 400L)

    // re-adding the dropped name refuses by name (pre-drop files would
    // resurrect the old bytes)
    val e = intercept[IllegalArgumentException] {
      OccTable.append(Seq((500L, "u500", 9.9)).toDF("id", "user", "v"),
        dir)
    }
    assert(e.getMessage.contains("retired"))
    // renaming another column INTO the tombstoned physical refuses too
    assertThrows[IllegalArgumentException] {
      OccTable.renameColumn(spark, dir, "user", "v")
    }
    // a different new column is fine
    OccTable.append(Seq((500L, "u500", "ok"))
      .toDF("id", "user", "note").coalesce(1), dir)
    assert(OccTable.read(spark, dir)().columns.toSeq ===
      Seq("id", "user", "note"))

    // rename a→b then adding a new 'a' refuses (would shadow b's bytes)
    OccTable.renameColumn(spark, dir, "user", "account")
    val e2 = intercept[IllegalArgumentException] {
      OccTable.append(Seq((501L, "x", "y"))
        .toDF("id", "user", "note"), dir)
    }
    assert(e2.getMessage.contains("serves renamed column"))
  }

  test("constraints gate the mapping verbs; checkpoint + truncation carry the mapping") {
    val dir = freshDir()
    initTable(dir)
    OccTable.addCheckConstraint(spark, dir, "v_pos", "v > 0")
    val e = intercept[IllegalArgumentException] {
      OccTable.renameColumn(spark, dir, "v", "reading")
    }
    assert(e.getMessage.contains("v_pos"))
    assertThrows[IllegalArgumentException] {
      OccTable.dropColumn(spark, dir, "v")
    }
    OccTable.dropCheckConstraint(spark, dir, "v_pos")
    OccTable.renameColumn(spark, dir, "v", "reading")
    OccTable.dropColumn(spark, dir, "user")

    OccTable.checkpoint(spark, dir)
    OccTable.truncateLog(spark, dir)
    val snap = OccTable.snapshot(spark, dir)
    assert(snap.colmap === Map("id" -> "id", "reading" -> "v"))
    assert(snap.colTombs === Set("user"))
    assert(OccTable.read(spark, dir)().columns.toSeq ===
      Seq("id", "reading"))
    // history stamps both verbs
    val ops = OccTable.history(spark, dir)
      .select("operation").as[String].collect().toSet
    assert(!ops.contains("rename_column")) // absorbed by truncation
    OccTable.renameColumn(spark, dir, "reading", "metric")
    assert(OccTable.history(spark, dir).select("operation")
      .as[String].collect().contains("rename_column"))
  }

  test("restore across a rename rewinds the mapping; clone carries it; overwrite rewrite clears it") {
    val dir = freshDir()
    initTable(dir) // v0
    OccTable.renameColumn(spark, dir, "v", "reading") // v1
    OccTable.append(Seq((500L, "u500", 1.0))
      .toDF("id", "user", "reading").coalesce(1), dir) // v2

    // clone carries the mapping
    val dir2 = freshDir()
    val cloned = OccTable.clone(spark, dir, dir2)
    assert(cloned.colmap("reading") === "v")
    assert(OccTable.read(spark, dir2)().columns.toSeq ===
      Seq("id", "user", "reading"))
    assert(OccTable.read(spark, dir2)().count() === 401L)

    // restore to the pre-rename version: old logical name back,
    // mapping cleared (the target predates it)
    OccTable.restore(spark, dir, 0L) // v3
    val snap = OccTable.snapshot(spark, dir)
    assert(snap.colmap.isEmpty)
    assert(OccTable.read(spark, dir)().columns.toSeq ===
      Seq("id", "user", "v"))
    assert(OccTable.read(spark, dir)().count() === 400L)
    // forward again: the mapping returns with the restored schema
    OccTable.restore(spark, dir, 2L) // v4
    assert(OccTable.snapshot(spark, dir).colmap("reading") === "v")
    assert(OccTable.read(spark, dir)().count() === 401L)

    // an overwrite rewrite replaces every file: physical = logical
    // again, mapping cleared in the same commit
    OccTable.rewrite(spark, dir,
      d => d.select(col("id"), col("reading").as("value")).coalesce(1),
      overwriteSchema = true)
    val after = OccTable.snapshot(spark, dir)
    assert(after.colmap.isEmpty)
    assert(after.everMapped) // the cleared history stays visible
    assert(OccTable.read(spark, dir)().columns.toSeq ===
      Seq("id", "value"))
    val raw = spark.read.parquet(
      after.files.map(f => s"$dir/$f"): _*)
    assert(raw.columns.toSeq === Seq("id", "value")) // physical too
  }

  test("a colmapclear overwrite conflicts with a racing append staged under the old mapping") {
    val dir = freshDir()
    initTable(dir)
    OccTable.renameColumn(spark, dir, "v", "reading")
    // the racing append lands BETWEEN the overwrite's read and claim
    // (committed from inside its transform) — without the conflict the
    // appended file would survive the clear carrying physical 'v' and
    // serve reading = NULL forever
    assertThrows[OccTable.ConcurrentWriteException] {
      OccTable.rewrite(spark, dir, d => {
        OccTable.append(Seq((999L, "u999", 1.0))
          .toDF("id", "user", "reading").coalesce(1), dir)
        d.coalesce(1)
      }, overwriteSchema = true, maxRetries = 0)
    }
    // nothing half-applied: the append is live, the mapping intact
    assert(OccTable.snapshot(spark, dir).colmap.nonEmpty)
    assert(OccTable.read(spark, dir)().count() === 401L)
    assert(OccTable.read(spark, dir)().filter(col("id") === 999L)
      .select("reading").as[Double].collect().toSeq === Seq(1.0))
  }

  test("the tail serves real values across a rename AND across a colmapclear overwrite") {
    val dir = freshDir()
    OccTable.init((1L to 50L).map(i => (i, i * 2.0)).toDF("id", "v")
      .coalesce(1), dir)                                   // v0
    OccTable.renameColumn(spark, dir, "v", "reading")      // v1
    OccTable.append((51L to 100L).map(i => (i, i * 2.0))
      .toDF("id", "reading").coalesce(1), dir)             // v2 (physical 'v')
    OccTable.rewrite(spark, dir,
      d => d.filter(col("id") <= 100L).coalesce(1),
      overwriteSchema = true)                              // v3: clear, physical 'reading'
    OccTable.append(Seq((101L, 202.0)).toDF("id", "reading")
      .coalesce(1), dir)                                   // v4 (physical 'reading')
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Double])]
    val q = OccStream.tailTo(spark, dir,
      Files.createTempDirectory("graft_colmap_tail2").toString,
      (batch, _) => {
        assert(batch.columns.toSeq === Seq("id", "reading"))
        rows ++= batch.select("id", "reading")
          .as[(Long, Option[Double])].collect()
        ()
      },
      onRewrite = "skipRewrites",
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()
    // v0 predates the rename: its era cannot link 'v' to 'reading'
    // (the documented replay hazard of skipRewrites across a clear);
    // v2's era mapping links reading -> physical v, and v4 is native —
    // both must serve REAL values, not NULLs
    val byId = rows.toMap
    assert(byId(60L) === Some(120.0))  // v2-era file through the mapping
    assert(byId(101L) === Some(202.0)) // post-clear file
    assert(rows.count(_._2.nonEmpty) >= 51)
  }

  test("column pruning pushes through the mapping alias: a 1-column logical projection scans 1 physical column") {
    val dir = freshDir()
    initTable(dir)
    OccTable.renameColumn(spark, dir, "v", "reading")
    val plan = OccTable.read(spark, dir)().select("reading")
      .queryExecution.executedPlan
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty)
    // the aliasing Project must NOT defeat pruning: the scan reads
    // exactly the one PHYSICAL column backing the logical projection —
    // at 100 TB a full-width read here would be the whole ballgame
    assert(scans.head.requiredSchema.fieldNames.toSeq === Seq("v"))
  }

  test("deletion vectors, change feed, optimize, and the tail all compose with a mapping") {
    val dir = freshDir()
    initTable(dir) // v0
    OccTable.renameColumn(spark, dir, "v", "reading") // v1
    // DV delete THROUGH the renamed column: stats lookups translate,
    // the anti-join's _metadata resolves through the aliasing select
    val dv = OccTable.deleteRangeDv(spark, dir, "reading", 2.0, 20.0) // v2
    assert(dv.markedRows === 10L)
    val t = OccTable.read(spark, dir)()
    assert(t.count() === 390L)
    assert(t.filter(col("id") <= 10L).count() === 0L)

    // the change feed across rename + DV versions: the rename (v1)
    // churns no files and emits nothing; the DV commit emits removals
    val ch = OccTable.tableChanges(spark, dir, 0L, 1L,
      Seq("id"), Seq("user"))
    assert(ch.count() === 0L)
    val ch2 = OccTable.tableChanges(spark, dir, 1L, 2L,
      Seq("id"), Seq("user")).select("id", "status")
      .as[(Long, String)].collect().sorted.toSeq
    assert(ch2 === (1L to 10L).map(i => (i, "removed")))
    // a feed SPANNING the rename asking for the RENAMED column: the
    // pre-rename side serves its real bytes through the stable
    // physical name, so ONLY the DV-deleted keys surface — not an
    // all-rows-"changed" storm from the old side reading as NULL
    val span = OccTable.tableChanges(spark, dir, 0L, 2L,
      Seq("id"), Seq("reading")).select("id", "status")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(span === (1L to 10L).map(i => (i, "removed")))

    // optimize under a mapping: purge + pack keeps logical reads and
    // stages physical columns
    OccTable.purgeDvs(spark, dir) // v3
    OccTable.optimize(spark, dir) // v4
    val snap = OccTable.snapshot(spark, dir)
    assert(snap.dvs.isEmpty)
    assert(OccTable.read(spark, dir)().count() === 390L)
    val raw = spark.read.parquet(snap.files.map(f => s"$dir/$f"): _*)
    assert(raw.columns.contains("v") && !raw.columns.contains("reading"))

    // the tail serves the CURRENT logical shape across the history
    val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    var rows = 0L
    val q = OccStream.tailTo(spark, dir,
      Files.createTempDirectory("graft_colmap_tail").toString,
      (batch, _) => {
        seen += batch.columns.toSeq
        rows += batch.count()
        ()
      },
      onRewrite = "skipRewrites", trigger = Trigger.AvailableNow())
    q.awaitTermination()
    assert(seen.nonEmpty)
    assert(seen.forall(_ === Seq("id", "user", "reading")))
    assert(rows === 400L) // v0's adds; later versions are all rewrites
  }
}

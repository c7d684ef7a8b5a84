package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X134 DELETION VECTORS: row-level deletes with zero file rewrites —
  * the data file set is physically unchanged, every reader (plain,
  * pruned, change feed) serves the post-delete rows, layered deletes
  * union, restore rewinds them, purge materializes them away, and
  * vacuum reclaims superseded sidecars.
  */
class OccDvSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_dv").toString + "/t"

  private def ids(dir: String): Seq[Long] =
    OccTable.read(spark, dir)().select("id").as[Long]
      .collect().sorted.toSeq

  test("range DV delete: zero rewrites, all readers honor it, layered deletes union, vacuum reclaims superseded sidecars") {
    val dir = freshDir()
    val base = (1L to 400L).map(i => (i, s"u$i", i * 2.0))
      .toDF("id", "user", "v").repartitionByRange(4, col("id"))
    OccTable.init(base, dir, statsColumns = Seq("id"),
      bloomColumns = Seq(OccBloom.BloomCol("user", 200L, 0.01)))
    val pre = OccTable.snapshot(spark, dir)

    val r1 = OccTable.deleteRangeDv(spark, dir, "id", 101.0, 150.0)
    assert(r1.markedRows === 50L)
    assert(r1.markedFiles === 1)
    val post = OccTable.snapshot(spark, dir)
    assert(post.files.toSet === pre.files.toSet) // ZERO file churn
    assert(post.dvs.size === 1)
    assert(ids(dir) === ((1L to 100L) ++ (151L to 400L)))
    // pruned readers apply the DV too
    assert(OccTable.readPruned(spark, dir, "id", 90.0, 160.0)
      .count() === 21L) // 90..100 + 151..160
    assert(OccTable.readEqualityPruned(spark, dir, "user", Seq("u120"))
      .count() === 0L) // deleted row invisible through the bloom path
    assert(OccTable.readEqualityPruned(spark, dir, "user", Seq("u160"))
      .count() === 1L)
    // the change feed surfaces DV losses as 'removed'
    val ch = OccTable.tableChanges(spark, dir, 0L, post.version,
      Seq("id"), Seq("v")).select("id", "status")
      .as[(Long, String)].collect()
    assert(ch.length === 50 && ch.forall(_._2 == "removed"))

    // layered delete unions; the superseded sidecar becomes garbage
    val dv1 = post.dvs.values.head
    val r2 = OccTable.deleteRangeDv(spark, dir, "id", 140.0, 180.0)
    assert(r2.markedRows === 30L) // 151..180 — 140..150 already gone
    assert(ids(dir) === ((1L to 100L) ++ (181L to 400L)))
    val reclaimed = OccTable.vacuum(spark, dir)
    assert(reclaimed.contains(s"_graft_occ_dv/$dv1"))
    assert(ids(dir) === ((1L to 100L) ++ (181L to 400L)))
  }

  test("identity DV delete via bloom; purge materializes; restore rewinds the DV") {
    val dir = freshDir()
    val base = (1L to 400L).map(i => (i, s"u$i", i * 2.0))
      .toDF("id", "user", "v").repartitionByRange(4, col("id"))
    OccTable.init(base, dir, statsColumns = Seq("id"),
      bloomColumns = Seq(OccBloom.BloomCol("user", 200L, 0.01)))

    val r = OccTable.deleteEqualityDv(spark, dir, "user",
      Seq("u42", "u157"))
    assert(r.markedRows === 2L)
    assert(r.markedFiles <= 2) // bloom-discovered holders only
    val v1 = OccTable.snapshot(spark, dir).version
    assert(ids(dir) === (1L to 400L).filterNot(Set(42L, 157L)))

    // restore to v0: the DV-differing files re-add with their v0
    // (DV-free) state — deleted rows come back
    OccTable.restore(spark, dir, 0L)
    assert(OccTable.snapshot(spark, dir).dvs.isEmpty)
    assert(ids(dir) === (1L to 400L))

    // forward again, then PURGE: DV-carrying files rewrite locally,
    // everything else stays physically put, the read is unchanged
    OccTable.restore(spark, dir, v1)
    val prePurge = OccTable.snapshot(spark, dir)
    OccTable.purgeDvs(spark, dir, statsColumns = Seq("id"))
    val postPurge = OccTable.snapshot(spark, dir)
    assert(postPurge.dvs.isEmpty)
    assert(prePurge.files.toSet.intersect(postPurge.files.toSet).size
      === prePurge.files.size - prePurge.dvs.size)
    assert(ids(dir) === (1L to 400L).filterNot(Set(42L, 157L)))

    // a clone taken while DVs were live serves the post-delete rows
    val dir2 = freshDir()
    OccTable.deleteEqualityDv(spark, dir, "user", Seq("u300"))
    OccTable.clone(spark, dir, dir2)
    assert(OccTable.read(spark, dir2)().count() === 397L)
  }

  test("optimize materializes DVs while packing; delete_dv surfaces in history") {
    val dir = freshDir()
    OccTable.init((1L to 1000L).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartitionByRange(4, col("id")), dir, statsColumns = Seq("id"))
    OccTable.deleteRangeDv(spark, dir, "id", 1.0, 10.0)
    val afterDv = OccTable.snapshot(spark, dir).version
    OccTable.optimize(spark, dir)
    val snap = OccTable.snapshot(spark, dir)
    // the rewrite APPLIED the vectors and the same commit dropped the
    // dv= references — no file carries a DV pointer afterwards (Delta's
    // purge-DVs-on-rewrite parity)
    assert(snap.dvs.isEmpty)
    assert(ids(dir) === (11L to 1000L))
    // the compaction changed no logical row: the change feed across it
    // must emit ZERO rows even though its input carried DVs
    assert(OccTable.tableChanges(spark, dir, afterDv, snap.version,
      Seq("id"), Seq("v")).count() === 0L)
    val ops = OccTable.history(spark, dir)
      .select("operation").as[String].collect()
    assert(ops.count(_ == "delete_dv") === 1)
  }

  test("clone's returned snapshot carries the DV map; purge under an evolved schema reads the log shape") {
    val dir = freshDir()
    OccTable.init((1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartitionByRange(2, col("id")), dir, statsColumns = Seq("id"))
    OccTable.deleteRangeDv(spark, dir, "id", 1.0, 5.0)
    val dir2 = freshDir()
    val returned = OccTable.clone(spark, dir, dir2)
    // a caller consuming the RETURNED snapshot (not re-folding) must
    // see the dv pointers, or DV-deleted rows read as live
    assert(returned.dvs.nonEmpty)
    assert(returned.dvs.keySet === returned.files.filter(f =>
      OccTable.snapshot(spark, dir2).dvs.contains(f)).toSet)

    // additive evolution AFTER the DV mark: purge must read the
    // DV-marked (pre-evolution) files through the LOG schema — the
    // added column serves as null instead of a missing-column failure
    OccTable.append(Seq((200L, 200.0, "tagged")).toDF("id", "v", "tag")
      .coalesce(1), dir)
    OccTable.purgeDvs(spark, dir)
    val snap = OccTable.snapshot(spark, dir)
    assert(snap.dvs.isEmpty)
    val t = OccTable.read(spark, dir)()
    assert(t.columns.toSeq === Seq("id", "v", "tag"))
    assert(t.count() === 96L) // 100 − 5 DV-deleted + 1 appended
    assert(t.filter(col("tag").isNull).count() === 95L)
  }

  test("vacuum DRY RUN lists exactly what a real run reclaims, deletes nothing, leaves the marker alone") {
    val dir = freshDir()
    OccTable.init((1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v")
      .repartitionByRange(2, col("id")), dir, statsColumns = Seq("id"))
    OccTable.deleteRangeDv(spark, dir, "id", 1.0, 5.0)
    OccTable.rewrite(spark, dir, d => d.withColumn("v", -col("v")))

    val preview = OccTable.vacuum(spark, dir, dryRun = true).sorted
    assert(preview.nonEmpty)
    // nothing deleted, marker untouched, full history still readable
    assert(OccTable.vacuumedThrough(spark, dir) === -1L)
    assert(OccTable.readAt(spark, dir, 0L)().count() === 100L)

    val real = OccTable.vacuum(spark, dir).sorted
    assert(real === preview)
    assert(OccTable.vacuumedThrough(spark, dir) >= 0L)
    assert(OccTable.read(spark, dir)().count() === 95L)
  }
}

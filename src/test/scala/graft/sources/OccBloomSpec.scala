package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X126 per-file bloom index + X127 MERGE. The bloom cases pin the
  * contract's two sides: pruning is VISIBLE in the planned file set
  * (strictly fewer files for a point lookup) and INVISIBLE in the
  * result (the residual filter makes false positives harmless and
  * missing sidecars degrade to unprunable, never to wrong rows). The
  * merge cases pin Delta semantics (update-all / insert-all / delete
  * flag, duplicate-source refusal, additive evolution) and the scale
  * property: untouched files survive a merge PHYSICALLY — same names,
  * zero bytes rewritten.
  */
class OccBloomSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_bloom").toString + "/t"

  private def fsys(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** 400 rows in 4 range-partitioned files: ids file-local, users
    * unique per row (the bloom's use case — identity lookup on a
    * column the range layout does NOT cluster).
    */
  private def initIndexed(dir: String): Unit = {
    val df = (1L to 400L).map(i => (i, s"u$i", i * 2.0))
      .toDF("id", "user", "v")
      .repartitionByRange(4, col("id"))
    OccTable.init(df, dir, statsColumns = Seq("id"),
      bloomColumns = Seq(OccBloom.BloomCol("user", numItems = 200L,
        fpp = 0.01)))
  }

  test("bloom point lookup: plans a strict subset of files, result equals the plain filter") {
    val dir = freshDir()
    initIndexed(dir)
    val snap = OccTable.snapshot(spark, dir)
    assert(snap.files.size === 4)
    assert(snap.blooms.size === 4)
    assert(snap.blooms.values.forall(_.contains("user")))

    // the file that truly holds u42 (id 42 lives in it) must survive;
    // the candidate set must be smaller than the table
    val cand = OccTable.bloomPrunedFiles(spark, dir, snap,
      "user", Seq("u42"))
    val holder = snap.files.find(f =>
      OccTable.statsFor(snap.stats(f), "id").exists {
        case (mn, mx) => mn.exists(_ <= 42.0) && mx.exists(_ >= 42.0)
      }).get
    assert(cand.contains(holder))
    assert(cand.size < snap.files.size)

    val got = OccTable.readEqualityPruned(spark, dir, "user", Seq("u42"))
      .select("id", "v").as[(Long, Double)].collect().toSeq
    assert(got === Seq((42L, 84.0)))

    // absent value: empty result (and typed — the log schema serves it
    // even when every file is pruned)
    assert(OccTable.readEqualityPruned(spark, dir, "user",
      Seq("not-a-user")).count() === 0L)

    // IN-list composed with an X117 stats interval: pruning powers
    // multiply, residuals keep exactness
    val multi = OccTable.readEqualityPruned(spark, dir, "user",
      Seq("u10", "u150", "u399"), preds = Seq(("id", 1.0, 200.0)))
      .select("id").as[Long].collect().sorted.toSeq
    assert(multi === Seq(10L, 150L))
  }

  test("bloom survives checkpoint + truncation; bloom-free files and missing sidecars are never pruned") {
    val dir = freshDir()
    initIndexed(dir)
    // a bloom-FREE append: its files must always survive pruning
    OccTable.append(Seq((1000L, "u1000", 0.5)).toDF("id", "user", "v")
      .coalesce(1), dir)
    OccTable.checkpoint(spark, dir)
    OccTable.truncateLog(spark, dir)
    val snap = OccTable.snapshot(spark, dir)
    assert(snap.files.size === 5)
    assert(snap.blooms.size === 4) // the append carried no bloom

    val candAbsent = OccTable.bloomPrunedFiles(spark, dir, snap,
      "user", Seq("definitely-absent"))
    assert(candAbsent.size === 1) // only the bloom-free file survives

    // lookup of the appended row still works through the unprunable file
    assert(OccTable.readEqualityPruned(spark, dir, "user", Seq("u1000"))
      .select("id").as[Long].collect().toSeq === Seq(1000L))

    // delete one sidecar: its file degrades to unprunable, results stay
    // correct
    val victim = snap.blooms.keys.head
    fsys(dir).delete(OccBloom.sidecarPath(dir, victim, "user"), false)
    val cand2 = OccTable.bloomPrunedFiles(spark, dir, snap,
      "user", Seq("definitely-absent"))
    assert(cand2.toSet === Set(victim) ++ candAbsent)
    assert(OccTable.readEqualityPruned(spark, dir, "user", Seq("u42"))
      .select("id").as[Long].collect().toSeq === Seq(42L))
  }

  test("vacuum reclaims sidecars of dead files; restore rides blooms back") {
    val dir = freshDir()
    initIndexed(dir)
    val bloomDir = new Path(s"$dir/${OccBloom.BloomDirName}")
    assert(fsys(dir).listStatus(bloomDir).length === 4)

    // v1: bloom-free rewrite replaces every file — the old sidecars
    // describe dead files now
    OccTable.rewrite(spark, dir, d => d.withColumn("v", -col("v")))
    assert(OccTable.snapshot(spark, dir).blooms.isEmpty)

    // restore to v0 re-adds the indexed files WITH their bloom params
    OccTable.restore(spark, dir, 0L)
    val restored = OccTable.snapshot(spark, dir)
    assert(restored.blooms.size === 4)
    assert(OccTable.readEqualityPruned(spark, dir, "user", Seq("u42"))
      .select("v").as[Double].collect().toSeq === Seq(84.0))

    // back to the rewrite, then vacuum with retention 1: the v0 files
    // die and their sidecars go with them
    OccTable.restore(spark, dir, 1L)
    val removed = OccTable.vacuum(spark, dir)
    assert(removed.exists(_.startsWith(OccBloom.BloomDirName + "/")))
    assert(!fsys(dir).exists(bloomDir) ||
      fsys(dir).listStatus(bloomDir).isEmpty)
    // the table itself is intact
    assert(OccTable.read(spark, dir)().count() === 400L)
  }

  test("merge: update-all / insert-all / delete flag; untouched files pass through physically") {
    val dir = freshDir()
    val base = (1L to 400L).map(i => (i, s"u$i", i.toDouble))
      .toDF("id", "user", "v").repartitionByRange(4, col("id"))
    OccTable.init(base, dir, statsColumns = Seq("id"))
    val pre = OccTable.snapshot(spark, dir)

    // updates + a delete inside file 0's id range, one pure insert
    // beyond every file's range
    val src = Seq(
      (5L, "u5", 500.0, false), (7L, "u7x", 700.0, false),
      (9L, "u9", 0.0, true), (1001L, "u1001", 1001.0, false))
      .toDF("id", "user", "v", "__del")
    val res = OccTable.merge(spark, dir, src, Seq("id"),
      deleteCol = Some("__del"), statsColumns = Seq("id"))
    assert(res.totalFiles === 4)
    assert(res.candidateFiles === 1) // stats admit keys 5/7/9 in one file only

    val post = OccTable.snapshot(spark, dir)
    assert(pre.files.toSet.intersect(post.files.toSet).size === 3)

    val rows = OccTable.read(spark, dir)()
      .select("id", "user", "v").as[(Long, String, Double)]
      .collect().sortBy(_._1)
    assert(rows.length === 400) // 400 − 1 delete + 1 insert
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(5L) === ((5L, "u5", 500.0)))
    assert(byId(7L) === ((7L, "u7x", 700.0)))
    assert(!byId.contains(9L))
    assert(byId(1001L) === ((1001L, "u1001", 1001.0)))
    assert(byId(100L) === ((100L, "u100", 100.0))) // survivor in candidate file
    assert(byId(300L) === ((300L, "u300", 300.0))) // untouched file

    // duplicate source keys are refused (Delta's multiple-matches rule)
    val dup = Seq((5L, "a", 1.0), (5L, "b", 2.0)).toDF("id", "user", "v")
    assertThrows[IllegalArgumentException] {
      OccTable.merge(spark, dir, dup, Seq("id"))
    }
  }

  test("readFiltered composes pv + stats + bloom pruning in one read, result equal to the plain filter") {
    val dir = freshDir()
    val df = (1L to 400L).map(i =>
        (i, s"u$i", i * 2.0, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "user", "v", "par")
      .repartitionByRange(4, col("id"))
    OccTable.init(df, dir, statsColumns = Seq("id"),
      partitionBy = Seq("par"),
      bloomColumns = Seq(OccBloom.BloomCol("user", 200L, 0.01)))
    val snap = OccTable.snapshot(spark, dir)
    assert(snap.files.size === 8) // 4 ranges × 2 partitions

    // every layer must bite: pv halves, stats quarter, bloom points
    val pvKept = OccTable.partitionPrunedFiles(snap,
      Seq("par" -> "even"))
    assert(pvKept.size === 4)
    val statsKept = OccTable.prunedFiles(
      snap.copy(files = pvKept), "id", 1.0, 100.0)
    assert(statsKept.size < pvKept.size)
    val bloomKept = OccTable.bloomPrunedFiles(spark, dir,
      snap.copy(files = statsKept), "user", Seq("u42"))
    assert(bloomKept.size <= statsKept.size && bloomKept.nonEmpty)

    val got = OccTable.readFiltered(spark, dir,
        pvEq = Seq("par" -> "even"),
        intervals = Seq(("id", 1.0, 100.0)),
        equality = Some(("user", Seq("u42", "u43"))))
      .select("id", "v").as[(Long, Double)].collect().toSeq
    // u43 is odd-partitioned: pv residual excludes it even though the
    // bloom admits its file
    assert(got === Seq((42L, 84.0)))

    // DV layer composes too: mark id 42 deleted, same read drops it
    OccTable.deleteRangeDv(spark, dir, "id", 42.0, 42.0)
    assert(OccTable.readFiltered(spark, dir,
      pvEq = Seq("par" -> "even"),
      intervals = Seq(("id", 1.0, 100.0)),
      equality = Some(("user", Seq("u42", "u43")))).count() === 0L)
  }

  test("distributed bloom probe: executor-side sidecar IO yields the same candidate set as the serial driver path") {
    val dir = freshDir()
    initIndexed(dir)
    val snap = OccTable.snapshot(spark, dir)
    for (values <- Seq(Seq("u42"), Seq("u10", "u150", "u399"),
        Seq("definitely-absent"))) {
      val serial = OccTable.bloomPrunedFiles(spark, dir, snap,
        "user", values, driverMax = Int.MaxValue)
      // driverMax = 0 forces every probe through the Spark job path
      val distributed = OccTable.bloomPrunedFiles(spark, dir, snap,
        "user", values, driverMax = 0)
      assert(distributed === serial)
    }
    // a missing sidecar degrades to unprunable on the executor path too
    val victim = snap.blooms.keys.head
    fsys(dir).delete(OccBloom.sidecarPath(dir, victim, "user"), false)
    val dist2 = OccTable.bloomPrunedFiles(spark, dir, snap,
      "user", Seq("definitely-absent"), driverMax = 0)
    assert(dist2 === Seq(victim))
  }

  test("merge over maxDriverKeys: join-based discovery finds the same touched files and the same result") {
    val dir = freshDir()
    val base = (1L to 400L).map(i => (i, s"u$i", i.toDouble))
      .toDF("id", "user", "v").repartitionByRange(4, col("id"))
    OccTable.init(base, dir, statsColumns = Seq("id"))
    val pre = OccTable.snapshot(spark, dir)
    val src = Seq(
      (5L, "u5", 500.0, false), (7L, "u7x", 700.0, false),
      (9L, "u9", 0.0, true), (1001L, "u1001", 1001.0, false))
      .toDF("id", "user", "v", "__del")
    // cap = 1 < 4 distinct keys: discovery must take the distributed
    // semi-join fallback, never collecting the key set
    val res = OccTable.merge(spark, dir, src, Seq("id"),
      deleteCol = Some("__del"), statsColumns = Seq("id"),
      maxDriverKeys = 1)
    assert(res.totalFiles === 4)
    // keys 5/7/9 live in file 0; 1001 matches no file — exactly one
    // candidate, same as the under-cap stats path
    assert(res.candidateFiles === 1)
    val post = OccTable.snapshot(spark, dir)
    assert(pre.files.toSet.intersect(post.files.toSet).size === 3)
    val rows = OccTable.read(spark, dir)()
      .select("id", "user", "v").as[(Long, String, Double)]
      .collect().sortBy(_._1)
    assert(rows.length === 400)
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(5L) === ((5L, "u5", 500.0)))
    assert(byId(7L) === ((7L, "u7x", 700.0)))
    assert(!byId.contains(9L))
    assert(byId(1001L) === ((1001L, "u1001", 1001.0)))
    assert(byId(300L) === ((300L, "u300", 300.0)))

    // pure-insert batch beyond every interval: zero candidates through
    // the fallback's range pre-prune (no file scan at all)
    val ins = Seq((2001L, "u2001", 1.0), (2002L, "u2002", 2.0))
      .toDF("id", "user", "v")
    val res2 = OccTable.merge(spark, dir, ins, Seq("id"),
      statsColumns = Seq("id"), maxDriverKeys = 1)
    assert(res2.candidateFiles === 0)
    assert(OccTable.read(spark, dir)().count() === 402L)
  }

  test("merge: the SetTransaction fence makes a replayed micro-batch a no-op") {
    val dir = freshDir()
    OccTable.init(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), dir)
    val batch = Seq((1L, 100.0), (3L, 30.0)).toDF("id", "v")
    val r1 = OccTable.merge(spark, dir, batch, Seq("id"),
      txn = Some(("cdc", 0L)))
    val v1 = r1.version
    // the engine re-offers batch 0 after a restart: skipped by the log
    val r2 = OccTable.merge(spark, dir, batch, Seq("id"),
      txn = Some(("cdc", 0L)))
    assert(r2.version === v1)
    assert(OccTable.snapshot(spark, dir).version === v1)
    // the next batch id applies normally
    val r3 = OccTable.merge(spark, dir,
      Seq((2L, 200.0)).toDF("id", "v"), Seq("id"),
      txn = Some(("cdc", 1L)))
    assert(r3.version === v1 + 1)
    val rows = OccTable.read(spark, dir)()
      .select("id", "v").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, 100.0), (2L, 200.0), (3L, 30.0)))
  }

  test("merge: bloom-only discovery on a string key, and additive schema evolution") {
    val dir = freshDir()
    val base = (1L to 400L).map(i => (i, s"u$i", i.toDouble))
      .toDF("id", "user", "v").repartitionByRange(4, col("id"))
    OccTable.init(base, dir,
      bloomColumns = Seq(OccBloom.BloomCol("user", 200L, 0.01)))

    // string merge key: stats can't type it, the bloom discovers the
    // single touched file; the source also adds a column additively
    val src = Seq(("u42", 42L, 4200.0, "tagged"))
      .toDF("user", "id", "v", "tag")
    val res = OccTable.merge(spark, dir, src, Seq("user"),
      bloomColumns = Seq(OccBloom.BloomCol("user", 200L, 0.01)))
    assert(res.candidateFiles < res.totalFiles)

    val t = OccTable.read(spark, dir)()
    assert(t.columns.toSeq === Seq("id", "user", "v", "tag"))
    val tagged = t.filter(col("user") === "u42")
      .select("v", "tag").as[(Double, String)].collect().toSeq
    assert(tagged === Seq((4200.0, "tagged")))
    assert(t.filter(col("tag").isNull).count() === 399L)
    // the merged-in file is bloom-indexed too: a fresh lookup of the
    // new row prunes
    val snap = OccTable.snapshot(spark, dir)
    val cand = OccTable.bloomPrunedFiles(spark, dir, snap,
      "user", Seq("u42"))
    assert(cand.size < snap.files.size)
    assert(OccTable.readEqualityPruned(spark, dir, "user", Seq("u42"))
      .count() === 1L)
  }
}

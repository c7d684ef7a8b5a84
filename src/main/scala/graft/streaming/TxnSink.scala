package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch-id-fenced EXACTLY-ONCE `foreachBatch` sinks — the repair for the
  * at-least-once hole every blind-append `foreachBatch` sink has (and the
  * reference itself ships: spark_streaming.py:52-75 JDBC-appends each
  * micro-batch with no batch-id fencing, so a failure after the write but
  * before the checkpoint commit re-appends the whole batch on restart).
  *
  * Spark's native file sink solves this with `_spark_metadata`: data
  * files are only REAL once a per-batch manifest lists them, and a
  * replayed batch id is skipped because its manifest already exists.
  * `foreachBatch` deliberately bypasses that machinery (that's what makes
  * it flexible), so this object rebuilds the same protocol for arbitrary
  * batch transforms:
  *
  *   1. **Fence**: if `_graft_txn/<batchId>` exists, the batch already
  *      committed — a replay (restart between foreachBatch success and
  *      the engine's checkpoint commit) is a no-op.
  *   2. **Stage**: the batch writes to a hidden `.staging-<batchId>` dir
  *      (dot-prefixed — invisible to any reader), then each part file is
  *      renamed into the data dir under a `part-b<batchId>-` prefix.
  *   3. **Publish**: a manifest listing exactly those file names lands
  *      atomically (temp + rename). A crash BEFORE the manifest leaves
  *      orphan data files that [[committedRead]] never sees and the
  *      replay deletes (their batch prefix makes them identifiable)
  *      before re-staging; a crash AFTER the manifest is the fenced
  *      replay case.
  *
  * [[committedRead]] is the exact reader: union of manifest-listed files
  * only. A plain `spark.read.parquet(dir)` still works operationally
  * (manifests live under `_`-prefixed dirs Spark's file index hides) but
  * can see orphans of a mid-publish crash — same contract as reading a
  * Delta table's directory without the log.
  *
  * Scale posture: the log is O(#batches) tiny files; [[compact]] folds
  * them into a single `.compact` generation (the
  * CompactibleFileStreamLog shape) so a long-lived query's reader lists
  * one file plus the tail. Renames are metadata-ops on HDFS-like stores;
  * on S3 a real deployment puts a table format under the sink — this is
  * the plain-filesystem version of exactly that protocol.
  *
  * Batch ids are per-checkpoint-lineage (Spark's epoch counter), so the
  * fence is tied to the checkpoint that produced it: reprocessing from a
  * FRESH checkpoint must target a fresh output dir — the same contract
  * as the native file sink's `_spark_metadata`.
  */
object TxnSink {

  private val LogDirName = "_graft_txn"
  private val CompactSuffix = ".compact"

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pad(batchId: Long): String = f"$batchId%020d"

  private def manifestPath(dir: String, batchId: Long): Path =
    new Path(s"$dir/$LogDirName/${pad(batchId)}")

  private def filePrefix(batchId: Long): String = s"part-b${pad(batchId)}-"

  /** Atomic small-file write: temp in the same dir, then rename. */
  private def writeAtomic(fsys: FileSystem, target: Path,
      lines: Seq[String]): Unit = {
    val tmp = new Path(target.getParent,
      s".${target.getName}.tmp-${java.util.UUID.randomUUID()}")
    val out = fsys.create(tmp, true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (!fsys.rename(tmp, target)) {
      fsys.delete(tmp, false)
      // a concurrent replay attempt already published the same batch —
      // losing the rename race IS a successful commit (identical content:
      // the file list is deterministic only per attempt, but exactly one
      // attempt's files are manifested; ours must then be cleaned)
      if (!fsys.exists(target)) throw new java.io.IOException(
        s"TxnSink: atomic publish of $target failed")
    }
  }

  private def readLines(fsys: FileSystem, p: Path): Seq[String] = {
    val in = fsys.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Has `batchId` committed to `dir`? True if its manifest exists or a
    * compaction generation at or past it absorbed it.
    */
  def isCommitted(spark: SparkSession, dir: String, batchId: Long): Boolean = {
    val fsys = fs(spark, dir)
    fsys.exists(manifestPath(dir, batchId)) ||
      latestCompactId(fsys, dir).exists(_ >= batchId)
  }

  /** Highest committed batch id, if any (compacted or plain). */
  def lastCommitted(spark: SparkSession, dir: String): Option[Long] = {
    val fsys = fs(spark, dir)
    val ids = listLog(fsys, dir).map(_._1)
    if (ids.isEmpty) None else Some(ids.max)
  }

  private def latestCompactId(fsys: FileSystem, dir: String): Option[Long] = {
    val log = new Path(s"$dir/$LogDirName")
    if (!fsys.exists(log)) None
    else fsys.listStatus(log).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(CompactSuffix))
      .map(n => n.stripSuffix(CompactSuffix).toLong)
      .maxOption
  }

  /** (batchId, isCompact) entries of the log, hidden temps excluded. */
  private def listLog(fsys: FileSystem, dir: String): Seq[(Long, Boolean)] = {
    val log = new Path(s"$dir/$LogDirName")
    if (!fsys.exists(log)) Seq.empty
    else fsys.listStatus(log).toSeq.map(_.getPath.getName)
      .filter(n => !n.startsWith("."))
      .map(n => (n.stripSuffix(CompactSuffix).toLong,
        n.endsWith(CompactSuffix)))
  }

  /** The committed data files of `dir`, in batch order: the latest
    * compaction generation's list plus every plain manifest past it.
    */
  def committedFiles(spark: SparkSession, dir: String): Seq[String] = {
    val fsys = fs(spark, dir)
    val compactId = latestCompactId(fsys, dir)
    val fromCompact = compactId.toSeq.flatMap(id =>
      readLines(fsys, new Path(s"$dir/$LogDirName/${pad(id)}$CompactSuffix")))
    val tail = listLog(fsys, dir)
      .collect { case (id, false) if compactId.forall(id > _) => id }
      .sorted
      .flatMap(id => readLines(fsys, manifestPath(dir, id)))
    (fromCompact ++ tail).map(name => s"$dir/$name")
  }

  /** Exact reader: only manifest-listed files — a mid-publish crash's
    * orphans are invisible. `emptyResult` when nothing has committed (or
    * only empty batches have — the schema cannot be inferred from zero
    * files).
    */
  def committedReadOr(spark: SparkSession, dir: String)(
      emptyResult: => DataFrame): DataFrame = {
    val files = committedFiles(spark, dir)
    if (files.isEmpty) emptyResult
    else spark.read.parquet(files: _*)
  }

  /** [[committedReadOr]] that fails on an empty log. */
  def committedRead(spark: SparkSession, dir: String): DataFrame =
    committedReadOr(spark, dir)(throw new IllegalStateException(
      s"TxnSink: no committed batches under $dir"))

  /** The transactional append — stage, rename in, publish manifest;
    * replay-fenced on `batchId`. Usable directly inside a `foreachBatch`
    * body that computes a derived frame before sinking (the
    * [[exactlyOnceParquetSink]] canned form covers the plain case).
    */
  def append(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val fsys = fs(spark, dir)
    if (isCommitted(spark, dir, batchId)) return // replay after commit
    val dataDir = new Path(dir)
    fsys.mkdirs(new Path(s"$dir/$LogDirName"))
    // a previous attempt may have crashed mid-publish: its renamed-in
    // files carry this batch's prefix and are not in any manifest —
    // delete them so the redo cannot double-publish
    if (fsys.exists(dataDir)) {
      fsys.listStatus(dataDir).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith(filePrefix(batchId)))
        .foreach(s => fsys.delete(s.getPath, false))
    }
    val staging = new Path(s"$dir/.staging-${pad(batchId)}")
    fsys.delete(staging, true)
    // Stage FIRST and count rows via an observed metric riding the SAME
    // action: the previous `batch.isEmpty` probe was a second execution
    // of the batch lineage (in foreachBatch each action re-runs the full
    // micro-batch plan, stateful operators included), so every non-empty
    // micro-batch paid its plan twice — once for the probe, once for the
    // write (guide §1.4/§5: don't compute things you throw away). The
    // observation costs one counter per row inside the one staging write.
    // Empty batches still publish NO data files, only the fence manifest:
    // a zero-row write stages exactly one schema-only part file (Spark's
    // empty-write contract), which is deleted with the staging dir. A
    // non-empty write may still stage a zero-row part file for an empty
    // task (the writer opens its file eagerly); such a file is published
    // in the manifest — harmless to readers (zero rows contributed) and
    // cheaper than probing every part's footer per batch. The trade the
    // single-action staging makes: a frequently-EMPTY stream now pays a
    // full (row-less) plan execution per empty batch where the old
    // isEmpty probe could short-circuit — the replay gates' batches are
    // non-empty by construction, and a non-empty batch saves a whole
    // plan execution, which dominates.
    val obs = org.apache.spark.sql.Observation()
    batch.observe(obs, org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("rows"))
      .write.mode("overwrite").parquet(staging.toString)
    val stagedRows = obs.get("rows").asInstanceOf[Long]
    val names: Seq[String] =
      if (stagedRows == 0L) Seq.empty
      else {
        val parts = fsys.listStatus(staging).toSeq
          .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        parts.map { s =>
          val name = filePrefix(batchId) +
            s.getPath.getName.stripPrefix("part-")
          if (!fsys.rename(s.getPath, new Path(dataDir, name)))
            throw new java.io.IOException(
              s"TxnSink: rename of ${s.getPath} into $dir failed")
          name
        }
      }
    // empty batches commit an empty manifest: the fence must remember
    // them or a replay would re-run whatever surrounded the sink call
    writeAtomic(fsys, manifestPath(dir, batchId), names)
    fsys.delete(staging, true)
  }

  /** Drop-in replacement for the blind `batch.write.mode("append")`
    * foreachBatch sink, exactly-once under replay and mid-publish crash.
    */
  def exactlyOnceParquetSink(dir: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => append(batch, dir, batchId)

  /** Generic fence for EFFECT sinks (a CDC merge, an index refresh):
    * skips `body` when `batchId` already committed to `markerDir`, runs
    * it and publishes the marker otherwise. The fence removes the
    * replay-after-success duplicate; a crash MID-body still re-runs the
    * body on restart, so the body must tolerate its own partial effects
    * — which latest-wins merges do by construction. For pure
    * data-file appends use [[append]], whose staging protocol needs no
    * such property.
    */
  def fenced(markerDir: String)(body: (DataFrame, Long) => Unit)
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      if (!isCommitted(spark, markerDir, batchId)) {
        body(batch, batchId)
        val fsys = fs(spark, markerDir)
        fsys.mkdirs(new Path(s"$markerDir/$LogDirName"))
        writeAtomic(fsys, manifestPath(markerDir, batchId), Seq.empty)
      }
    }

  /** Delete what no manifest references: leftover `.staging-*` dirs and
    * batch-prefixed data files from crashed or superseded attempts
    * (replays clean their OWN batch id's orphans; this collects the
    * rest). UNSAFE concurrently with a live writer mid-append — run it
    * from the maintenance owner, the same caveat as every table
    * format's vacuum. Returns the deleted names.
    */
  def vacuum(spark: SparkSession, dir: String): Seq[String] = {
    val fsys = fs(spark, dir)
    val d = new Path(dir)
    if (!fsys.exists(d)) return Seq.empty
    val listed = committedFiles(spark, dir).map(_.stripPrefix(s"$dir/")).toSet
    val entries = fsys.listStatus(d).toSeq
    val stale = entries.filter(s =>
      s.isDirectory && s.getPath.getName.startsWith(".staging-")) ++
      entries.filter(s => s.isFile &&
        s.getPath.getName.startsWith("part-") && !listed(s.getPath.getName))
    stale.foreach(s => fsys.delete(s.getPath, true))
    stale.map(_.getPath.getName)
  }

  /** Fold every plain manifest at or below the current max id into one
    * `.compact` generation and delete them — the reader then lists one
    * file plus whatever committed after. Safe concurrently with the
    * writer (it only absorbs already-published manifests; the compact
    * file lands atomically before the absorbed ones are removed).
    * Returns the compaction's generation id, or None on an empty log.
    */
  def compact(spark: SparkSession, dir: String): Option[Long] = {
    val fsys = fs(spark, dir)
    val plainIds = listLog(fsys, dir).collect { case (id, false) => id }
    if (plainIds.isEmpty) return latestCompactId(fsys, dir)
    val upTo = plainIds.max
    // capture the generation being superseded BEFORE the new one lands —
    // queried after, latestCompactId would return upTo itself and the
    // old generation would never be reclaimed (one leaked file per
    // compaction, defeating the bounded-listing goal)
    val prev = latestCompactId(fsys, dir)
    val all = committedFiles(spark, dir).map(_.stripPrefix(s"$dir/"))
    writeAtomic(fsys, new Path(s"$dir/$LogDirName/${pad(upTo)}$CompactSuffix"),
      all)
    // only now is it safe to drop what the generation absorbed
    plainIds.filter(_ <= upTo)
      .foreach(id => fsys.delete(manifestPath(dir, id), false))
    prev.filter(_ < upTo)
      .foreach(id => fsys.delete(
        new Path(s"$dir/$LogDirName/${pad(id)}$CompactSuffix"), false))
    Some(upTo)
  }
}

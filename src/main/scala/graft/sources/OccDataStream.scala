package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition,
  PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit,
  MicroBatchStream, Offset, ReadLimit, ReadMaxRows,
  SupportsAdmissionControl, SupportsTriggerAvailableNow}

/** X150 — `spark.readStream.format("graft-occ").load(dir)`: the
  * table's DATA ROWS as a streaming source, Delta's
  * `readStream.format("delta")` parity and the reference's hot path
  * (spark_streaming.py:125-130) as a by-format-name subscription.
  * Where [[OccTailSource]] feeds the parsed commit ACTIONS (the
  * plumbing [[OccStream.tailTo]] builds on), this source serves the
  * rows themselves: each micro-batch is ONE incremental parquet scan
  * of the files added in its version window, planned through the same
  * `ParquetScan` machinery as the batch connector — whole-stage
  * codegen, columnar reads, log-recorded file sizes (X148), and the
  * column-mapping rename (X149) all carry over unchanged.
  *
  * Offset model: a plain offset IS a log version ("every commit ≤ v
  * delivered"); the `s<v>` form marks a pending INITIAL SNAPSHOT at v
  * (`startingVersion=snapshot`) — its first batch serves the full
  * live-file set of version v (re-derived from the log on replay, so
  * recovery plans the identical batch), then the tail proceeds
  * normally. Options:
  *   - `startingVersion`: `earliest` (default — replay from v0, ≡
  *     [[OccStream.tailTo]]'s default), `latest` (new commits only),
  *     `snapshot` (current snapshot first — the Delta default shape,
  *     and the form that works on compacted histories), or a version
  *     number (that version is the first delivered).
  *   - `startingTimestamp` (X147): first commit at/after the
  *     timestamp, mutually exclusive with `startingVersion`.
  *   - `maxVersionsPerTrigger`: admission cap, in commits.
  *   - `onRewrite`: `fail` (default) | `skipRewrites` |
  *     `ignoreRemoves` — what a commit that removes files (or adds
  *     deletion vectors) means to an append-only subscriber, the same
  *     trichotomy as [[OccStream.tailTo]] / Delta's
  *     `skipChangeCommits`/`ignoreChanges`.
  *
  * The read schema is PINNED at stream start (the resolved snapshot's
  * physical schema). A schema or column-mapping commit inside a
  * planned window fails the stream LOUDLY unless it matches the
  * pinned state (the restart-after-evolution case): serving a
  * narrower schema would silently drop the new column from the feed —
  * Delta fails the same way and asks for a restart. Pure additive
  * history BEHIND the pin needs no handling: pre-evolution files
  * serve the pinned columns as null through the parquet read schema,
  * and physical names never change under a rename.
  */
final class OccDataMicroBatchStream(dir: String,
    pinned: OccTable.Snapshot, template: OccParquetScan,
    startingVersion: String, startingTimestamp: Option[Long],
    maxVersions: Int, onRewrite: String)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  require(startingVersion == "earliest" || startingVersion == "latest" ||
    startingVersion == "snapshot" || startingVersion.forall(_.isDigit),
    "graft-occ stream: startingVersion must be 'earliest', 'latest', " +
      s"'snapshot' or a version number, got '$startingVersion'")
  require(startingTimestamp.isEmpty || startingVersion == "earliest",
    "graft-occ stream: startingTimestamp and startingVersion are " +
      "mutually exclusive — set one")
  require(maxVersions >= 0,
    s"graft-occ stream: maxVersionsPerTrigger must be >= 0, got $maxVersions")
  require(Set("fail", "skipRewrites", "ignoreRemoves")(onRewrite),
    "graft-occ stream: onRewrite must be fail | skipRewrites | " +
      s"ignoreRemoves, got '$onRewrite'")

  // all offset/planning work is DRIVER-side (the log is metadata)
  private def spark: SparkSession = SparkSession.active
  private def latest: Long =
    OccTable.latestVersion(spark, dir).getOrElse(-1L)

  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(latest)

  override def initialOffset(): Offset = startingTimestamp match {
    case Some(ts) =>
      OccDataOffset(OccTable.firstVersionAtOrAfter(spark, dir, ts) - 1)
    case None => startingVersion match {
      case "earliest" => OccDataOffset(-1L)
      case "latest" => OccDataOffset(latest)
      case "snapshot" => OccDataOffset(pinned.version,
        snapshotPending = true)
      case n => OccDataOffset(n.toLong - 1)
    }
  }

  override def getDefaultReadLimit: ReadLimit =
    if (maxVersions > 0) ReadLimit.maxRows(maxVersions.toLong)
    else ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) drives this source")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[OccDataOffset]
    val l = availableNowTarget.getOrElse(latest)
    def maxRowsOf(rl: ReadLimit): Option[Long] = rl match {
      case r: ReadMaxRows => Some(r.maxRows())
      case c: CompositeReadLimit =>
        c.getReadLimits.toSeq.flatMap(maxRowsOf)
          .reduceOption((a: Long, b: Long) => math.min(a, b))
      case _ => None
    }
    val capped = maxRowsOf(limit).map(m => math.min(l, s.version + m))
      .getOrElse(l)
    // a pending snapshot is one undividable batch: the end offset is
    // plain-form at (at least) the snapshot's own version, which makes
    // end != start and forces the batch even when no commit followed
    OccDataOffset(math.max(s.version, capped))
  }

  override def reportLatestOffset(): Offset = OccDataOffset(latest)

  override def deserializeOffset(json: String): Offset = {
    val t = json.trim
    if (t.startsWith("s")) OccDataOffset(t.drop(1).toLong,
      snapshotPending = true)
    else OccDataOffset(t.toLong)
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[OccDataOffset]
    val e = end.asInstanceOf[OccDataOffset].version
    // the snapshot batch re-derives its file set FROM THE LOG, so a
    // post-crash replay plans the identical batch (vacuumed history
    // refuses loudly via snapshotAt's guard)
    val snapshotFiles: Seq[String] =
      if (s.snapshotPending) OccTable.snapshotAt(spark, dir, s.version).files
      else Seq.empty
    val window =
      if (e > s.version) OccTable.actionsBetween(spark, dir, s.version, e)
      else Seq.empty
    // pinned-metadata guard: the stream's read schema is PINNED at
    // start, so a window's schema action is fine exactly when every
    // file written under it still reads correctly through the pin —
    // shared fields type-equal or losslessly BELOW the pin's type
    // (parquet promotes natively, X143; nullability differences are
    // read-irrelevant). A field the pin lacks, or one wider than the
    // pin, would be silently dropped or mis-read — fail like Delta
    // and point at a restart (or startingVersion=snapshot, which pins
    // PAST the whole history). Mapping commits that differ from the
    // pin fail the same way: a rename IS a schema change to the feed.
    // an era schema names a pinned column by its LOGICAL name (eras at
    // or after the pin's mapping) or by its PHYSICAL one (pre-rename
    // eras) — the resurrection refusals guarantee the two identities
    // never serve different columns, so index the pin under both
    val pinTypes: Map[String, org.apache.spark.sql.types.DataType] =
      pinned.schema.map(_.fields.flatMap(f => Seq(
        f.name -> f.dataType,
        pinned.physName(f.name) -> f.dataType)).toMap).getOrElse(Map.empty)
    window.foreach { case (v, a) =>
      // mapping first: a rename commit carries BOTH actions, and "the
      // mapping changed" is the precise refusal for it
      if (a.colmapSet.exists(m => m != pinned.colmap))
        throw new IllegalStateException(
          s"graft-occ stream: commit v$v of $dir changes the column " +
            "mapping under a running stream — restart the stream or " +
            "subscribe with startingVersion=snapshot")
      a.schemaJson.filterNot(pinned.schemaJson.contains).foreach { j =>
        val w = org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val bad = w.fields.flatMap { f =>
          pinTypes.get(f.name) match {
            case Some(t) if t == f.dataType => None
            case Some(t) if OccTable.isLosslessWidening(f.dataType, t) =>
              None // pin is wider: files promote natively
            case Some(t) => Some(s"${f.name} (${f.dataType.simpleString} " +
              s"vs pinned ${t.simpleString})")
            case None => Some(s"${f.name} (not in the pinned schema)")
          }
        }
        if (bad.nonEmpty) throw new IllegalStateException(
          s"graft-occ stream: commit v$v of $dir carries a schema this " +
            s"stream's pinned read schema cannot serve — ${bad.mkString("; ")}. " +
            "Restart the stream to adopt the current schema, or " +
            "subscribe with startingVersion=snapshot")
      }
    }
    // rewrite trichotomy: removes and DV-adds both rewrite served rows
    val rewriteVs = window.collect {
      case (v, a) if a.removes.nonEmpty || a.addDvs.nonEmpty => v
    }.toSet
    if (onRewrite == "fail" && rewriteVs.nonEmpty)
      throw new IllegalStateException(
        s"graft-occ stream: commit(s) v${rewriteVs.toSeq.sorted.mkString(", v")} " +
          s"of $dir rewrite files under the stream (compaction/merge/" +
          "delete) — an append-only feed cannot represent them. Set " +
          "onRewrite=skipRewrites to ignore those commits or " +
          "onRewrite=ignoreRemoves to process their adds too")
    val tailAdds = window.flatMap { case (v, a) =>
      if (onRewrite == "ignoreRemoves" || !rewriteVs(v)) a.adds.map((v, _))
      else Seq.empty
    }
    // vacuum-lag guard (same contract as OccStream.tailTo): adds at or
    // below the vacuumedThrough marker may reference reclaimed files —
    // probe exactly those and refuse BY NAME, not mid-scan
    if (tailAdds.nonEmpty) {
      val through = OccTable.vacuumedThrough(spark, dir)
      val lagged = tailAdds.filter(_._1 <= through)
      if (lagged.nonEmpty) {
        val fsys = new Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val gone = lagged.filterNot { case (_, f) =>
          fsys.exists(new Path(OccTable.resolvePath(dir, f))) }
        if (gone.nonEmpty) throw new IllegalStateException(
          s"graft-occ stream: lag exceeded the vacuum retention of $dir " +
            s"— file(s) ${gone.map(_._2).mkString(", ")} of version(s) " +
            s"v${gone.map(_._1).distinct.sorted.mkString(", v")} were " +
            s"reclaimed (vacuumedThrough=$through)")
      }
    }
    val files = (snapshotFiles ++ tailAdds.map(_._2)).distinct
    if (files.isEmpty) return Array.empty
    // ONE incremental parquet scan of exactly the window's files,
    // through the same machinery as the batch connector: the pinned
    // snapshot re-scoped to the batch file set keeps X148 sizes (files
    // it no longer carries — skipRewrites lag — fall back to a stat)
    template.copy(
      fileIndex = new OccFileIndex(spark, dir,
        pinned.copy(files = files.toIndexedSeq), template.dataSchema),
      partitionFilters = Seq.empty, dataFilters = Seq.empty)
      .toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    template.toBatch.createReaderFactory()
}

/** "Every commit ≤ version delivered"; `snapshotPending` marks the
  * undelivered initial snapshot of `startingVersion=snapshot`.
  */
final case class OccDataOffset(version: Long,
    snapshotPending: Boolean = false) extends Offset {
  override def json(): String =
    if (snapshotPending) s"s$version" else version.toString
}

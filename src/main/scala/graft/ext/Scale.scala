package graft.ext

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism floor for CPU-bound kernel projections
  * (optimization guide §2.5, input skew: "one huge unsplittable file …
  * repartition immediately after the read"; §1.2: fix the distributed
  * algorithm's parallelism before per-task work).
  *
  * The text/hash kernels (shingling, per-shingle md5 permutation minima,
  * SimHash, winnowing, hashed n-gram features) are pure narrow
  * projections whose cost is CPU per input row, not I/O — so their
  * parallelism is pinned to the SCAN's split count. A corpus
  * materialized as fewer splits than the session has cores (the
  * single-file bench tables; any small dimension corpus) runs the whole
  * kernel in ONE task while every other core idles. Measured on
  * local[32] at sf0.1 before this helper existed: the 16-permutation
  * MinHash signature pass was one 1.9–2.8 s task; the DSIR hashed-ngram
  * feature pass one 1.6–2.4 s task; jaccard/simhash/winnow/span kernels
  * one 0.4–1.3 s task each — all with 31 idle cores.
  *
  * [[fanOut]] inserts a round-robin repartition to `defaultParallelism`
  * ONLY when the scan provably yields fewer splits than that: input
  * files are stat'ed (bounded — only attempted when #files < cores, so
  * a large table never pays per-file RPCs) and the split count is
  * estimated with the same `maxPartitionBytes` arithmetic the scan
  * uses. At cluster scale a corpus table has ≥ cores splits and this is
  * the IDENTITY — no shuffle is ever added to a big scan. The shuffle it
  * does add at small scale moves exactly the projected input once, and
  * round-robin repartition is retry-deterministic (Spark sorts before
  * round-robin partitioning, SPARK-23207). Non-file inputs (in-memory
  * test frames, streaming micro-batch branches) report no input files
  * and pass through untouched — their parallelism is already the
  * session default.
  */
private[graft] object Scale {

  def fanOut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    if (p <= 1) return df
    val files =
      try df.inputFiles
      catch { case scala.util.control.NonFatal(_) => Array.empty[String] }
    if (files.isEmpty || files.length >= p) return df
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val hconf = spark.sparkContext.hadoopConfiguration
    var splits = 0L
    files.foreach { f =>
      val len =
        try {
          val path = new org.apache.hadoop.fs.Path(f)
          path.getFileSystem(hconf).getFileStatus(path).getLen
        } catch { case scala.util.control.NonFatal(_) => return df }
      splits += math.max(1L, (len + maxSplit - 1) / maxSplit)
      if (splits >= p) return df
    }
    df.repartition(p)
  }
}

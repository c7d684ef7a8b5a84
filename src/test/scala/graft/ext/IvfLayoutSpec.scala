package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The IVF scale path made physical: bucket-as-partition-key. Asserts the
  * two properties that make it an index rather than a scan:
  *   1. the probe's parquet scan carries the bucket predicate as a
  *      PARTITION filter (pruned at planning — unprobed directories
  *      contribute zero I/O), and
  *   2. probing all buckets reproduces the exact brute-force top-k, while
  *      a 2-probe search already finds the query's near neighbors.
  */
class IvfLayoutSpec extends SparkSpec {

  private lazy val sf = "/root/testdata/sf0.001"

  test("IVF layout: partitioned write, planning-time pruning, probe recall") {
    val path = Files.createTempDirectory("graft_ivf").toString + "/emb"
    val emb = Tables.embeddings(spark, sf)
    Similarity.writeIvfLayout(emb, "vec_id", "embedding",
      Similarity.trainQuantizer(emb, "vec_id", "embedding",
        k = 8, iters = 2, salt = "spec"), path)

    // bucket directories exist; quantizer rides beside the data
    val dirs = new java.io.File(path).listFiles().map(_.getName)
    assert(dirs.count(_.startsWith("ivf_bucket=")) > 1, dirs.toSeq)
    assert(dirs.contains("_quantizer"))

    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0)

    val probe = Similarity.ivfProbe(spark, path, "vec_id", "embedding",
      q, k = 10, nProbe = 2)
    // 1. pruning is visible in the PLAN: the scan's partition filters
    // carry the bucket predicate, and fewer partitions than buckets
    // survive selection
    val scan = probe.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec if s.metadata("Location").contains("graft_ivf") => s
    }.head
    assert(scan.metadata("PartitionFilters").contains("ivf_bucket"),
      scan.metadata("PartitionFilters"))
    val nBuckets = dirs.count(_.startsWith("ivf_bucket="))
    assert(scan.selectedPartitions.partitionCount === 2,
      s"probed ${scan.selectedPartitions.partitionCount} of $nBuckets partitions")

    // 2. probing ALL buckets ≡ brute force (modulo the query row itself,
    // which brute force excludes); tiebreak identical
    val all = Similarity.ivfProbe(spark, path, "vec_id", "embedding",
      q, k = 11, nProbe = nBuckets)
      .filter(col("vec_id") =!= 0).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val brute = Similarity.bruteForceTopKNative(emb, "vec_id", "embedding",
      queryId = 0L, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(all === brute)

    // the 2-probe result is EXACT within the probed buckets (the
    // approximation is only which buckets are visited — on these
    // synthetic near-random embeddings even a trained quantizer carries
    // little signal, so absolute recall is not a meaningful target)
    val probedBuckets = probe.select("ivf_bucket").distinct().collect()
      .map(_.getInt(0)).toSet
    val withinProbed = Similarity.bruteForceTopKNative(
      emb, "vec_id", "embedding", queryId = 0L, k = 1 << 20)
      .join(spark.read.parquet(path).select(col("vec_id"),
        col("ivf_bucket")), "vec_id")
      .filter(col("ivf_bucket").isin(probedBuckets.toSeq: _*))
      .orderBy(col("cosine").desc, col("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val two = Similarity.ivfProbe(spark, path, "vec_id", "embedding",
      q, k = 11, nProbe = 2)
      .filter(col("vec_id") =!= 0).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(two === withinProbed)
  }

  test("ivfProbeBatch: one pruned scan, per-query results equal single probes") {
    val emb = Tables.embeddings(spark, sf)
    val path = Similarity.ensureIvfLayout(emb, "vec_id", "embedding",
      Similarity.trainQuantizer(emb, "vec_id", "embedding",
        k = 8, iters = 2, salt = "batchspec"),
      s"batch-spec-${System.nanoTime()}")
    val qvs = emb.filter(col("vec_id").isin(0L, 7L))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val batch = Similarity.ivfProbeBatch(spark, path, "vec_id", "embedding",
      qvs, k = 10, nProbe = 2)
    // exactly ONE pruned layout scan for the whole batch (final adaptive
    // plan; the query reads nothing but the layout)
    batch.collect()
    val finalPlan = batch.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("FileScan parquet".r.findAllIn(finalPlan).length === 1, finalPlan)
    assert(finalPlan.contains("PartitionFilters: [ivf_bucket"), finalPlan)
    // per-query slices equal the single-query probe bit-for-bit
    for ((qid, qv) <- qvs) {
      val single = Similarity.ivfProbe(spark, path, "vec_id", "embedding",
          qv, k = 10, nProbe = 2, excludeId = Some(qid))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      val slice = batch.filter(col("qid") === qid)
        .orderBy(col("cosine").desc, col("vec_id"))
        .select("vec_id", "ivf_bucket", "cosine")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      assert(slice === single, s"query $qid")
    }
  }

  test("tuneNProbe: minimal nProbe for a recall target, monotone, exhaustive at target 1.0") {
    val emb = Tables.embeddings(spark, sf)
    val path = Similarity.ensureIvfLayout(emb, "vec_id", "embedding",
      Similarity.trainQuantizer(emb, "vec_id", "embedding",
        k = 8, iters = 2, salt = "batchspec"),
      s"batch-spec-${System.nanoTime()}")
    val qvs = emb.filter(col("vec_id").isin(0L, 7L, 23L))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq

    // the returned nProbe MEETS its target, and the one below it (if
    // any) does not — minimality, the whole point of the helper
    val (nMid, rMid) = Similarity.tuneNProbe(spark, path, "vec_id",
      "embedding", qvs, k = 10, targetRecall = 0.6)
    assert(rMid >= 0.6, s"nProbe=$nMid recall=$rMid")
    if (nMid > 1) {
      val (nLow, rLow) = Similarity.tuneNProbe(spark, path, "vec_id",
        "embedding", qvs, k = 10, targetRecall = rMid)
      assert(nLow === nMid && rLow === rMid) // re-tune is deterministic
    }

    // recall 1.0 is reachable by construction (probe superset monotone);
    // worst case the tuner answers "all centroids"
    val (nFull, rFull) = Similarity.tuneNProbe(spark, path, "vec_id",
      "embedding", qvs, k = 10, targetRecall = 1.0)
    assert(rFull === 1.0)
    assert(nFull <= 8)

    // a looser target can never need MORE probes
    val (nLoose, _) = Similarity.tuneNProbe(spark, path, "vec_id",
      "embedding", qvs, k = 10, targetRecall = 0.2)
    assert(nLoose <= nMid)

    assertThrows[IllegalArgumentException] {
      Similarity.tuneNProbe(spark, path, "vec_id", "embedding", qvs,
        k = 10, targetRecall = 0.0)
    }
  }

  test("SQ8-in-layout: codes round-trip, quantized probe prunes and never reads floats") {
    val emb = Tables.embeddings(spark, sf)
    val path = Similarity.ensureIvfLayout(emb, "vec_id", "embedding",
      Similarity.trainQuantizer(emb, "vec_id", "embedding",
        k = 8, iters = 2, salt = "sq8spec"),
      s"sq8-spec-${System.nanoTime()}")
    // the layout carries the serving payload and its range sidecar
    assert(new java.io.File(path, "_sq8/_SUCCESS").exists())
    val (mn, mx) = Similarity.readSq8Range(spark, path)
    assert(mx > mn)
    val scale = (mx - mn) / 255.0
    val lay = spark.read.parquet(path)
    // codes are uint8-ranged and reconstruct each float component to
    // within half a quantization step
    val bad = lay.select(
      exists(col("sq8_code"), c => c < 0 || c > 255).as("oob"),
      exists(zip_with(col("sq8_code"),
          col("embedding").cast("array<double>"),
          (c, x) => abs(lit(mn) + c * lit(scale) - x) > lit(scale / 2 + 1e-9)),
        b => b).as("drift"))
      .filter(col("oob") || col("drift")).count()
    assert(bad === 0L)

    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0)
    val probe = Similarity.ivfSq8Probe(spark, path, "vec_id", q,
      k = 10, nProbe = 2, excludeId = Some(0L))
    val rows = probe.collect()
    assert(rows.length === 10)
    // pruned at planning AND the scan reads codes, not the float vectors
    // — the 4x-smaller payload is real, not incidental
    val scan = probe.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.metadata("PartitionFilters").contains("ivf_bucket"),
      scan.metadata("PartitionFilters"))
    assert(scan.selectedPartitions.partitionCount === 2)
    assert(scan.metadata("ReadSchema").contains("sq8_code"),
      scan.metadata("ReadSchema"))
    assert(!scan.metadata("ReadSchema").contains("embedding"),
      scan.metadata("ReadSchema"))

    // stored codes ≡ re-quantizing the floats: scoring the SAME probed
    // buckets via an independent float-side reconstruction gives the
    // same ranking
    val probed = Similarity.probeBuckets(
      Similarity.readQuantizer(spark, path), q, nProbe = 2)
    graft.plans.GraftFunctions.register(spark)
    val recon = transform(col("embedding").cast("array<double>"),
      x => lit(mn) + round((x - lit(mn)) / lit(scale), 0) * lit(scale))
    val expect = lay.filter(col("ivf_bucket").isin(probed: _*))
      .filter(col("vec_id") =!= 0)
      .withColumn("__cos", call_function(
        graft.plans.GraftFunctions.CosineName, recon,
        array(q.map(lit): _*)))
      .orderBy(round(col("__cos"), 6).desc, col("vec_id"))
      .limit(10).select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(rows.map(_.getLong(0)).toSeq === expect)
  }

  test("IVF-PQ: stored codes match the encoder, probe prunes and reads only the m-int payload") {
    val emb = Tables.embeddings(spark, sf)
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      m = 4, codebookK = 8, salt = "ivfpqspec")
    val path = Similarity.ensureIvfLayout(emb, "vec_id", "embedding",
      Similarity.trainQuantizer(emb, "vec_id", "embedding",
        k = 8, iters = 2, salt = "ivfpqspec"),
      s"ivfpq-spec-${System.nanoTime()}",
      pqBooks = books, withPq = true)
    assert(new java.io.File(path, "_pq/_SUCCESS").exists())
    // the sidecar round-trips the codebooks bit-for-bit
    assert(Similarity.readPqBooks(spark, path) === books)
    val lay = spark.read.parquet(path)
    // every stored code names an existing codebook entry of its subspace
    val valid = books.map(_.map(_._1).toSet)
    val badCodes = lay.select(col("pq_code")).collect().count { r =>
      val cs = r.getSeq[Int](0)
      cs.length != 4 || cs.zipWithIndex.exists { case (c, j) => !valid(j)(c) }
    }
    assert(badCodes === 0)

    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0)
    val probe = Similarity.ivfPqProbe(spark, path, "vec_id", q,
      k = 10, nProbe = 2, excludeId = Some(0L))
    val rows = probe.collect()
    assert(rows.length === 10)
    rows.foreach(r =>
      assert(math.abs(r.getAs[Double]("cosine_pq")) <= 1.0 + 1e-6))
    // pruned at planning AND the scan reads the m-int codes — neither the
    // float vectors nor even the sq8 codes
    val scan = probe.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.metadata("PartitionFilters").contains("ivf_bucket"),
      scan.metadata("PartitionFilters"))
    assert(scan.selectedPartitions.partitionCount === 2)
    assert(scan.metadata("ReadSchema").contains("pq_code"),
      scan.metadata("ReadSchema"))
    assert(!scan.metadata("ReadSchema").contains("embedding"),
      scan.metadata("ReadSchema"))
    assert(!scan.metadata("ReadSchema").contains("sq8_code"),
      scan.metadata("ReadSchema"))
  }

  test("IVF-PQ rerank: refine tier matches the float probe, reads floats only for the shortlist") {
    val emb = Tables.embeddings(spark, sf)
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      m = 4, codebookK = 8, salt = "ivfpqrrspec")
    val path = Similarity.ensureIvfLayout(emb, "vec_id", "embedding",
      Similarity.trainQuantizer(emb, "vec_id", "embedding",
        k = 8, iters = 2, salt = "ivfpqrrspec"),
      s"ivfpqrr-spec-${System.nanoTime()}",
      pqBooks = books, withPq = true)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0)
    // a shortlist covering every row in the probed buckets makes the
    // refine tier EXACT over those buckets: it must reproduce the float
    // probe's top-k (same rows; rerank re-scores exactly)
    val nProbed = Similarity.ivfPqProbe(spark, path, "vec_id", q,
      k = Int.MaxValue, nProbe = 2, excludeId = Some(0L)).count().toInt
    val rr = Similarity.ivfPqRerankTopK(spark, path, "vec_id", "embedding",
      q, k = 10, nProbe = 2, shortlist = nProbed, excludeId = Some(0L))
    val fl = Similarity.ivfProbe(spark, path, "vec_id", "embedding", q,
      k = 10, nProbe = 2, excludeId = Some(0L))
    assert(rr.select(col("vec_id")).collect().map(_.getLong(0)).toSet ===
      fl.select(col("vec_id")).collect().map(_.getLong(0)).toSet)
    // a small shortlist still returns k rows, and the refine scan is
    // pruned to the probed partitions with the shortlist id filter
    // PUSHED into the parquet reader beside the float column it refines
    val small = Similarity.ivfPqRerankTopK(spark, path, "vec_id",
      "embedding", q, k = 10, nProbe = 2, shortlist = 20,
      excludeId = Some(0L))
    assert(small.count() === 10)
    val scan = small.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.metadata("PartitionFilters").contains("ivf_bucket"),
      scan.metadata("PartitionFilters"))
    assert(scan.selectedPartitions.partitionCount === 2)
    assert(scan.metadata("PushedFilters").contains("In(vec_id"),
      scan.metadata("PushedFilters"))
    assert(scan.metadata("ReadSchema").contains("embedding"),
      scan.metadata("ReadSchema"))
    assert(!scan.metadata("ReadSchema").contains("pq_code"),
      scan.metadata("ReadSchema"))
  }

  test("ensureIvfLayout builds once, reuses later, and skips re-training") {
    val emb = Tables.embeddings(spark, sf)
    val key = s"spec-reuse-${System.nanoTime()}"
    var trained = 0
    def quantizer: Seq[(Int, Seq[Double])] = {
      trained += 1
      Similarity.trainQuantizer(emb, "vec_id", "embedding",
        k = 4, iters = 1, salt = "spec")
    }
    val p1 = Similarity.ensureIvfLayout(emb, "vec_id", "embedding", quantizer, key)
    val marker = new java.io.File(p1, "_SUCCESS")
    assert(marker.exists())
    assert(trained === 1)
    val built = marker.lastModified()
    val p2 = Similarity.ensureIvfLayout(emb, "vec_id", "embedding", quantizer, key)
    assert(p2 === p1)
    assert(marker.lastModified() === built) // second call did not rebuild
    assert(trained === 1) // by-name quantizer: a warm hit never re-trains
    // a different cache key (new data fingerprint) gets its own layout
    val p3 = Similarity.ensureIvfLayout(emb, "vec_id", "embedding", quantizer,
      key + "-regen")
    assert(p3 !== p1)
    assert(trained === 2)
  }

  test("multi-assignment layout: each vector in its top-2 buckets, probe dedups") {
    val path = Files.createTempDirectory("graft_ivf_ma").toString + "/emb"
    val emb = Tables.embeddings(spark, sf)
    val cents = Similarity.trainQuantizer(emb, "vec_id", "embedding",
      k = 8, iters = 2, salt = "spec")
    Similarity.writeIvfLayout(emb, "vec_id", "embedding", cents, path,
      assign = 2)
    val n = emb.count()
    val layout = spark.read.parquet(path)
    // every vector written exactly twice, to two DISTINCT buckets
    assert(layout.count() === 2 * n)
    val perVec = layout.groupBy("vec_id")
      .agg(count(lit(1)).as("n"), countDistinct("ivf_bucket").as("nb"))
    assert(perVec.filter(col("n") =!= 2 || col("nb") =!= 2).count() === 0)
    // the written pair IS the top-2 by centroid cosine for a spot vector
    val v0 = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val expect = cents.sortBy { case (b, c) => (-cos(c, v0), -b) }
      .take(2).map(_._1).toSet
    val got = layout.filter(col("vec_id") === 0)
      .select("ivf_bucket").collect().map(_.getInt(0)).toSet
    assert(got === expect)
    // the probe collapses copies: no duplicate ids at any nProbe
    val q = v0
    val pr = Similarity.ivfProbe(spark, path, "vec_id", "embedding", q,
      k = 20, nProbe = 4, excludeId = Some(0L)).collect()
    val ids = pr.map(_.getLong(0)).toSeq
    assert(ids.distinct.length === ids.length, ids)
    // ... and the reported bucket is the LOWEST of the probed copies
    // (the min-struct tie rule the oracle replays)
    assert(Similarity.layoutAssign(spark, path) === 2)
  }

  test("quantized tiers reject a multi-assigned layout loudly") {
    val path = Files.createTempDirectory("graft_ivf_ma2").toString + "/emb"
    val emb = Tables.embeddings(spark, sf)
    Similarity.writeIvfLayout(emb, "vec_id", "embedding",
      Similarity.trainQuantizer(emb, "vec_id", "embedding",
        k = 4, iters = 1, salt = "spec"), path, assign = 2)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .collect().head.getSeq[Double](0)
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfSq8Probe(spark, path, "vec_id", q, k = 5, nProbe = 1)
    }
    assert(e.getMessage.contains("multi-assigned"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfProbeBatch(spark, path, "vec_id", "embedding",
        Seq((0L, q)), k = 5, nProbe = 1)
    }
    assert(e2.getMessage.contains("multi-assigned"))
  }
}

package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** ANN recall-curve artifact: sweeps `nProbe` over the full quantizer
  * range on the real IVF layout and emits recall@10 (vs the exhaustive
  * probe) together with the mean fraction of rows each probe actually
  * scans — the recall/cost trade the trained quantizer buys, measured
  * instead of asserted:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.RecallCurve"
  * writes `ANN_RECALL.json`. `nProbe = k` (all centroids) scans every
  * bucket, so that point IS the exact brute-force answer and anchors
  * recall 1.0 by construction; the sweep must be monotone non-decreasing
  * (enforced here) because probing strictly more buckets can only add
  * candidates.
  */
object RecallCurve {

  /** Monotone flags for a recall sweep: point i flags false when its
    * recall dips below point i−1 beyond fp tolerance. A dip is recorded
    * on the artifact and warned to stderr, never an abort — a flagged
    * artifact is evidence, an aborted run is nothing. ONE definition for
    * both sweeps (nProbe and PQ shortlist) so their monotone semantics
    * cannot diverge.
    */
  private def monotoneFlags(label: String, keys: Seq[Int],
      recalls: Seq[Double]): Seq[Boolean] = {
    val flags = true +: (1 until recalls.length).map(i =>
      recalls(i) >= recalls(i - 1) - 1e-9)
    flags.zip(keys.zip(recalls)).foreach {
      case (false, (k, r)) => System.err.println(
        s"WARN: $label recall dipped at $k (recall=$r) — see monotone flags")
      case _ => ()
    }
    flags
  }
  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("ANN_RECALL.json")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Session.local(cpus)

    val path = SparkEntry.ivfLayout(spark, sfDir)
    val nQueries = 10
    val qvs = graft.sources.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq.sortBy(_._1)
    val cents = Similarity.readQuantizer(spark, path)
    val nCentroids = cents.length
    val sizes = spark.read.parquet(path)
      .groupBy(col("ivf_bucket")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = sizes.values.sum.toDouble

    def topSets(nProbe: Int): Map[Long, Set[Long]] =
      Similarity.ivfProbeBatch(spark, path, "vec_id", "embedding", qvs,
          k = 10, nProbe = nProbe)
        .select(col("qid"), col("vec_id")).collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    val exact = topSets(nCentroids)
    val points = (1 to nCentroids).map { np =>
      val approx = topSets(np)
      val recall = qvs.map { case (q, _) =>
        approx.getOrElse(q, Set.empty[Long]).intersect(exact(q)).size / 10.0
      }.sum / qvs.length
      val frac = qvs.map { case (_, v) =>
        Similarity.probeBuckets(cents, v, np)
          .map(b => sizes.getOrElse(b, 0L)).sum / total
      }.sum / qvs.length
      (np, recall, frac)
    }
    // A recall dip between consecutive nProbe points would mean the probe
    // dropped a true neighbor it had already found — possible only through
    // tie-break drift between the approx and exact paths (they share one
    // deterministic (cosine desc, id) order today).
    val flags = monotoneFlags("nProbe", points.map(_._1), points.map(_._2))

    // ---- PQ shortlist sweep: the two-stage (ADC shortlist → exact
    // rerank) recall curve. Codebooks are trained ONCE (index metadata —
    // the train-once serve-many split pqCodebooks exists for) and every
    // (query, shortlist) point runs the REAL pqRerankTopK operator; the
    // shortlist=10 point is set-identical to the raw ADC top-10, so the
    // curve starts at the unreranked PQ recall and shows what each
    // shortlist multiplier buys. rerank_frac = shortlist / corpus = the
    // fraction of float vectors the refine stage reads.
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val nVecs = emb.count()
    val pqBooks = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      m = SparkEntry.PqM, codebookK = SparkEntry.PqKc)
    // the codes frame is index metadata too — encode once, serve every
    // (query, shortlist) point from it (the pqEncode/pqRerankTopK split)
    val pqCodes = Similarity.pqEncode(emb, "vec_id", "embedding", pqBooks)
      .localCheckpoint()
    val exactByQ = qvs.map { case (qid, _) =>
      qid -> Similarity.bruteForceTopKNative(emb, "vec_id", "embedding",
        qid, 10).select(col("vec_id")).collect().map(_.getLong(0)).toSet
    }.toMap
    val shortlists = Seq(10, 20, 50, 100, 200, 400)
      .filter(_ <= nVecs.toInt)
    val pqPoints = shortlists.map { s =>
      val recall = qvs.map { case (qid, _) =>
        val got = Similarity.pqRerankTopK(emb, "vec_id", "embedding", qid,
            k = 10, shortlist = s, m = SparkEntry.PqM,
            codebookK = SparkEntry.PqKc, books = Some(pqBooks),
            codes = Some(pqCodes))
          .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        got.intersect(exactByQ(qid)).size / 10.0
      }.sum / qvs.length
      (s, recall, s / nVecs.toDouble)
    }
    val pqFlags = monotoneFlags("PQ shortlist", pqPoints.map(_._1),
      pqPoints.map(_._2))

    // ---- composed IVF-PQ + rerank sweep: the full serving path on the
    // REAL layout (pruned ADC shortlist → exact float rerank of the
    // shortlist rows). Reference = the float probe over the SAME probed
    // buckets, so the curve isolates what the refine tier recovers of
    // the PQ quantization error (bucket-coverage loss is the nProbe
    // sweep's story above). shortlist=10 is the raw ivfPqProbe ranking.
    val ivfPqNProbe = 2
    val flByQ = qvs.map { case (qid, v) =>
      qid -> Similarity.ivfProbe(spark, path, "vec_id", "embedding", v,
          k = 10, nProbe = ivfPqNProbe, excludeId = Some(qid))
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    }.toMap
    val ivfPqShortlists = Seq(10, 20, 50, 100).filter(_ <= nVecs.toInt)
    val ivfPqPoints = ivfPqShortlists.map { s =>
      val gotByQ = qvs.map { case (qid, v) =>
        qid -> Similarity.ivfPqRerankTopK(spark, path, "vec_id",
            "embedding", v, k = 10, nProbe = ivfPqNProbe, shortlist = s,
            excludeId = Some(qid))
          .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      }.toMap
      val recall = qvs.map { case (qid, _) =>
        gotByQ(qid).intersect(flByQ(qid)).size / 10.0 }.sum / qvs.length
      // END-TO-END recall: reference = global exact top-10 (exactByQ,
      // the brute-force set the PQ sweep already computed), so
      // coarse-quantizer misses — true neighbors in unprobed buckets —
      // count against this column but not against recall_at_10. The gap
      // between the two IS the bucket-coverage loss at this n_probe.
      val recallExact = qvs.map { case (qid, _) =>
        gotByQ(qid).intersect(exactByQ(qid)).size / 10.0 }.sum / qvs.length
      (s, recall, recallExact)
    }
    val ivfPqFlags = monotoneFlags("IVF-PQ shortlist",
      ivfPqPoints.map(_._1), ivfPqPoints.map(_._2))

    // ---- residual-vs-raw PQ encoding, measured fairly: mean raw-ADC
    // recall vs the float probe on the SAME buckets for both encodings
    // (the same quantizer serves both layouts, so the float reference
    // sets are shared). On THIS corpus — isotropic random embeddings,
    // weak coarse clusters — residuals are nearly as large as the
    // vectors and the faiss encoding has little to win; the number is
    // reported as measured either way (the clustered-data advantage is
    // pinned in SimilaritySpec instead, where the theory applies).
    val rpqPath = SparkEntry.ivfLayoutResidual(spark, sfDir)
    def pqProbeRecall(p: String): Double = qvs.map { case (qid, v) =>
      Similarity.ivfPqProbe(spark, p, "vec_id", v, k = 10,
          nProbe = ivfPqNProbe, excludeId = Some(qid))
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        .intersect(flByQ(qid)).size / 10.0
    }.sum / qvs.length
    val rawAdcRecall = pqProbeRecall(path)
    val rpqAdcRecall = pqProbeRecall(rpqPath)

    // ---- multi-assignment sweep: the assign=2 layout (each vector in
    // its top-2 coarse buckets, 2× storage) probed at every nProbe,
    // END-TO-END recall vs global exact — against the single-assign
    // layout's e2e recall at the SAME nProbe. Bucket-coverage recall
    // bought at write time (storage, once) vs at read time (nProbe,
    // per query): the scanned_frac column prices the read side of the
    // ma layout (copies included, so it can exceed the single curve).
    val maPath = SparkEntry.ivfLayoutMulti(spark, sfDir)
    val maSizes = spark.read.parquet(maPath)
      .groupBy(col("ivf_bucket")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    def e2eRecall(p: String, np: Int): Double = qvs.map { case (qid, v) =>
      Similarity.ivfProbe(spark, p, "vec_id", "embedding", v, k = 10,
          nProbe = np, excludeId = Some(qid))
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        .intersect(exactByQ(qid)).size / 10.0
    }.sum / qvs.length
    val maPoints = (1 to nCentroids).map { np =>
      val fracMa = qvs.map { case (_, v) =>
        Similarity.probeBuckets(cents, v, np)
          .map(b => maSizes.getOrElse(b, 0L)).sum / total
      }.sum / qvs.length
      (np, e2eRecall(maPath, np), e2eRecall(path, np), fracMa)
    }
    val maFlags = monotoneFlags("multi-assign nProbe",
      maPoints.map(_._1), maPoints.map(_._2))

    val json =
      f"""{
         |  "what": "recall@10 of the pruned IVF probe vs exhaustive, mean over $nQueries query vectors on the trained layout; scanned_frac = mean fraction of corpus rows the probe reads — the recall/cost trade the quantizer buys; monotone=false flags a recall dip vs the previous point (tie-break drift), healthy = all true",
         |  "sf_dir": "$sfDir", "k": 10, "queries": $nQueries, "centroids": $nCentroids,
         |  "monotone_all": ${flags.forall(identity)},
         |  "points": [
         |${points.zip(flags).map { case ((np, r, f), m) =>
             f"""    {"n_probe": $np, "recall_at_10": $r%.3f, "scanned_frac": $f%.3f, "monotone": $m}"""
           }.mkString(",\n")}
         |  ],
         |  "pq": {
         |    "what": "two-stage PQ recall@10: ADC shortlist then exact rerank, mean over $nQueries queries, codebooks trained once; shortlist=10 IS the raw ADC top-10; rerank_frac = fraction of float vectors the refine stage reads; shortlist growth is supersets, so recall must be monotone",
         |    "m": ${SparkEntry.PqM}, "codebook_k": ${SparkEntry.PqKc}, "bytes_per_vec": ${SparkEntry.PqM},
         |    "monotone_all": ${pqFlags.forall(identity)},
         |    "points": [
         |${pqPoints.zip(pqFlags).map { case ((s, r, f), m) =>
             f"""      {"shortlist": $s, "recall_at_10": $r%.3f, "rerank_frac": $f%.3f, "monotone": $m}"""
           }.mkString(",\n")}
         |    ]
         |  },
         |  "ivf_pq_rerank": {
         |    "what": "composed serving path: pruned ADC shortlist then exact float rerank of the shortlist rows, recall@10 vs the float probe over the SAME n_probe=$ivfPqNProbe buckets (isolates the PQ error the refine tier recovers; shortlist=10 is the raw ivfPqProbe ranking), mean over $nQueries queries; recall_vs_exact_at_10 references GLOBAL brute-force top-10 instead, so coarse-quantizer misses count — the end-to-end number a serving user experiences, and the gap to recall_at_10 is the bucket-coverage loss at this n_probe",
         |    "n_probe": $ivfPqNProbe,
         |    "monotone_all": ${ivfPqFlags.forall(identity)},
         |    "points": [
         |${ivfPqPoints.zip(ivfPqFlags).map { case ((s, r, re), m) =>
             f"""      {"shortlist": $s, "recall_at_10": $r%.3f, "recall_vs_exact_at_10": $re%.3f, "monotone": $m}"""
           }.mkString(",\n")}
         |    ]
         |  },
         |  "residual_pq": {
         |    "what": "mean raw-ADC recall@10 vs the float probe on the SAME n_probe=$ivfPqNProbe buckets, raw encoding vs residual (faiss) encoding, $nQueries queries sharing one quantizer; on this isotropic corpus coarse clusters are weak, residuals are nearly full-size, and the residual encoding is expected to buy ~nothing — reported as measured; the clustered-data advantage is pinned in SimilaritySpec",
         |    "recall_raw_adc": ${f"$rawAdcRecall%.3f"},
         |    "recall_residual_adc": ${f"$rpqAdcRecall%.3f"}
         |  },
         |  "multi_assign": {
         |    "what": "assign=2 layout (each vector in its top-2 coarse buckets, 2x storage): end-to-end recall@10 vs GLOBAL exact per n_probe, against the single-assign layout at the same n_probe — coverage bought at write time (storage, once) vs read time (n_probe, per query); scanned_frac counts the ma layout's copies, so it prices the read amplification too",
         |    "assign": 2, "storage_x": 2.0,
         |    "monotone_all": ${maFlags.forall(identity)},
         |    "points": [
         |${maPoints.zip(maFlags).map { case ((np, rm, rs, f), m) =>
             f"""      {"n_probe": $np, "recall_e2e": $rm%.3f, "recall_e2e_single": $rs%.3f, "scanned_frac": $f%.3f, "monotone": $m}"""
           }.mkString(",\n")}
         |    ]
         |  }
         |}""".stripMargin
    Files.write(Paths.get(outPath), (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}

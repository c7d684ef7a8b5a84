package graft


/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A full warmup pass runs first so JIT + codegen +
  * parquet footer caching don't land in the timed numbers (round-1 bench
  * charged ~40 s of first-query warmup to one query).
  *
  * Consumption is a `noop`-format write, not `count()`: under `count()`
  * Catalyst prunes every projected column, so projection-heavy queries
  * (format/interval/window arithmetic) were timed without computing their
  * output expressions. The noop sink materializes every output column on
  * the executors and discards the rows — the honest cost of the query.
  *
  * A query that throws is recorded in a "failed" list and its time is
  * null — never folded into the total as a near-zero success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Session.local(cpus)
    // optional args: query-name subset (local iteration; driver passes none)
    val names = {
      val all = SparkEntry.queries.keys.toSeq.sorted
      if (args.nonEmpty) all.filter(args.toSet) else all
    }
    def run(name: String): Boolean =
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        true
      } catch { case _: Throwable => false }
    names.foreach(run) // warmup
    // min of 2 timed runs: this host shows multi-second scheduling/GC
    // stalls that land on random queries; min-of-N reports the real cost
    def timeOnce(name: String): Option[Double] = {
      val t0 = System.nanoTime()
      val ok = run(name)
      if (ok) Some((System.nanoTime() - t0) / 1e9) else None
    }
    // two full interleaved passes (not back-to-back per query): the stall
    // windows last tens of seconds, so consecutive runs of one query would
    // both land inside one
    val pass1 = names.map(n => n -> timeOnce(n)).toMap
    val pass2 = names.map(n => n -> timeOnce(n)).toMap
    val results = names.map { n =>
      n -> ((pass1(n), pass2(n)) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case (a, b)             => a.orElse(b)
      })
    }
    val failed = results.collect { case (n, None) => "\"" + n + "\"" }
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + v.map(_.toString).getOrElse("null")
    }.mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft


/** Plan-inspection tool: prints the formatted physical plan of the named
  * queries (all queries if none given) against SPARK_GRAFT_SF_DIR. Used to
  * audit pushdown/broadcast/codegen properties of every registered query:
  *   sbt "runMain graft.Explain q_time_range_scan q_dim_join_rollup"
  *
  * With `--run` as the first arg, each query is EXECUTED first and the
  * FINAL adaptive plan is printed — required to see runtime-only facts
  * like AQE exchange/stage reuse (`ReusedExchange`), which never appear
  * in the static initial plan.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val run = args.headOption.contains("--run")
    val rest = if (run) args.drop(1).toSeq else args.toSeq
    val spark = Session.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (rest.nonEmpty) rest else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (run) {
          // collect() drives THIS df's queryExecution (df.write would spawn
          // a fresh one and leave this plan un-finalized); results are
          // small at explain scale
          df.collect()
          println(df.queryExecution.executedPlan.toString)
        } else df.explain("formatted")
      } catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}

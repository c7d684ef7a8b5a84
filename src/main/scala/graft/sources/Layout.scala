package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-lake layout for the fact stream at scale (SURVEY §4 partition
  * pruning, §7.4(6)): Parquet partitioned by event date, the distributed
  * analog of the reference's `(timestamp DESC)` B-tree index
  * (reference/init.sql:29-31) — time-range queries touch only the matching
  * `day=…` directories (static partition pruning; dynamic for join-driven
  * ranges), instead of index-scanning one node.
  */
object Layout {

  /** Write `df` partitioned by the date of `tsCol`. At 100 TB, add a
    * second in-file ordering (e.g. sortWithinPartitions on the key) so
    * row-group min/max statistics prune within a day as well.
    */
  def writeByDay(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("day", to_date(col(tsCol)))
      .sortWithinPartitions(col(tsCol))
      .write.partitionBy("day").mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Day-bounded scan over a partitioned layout. The `day` predicate is a
    * partition filter (pruned at planning, zero I/O for other days); the
    * `tsCol` bounds additionally prune row groups within the day.
    */
  def scanDays(spark: SparkSession, path: String,
      fromDay: String, toDay: String): DataFrame =
    read(spark, path)
      .filter(col("day") >= lit(fromDay) && col("day") <= lit(toDay))

  /** Bucketed table layout for co-located fact-fact joins: both sides
    * bucketed (and sorted) on the join key with the same bucket count join
    * with NO shuffle exchange — the pre-partitioning that replaces the
    * per-query shuffle of repeated large joins (SURVEY §4 "shuffle/
    * partitioning control"). Bucket count should approximate
    * target-cluster parallelism at 100 TB (thousands), not the local 4
    * used in tests.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)
}

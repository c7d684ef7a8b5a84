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

  /** Content manifest of a table — the integrity record a 100 TB
    * pipeline stamps at every handoff (post-ingest, post-curation,
    * pre-training) so silent corruption, partial writes, and
    * re-generation drift are detectable by DIFFING two one-row frames:
    * row count, per-column null counts, and an order-independent
    * content checksum (`bit_xor` of the portable 60-bit md5 of each
    * row's canonical rendering — XOR commutes, so the checksum is
    * invariant under row order, partitioning, and engine, and any
    * single-row change flips it). ONE map-side-combinable aggregation
    * pass; no shuffle beyond the 1-row final combine.
    *
    * Canonical rendering = the named columns cast to string (NULL → a
    * \\u001e sentinel) joined with \\u001f, in the GIVEN column order —
    * so two manifests only compare if built with the same column list.
    * Cast-to-string of doubles/timestamps can format differently across
    * engines; canonicalize such columns yourself (round/unix_micros)
    * before manifesting if the checksum must be engine-portable.
    */
  def manifest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "manifest: empty column list")
    val canon = concat_ws("\u001f",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u001e"))): _*)
    val aggs =
      expr("bit_xor(__h)").as("checksum") +:
      cols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    df.withColumn("__h", graft.ext.PortableHash.hash60(canon))
      .agg(count(lit(1)).as("row_count"), aggs: _*)
  }
}

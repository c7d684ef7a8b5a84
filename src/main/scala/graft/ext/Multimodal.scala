package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque binary payload column + typed metadata per media row. */
final case class MediaRecord(
    doc_id: Long, payload: Array[Byte], mime: String, n_bytes: Int)

/** Per-record extracted features. The decode step is a STUB (see
  * [[Multimodal.extractFeatures]]); the schema/partitioning/batching
  * plumbing around it is real.
  */
final case class MediaFeatures(
    doc_id: Long, n_bytes: Int, byte_mean: Double, distinct_byte_ratio: Double)

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * There is no media codec in this environment, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (byte-level statistics standing in
  * for decoded-frame features). Everything around it is the real
  * production shape: explicit schema, binary payload column, typed
  * `Dataset` boundary, `mapPartitions` batch processing (the Scala analog
  * of arrow-batched pandas UDFs) so per-batch decoder state is amortized,
  * and narrow no-shuffle execution.
  */
object Multimodal {

  /** Attach a binary payload + metadata to the documents table. In a real
    * corpus the payload column arrives from storage; here the UTF-8 bytes
    * of `text` stand in as the opaque payload.
    */
  def attach(df: DataFrame): DataFrame =
    df.withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("mime", lit("text/plain"))
      .withColumn("n_bytes", length(col("payload")))

  /** Typed boundary: DataFrame → Dataset[MediaRecord]. */
  def records(spark: SparkSession, df: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    attach(df).select(col("doc_id"), col("payload"), col("mime"), col("n_bytes"))
      .as[MediaRecord]
  }

  /** Per-partition batched "decode + feature extraction".
    *
    * STUB: a real implementation opens a codec per partition and decodes
    * each payload (image resize / audio resample / frame sampling). The
    * container has no media libraries, so the "features" are deterministic
    * byte statistics — the batch shape, per-partition initialization, and
    * typed output schema are exactly what a real decoder plugs into.
    */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition init happens here (codec handles, model weights, …)
      it.map { r =>
        val bytes = r.payload
        val seen = new Array[Boolean](256)
        var sum = 0L; var distinct = 0; var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          sum += b
          if (!seen(b)) { seen(b) = true; distinct += 1 }
          i += 1
        }
        val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
        MediaFeatures(r.doc_id, r.n_bytes,
          math.rint(mean * 1e6) / 1e6,
          math.rint(distinct / 256.0 * 1e6) / 1e6)
      }
    }
  }
}

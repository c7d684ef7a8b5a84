package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque binary payload column + typed metadata per media row. */
final case class MediaRecord(
    doc_id: Long, payload: Array[Byte], mime: String, n_bytes: Int)

/** Byte-level features for OPAQUE payloads (mime types with no decoder
  * registered — see [[Multimodal.extractFeatures]]).
  */
final case class MediaFeatures(
    doc_id: Long, n_bytes: Int, byte_mean: Double, distinct_byte_ratio: Double)

/** Decoded-image features: real `javax.imageio` output (`decoded` false +
  * nulls when no registered reader accepts the payload).
  */
final case class ImageFeatures(
    doc_id: Long, decoded: Boolean,
    width: Option[Int], height: Option[Int], channels: Option[Int])

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The image path is REAL: [[Multimodal.decodeImages]] decodes PNG
  * payloads with the JDK's built-in `javax.imageio` (no external codec
  * needed) inside the same `mapPartitions` batch shape a heavier decoder
  * (video frames, audio resample) would plug into — explicit schema,
  * binary payload column, typed `Dataset` boundary, per-partition
  * initialization, narrow no-shuffle execution. Byte-level statistics
  * ([[Multimodal.extractFeatures]]) remain as the honest fallback for
  * mime types with no in-container codec.
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

  /** Deterministic PNG dimensions per document — `(4 + id % 13) ×
    * (3 + id % 11)` — shared by the fixture builder, the spec, and the
    * `q_multimodal_features` oracle (`4 + doc_id % 13` etc. in SQL), so
    * a decode that returns ANYTHING but the constructed dimensions fails
    * the hash compare.
    */
  def fixtureDims(docId: Long): (Int, Int) =
    (4 + (docId % 13).toInt, 3 + (docId % 11).toInt)

  /** Deterministic 24-bit pixel for fixture position (x, y) of `docId` —
    * a cheap integer mix, NOT a hash: the point is only that every image
    * differs and a decode round-trip can compare exact pixel values
    * (PNG is lossless).
    */
  def fixturePixel(docId: Long, x: Int, y: Int): Int =
    ((docId * 2654435761L + x * 97L + y) & 0xffffffL).toInt

  /** Attach a REAL image payload: each document gets a small deterministic
    * RGB PNG (dimensions and pixels are pure functions of `doc_id`),
    * encoded with the JDK's ImageIO inside the batch shape — at scale the
    * payload column arrives from object storage instead; everything
    * downstream (schema, decode, features) is identical.
    */
  def attachImages(spark: SparkSession, df: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col("doc_id")).as[Long].mapPartitions { it =>
      // per-partition init: one reusable encode buffer, disk cache off
      javax.imageio.ImageIO.setUseCache(false)
      val out = new java.io.ByteArrayOutputStream(4096)
      it.map { id =>
        val (w, h) = fixtureDims(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, fixturePixel(id, x, y)); x += 1 }
          y += 1
        }
        out.reset()
        javax.imageio.ImageIO.write(img, "png", out)
        val bytes = out.toByteArray
        MediaRecord(id, bytes, "image/png", bytes.length)
      }
    }
  }

  /** Per-partition batched image decode — REAL `javax.imageio` work: the
    * payload bytes go through the PNG reader and the features are read
    * off the decoded `BufferedImage` (raster band count = channels). A
    * payload no registered reader accepts degrades to `decoded = false`
    * with null dimensions instead of poisoning the batch — the per-row
    * try is the production posture for corrupt members of a 100 TB
    * corpus (quarantine, don't crash the stage).
    */
  def decodeImages(ds: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      it.map { r =>
        // NonFatal, not just IOException: ImageIO throws unchecked
        // exceptions on malformed-but-signature-valid payloads (e.g.
        // corrupt header dimensions), and the quarantine contract must
        // hold for those too
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) ImageFeatures(r.doc_id, decoded = false, None, None, None)
        else ImageFeatures(r.doc_id, decoded = true,
          Some(img.getWidth), Some(img.getHeight),
          Some(img.getRaster.getNumBands))
      }
    }
  }

  /** Per-partition batched byte-statistics extraction — the fallback for
    * OPAQUE payloads (mime types with no decoder in the container, e.g.
    * the text/plain payloads of [[attach]]): deterministic byte-level
    * features in the same batch shape as [[decodeImages]].
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

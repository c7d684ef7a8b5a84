package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE engine-portable hash construction every value oracle replays: the
  * top 60 bits of an md5, as a non-negative bigint, optionally mapped to
  * a uniform [0, 1) double. One definition, two forms — a Column
  * expression for executors and a driver-side scalar for plan literals —
  * so the Spark twins and their DuckDB replays
  * (`('0x' || substring(md5(x), 1, 15))::BIGINT [/ 2^60]`) can never
  * drift apart one call site at a time. Used by the signature queries
  * (Dedup), the split/sample draws (Curate), and the SRP hyperplanes
  * (Similarity).
  */
object PortableHash {

  /** 2^60: the draw is 15 hex chars = 60 bits, so this maps it to [0,1). */
  val Pow60: Double = 1152921504606846976.0

  /** Top-60-bit md5 of the column, as a bigint. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Key-derived uniform in [0, 1): `hash60 / 2^60`. */
  def uniform01(c: Column): Column =
    hash60(c).cast("double") / lit(Pow60)

  /** Scalar twin of the Column [[hash60]] — bit-identical to evaluating
    * it on the same UTF-8 string (java MessageDigest md5 ≡ SQL md5;
    * same 15-hex-char parse). For JVM-side state (streaming sketch
    * updates) that must agree with Column-built sketches exactly.
    */
  def hash60(key: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Driver-side twin of the Column [[uniform01]]. */
  def uniform01(key: String): Double = hash60(key) / Pow60
}

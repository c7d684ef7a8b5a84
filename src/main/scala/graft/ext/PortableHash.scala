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

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Scalar twin of the Column [[hash60]] — bit-identical to evaluating
    * it on the same UTF-8 string (java MessageDigest md5 ≡ SQL md5;
    * same 15-hex-char parse). For JVM-side state (streaming sketch
    * updates) and bloom builds/probes (X126, two calls per value) that
    * must agree with Column-built values exactly. Hot path: the digest
    * is thread-local-reused and the top 60 bits read straight off the
    * first eight digest bytes — the first 15 hex chars are bytes 0–6
    * plus byte 7's high nibble, so `(b0..b6 << 4) | (b7 >>> 4)` is
    * exactly `parseLong(hex.take(15), 16)`.
    */
  def hash60(key: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(key.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Driver-side twin of the Column [[uniform01]]. */
  def uniform01(key: String): Double = hash60(key) / Pow60
}

package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

import graft.ext.PortableHash

/** X126 — per-file BLOOM FILTER INDEX for the OCC table: Delta's
  * bloom-filter-index feature re-expressed for the `_graft_occ` log
  * (reference anchor: the dashboard's point lookups in
  * `streamlit_dashboard.py` filter device/event identity columns that
  * min/max stats cannot prune when files aren't clustered on them).
  *
  * WHY blooms next to X117 stats: min/max skipping only prunes
  * equality lookups on columns the layout is SORTED or partitioned
  * by. A high-cardinality identity column (user_id, event_id,
  * document fingerprint) in arrival order has every file spanning
  * nearly the full value range — stats intervals admit everything. A
  * per-file bloom answers "could this file contain v?" regardless of
  * clustering: a point lookup over a 100 TB table plans only the
  * files whose filter says MAYBE (expected `fpp × #files` false
  * positives), and the exact residual filter keeps the result
  * identical to the unpruned scan.
  *
  * LAYOUT — bits in SIDECARS, parameters in the LOG. Bloom bits are
  * O(bits-per-key × rows) per file; inlining them would bloat every
  * commit line to ~100 KB+ and make the driver-side log fold pay for
  * bytes it rarely probes (Delta stores its bloom indexes in sidecar
  * `_delta_index` files for the same reason). Each indexed file gets
  * `_graft_occ_bloom/<file>.<urlenc(col)>.bf` — a 16-byte header
  * (magic, m bits, k probes, reserved) plus the bit array — written
  * ONCE next to the immutable data file it describes and never
  * mutated; the add action records only `bf=<col>:<m>:<k>` so the
  * snapshot fold knows which files are probe-able without touching
  * the sidecars. A missing/corrupt sidecar degrades to "cannot
  * prune", never to a wrong result.
  *
  * HASHING — the Kirsch–Mitzenmacher double-hash construction over
  * the repo's portable md5 ([[PortableHash.hash60]]): probe i sets
  * bit `floorMod(h1 + i·h2, m)` with `h2` forced odd so the stride
  * covers the table. Build (executors) and probe (driver) call the
  * SAME scalar function on the SAME string form (the column value
  * `cast("string")`, the pv convention) — agreement is by
  * construction, not by trusting two hash implementations to match.
  *
  * SIZING — Delta's contract: the WRITER declares expected items per
  * file (`numItems`) and a target false-positive rate (`fpp`);
  * `m = ceil(−n·ln p ∕ ln²2)` capped at [[MaxBits]] (1 MiB of bits),
  * `k = round(m/n·ln 2)`. Overfilling a file past `numItems` degrades
  * fpp, never correctness. Building streams one pass over each staged
  * file's values — no buffering of the file's keys, so build memory
  * is the bit array itself.
  */
object OccBloom {

  val BloomDirName = "_graft_occ_bloom"

  private val Magic = 0x47424631 // "GBF1"
  private val HeaderBytes = 16

  /** Bit-array cap: 2^23 bits = 1 MiB per (file, column). At 10 bits
    * per key that covers ~800 k distinct keys per file at the declared
    * fpp — roughly a 128 MB parquet file of identity-keyed rows.
    * Larger declared `numItems` hit the cap and degrade fpp smoothly
    * (the probe stays correct: no false negatives either way).
    */
  val MaxBits: Int = 1 << 23

  /** One indexed column: expected distinct items per FILE and the
    * target false-positive rate (Delta's `delta.bloomFilter.fpp` /
    * `numItems` knobs, per-file granularity).
    */
  final case class BloomCol(col: String, numItems: Long = 100000L,
      fpp: Double = 0.01) {
    require(numItems >= 1L, s"OccBloom: numItems must be >= 1, got $numItems")
    require(fpp > 0.0 && fpp < 1.0, s"OccBloom: fpp must be in (0,1), got $fpp")
  }

  /** (m bits, k probes) for a declared (numItems, fpp). Deterministic —
    * the same declaration always produces the same sidecar shape.
    */
  def params(numItems: Long, fpp: Double): (Int, Int) = {
    val ln2 = math.log(2.0)
    val mRaw = math.ceil(-numItems.toDouble * math.log(fpp) / (ln2 * ln2))
    val m = math.min(MaxBits.toDouble, math.max(64.0, mRaw)).toInt
    val k = math.max(1L, math.round(m.toDouble / numItems.toDouble * ln2))
    (m, math.min(k, 30L).toInt)
  }

  /** The double-hash pair for (column, value-as-string): h2 forced odd
    * so `h1 + i·h2 (mod m)` strides every residue. Called by executors
    * at build and the driver at probe — bit-identical by construction.
    */
  def hashPair(col: String, value: String): (Long, Long) =
    (PortableHash.hash60(s"$value|bfA|$col"),
      PortableHash.hash60(s"$value|bfB|$col") | 1L)

  /** Probe i's bit position; floorMod keeps the value in [0, m) even
    * when the long sum wraps — the SAME wrap on build and probe.
    */
  def bitOf(h1: Long, h2: Long, i: Int, m: Int): Int =
    java.lang.Math.floorMod(h1 + i.toLong * h2, m.toLong).toInt

  /** Column names may contain '.' (URLEncoder keeps it), which would
    * break sidecar-name parsing — encode the survivors that collide
    * with the name grammar.
    */
  private[sources] def encCol(c: String): String =
    java.net.URLEncoder.encode(c, "UTF-8")
      .replace(".", "%2E").replace("*", "%2A")

  def sidecarPath(dir: String, file: String, col: String): Path =
    new Path(s"$dir/$BloomDirName/$file.${encCol(col)}.bf")

  /** Data-file name a sidecar belongs to — [[OccTable.vacuum]] reclaims
    * sidecars whose data file is gone.
    */
  private[sources] def sidecarDataFile(sidecarName: String): Option[String] = {
    if (!sidecarName.endsWith(".bf")) return None
    val stem = sidecarName.stripSuffix(".bf")
    val cut = stem.lastIndexOf('.')
    if (cut <= 0) None else Some(stem.substring(0, cut))
  }

  private[sources] def setBit(bits: Array[Byte], pos: Int): Unit =
    bits(pos >>> 3) = (bits(pos >>> 3) | (1 << (pos & 7))).toByte

  private[sources] def getBit(bits: Array[Byte], pos: Int): Boolean =
    (bits(pos >>> 3) & (1 << (pos & 7))) != 0

  /** Add one value to an under-construction bit array. */
  def add(bits: Array[Byte], col: String, value: String, m: Int,
      k: Int): Unit = {
    val (h1, h2) = hashPair(col, value)
    var i = 0
    while (i < k) { setBit(bits, bitOf(h1, h2, i, m)); i += 1 }
  }

  /** Write a finished bit array as a sidecar (idempotent overwrite —
    * a retried build task re-emits identical bytes for the same
    * immutable data file).
    */
  def write(fsys: FileSystem, path: Path, m: Int, k: Int,
      bits: Array[Byte]): Unit = {
    val out = new java.io.DataOutputStream(fsys.create(path, true))
    try {
      out.writeInt(Magic); out.writeInt(m); out.writeInt(k); out.writeInt(0)
      out.write(bits)
    } finally out.close()
  }

  /** Load a sidecar's bit array, validating the header against the
    * LOG's recorded (m, k). None on any mismatch, absence, or IO error
    * — the probe then refuses to prune (correct, just not fast).
    */
  def load(fsys: FileSystem, path: Path, m: Int, k: Int)
      : Option[Array[Byte]] =
    try {
      if (!fsys.exists(path)) return None
      val in = new java.io.DataInputStream(fsys.open(path))
      try {
        val (mg, fm, fk) = (in.readInt(), in.readInt(), in.readInt())
        in.readInt() // reserved
        if (mg != Magic || fm != m || fk != k) None
        else {
          val bits = new Array[Byte]((m + 7) / 8)
          in.readFully(bits)
          Some(bits)
        }
      } finally in.close()
    } catch { case _: java.io.IOException => None }

  /** MAYBE-contains test against a loaded bit array. */
  def maybeContains(bits: Array[Byte], col: String, value: String,
      m: Int, k: Int): Boolean = {
    val (h1, h2) = hashPair(col, value)
    var i = 0
    while (i < k) {
      if (!getBit(bits, bitOf(h1, h2, i, m))) return false
      i += 1
    }
    true
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Allocation-free kernels for text shingling and SimHash, shared by the
  * interpreted (`eval`) and generated (`doGenCode`) paths of the
  * expressions below.
  *
  * Why kernels instead of higher-order-function SQL (SURVEY §7.3
  * escalation rule — built-ins first): the HOF formulation
  * `transform(sequence(...), i -> xxhash64(concat_ws(' ', slice(tokens, i, k))))`
  * runs interpreted lambdas that allocate a slice array, a concatenated
  * string and boxed longs PER SHINGLE POSITION. Profiling at sf0.1 showed
  * the resulting GC dominating the stage (task: 7.2 s wall, 2.8 s GC,
  * 3.3 s CPU). These kernels scan the raw text bytes once, hash byte
  * ranges in place, and reuse per-thread scratch buffers — the per-row
  * garbage is one primitive result array.
  *
  * The key identity making zero-copy correct: for single-space
  * tokenization, `concat_ws(' ', split(text, ' ')[i..i+k-1])` is exactly
  * the original byte range of `text` from the start of token i to the end
  * of token i+k−1 (split with Spark's default limit −1 keeps empty tokens,
  * and concat_ws re-joins them with the same single spaces). So each
  * shingle hash is `XXH64(bytes[start_i, end_{i+k-1}))` over the original
  * buffer — no token arrays, no slices, no string building — and is
  * bit-identical to Spark's `xxhash64` of the concatenated shingle
  * (seed 42), which the parity tests assert.
  */
object TextHashKernels {
  /** Seed used by Spark's `xxhash64` function — keeps kernel output
    * bit-identical to the HOF formulation it replaces. */
  final val Seed = 42L

  private val offsetsTL = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](64)
  }
  private val hashesTL = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](64)
  }
  private val votesTL = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](64)
  }

  /** Byte offsets one past each space, plus 0 at the front: token i spans
    * [starts(i), starts(i+1) − 1) and the sentinel starts(n) is len + 1.
    * Returns the token count n; offsets land in the shared scratch array.
    */
  private def tokenStarts(base: AnyRef, off: Long, len: Int): (Array[Int], Int) = {
    var starts = offsetsTL.get()
    var n = 1
    starts(0) = 0
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == ' ') {
        if (n + 1 >= starts.length) {
          starts = java.util.Arrays.copyOf(starts, starts.length * 2)
          offsetsTL.set(starts)
        }
        starts(n) = i + 1
        n += 1
      }
      i += 1
    }
    if (n + 1 >= starts.length) {
      starts = java.util.Arrays.copyOf(starts, starts.length + 2)
      offsetsTL.set(starts)
    }
    starts(n) = len + 1
    (starts, n)
  }

  /** Sorted distinct XXH64 hashes of all k-token shingles of `text`
    * (single-space tokenization). Empty array when the text has fewer
    * than k tokens.
    */
  def shingleHashes(text: UTF8String, k: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val (starts, n) = tokenStarts(base, off, text.numBytes)
    val m = n - k + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    var hashes = hashesTL.get()
    if (hashes.length < m) {
      hashes = new Array[Long](Integer.highestOneBit(m - 1) * 2)
      hashesTL.set(hashes)
    }
    var i = 0
    while (i < m) {
      val s = starts(i)
      val e = starts(i + k) - 1 // end of token i+k−1 = char before next space
      hashes(i) = XXH64.hashUnsafeBytes(base, off + s, e - s, Seed)
      i += 1
    }
    java.util.Arrays.sort(hashes, 0, m)
    // in-place dedup of the sorted range
    var w = 1
    i = 1
    while (i < m) {
      if (hashes(i) != hashes(w - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hashes, w))
  }

  /** Distinct k-token shingle STRINGS of `text` (single-space
    * tokenization), insertion-ordered. Each shingle is one byte-range copy
    * of the original buffer — no token arrays, no per-token slices, no
    * join buffers. For pipelines that need the actual shingle text (e.g.
    * engine-portable md5 signatures); hash-keyed pipelines use
    * [[shingleHashes]].
    */
  def shingleStrings(text: UTF8String, k: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val (starts, n) = tokenStarts(base, off, text.numBytes)
    val m = n - k + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val set = new java.util.LinkedHashSet[UTF8String](m * 2)
    var i = 0
    while (i < m) {
      val s = starts(i)
      val len = starts(i + k) - 1 - s
      val bytes = new Array[Byte](len)
      Platform.copyMemory(base, off + s, bytes, Platform.BYTE_ARRAY_OFFSET, len)
      set.add(UTF8String.fromBytes(bytes))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      set.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Every k-token shingle of `text` in document order WITH multiplicity
    * — the language-model counterpart of [[shingleStrings]] (which
    * dedups): n-gram counting needs each occurrence. Same zero-copy
    * token walk, no set.
    */
  def shingleStringsAll(text: UTF8String, k: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val (starts, n) = tokenStarts(base, off, text.numBytes)
    val m = n - k + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      val s = starts(i)
      val len = starts(i + k) - 1 - s
      val bytes = new Array[Byte](len)
      Platform.copyMemory(base, off + s, bytes, Platform.BYTE_ARRAY_OFFSET, len)
      out(i) = UTF8String.fromBytes(bytes)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** 64-bit SimHash over the token multiset of `text`: per-token XXH64
    * (seed 42, bit-identical to `xxhash64(token)`), ±1 vote per bit,
    * sign → bit. Matches the 64-conditional-sum aggregation formulation
    * exactly, including empty tokens from consecutive spaces voting.
    */
  def simhash64(text: UTF8String): Long = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val (starts, n) = tokenStarts(base, off, text.numBytes)
    val votes = votesTL.get()
    java.util.Arrays.fill(votes, 0)
    var i = 0
    while (i < n) {
      val s = starts(i)
      val h = XXH64.hashUnsafeBytes(base, off + s, starts(i + 1) - 1 - s, Seed)
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

/** `graft_shingle_hashes(text, k)`: sorted distinct XXH64 hashes of every
  * k-token shingle — the candidate-generation currency of the n-gram
  * Jaccard and MinHash dedup family. Runs inside whole-stage codegen via
  * a static kernel call; see [[TextHashKernels]] for why this beats the
  * HOF formulation.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input, got ${child.dataType}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.shingleHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextHashKernels.shingleHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `graft_shingle_strings(text, k)`: distinct k-token shingle strings —
  * the string-keyed sibling of [[ShingleHashes]] for pipelines whose
  * downstream hash must be engine-portable.
  */
case class ShingleStrings(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input, got ${child.dataType}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_strings"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.shingleStrings(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextHashKernels.shingleStrings($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
}

/** `graft_shingle_strings_all(text, k)`: every k-token shingle in order
  * WITH multiplicity — [[ShingleStrings]] without the dedup, for n-gram
  * COUNTING (language models) where each occurrence matters.
  */
case class ShingleStringsAll(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input, got ${child.dataType}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_strings_all"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.shingleStringsAll(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextHashKernels.shingleStringsAll($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleStringsAll =
    copy(child = newChild)
}

/** `graft_simhash64(text)`: the document's 64-bit SimHash signature in one
  * narrow projection — replaces an explode-over-tokens plus a 64-column
  * conditional-sum aggregation (a full shuffle of every token) with a
  * per-row kernel. Bit-identical to that formulation.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    TextHashKernels.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextHashKernels.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

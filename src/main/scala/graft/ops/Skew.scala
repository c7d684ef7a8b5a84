package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY §7.4(6)).
  *
  * First line of defense is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — zero code.
  * Salting is the explicit fallback for the pathological case AQE can't
  * fix: one join key so hot that a single (key) hash bucket exceeds an
  * executor. The big side spreads each key over `nSalts` sub-buckets; the
  * small side is replicated `nSalts`× (explode of a literal range), so the
  * hot key's work lands on `nSalts` tasks instead of one.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `nSalts` ways. Results are
    * identical to the unsalted join; only the shuffle distribution
    * changes. The salt is derived from a unique column of the big side so
    * the plan stays deterministic.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltSource: String, nSalts: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(nSalts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom semi-join reduction — the runtime row-level join pruning trick,
  * done explicitly: sketch the dimension side's join keys into a bloom
  * filter (index metadata, bounded bytes on the driver), then kill fact
  * rows that cannot possibly match BEFORE they reach the join exchange.
  * False positives survive the filter and are removed by the join itself,
  * so the result is EXACT; the win is shuffle volume — on a selective
  * join, most of a 100 TB fact table never leaves its input partition.
  *
  * When the dim side broadcasts anyway, the engine's hash join already
  * avoids a fact shuffle and this adds little; the sweet spot is a dim
  * too large to broadcast but whose KEY SET still sketches into a few MB
  * (millions of keys), with a join that keeps a minority of fact rows —
  * exactly where a plain sort-merge join pays the full fact shuffle.
  * (Catalyst's own `runtime.bloomFilter` rewrite exists for the same
  * reason; the explicit form works on any plan shape and any Spark conf,
  * and its sketch is reusable across queries.)
  */
object Joins {

  /** The reduced fact side: rows whose `key` might be in `dim`'s key set
    * (exact-match rows plus bloom false positives). Integral keys only —
    * the sketch hashes longs. SIZE `expectedDimKeys` to the real dim
    * cardinality: the sketch's bits scale with it, and an over-sized
    * sketch is pure overhead (a 1M-key default for a 52-key dim ships a
    * ~1.2 MB literal in every task binary — measured before this doc
    * existed).
    *
    * Know what the engine already does: Spark's own
    * `runtime.bloomFilter` rewrite injects this same filter into
    * shuffle-join plans it recognizes (the posture artifact's
    * `join_reduction` section measures all three: naive, engine,
    * explicit). The explicit form earns its keep where the rewrite
    * can't reach — a REUSED sketch across many queries (build once at
    * dim-publish time), pre-filtering before a non-join consumer, or
    * plan shapes/confs the injection declines.
    */
  def bloomKeyFilter(fact: DataFrame, dim: DataFrame, key: String,
      expectedDimKeys: Long = 10000L): DataFrame = {
    require(!fact.isStreaming && !dim.isStreaming,
      "bloomKeyFilter collects the dim-side sketch eagerly and is " +
        "batch-only; on a stream, build the sketch per batch or at " +
        "plan-freeze time")
    val dt = dim.schema(key).dataType
    require(Seq("byte", "short", "integer", "long").contains(dt.typeName),
      s"bloomKeyFilter: key $key must be integral, got $dt")
    graft.plans.GraftFunctions.register(fact.sparkSession)
    val sketch = dim
      .select(col(key).cast("long").as("__k")).filter(col("__k").isNotNull)
      .agg(call_function(graft.plans.GraftFunctions.BloomAggName,
        col("__k"), lit(expectedDimKeys)).as("__b"))
      .collect().head.getAs[Array[Byte]](0)
    if (sketch == null) fact.filter(lit(false)) // empty dim: nothing joins
    else fact.filter(call_function(
      graft.plans.GraftFunctions.BloomMightContainName,
      lit(sketch), col(key).cast("long")))
  }

  /** Inner equi-join with the fact side pre-reduced by [[bloomKeyFilter]]
    * — result identical to `fact.join(dim, key)`, shuffle input smaller
    * by the join's selectivity.
    */
  def bloomReducedJoin(fact: DataFrame, dim: DataFrame, key: String,
      expectedDimKeys: Long = 10000L): DataFrame =
    bloomKeyFilter(fact, dim, key, expectedDimKeys).join(dim, Seq(key))
}

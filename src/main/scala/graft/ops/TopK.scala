package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k as a typed custom [[Aggregator]] (SURVEY §2.10's
  * reserved custom-aggregate slot).
  *
  * Why custom: built-ins give top-1 per group (`max_by`) or whole-group
  * sorts (`row_number` window → sorts every row of every partition).
  * This Aggregator keeps a bounded k-element buffer per group, merges
  * map-side (partial aggregation works — each partition contributes at
  * most k candidates to the shuffle), so per-group top-k costs O(n·log k)
  * with k-bounded shuffle volume instead of a full sort — the difference
  * that matters when a group holds billions of rows.
  *
  * Ordering: value DESC, id ASC (unique id → fully deterministic).
  */
class TopKByValue(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by { case (v, id) => (-v, id) }

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(buf: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    ((a +: buf).sorted(ord)).take(k)

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (x ++ y).sorted(ord).take(k)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopK {

  /** DataFrame-facing column for the aggregator. */
  def topKColumn(k: Int, valueCol: String, idCol: String): Column = {
    val fn = udaf(new TopKByValue(k))
    fn(col(valueCol), col(idCol))
  }

  /** Per-group top-k rows flattened with a 1-based rank — equivalent to
    * `row_number() OVER (PARTITION BY key ORDER BY value DESC, id) <= k`
    * but without sorting whole groups.
    */
  def perGroup(df: DataFrame, key: String, valueCol: String, idCol: String,
      k: Int): DataFrame =
    df.groupBy(col(key))
      .agg(topKColumn(k, valueCol, idCol).as("__topk"))
      .select(col(key), posexplode(col("__topk")).as(Seq("__pos", "__item")))
      .select(
        col(key),
        (col("__pos") + 1).cast("long").as("rank"),
        col("__item._1").as(valueCol),
        col("__item._2").as(idCol))
}

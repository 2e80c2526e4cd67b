package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator over (score, id) pairs: keeps the k largest
  * by (score desc, id asc) — the deterministic tie-break makes results
  * reproducible across partitionings.
  *
  * Why this beats a window for top-k at scale: `row_number().over(
  * partitionBy(q).orderBy(score))` shuffles EVERY scored row to the
  * query's reducer and sorts there. An Aggregator participates in
  * partial aggregation: each map task reduces its rows to a k-element
  * buffer first, so the shuffle moves at most k rows per (query,
  * partition) — for 1e9 scored pairs and k=10, that's the difference
  * between shuffling 1e9 rows and ~10·partitions rows.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)],
      Seq[(Double, Long)]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)](p => (-p._1, p._2))

  override def zero: Seq[(Double, Long)] = Vector.empty

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sorted(ord).take(k)

  override def reduce(b: Seq[(Double, Long)], a: (Double, Long))
  : Seq[(Double, Long)] =
    if (b.length < k || ord.lt(a, b.last)) trim(b :+ a) else b

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)])
  : Seq[(Double, Long)] = trim(x ++ y)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] =
    r.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder()
}

object TopKAggregator {
  def apply(k: Int): TopKAggregator = new TopKAggregator(k)
}

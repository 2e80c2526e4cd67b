package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary: at most `k` counters over an
  * unbounded key stream, with the two guarantees every consumer of an
  * approximate top-k relies on —
  *   1. COMPLETENESS: every key with true frequency > n/k is in the
  *      final summary (a key can only be evicted n/k times);
  *   2. BOUNDED UNDERCOUNT: each reported estimate e satisfies
  *      true − n/k ≤ e ≤ true (decrements only ever subtract).
  *
  * The merge is the mergeable-summaries form (Agarwal et al., PODS'12):
  * sum the two counter sets, and if more than `k` keys survive,
  * subtract the (k+1)-th largest count from every counter and drop the
  * non-positives — the result is again a valid MG summary of the
  * concatenated streams, which is exactly what Spark's partial
  * aggregation needs: each map task summarizes its partition to ≤ k
  * counters, and the shuffle moves k rows per partition instead of the
  * stream. The count-min sketch (`sketch_cms_check`) answers "how
  * often did THIS key occur"; Misra–Gries answers the converse "WHICH
  * keys dominate" without holding the key universe.
  *
  * Which keys beyond the guaranteed heavy hitters survive — and their
  * exact estimates — depends on merge order, so results are NOT
  * hash-stable across partitionings; callers gate the INVARIANTS
  * (completeness, undercount bound, size ≤ k), the same contract the
  * other approximate operators register.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"k must be positive: $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], key: String)
  : Map[String, Long] =
    b.get(key) match {
      case Some(c) => b.updated(key, c + 1L)
      case None if b.size < k => b.updated(key, 1L)
      // full and key absent: the classic all-decrement step — the
      // arriving key and one unit of every counter annihilate
      case None => b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    }

  override def merge(x: Map[String, Long], y: Map[String, Long])
  : Map[String, Long] = {
    val sum = y.foldLeft(x) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val cut = sum.values.toIndexedSeq
        .sorted(Ordering[Long].reverse)(k) // (k+1)-th largest
      sum.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder()
}

object MisraGriesAggregator {
  def apply(k: Int): MisraGriesAggregator = new MisraGriesAggregator(k)
}

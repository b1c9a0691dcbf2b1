package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded k-minima typed aggregator over (already-distinct) hash
  * values, carrying the exact input count alongside: the buffer is
  * `(count, ascending k-bounded list)`, so ONE aggregate yields
  * `(n_exact, n_mins, kth_hash)` — everything a per-group KMV sketch
  * row needs.
  *
  * The scalable alternative to `row_number().over(Window.partitionBy
  * (g).orderBy(h))` for per-group minima: the window form sorts and
  * ships EVERY distinct hash of a group to one task; this aggregator
  * folds map-side (partial aggregation) so at most k hashes per group
  * cross the final exchange. One hot source at 100 TB concentrates k
  * longs, not its whole distinct-hash set.
  *
  * Inputs must be distinct within each group (the KMV contract — the
  * caller's `(group, hash)` distinct guarantees it): the count is then
  * the group's exact distinct cardinality and the minima are over the
  * distinct hash set.
  */
class KMinAggregator(k: Int)
    extends Aggregator[Long, (Long, List[Long]), (Long, Long, Long)] {

  private def insert(mins: List[Long], h: Long): List[Long] =
    if (mins.length >= k && h >= mins.last) mins
    else {
      val (pre, post) = mins.span(_ < h)
      val merged = pre ::: (h :: post)
      if (merged.length > k) merged.take(k) else merged
    }

  override def zero: (Long, List[Long]) = (0L, Nil)

  override def reduce(b: (Long, List[Long]), h: Long): (Long, List[Long]) =
    (b._1 + 1L, insert(b._2, h))

  override def merge(a: (Long, List[Long]), b: (Long, List[Long])): (Long, List[Long]) =
    (a._1 + b._1, b._2.foldLeft(a._2)(insert))

  override def finish(b: (Long, List[Long])): (Long, Long, Long) =
    (b._1, b._2.length.toLong, b._2.lastOption.getOrElse(0L))

  override def bufferEncoder: Encoder[(Long, List[Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, List[Long])]()

  override def outputEncoder: Encoder[(Long, Long, Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long, Long)]()
}

/** [[KMinAggregator]] finishing with the k-minima SET itself (ascending)
  * instead of its summary — the mergeable-sketch row that set-operation
  * estimators (KMV union/Jaccard, Beyer et al. 2007) consume. Same
  * bounded buffer, same map-side partial fold: at most k hashes per
  * group cross the exchange however hot the group.
  */
class KMinSetAggregator(k: Int)
    extends Aggregator[Long, (Long, List[Long]), (Long, Seq[Long])] {

  private val inner = new KMinAggregator(k)

  override def zero: (Long, List[Long]) = inner.zero
  override def reduce(b: (Long, List[Long]), h: Long): (Long, List[Long]) = inner.reduce(b, h)
  override def merge(a: (Long, List[Long]), b: (Long, List[Long])): (Long, List[Long]) =
    inner.merge(a, b)

  override def finish(b: (Long, List[Long])): (Long, Seq[Long]) = (b._1, b._2)

  override def bufferEncoder: Encoder[(Long, List[Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, List[Long])]()

  override def outputEncoder: Encoder[(Long, Seq[Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Seq[Long])]()
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed aggregator over (id, score) pairs.
  *
  * The scalable alternative to `row_number().over(Window.partitionBy(q))`
  * for per-group top-k: the window form sorts EVERY candidate row within
  * each partition; this aggregator keeps a k-bounded buffer, combines
  * map-side (partial aggregation), and ships at most k rows per group
  * across the shuffle. At 100 TB candidate volume that's the difference
  * between shuffling the corpus and shuffling k·|queries| rows.
  *
  * Ordering is total and deterministic: higher score first, lower id on
  * ties.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), List[(Long, Double)], Seq[(Long, Double)]] {

  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def insert(buf: List[(Long, Double)], x: (Long, Double)): List[(Long, Double)] = {
    val (pre, post) = buf.span(better(_, x))
    val merged = pre ::: (x :: post)
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[(Long, Double)] = Nil

  override def reduce(buf: List[(Long, Double)], x: (Long, Double)): List[(Long, Double)] =
    insert(buf, x)

  override def merge(a: List[(Long, Double)], b: List[(Long, Double)]): List[(Long, Double)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(Long, Double)]): Seq[(Long, Double)] = buf

  override def bufferEncoder: Encoder[List[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Double)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}

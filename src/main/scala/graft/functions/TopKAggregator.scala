package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed aggregator (UDAF): keeps the k best
  * (sortValue, tieBreak) pairs per group — descending by value, ties to the
  * SMALLEST tieBreak (matching `ORDER BY v DESC, id ASC` ranking).
  *
  * This is the scale-correct alternative to
  * `row_number().over(Window.partitionBy(key).orderBy(...)) <= k`:
  * the window form sorts EVERY group member after the exchange; this
  * aggregator is algebraic — partial buffers of ≤k rows combine map-side,
  * so the shuffle carries at most k rows per (key, partition) instead of
  * the whole group, and no sort ever materializes. At 100 TB with hot keys
  * that is the difference between a bounded-memory partial agg and a
  * full-group sort spill.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: List[(Double, Long)] = Nil

  /** true if a ranks strictly ahead of b. */
  private def ahead(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] = {
    // rank order, bounded length k; lists of ≤k elements keep this O(k)
    val (hi, lo) = buf.span(y => ahead(y, x))
    val merged = hi ::: x :: lo
    if (merged.lengthCompare(k) > 0) merged.take(k) else merged
  }

  override def reduce(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    if (buf.lengthCompare(k) >= 0 && ahead(buf.last, x)) buf // below current floor
    else insert(buf, x)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(reduce)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

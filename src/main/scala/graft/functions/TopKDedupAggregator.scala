package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** `TopKAggregator` with tieBreak DEDUP: keeps the k best
  * (sortValue, tieBreak) pairs per group — descending by value, ties to
  * the SMALLEST tieBreak — counting each distinct tieBreak once.
  *
  * Contract: sortValue must be a FUNCTION of tieBreak within a group
  * (duplicate inputs are exact duplicates) — true for the beam-search
  * pools this exists for, where `cos(q, nid)` is deterministic per
  * (q_id, nid) and a node can enter the pool many times (beam carry +
  * multi-path expansion). This makes
  * `pool.distinct → row_number().over(q window) <= k` collapsible to
  * ONE map-side-combinable aggregation: the exchange carries ≤k-row
  * partial buffers instead of the whole deduplicated pool, and both the
  * distinct's exchange and the window's sort disappear.
  */
class TopKDedupAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: List[(Double, Long)] = Nil

  /** true if a ranks strictly ahead of b. */
  private def ahead(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] = {
    val (hi, lo) = buf.span(y => ahead(y, x))
    val merged = hi ::: x :: lo
    if (merged.lengthCompare(k) > 0) merged.take(k) else merged
  }

  override def reduce(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    if (buf.exists(_._2 == x._2)) buf // duplicate tieBreak: already ranked
    else if (buf.lengthCompare(k) >= 0 && ahead(buf.last, x)) buf
    else insert(buf, x)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(reduce)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

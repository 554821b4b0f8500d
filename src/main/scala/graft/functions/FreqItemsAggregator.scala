package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch as a typed aggregator (UDAF): one pass
  * over a token stream with a HARD bound of `k` counters per buffer, whose
  * output is a candidate set guaranteed to contain every item with true
  * frequency > N/(k+1) (Misra & Gries 1982; merge step per Agarwal et al.,
  * "Mergeable Summaries", PODS'12: summed buffers re-bounded by subtracting
  * the (k+1)-th largest count keep the summed error bound, so partial
  * buffers combine map-side like any algebraic aggregate).
  *
  * This is the scale-correct candidate generator for corpus-wide frequent
  * tokens: the exact `groupBy(token)` alternative shuffles one row per
  * distinct token (vocabulary-sized exchange — billions of keys at 100 TB),
  * while this sketch ships ≤k counters per partition to a single bounded
  * merge, after which an exact recount restricted to the ≤k candidates is a
  * broadcast-filtered second agg. Estimated counts UNDERCOUNT by at most
  * N/(k+1) and the surviving-item SET is deterministic (partition-order
  * independent) whenever the downstream threshold exceeds N/(k+1) — which
  * `TextOps.frequentTokens` enforces — even though per-candidate estimates
  * themselves are order-dependent.
  */
class FreqItemsAggregator(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"FreqItemsAggregator needs k >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1L)
      case None if b.size < k => b.updated(x, 1L)
      // full and x absent: the classic decrement-all step (x's implicit
      // count of 1 is consumed by the same decrement)
      case None => b.collect { case (t, c) if c > 1L => t -> (c - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest count from everything, drop <= 0 —
      // at most k counters survive and the MG error bound still holds
      val d = summed.valuesIterator.toArray.sortBy(-_).apply(k)
      summed.collect { case (t, c) if c > d => t -> (c - d) }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
}

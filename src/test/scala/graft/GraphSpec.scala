package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.ops.Graph

/** PageRank over pair graphs: fixed-point sanity, the hub-vs-chain
  * centrality signal (what component sizes can't see), conservation, and
  * partitioning invariance (the 6dp per-iteration rounding absorbs
  * aggregation-order ulps).
  */
class GraphSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private def pairsDf(rows: Seq[(Long, Long)]) = rows.toDF("doc_a", "doc_b")

  it("a symmetric 2-node graph stays at the uniform fixed point") {
    val r = Graph.pageRank(pairsDf(Seq(1L -> 2L))).collect()
      .map(x => x.getLong(0) -> x.getAs[Double]("rank")).toMap
    r(1L) shouldBe 0.5 +- 1e-9
    r(2L) shouldBe 0.5 +- 1e-9
  }

  it("a star hub outranks every node of an equal-size chain (centrality vs component size)") {
    // two 4-node components of identical size: star {10-(11,12,13)} and
    // chain {20-21-22-23}; component stats are identical, ranks are not.
    val pairs = pairsDf(Seq(
      10L -> 11L, 10L -> 12L, 10L -> 13L,
      20L -> 21L, 21L -> 22L, 22L -> 23L))
    val r = Graph.pageRank(pairs).collect()
      .map(x => x.getLong(0) -> x.getAs[Double]("rank")).toMap
    val starHub = r(10L)
    val chainMax = Seq(20L, 21L, 22L, 23L).map(r).max
    starHub should be > chainMax
    r.values.max shouldBe starHub
  }

  it("total rank is conserved up to rounding") {
    val pairs = pairsDf(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 1L -> 3L))
    val total = Graph.pageRank(pairs).collect().map(_.getAs[Double]("rank")).sum
    total shouldBe 1.0 +- 1e-3
  }

  it("is invariant to input partitioning") {
    val pairs = (1L to 40L).flatMap(i => Seq(i -> (i % 7 + 100L), i -> (i % 5 + 200L)))
    val a = Graph.pageRank(pairsDf(pairs)).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    val b = Graph.pageRank(pairsDf(pairs).repartition(11)).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    a shouldBe b
  }
}

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

  describe("triangleStats") {
    def stats(rows: Seq[(Long, Long)]) =
      Graph.triangleStats(pairsDf(rows)).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

    it("a star has zero triangles and hub coefficient 0 (template hub shape)") {
      val r = stats(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L))
      r(1L) shouldBe ((3L, 0L, 0.0))
      r(2L) shouldBe ((1L, 0L, 0.0)) // deg 1: coefficient defined as 0
    }

    it("a 3-clique is one triangle with coefficient 1 everywhere (duplicate clique shape)") {
      val r = stats(Seq(1L -> 2L, 1L -> 3L, 2L -> 3L))
      Seq(1L, 2L, 3L).foreach(n => r(n) shouldBe ((2L, 1L, 1.0)))
    }

    it("two triangles sharing an edge count each corner once per triangle") {
      // 1-2-3 and 2-3-4: shared edge 2-3 → nodes 2,3 sit in both triangles
      val r = stats(Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L, 3L -> 4L))
      r(1L) shouldBe ((2L, 1L, 1.0))
      r(4L) shouldBe ((2L, 1L, 1.0))
      r(2L) shouldBe ((3L, 2L, round6(2.0 * 2 / (3 * 2))))
      r(3L)._2 shouldBe 2L
    }

    it("a 4-clique has C(3,2)=3 triangles per node, coefficient 1") {
      val n = Seq(1L, 2L, 3L, 4L)
      val edges = for (a <- n; b <- n if a < b) yield a -> b
      val r = stats(edges)
      n.foreach(x => r(x) shouldBe ((3L, 3L, 1.0)))
    }

    it("matches the orientation-free count and survives repartitioning") {
      // pseudo-random graph on 30 nodes, deterministic edge rule
      val edges = (for (a <- 1L to 30L; b <- 1L to 30L
        if a < b && (a * 7 + b * 13) % 5 == 0) yield a -> b).toSeq
      val df = pairsDf(edges)
      val a = Graph.triangleStats(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val b = Graph.triangleStats(df.repartition(13)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      a shouldBe b
      // orientation-free reference: count closed wedges directly
      val es = edges.toSet
      def adj(x: Long) = edges.collect {
        case (a2, b2) if a2 == x => b2; case (a2, b2) if b2 == x => a2 }
      val expect = (1L to 30L).map { x =>
        val nb = adj(x)
        x -> nb.combinations(2).count {
          case Seq(p, q) => es.contains((p min q, p max q)) }
      }.toMap
      a.foreach { case (node, _, nTri, _) => nTri shouldBe expect(node).toLong }
    }
  }

  describe("pageRankWeighted") {
    it("equal weights reduce to plain PageRank; mass shifts rank") {
      import spark.implicits._
      val sym = Seq((1L, 2L), (2L, 3L), (1L, 3L))
      val eq = sym.map { case (a, b) => (a, b, 0.5) }.toDF("doc_a", "doc_b", "weight")
      val w = Graph.pageRankWeighted(eq).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val u = Graph.pageRank(sym.toDF("doc_a", "doc_b")).collect()
        .map(r => r.getLong(0) -> r.getAs[Double]("rank")).toMap
      w.keySet.foreach(k => w(k) shouldBe u(k) +- 1e-9)

      // skew mass toward node 9: its rank must exceed the uniform case
      val skew = Seq((1L, 2L, 0.1), (1L, 9L, 0.9), (2L, 9L, 0.9))
        .toDF("doc_a", "doc_b", "weight")
      val s = Graph.pageRankWeighted(skew).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      s(9L) should be > s(1L)
      s(9L) should be > s(2L)
    }
  }

  describe("modularityReport") {
    it("matches the hand-computed contributions for two separated triangles") {
      import spark.implicits._
      // two isolated triangles, all weight 1.0 (an isolated PAIR would
      // 2-cycle under synchronous LPA; triangles converge): 2m = 12e6,
      // q = 6/12 − (6/12)² = 0.25 each
      val pairs = Seq((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0),
        (7L, 8L, 1.0), (7L, 9L, 1.0), (8L, 9L, 1.0))
        .toDF("doc_a", "doc_b", "weight")
      val got = Graph.modularityReport(pairs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))).toMap
      got.keySet shouldBe Set(1L, 7L)
      got(1L) shouldBe ((3L, 6000000L, 6000000L, 0.25))
      got(7L) shouldBe ((3L, 6000000L, 6000000L, 0.25))
    }
  }

  describe("labelPropagation") {
    it("separates two cliques welded by a bridge (hand-simulated 3 rounds)") {
      // cliques {1,2,3} and {10,11,12}, bridge 3-10: a single connected
      // component, but LPA converges to communities 1 and 3 — replayed by
      // hand: round 1 {1→2,2→1,3→1,10→3,11→10,12→10}, round 2
      // {1→1,2→1,3→1,10→10,11→3,12→3}, round 3 {…,10→3,11→3,12→3}.
      val pairs = pairsDf(Seq(1L -> 2L, 1L -> 3L, 2L -> 3L,
        10L -> 11L, 10L -> 12L, 11L -> 12L, 3L -> 10L))
      val got = Graph.labelPropagation(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
        10L -> 3L, 11L -> 3L, 12L -> 3L)
    }

    it("weighted variant: similarity mass outvotes edge count") {
      // node 1: two light edges to {2, 3} (label mass 2×0.1 after round 1:
      // both relabel toward their own neighborhoods) vs one heavy edge to
      // node 9 (0.9). Unweighted LPA sides with the pair; weighted sides
      // with the heavy edge.
      import spark.implicits._
      val pairs = Seq((1L, 2L, 0.1), (1L, 3L, 0.1), (1L, 9L, 0.9),
        (2L, 3L, 0.1)).toDF("doc_a", "doc_b", "weight")
      val weighted = Graph.labelPropagationWeighted(pairs, iters = 1).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val unweighted = Graph.labelPropagation(
        pairs.drop("weight"), iters = 1).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // round 1 for node 1: labels {2:0.1, 3:0.1, 9:0.9} weighted → 9;
      // counts {2:1, 3:1, 9:1} tie → min label 2
      weighted(1L) shouldBe 9L
      unweighted(1L) shouldBe 2L
    }

    it("is partitioning-invariant (integer counts + min-label tie-break)") {
      val edges = (for (a <- 1L to 24L; b <- 1L to 24L
        if a < b && (a * 11 + b * 17) % 7 == 0) yield a -> b).toSeq
      val df = pairsDf(edges)
      val a = Graph.labelPropagation(df).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = Graph.labelPropagation(df.repartition(13)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      a shouldBe b
    }
  }

  private def round6(x: Double): Double = math.rint(x * 1e6) / 1e6

  describe("kCore") {
    it("keeps the dense core, peels chains and star leaves entirely") {
      // clique {1,2,3,4} (everyone has 3 in-core neighbors), a chain
      // 4-5-6-7 hanging off it, and a star 10-{11,12,13}: at k=2 the
      // clique survives with core_deg 3, the chain peels back from its
      // tip (5 loses its only alive neighbor once 6,7 die), the star
      // dies wholesale (leaves have degree 1, then the hub is alone)
      val pairs = pairsDf(Seq(
        1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L,
        4L -> 5L, 5L -> 6L, 6L -> 7L,
        10L -> 11L, 10L -> 12L, 10L -> 13L))
      val core = Graph.kCore(pairs, k = 2).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      core.keySet shouldBe Set(1L, 2L, 3L, 4L)
      core.values.toSet shouldBe Set(3L)
    }

    it("converges exactly on a fixpoint (extra budget changes nothing)") {
      val pairs = pairsDf(Seq(
        1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L,
        6L -> 7L, 7L -> 8L, 8L -> 9L))
      def run(maxRounds: Int) = Graph.kCore(pairs, k = 2, maxRounds = maxRounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      run(Graph.KCoreMaxRounds) shouldBe run(Graph.KCoreMaxRounds + 5)
      run(Graph.KCoreMaxRounds) shouldBe Set((1L, 2L), (2L, 2L), (3L, 2L))
    }

    it("peels a chain DEEPER than the old fixed 6-round bound to the true (empty) core") {
      // an 18-node chain at k=2 peels two endpoints per round → 9 peel
      // rounds + 1 confirming round; the retired fixed-6-round variant
      // silently returned the 6-round superset here
      val chain = pairsDf((1L to 17L).map(i => i -> (i + 1)))
      Graph.kCore(chain, k = 2).count() shouldBe 0L
    }

    it("throws on the backstop instead of returning an unconverged superset") {
      val chain = pairsDf((1L to 17L).map(i => i -> (i + 1)))
      val e = intercept[IllegalArgumentException] {
        Graph.kCore(chain, k = 2, maxRounds = 3).count()
      }
      e.getMessage should include("no fixpoint")
    }
  }
}

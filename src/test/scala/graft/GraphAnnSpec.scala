package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/** The navigable-graph ANN tier's contracts: bounded degree, symmetric
  * edges, and the beam-search dominance guarantee — the final top-k can
  * only IMPROVE on its IVF-nprobe=1 seeds (pool_r ⊇ beam_{r-1}), which is
  * the whole reason to pay for the traversal: it recovers cross-boundary
  * neighbors single-probe IVF systematically misses.
  */
class GraphAnnSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def embDf(rows: Seq[(Long, Seq[Float], Int)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  // angular chain on the unit circle: query (id 0) heads cluster 0; a
  // bridge chain (ids 4, 5 — labeled 1) walks toward cluster 1 so the
  // query's TRUE top-6 straddles the 0/1 Voronoi edge. Cell assignment
  // splits the bridge (4 lands in cell 0, 5 in cell 1), so IVF-nprobe=1
  // provably misses the far half — the failure shape the graph traversal
  // exists to fix, reachable only by walking edge 4→5→6.
  private def vec(theta: Double): Seq[Float] =
    Seq(math.cos(theta).toFloat, math.sin(theta).toFloat)
  private val corpus: Seq[(Long, Seq[Float], Int)] =
    // cluster 0: θ = 0, 0.05, 0.10, 0.15 (query = id 0)
    (0 until 4).map(i => (i.toLong, vec(0.05 * i), 0)) ++
      // bridge chain toward cluster 1
      Seq((4L, vec(0.25), 1), (5L, vec(0.35), 1)) ++
      // cluster 1: θ = 0.45 .. 0.80
      (6 until 14).map(i => (i.toLong, vec(0.45 + 0.05 * (i - 6)), 1)) ++
      // far cluster 2 around 2.5 rad
      (14 until 22).map(i => (i.toLong, vec(2.5 + 0.02 * (i - 14)), 2))

  describe("graphEdges") {
    it("is symmetric with out-degree bounded by 2x the degree knob") {
      val edges = VectorOps.graphEdges(embDf(corpus), degree = 3)
      val es = edges.select("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      es.foreach { case (s, d) => es should contain((d, s)) }
      val maxDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .agg(max(col("d"))).head().getLong(0)
      maxDeg should be <= 6L
      // and degree stats agree with the edge table
      val stats = VectorOps.graphDegreeStats(embDf(corpus), degree = 3).head()
      stats.getLong(1) shouldBe es.size.toLong
      stats.getLong(4) shouldBe maxDeg
    }

    it("probe-2 postings create cross-boundary edges (some edge spans labels)") {
      val byLabel = corpus.map(r => r._1 -> r._3).toMap
      val edges = VectorOps.graphEdges(embDf(corpus), degree = 3)
        .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
      edges.exists { case (s, d) => byLabel(s) != byLabel(d) } shouldBe true
    }
  }

  describe("graphTopK") {
    it("dominates its IVF-nprobe=1 seeds rank-for-rank and recovers cross-boundary neighbors") {
      val emb = embDf(corpus)
      val k = 6
      val graph = VectorOps.graphTopK(emb, k = k, beam = 8, rounds = 3, degree = 3)
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1)
      val ivf = VectorOps.ivfTopK(emb, k = k, nprobe = 1)
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1)
      // rank-for-rank: the traversal's i-th cosine never drops below the
      // seed ranking's i-th cosine (monotone pool growth)
      graph.zip(ivf).foreach { case ((_, _, gc), (_, _, ic)) =>
        gc should be >= ic
      }
      // and it matches the brute-force truth on this corpus: the beam
      // walked across the Voronoi edge to the boundary/cluster-1 points
      val truth = VectorOps.bruteForceTopK(emb, k = k)
        .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
      graph.map(g => (g._1, g._2)).toSeq shouldBe truth.toSeq
      // while nprobe=1 IVF provably missed at least one of them
      ivf.map(_._2).toSet should not be truth.map(_._2).toSet
    }

    it("is deterministic (two runs, identical rows)") {
      val emb = embDf(corpus)
      val a = VectorOps.graphTopK(emb, k = 5, beam = 8, degree = 3)
        .collect().map(_.toString).sorted
      val b = VectorOps.graphTopK(emb, k = 5, beam = 8, degree = 3)
        .collect().map(_.toString).sorted
      a.toSeq shouldBe b.toSeq
    }
  }

  describe("graph2TopK (hierarchical HNSW entry)") {
    it("at equal layer-0 beam: rank-for-rank cosine dominance over the flat traversal and recall >= flat") {
      val emb = embDf(corpus)
      val k = 6
      // every=2 gives a DENSE upper layer on this 22-node corpus — the
      // comparison is not vacuous
      emb.filter(VectorOps.layer1Member(2)).count() should be > 2L
      val flat = VectorOps.graphTopK(emb, k = k, beam = 8, rounds = 3, degree = 3)
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
      val hier = VectorOps.graph2TopK(emb, k = k, beam = 8, rounds = 3, degree = 3,
          every = 2)
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
      // the hierarchical seed pool is a superset of the flat one; on THIS
      // fixed geometry the final ranking improves score-wise at every
      // rank (not a general theorem — beam pruning is non-monotone in the
      // seed set, so this is a pinned outcome of the planted corpus)
      hier.zip(flat).foreach { case ((_, _, hc), (_, _, fc)) =>
        hc should be >= fc
      }
      // recall vs brute truth: hierarchical >= flat
      val truth = VectorOps.bruteForceTopK(emb, k = k)
        .collect().map(r => r.getLong(2)).toSet
      val hHits = hier.map(_._2).count(truth)
      val fHits = flat.map(_._2).count(truth)
      hHits should be >= fHits
      hHits shouldBe k // and on this geometry the traversal is exact
    }

    it("under a starved round budget the upper-layer entry strictly beats the flat traversal") {
      // rounds=1 starves the flat walk: its seeds sit in the query's cell
      // and one expansion cannot reach the far half of the true top-k
      // across the Voronoi edge. The dense upper layer's long-range hops
      // get there within its own walk, and its beam seeds layer 0 past
      // the boundary — the exact seed-sensitivity HNSW's hierarchy cuts.
      val emb = embDf(corpus)
      val k = 6
      val truth = VectorOps.bruteForceTopK(emb, k = k)
        .collect().map(r => r.getLong(2)).toSet
      // every=3 samples members on BOTH sides of the boundary including
      // the query's own cell (every=2 happens to sample none there — the
      // upper walk needs an in-cell entry member)
      val flat = VectorOps.graphTopK(emb, k = k, beam = 8, rounds = 1, degree = 3)
        .collect().map(r => r.getLong(2))
      val hier = VectorOps.graph2TopK(emb, k = k, beam = 8, rounds = 1, degree = 3,
          every = 3)
        .collect().map(r => r.getLong(2))
      val (fHits, hHits) = (flat.count(truth), hier.count(truth))
      hHits should be > fHits
    }

    it("is deterministic and its layer-1 graph only contains sampled members") {
      val emb = embDf(corpus)
      val members = emb.filter(VectorOps.layer1Member(2))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val e1 = VectorOps.graph2Layer1Edges(emb, degree = 3, every = 2)
        .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
      e1 should not be empty
      e1.foreach { case (s, d) =>
        members should contain(s)
        members should contain(d)
      }
      val a = VectorOps.graph2TopK(emb, k = 5, beam = 8, degree = 3, every = 2)
        .collect().map(_.toString).sorted
      val b = VectorOps.graph2TopK(emb, k = 5, beam = 8, degree = 3, every = 2)
        .collect().map(_.toString).sorted
      a.toSeq shouldBe b.toSeq
    }

    it("layer-1 degree stats are bounded like the flat graph's") {
      val emb = embDf(corpus)
      val stats = VectorOps.graphDegreeStatsFrom(
        VectorOps.graph2Layer1Edges(emb, degree = 3, every = 2)).head()
      val members = emb.filter(VectorOps.layer1Member(2)).count()
      stats.getLong(0) should be <= members // n_nodes
      stats.getLong(4) should be <= 6L // max_degree <= 2x degree knob
    }
  }

  describe("graphTopKFiltered (predicate-constrained traversal)") {
    // filter = even vec_id: along the angular chain every second node is
    // non-passing, so reaching the far passing neighbors REQUIRES
    // stepping through non-passing stepping stones — the exact
    // connectivity problem the 2-hop (ACORN-style) expansion solves and
    // a beam restricted to passing nodes' own edges cannot.
    val pred = col("vec_id") % 2 === 0

    it("returns only passing neighbors and matches the filtered brute-force truth at hops=2") {
      val emb = embDf(corpus)
      val k = 6
      val got = VectorOps.graphTopKFiltered(emb, pred, k = k, beam = 8,
          rounds = 3, degree = 3)
        .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
      got.foreach { case (_, id) => id % 2 shouldBe 0L }
      val truth = VectorOps.bruteForceTopK(emb, k = k, corpusPred = Some(pred))
        .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
      got.toSeq shouldBe truth.toSeq
    }

    it("hops=1 (beam-only expansion) provably strands on non-passing stepping stones") {
      val emb = embDf(corpus)
      val k = 6
      val hop2 = VectorOps.graphTopKFiltered(emb, pred, k = k, beam = 8,
          rounds = 3, degree = 3, hops = 2)
        .collect().map(r => r.getLong(2)).toSet
      val hop1 = VectorOps.graphTopKFiltered(emb, pred, k = k, beam = 8,
          rounds = 3, degree = 3, hops = 1)
        .collect().map(r => r.getLong(2)).toSet
      // the 1-hop walk reaches strictly fewer passing nodes: its every
      // frontier edge lands on an odd (non-passing) node that never
      // enters the beam, so the passing region past it stays unreachable
      hop1.subsetOf(hop2) shouldBe true
      hop1.size should be < hop2.size
    }

    it("the filtered recall report reads 1.0 at hops=2 and below it at hops=1") {
      val emb = embDf(corpus)
      val k = 6
      def recallOf(hops: Int): Double =
        VectorOps.graphFilteredRecallReport(emb,
            VectorOps.graphTopKFiltered(emb, pred, k = k, beam = 8,
              rounds = 3, degree = 3, hops = hops), pred, k = k)
          .collect().map(r => r.getDouble(2)).head
      recallOf(2) shouldBe 1.0
      recallOf(1) should be < 1.0
    }
  }

  describe("graph2TopKFiltered (hierarchical entry composed with the filtered walk)") {
    // same stranding geometry as the flat filtered block: even vec_ids
    // pass, so the angular chain alternates passing / stepping-stone
    val pred = col("vec_id") % 2 === 0

    it("returns only passing neighbors and matches the filtered brute truth at hops=2") {
      val emb = embDf(corpus)
      val k = 6
      val got = VectorOps.graph2TopKFiltered(emb, pred, k = k, beam = 8,
          rounds = 3, degree = 3, every = 2)
        .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
      got.foreach { case (_, id) => id % 2 shouldBe 0L }
      val truth = VectorOps.bruteForceTopK(emb, k = k, corpusPred = Some(pred))
        .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
      got.toSeq shouldBe truth.toSeq
      // and the composed recall report confirms it
      VectorOps.graphFilteredRecallReport(emb,
          VectorOps.graph2TopKFiltered(emb, pred, k = k, beam = 8,
            rounds = 3, degree = 3, every = 2), pred, k = k)
        .collect().map(r => r.getDouble(2)).head shouldBe 1.0
    }

    it("under a starved round budget the upper-layer entry strictly beats the flat filtered walk") {
      // rounds=1 starves the flat filtered walk exactly as in the
      // unfiltered contrast: its passing seeds sit in the query's cell
      // and one 2-hop round cannot cross to the far passing half. The
      // upper layer routes there unfiltered and the bridge-crossing
      // entry expansion lands passing seeds past the boundary.
      val emb = embDf(corpus)
      val k = 6
      val truth = VectorOps.bruteForceTopK(emb, k = k, corpusPred = Some(pred))
        .collect().map(r => r.getLong(2)).toSet
      val flat = VectorOps.graphTopKFiltered(emb, pred, k = k, beam = 8,
          rounds = 1, degree = 3)
        .collect().map(r => r.getLong(2))
      val hier = VectorOps.graph2TopKFiltered(emb, pred, k = k, beam = 8,
          rounds = 1, degree = 3, every = 3)
        .collect().map(r => r.getLong(2))
      val (fHits, hHits) = (flat.count(truth), hier.count(truth))
      hHits should be > fHits
    }

    it("non-passing upper-beam nodes never leak into the result, only into the entry pool") {
      // every=2 samples odd (non-passing) nodes into layer 1; the walk
      // must still emit passing rows only, at every hops setting
      val emb = embDf(corpus)
      for (hops <- Seq(1, 2)) {
        VectorOps.graph2TopKFiltered(emb, pred, k = 6, beam = 8,
            rounds = 2, degree = 3, every = 2, hops = hops)
          .collect().foreach(r => r.getLong(2) % 2 shouldBe 0L)
      }
    }

    it("is deterministic (two runs, identical rows)") {
      val emb = embDf(corpus)
      val a = VectorOps.graph2TopKFiltered(emb, pred, k = 5, beam = 8,
          degree = 3, every = 2).collect().map(_.toString).sorted
      val b = VectorOps.graph2TopKFiltered(emb, pred, k = 5, beam = 8,
          degree = 3, every = 2).collect().map(_.toString).sorted
      a.toSeq shouldBe b.toSeq
    }
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/** Property-style trials for the FILTERED graph traversal on seeded
  * random corpora (the WindowPropertySpec convention: hand-rolled seeded
  * trials). Only theorem-grade invariants — the planted GraphAnnSpec
  * fixture pins the geometry-dependent outcomes (exact truth match,
  * hops-1 stranding); here we pin what must hold on ANY corpus:
  * predicate purity, cosine correctness, rank shape, dominance of the
  * exact filtered truth, and determinism.
  */
class GraphFilteredPropertySpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def randomCorpus(rng: scala.util.Random): Seq[(Long, Seq[Float], Int)] = {
    val n = 24 + rng.nextInt(30)
    (0 until n).map { i =>
      val label = rng.nextInt(3)
      // 2-D unit vectors clustered by label with per-point jitter: real
      // Voronoi structure, random every trial
      val theta = label * 2.0 + rng.nextDouble() * 0.8
      (i.toLong, Seq(math.cos(theta).toFloat, math.sin(theta).toFloat), label)
    }
  }

  describe("graphTopKFiltered on random corpora") {
    it("passes the predicate, scores exactly, never beats the filtered brute truth, and is deterministic") {
      val rng = new scala.util.Random(1123)
      for (_ <- 1 to 5) {
        import spark.implicits._
        val corpus = randomCorpus(rng)
        val byId = corpus.map(r => r._1 -> r._2).toMap
        val emb = corpus.toDF("vec_id", "embedding", "label")
        val pred = col("vec_id") % 2 === 0
        val k = 4
        val got = VectorOps.graphTopKFiltered(emb, pred, k = k, beam = 8,
            rounds = 3, degree = 3)
          .collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

        // 1. predicate purity + no self-results
        got.foreach { case (q, _, nid, _) =>
          nid % 2 shouldBe 0L
          nid should not be q
        }
        // 2. reported cosine == exact rounded cosine of the named pair
        got.foreach { case (q, _, nid, c) =>
          c shouldBe cosine(byId(q), byId(nid))
        }
        // 3. per-query rank shape: contiguous from 1, ordered by
        //    (cos desc, id asc)
        got.groupBy(_._1).foreach { case (_, rows) =>
          val sorted = rows.sortBy(_._2)
          sorted.map(_._2).toSeq shouldBe (1 to rows.length)
          sorted.sliding(2).foreach {
            case Array((_, _, idA, cA), (_, _, idB, cB)) =>
              assert(cA > cB || (cA == cB && idA < idB))
            case _ =>
          }
        }
        // 4. the approximate ranking never beats the exact filtered
        //    truth rank-for-rank (truth is the maximum over passing
        //    candidates, reachable or not)
        val truth = VectorOps.bruteForceTopK(emb, k = k, corpusPred = Some(pred))
          .collect()
          .map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(3))).toMap
        got.foreach { case (q, rank, _, c) =>
          truth.get((q, rank)).foreach(tc => c should be <= tc)
        }
        // 5. determinism
        val again = VectorOps.graphTopKFiltered(emb, pred, k = k, beam = 8,
            rounds = 3, degree = 3)
          .collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        again.sortBy(x => (x._1, x._2)).toSeq shouldBe got.sortBy(x => (x._1, x._2)).toSeq
      }
    }
  }
}

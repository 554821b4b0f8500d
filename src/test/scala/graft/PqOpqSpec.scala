package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/** OPQ-lite variance-balanced allocation: the permutation is a bijection,
  * it levels per-subspace energy on a skewed corpus where the natural
  * consecutive split hoards it, and PQ recall in allocated space beats
  * (or ties) the natural split on that corpus — the data-optimized
  * pretransform claim, demonstrated where it matters.
  */
class PqOpqSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private val dim = VectorOps.EmbeddingDim
  private val m = VectorOps.PqM
  private val subDim = VectorOps.PqSubDim

  // ANISOTROPIC corpus: the first 8 dims carry 10× the scale — exactly
  // PQ's natural subspace 0, the worst case for consecutive slicing
  // (one codebook absorbs nearly all the energy; seven quantize noise)
  private def skewedCorpus(n: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (0 until n).map { i =>
      val v = Seq.tabulate(dim) { j =>
        val scale = if (j < subDim) 10.0f else 1.0f
        (rnd.nextGaussian().toFloat) * scale
      }
      (i.toLong, v, 0)
    }.toDF("vec_id", "embedding", "label")
  }

  describe("opqPermutation") {
    it("is a bijection over the dimensions") {
      val perm = VectorOps.opqPermutation(skewedCorpus(50))
      perm.sorted shouldBe (0 until dim)
    }

    it("levels per-subspace energy where the natural split hoards it") {
      val emb = skewedCorpus(200)
      val micro = VectorOps.dimVarianceMicro(emb)
      def spread(perm: Seq[Int]): (Long, Long) = {
        val sums = perm.grouped(subDim).map(_.map(micro).sum).toSeq
        (sums.max, sums.min)
      }
      val (natMax, natMin) = spread(0 until dim)
      val (opqMax, opqMin) = spread(VectorOps.opqPermutation(emb))
      // natural: subspace 0 holds ALL heavy dims — ~100× imbalance;
      // snake allocation deals one heavy dim to each subspace
      natMax.toDouble / natMin.toDouble should be > 10.0
      opqMax.toDouble / opqMin.toDouble should be < 2.0
    }

    it("permuted corpus preserves cosine (allocation is orthogonal)") {
      val emb = skewedCorpus(30)
      val before = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val after = VectorOps.opqEmbeddings(emb)
        .select(col("vec_id"), col("embedding").as("v"))
      def cosSet(df: org.apache.spark.sql.DataFrame) =
        df.as("a").join(df.as("b"), col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id"), col("b.vec_id"),
            round(VectorOps.cosine(col("a.v"), col("b.v")), 6).as("c"))
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      cosSet(after) shouldBe cosSet(before)
    }
  }

  describe("pqOpqAdcTopK") {
    it("recall on the skewed corpus >= the natural consecutive split") {
      val emb = skewedCorpus(300)
      def meanRecall(report: org.apache.spark.sql.DataFrame): Double = {
        val rows = report.select(col("recall_at_k")).collect().map(_.getDouble(0))
        rows.sum / rows.length
      }
      val natural = meanRecall(VectorOps.pqRecallReport(emb))
      val opq = meanRecall(VectorOps.pqOpqRecallReport(emb))
      opq should be >= natural
      // and the gap is real on this corpus, not a tie of two perfect scores
      natural should be < 1.0
    }
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.functions.{HadamardCodec, HadamardRotate}
import graft.ops.VectorOps

/** The FWHT kernel behind the rotated-PQ tier: pinned against the naive
  * O(d²) definition (the oracle's replay), and against the algebra a
  * rotation must satisfy — involution, norm preservation, cosine
  * preservation.
  */
class HadamardSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  private def rot(v: Array[Double]): Array[Double] =
    HadamardCodec.rotate(new GenericArrayData(v)).toDoubleArray()

  describe("HadamardCodec.rotate") {
    it("matches the naive bit_count definition on the real corpus") {
      val vecs = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.001")
        .select(col("embedding").cast("array<double>")).collect()
        .map(_.getSeq[Double](0).toArray)
      vecs should not be empty
      // butterfly vs j-ascending sum differ only in fp association order,
      // ~1e-15 against a 1e-6 rounding grid — post-round they are equal
      vecs.foreach { v =>
        rot(v) shouldBe HadamardCodec.rotateNaive(v)
      }
    }
    it("is an involution up to the 6dp rounding it applies") {
      val v = Array.tabulate(64)(i => math.sin(i * 1.7) * 0.3)
      val back = rot(rot(v))
      v.indices.foreach { i =>
        back(i) shouldBe v(i) +- 2e-6
      }
    }
    it("preserves norms and pairwise cosine (orthogonality)") {
      val a = Array.tabulate(64)(i => math.cos(i * 0.9) * 0.5)
      val b = Array.tabulate(64)(i => math.sin(i * 0.4 + 1.0) * 0.5)
      def norm(x: Array[Double]) = math.sqrt(x.map(t => t * t).sum)
      def cos(x: Array[Double], y: Array[Double]) =
        x.zip(y).map(t => t._1 * t._2).sum / (norm(x) * norm(y))
      val (ra, rb) = (rot(a), rot(b))
      norm(ra) shouldBe norm(a) +- 1e-5
      cos(ra, rb) shouldBe cos(a, b) +- 1e-5
    }
    it("fails loudly on a non-power-of-two dim") {
      val e = intercept[IllegalStateException] {
        rot(Array.fill(63)(0.1))
      }
      e.getMessage should include("power of two")
    }
    it("runs as a codegen'd narrow projection — no exchange, no fallback") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val rotated = VectorOps.rotatedEmbeddings(emb)
      val plan = rotated.queryExecution.executedPlan.toString
      plan should not include "Exchange"
      rotated.count() shouldBe emb.count()
    }
  }

  describe("pqRotAdcTopK") {
    it("ranks in rotated space yet stays comparable to raw-corpus truth") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val report = VectorOps.pqRotRecallReport(emb).collect()
      report should not be empty
      // rotation must not destroy the ranking: recall stays within the
      // family's band (raw PQ sits ~0.3-0.5 on this corpus; a broken
      // rotation — wrong sign pattern, wrong scale — craters to ~0)
      val mean = report.map(_.getAs[Double]("recall_at_k")).sum / report.length
      mean should be > 0.1
    }
  }
}

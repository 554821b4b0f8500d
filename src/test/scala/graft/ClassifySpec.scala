package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.ops.Classify

class ClassifySpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  describe("nbLangClassify") {
    it("recovers the label on a separable corpus (resubstitution)") {
      val docs = docsDf(Seq(
        (1L, "x x x", "aa"), (2L, "x x q", "aa"),
        (3L, "y y y", "bb"), (4L, "y y q", "bb")))
      val got = Classify.nbLangClassify(docs).collect()
        .map(r => r.getLong(0) -> (r.getString(2), r.getLong(4))).toMap
      got shouldBe Map(
        1L -> ("aa", 1L), 2L -> ("aa", 1L),
        3L -> ("bb", 1L), 4L -> ("bb", 1L))
    }

    it("breaks exact score ties by class name ascending (deterministic)") {
      // Identical token distribution and priors for both classes → every
      // per-class fixed-point score is the SAME integer; the argmax must
      // fall back to the class-name order, not hash/partition order.
      val docs = docsDf(Seq((1L, "z z", "bb"), (2L, "z z", "aa")))
      val preds = Classify.nbLangClassify(docs).collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      preds shouldBe Map(1L -> "aa", 2L -> "aa")
    }

    it("scores with exact integer micro-nat accumulation") {
      // One class, one doc "x x": score = 2·round(1e6·ln((2+1)/(2+F))) +
      // round(1e6·ln(1)) — assembled from the same rounding the operator
      // declares, so this pins the fixed-point contract end-to-end.
      val f = Classify.NbFeatures
      val term = math.round(math.log(3.0 / (2 + f)) * 1e6)
      val expected = math.rint((2 * term + 0L) / 1e6 * 1e6) / 1e6 // 6dp of exact sum
      val docs = docsDf(Seq((1L, "x x", "aa")))
      val r = Classify.nbLangClassify(docs).collect()(0)
      r.getString(2) shouldBe "aa"
      r.getDouble(3) shouldBe expected +- 1e-9
    }
  }

  describe("nbMarginCalibration") {
    it("puts exact ties in bucket 0 and a one-class corpus at the cap") {
      val tied = docsDf(Seq((1L, "z z", "bb"), (2L, "z z", "aa")))
      val t = Classify.nbMarginCalibration(tied).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
      t.keySet shouldBe Set(0L)
      t(0L)._1 shouldBe 2L
      t(0L)._2 shouldBe 500000L // one of the two tied docs is labeled aa

      val mono = docsDf(Seq((1L, "x x", "aa")))
      val m = Classify.nbMarginCalibration(mono).collect()(0)
      m.getLong(0) shouldBe Classify.MarginBucketMax
      m.getLong(3) shouldBe 1000000L
    }

    it("separable corpus: every doc lands in one bucket with accuracy 1") {
      val docs = docsDf(Seq(
        (1L, "x x x", "aa"), (2L, "x x x", "aa"),
        (3L, "y y y", "bb"), (4L, "y y y", "bb")))
      val rows = Classify.nbMarginCalibration(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      rows.map(_._2).sum shouldBe 4L
      rows.foreach { case (_, n, correct, ppm) =>
        correct shouldBe n
        ppm shouldBe 1000000L
      }
    }
  }

  describe("nbLangConfusion") {
    it("is diagonal on the separable corpus") {
      val docs = docsDf(Seq(
        (1L, "x x x", "aa"), (2L, "x q x", "aa"),
        (3L, "y y y", "bb"), (4L, "q y y", "bb")))
      val got = Classify.nbLangConfusion(docs).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      got shouldBe Set(("aa", "aa", 2L), ("bb", "bb", 2L))
    }
  }
}

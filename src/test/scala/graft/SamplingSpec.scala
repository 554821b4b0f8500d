package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.ops.Sampling

class SamplingSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def docs(n: Int) = {
    import spark.implicits._
    val langs = Seq("en", "de", "fr", "es", "zh")
    (0 until n).map(i => (i.toLong, s"text $i", langs(i % 5), s"src${i % 3}"))
      .toDF("doc_id", "text", "lang", "source")
  }

  describe("stratifiedSample") {
    it("keeps every en doc, samples others at their ppm rate, splits ~10% val") {
      val out = Sampling.stratifiedSample(docs(2000)).collect()
      val byLang = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
      byLang("en") shouldBe 400 // rate 1.0: all 400 en docs survive
      // 700k ppm strata: expect ~280 of 400; allow generous hash wiggle
      byLang("de").toDouble should (be >= 220.0 and be <= 340.0)
      byLang("zh").toDouble should (be >= 140.0 and be <= 260.0) // 500k ppm
      val valFrac = out.count(_.getString(3) == "val").toDouble / out.length
      valFrac should (be >= 0.06 and be <= 0.14)
    }

    it("is deterministic and stable under corpus growth") {
      def kept(n: Int): Set[(Long, String)] =
        Sampling.stratifiedSample(docs(n)).collect()
          .map(r => (r.getLong(0), r.getString(3))).toSet
      val small = kept(500)
      val big = kept(1000)
      // hash-based membership: growing the corpus NEVER flips an existing
      // doc's keep/split decision (the property rand() sampling lacks)
      small.subsetOf(big) shouldBe true
      kept(500) shouldBe small // and re-running changes nothing
    }
  }
}

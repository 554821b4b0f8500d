package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions.{col, udaf}

import graft.functions.FreqItemsAggregator

/** Misra-Gries sketch guarantees, exercised through a real distributed agg
  * (partial buffers per partition + merges), not just single-threaded
  * reduce: bounded buffer, candidate completeness above N/(k+1), and
  * undercount-only estimates within the same bound.
  */
class FreqItemsAggregatorSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def sketch(tokens: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    val mg = udaf(new FreqItemsAggregator(k), Encoders.STRING)
    tokens.toDF("tok").repartition(parts)
      .agg(mg(col("tok"))).collect()(0)
      .getMap[String, Long](0).toMap
  }

  describe("FreqItemsAggregator (Misra-Gries)") {
    it("bounds the buffer at k and never misses an item above N/(k+1)") {
      val rnd = new scala.util.Random(42)
      // skewed stream: two hot items over a 500-token noise floor
      val toks = Seq.fill(20000) {
        val r = rnd.nextInt(100)
        if (r < 25) "hot1" else if (r < 40) "hot2" else s"t${rnd.nextInt(500)}"
      }
      val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val k = 20
      val sk = sketch(toks, k, parts = 7)
      val bound = toks.size.toDouble / (k + 1)

      sk.size should be <= k
      val mustSurvive = exact.collect { case (t, c) if c > bound => t }.toSet
      mustSurvive should not be empty // the test is vacuous otherwise
      mustSurvive.subsetOf(sk.keySet) shouldBe true
      sk.foreach { case (t, est) =>
        est should be <= exact(t) // MG only ever undercounts
        (exact(t) - est).toDouble should be <= bound
      }
    }

    it("is exact when the distinct count fits in k") {
      val toks = Seq("a", "a", "b", "c", "c", "c")
      sketch(toks, k = 8, parts = 3) shouldBe Map("a" -> 2L, "b" -> 1L, "c" -> 3L)
    }

    it("merge re-bounds summed buffers by the (k+1)-th largest count") {
      val agg = new FreqItemsAggregator(2)
      val merged = agg.merge(Map("a" -> 10L, "b" -> 3L), Map("c" -> 5L, "d" -> 1L))
      // counts sorted desc: 10,5,3,1 → d = 3 subtracted from all, <=0 dropped
      merged shouldBe Map("a" -> 7L, "c" -> 2L)
    }
  }
}

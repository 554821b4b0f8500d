package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.ops.TextOps

/** TextRank keywords: a token co-occurring with many distinct partners
  * out-ranks a token that merely repeats beside one partner, stopwords
  * never surface, and the co-occurrence graph is built as claimed.
  */
class TextRankSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  // "core" bridges every topic sentence (a hub); "loop" repeats heavily
  // but only ever beside "pair"; "the" separates clauses (stopword)
  private def docs = Seq(
    (1L, "core alpha the core beta the core gamma the loop pair loop pair loop pair"),
    (2L, "core delta the core epsilon the loop pair loop pair"),
    (3L, "zeta core the eta core"))
    .toDF("doc_id", "text")

  describe("textRankCooc") {
    it("builds the stopword-broken window-2 graph") {
      val pairs = TextOps.textRankCooc(docs).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      pairs(("alpha", "core")) shouldBe 1L
      pairs(("loop", "pair")) shouldBe 8L  // repeats accumulate weight
      // stopwords never appear as endpoints
      pairs.keySet.flatMap(p => Set(p._1, p._2)) should contain noneOf ("the", "a")
      // "the" breaks the link: core/beta are adjacent only THROUGH "the"
      // in doc 1 ("beta the core"), so no (beta, core) edge beyond the
      // direct "core beta" adjacency
      pairs(("beta", "core")) shouldBe 1L
    }
  }

  describe("textRankKeywords") {
    it("ranks the hub token above the heavy two-token loop") {
      val out = TextOps.textRankKeywords(docs, k = 5).collect()
        .map(r => (r.getString(0), r.getDouble(2)))
      out.head._1 shouldBe "core" // most distinct co-occurrence partners
      val rank = out.toMap
      rank("core") should be > rank.getOrElse("loop", 0.0)
      out.map(_._1) should not contain "the"
    }
  }
}

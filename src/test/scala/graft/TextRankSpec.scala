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

  describe("StreamingTextRank") {
    it("keywords served from the maintained graph == batch over full history") {
      import graft.streaming.StreamingTextRank
      val dir = java.nio.file.Files.createTempDirectory("graft-strk").toString
      val stateDir = s"$dir/state"
      val all = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      all.grouped(2).zipWithIndex.foreach { case (b, i) =>
        StreamingTextRank.processBatch(b.toDF("doc_id", "text"), i.toLong, stateDir)
      }
      val served = StreamingTextRank.serveKeywords(spark, stateDir)
        .collect().map(_.mkString("|")).toSet
      val inline = TextOps.textRankKeywords(docs)
        .collect().map(_.mkString("|")).toSet
      served shouldBe inline
    }

    it("a replayed batch is exactly-once: co-occurrence not double-counted") {
      import graft.streaming.StreamingTextRank
      val dir = java.nio.file.Files.createTempDirectory("graft-strk-retry").toString
      val stateDir = s"$dir/state"
      val all = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val (b0, b1) = all.splitAt(2)
      StreamingTextRank.processBatch(b0.toDF("doc_id", "text"), 0L, stateDir)
      StreamingTextRank.processBatch(b1.toDF("doc_id", "text"), 1L, stateDir)
      val snap = StreamingTextRank.readCooc(spark, stateDir, Long.MaxValue)
        .collect().map(_.mkString("|")).toSet
      StreamingTextRank.processBatch(b1.toDF("doc_id", "text"), 1L, stateDir)
      StreamingTextRank.readCooc(spark, stateDir, Long.MaxValue)
        .collect().map(_.mkString("|")).toSet shouldBe snap
    }

    it("serving from never-built state degrades to the empty keyword set") {
      import graft.streaming.StreamingTextRank
      val dir = java.nio.file.Files.createTempDirectory("graft-strk-empty").toString
      val out = StreamingTextRank.serveKeywords(spark, s"$dir/state")
      out.count() shouldBe 0L
      out.columns.toSeq shouldBe Seq("token", "weight_fp", "rank")
    }
  }
}

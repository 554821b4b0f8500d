package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.TextOps
import graft.streaming.{StreamingCuration, StreamingSpanExcise}

/** Streamed duplicate-span excision ≡ batch stripDupSpans over the full
  * history (monotone doc ids — the documented contract): history
  * collisions, within-batch collisions, canonical keep-first, replay
  * idempotence, and the curation composition's clean sink.
  */
class StreamingSpanExciseSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  // a 5-token span (the SpanTokens default) planted across documents,
  // each host otherwise unique-vocab
  private val span = "dup1 dup2 dup3 dup4 dup5"
  private def tail(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
  private val doc1 = s"$span ${tail("qa", 20)}"       // canonical holder
  private val doc3 = tail("uu", 25)                    // unrelated
  private val doc10 = s"${tail("zb", 10)} $span ${tail("zc", 10)}" // history collision
  private val doc11 = s"$span ${tail("rc", 20)}"       // history + within-batch
  private val doc20 = s"${tail("we", 15)} $span"       // later batch collision

  private val allDocs = Seq(1L -> doc1, 3L -> doc3, 10L -> doc10, 11L -> doc11, 20L -> doc20)

  private def cleanOf(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, String)] =
    df.select("doc_id", "n_tokens_after", "text_clean").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  describe("StreamingSpanExcise") {
    it("streamed excision over three batches == batch stripDupSpans over the full history") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-sspan").toString
      val (idxDir, cleanDir, ckptDir) = (s"$dir/idx", s"$dir/clean", s"$dir/ckpt")

      val mem = MemoryStream[(Long, String)]
      val q = StreamingSpanExcise.start(
        mem.toDS().toDF("doc_id", "text"), idxDir, cleanDir, ckptDir)
      try {
        mem.addData((1L, doc1), (3L, doc3))
        q.processAllAvailable()
        mem.addData((10L, doc10), (11L, doc11))
        q.processAllAvailable()
        mem.addData((20L, doc20))
        q.processAllAvailable()
      } finally q.stop()

      val streamed = cleanOf(spark.read.parquet(cleanDir))
      val batch = cleanOf(TextOps.stripDupSpans(allDocs.toDF("doc_id", "text")))
      streamed shouldBe batch
      // the canonical keeps its copy; every later holder lost the span
      streamed(1L)._2 should include("dup1")
      Seq(10L, 11L, 20L).foreach { id =>
        streamed(id)._2 should not include "dup1"
      }
      streamed(3L)._2 shouldBe doc3 // untouched
    }

    it("a replayed batch is exactly-once for both the clean sink and the index") {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-sspan-retry").toString
      val (idxDir, cleanDir) = (s"$dir/idx", s"$dir/clean")
      val b0 = Seq(1L -> doc1, 3L -> doc3).toDF("doc_id", "text")
      val b1 = Seq(10L -> doc10).toDF("doc_id", "text")
      StreamingSpanExcise.processBatch(b0, 0L, idxDir, cleanDir)
      StreamingSpanExcise.processBatch(b1, 1L, idxDir, cleanDir)
      val cleanOnce = cleanOf(spark.read.parquet(cleanDir))
      val idxOnce = spark.read.parquet(idxDir).count()
      // crash-after-commit retry replays batch 1 with identical contents
      StreamingSpanExcise.processBatch(b1, 1L, idxDir, cleanDir)
      cleanOf(spark.read.parquet(cleanDir)) shouldBe cleanOnce
      spark.read.parquet(idxDir).count() shouldBe idxOnce
      // retry did not re-excise doc 10 against its own first attempt's
      // spans: its unique-vocab tail survives intact
      cleanOnce(10L)._2 should include("zb1")
      cleanOnce(10L)._2 should not include "dup1"
    }

    it("curation composition: gates route docs, then the clean sink excises spans of kept text") {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-sspan-cur").toString
      val (keptDir, rejDir, idxDir, cleanDir) =
        (s"$dir/kept", s"$dir/rej", s"$dir/idx", s"$dir/clean")
      // doc 7 fails the length gate (short) — it must NOT reach the span
      // index, so its copy of the span cannot claim canonicality
      val b0 = Seq(1L -> doc1, 7L -> span).toDF("doc_id", "text")
      val b1 = Seq(10L -> doc10).toDF("doc_id", "text")
      StreamingCuration.processBatchWithSpanExcision(b0, 0L, keptDir, rejDir, idxDir, cleanDir)
      StreamingCuration.processBatchWithSpanExcision(b1, 1L, keptDir, rejDir, idxDir, cleanDir)
      val rejected = spark.read.parquet(rejDir).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      rejected should contain(7L)
      val clean = cleanOf(spark.read.parquet(cleanDir))
      clean.keySet shouldBe Set(1L, 10L) // kept docs only
      clean(1L)._2 should include("dup1")      // canonical keeps the span
      clean(10L)._2 should not include "dup1"  // later holder excised
      // and equals the batch chain over the RETAINED docs of full history
      val retained = Seq(1L -> doc1, 10L -> doc10).toDF("doc_id", "text")
      clean shouldBe cleanOf(TextOps.stripDupSpans(retained))
    }
  }
}

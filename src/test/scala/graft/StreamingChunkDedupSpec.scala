package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.streaming.StreamingChunkDedup

/** The chunk-tier ingest loop: signatures accumulate per micro-batch, and
  * cross-document chunk pairs served from the index equal the batch
  * `chunk_neardup_pairs` derivation over everything ingested — including
  * a HISTORY collision (a passage arriving batches after its original)
  * and a within-batch collision; a replayed batch leaves one copy.
  */
class StreamingChunkDedupSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  // a 32-token passage copied across documents; each host doc padded with
  // its own unrelated tail so DOC-level similarity stays below threshold
  private val passage = (1 to 32).map(i => s"pp$i")
  private val doc1 = (passage ++ (1 to 28).map(i => s"qa$i")).mkString(" ")
  private val doc2 = (passage ++ (1 to 40).map(i => s"zb$i")).mkString(" ")
  private val doc3 = (1 to 60).map(i => s"uu$i").mkString(" ")
  private val doc4 = (passage ++ (1 to 36).map(i => s"rc$i")).mkString(" ")

  private def batchPairs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    val chunks = StreamingChunkDedup.chunkPseudoDocs(rows.toDF("doc_id", "text"))
    Dedup.minhashLshPairs(chunks)
      .filter(expr(s"doc_a DIV ${StreamingChunkDedup.ChunkIdFactor}") =!=
        expr(s"doc_b DIV ${StreamingChunkDedup.ChunkIdFactor}"))
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  describe("StreamingChunkDedup") {
    it("streamed index serves cross-doc chunk pairs == batch over full history") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-schunk").toString
      val (idxDir, ckptDir) = (s"$dir/idx", s"$dir/ckpt")

      val mem = MemoryStream[(Long, String)]
      val q = StreamingChunkDedup.start(
        mem.toDS().toDF("doc_id", "text"), idxDir, ckptDir)
      try {
        // batch 0: the original passage and an unrelated doc — no pairs yet
        mem.addData((1L, doc1), (3L, doc3))
        q.processAllAvailable()
        val afterB0 = StreamingChunkDedup.crossDocPairsFrom(
          StreamingChunkDedup.readSignatures(spark, idxDir))
        afterB0.count() shouldBe 0L
        // batch 1: doc 2 re-uses the passage (HISTORY collision with doc 1,
        // chunked in batch 0) and doc 4 re-uses it too (WITHIN-batch
        // collision with doc 2, plus another history collision with doc 1)
        mem.addData((2L, doc2), (4L, doc4))
        q.processAllAvailable()
      } finally q.stop()

      val served = StreamingChunkDedup.crossDocPairsFrom(
        StreamingChunkDedup.readSignatures(spark, idxDir))
      val inline = batchPairs(Seq(1L -> doc1, 3L -> doc3, 2L -> doc2, 4L -> doc4))
      pairSet(served) shouldBe pairSet(inline)
      // the collisions actually straddle batches and documents as planted
      val docPairs = served
        .select((col("doc_a") / StreamingChunkDedup.ChunkIdFactor).cast("long").as("a"),
          (col("doc_b") / StreamingChunkDedup.ChunkIdFactor).cast("long").as("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      docPairs should contain((1L, 2L)) // history collision
      docPairs should contain((2L, 4L)) // within-batch collision
      docPairs.flatMap(p => Set(p._1, p._2)) should not contain 3L
    }

    it("a replayed batch is exactly-once: signature index holds one copy") {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-schunk-retry").toString
      val idxDir = s"$dir/idx"
      val b0 = Seq((1L, doc1), (3L, doc3)).toDF("doc_id", "text")
      val b1 = Seq((2L, doc2)).toDF("doc_id", "text")
      StreamingChunkDedup.processBatch(b0, 0L, idxDir)
      StreamingChunkDedup.processBatch(b1, 1L, idxDir)
      val once = StreamingChunkDedup.readSignatures(spark, idxDir).count()
      // crash-after-commit retry replays batch 1 with identical contents
      StreamingChunkDedup.processBatch(b1, 1L, idxDir)
      StreamingChunkDedup.readSignatures(spark, idxDir).count() shouldBe once
      // one signature row per chunk of every ingested doc, each id unique
      val sig = StreamingChunkDedup.readSignatures(spark, idxDir)
      sig.select("doc_id").distinct().count() shouldBe sig.count()
    }
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.streaming.StreamingMediaDedup

/** The perceptual media tier's ingest + forget story: the streamed
  * fingerprint/pair index equals the batch `mediaNearDupPairs` derivation
  * over everything ingested at every micro-batch (each pair generated
  * exactly once, in the batch of its later endpoint); replays are
  * exactly-once; a tombstone physically removes a media_id's fingerprint
  * and every pair naming it, after which the index equals a batch rebuild
  * over the survivors — and a re-submission of the same bytes under a new
  * id pairs afresh instead of colliding with a ghost.
  */
class StreamingMediaDedupSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  // near-identical twins = the withPlantedMediaDups surgery (a 3-byte
  // local edit); unrelated = a structurally different byte pattern
  private val baseA =
    ("The quick brown fox jumps over the lazy dog while seventeen " +
      "magnificent zebras parade across the wide savanna at dawn. ") * 2
  private val baseB =
    ("Stock indices fell sharply on Tuesday as bond yields rose and " +
      "investors weighed fresh inflation data from overseas markets. ") * 2
  private def edit(s: String, at: Int): String =
    s.substring(0, at) + "XQZ" + s.substring(at + 3)
  private val unrelated = "0123456789" * 13 + "!!??!!"

  // batches: A-twin split ACROSS batches (1,2), B pair within batch 0,
  // a collision-free loner (3)
  private val b0 = Seq((1L, baseA), (4L, baseB), (5L, edit(baseB, 40)), (3L, unrelated))
  private val b1 = Seq((2L, edit(baseA, 30)))
  private val b2 = Seq((6L, edit(baseA, 90)))

  private def mediaDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("media_id", "text")
      .select(col("media_id"),
        Multimodal.mediaTypeCol(col("media_id")).as("media_type"),
        col("text").cast("binary").as("content"))

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def batchPairs(rows: Seq[(Long, String)]): DataFrame =
    Multimodal.mediaNearDupPairs(mediaDf(rows))

  private def assertEqualsBatch(idxDir: String, rows: Seq[(Long, String)]): Unit = {
    rowSet(StreamingMediaDedup.readPairs(spark, idxDir)) shouldBe
      rowSet(batchPairs(rows))
    // the fingerprint index too: one row per surviving media item
    rowSet(StreamingMediaDedup.readPhash(spark, idxDir, Long.MaxValue)) shouldBe
      rowSet(Multimodal.perceptualHash(mediaDf(rows)))
  }

  describe("StreamingMediaDedup") {
    it("maintained index == batch mediaNearDupPairs over full history, every batch") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-smd").toString
      val (idxDir, ckpt) = (s"$dir/idx", s"$dir/ckpt")
      val mem = MemoryStream[(Long, String)]
      val q = StreamingMediaDedup.start(
        mem.toDS().toDF("media_id", "text")
          .select(col("media_id"),
            Multimodal.mediaTypeCol(col("media_id")).as("media_type"),
            col("text").cast("binary").as("content")),
        idxDir, ckpt)
      try {
        var seen = Seq.empty[(Long, String)]
        Seq(b0, b1, b2).foreach { b =>
          mem.addData(b: _*)
          q.processAllAvailable()
          seen = seen ++ b
          assertEqualsBatch(idxDir, seen)
        }
      } finally q.stop()

      // the planted geometry actually exercised the tier: the A-twin pair
      // (1,2) straddles batches 0 and 1, the B pair (4,5) is intra-batch,
      // the loner pairs with nothing
      val pairs = StreamingMediaDedup.readPairs(spark, idxDir)
        .select("media_a", "media_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs should contain((1L, 2L))
      pairs should contain((4L, 5L))
      pairs.exists(p => p._1 == 3L || p._2 == 3L) shouldBe false
    }

    it("a replayed batch is exactly-once: index unchanged") {
      val dir = java.nio.file.Files.createTempDirectory("graft-smd-retry").toString
      val idxDir = s"$dir/idx"
      StreamingMediaDedup.processBatch(mediaDf(b0), 0L, idxDir)
      StreamingMediaDedup.processBatch(mediaDf(b1), 1L, idxDir)
      val snap = rowSet(StreamingMediaDedup.readPairs(spark, idxDir))
      val nPhash = StreamingMediaDedup.readPhash(spark, idxDir, Long.MaxValue).count()
      // crash-after-commit retry replays batch 1 with identical contents
      StreamingMediaDedup.processBatch(mediaDf(b1), 1L, idxDir)
      rowSet(StreamingMediaDedup.readPairs(spark, idxDir)) shouldBe snap
      StreamingMediaDedup.readPhash(spark, idxDir, Long.MaxValue).count() shouldBe nPhash
    }

    it("a tombstone physically removes fingerprint + pairs; post-delete == rebuild; re-submission pairs afresh") {
      val dir = java.nio.file.Files.createTempDirectory("graft-smd-del").toString
      val idxDir = s"$dir/idx"
      Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
        StreamingMediaDedup.processBatch(mediaDf(b), i.toLong, idxDir)
      }
      // forget media 2 (one endpoint of the cross-batch A pair)
      StreamingMediaDedup.processDeletes(Seq(2L).toDF("media_id"), idxDir)
      val survivors = (b0 ++ b1 ++ b2).filterNot(_._1 == 2L)
      assertEqualsBatch(idxDir, survivors)
      // physically gone — right-to-be-forgotten audit finds nothing
      spark.read.parquet(s"$idxDir/phash")
        .filter(col("media_id") === 2L).count() shouldBe 0L
      spark.read.parquet(s"$idxDir/pairs")
        .filter(col("media_a") === 2L || col("media_b") === 2L).count() shouldBe 0L
      // replay of the takedown: exactly-once
      StreamingMediaDedup.processDeletes(Seq(2L).toDF("media_id"), idxDir)
      assertEqualsBatch(idxDir, survivors)
      // the same bytes re-submitted under a NEW id pair afresh (the index
      // must not remember the deleted fingerprint)
      StreamingMediaDedup.processBatch(mediaDf(Seq(12L -> edit(baseA, 30))), 3L, idxDir)
      val pairs = StreamingMediaDedup.readPairs(spark, idxDir)
        .select("media_a", "media_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs should contain((1L, 12L))
    }

    it("a mixed CDC batch (takedown + upsert in one micro-batch) == batch build over the merged corpus, exactly-once on retry") {
      val dir = java.nio.file.Files.createTempDirectory("graft-smd-cdc").toString
      val idxDir = s"$dir/idx"
      Seq(b0, b1).zipWithIndex.foreach { case (b, i) =>
        StreamingMediaDedup.processBatch(mediaDf(b), i.toLong, idxDir)
      }
      // one batch: forget 5, ingest 6 (an A-family near-dup)
      val cdc = Seq((5L, "", true), (6L, edit(baseA, 90), false))
        .toDF("media_id", "text", "is_delete")
        .select(col("media_id"),
          Multimodal.mediaTypeCol(col("media_id")).as("media_type"),
          col("text").cast("binary").as("content"), col("is_delete"))
      StreamingMediaDedup.processCdcBatch(cdc, 2L, idxDir)
      StreamingMediaDedup.processCdcBatch(cdc, 2L, idxDir) // crash-retry
      assertEqualsBatch(idxDir, (b0 ++ b1).filterNot(_._1 == 5L) :+ (6L -> edit(baseA, 90)))
    }
  }
}

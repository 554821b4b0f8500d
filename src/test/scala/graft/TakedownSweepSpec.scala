package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, VectorOps}
import graft.streaming._

/** The right-to-be-forgotten COMPOSITION: one takedown request fanned
  * across every maintained artifact (text dedup index, postings index,
  * chunk index, ANN cell index, proximity graph, media fingerprint
  * index, entity-resolution index) must leave NO serving surface naming
  * the subject — compliance is a property of the whole platform, not of
  * one index. The absence audit is the machine-checkable proof, and the
  * sweep must be idempotent (a crash-retry of the compliance job cannot
  * corrupt survivors).
  */
class TakedownSweepSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  // text: doc 2 near-dups doc 1 so the pair graph names the subject
  private val base = (1 to 60).map(i => s"tok$i").mkString(" ")
  private val nearDup = ((1 to 59).map(i => s"tok$i") :+ "changed").mkString(" ")
  private val unrelated = (1 to 60).map(i => s"other$i").mkString(" ")
  private def docs: DataFrame =
    Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")

  // media: block-structured payloads, 11 = one-block-off twin of 10
  private val lowBlk = "!" * 8
  private val highBlk = "~" * 8
  private val structured =
    (0 until 64).map(b => if (b % 2 == 0) lowBlk else highBlk).mkString
  private val oneBlockOff = highBlk + structured.substring(8)
  private def mediaDocs: DataFrame = Seq(
      (10L, structured, "en", "s1"),
      (11L, oneBlockOff, "en", "s1"),
      (12L, (1 to 80).map(i => s"pay$i").mkString(" "), "en", "s2"))
    .toDF("doc_id", "text", "lang", "source")

  // embeddings: the angular chain; vec 4 is the Voronoi bridge (has edges)
  private def vec(theta: Double): Seq[Float] =
    Seq(math.cos(theta).toFloat, math.sin(theta).toFloat)
  private val emb: Seq[(Long, Seq[Float], Int)] =
    (0 until 4).map(i => (i.toLong, vec(0.05 * i), 0)) ++
      Seq((4L, vec(0.25), 1), (5L, vec(0.35), 1)) ++
      (6 until 14).map(i => (i.toLong, vec(0.45 + 0.05 * (i - 6)), 1))
  private def embDf: DataFrame = emb.toDF("vec_id", "embedding", "label")
  private def cents: DataFrame =
    VectorOps.centroids(embDf).select(col("label").as("cell"), col("centroid"))

  private def custDf: DataFrame = Seq(
      (1L, "alice corp", 1, 100.0, "BUILDING"),
      (2L, "bob inc", 2, 200.0, "MACHINERY"),
      (3L, "bob inc.", 2, 210.0, "MACHINERY"))
    .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  describe("TakedownSweep") {
    it("one request scrubs every artifact; the absence audit proves it; replay is exactly-once") {
      val tmp = java.nio.file.Files.createTempDirectory("graft-takedown").toString
      val arts = TakedownSweep.Artifacts(
        dedupIndexDir = Some(s"$tmp/dedup"),
        textIndexDir = Some(s"$tmp/text"),
        chunkIndexDir = Some(s"$tmp/chunk"),
        annIndexDir = Some(s"$tmp/ann"),
        spannIndexDir = Some(s"$tmp/spann"),
        graphAnn = Some(TakedownSweep.GraphAnnHandle(s"$tmp/graph", cents)),
        mediaIndexDir = Some(s"$tmp/media"),
        entityIndexDir = Some(s"$tmp/entity"))

      // ingest the subject's data into every tier
      StreamingDedupIndex.processBatch(docs, 0L, s"$tmp/dedup")
      StreamingTextIngest.processBatch(docs, 0L, s"$tmp/text")
      StreamingChunkDedup.processBatch(docs, 0L, s"$tmp/chunk")
      StreamingAnnIngest.processBatch(embDf, 0L, cents, s"$tmp/ann")
      StreamingSpannIngest.processBatch(embDf, 0L, cents, s"$tmp/spann")
      StreamingGraphAnn.processBatch(embDf, 0L, cents, s"$tmp/graph")
      StreamingMediaDedup.processBatch(Multimodal.mediaTable(mediaDocs), 0L, s"$tmp/media")
      StreamingEntityRes.processBatch(custDf, 0L, s"$tmp/entity")

      val req = TakedownSweep.Request(
        docIds = Some(Seq(1L).toDF("doc_id")),
        mediaIds = Some(Seq(10L).toDF("media_id")),
        vecIds = Some(Seq(4L).toDF("vec_id")),
        custIds = Some(Seq(2L).toDF("c_custkey")))

      // negative control: before the sweep the subject is visibly present
      // in every modality (incl. derived pair/edge tables)
      val before = TakedownSweep.absenceAudit(spark, req, arts)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      before.keySet should contain allOf ("dedup_index.signatures",
        "text_index.postings", "chunk_index.signatures", "ann_index.live",
        "spann_index.postings", "graph_ann.postings", "media_index.phash",
        "entity_index.records")
      before("dedup_index.pairs.a") should be >= 1L // the 1-2 near-dup pair
      before("media_index.pairs.a") should be >= 1L // the 10-11 twin pair

      TakedownSweep.sweep(req, arts, batchId = 1L)
      TakedownSweep.absenceAudit(spark, req, arts).collect() shouldBe empty

      // idempotent: replaying the compliance job changes nothing and
      // cannot corrupt survivors
      TakedownSweep.sweep(req, arts, batchId = 1L)
      TakedownSweep.absenceAudit(spark, req, arts).collect() shouldBe empty

      // survivors still served: the untouched doc/media/vec/customer keep
      // their rows in every tier
      StreamingTextIngest.readPostings(spark, s"$tmp/text")
        .filter(col("doc_id") === 3L).count() should be > 0L
      StreamingMediaDedup.readPhash(spark, s"$tmp/media", Long.MaxValue)
        .filter(col("media_id") === 12L).count() shouldBe 1L
      StreamingAnnIngest.readIndexLive(spark, s"$tmp/ann")
        .filter(col("vec_id") === 5L).count() shouldBe 1L
      StreamingGraphAnn.readPostings(spark, s"$tmp/graph")
        .filter(col("vec_id") === 5L).count() should be > 0L
      StreamingEntityRes.readRecords(spark, s"$tmp/entity")
        .filter(col("c_custkey") === 3L).count() shouldBe 1L
      StreamingSpannIngest.readIndex(spark, s"$tmp/spann")
        .filter(col("vec_id") === 5L).count() should be >= 1L
    }

    it("a batched sweep equals N sequential sweeps, reports per-ticket scrub counts, and replays exactly-once") {
      def mkArts(tmp: String): TakedownSweep.Artifacts = {
        StreamingDedupIndex.processBatch(docs, 0L, s"$tmp/dedup")
        StreamingTextIngest.processBatch(docs, 0L, s"$tmp/text")
        StreamingChunkDedup.processBatch(docs, 0L, s"$tmp/chunk")
        StreamingAnnIngest.processBatch(embDf, 0L, cents, s"$tmp/ann")
        StreamingSpannIngest.processBatch(embDf, 0L, cents, s"$tmp/spann")
        StreamingGraphAnn.processBatch(embDf, 0L, cents, s"$tmp/graph")
        StreamingMediaDedup.processBatch(Multimodal.mediaTable(mediaDocs), 0L, s"$tmp/media")
        StreamingEntityRes.processBatch(custDf, 0L, s"$tmp/entity")
        TakedownSweep.Artifacts(
          dedupIndexDir = Some(s"$tmp/dedup"),
          textIndexDir = Some(s"$tmp/text"),
          chunkIndexDir = Some(s"$tmp/chunk"),
          annIndexDir = Some(s"$tmp/ann"),
          spannIndexDir = Some(s"$tmp/spann"),
          graphAnn = Some(TakedownSweep.GraphAnnHandle(s"$tmp/graph", cents)),
          mediaIndexDir = Some(s"$tmp/media"),
          entityIndexDir = Some(s"$tmp/entity"))
      }
      def serving(tmp: String): Seq[(String, DataFrame)] = Seq(
        "dedup.sig" -> StreamingDedupIndex.readSignatures(spark, s"$tmp/dedup", Long.MaxValue),
        "dedup.pairs" -> StreamingDedupIndex.readPairs(spark, s"$tmp/dedup", Long.MaxValue),
        "text.postings" -> StreamingTextIngest.readPostings(spark, s"$tmp/text"),
        "text.doclens" -> StreamingTextIngest.readDoclens(spark, s"$tmp/text"),
        "chunk.sig" -> StreamingChunkDedup.readSignatures(spark, s"$tmp/chunk"),
        "ann.live" -> StreamingAnnIngest.readIndexLive(spark, s"$tmp/ann"),
        "spann.idx" -> StreamingSpannIngest.readIndex(spark, s"$tmp/spann"),
        "graph.post" -> StreamingGraphAnn.readPostings(spark, s"$tmp/graph"),
        "graph.edges" -> StreamingGraphAnn.readEdges(spark, s"$tmp/graph"),
        "media.phash" -> StreamingMediaDedup.readPhash(spark, s"$tmp/media", Long.MaxValue),
        "media.pairs" -> StreamingMediaDedup.readPairs(spark, s"$tmp/media"),
        "entity.rec" -> StreamingEntityRes.readRecords(spark, s"$tmp/entity"),
        "entity.pairs" -> StreamingEntityRes.readPairs(spark, s"$tmp/entity"))
      def snapshot(tmp: String): Map[String, Seq[String]] =
        serving(tmp).map { case (n, df) =>
          n -> df.collect().map(_.toString).sorted.toSeq
        }.toMap

      val tmpA = java.nio.file.Files.createTempDirectory("graft-takedown-seq").toString
      val tmpB = java.nio.file.Files.createTempDirectory("graft-takedown-bat").toString
      val artsA = mkArts(tmpA)
      val artsB = mkArts(tmpB)
      val req1 = TakedownSweep.Request(
        docIds = Some(Seq(1L).toDF("doc_id")),
        vecIds = Some(Seq(4L).toDF("vec_id")))
      val req2 = TakedownSweep.Request(
        docIds = Some(Seq(2L).toDF("doc_id")),
        mediaIds = Some(Seq(10L).toDF("media_id")),
        custIds = Some(Seq(2L).toDF("c_custkey")))

      // N sequential sweeps on A
      TakedownSweep.sweep(req1, artsA, batchId = 1L)
      TakedownSweep.sweep(req2, artsA, batchId = 2L)
      // ONE batched sweep on B, with the per-ticket accounting
      val report = TakedownSweep.sweepBatchReport(
          spark, Seq(req1, req2), artsB, batchId = 1L)
        .collect()
        .map(r => (r.getInt(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap

      // batched ≡ sequential on every serving surface
      snapshot(tmpB) shouldBe snapshot(tmpA)

      // per-ticket accounting: every surface fully scrubbed, and each
      // ticket's own rows attributed to it
      report.values.foreach { case (_, remaining) => remaining shouldBe 0L }
      report((0, "dedup_index.signatures"))._1 should be >= 1L
      report((0, "ann_index.live"))._1 shouldBe 1L
      report((0, "spann_index.postings"))._1 should be >= 1L
      report((1, "media_index.phash"))._1 shouldBe 1L
      report((1, "entity_index.records"))._1 shouldBe 1L
      // ticket 1 names no vec, so it must report zero against the vec tiers
      report.get((1, "ann_index.live")) shouldBe None

      // exactly-once: replaying the whole batched compliance job changes
      // nothing
      val pre = snapshot(tmpB)
      TakedownSweep.sweepBatch(Seq(req1, req2), artsB, batchId = 1L)
      snapshot(tmpB) shouldBe pre
      TakedownSweep.absenceAudit(spark,
        TakedownSweep.combine(Seq(req1, req2)), artsB).collect() shouldBe empty
    }
  }
}

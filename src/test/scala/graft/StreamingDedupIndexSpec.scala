package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.{Dedup, DedupIndex, Graph}
import graft.streaming.StreamingDedupIndex

/** The maintained near-dup graph artifact: after EVERY micro-batch the
  * streamed (pairs, labels, components) tables equal the batch
  * `DedupIndex.build` over every document ever ingested — including a
  * cross-batch COMMUNITY MERGE where a later document chain-bridges two
  * communities built in earlier batches — a replayed batch is
  * exactly-once, and a report served from the streamed index matches the
  * inline derivation.
  */
class StreamingDedupIndexSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private val baseA = (1 to 40).map(i => s"alpha$i")
  private val baseB = (1 to 40).map(i => s"beta$i")
  private def mut(ts: Seq[String], n: Int): String =
    (ts.dropRight(n) ++ (1 to n).map(i => s"x$i")).mkString(" ")

  // hybrids chosen (deterministic hash, probed offline) so that:
  //   hybNearA band-collides with the A family and with hybNearB,
  //   hybNearB band-collides with the B family but NOT with A —
  // so ingesting hybNearA then hybNearB merges the two communities
  // through a genuine 2-hop bridge, across batches.
  private val hybNearA = (baseA.take(34) ++ baseB).mkString(" ")
  private val hybNearB = (baseA.take(18) ++ baseB).mkString(" ")

  private val b0 = Seq(
    1L -> baseA.mkString(" "), 2L -> mut(baseA, 2),
    5L -> baseB.mkString(" "), 6L -> mut(baseB, 2),
    3L -> (1 to 50).map(i => s"uu$i").mkString(" "))  // no collisions
  private val b1 = Seq(9L -> hybNearA)
  private val b2 = Seq(10L -> hybNearB)

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def batchFrames(docs: Seq[(Long, String)]): DedupIndex.Frames = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdix-ref").toString
    DedupIndex.buildAndRead(docs.toDF("doc_id", "text"), dir)
  }

  private def assertEqualsBatch(idxDir: String, docs: Seq[(Long, String)]): Unit = {
    val streamed = StreamingDedupIndex.readIndex(spark, idxDir)
    val ref = batchFrames(docs)
    rowSet(streamed.pairs) shouldBe rowSet(ref.pairs)
    rowSet(streamed.labels) shouldBe rowSet(ref.labels)
    rowSet(streamed.components) shouldBe rowSet(ref.components)
    rowSet(streamed.components3) shouldBe rowSet(ref.components3)
  }

  describe("StreamingDedupIndex") {
    it("maintained artifact == batch DedupIndex build over full history, every batch") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-sdix").toString
      val (idxDir, ckpt) = (s"$dir/idx", s"$dir/ckpt")
      val mem = MemoryStream[(Long, String)]
      val q = StreamingDedupIndex.start(mem.toDS().toDF("doc_id", "text"), idxDir, ckpt)
      try {
        var seen = Seq.empty[(Long, String)]
        Seq(b0, b1, b2).foreach { b =>
          mem.addData(b: _*)
          q.processAllAvailable()
          seen = seen ++ b
          assertEqualsBatch(idxDir, seen)
        }
      } finally q.stop()

      val frames = StreamingDedupIndex.readIndex(spark, idxDir)
      val comp = frames.components.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // the cross-batch merge: after batch 2, both families and both
      // hybrids share one component (min id 1)
      Seq(1L, 2L, 5L, 6L, 9L, 10L).foreach(n => comp(n) shouldBe 1L)
      // the collision-free doc never enters the graph
      comp.keySet should not contain 3L
      frames.labels.filter($"node" === 3L).count() shouldBe 0L
      // before batch 2 the families were SEPARATE communities: re-check
      // against the batch build at the b0+b1 prefix (A-side holds 1,2,9;
      // B-side holds 5,6)
      val prefix = batchFrames(b0 ++ b1)
      val pcomp = prefix.components.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      pcomp(9L) shouldBe 1L
      pcomp(5L) shouldBe 5L
    }

    it("a replayed batch is exactly-once: artifact unchanged") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sdix-retry").toString
      val idxDir = s"$dir/idx"
      StreamingDedupIndex.processBatch(b0.toDF("doc_id", "text"), 0L, idxDir)
      StreamingDedupIndex.processBatch(b1.toDF("doc_id", "text"), 1L, idxDir)
      val before = StreamingDedupIndex.readIndex(spark, idxDir)
      // snapshot BEFORE the replay: a frame read pre-rewrite pins the old
      // file listing, so post-replay evaluation of it would be invalid
      val snap = (rowSet(before.pairs), rowSet(before.labels), rowSet(before.components))
      val beforeCount = before.pairs.count()
      // crash-after-commit retry replays batch 1 with identical contents
      StreamingDedupIndex.processBatch(b1.toDF("doc_id", "text"), 1L, idxDir)
      val after = StreamingDedupIndex.readIndex(spark, idxDir)
      (rowSet(after.pairs), rowSet(after.labels), rowSet(after.components)) shouldBe snap
      // and the underlying pair partition holds exactly one copy
      after.pairs.count() shouldBe beforeCount
    }

    it("a tombstone batch SPLITS bridged components: post-delete == batch build over survivors") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sdix-del").toString
      val idxDir = s"$dir/idx"
      Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
        StreamingDedupIndex.processBatch(b.toDF("doc_id", "text"), i.toLong, idxDir)
      }
      // forgetting both hybrid bridges must split the merged A∪B component
      // back into the two families — the case the star certificate cannot
      // express and the touched-component rebuild exists for
      StreamingDedupIndex.processDeletes(Seq(9L, 10L).toDF("doc_id"), 3L, idxDir)
      assertEqualsBatch(idxDir, b0)
      val comp = StreamingDedupIndex.readIndex(spark, idxDir).components
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      comp(1L) shouldBe 1L; comp(2L) shouldBe 1L
      comp(5L) shouldBe 5L; comp(6L) shouldBe 5L
      comp.keySet.intersect(Set(9L, 10L)) shouldBe Set.empty
      // signature rows are physically gone too (right-to-be-forgotten)
      spark.read.parquet(s"$idxDir/signatures")
        .filter($"doc_id".isin(9L, 10L)).count() shouldBe 0L

      // a pair-less doc's takedown touches only its signature row
      StreamingDedupIndex.processDeletes(Seq(3L).toDF("doc_id"), 4L, idxDir)
      assertEqualsBatch(idxDir, b0.filterNot(_._1 == 3L))
      spark.read.parquet(s"$idxDir/signatures")
        .filter($"doc_id" === 3L).count() shouldBe 0L

      // replay of the takedown batch: exactly-once
      StreamingDedupIndex.processDeletes(Seq(3L).toDF("doc_id"), 4L, idxDir)
      assertEqualsBatch(idxDir, b0.filterNot(_._1 == 3L))
    }

    it("primary-tables-only fold: core build == full build's signatures/pairs, forget skips absent derived tables") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sdix-core").toString
      val (coreDir, fullDir) = (s"$dir/core", s"$dir/full")
      Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
        StreamingDedupIndex.processBatchCore(b.toDF("doc_id", "text"), i.toLong, coreDir)
        StreamingDedupIndex.processBatch(b.toDF("doc_id", "text"), i.toLong, fullDir)
      }
      // the primary tables are bit-identical to the full fold's
      rowSet(StreamingDedupIndex.readSignatures(spark, coreDir, Long.MaxValue)) shouldBe
        rowSet(StreamingDedupIndex.readSignatures(spark, fullDir, Long.MaxValue))
      rowSet(StreamingDedupIndex.readPairs(spark, coreDir, Long.MaxValue)) shouldBe
        rowSet(StreamingDedupIndex.readPairs(spark, fullDir, Long.MaxValue))
      // and no derived table was ever created
      Seq("components", "labels", "components3").foreach { sub =>
        new java.io.File(s"$coreDir/$sub").exists() shouldBe false
      }
      // forget on the core index scrubs primary tables and must NOT
      // conjure derived directories into existence
      StreamingDedupIndex.processDeletes(Seq(9L, 10L).toDF("doc_id"), 3L, coreDir)
      StreamingDedupIndex.readSignatures(spark, coreDir, Long.MaxValue)
        .filter($"doc_id".isin(9L, 10L)).count() shouldBe 0L
      StreamingDedupIndex.readPairs(spark, coreDir, Long.MaxValue)
        .filter($"doc_a".isin(9L, 10L) || $"doc_b".isin(9L, 10L))
        .count() shouldBe 0L
      Seq("components", "labels", "components3").foreach { sub =>
        new java.io.File(s"$coreDir/$sub").exists() shouldBe false
      }
      // the scrubbed core pairs equal the full fold's post-forget pairs
      StreamingDedupIndex.processDeletes(Seq(9L, 10L).toDF("doc_id"), 3L, fullDir)
      rowSet(StreamingDedupIndex.readPairs(spark, coreDir, Long.MaxValue)) shouldBe
        rowSet(StreamingDedupIndex.readPairs(spark, fullDir, Long.MaxValue))
    }

    it("a mixed CDC batch (takedown + upsert in one micro-batch) == batch build over the merged corpus") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sdix-cdc").toString
      val idxDir = s"$dir/idx"
      Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
        StreamingDedupIndex.processBatch(b.toDF("doc_id", "text"), i.toLong, idxDir)
      }
      // one batch: forget bridge 9, ingest doc 11 (an A-family near-dup)
      val cdc = Seq((9L, "", true), (11L, mut(baseA, 1), false))
        .toDF("doc_id", "text", "is_delete")
      StreamingDedupIndex.processCdcBatch(cdc, 3L, idxDir)
      StreamingDedupIndex.processCdcBatch(cdc, 3L, idxDir) // crash-retry
      assertEqualsBatch(idxDir, (b0 ++ b2) :+ (11L -> mut(baseA, 1)))
    }

    it("versioned publish: stream-maintained bucketed artifact == batch build at every commit point, atomic cutover, exactly-once replay") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-sdix-vp").toString
      val (idxDir, ckpt, root) = (s"$dir/idx", s"$dir/ckpt", s"$dir/serve")
      val prefix = "graft_sdixvp"
      val mem = MemoryStream[(Long, String)]
      val q = StreamingDedupIndex.startVersioned(
        mem.toDS().toDF("doc_id", "text"), idxDir, ckpt, root, prefix)
      try {
        var seen = Seq.empty[(Long, String)]
        Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
          mem.addData(b: _*)
          q.processAllAvailable()
          seen = seen ++ b
          // commit point i: the ACTIVE version is this batch, and its
          // content equals the batch DedupIndex build over full history
          DedupIndex.activeVersion(spark, root) shouldBe Some(i.toLong)
          val served = DedupIndex.readActive(spark, root, prefix)
          val ref = batchFrames(seen)
          rowSet(served.pairs) shouldBe rowSet(ref.pairs)
          rowSet(served.labels) shouldBe rowSet(ref.labels)
          rowSet(served.components) shouldBe rowSet(ref.components)
          rowSet(served.components3) shouldBe rowSet(ref.components3)
        }
      } finally q.stop()

      // the published layout really is bucketed: the survivorship-report
      // join shape ships no Exchange on either artifact side
      val f = DedupIndex.readActive(spark, root, prefix)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = f.pairs.join(
          f.components3.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
        val plan = joined.queryExecution.executedPlan.toString
        plan should include("SortMergeJoin")
        plan should not include "Exchange"
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

      // a replayed publish of the same version is exactly-once: same
      // active version, same content
      val before = rowSet(DedupIndex.readActive(spark, root, prefix).pairs)
      StreamingDedupIndex.publishVersion(spark, idxDir, root, 2L, prefix)
      DedupIndex.activeVersion(spark, root) shouldBe Some(2L)
      rowSet(DedupIndex.readActive(spark, root, prefix).pairs) shouldBe before
    }

    it("a report served from the streamed index matches the inline derivation") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sdix-serve").toString
      val idxDir = s"$dir/idx"
      val all = b0 ++ b1 ++ b2
      Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
        StreamingDedupIndex.processBatch(b.toDF("doc_id", "text"), i.toLong, idxDir)
      }
      val frames = StreamingDedupIndex.readIndex(spark, idxDir)
      val served = Graph.modularityReportFrom(
        frames.pairs.withColumnRenamed("est_jaccard", "weight"), frames.labels)
      val inline = Graph.modularityReport(
        Dedup.minhashLshPairs(all.toDF("doc_id", "text"))
          .withColumnRenamed("est_jaccard", "weight"))
      rowSet(served) shouldBe rowSet(inline)
    }
  }
}

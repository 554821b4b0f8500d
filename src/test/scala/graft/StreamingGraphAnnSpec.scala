package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.VectorOps
import graft.streaming.{StreamingAnnIngest, StreamingGraphAnn}

/** The navigable-graph tier's ingest + forget story: the streamed
  * proximity graph EQUALS the batch `graphEdges` over everything ingested
  * at every micro-batch (deterministic incrementality via the
  * touched-cell invariant — a node's list depends only on its probe
  * cells' membership), replays are exactly-once, a tombstone removes the
  * node as src AND dst with the survivors' graph equal to a batch
  * rebuild, and serving through `graphTopKFromIndex` over the streamed
  * artifacts equals the batch traversal.
  */
class StreamingGraphAnnSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  // the GraphAnnSpec angular geometry, split across batches so lists of
  // EXISTING nodes must change when later batches land (node 3's top-M
  // gains bridge node 4 only in batch 1; cluster-1 arrivals in batch 2
  // touch the bridge's cells again)
  private def vec(theta: Double): Seq[Float] =
    Seq(math.cos(theta).toFloat, math.sin(theta).toFloat)
  private val b0: Seq[(Long, Seq[Float], Int)] =
    (0 until 4).map(i => (i.toLong, vec(0.05 * i), 0)) ++
      (14 until 18).map(i => (i.toLong, vec(2.5 + 0.02 * (i - 14)), 2))
  private val b1: Seq[(Long, Seq[Float], Int)] =
    Seq((4L, vec(0.25), 1), (5L, vec(0.35), 1))
  private val b2: Seq[(Long, Seq[Float], Int)] =
    (6 until 14).map(i => (i.toLong, vec(0.45 + 0.05 * (i - 6)), 1))
  private val all = b0 ++ b1 ++ b2

  private def embDf(rows: Seq[(Long, Seq[Float], Int)]): DataFrame =
    rows.toDF("vec_id", "embedding", "label")

  // FIXED quantizer trained on the full corpus (the serving contract:
  // ingest never re-trains) — label-means, as the batch builder uses
  private def cents: DataFrame =
    VectorOps.centroids(embDf(all)).select(col("label").as("cell"), col("centroid"))

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def assertEqualsBatch(graphDir: String, rows: Seq[(Long, Seq[Float], Int)]): Unit =
    rowSet(StreamingGraphAnn.readEdges(spark, graphDir)) shouldBe
      rowSet(VectorOps.graphEdges(embDf(rows), coarse = Some(cents)))

  describe("StreamingGraphAnn") {
    it("maintained graph == batch graphEdges over full history, every batch (existing nodes' lists update)") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-sga").toString
      val (graphDir, ckpt) = (s"$dir/graph", s"$dir/ckpt")
      val mem = MemoryStream[(Long, Seq[Float], Int)]
      val q = StreamingGraphAnn.start(
        mem.toDS().toDF("vec_id", "embedding", "label"), cents, graphDir, ckpt)
      try {
        var seen = Seq.empty[(Long, Seq[Float], Int)]
        Seq(b0, b1, b2).foreach { b =>
          mem.addData(b: _*)
          q.processAllAvailable()
          seen = seen ++ b
          assertEqualsBatch(graphDir, seen)
        }
      } finally q.stop()
      // the incrementality was real: node 3's list after batch 1 contains
      // bridge node 4, which did not exist when node 3 arrived
      StreamingGraphAnn.readEdges(spark, graphDir)
        .filter(col("src") === 3L && col("dst") === 4L).count() shouldBe 1L
    }

    it("a replayed batch is exactly-once: graph unchanged") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sga-retry").toString
      val graphDir = s"$dir/graph"
      StreamingGraphAnn.processBatch(embDf(b0), 0L, cents, graphDir)
      StreamingGraphAnn.processBatch(embDf(b1), 1L, cents, graphDir)
      val snap = rowSet(StreamingGraphAnn.readEdges(spark, graphDir))
      val nPost = StreamingGraphAnn.readPostings(spark, graphDir).count()
      StreamingGraphAnn.processBatch(embDf(b1), 1L, cents, graphDir) // crash-retry
      rowSet(StreamingGraphAnn.readEdges(spark, graphDir)) shouldBe snap
      StreamingGraphAnn.readPostings(spark, graphDir).count() shouldBe nPost
    }

    it("a tombstone removes the node as src AND dst; post-delete == batch rebuild over survivors") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sga-del").toString
      val graphDir = s"$dir/graph"
      Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
        StreamingGraphAnn.processBatch(embDf(b), i.toLong, cents, graphDir)
      }
      // forget bridge node 4 — it sits in other nodes' top-M lists
      StreamingGraphAnn.readEdges(spark, graphDir)
        .filter(col("dst") === 4L).count() should be > 0L
      StreamingGraphAnn.processDeletes(Seq(4L).toDF("vec_id"), cents, graphDir)
      val survivors = all.filterNot(_._1 == 4L)
      assertEqualsBatch(graphDir, survivors)
      val edges = StreamingGraphAnn.readEdges(spark, graphDir)
      edges.filter(col("src") === 4L || col("dst") === 4L).count() shouldBe 0L
      // physically gone from the posting index too
      spark.read.parquet(s"$graphDir/postings")
        .filter(col("vec_id") === 4L).count() shouldBe 0L
      // replay of the takedown: exactly-once
      StreamingGraphAnn.processDeletes(Seq(4L).toDF("vec_id"), cents, graphDir)
      assertEqualsBatch(graphDir, survivors)
    }

    it("forgetting the SOLE primary member of a cell drops its dlists partition (edges via its secondary cell don't survive)") {
      // node 5 (theta 0.35) is the only node whose PRIMARY cell is 1 in
      // the b0+5 corpus; its edges come via its probe-2 SECONDARY cell 0.
      // After the takedown no survivor has primary cell 1, so the
      // postings-derived affected set alone can never reach the dlists
      // pcell=1 partition — the forced-pcells path must drop it.
      val dir = java.nio.file.Files.createTempDirectory("graft-sga-sole").toString
      val graphDir = s"$dir/graph"
      StreamingGraphAnn.processBatch(embDf(b0), 0L, cents, graphDir)
      StreamingGraphAnn.processBatch(embDf(Seq((5L, vec(0.35), 1))), 1L, cents, graphDir)
      // precondition of the regression: node 5 really is sole-primary in
      // its cell, and it has edges in both directions
      val primOf5 = spark.read.parquet(s"$graphDir/postings")
        .filter(col("vec_id") === 5L && col("pr") === 1)
        .select(col("cell")).collect().map(_.getInt(0)).toSeq
      primOf5 should have size 1
      spark.read.parquet(s"$graphDir/postings")
        .filter(col("pr") === 1 && col("cell") === primOf5.head && col("vec_id") =!= 5L)
        .count() shouldBe 0L
      StreamingGraphAnn.readEdges(spark, graphDir)
        .filter(col("src") === 5L).count() should be > 0L
      StreamingGraphAnn.processDeletes(Seq(5L).toDF("vec_id"), cents, graphDir)
      StreamingGraphAnn.readEdges(spark, graphDir)
        .filter(col("src") === 5L || col("dst") === 5L).count() shouldBe 0L
      assertEqualsBatch(graphDir, b0)
      // the partition is physically gone, not just filtered at read
      spark.read.parquet(s"$graphDir/dlists")
        .filter(col("pcell") === primOf5.head).count() shouldBe 0L
    }

    it("a forget crashed between the posting scrub and the rebuild is recovered by the retry") {
      // first attempt scrubs node 4's postings then dies; the retry can
      // no longer derive the touched cells from postings (already
      // scrubbed) — it must re-find the stale partitions from the dlists
      // rows still naming the tombstoned id.
      val dir = java.nio.file.Files.createTempDirectory("graft-sga-crash").toString
      val graphDir = s"$dir/graph"
      Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
        StreamingGraphAnn.processBatch(embDf(b), i.toLong, cents, graphDir)
      }
      StreamingGraphAnn.readEdges(spark, graphDir)
        .filter(col("dst") === 4L).count() should be > 0L
      val dels = Seq(4L).toDF("vec_id")
      // simulate the crash: exactly processDeletes' scrub, then nothing
      graft.streaming.IndexTombstones.scrub(
        spark.read.parquet(s"$graphDir/postings"),
        dels, Seq("vec_id"), s"$graphDir/postings", Seq("cell", "batch_id"))
      spark.read.parquet(s"$graphDir/postings")
        .filter(col("vec_id") === 4L).count() shouldBe 0L
      // the crash left survivors' lists still naming node 4
      StreamingGraphAnn.readEdges(spark, graphDir)
        .filter(col("dst") === 4L).count() should be > 0L
      StreamingGraphAnn.processDeletes(dels, cents, graphDir) // retry
      val survivors = all.filterNot(_._1 == 4L)
      assertEqualsBatch(graphDir, survivors)
      StreamingGraphAnn.readEdges(spark, graphDir)
        .filter(col("src") === 4L || col("dst") === 4L).count() shouldBe 0L
    }

    it("a mixed CDC batch (takedown + upsert in one micro-batch) == batch build over the merged corpus, exactly-once on retry") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sga-cdc").toString
      val graphDir = s"$dir/graph"
      Seq(b0, b1).zipWithIndex.foreach { case (b, i) =>
        StreamingGraphAnn.processBatch(embDf(b), i.toLong, cents, graphDir)
      }
      // one batch: forget bridge 4, ingest the cluster-1 block
      val cdc = embDf(b2).withColumn("is_delete", lit(false))
        .unionByName(embDf(Seq((4L, vec(0.25), 1))).withColumn("is_delete", lit(true)))
      StreamingGraphAnn.processCdcBatch(cdc, 2L, cents, graphDir)
      StreamingGraphAnn.processCdcBatch(cdc, 2L, cents, graphDir) // crash-retry
      assertEqualsBatch(graphDir, (b0 ++ b1 ++ b2).filterNot(_._1 == 4L))
    }

    it("the HNSW upper layer is maintained by the SAME machinery: streamed graph over the layer-1 substream == graph2Layer1Edges") {
      // layer 1 is graphEdges over the hash-sampled subset with the same
      // quantizer — so a second StreamingGraphAnn instance fed the
      // layer-1-filtered stream maintains it incrementally, ingest,
      // forget and all; no new maintainer code.
      val dir = java.nio.file.Files.createTempDirectory("graft-sga-l1").toString
      val graphDir = s"$dir/graph1"
      Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
        val sub = embDf(b).filter(VectorOps.layer1Member(2))
        StreamingGraphAnn.processBatch(sub, i.toLong, cents, graphDir)
      }
      val streamed = rowSet(StreamingGraphAnn.readEdges(spark, graphDir))
      streamed should not be empty // every=2: the upper layer has real edges
      streamed shouldBe
        rowSet(VectorOps.graph2Layer1Edges(embDf(all), coarse = Some(cents), every = 2))
    }

    it("serving from the streamed graph + streamed cell index == the batch traversal") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sga-serve").toString
      val (graphDir, idxDir) = (s"$dir/graph", s"$dir/idx")
      Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
        StreamingGraphAnn.processBatch(embDf(b), i.toLong, cents, graphDir)
        StreamingAnnIngest.processBatch(embDf(b), i.toLong, cents, idxDir)
      }
      val queries = VectorOps.querySet(embDf(all))
      val served = VectorOps.graphTopKFromIndex(
        StreamingGraphAnn.readEdges(spark, graphDir),
        StreamingAnnIngest.readIndex(spark, idxDir),
        queries, cents, k = 6, beam = 8)
      val batch = VectorOps.graphTopKFromIndex(
        VectorOps.graphEdges(embDf(all), coarse = Some(cents)),
        VectorOps.assignCells(embDf(all), cents)
          .select(col("vec_id"), col("cell"), col("v").as("cv"), col("vn").as("cn")),
        queries, cents, k = 6, beam = 8)
      rowSet(served) shouldBe rowSet(batch)
    }

    it("delete-witness fast path: a tombstone in no stored list as dst == batch rebuild over survivors") {
      // degree=1 lists over the angular line: node 13 (theta 0.80, the
      // cluster-1 endpoint) is NOBODY's single nearest neighbor (interior
      // ties break to the smaller id), so no stored list names it as dst —
      // the witness-triaged forget takes the scrub-only branch (no banded
      // recompute) and must still equal the batch rebuild over survivors.
      val dir = java.nio.file.Files.createTempDirectory("graft-sga-wit").toString
      val graphDir = s"$dir/graph"
      Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
        StreamingGraphAnn.processBatch(embDf(b), i.toLong, cents, graphDir, degree = 1)
      }
      // precondition: the branch predicate — 13 appears as src, never dst
      val dl = spark.read.parquet(s"$graphDir/dlists")
      dl.filter(col("dst") === 13L).count() shouldBe 0L
      dl.filter(col("src") === 13L).count() should be > 0L
      StreamingGraphAnn.processDeletes(Seq(13L).toDF("vec_id"), cents, graphDir, degree = 1)
      val survivors = all.filterNot(_._1 == 13L)
      rowSet(StreamingGraphAnn.readEdges(spark, graphDir)) shouldBe
        rowSet(VectorOps.graphEdges(embDf(survivors), degree = 1, coarse = Some(cents)))
      spark.read.parquet(s"$graphDir/postings")
        .filter(col("vec_id") === 13L).count() shouldBe 0L
      // replay: exactly-once (second pass finds no witness AND no src rows)
      StreamingGraphAnn.processDeletes(Seq(13L).toDF("vec_id"), cents, graphDir, degree = 1)
      rowSet(StreamingGraphAnn.readEdges(spark, graphDir)) shouldBe
        rowSet(VectorOps.graphEdges(embDf(survivors), degree = 1, coarse = Some(cents)))
    }

    it("a no-op batch leaks no persisted frames (the empty-pcell early return)") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sga-noop").toString
      val graphDir = s"$dir/graph"
      StreamingGraphAnn.processBatch(embDf(b0), 0L, cents, graphDir)
      val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
      StreamingGraphAnn.processBatch(
        embDf(Seq.empty[(Long, Seq[Float], Int)]), 1L, cents, graphDir)
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
      leaked shouldBe empty
    }
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.ops.{TextOps, VectorOps}
import graft.streaming.{StreamingAnnIngest, StreamingSpannIngest, StreamingTextIngest}

/** Right-to-be-forgotten through the SERVED indexes: a tombstone batch
  * physically removes a key's rows from the accumulated ANN cell index,
  * the inverted text index, and the SPANN posting index — and afterwards
  * every from-index serving path answers EXACTLY as a batch rebuild over
  * the surviving corpus would. Replays are exactly-once (the scrub is
  * idempotent), fully-emptied partitions disappear from disk (no orphan
  * files a right-to-be-forgotten audit could find), and a mixed CDC batch
  * (deletes + upserts in one micro-batch) folds deterministically.
  */
class IndexTombstoneSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  // ---- ANN fixtures (the StreamingAnnIngestSpec geometry) ---------------
  private def vec(axis: Int, eps: Float): Seq[Float] = {
    val v = Array.fill(4)(0.0f); v(axis) = 1.0f; v((axis + 1) % 4) = eps; v.toSeq
  }
  private val batch0 = Seq(
    (1L, vec(0, 0.01f), 0), (2L, vec(0, 0.02f), 0), (3L, vec(1, 0.01f), 1))
  private val batch1 = Seq(
    (10L, vec(0, 0.03f), 0), (11L, vec(1, 0.02f), 1), (12L, vec(1, 0.03f), 1))
  private def embDf(rows: Seq[(Long, Seq[Float], Int)]) =
    rows.toDF("vec_id", "embedding", "label")
  private def quantizer =
    Seq((0, Seq(1.0, 0.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("cell", "centroid")

  private def ranked3(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  describe("StreamingAnnIngest tombstones") {
    it("post-delete index == batch build over survivors; serving follows; replay exactly-once") {
      val dir = java.nio.file.Files.createTempDirectory("graft-tomb-ann").toString
      val indexDir = s"$dir/index"
      StreamingAnnIngest.processBatch(embDf(batch0), 0L, quantizer, indexDir)
      StreamingAnnIngest.processBatch(embDf(batch1), 1L, quantizer, indexDir)

      // forget vec 3 (the ONLY batch-0 vector in cell 1) and vec 10
      StreamingAnnIngest.processDeletes(Seq(3L, 10L).toDF("vec_id"), indexDir)

      val idx = StreamingAnnIngest.readIndex(spark, indexDir)
      val survivors = (batch0 ++ batch1).filterNot(r => Set(3L, 10L)(r._1))
      idx.select("vec_id").collect().map(_.getLong(0)).toSet shouldBe
        survivors.map(_._1).toSet
      // assignments (and payload columns) are the batch job's
      val got = idx.select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      got shouldBe VectorOps.assignCells(embDf(survivors), quantizer)
        .select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      idx.filter(col("bw").isNull || col("mp").isNull).count() shouldBe 0L

      // the fully-emptied partition's directory is GONE from disk —
      // a forgotten row must not survive as an orphan file
      new java.io.File(s"$indexDir/cell=1/batch_id=0").exists() shouldBe false
      new java.io.File(s"$indexDir/cell=0/batch_id=0").exists() shouldBe true

      // serving from the scrubbed index == serving from a batch-built
      // index over the surviving corpus
      val queries = embDf(survivors)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val batchIdx = VectorOps.assignCells(embDf(survivors), quantizer)
        .select(col("vec_id"), col("cell"), col("v").as("cv"), col("vn").as("cn"))
      ranked3(VectorOps.ivfTopKFromIndex(idx, queries, quantizer, k = 2)) shouldBe
        ranked3(VectorOps.ivfTopKFromIndex(batchIdx, queries, quantizer, k = 2))
      // and the forgotten vectors are truly unreachable
      VectorOps.ivfTopKFromIndex(idx, queries, quantizer, k = 6)
        .filter(col("neighbor_id").isin(3L, 10L)).count() shouldBe 0L

      // replay of the tombstone batch: exactly-once (idempotent removal)
      StreamingAnnIngest.processDeletes(Seq(3L, 10L).toDF("vec_id"), indexDir)
      StreamingAnnIngest.readIndex(spark, indexDir).count() shouldBe survivors.size.toLong
    }

    it("deletion-vector tier: logical delete serves immediately, compaction folds it physically") {
      val dir = java.nio.file.Files.createTempDirectory("graft-tomb-dv").toString
      val indexDir = s"$dir/index"
      StreamingAnnIngest.processBatch(embDf(batch0), 0L, quantizer, indexDir)
      StreamingAnnIngest.processBatch(embDf(batch1), 1L, quantizer, indexDir)

      // LOGICAL delete of vec 3 and 10: O(batch) append, no index rewrite
      // (the takedown batch follows the ingests it covers, so its id
      // bounds them: a delete covers rows with batch_id <= del_batch)
      StreamingAnnIngest.appendDeletes(Seq(3L, 10L).toDF("vec_id"), 2L, indexDir)
      val survivors = (batch0 ++ batch1).filterNot(r => Set(3L, 10L)(r._1))
      // live view reflects the delete immediately...
      StreamingAnnIngest.readIndexLive(spark, indexDir)
        .select("vec_id").collect().map(_.getLong(0)).toSet shouldBe
        survivors.map(_._1).toSet
      // ...while the physical rows are still on disk (deferred)
      StreamingAnnIngest.readIndex(spark, indexDir).count() shouldBe 6L
      // serving through the live view == batch over survivors
      val queries = embDf(survivors)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val batchIdx = VectorOps.assignCells(embDf(survivors), quantizer)
        .select(col("vec_id"), col("cell"), col("v").as("cv"), col("vn").as("cn"))
      ranked3(VectorOps.ivfTopKFromIndex(
        StreamingAnnIngest.readIndexLive(spark, indexDir), queries, quantizer, k = 2)) shouldBe
        ranked3(VectorOps.ivfTopKFromIndex(batchIdx, queries, quantizer, k = 2))

      // a replayed logical-delete batch is exactly-once (partition overwrite)
      StreamingAnnIngest.appendDeletes(Seq(3L, 10L).toDF("vec_id"), 2L, indexDir)
      StreamingAnnIngest.readDeletes(spark, indexDir).count() shouldBe 2L

      // COMPACTION folds the vector into the files and truncates it
      StreamingAnnIngest.compactDeletes(spark, indexDir)
      StreamingAnnIngest.readIndex(spark, indexDir)
        .select("vec_id").collect().map(_.getLong(0)).toSet shouldBe
        survivors.map(_._1).toSet
      StreamingAnnIngest.readDeletes(spark, indexDir).count() shouldBe 0L
      new java.io.File(s"$indexDir/_deletes").exists() shouldBe false
      // serving unchanged across the physical fold
      ranked3(VectorOps.ivfTopKFromIndex(
        StreamingAnnIngest.readIndexLive(spark, indexDir), queries, quantizer, k = 2)) shouldBe
        ranked3(VectorOps.ivfTopKFromIndex(batchIdx, queries, quantizer, k = 2))
      // compaction replay: idempotent
      StreamingAnnIngest.compactDeletes(spark, indexDir)
      StreamingAnnIngest.readIndex(spark, indexDir).count() shouldBe 4L
    }

    it("deletion-vector tier: a vec_id re-ingested AFTER its logical delete stays live through compaction") {
      val dir = java.nio.file.Files.createTempDirectory("graft-tomb-dv-re").toString
      val indexDir = s"$dir/index"
      StreamingAnnIngest.processBatch(embDf(batch0), 0L, quantizer, indexDir)
      // logical delete of vec 3 at takedown batch 1...
      StreamingAnnIngest.appendDeletes(Seq(3L).toDF("vec_id"), 1L, indexDir)
      StreamingAnnIngest.readIndexLive(spark, indexDir)
        .filter(col("vec_id") === 3L).count() shouldBe 0L
      // ...then vec 3 re-ingested at batch 2 (new content, same key): the
      // delete is scoped to batch_id <= 1, so the re-insert is LIVE
      StreamingAnnIngest.processBatch(
        embDf(Seq((3L, vec(0, 0.04f), 0))), 2L, quantizer, indexDir)
      StreamingAnnIngest.readIndexLive(spark, indexDir)
        .filter(col("vec_id") === 3L).count() shouldBe 1L
      // compaction scrubs ONLY the covered row (batch 0), not the re-insert
      StreamingAnnIngest.compactDeletes(spark, indexDir)
      val after = StreamingAnnIngest.readIndex(spark, indexDir)
        .filter(col("vec_id") === 3L)
        .select("vec_id", "batch_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      after.toSeq shouldBe Seq((3L, 2L))
      // and the live view agrees post-compaction (vector truncated)
      StreamingAnnIngest.readIndexLive(spark, indexDir)
        .filter(col("vec_id") === 3L).count() shouldBe 1L
    }

    it("a mixed CDC batch folds deletes + upserts deterministically, exactly-once on retry") {
      val dir = java.nio.file.Files.createTempDirectory("graft-tomb-ann-cdc").toString
      val indexDir = s"$dir/index"
      StreamingAnnIngest.processBatch(embDf(batch0), 0L, quantizer, indexDir)
      // batch 1: forget vec 1, ingest vec 20 — one micro-batch
      val cdc = Seq((1L, vec(0, 0.0f), true), (20L, vec(1, 0.04f), false))
        .toDF("vec_id", "embedding", "is_delete")
      StreamingAnnIngest.processCdcBatch(cdc, 1L, quantizer, indexDir)
      StreamingAnnIngest.processCdcBatch(cdc, 1L, quantizer, indexDir) // crash-retry

      val idx = StreamingAnnIngest.readIndex(spark, indexDir)
      idx.select("vec_id").collect().map(_.getLong(0)).toSet shouldBe Set(2L, 3L, 20L)
      idx.count() shouldBe 3L
    }
  }

  describe("StreamingTextIngest tombstones") {
    val b0 = Seq(1L -> "hash join scan table", 2L -> "join join filter")
    val b1 = Seq(3L -> "scan scan hash", 4L -> "window agg")
    val b2 = Seq(5L -> "hash hash join scan scan scan")
    val queries = Seq(1 -> Seq("hash", "join"), 2 -> Seq("scan"))
    def docsDf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    def ranked(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

    it("post-delete serving == inline build over survivors (stats re-derive); emptied partitions vanish") {
      val dir = java.nio.file.Files.createTempDirectory("graft-tomb-text").toString
      Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
        StreamingTextIngest.processBatch(docsDf(b), i.toLong, dir)
      }
      // forget docs 1 and 4; then the WHOLE of batch 1 (3 and 4) so its
      // partition empties in all three subtables
      StreamingTextIngest.processDeletes(Seq(1L, 4L).toDF("doc_id"), dir)
      StreamingTextIngest.processDeletes(Seq(3L).toDF("doc_id"), dir)

      val survivors = docsDf(Seq(b0(1), b2.head)) // docs 2, 5
      val p = StreamingTextIngest.readPostings(spark, dir)
      val d = StreamingTextIngest.readDoclens(spark, dir)
      d.count() shouldBe 2L
      // BM25 / QL / RRF all see post-delete df + corpus stats (derived at
      // read time — no stale-stats window)
      ranked(TextOps.bm25TopKFromIndex(p, d, queries)) shouldBe
        ranked(TextOps.bm25TopK(survivors, queries))
      ranked(TextOps.qlTopKFromIndex(p, d, queries)) shouldBe
        ranked(TextOps.qlTopK(survivors, queries))
      ranked(TextOps.rrfFusionFromIndex(p, d, queries)) shouldBe
        ranked(TextOps.rrfFusion(survivors, queries))
      ranked(TextOps.bm25TopKFromIndex(p, d, queries)).nonEmpty shouldBe true
      // positions follow (phrase search over the scrubbed table)
      val phrases = Seq(1 -> "hash join")
      TextOps.phraseSearch(StreamingTextIngest.readPositions(spark, dir), phrases)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toSet shouldBe
        TextOps.phraseSearch(TextOps.positionalIndexOf(survivors), phrases)
          .collect().map(r => r.getLong(1) -> r.getLong(2)).toSet
      // batch 1 emptied out entirely — its partitions are gone on disk
      Seq("postings", "doclens", "positions").foreach { sub =>
        new java.io.File(s"$dir/$sub/batch_id=1").exists() shouldBe false
      }

      // replay: idempotent
      val before = ranked(TextOps.bm25TopKFromIndex(p, d, queries))
      StreamingTextIngest.processDeletes(Seq(1L, 3L, 4L).toDF("doc_id"), dir)
      ranked(TextOps.bm25TopKFromIndex(
        StreamingTextIngest.readPostings(spark, dir),
        StreamingTextIngest.readDoclens(spark, dir), queries)) shouldBe before
    }

    it("a mixed CDC batch (delete doc 2, ingest doc 6) == inline over the merged corpus") {
      val dir = java.nio.file.Files.createTempDirectory("graft-tomb-text-cdc").toString
      StreamingTextIngest.processBatch(docsDf(b0), 0L, dir)
      val cdc = Seq((2L, "", true), (6L, "join scan probe", false))
        .toDF("doc_id", "text", "is_delete")
      StreamingTextIngest.processCdcBatch(cdc, 1L, dir)
      StreamingTextIngest.processCdcBatch(cdc, 1L, dir) // crash-retry

      val survivors = docsDf(Seq(b0.head, 6L -> "join scan probe"))
      ranked(TextOps.bm25TopKFromIndex(
        StreamingTextIngest.readPostings(spark, dir),
        StreamingTextIngest.readDoclens(spark, dir), queries)) shouldBe
        ranked(TextOps.bm25TopK(survivors, queries))
      StreamingTextIngest.readDoclens(spark, dir).count() shouldBe 2L
    }
  }

  describe("StreamingChunkDedup tombstones") {
    it("forgetting a document removes its chunk signatures; served pairs == batch over survivors") {
      import graft.streaming.StreamingChunkDedup
      import graft.ops.Dedup
      val passage = (1 to 64).map(i => s"pp$i").mkString(" ")
      val d1 = passage + " " + (1 to 40).map(i => s"ua$i").mkString(" ")
      val d2 = (1 to 90).map(i => s"ub$i").mkString(" ")
      val d5 = passage + " " + (1 to 40).map(i => s"uc$i").mkString(" ")
      val dir = java.nio.file.Files.createTempDirectory("graft-tomb-chunk").toString
      StreamingChunkDedup.processBatch(Seq(1L -> d1, 2L -> d2).toDF("doc_id", "text"), 0L, dir)
      StreamingChunkDedup.processBatch(Seq(5L -> d5).toDF("doc_id", "text"), 1L, dir)
      // the copied passage pairs at chunk granularity across docs 1 and 5
      val before = StreamingChunkDedup.crossDocPairsFrom(
        StreamingChunkDedup.readSignatures(spark, dir)).collect()
      before.length should be > 0

      StreamingChunkDedup.processDeletes(Seq(1L).toDF("doc_id"), dir)
      val sig = StreamingChunkDedup.readSignatures(spark, dir)
      sig.filter(expr(s"doc_id DIV ${StreamingChunkDedup.ChunkIdFactor}") === 1L)
        .count() shouldBe 0L
      // served pairs == the batch derivation over the surviving corpus
      def rowSet(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.mkString("|")).toSet
      val survivorSig = Dedup.minhashSignatures(
        StreamingChunkDedup.chunkPseudoDocs(Seq(2L -> d2, 5L -> d5).toDF("doc_id", "text")))
      rowSet(StreamingChunkDedup.crossDocPairsFrom(sig)) shouldBe
        rowSet(StreamingChunkDedup.crossDocPairsFrom(survivorSig))
      // replay: idempotent
      StreamingChunkDedup.processDeletes(Seq(1L).toDF("doc_id"), dir)
      StreamingChunkDedup.readSignatures(spark, dir).count() shouldBe survivorSig.count()
    }
  }

  describe("StreamingDedup tombstones") {
    it("a forgotten document stops shadowing re-submissions of the same text") {
      import graft.streaming.StreamingDedup
      val textX = (1 to 60).map(i => s"xx$i").mkString(" ")
      val textY = (1 to 60).map(i => s"yy$i").mkString(" ")
      val dir = java.nio.file.Files.createTempDirectory("graft-tomb-sd").toString
      val (hist, corpus) = (s"$dir/hist", s"$dir/corpus")
      StreamingDedup.processBatch(
        Seq(1L -> textX, 2L -> textY).toDF("doc_id", "text"), 0L, hist, corpus)
      // the same text under a new id is dropped against history
      StreamingDedup.processBatch(Seq(3L -> textX).toDF("doc_id", "text"), 1L, hist, corpus)
      spark.read.parquet(corpus).filter($"doc_id" === 3L).count() shouldBe 0L

      // right-to-be-forgotten: doc 1 leaves BOTH sinks...
      StreamingDedup.processDeletes(Seq(1L).toDF("doc_id"), hist, corpus)
      spark.read.parquet(corpus).filter($"doc_id" === 1L).count() shouldBe 0L
      StreamingDedup.readHistory(spark, hist).filter($"doc_id" === 1L).count() shouldBe 0L
      // ...so the index no longer REMEMBERS the content: a later
      // re-submission survives instead of being dropped against a ghost
      StreamingDedup.processBatch(Seq(4L -> textX).toDF("doc_id", "text"), 2L, hist, corpus)
      spark.read.parquet(corpus).filter($"doc_id" === 4L).count() shouldBe 1L
      // replay of the takedown: exactly-once
      StreamingDedup.processDeletes(Seq(1L).toDF("doc_id"), hist, corpus)
      spark.read.parquet(corpus).select("doc_id").collect()
        .map(_.getLong(0)).toSet shouldBe Set(2L, 4L)
    }
  }

  describe("StreamingSpannIngest tombstones") {
    it("every posting of a forgotten vector disappears; serving == inline over survivors") {
      val dim = VectorOps.EmbeddingDim
      def corpus(n: Int): Seq[(Long, Seq[Float], Int)] =
        (0 until n).map { i =>
          val theta =
            if (i == 100) math.Pi / 6 - 0.002
            else if (i == 200) math.Pi / 6 + 0.002
            else (i.toDouble / n) * (math.Pi / 3)
          val v = Seq.tabulate(dim) {
            case 0 => math.cos(theta).toFloat
            case 1 => math.sin(theta).toFloat
            case _ => 0.0f
          }
          (i.toLong, v, if (theta < math.Pi / 6) 0 else 1)
        }
      val all = corpus(300)
      val emb = all.toDF("vec_id", "embedding", "label")
      val coarse = VectorOps.centroids(emb)
        .select(col("label").as("cell"), col("centroid"))
      val dir = java.nio.file.Files.createTempDirectory("graft-tomb-spann").toString
      val idxDir = s"$dir/idx"
      val (h0, h1) = all.splitAt(150)
      StreamingSpannIngest.processBatch(all.take(150).toDF("vec_id", "embedding", "label"), 0L, coarse, idxDir)
      StreamingSpannIngest.processBatch(h1.toDF("vec_id", "embedding", "label"), 1L, coarse, idxDir)

      // vec 100 sits ON the Voronoi edge — closure-replicated into both
      // cells; the scrub must find both postings through the vec_id key
      StreamingSpannIngest.readIndex(spark, idxDir)
        .filter(col("vec_id") === 100L).count() should be > 1L
      StreamingSpannIngest.processDeletes(Seq(100L, 200L).toDF("vec_id"), idxDir)
      val idx = StreamingSpannIngest.readIndex(spark, idxDir)
      idx.filter(col("vec_id").isin(100L, 200L)).count() shouldBe 0L

      val survivors = all.filterNot(r => Set(100L, 200L)(r._1))
      val sEmb = survivors.toDF("vec_id", "embedding", "label")
      val served = VectorOps.spannTopKFromIndex(
        idx.drop("batch_id"), VectorOps.querySet(sEmb), coarse)
      val inline = VectorOps.spannTopK(sEmb)
      served.collect().map(_.mkString("|")).toSet shouldBe
        inline.collect().map(_.mkString("|")).toSet

      // replay: idempotent
      val n = idx.count()
      StreamingSpannIngest.processDeletes(Seq(100L, 200L).toDF("vec_id"), idxDir)
      StreamingSpannIngest.readIndex(spark, idxDir).count() shouldBe n
      (h0.nonEmpty && h1.nonEmpty) shouldBe true
    }
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.VectorOps
import graft.streaming.StreamingAnnIngest

/** The streaming IVF-index maintenance loop end to end: micro-batches land
  * in the cell-partitioned index with the same assignments a batch job
  * would compute, a replayed batch leaves exactly one copy, and serving
  * top-k from the accumulated index matches the one-shot batch IVF over
  * the same corpus.
  */
class StreamingAnnIngestSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  // two tight clusters on coordinate axes in 4-dim space, ids disjoint
  private def vec(axis: Int, eps: Float): Seq[Float] = {
    val v = Array.fill(4)(0.0f); v(axis) = 1.0f; v((axis + 1) % 4) = eps; v.toSeq
  }
  private val batch0 = Seq(
    (1L, vec(0, 0.01f), 0), (2L, vec(0, 0.02f), 0), (3L, vec(1, 0.01f), 1))
  private val batch1 = Seq(
    (10L, vec(0, 0.03f), 0), (11L, vec(1, 0.02f), 1), (12L, vec(1, 0.03f), 1))

  private def embDf(rows: Seq[(Long, Seq[Float], Int)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }
  // fixed quantizer: the two axis unit vectors as cells 0 and 1
  private def quantizer = {
    import spark.implicits._
    Seq((0, Seq(1.0, 0.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("cell", "centroid")
  }

  describe("StreamingAnnIngest") {
    it("accumulates batch assignments into a cell-partitioned index over a real stream") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-sann").toString
      val (indexDir, ckptDir) = (s"$dir/index", s"$dir/ckpt")

      val mem = MemoryStream[(Long, Seq[Float], Int)]
      val q = StreamingAnnIngest.start(
        mem.toDS().toDF("vec_id", "embedding", "label"), quantizer, indexDir, ckptDir)
      try {
        mem.addData(batch0: _*)
        q.processAllAvailable()
        mem.addData(batch1: _*)
        q.processAllAvailable()
      } finally q.stop()

      val idx = StreamingAnnIngest.readIndex(spark, indexDir)
      // every vector present exactly once, in the cell a batch job assigns
      val got = idx.select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val expect = VectorOps.assignCells(embDf(batch0 ++ batch1), quantizer)
        .select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      idx.count() shouldBe 6
      got shouldBe expect
      // the on-disk layout is cell-first hive partitions (probe pruning)
      new java.io.File(indexDir).listFiles().map(_.getName)
        .filter(_.startsWith("cell=")).toSet shouldBe Set("cell=0", "cell=1")
    }

    it("a replayed batch is exactly-once and serving matches batch IVF") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sann-retry").toString
      val indexDir = s"$dir/index"
      StreamingAnnIngest.processBatch(embDf(batch0), 0L, quantizer, indexDir)
      StreamingAnnIngest.processBatch(embDf(batch1), 1L, quantizer, indexDir)
      // crash-after-commit retry: replay batch 1 verbatim
      StreamingAnnIngest.processBatch(embDf(batch1), 1L, quantizer, indexDir)

      val idx = StreamingAnnIngest.readIndex(spark, indexDir)
      idx.count() shouldBe 6 // no duplicates from the replay
      idx.select("vec_id").distinct().count() shouldBe 6

      // serving from the streamed index ≡ one-shot batch IVF on the corpus
      val corpus = embDf(batch0 ++ batch1)
      val queries = corpus.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      def ranked(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val served = ranked(VectorOps.ivfTopKFromIndex(idx, queries, quantizer, k = 2))
      // batch twin: assign + probe the same corpus directly
      val batchIdx = VectorOps.assignCells(corpus, quantizer)
        .select(col("vec_id"), col("cell"), col("v").as("cv"), col("vn").as("cn"))
      val batch = ranked(VectorOps.ivfTopKFromIndex(batchIdx, queries, quantizer, k = 2))
      served shouldBe batch
      served.nonEmpty shouldBe true

      // the index also carries the int8 payload: two-stage re-rank serving
      // from the streamed index ≡ the same stages over a batch-built
      // quantized index (shared rerankStages code, same data)
      val batchQIdx = VectorOps.assignCells(corpus, quantizer)
        .select(col("vec_id"), col("cell"), col("v").as("cv"), col("vn").as("cn"),
          (lit(127.0) / array_max(transform(col("v"), x => abs(x)))).as("s"))
        .select(col("vec_id"), col("cell"), col("cv"), col("cn"), col("s"),
          transform(col("cv"), x => round(x * col("s")).cast("double")).as("q"))
      val servedRr = ranked(VectorOps.ivfRerankTopKFromIndex(
        idx, queries, quantizer, k = 2, rerankK = 3))
      val batchRr = ranked(VectorOps.ivfRerankTopKFromIndex(
        batchQIdx, queries, quantizer, k = 2, rerankK = 3))
      servedRr shouldBe batchRr
      servedRr.nonEmpty shouldBe true
    }

    it("stores the MRL prefix payload; funnel serving from the streamed index matches batch") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sann-mrl").toString
      val indexDir = s"$dir/index"
      // dim-4 vectors → prefixDim 2 exercises a real (strict) prefix
      StreamingAnnIngest.processBatch(embDf(batch0), 0L, quantizer, indexDir, prefixDim = 2)
      StreamingAnnIngest.processBatch(embDf(batch1), 1L, quantizer, indexDir, prefixDim = 2)
      // crash-after-commit retry stays exactly-once with the prefix columns
      StreamingAnnIngest.processBatch(embDf(batch1), 1L, quantizer, indexDir, prefixDim = 2)

      val idx = StreamingAnnIngest.readIndex(spark, indexDir)
      idx.count() shouldBe 6
      idx.filter(col("mp").isNull).count() shouldBe 0
      // the stored prefix is a strict slice (scan-bandwidth tier contract)
      idx.selectExpr("max(size(mp))").collect()(0).getInt(0) shouldBe 2

      val corpus = embDf(batch0 ++ batch1)
      val queries = corpus.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      def ranked(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val served = ranked(VectorOps.mrlIvfTopKFromIndex(
        idx, queries, quantizer, k = 2, prefixDim = 2, shortlist = 3))
      // batch twin: same assignment + same prefix slice, no stream between
      val batchIdx = VectorOps.assignCells(corpus, quantizer)
        .select(col("vec_id"), col("cell"), col("v").as("cv"), col("vn").as("cn"),
          slice(col("v"), 1, 2).as("mp"))
        .withColumn("mpn", sqrt(graft.functions.ArrayDotProduct.dot(col("mp"), col("mp"))))
      val batch = ranked(VectorOps.mrlIvfTopKFromIndex(
        batchIdx, queries, quantizer, k = 2, prefixDim = 2, shortlist = 3))
      served shouldBe batch
      served.nonEmpty shouldBe true
    }

    it("stores the packed sign word; 1-bit serving from the streamed index is exact here") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sann-bq").toString
      val indexDir = s"$dir/index"
      StreamingAnnIngest.processBatch(embDf(batch0), 0L, quantizer, indexDir)
      StreamingAnnIngest.processBatch(embDf(batch1), 1L, quantizer, indexDir)
      val idx = StreamingAnnIngest.readIndex(spark, indexDir)
      idx.filter(col("bw").isNull).count() shouldBe 0L
      // vec 1 = (1, 0.01, 0, 0): positive components at dims 1-2 → word 3
      idx.filter(col("vec_id") === 1L).select("bw").collect()(0).getLong(0) shouldBe 3L

      // with a shortlist covering the whole probed cell, the 1-bit funnel
      // must return EXACTLY the full-precision IVF answer (stage 2 is the
      // same exact cosine; stage 1 can only have pruned, and didn't)
      val corpus = embDf(batch0 ++ batch1)
      val queries = corpus.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      def ranked(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val bq = ranked(VectorOps.bqIvfTopKFromIndex(
        idx, queries, quantizer, k = 2, shortlist = 10, nprobe = 1, dim = 4))
      val exact = ranked(VectorOps.ivfTopKFromIndex(idx, queries, quantizer, k = 2, nprobe = 1))
      bq shouldBe exact
      bq.nonEmpty shouldBe true
    }

    it("ingests PQ codes against a fixed codebook; compressed serving matches batch") {
      // 2 subspaces × 2 codewords over dim 4 — a hand-built FIXED book
      // (the ingest contract: codebooks train once offline, like cells)
      val book = graft.functions.PqBook(Seq(
        0 -> Array(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0)),
        1 -> Array(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0))), subDim = 2)
      val dir = java.nio.file.Files.createTempDirectory("graft-sann-pq").toString
      val indexDir = s"$dir/index"
      StreamingAnnIngest.processBatch(embDf(batch0), 0L, quantizer, indexDir, Some(book))
      StreamingAnnIngest.processBatch(embDf(batch1), 1L, quantizer, indexDir, Some(book))
      // crash-after-commit retry stays exactly-once with the codes column
      StreamingAnnIngest.processBatch(embDf(batch1), 1L, quantizer, indexDir, Some(book))

      val idx = StreamingAnnIngest.readIndex(spark, indexDir)
      idx.count() shouldBe 6
      idx.filter(col("codes").isNull).count() shouldBe 0

      val corpus = embDf(batch0 ++ batch1)
      val queries = corpus.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      def ranked(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val served = ranked(VectorOps.ivfPqTopKFromIndex(
        idx, queries, quantizer, book, k = 2))
      // batch twin: same assignment + same encode, no stream in between
      val batchIdx = VectorOps.assignCells(corpus, quantizer)
        .select(col("vec_id"), col("cell"), col("vn").as("cn"),
          graft.functions.PqEncodeCodes.encode(col("v"), book).as("codes"))
      val batch = ranked(VectorOps.ivfPqTopKFromIndex(
        batchIdx, queries, quantizer, book, k = 2))
      served shouldBe batch
      served.nonEmpty shouldBe true
    }
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.VectorOps
import graft.streaming.StreamingSpannIngest

/** The SPANN posting-index ingest loop: postings accumulate per
  * micro-batch against the fixed quantizer, queries served FROM the
  * streamed index equal the inline closure-assigned serving over
  * everything ingested, and a replayed batch leaves exactly one copy of
  * its postings.
  */
class StreamingSpannIngestSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private val dim = VectorOps.EmbeddingDim

  // the SpannSpec angular corpus: two label clusters on [0°, 60°] with
  // query ids pinned onto the 30° Voronoi edge
  private def corpus(n: Int): Seq[(Long, Seq[Float], Int)] =
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

  private def toDf(rows: Seq[(Long, Seq[Float], Int)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  it("streamed posting index serves == inline SPANN over everything ingested") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = corpus(300)
    val emb = toDf(all)
    // FIXED quantizer trained on the full corpus (the serving contract:
    // ingest never re-trains)
    val coarse = VectorOps.centroids(emb)
      .select(col("label").as("cell"), col("centroid"))
    val dir = java.nio.file.Files.createTempDirectory("graft-sspann").toString
    val (idxDir, ckpt) = (s"$dir/idx", s"$dir/ckpt")
    val mem = MemoryStream[(Long, Seq[Float], Int)]
    val q = StreamingSpannIngest.start(
      mem.toDS().toDF("vec_id", "embedding", "label"), coarse, idxDir, ckpt)
    try {
      all.grouped(120).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val served = VectorOps.spannTopKFromIndex(
      StreamingSpannIngest.readIndex(spark, idxDir).drop("batch_id"),
      VectorOps.querySet(emb), coarse)
    rowSet(served) shouldBe rowSet(VectorOps.spannTopK(emb))
    // the replicas are present: postings exceed the corpus row count
    StreamingSpannIngest.readIndex(spark, idxDir).count() should be > 300L
  }

  it("a replayed batch is exactly-once: postings unchanged") {
    val all = corpus(200)
    val emb = toDf(all)
    val coarse = VectorOps.centroids(emb)
      .select(col("label").as("cell"), col("centroid"))
    val dir = java.nio.file.Files.createTempDirectory("graft-sspann-retry").toString
    val idxDir = s"$dir/idx"
    val (b0, b1) = all.splitAt(120)
    StreamingSpannIngest.processBatch(toDf(b0), 0L, coarse, idxDir)
    StreamingSpannIngest.processBatch(toDf(b1), 1L, coarse, idxDir)
    val once = StreamingSpannIngest.readIndex(spark, idxDir).count()
    StreamingSpannIngest.processBatch(toDf(b1), 1L, coarse, idxDir)
    StreamingSpannIngest.readIndex(spark, idxDir).count() shouldBe once
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Sampling
import graft.streaming.StreamingReservoir

/** The streamed weighted reservoir: after every micro-batch the
  * maintained sample equals the batch A-Res operator over everything
  * streamed so far (the mergeability property), a re-delivered document
  * cannot double its candidacy, and a crash-retry refolds exactly-once.
  */
class StreamingReservoirSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "text", "source")

  // varied-quality texts: distinct tokens (high TTR) vs repeated tokens
  private def text(i: Long): String =
    if (i % 3 == 0) Seq.fill(40)("rep").mkString(" ")
    else (1 to 40).map(j => s"t$i-$j").mkString(" ")

  private def batch(ids: Seq[Long]) =
    ids.map(i => (i, text(i), s"src${i % 2}"))

  private val b0 = batch(1L to 12L)
  private val b1 = batch(13L to 24L)
  private val b2 = batch(25L to 40L)

  private def stateSet(dir: String): Set[(String, Int, Long)] =
    StreamingReservoir.readReservoir(spark, dir, Long.MaxValue)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

  private def batchRef(rows: Seq[(Long, String, String)], k: Int): Set[(String, Int, Long)] =
    Sampling.weightedReservoirPerSource(docsDf(rows), k)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

  it("maintained reservoir == batch A-Res over the full history, every batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sres").toString
    val (stateDir, ckpt) = (s"$dir/state", s"$dir/ckpt")
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingReservoir.start(
      mem.toDS().toDF("doc_id", "text", "source"), stateDir, ckpt, k = 5)
    try {
      var seen = Seq.empty[(Long, String, String)]
      Seq(b0, b1, b2).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        stateSet(stateDir) shouldBe batchRef(seen, 5)
      }
      // the reservoir is FULL and bounded: exactly k per source
      stateSet(stateDir).groupBy(_._1).values.foreach(_.size shouldBe 5)
    } finally q.stop()
  }

  it("a re-delivered document folds once; a replayed batch is exactly-once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sres-retry").toString
    StreamingReservoir.processBatch(docsDf(b0), 0L, dir, k = 5)
    // batch 1 re-delivers three of batch 0's docs verbatim
    StreamingReservoir.processBatch(docsDf(b1 ++ b0.take(3)), 1L, dir, k = 5)
    val once = stateSet(dir)
    once shouldBe batchRef(b0 ++ b1, 5) // duplicates did not double-count
    StreamingReservoir.processBatch(docsDf(b1 ++ b0.take(3)), 1L, dir, k = 5) // crash-retry
    stateSet(dir) shouldBe once
  }

  it("cold start needs no seeded state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sres-cold").toString
    StreamingReservoir.readReservoir(spark, s"$dir/none", Long.MaxValue).count() shouldBe 0L
  }
}

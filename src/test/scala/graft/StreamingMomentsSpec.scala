package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Sketches
import graft.streaming.StreamingMoments

/** Incremental moment maintenance: the streamed fold is EXACTLY the batch
  * recomputation (decimal sums), replay is exactly-once, and cold start
  * needs no seed.
  */
class StreamingMomentsSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private def evDf(rows: Seq[(String, Long, Double)]) =
    rows.map { case (k, ms, v) => (k, new java.sql.Timestamp(ms), v) }
      .toDF("event_type", "ts", "value")

  private def batchRows(seed: Int, n: Int): Seq[(String, Long, Double)] = {
    val rng = new scala.util.Random(seed)
    (1 to n).map { i =>
      (s"k${i % 3}", 1700000000000L + (seed * 1000 + i) * 3600000L,
        math.rint(rng.nextDouble() * 10000) / 100.0)
    }
  }

  private def rollupRows(df: org.apache.spark.sql.DataFrame) =
    Sketches.momentsRollup(df).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap

  it("the streamed fold equals the batch recomputation bit for bit") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-smom").toString
    val (stateDir, ckpt) = (s"$dir/state", s"$dir/ckpt")
    val mem = MemoryStream[(String, java.sql.Timestamp, Double)]
    val q = StreamingMoments.start(
      mem.toDS().toDF("event_type", "ts", "value"), stateDir, ckpt)
    val batches = Seq(batchRows(1, 40), batchRows(2, 55), batchRows(3, 25))
    try {
      batches.foreach { b =>
        mem.addData(b.map { case (k, ms, v) => (k, new java.sql.Timestamp(ms), v) }: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = rollupRows(
      StreamingMoments.readPartials(spark, stateDir, Long.MaxValue))
    val direct = rollupRows(Sketches.momentPartials(evDf(batches.flatten)))
    streamed shouldBe direct
  }

  it("a replayed batch is exactly-once: power sums are not double-counted") {
    val dir = java.nio.file.Files.createTempDirectory("graft-smom-retry").toString
    val b0 = evDf(batchRows(1, 30))
    val b1 = evDf(batchRows(2, 20))
    StreamingMoments.processBatch(b0, 0L, dir)
    StreamingMoments.processBatch(b1, 1L, dir)
    val first = StreamingMoments.readPartials(spark, dir, Long.MaxValue)
      .collect().map(_.toSeq).toSet
    StreamingMoments.processBatch(b1, 1L, dir) // crash-retry
    StreamingMoments.readPartials(spark, dir, Long.MaxValue)
      .collect().map(_.toSeq).toSet shouldBe first
    first.toSeq.map(_(2).asInstanceOf[Long]).sum shouldBe 50L // not 70
  }

  it("cold start needs no pre-seeded state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-smom-cold").toString
    StreamingMoments.readPartials(spark, dir, Long.MaxValue).count() shouldBe 0L
    StreamingMoments.processBatch(evDf(batchRows(5, 10)), 0L, dir)
    StreamingMoments.readPartials(spark, dir, Long.MaxValue)
      .agg(sum(col("n"))).head().getLong(0) shouldBe 10L
  }
}

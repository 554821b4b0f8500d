package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Sketches
import graft.streaming.StreamingHll

/** Incremental HLL maintenance: the streamed fold estimates exactly like
  * a one-pass sketch of the full history, replay is exactly-once for the
  * event counts, and cold start needs no seed.
  */
class StreamingHllSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private def evDf(rows: Seq[(String, Long, Long)]) =
    rows.map { case (t, ms, u) => (t, new java.sql.Timestamp(ms), u) }
      .toDF("event_type", "ts", "user_id")

  private def batchRows(seed: Int, n: Int): Seq[(String, Long, Long)] = {
    val rng = new scala.util.Random(seed)
    (1 to n).map { i =>
      (s"k${i % 2}", 1700000000000L + (seed * 1000 + i) * 3600000L,
        rng.nextInt(500).toLong)
    }
  }

  private def rollup(df: org.apache.spark.sql.DataFrame) =
    Sketches.hllRollup(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  it("the streamed fold estimates exactly like the one-pass batch sketch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-shll").toString
    val (stateDir, ckpt) = (s"$dir/state", s"$dir/ckpt")
    val mem = MemoryStream[(String, java.sql.Timestamp, Long)]
    val q = StreamingHll.start(
      mem.toDS().toDF("event_type", "ts", "user_id"), stateDir, ckpt)
    val batches = Seq(batchRows(1, 150), batchRows(2, 200), batchRows(3, 80))
    try {
      batches.foreach { b =>
        mem.addData(b.map { case (t, ms, u) => (t, new java.sql.Timestamp(ms), u) }: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = rollup(StreamingHll.readPartials(spark, stateDir, Long.MaxValue))
    val direct = rollup(Sketches.hllPartials(evDf(batches.flatten)))
    // same days merged, identical estimates (register-wise max is exact
    // under refolding), exact event counts
    streamed.keySet shouldBe direct.keySet
    streamed.foreach { case (k, (_, est)) => est shouldBe direct(k)._2 }
    val total = StreamingHll.readPartials(spark, stateDir, Long.MaxValue)
      .agg(sum(col("n_events"))).head().getLong(0)
    total shouldBe batches.flatten.size.toLong
  }

  it("a replayed batch is exactly-once: event counts are not double-counted") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shll-retry").toString
    StreamingHll.processBatch(evDf(batchRows(1, 60)), 0L, dir)
    StreamingHll.processBatch(evDf(batchRows(2, 40)), 1L, dir)
    val first = StreamingHll.readPartials(spark, dir, Long.MaxValue)
      .agg(sum(col("n_events"))).head().getLong(0)
    first shouldBe 100L
    StreamingHll.processBatch(evDf(batchRows(2, 40)), 1L, dir) // crash-retry
    StreamingHll.readPartials(spark, dir, Long.MaxValue)
      .agg(sum(col("n_events"))).head().getLong(0) shouldBe 100L
  }

  it("cold start needs no pre-seeded state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shll-cold").toString
    StreamingHll.readPartials(spark, dir, Long.MaxValue).count() shouldBe 0L
    StreamingHll.processBatch(evDf(batchRows(5, 10)), 0L, dir)
    rollup(StreamingHll.readPartials(spark, dir, Long.MaxValue)).nonEmpty shouldBe true
  }
}

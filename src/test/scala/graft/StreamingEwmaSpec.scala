package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.TimeSeries
import graft.streaming.StreamingEwma

/** The maintained smoothed baseline: after every micro-batch — including
  * one delivering LATE events into hours that already passed — the EWMA
  * served from the maintained count grid equals the batch operator over
  * every event ever streamed; a replayed batch is exactly-once.
  */
class StreamingEwmaSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private val base = 1700000000000L

  private def events(rows: Seq[(String, Int)]) = // (type, hour index)
    rows.map { case (t, k) => (t, new java.sql.Timestamp(base + k * 3600000L)) }
      .toDF("event_type", "ts")

  private def series(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  // b0: hours 0-2 of clicks + hour 0 of views; b1 extends to hours 3-4;
  // b2 delivers LATE clicks into hour 1 (already two batches old) plus
  // fresh hour 5 — the late rows must re-smooth hours 1..5 exactly
  private val b0 = Seq(("click", 0), ("click", 0), ("click", 1), ("click", 2), ("view", 0))
  private val b1 = Seq(("click", 3), ("click", 4), ("view", 2))
  private val b2 = Seq(("click", 1), ("click", 1), ("click", 5))

  describe("StreamingEwma") {
    it("served EWMA == batch operator over full history, every batch (late events exact)") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-sewma").toString
      val (stateDir, ckpt) = (s"$dir/state", s"$dir/ckpt")
      val mem = MemoryStream[(String, java.sql.Timestamp)]
      val q = StreamingEwma.start(
        mem.toDS().toDF("event_type", "ts"), stateDir, ckpt)
      try {
        var seen = Seq.empty[(String, Int)]
        Seq(b0, b1, b2).foreach { b =>
          val rows = b.map { case (t, k) =>
            (t, new java.sql.Timestamp(base + k * 3600000L)) }
          mem.addData(rows: _*)
          q.processAllAvailable()
          seen = seen ++ b
          series(StreamingEwma.serveEwma(spark, stateDir)) shouldBe
            series(TimeSeries.ewmaHourly(events(seen)))
        }
      } finally q.stop()
    }

    it("seasonal decomposition served from the maintained hourly counts == batch") {
      // span 3 weeks of daily structure so full centered windows exist
      val b0 = (0 until 10).flatMap(day =>
        Seq.fill((day % 7) + 1)(("click", day * 24)))
      val b1 = (10 until 21).flatMap(day =>
        Seq.fill((day % 7) + 1)(("click", day * 24)))
      val dir = java.nio.file.Files.createTempDirectory("graft-sewma-sd").toString
      val stateDir = s"$dir/state"
      StreamingEwma.processBatch(events(b0), 0L, stateDir)
      StreamingEwma.processBatch(events(b1), 1L, stateDir)
      val served = TimeSeries.seasonalDowFromHourly(
        StreamingEwma.readCounts(spark, stateDir, Long.MaxValue))
      series(served) shouldBe series(TimeSeries.seasonalDow(events(b0 ++ b1)))
      served.count() should be > 0L
    }

    it("a replayed batch is exactly-once: counts not double-folded") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sewma-retry").toString
      val stateDir = s"$dir/state"
      StreamingEwma.processBatch(events(b0), 0L, stateDir)
      StreamingEwma.processBatch(events(b1), 1L, stateDir)
      val snap = series(StreamingEwma.readCounts(spark, stateDir, Long.MaxValue))
      StreamingEwma.processBatch(events(b1), 1L, stateDir)
      series(StreamingEwma.readCounts(spark, stateDir, Long.MaxValue)) shouldBe snap
    }
  }
}

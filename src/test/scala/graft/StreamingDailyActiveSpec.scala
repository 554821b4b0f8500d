package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.TimeSeries
import graft.streaming.StreamingDailyActive

/** The maintained growth report: after every micro-batch — including one
  * delivering LATE events that move a user's first-seen day BACKWARDS —
  * the active/new/returning report served from the maintained census
  * equals the batch operator over every event ever streamed; a replayed
  * batch is exactly-once.
  */
class StreamingDailyActiveSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private val day0 = 19600L

  private def events(rows: Seq[(Long, Long)]) = // (user, day index)
    rows.map { case (u, k) =>
      (u, new java.sql.Timestamp((day0 + k) * 86400000L)) }
      .toDF("user_id", "ts")

  private def series(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  // b0: days 0-1, users 1-2; b1: day 2 brings user 3 (new) + 1 (returning);
  // b2: a LATE event lands user 3 on day 0 — user 3's first-seen day moves
  // BACKWARDS, so day 2's previously-published n_new must drop by one and
  // day 0's must rise: the case a maintain-the-report fold cannot express
  private val b0 = Seq((1L, 0L), (2L, 0L), (1L, 1L))
  private val b1 = Seq((3L, 2L), (1L, 2L))
  private val b2 = Seq((3L, 0L))

  describe("StreamingDailyActive") {
    it("served report == batch operator over full history, every batch (late first-seen exact)") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-sdan").toString
      val (stateDir, ckpt) = (s"$dir/state", s"$dir/ckpt")
      val mem = MemoryStream[(Long, java.sql.Timestamp)]
      val q = StreamingDailyActive.start(
        mem.toDS().toDF("user_id", "ts"), stateDir, ckpt)
      try {
        var seen = Seq.empty[(Long, Long)]
        Seq(b0, b1, b2).foreach { b =>
          val rows = b.map { case (u, k) =>
            (u, new java.sql.Timestamp((day0 + k) * 86400000L)) }
          mem.addData(rows: _*)
          q.processAllAvailable()
          seen = seen ++ b
          series(StreamingDailyActive.serveReport(spark, stateDir)) shouldBe
            series(TimeSeries.dailyActiveNew(events(seen)))
        }
      } finally q.stop()
      // the backward move, explicitly: after b2 user 3 is NEW on day 0
      // (n_new there = 3) and merely returning on day 2 (n_new = 0)
      val got = StreamingDailyActive.serveReport(spark, stateDir).collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
      got(day0) shouldBe 3L
      got(day0 + 2) shouldBe 0L
    }

    it("a replayed batch is exactly-once: counts not double-folded") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sdan-retry").toString
      val stateDir = s"$dir/state"
      StreamingDailyActive.processBatch(events(b0), 0L, stateDir)
      StreamingDailyActive.processBatch(events(b1), 1L, stateDir)
      val once = series(StreamingDailyActive.serveReport(spark, stateDir))
      StreamingDailyActive.processBatch(events(b1), 1L, stateDir) // crash-retry
      series(StreamingDailyActive.serveReport(spark, stateDir)) shouldBe once
    }

    it("cold start serves empty without a seeded census") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sdan-cold").toString
      StreamingDailyActive.serveReport(spark, s"$dir/state").count() shouldBe 0L
    }
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.TimeSeries
import graft.streaming.StreamingCusum

/** The streamed CUSUM scan: after every micro-batch the maintained
  * per-user report equals the batch operator over everything streamed —
  * including excursions that START in one batch and ALARM in a later one
  * (the cross-boundary prefix state) — and a replayed batch is
  * exactly-once.
  */
class StreamingCusumSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)

  private def evDf(rows: Seq[(Long, java.sql.Timestamp, Long, Double)]) =
    rows.toDF("user_id", "ts", "event_id", "value")

  // user 1: a slow upward drift (12/step vs c_up=12 exactly neutral, then
  // 14/step) whose alarm only fires once LATER batches extend the
  // excursion; user 2 joins mid-stream and alarms downward within its
  // first two batches
  private val b0 = Seq(
    (1L, t(1), 101L, 14.0), (1L, t(2), 102L, 14.0), (1L, t(3), 103L, 14.0))
  private val b1 = Seq(
    (1L, t(4), 104L, 14.0), (1L, t(5), 105L, 14.0),
    (2L, t(4), 201L, 10.0), (2L, t(5), 202L, 4.0))
  private val b2 = Seq(
    (1L, t(6), 106L, 14.0), (1L, t(7), 107L, 14.0), (1L, t(8), 108L, 14.0),
    (2L, t(6), 203L, 4.0), (2L, t(7), 204L, 4.0), (2L, t(8), 205L, 4.0))

  private def reportSet(dir: String): Set[(Long, Long, Long, Long, Double, Double)] =
    StreamingCusum.report(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSet

  private def batchRef(rows: Seq[(Long, java.sql.Timestamp, Long, Double)]) =
    TimeSeries.cusumChangepoints(evDf(rows),
        target = "10.00", slack = "2.00", threshold = "5.00")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSet

  it("maintained report == batch operator over the full history, every batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-scusum").toString
    val (stateDir, ckpt) = (s"$dir/state", s"$dir/ckpt")
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val q = StreamingCusum.start(
      mem.toDS().toDF("user_id", "ts", "event_id", "value"), stateDir, ckpt,
      target = "10.00", slack = "2.00", threshold = "5.00")
    try {
      var seen = Seq.empty[(Long, java.sql.Timestamp, Long, Double)]
      Seq(b0, b1, b2).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        reportSet(stateDir) shouldBe batchRef(seen)
      }
      // the cross-boundary behavior, explicitly: user 1 gains +2 S+ per
      // event (value 14 vs c_up 12) — the >5 alarm fires from event 3
      // (S+ = 6) and keeps firing through batches 1 and 2 entirely off
      // the carried (p, i, min-prefix) state
      val r = reportSet(stateDir).find(_._1 == 1L).get
      r._3 shouldBe 6L // events 3..8 all alarm
      r._5 shouldBe 16.0 // peak S+ = 8 events x 2
    } finally q.stop()
  }

  it("a replayed batch is exactly-once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scusum-retry").toString
    StreamingCusum.processBatch(evDf(b0), 0L, dir,
      target = "10.00", slack = "2.00", threshold = "5.00")
    StreamingCusum.processBatch(evDf(b1), 1L, dir,
      target = "10.00", slack = "2.00", threshold = "5.00")
    val once = reportSet(dir)
    StreamingCusum.processBatch(evDf(b1), 1L, dir,
      target = "10.00", slack = "2.00", threshold = "5.00") // crash-retry
    reportSet(dir) shouldBe once
    reportSet(dir) shouldBe batchRef(b0 ++ b1)
  }
}

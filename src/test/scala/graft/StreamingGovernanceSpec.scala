package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

import graft.ops.{Cdc, Privacy}
import graft.streaming.StreamingGovernance

/** Incrementally-maintained k-anonymity / l-diversity: after every
  * micro-batch (inserts, a class-moving update, deletes emptying a class)
  * the maintained class view equals Privacy.classStats over the latest
  * snapshot, the rolled-up reports equal the batch audits, and a replayed
  * batch is exactly-once.
  */
class StreamingGovernanceSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private def ts(d: String) = Timestamp.valueOf(s"$d 10:00:00")

  // change feed: event_id k, version v, ts, user_id, event_type, value, tombstone
  private type Chg = (Long, Long, Timestamp, Long, String, Double, Boolean)
  private def feed(rows: Seq[Chg]) =
    rows.toDF("event_id", "v", "ts", "user_id", "event_type", "value", "is_delete")

  // day 2024-01-01, bucket 0 (value<10) and bucket 1 (10..20)
  private val b0: Seq[Chg] = Seq(
    (1L, 1L, ts("2024-01-01"), 100L, "click", 5.0, false),
    (2L, 1L, ts("2024-01-01"), 100L, "click", 6.0, false), // same class+user: homogeneity
    (3L, 1L, ts("2024-01-01"), 101L, "click", 15.0, false),
    (4L, 1L, ts("2024-01-01"), 102L, "view", 5.0, false))
  // event 1 moves class (bucket 0 → 1) AND user; event 4 dies → its class empties
  private val b1: Seq[Chg] = Seq(
    (1L, 2L, ts("2024-01-01"), 103L, "click", 12.0, false),
    (4L, 2L, ts("2024-01-01"), 102L, "view", 0.0, true))
  // event 2 resurrect-updates in place; a brand-new class appears
  private val b2: Seq[Chg] = Seq(
    (2L, 2L, ts("2024-01-02"), 104L, "click", 7.0, false),
    (5L, 1L, ts("2024-01-02"), 105L, "purchase", 3.0, false))

  private def viewSet(viewDir: String): Set[String] =
    StreamingGovernance.readClassView(spark, viewDir, Long.MaxValue)
      .collect().map(_.mkString("|")).toSet

  private def snapshotOf(seen: Seq[Chg]) =
    Cdc.latestWins(feed(seen), Seq("event_id"), Seq("v"), "is_delete")

  describe("StreamingGovernance") {
    it("class view == classStats(latest snapshot) after every batch; reports match the batch audits") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-sgov").toString
      val (snapDir, viewDir, ckptDir) = (s"$dir/snap", s"$dir/view", s"$dir/ckpt")
      val mem = MemoryStream[Chg]
      val q = StreamingGovernance.start(
        mem.toDS().toDF("event_id", "v", "ts", "user_id", "event_type", "value", "is_delete"),
        snapDir, viewDir, ckptDir, Seq("event_id"), Seq("v"), "is_delete")
      try {
        var seen = Seq.empty[Chg]
        Seq(b0, b1, b2).foreach { b =>
          mem.addData(b: _*)
          q.processAllAvailable()
          seen = seen ++ b
          val expected = Privacy.classStats(snapshotOf(seen))
            .collect().map(_.mkString("|")).toSet
          viewSet(viewDir) shouldBe expected
          // both audits served from the maintained view equal the batch
          // audits over the snapshot
          val view = StreamingGovernance.readClassView(spark, viewDir, Long.MaxValue)
          Privacy.kAnonymityReportFromClasses(view)
            .collect().map(_.mkString("|")).toSet shouldBe
            Privacy.kAnonymityReport(snapshotOf(seen))
              .collect().map(_.mkString("|")).toSet
          Privacy.lDiversityReportFromClasses(view)
            .collect().map(_.mkString("|")).toSet shouldBe
            Privacy.lDiversityReport(snapshotOf(seen))
              .collect().map(_.mkString("|")).toSet
        }
        // the planted shapes actually happened: after b1 the view class
        // (view, day1, b0) is gone (tombstone emptied it) and click's
        // bucket-1 class now holds events 1 and 3
        val v = StreamingGovernance.readClassView(spark, viewDir, Long.MaxValue)
          .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)) ->
            ((r.getLong(3), r.getLong(4)))).toMap
        v.keySet should not contain (("view", "2024-01-01", 0L))
        v(("click", "2024-01-01", 1L)) shouldBe ((2L, 2L)) // events 1 (moved) + 3
      } finally q.stop()
    }

    it("a replayed batch refolds identically (exactly-once)") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sgov-retry").toString
      val (snapDir, viewDir) = (s"$dir/snap", s"$dir/view")
      StreamingGovernance.processBatch(feed(b0), 0L, snapDir, viewDir,
        Seq("event_id"), Seq("v"), "is_delete")
      StreamingGovernance.processBatch(feed(b1), 1L, snapDir, viewDir,
        Seq("event_id"), Seq("v"), "is_delete")
      val once = viewSet(viewDir)
      StreamingGovernance.processBatch(feed(b1), 1L, snapDir, viewDir,
        Seq("event_id"), Seq("v"), "is_delete")
      viewSet(viewDir) shouldBe once
      once shouldBe Privacy.classStats(snapshotOf(b0 ++ b1))
        .collect().map(_.mkString("|")).toSet
    }
  }

  describe("t-closeness maintenance (processBatchWithTCloseness)") {
    it("census view == classUserCounts(latest snapshot) after every batch; audit matches") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sgov-tc").toString
      val (snapDir, viewDir, cuDir) = (s"$dir/snap", s"$dir/view", s"$dir/cu")
      var seen = Seq.empty[Chg]
      Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
        StreamingGovernance.processBatchWithTCloseness(
          feed(b), i.toLong, snapDir, viewDir, cuDir,
          Seq("event_id"), Seq("v"), "is_delete")
        seen = seen ++ b
        val snap = snapshotOf(seen)
        StreamingGovernance.readCuView(spark, cuDir, Long.MaxValue)
          .collect().map(_.mkString("|")).toSet shouldBe
          Privacy.classUserCounts(snap).collect().map(_.mkString("|")).toSet
        StreamingGovernance.serveTCloseness(spark, cuDir)
          .collect().map(_.mkString("|")).toSet shouldBe
          Privacy.tClosenessReport(snap).collect().map(_.mkString("|")).toSet
        // the class view advanced in the same fold
        viewSet(viewDir) shouldBe
          Privacy.classStats(snap).collect().map(_.mkString("|")).toSet
      }
      // replay: a crash-after-commit retry leaves every view unchanged
      val cuSnap = StreamingGovernance.readCuView(spark, cuDir, Long.MaxValue)
        .collect().map(_.mkString("|")).toSet
      StreamingGovernance.processBatchWithTCloseness(
        feed(b2), 2L, snapDir, viewDir, cuDir, Seq("event_id"), Seq("v"), "is_delete")
      StreamingGovernance.readCuView(spark, cuDir, Long.MaxValue)
        .collect().map(_.mkString("|")).toSet shouldBe cuSnap
    }
  }
}

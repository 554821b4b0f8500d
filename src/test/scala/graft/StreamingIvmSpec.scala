package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.StructType

import graft.ops.Cdc
import graft.streaming.{StreamingCdc, StreamingIvm}

/** The incrementally-maintained aggregate view: after every micro-batch
  * (upserts, group moves, deletes, delete-then-resurrect) the view equals
  * a from-scratch reaggregation of the latest snapshot; a replayed batch
  * is exactly-once; cold start needs no seed.
  */
class StreamingIvmSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  // change feed: key k, version v, group g, value, tombstone
  private def feed(rows: Seq[(Long, Long, String, Double, Boolean)]) =
    rows.toDF("k", "v", "g", "value", "is_delete")

  private def viewSet(dir: String): Set[(String, Long, BigDecimal)] =
    StreamingIvm.readView(spark, dir, Long.MaxValue)
      .collect().map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDecimal(2)))).toSet

  private def recompute(rows: Seq[(Long, Long, String, Double, Boolean)]) =
    StreamingIvm.aggregateSnapshot(
      Cdc.latestWins(feed(rows), Seq("k"), Seq("v"), "is_delete"), "g", "value")
      .collect().map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDecimal(2)))).toSet

  // b1 moves key 1 from group a to b (retraction across groups), deletes
  // key 2; b2 resurrects key 2 in group c and deletes key 3, emptying
  // group b entirely (the zero-count group must vanish from the view)
  private val b0 = Seq((1L, 1L, "a", 10.25, false), (2L, 1L, "a", 5.50, false),
    (3L, 1L, "b", 2.00, false))
  private val b1 = Seq((1L, 2L, "b", 7.75, false), (2L, 2L, "a", 0.0, true))
  private val b2 = Seq((2L, 3L, "c", 1.25, false), (3L, 3L, "b", 0.0, true),
    (1L, 3L, "b", 0.0, true))

  private def run(batches: Seq[Seq[(Long, Long, String, Double, Boolean)]],
      check: (String, Seq[(Long, Long, String, Double, Boolean)]) => Unit): Unit = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sivm").toString
    val (snapDir, viewDir, ckptDir) = (s"$dir/snap", s"$dir/view", s"$dir/ckpt")
    val mem = MemoryStream[(Long, Long, String, Double, Boolean)]
    val q = StreamingIvm.start(
      mem.toDS().toDF("k", "v", "g", "value", "is_delete"),
      snapDir, viewDir, ckptDir, Seq("k"), Seq("v"), "is_delete", "g", "value")
    try {
      var seen = Seq.empty[(Long, Long, String, Double, Boolean)]
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        check(viewDir, seen)
      }
    } finally q.stop()
  }

  describe("StreamingIvm") {
    it("view == from-scratch reaggregation after every micro-batch") {
      run(Seq(b0, b1, b2), (viewDir, seen) => viewSet(viewDir) shouldBe recompute(seen))
    }

    it("zero-count groups disappear exactly like in the recompute") {
      // after b1 group a is empty (k1 moved to b, k2 deleted); after b2
      // group b empties too (k1, k3 deleted) and only c remains
      run(Seq(b0, b1, b2), (viewDir, seen) =>
        seen.size match {
          case n if n == b0.size => viewSet(viewDir).map(_._1) shouldBe Set("a", "b")
          case n if n == (b0 ++ b1).size => viewSet(viewDir).map(_._1) shouldBe Set("b")
          case _ => viewSet(viewDir).map(_._1) shouldBe Set("c")
        })
    }

    it("min/max view: deleting the extremum reveals the runner-up (the non-invertible case)") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-sivm-mm").toString
      val (snapDir, viewDir, ckptDir) = (s"$dir/snap", s"$dir/view", s"$dir/ckpt")
      def mmView(): Map[String, (Long, BigDecimal, BigDecimal)] =
        StreamingIvm.readMinMaxView(spark, viewDir, Long.MaxValue)
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), BigDecimal(r.getDecimal(2)), BigDecimal(r.getDecimal(3))))).toMap
      def mmRecompute(rows: Seq[(Long, Long, String, Double, Boolean)]) =
        StreamingIvm.aggregateSnapshotMinMax(
          Cdc.latestWins(feed(rows), Seq("k"), Seq("v"), "is_delete"), "g", "value")
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), BigDecimal(r.getDecimal(2)), BigDecimal(r.getDecimal(3))))).toMap

      val mem = MemoryStream[(Long, Long, String, Double, Boolean)]
      val q = StreamingIvm.startMinMax(
        mem.toDS().toDF("k", "v", "g", "value", "is_delete"),
        snapDir, viewDir, ckptDir, Seq("k"), Seq("v"), "is_delete", "g", "value")
      try {
        var seen = Seq.empty[(Long, Long, String, Double, Boolean)]
        // m0: group a holds max 10.25 (k1) and min 5.50 (k2), group b k3
        // m1: DELETE k1 — a's max must fall back to 5.50, which no delta
        //     fold can know; move k3 a→... no: update k3's value in b
        // m2: stale out-of-order replay for k2 (v=0) must change nothing
        val m0 = b0
        val m1 = Seq((1L, 2L, "a", 0.0, true), (3L, 2L, "b", 9.00, false))
        val m2 = Seq((2L, 0L, "a", 999.99, false))
        Seq(m0, m1, m2).foreach { b =>
          mem.addData(b: _*)
          q.processAllAvailable()
          seen = seen ++ b
          mmView() shouldBe mmRecompute(seen)
        }
        // the headline assertions, explicitly
        mmView()("a") shouldBe ((1L, BigDecimal("5.50"), BigDecimal("5.50")))
        mmView()("b") shouldBe ((1L, BigDecimal("9.00"), BigDecimal("9.00")))
      } finally q.stop()
    }

    it("min/max view: group moves and emptied groups, exactly-once on retry") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sivm-mm-retry").toString
      val (snapDir, viewDir) = (s"$dir/snap", s"$dir/view")
      def pb(rows: Seq[(Long, Long, String, Double, Boolean)], id: Long): Unit =
        StreamingIvm.processBatchMinMax(feed(rows), id, snapDir, viewDir,
          Seq("k"), Seq("v"), "is_delete", "g", "value")
      def mm(): Map[String, (Long, BigDecimal, BigDecimal)] =
        StreamingIvm.readMinMaxView(spark, viewDir, Long.MaxValue)
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), BigDecimal(r.getDecimal(2)), BigDecimal(r.getDecimal(3))))).toMap
      pb(b0, 0L); pb(b1, 1L) // k1 moves a→b, k2 dies: group a EMPTIES
      mm().keySet shouldBe Set("b")
      mm()("b") shouldBe ((2L, BigDecimal("2.00"), BigDecimal("7.75")))
      val once = mm()
      pb(b1, 1L) // crash-retry refolds identical inputs
      mm() shouldBe once
    }

    it("a replayed batch is exactly-once for both view and snapshot") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sivm-retry").toString
      val (snapDir, viewDir) = (s"$dir/snap", s"$dir/view")
      def pb(rows: Seq[(Long, Long, String, Double, Boolean)], id: Long): Unit =
        StreamingIvm.processBatch(feed(rows), id, snapDir, viewDir,
          Seq("k"), Seq("v"), "is_delete", "g", "value")
      pb(b0, 0L); pb(b1, 1L)
      val once = viewSet(viewDir)
      pb(b1, 1L) // crash-retry
      viewSet(viewDir) shouldBe once
      viewSet(viewDir) shouldBe recompute(b0 ++ b1)
      val snapSchema = StructType(feed(b0).schema.filterNot(_.name == "is_delete"))
      StreamingCdc.latestSnapshot(spark, snapDir, snapSchema, Long.MaxValue)
        .count() shouldBe 2L // keys 1 and 3
    }

    it("out-of-order batches (stale upsert, stale tombstone) cannot diverge the view") {
      // b1 advances key 1 to v=5 (group b); the next batch replays STALE
      // changes: an old upsert for key 1 (v=2, group c) and an old
      // tombstone for key 3 (v=0). The snapshot ignores both
      // (version-wise latest wins), so the view must too — the retract/add
      // fold has to reconcile against the snapshot, not trust the batch.
      val late = Seq((1L, 2L, "c", 99.0, false), (3L, 0L, "b", 0.0, true))
      run(Seq(b0, Seq((1L, 5L, "b", 7.75, false)), late),
        (viewDir, seen) => viewSet(viewDir) shouldBe recompute(seen))
    }

    it("cold start needs no pre-seeded state") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sivm-cold").toString
      StreamingIvm.readView(spark, s"$dir/view", Long.MaxValue).count() shouldBe 0L
      StreamingIvm.processBatch(feed(b0), 0L, s"$dir/snap", s"$dir/view",
        Seq("k"), Seq("v"), "is_delete", "g", "value")
      viewSet(s"$dir/view") shouldBe recompute(b0)
    }
  }
}

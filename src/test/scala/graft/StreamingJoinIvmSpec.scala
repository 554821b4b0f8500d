package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Cdc
import graft.streaming.StreamingJoinIvm

/** The incrementally-maintained JOIN view: after every micro-batch of
  * fact changes (upserts, foreign-key moves, deletes, out-of-order
  * stragglers, dangling foreign keys) the view equals a from-scratch
  * reaggregation of latest-snapshot ⋈ dimension; a replayed batch is
  * exactly-once.
  */
class StreamingJoinIvmSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  // dimension: region per warehouse id (static, broadcast per batch)
  private def dim = Seq((10L, "east"), (20L, "west"), (30L, "south"))
    .toDF("dk", "region")

  // fact change feed: key k, version v, foreign key fk, value, tombstone
  private def feed(rows: Seq[(Long, Long, Long, Double, Boolean)]) =
    rows.toDF("k", "v", "fk", "value", "is_delete")

  private def viewSet(dir: String): Set[(String, Long, BigDecimal)] =
    graft.streaming.StreamingIvm.readView(spark, dir, Long.MaxValue)
      .collect().map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDecimal(2)))).toSet

  private def recompute(rows: Seq[(Long, Long, Long, Double, Boolean)]) =
    StreamingJoinIvm.aggregateJoined(
      Cdc.latestWins(feed(rows), Seq("k"), Seq("v"), "is_delete"),
      dim, "fk", "dk", "region", "value")
      .collect().map(r => (r.getString(0), r.getLong(1),
        BigDecimal(r.getDecimal(2)))).toSet

  // b0 seeds east (k1, k2) and west (k3), plus k4 with a DANGLING fk
  // (no dim row — contributes nothing); b1 moves k1 east→west (cross-
  // group retraction through the dim join), deletes k2 (east empties);
  // b2 is OUT OF ORDER for k3 (version 1 < 2 — must not regress the
  // view), resurrects k2 in south, repoints the dangling k4 onto a real
  // dim row
  private val b0 = Seq((1L, 1L, 10L, 10.25, false), (2L, 1L, 10L, 5.50, false),
    (3L, 2L, 20L, 2.00, false), (4L, 1L, 99L, 8.00, false))
  private val b1 = Seq((1L, 2L, 20L, 7.75, false), (2L, 2L, 10L, 0.0, true))
  private val b2 = Seq((3L, 1L, 30L, 99.99, false), (2L, 3L, 30L, 1.25, false),
    (4L, 2L, 30L, 8.00, false))

  describe("StreamingJoinIvm") {
    it("join view == from-scratch snapshot-join reaggregation after every batch") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-sjivm").toString
      val (snapDir, viewDir, ckptDir) = (s"$dir/snap", s"$dir/view", s"$dir/ckpt")
      val mem = MemoryStream[(Long, Long, Long, Double, Boolean)]
      val q = StreamingJoinIvm.start(
        mem.toDS().toDF("k", "v", "fk", "value", "is_delete"),
        snapDir, viewDir, ckptDir, Seq("k"), Seq("v"), "is_delete",
        dim, "fk", "dk", "region", "value")
      try {
        var seen = Seq.empty[(Long, Long, Long, Double, Boolean)]
        Seq(b0, b1, b2).foreach { b =>
          mem.addData(b: _*)
          q.processAllAvailable()
          seen = seen ++ b
          viewSet(viewDir) shouldBe recompute(seen)
        }
        // the planted shapes actually exercised what they claim:
        val end = viewSet(viewDir).map(v => v._1 -> (v._2, v._3)).toMap
        end should not contain key("east")            // east emptied
        end("west") shouldBe ((2L, BigDecimal("9.75")))  // k1 moved + k3 kept v2
        end("south") shouldBe ((2L, BigDecimal("9.25"))) // k2 resurrected + k4 repointed
      } finally q.stop()
    }

    it("a replayed batch is exactly-once: view unchanged") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sjivm-retry").toString
      val (snapDir, viewDir) = (s"$dir/snap", s"$dir/view")
      def fold(rows: Seq[(Long, Long, Long, Double, Boolean)], id: Long): Unit =
        StreamingJoinIvm.processBatch(feed(rows), id, snapDir, viewDir,
          Seq("k"), Seq("v"), "is_delete", dim, "fk", "dk", "region", "value")
      fold(b0, 0L); fold(b1, 1L)
      val snap = viewSet(viewDir)
      fold(b1, 1L) // crash-after-commit retry, identical contents
      viewSet(viewDir) shouldBe snap
    }
  }
}

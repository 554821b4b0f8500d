package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.ops.ActivityOps

/** Property-style tests for the windowed aggregation math (SURVEY §5's
  * richer test plan): totals conservation, window membership, and
  * partitioning invariance — the property that matters at 1000 executors.
  * (Seeded random trials; the scalatest/scalacheck bridge artifact is not
  * in the offline cache, so trials are hand-rolled.)
  */
class WindowPropertySpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def randomRows(rng: scala.util.Random): List[(String, Long)] =
    List.fill(1 + rng.nextInt(200)) {
      (s"u${rng.nextInt(3)}", 1692921600000L + rng.nextLong(3600000L))
    }

  describe("windowedCount properties") {
    it("conserves totals and brackets every event in exactly one window") {
      val rng = new scala.util.Random(42)
      for (_ <- 1 to 8) {
        import spark.implicits._
        val rows = randomRows(rng)
        val df = rows.toDF("user_id", "ms")
          .select(col("user_id"), timestamp_millis(col("ms")).as("ts"))
        val agg = ActivityOps.windowedCount(df, "ts", Seq("user_id"), "1 minute")
          .collect()
        agg.map(_.getAs[Long]("count")).sum shouldBe rows.size
        agg.foreach { r =>
          val start = r.getAs[java.sql.Timestamp]("window_start").getTime
          val end = r.getAs[java.sql.Timestamp]("window_end").getTime
          end - start shouldBe 60000L
          start % 60000L shouldBe 0L
        }
        val keys = agg.map(r => (r.getString(0), r.get(1)))
        keys.distinct.length shouldBe keys.length
      }
    }

    it("is invariant to input partitioning") {
      val rng = new scala.util.Random(7)
      for (_ <- 1 to 4) {
        import spark.implicits._
        val rows = randomRows(rng)
        val df = rows.toDF("user_id", "ms")
          .select(col("user_id"), timestamp_millis(col("ms")).as("ts"))
        def result(parts: Int) =
          ActivityOps.windowedCount(df.repartition(parts), "ts", Seq("user_id"), "1 minute")
            .collect().map(r => (r.getString(0), r.get(1).toString, r.getLong(3))).toSet
        result(1) shouldBe result(7)
      }
    }
  }

  describe("saxSimilarPairs") {
    it("pairs users with matching activity shapes and separates the anti-phase one") {
      import spark.implicits._
      def mk(uid: Long, pattern: Int => Double) =
        (0 until 30).flatMap { d =>
          val n = math.max(1, pattern(d).toInt)
          (0 until n).map(i =>
            (uid * 1000 + d * 10 + i, uid,
              new java.sql.Timestamp(
                java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
                  d * 86400000L + i * 1000L),
              pattern(d)))
        }
      // users 1 and 2: identical front-loaded shape (scaled 2x — z-norm
      // must make them distance 0); user 3: anti-phase (back-loaded)
      val front = (d: Int) => if (d < 10) 9.0 else 1.0
      val front2x = (d: Int) => if (d < 10) 18.0 else 2.0
      val back = (d: Int) => if (d < 20) 1.0 else 9.0
      val ev = (mk(1L, front) ++ mk(2L, front2x) ++ mk(3L, back))
        .toDF("event_id", "user_id", "ts", "value")
      val pairs = graft.ops.TimeSeries.saxSimilarPairs(ev).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      pairs.map(p => (p._1, p._2)) should contain(1L -> 2L)
      pairs.find(p => p._1 == 1L && p._2 == 2L).get._3 shouldBe 0.0
      pairs.map(p => (p._1, p._2)) should not contain (1L -> 3L)
      pairs.map(p => (p._1, p._2)) should not contain (2L -> 3L)
    }

    it("saxSimilarTopK emits at most k symmetric neighbors per user, nearest-first") {
      import spark.implicits._
      def mk(uid: Long, pattern: Int => Double) =
        (0 until 30).flatMap { d =>
          val n = math.max(1, pattern(d).toInt)
          (0 until n).map(i =>
            (uid * 1000 + d * 10 + i, uid,
              new java.sql.Timestamp(
                java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
                  d * 86400000L + i * 1000L),
              pattern(d)))
        }
      // three same-shape users (pairwise z-distance 0 -> all candidates of
      // each other) + the anti-phase outsider, so k=1 provably truncates
      val front = (d: Int) => if (d < 10) 9.0 else 1.0
      val front2x = (d: Int) => if (d < 10) 18.0 else 2.0
      val front3x = (d: Int) => if (d < 10) 27.0 else 3.0
      val back = (d: Int) => if (d < 20) 1.0 else 9.0
      val ev = (mk(1L, front) ++ mk(2L, front2x) ++ mk(3L, front3x) ++ mk(9L, back))
        .toDF("event_id", "user_id", "ts", "value")
      val top = graft.ops.TimeSeries.saxSimilarTopK(ev, k = 2).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      // symmetric emission: each of 1/2/3 sees BOTH same-shape peers
      Seq(1L, 2L, 3L).foreach { u =>
        val mine = top.filter(_._1 == u).sortBy(_._2)
        mine.map(_._3).toSet shouldBe (Set(1L, 2L, 3L) - u)
        mine.foreach(_._4 shouldBe 0.0) // z-norm collapses the scalings
        mine.map(_._2).toSeq shouldBe Seq(1, 2) // dense ranks from 1
      }
      top.filter(_._1 == 9L) shouldBe empty // the outsider has no candidates
      // and the cap truncates deterministically: k=1 keeps the lower id
      val top1 = graft.ops.TimeSeries.saxSimilarTopK(ev, k = 1).collect()
        .map(r => (r.getLong(0), r.getLong(2)))
      top1.toSet shouldBe Set((1L, 2L), (2L, 1L), (3L, 1L))
    }

    it("the occupancy cap skips saturated SAX buckets, the stats account for exactly what it skipped, and cap=∞ reproduces the uncapped serve") {
      import spark.implicits._
      def mk(uid: Long, pattern: Int => Double) =
        (0 until 30).flatMap { d =>
          val n = math.max(1, pattern(d).toInt)
          (0 until n).map(i =>
            (uid * 1000 + d * 10 + i, uid,
              new java.sql.Timestamp(
                java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
                  d * 86400000L + i * 1000L),
              pattern(d)))
        }
      // a 12-user CROWD of the identical front-loaded shape (one saturated
      // word bucket) + a 2-user pair on a distinct shape (a small bucket)
      val front = (d: Int) => if (d < 10) 9.0 else 1.0
      val mid = (d: Int) => if (d >= 10 && d < 20) 9.0 else 1.0
      val ev = ((1L to 12L).flatMap(u => mk(u, front)) ++
        mk(20L, mid) ++ mk(21L, mid))
        .toDF("event_id", "user_id", "ts", "value")
      // cap below the crowd: the crowd emits nothing, the small-bucket
      // pair still serves
      val capped = graft.ops.TimeSeries.saxSimilarTopK(ev, k = 3, cap = 8).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      capped shouldBe Set((20L, 21L), (21L, 20L))
      // cap above every occupancy: identical to the uncapped serve
      val unc = graft.ops.TimeSeries.saxSimilarTopK(ev, k = 3, cap = Int.MaxValue)
        .collect().map(_.toSeq).toSet
      graft.ops.TimeSeries.saxSimilarTopK(ev, k = 3, cap = 100)
        .collect().map(_.toSeq).toSet shouldBe unc
      // the audit accounts for exactly the skipped volume
      val stats = graft.ops.TimeSeries.saxBandStats(ev, cap = 8).collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toMap
      stats.keySet shouldBe Set(0, 1)
      stats.values.foreach { case (_, maxOcc, candAll, nOver, candOver) =>
        maxOcc shouldBe 12L            // the crowd saturates both bands
        nOver shouldBe 1L
        candOver shouldBe (12L * 11) / 2
        candAll shouldBe candOver + 1L // + the C(2,2)=1 small-bucket pair
      }
    }
  }

  describe("rollingZscore") {
    it("flags a spike against its PRECEDING window and never against itself") {
      import spark.implicits._
      // ten calm values, then a spike, then calm again: only the spike row
      // is anomalous, and the row AFTER the spike is judged against a
      // window that now contains the spike (sd inflated, so not flagged).
      val vals = (1 to 10).map(i => 10.0 + 0.1 * (i % 3)) ++ Seq(500.0, 10.1)
      val rows = vals.zipWithIndex.map { case (v, i) =>
        (i.toLong, 77L, new java.sql.Timestamp(1700000000000L + i * 1000L), v)
      }
      val df = rows.toDF("event_id", "user_id", "ts", "value")
      val out = graft.ops.TimeSeries.rollingZscore(df)
        .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("is_anomaly")).toMap
      out(10L) shouldBe true                  // the spike
      (0L to 9L).foreach(out(_) shouldBe false) // calm prefix (incl. short history)
      out(11L) shouldBe false                 // post-spike row: sd inflated by the spike
    }

    it("requires minN history rows before flagging anything") {
      import spark.implicits._
      val rows = Seq(
        (0L, 1L, new java.sql.Timestamp(0L), 1.0),
        (1L, 1L, new java.sql.Timestamp(1000L), 1.0),
        (2L, 1L, new java.sql.Timestamp(2000L), 99999.0)) // only 2 history rows
      val out = graft.ops.TimeSeries.rollingZscore(rows.toDF("event_id", "user_id", "ts", "value"))
        .collect().map(_.getAs[Boolean]("is_anomaly"))
      out.count(identity) shouldBe 0
    }
  }
}

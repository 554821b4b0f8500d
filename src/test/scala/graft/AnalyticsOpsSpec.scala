package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.ops.{Profile, TimeSeries}

/** Hand-computed cases for the sequence/skew diagnostics: the Markov
  * transition matrix (lag-1 per-user alignment) and the key-skew report.
  */
class AnalyticsOpsSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  describe("TimeSeries.transitions") {
    it("counts lag-1 pairs per user and row-normalizes per source") {
      // u1: a b a b   -> a→b ×2, b→a ×1
      // u2: a a c     -> a→a ×1, a→c ×1
      val ev = Seq(
        ("u1", "a", 1000L, 1L), ("u1", "b", 2000L, 2L),
        ("u1", "a", 3000L, 3L), ("u1", "b", 4000L, 4L),
        ("u2", "a", 1000L, 5L), ("u2", "a", 2000L, 6L), ("u2", "c", 3000L, 7L))
        .toDF("user_id", "event_type", "ms", "event_id")
        .select(col("user_id"), col("event_type"),
          timestamp_millis(col("ms")).as("ts"), col("event_id"))
      val got = TimeSeries.transitions(ev).collect()
        .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
        .toMap
      got(("a", "b")) shouldBe ((2L, 0.5)) // a has 4 outgoing: b,b,a,c
      got(("a", "a")) shouldBe ((1L, 0.25))
      got(("a", "c")) shouldBe ((1L, 0.25))
      got(("b", "a")) shouldBe ((1L, 1.0))
      got.size shouldBe 4 // never a cross-user pair (u1's last b → u2's first a)
    }

    it("breaks equal-timestamp ties by event_id") {
      val ev = Seq(("u", "x", 1000L, 2L), ("u", "y", 1000L, 1L))
        .toDF("user_id", "event_type", "ms", "event_id")
        .select(col("user_id"), col("event_type"),
          timestamp_millis(col("ms")).as("ts"), col("event_id"))
      val got = TimeSeries.transitions(ev).collect()
      got.length shouldBe 1
      (got.head.getString(0), got.head.getString(1)) shouldBe (("y", "x"))
    }
  }

  describe("TimeSeries.hourlyAcf") {
    val H = 3600000L

    def evAt(tpe: String, hourCounts: Seq[Int]) =
      hourCounts.zipWithIndex.flatMap { case (n, h) =>
        (0 until n).map(i => (tpe, 1700000000000L + h * H + i * 1000L))
      }

    def acfMap(rows: Seq[(String, Long)]) =
      TimeSeries.hourlyAcf(
        rows.toDF("event_type", "ms")
          .select(col("event_type"), timestamp_millis(col("ms")).as("ts")))
        .collect()
        .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3))))
        .toMap

    it("a perfectly alternating series has acf(1) = -1 and acf(2) = +1") {
      val m = acfMap(evAt("alt", Seq(2, 4, 2, 4, 2, 4, 2, 4)))
      m(("alt", 1))._2 shouldBe -1.0
      m(("alt", 2))._2 shouldBe 1.0
      m(("alt", 1))._1 shouldBe 7L // 8 hours -> 7 lag-1 pairs
    }

    it("gap hours are filled with zero counts (and constant windows emit 0)") {
      // observed hours 0 and 2 only: filled series 1,0,1
      val m = acfMap(evAt("gap", Seq(1, 0, 1)))
      m(("gap", 1)) shouldBe ((2L, -1.0)) // (1,0),(0,1): the zero was inserted
      m(("gap", 2)) shouldBe ((1L, 0.0)) // single degenerate pair -> guard
      m(("gap", 3))._1 shouldBe 0L
    }
  }

  describe("TimeSeries.hourlyTrend") {
    val H = 3600000L

    def trend(hourCounts: Seq[Int]) =
      TimeSeries.hourlyTrend(
        hourCounts.zipWithIndex.flatMap { case (n, h) =>
          (0 until n).map(i => ("k", 1700000000000L + h * H + i * 1000L))
        }.toDF("event_type", "ms")
          .select(col("event_type"), timestamp_millis(col("ms")).as("ts")))
        .collect().head

    it("recovers an exact linear ramp with r² = 1") {
      val r = trend(Seq(1, 2, 3, 4, 5))
      r.getAs[Long]("n") shouldBe 5L
      r.getAs[Double]("slope_per_hour") shouldBe 1.0
      r.getAs[Double]("intercept") shouldBe 1.0
      r.getAs[Double]("r2") shouldBe 1.0
    }

    it("a constant series has slope 0 and the degenerate r² guard") {
      val r = trend(Seq(3, 3, 3, 3))
      r.getAs[Double]("slope_per_hour") shouldBe 0.0
      r.getAs[Double]("intercept") shouldBe 3.0
      r.getAs[Double]("r2") shouldBe 0.0 // vy = 0: guarded, not 0/0
    }

    it("counts gap hours as zero activity (they pull the fit down)") {
      // observed 4,0(gap),4: slope 0, intercept 8/3 — the gap was real data
      val r = trend(Seq(4, 0, 4))
      r.getAs[Long]("n") shouldBe 3L
      r.getAs[Double]("slope_per_hour") shouldBe 0.0
      r.getAs[Double]("intercept") shouldBe (8.0 / 3 +- 1e-6)
    }
  }

  describe("TimeSeries.theilSenDaily") {
    val D = 86400000L

    def ts(dayCounts: Seq[Int]) =
      TimeSeries.theilSenDaily(
        dayCounts.zipWithIndex.flatMap { case (n, d) =>
          (0 until n).map(i => ("k", 1700000000000L + d * D + i * 1000L))
        }.toDF("event_type", "ms")
          .select(col("event_type"), timestamp_millis(col("ms")).as("ts")))
        .collect().head

    it("recovers an exact linear ramp") {
      val r = ts(Seq(1, 2, 3, 4, 5))
      r.getAs[Long]("n_days") shouldBe 5L
      r.getAs[Long]("n_pairs") shouldBe 10L
      r.getAs[Double]("ts_slope_per_day") shouldBe 1.0
    }

    it("ignores a spike day the OLS slope would chase") {
      // 6 of 10 pairwise slopes are the clean ramp's 1.0; the lower median
      // (position 5) never reaches the four spike-inflated slopes
      val r = ts(Seq(1, 2, 3, 4, 100))
      r.getAs[Double]("ts_slope_per_day") shouldBe 1.0
    }

    it("counts gap days as zero and medians across them") {
      // slopes: (0-4)/1=-4, (4-4)/2=0, (4-0)/1=4 -> median 0
      val r = ts(Seq(4, 0, 4))
      r.getAs[Long]("n_days") shouldBe 3L
      r.getAs[Double]("ts_slope_per_day") shouldBe 0.0
    }
  }

  describe("TimeSeries.ksDrift") {
    val Split = "2024-01-16"

    def df(rows: Seq[(String, String, Double)]) =
      rows.toDF("event_type", "d", "value")
        .select(col("event_type"), col("d").cast("timestamp").as("ts"), col("value"))

    it("identical distributions give D = 0; disjoint supports give D = 1 and reject") {
      val same = (1 to 20).flatMap(i => Seq(
        ("same", "2024-01-10", i.toDouble), ("same", "2024-01-20", i.toDouble)))
      val far = (1 to 20).flatMap(i => Seq(
        ("far", "2024-01-10", i.toDouble), ("far", "2024-01-20", i + 1000.0)))
      val m = TimeSeries.ksDrift(df(same ++ far), "ts", "event_type", "value", Split)
        .collect().map(r => r.getString(0) -> ((r.getDouble(3), r.getBoolean(4)))).toMap
      m("same") shouldBe ((0.0, false))
      m("far")._1 shouldBe 1.0
      m("far")._2 shouldBe true
    }

    it("computes the textbook D on a hand-checked shifted sample") {
      // ref {1,2,3,4}, cur {3,4,5,6}: D peaks at v=2 with |2/4 - 0/4| = 0.5
      val rows = Seq(1, 2, 3, 4).map(v => ("k", "2024-01-10", v.toDouble)) ++
        Seq(3, 4, 5, 6).map(v => ("k", "2024-01-20", v.toDouble))
      val r = TimeSeries.ksDrift(df(rows), "ts", "event_type", "value", Split)
        .collect().head
      r.getAs[Long]("n_ref") shouldBe 4L
      r.getAs[Long]("n_cur") shouldBe 4L
      r.getAs[Double]("ks_d") shouldBe 0.5
      // critical value 1.358*sqrt(8/16) = 0.960 > 0.5: no rejection at n=4
      r.getAs[Boolean]("drift_05") shouldBe false
    }

    it("drops keys with an empty side") {
      val rows = Seq(("only_ref", "2024-01-10", 1.0), ("both", "2024-01-10", 1.0),
        ("both", "2024-01-20", 2.0))
      val keys = TimeSeries.ksDrift(df(rows), "ts", "event_type", "value", Split)
        .collect().map(_.getString(0)).toSet
      keys shouldBe Set("both")
    }
  }

  describe("TimeSeries.jsDrift") {
    val Split = "2024-01-16"

    def df(rows: Seq[(String, String, Double)]) =
      rows.toDF("event_type", "d", "value")
        .select(col("event_type"), col("d").cast("timestamp").as("ts"), col("value"))

    it("identical histograms give exactly 0; disjoint ones approach ln 2; symmetric") {
      val same = (1 to 20).flatMap(i => Seq(
        ("same", "2024-01-10", (i % 5) * 30.0), ("same", "2024-01-20", (i % 5) * 30.0)))
      // 300/side so Laplace smoothing (+1 per bin over 17 bins) no longer
      // blunts the disjointness
      val far = (1 to 300).flatMap(i => Seq(
        ("far", "2024-01-10", 0.0), ("far", "2024-01-20", 400.0)))
      val m = TimeSeries.jsDrift(df(same ++ far), "ts", "event_type", "value", Split)
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      m("same") shouldBe 0.0 // pr == pc bin for bin -> every term exactly 0
      m("far") should be > 0.6 // near the ln 2 = 0.693 bound
      m("far") should be <= math.log(2.0)
      // symmetry: swapping ref and cur leaves the divergence unchanged
      val swapped = (1 to 300).flatMap(i => Seq(
        ("far", "2024-01-20", 0.0), ("far", "2024-01-10", 400.0)))
      TimeSeries.jsDrift(df(swapped), "ts", "event_type", "value", Split)
        .collect().head.getDouble(3) shouldBe m("far")
    }
  }

  describe("TimeSeries.dailyActiveNew") {
    it("splits actives into first-ever-seen and returning, per epoch day") {
      val d0 = 19600L
      def ev(day: Long, u: Long) =
        (u, new java.sql.Timestamp(day * 86400000L))
      // day 0: u1, u2 (both new); day 1: u1 (returning), u3 (new), u3 again
      val df = Seq(ev(d0, 1), ev(d0, 2), ev(d0 + 1, 1), ev(d0 + 1, 3), ev(d0 + 1, 3))
        .toDF("user_id", "ts")
      val got = TimeSeries.dailyActiveNew(df).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      got(d0) shouldBe ((2L, 2L, 2L, 0L))
      got(d0 + 1) shouldBe ((3L, 2L, 1L, 1L))
    }
  }

  describe("TimeSeries.conversionLatency") {
    def ev(u: Long, t: String, ms: Long) =
      (u, t, new java.sql.Timestamp(1700000000000L + ms))

    it("measures first-signup -> first-later-purchase; earlier purchases never count") {
      val df = Seq(
        ev(1, "signup", 0), ev(1, "purchase", 5000), ev(1, "purchase", 2000),
        ev(2, "signup", 0), ev(2, "purchase", 1000),
        ev(3, "signup", 1000), ev(3, "purchase", 500), // only-earlier: unconverted
        ev(4, "signup", 0)) // never purchases
        .toDF("user_id", "event_type", "ts")
      val r = TimeSeries.conversionLatency(df).collect().head
      r.getLong(0) shouldBe 4L // signers
      r.getLong(1) shouldBe 2L // converts (u1 at 2000ms, u2 at 1000ms)
      r.getDouble(2) shouldBe 1500.0 // p50 of {1000, 2000}
      r.getLong(4) shouldBe 500000L // 2/4 in ppm
    }
  }

  describe("Profile.keySkew") {
    it("computes integer-exact top share and the max/mean ratio") {
      // group g: key k1 ×6, k2 ×1, k3 ×1 → 8 rows, 3 keys
      val df = (Seq.fill(6)("k1") ++ Seq("k2", "k3")).map(("g", _))
        .toDF("grp", "key")
      val r = Profile.keySkew(df, "grp", "key").collect().head
      r.getAs[Long]("n_keys") shouldBe 3L
      r.getAs[Long]("n_rows") shouldBe 8L
      r.getAs[Long]("max_per_key") shouldBe 6L
      r.getAs[Long]("top_share_ppm") shouldBe 750000L
      r.getAs[Double]("avg_per_key") shouldBe (8.0 / 3 +- 1e-6)
      r.getAs[Double]("skew_ratio") shouldBe 2.25 // 6 / (8/3)
    }

    it("reports no skew for a uniform distribution") {
      val df = Seq("k1", "k2", "k3", "k4").map(("g", _)).toDF("grp", "key")
      val r = Profile.keySkew(df, "grp", "key").collect().head
      r.getAs[Long]("top_share_ppm") shouldBe 250000L
      r.getAs[Double]("skew_ratio") shouldBe 1.0
    }
  }

  describe("TimeSeries.incidentWindowHits") {
    it("matches the hand-computed hit sets across a bucket boundary") {
      // errors at 0 and 25 min open windows [0,30m) and [25m,55m); the
      // 40-min click is reachable only through the +1 bucket explode
      val rows = Seq(
        (1L, "error", 0L), (2L, "click", 600000L), (3L, "click", 1799999L),
        (4L, "click", 1800000L), (5L, "error", 1500000L),
        (6L, "click", 2400000L), (7L, "purchase", 3300000L),
        (8L, "purchase", 3600000L))
        .map { case (id, t, ms) => (id, t, new java.sql.Timestamp(ms)) }
        .toDF("event_id", "event_type", "ts")
      val got = graft.ops.TimeSeries.incidentWindowHits(rows).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      got("error") shouldBe ((2L, 2L, 1000000L))
      got("click") shouldBe ((4L, 4L, 1000000L))
      got("purchase") shouldBe ((2L, 0L, 0L))
    }
  }

  describe("Profile.storageProfile") {
    it("counts runs and distincts per column with null-safe change points") {
      val ts0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
      val rows = Seq(
        (1L, "a", 1L, 1.0, null.asInstanceOf[String]),
        (2L, "a", 2L, 1.0, null.asInstanceOf[String]),
        (3L, "a", 1L, 1.0, "x"),
        (4L, "b", 2L, 1.0, "x"),
        (5L, "b", 1L, 1.0, null.asInstanceOf[String]),
        (6L, "b", 2L, 1.0, null.asInstanceOf[String]))
        .map { case (id, t, u, v, p) => (id, ts0, t, u, v, p) }
        .toDF("event_id", "ts", "event_type", "user_id", "value", "props")
      val got = Profile.storageProfile(rows).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(6)))).toMap
      got("event_type") shouldBe ((6L, 2L, 2L, "plain"))
      got("user_id") shouldBe ((6L, 2L, 6L, "plain"))
      got("value") shouldBe ((6L, 1L, 1L, "rle")) // 1 run / 6 rows
      // leading nulls: NULL IS-NOT-DISTINCT NULL opens no run; x→null does
      got("props") shouldBe ((6L, 1L, 2L, "plain"))
    }

    it("advises dict for low-cardinality high-churn columns") {
      val ts0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
      val rows = (1L to 1000L).map(i =>
        (i, ts0, s"t${i % 5}", i, i.toDouble, "p"))
        .toDF("event_id", "ts", "event_type", "user_id", "value", "props")
      val got = Profile.storageProfile(rows).collect()
        .map(r => r.getString(0) -> r.getString(6)).toMap
      got("event_type") shouldBe "dict" // 5 distinct, alternating (no runs)
      got("props") shouldBe "rle"       // constant column
      got("user_id") shouldBe "plain"   // unique, always-changing
    }
  }

  describe("Profile.contractReport") {
    it("counts violations per rule exactly, with NULL predicates non-violating") {
      val ts0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
      val rows = Seq(
        (Some(1L), "click", 10.0, ts0),    // clean
        (None: Option[Long], "view", 5.0, ts0), // null user: trips ONLY not_null
        (Some(-2L), "view", 500.0, ts0),   // trips positive AND range
        (Some(3L), "weird", 1.0, java.sql.Timestamp.valueOf("2030-01-01 00:00:00")))
      val df = rows.toDF("user_id", "event_type", "value", "ts")
      val got = Profile.contractReport(df).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
      got("user_id_not_null") shouldBe ((1L, 250000L))
      // the NULL user_id makes `user_id <= 0` NULL → non-violating there
      got("user_id_positive") shouldBe ((1L, 250000L))
      got("value_in_range") shouldBe ((1L, 250000L))
      got("event_type_enum") shouldBe ((1L, 250000L))
      got("ts_in_window") shouldBe ((1L, 250000L))
    }
  }

  describe("TimeSeries.cusumChangepoints") {
    it("matches the hand-run clamped folds, both directions") {
      // target 10, slack 2 (c_up=12, c_dn=8), threshold 5.
      // user 1: 10,10,10,20,20 -> S+ = 0,0,0,8,16 (2 alarms, peak 16);
      //         S- stays 0.
      // user 2: 10,2,2,2 -> S- = 0,6,12,18 (3 alarms, peak 18); S+ = 0.
      def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
      val ev = Seq(
        (1L, t(1), 101L, 10.0), (1L, t(2), 102L, 10.0), (1L, t(3), 103L, 10.0),
        (1L, t(4), 104L, 20.0), (1L, t(5), 105L, 20.0),
        (2L, t(1), 201L, 10.0), (2L, t(2), 202L, 2.0),
        (2L, t(3), 203L, 2.0), (2L, t(4), 204L, 2.0))
        .toDF("user_id", "ts", "event_id", "value")
      val r = graft.ops.TimeSeries
        .cusumChangepoints(ev, target = "10.00", slack = "2.00", threshold = "5.00")
        .collect().map(x => x.getLong(0) -> x).toMap
      r(1L).getAs[Long]("n_up_alarms") shouldBe 2L
      r(1L).getAs[Long]("n_down_alarms") shouldBe 0L
      r(1L).getAs[Double]("peak_up") shouldBe 16.0
      r(1L).getAs[Double]("peak_down") shouldBe 0.0
      r(2L).getAs[Long]("n_up_alarms") shouldBe 0L
      r(2L).getAs[Long]("n_down_alarms") shouldBe 3L
      r(2L).getAs[Double]("peak_down") shouldBe 18.0
    }

    it("the statistic RESETS after an excursion ends (the clamp at zero)") {
      // one high burst then a long return to target: S+ starts at 18
      // (alarming twice while > 15), decays by c_up - x = 2 per step
      // down to an exact 0 CLAMP, so the second burst starts a FRESH
      // excursion at exactly 18 - without the clamp it would ride the
      // old excursion's residue and read 16
      def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
      val vals = Seq(30.0) ++ Seq.fill(10)(10.0) ++ Seq(30.0)
      val ev = vals.zipWithIndex.map { case (v, i) => (1L, t(i + 1), (i + 1).toLong, v) }
        .toDF("user_id", "ts", "event_id", "value")
      val r = graft.ops.TimeSeries
        .cusumChangepoints(ev, target = "10.00", slack = "2.00", threshold = "15.00")
        .collect().head
      // S+ trace: 18,16,14,12,10,8,6,4,2,0,0,18 -> alarms at 18,16,18
      r.getAs[Long]("n_up_alarms") shouldBe 3L
      r.getAs[Double]("peak_up") shouldBe 18.0
    }
  }

  describe("TimeSeries.seasonalDow") {
    def dayEvents(rows: Seq[(String, Long, Int)]) = // (type, epoch day, count)
      rows.flatMap { case (t, d, n) => (0 until n).map(i => (t, d * 86400000L + i)) }
        .toDF("event_type", "ms")
        .select(col("event_type"), timestamp_millis(col("ms")).as("ts"))

    it("recovers a pure period-7 pattern exactly: seasonal = c_dow - weekly_mean") {
      // 4 weeks from an epoch day divisible by 7: dow k carries k+1 events
      val d0 = 19600L // 19600 % 7 == 0
      val ev = dayEvents((0 until 28).map(i => ("w", d0 + i, (i % 7) + 1)))
      val got = TimeSeries.seasonalDow(ev).collect()
        .map(r => r.getLong(1) -> r.getDouble(3)).toMap
      // weekly total 28, mean 4/day: seasonal(dow k) = (k+1) - 4 exactly
      (0L to 6L).foreach(k => got(k) shouldBe (k + 1 - 4).toDouble)
    }

    it("a constant series decomposes to seasonal identically zero; edges excluded") {
      val d0 = 19600L
      val ev = dayEvents((0 until 21).map(i => ("c", d0 + i, 2)))
      val rows = TimeSeries.seasonalDow(ev).collect()
      rows.foreach(_.getDouble(3) shouldBe 0.0)
      // 21 days minus 3-day edges = 15 full-window days
      rows.map(_.getLong(2)).sum shouldBe 15L
    }
  }
}

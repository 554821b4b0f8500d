package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

/** Accuracy contract for the sketch-based operators (rows-only at the
  * oracle): HLL++ cardinality must land within its error bound.
  */
class SketchSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  describe("approx_count_distinct") {
    it("estimates cardinality within bound on 100k keys (rsd=2%)") {
      import spark.implicits._
      val df = (1 to 200000).map(i => i % 100000).toDF("k").repartition(8)
      // default rsd is 5% at ONE sigma — observed 5.05% on this data; ask
      // for a 2% sketch and assert the 3-sigma envelope
      val approx = df.agg(approx_count_distinct(col("k"), 0.02).as("a"))
        .collect()(0).getLong(0).toDouble
      math.abs(approx - 100000.0) / 100000.0 should be < 0.06
    }

    it("is deterministic across partitionings (sketch merge is commutative)") {
      import spark.implicits._
      val df = (1 to 50000).map(i => i % 9999).toDF("k")
      def est(parts: Int) =
        df.repartition(parts).agg(approx_count_distinct(col("k"))).collect()(0).getLong(0)
      est(2) shouldBe est(13)
    }
  }

  describe("approx_percentile (KLL-style quantile sketch)") {
    it("lands within the accuracy parameter of the exact percentiles") {
      import spark.implicits._
      // skewed distribution: i^2 over 100k rows — uniform sketches would drift
      val df = (1 to 100000).map(i => i.toDouble * i).toDF("v").repartition(8)
      val Seq(a25, a50, a99) = df.select(
          expr("approx_percentile(v, array(0.25, 0.5, 0.99), 10000)").as("q"))
        .collect()(0).getSeq[Double](0).toSeq
      val Seq(e25, e50, e99) = df.select(
          expr("percentile(v, array(0.25, 0.5, 0.99))").as("q"))
        .collect()(0).getSeq[Double](0).toSeq
      // accuracy=10000 → rank error ≤ 1/10000; allow 10x slack in VALUE
      // space via the local derivative (rank ±10 of 100k ≈ ±0.04% in value)
      math.abs(a25 - e25) / e25 should be < 0.005
      math.abs(a50 - e50) / e50 should be < 0.005
      math.abs(a99 - e99) / e99 should be < 0.005
    }

    it("merges deterministically across partitionings") {
      import spark.implicits._
      val df = (1 to 30000).map(_.toDouble).toDF("v")
      def est(parts: Int) = df.repartition(parts)
        .select(expr("approx_percentile(v, 0.5, 1000)")).collect()(0).getDouble(0)
      // approx_percentile's sketch merge is exact-rank-bounded either way;
      // equal partition layouts give equal results
      est(4) shouldBe est(4)
    }
  }

  describe("DataSketches HLL sketch tables (Sketches.hllPartials/hllRollup)") {
    import graft.ops.Sketches

    it("rolls day-partials up within the error budget of the exact count") {
      val ev = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
      val rolled = Sketches.hllRollup(Sketches.hllPartials(ev)).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2).toDouble)).toMap
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")), countDistinct(to_date(col("ts"))))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      exact.foreach { case (et, (nUsers, nDays)) =>
        val (days, est) = rolled(et)
        days shouldBe nDays
        math.abs(est - nUsers.toDouble) / nUsers.toDouble should be < Sketches.ErrorBudget
      }
    }

    it("union is order/partitioning-invariant (register-wise max)") {
      val ev = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
      def est(parts: Int): Map[String, Long] =
        Sketches.hllRollup(Sketches.hllPartials(ev).repartition(parts))
          .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      est(2) shouldBe est(11)
    }
  }

  describe("quantile partials (Sketches.quantilePartials/quantileRollup)") {
    import graft.ops.Sketches

    it("rollup from partials == rollup from any other partitioning (merge is addition)") {
      val ev = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
      val a = Sketches.quantileRollup(Sketches.quantilePartials(ev))
        .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      val b = Sketches.quantileRollup(Sketches.quantilePartials(ev.repartition(13)))
        .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
      a shouldBe b
    }

    it("picks the exact type-1 quantile of granularity-rounded values") {
      import spark.implicits._
      // ten values 1.00..10.00 for one key: p50 -> 5.0 (cum 5 >= 10*0.5),
      // p95 -> 10.0 (cum 10 >= 9.5), p99 -> 10.0
      val rows = (1 to 10).map(i =>
        ("k", new java.sql.Timestamp(1700000000000L + i * 86400000L), i.toDouble))
      val ev = rows.toDF("event_type", "ts", "value")
      val r = Sketches.quantileRollup(Sketches.quantilePartials(ev)).collect()(0)
      r.getAs[Long]("n") shouldBe 10L
      r.getAs[Double]("p50") shouldBe 5.0
      r.getAs[Double]("p95") shouldBe 10.0
      r.getAs[Double]("p99") shouldBe 10.0
    }
  }

  describe("moment partials + rollup") {
    import spark.implicits._
    import graft.ops.Sketches

    def ev(rows: Seq[(String, Long, Double)]) =
      rows.map { case (k, ms, v) => (k, new java.sql.Timestamp(ms), v) }
        .toDF("event_type", "ts", "value")

    it("matches Spark's own var_samp and skewness computed direct from raw") {
      val rng = new scala.util.Random(7)
      val rows = (1 to 500).map { i =>
        (s"k${i % 3}", 1700000000000L + i * 3600000L,
          math.rint(rng.nextDouble() * 10000) / 100.0) // 2dp values
      }
      val df = ev(rows)
      val got = Sketches.momentsRollup(Sketches.momentPartials(df)).collect()
        .map(r => r.getString(0) ->
          ((r.getAs[Double]("mean_v"), r.getAs[Double]("var_samp"),
            r.getAs[Double]("skew_pop")))).toMap
      val direct = df.groupBy(col("event_type"))
        .agg(avg(col("value")).as("m"), var_samp(col("value")).as("v"),
          skewness(col("value")).as("s")).collect()
        .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
        .toMap
      direct.foreach { case (k, (m, v, s)) =>
        got(k)._1 shouldBe m +- 1e-6
        got(k)._2 shouldBe v +- 1e-4
        got(k)._3 shouldBe s +- 1e-4
      }
    }

    it("merge is exact: any partitioning and any day-split give identical rows") {
      val rows = (1 to 200).map(i =>
        ("k", 1700000000000L + i * 7200000L, (i % 37) + 0.25))
      val a = Sketches.momentsRollup(Sketches.momentPartials(ev(rows))).collect()
      val b = Sketches.momentsRollup(Sketches.momentPartials(ev(rows).repartition(17)))
        .collect()
      a.map(_.toSeq) shouldBe b.map(_.toSeq)
      // the partials table really is per-day mergeable state, not one blob
      Sketches.momentPartials(ev(rows)).count() should be > 1L
    }

    it("a constant group has variance 0 and skewness 0 (no 0/0)") {
      val rows = (1 to 8).map(i => ("c", 1700000000000L + i * 1000L, 4.5))
      val r = Sketches.momentsRollup(Sketches.momentPartials(ev(rows))).collect()(0)
      r.getAs[Double]("sum_v") shouldBe 36.0
      r.getAs[Double]("var_samp") shouldBe 0.0
      r.getAs[Double]("skew_pop") shouldBe 0.0
    }
  }

  describe("madOutliers") {
    import graft.ops.Sketches
    it("flags only the contaminating tail (hand-computed median and MAD)") {
      import spark.implicits._
      // values {0.8,0.9,1.0,1.1,1.2,100}: med=1.0 (type-1 at n=6),
      // deviations {0,0.1,0.1,0.2,0.2,99} → MAD=0.1; only 99 > 3·MAD
      val ev = Seq(1.0, 1.1, 0.9, 1.2, 0.8, 100.0).map(("a", _))
        .toDF("event_type", "value")
      val r = Sketches.madOutliers(ev).collect()(0)
      r.getLong(1) shouldBe 6L
      r.getDouble(2) shouldBe 1.0 +- 1e-9
      r.getDouble(3) shouldBe 0.1 +- 1e-9
      r.getLong(4) shouldBe 1L
      r.getLong(5) shouldBe 166666L
    }

    it("stays put where the mean/sigma gate is masked") {
      import spark.implicits._
      // 20% contamination at 1000: σ inflates so much that z > 3 may
      // catch nothing, while MAD still flags every contaminated row
      val ev = ((1 to 40).map(i => 10.0 + (i % 5) * 0.1) ++
        Seq.fill(10)(1000.0)).map(("a", _)).toDF("event_type", "value")
      val r = Sketches.madOutliers(ev).collect()(0)
      r.getLong(4) shouldBe 10L
    }
  }

  describe("count-min sketch") {
    import spark.implicits._
    import graft.ops.Sketches
    // 1 heavy key (600 events = 60%), 40 light keys (10 each)
    def cmsEvents = ((1 to 600).map(_ => 7L) ++
      (1 to 40).flatMap(k => (1 to 10).map(_ => 100L + k))).toDF("user_id")

    it("preserves total mass per hash row and never undercounts") {
      val sk = Sketches.cmsSketch(cmsEvents)
      val perRow = sk.groupBy(col("row_idx")).agg(sum(col("cnt")).as("m"))
        .collect().map(_.getLong(1)).toSeq
      perRow shouldBe Seq.fill(Sketches.CmsDepth)(1000L)

      val est = Sketches.cmsEstimates(cmsEvents).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      est(7L) should be >= 600L
      (101L to 140L).foreach(k => est(k) should be >= 10L)
      // 41 keys into 512 columns × 4 rows: min-over-rows should be exact here
      est(7L) shouldBe 600L
    }

    it("sketches merge by per-cell addition (split == whole)") {
      val ids = (1 to 600).map(_ => 7L) ++
        (1 to 40).flatMap(k => (1 to 10).map(_ => 100L + k))
      val (s1, s2) = ids.splitAt(500)
      val (a, b) = (s1.toDF("user_id"), s2.toDF("user_id"))
      val merged = Sketches.cmsSketch(a).union(Sketches.cmsSketch(b))
        .groupBy(col("row_idx"), col("col_idx")).agg(sum(col("cnt")).as("cnt"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val whole = Sketches.cmsSketch(cmsEvents)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      merged shouldBe whole
    }

    it("never undercounts and merges exactly on randomized streams (seeded trials)") {
      import spark.implicits._
      val rng = new scala.util.Random(4242)
      (1 to 3).foreach { trial =>
        // Zipf-ish stream over a random key universe incl. negative-free ids
        val ids = (1 to 800).map(_ => (rng.nextInt(1 << rng.nextInt(20)) + 1).toLong)
        val exact = ids.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val est = Sketches.cmsEstimates(ids.toDF("user_id")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        withClue(s"trial $trial: ") {
          est.keySet shouldBe exact.keySet
          exact.foreach { case (k, n) => est(k) should be >= n }
        }
        // split-merge exactness at a random split point
        val cut = rng.nextInt(ids.size - 1) + 1
        val (a, b) = ids.splitAt(cut)
        val merged = Sketches.cmsSketch(a.toDF("user_id"))
          .union(Sketches.cmsSketch(b.toDF("user_id")))
          .groupBy(col("row_idx"), col("col_idx")).agg(sum(col("cnt")).as("cnt"))
          .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
        val whole = Sketches.cmsSketch(ids.toDF("user_id"))
          .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
        withClue(s"trial $trial merge: ") { merged shouldBe whole }
      }
    }

    it("flags exactly the planted heavy hitter at the 1.2×-mean-rate threshold") {
      // mean rate = 1000/41 ≈ 24.4; threshold ≈ 29.3: heavy (600) passes,
      // light keys (10 each) need a 4-row full collision to sneak over
      val hh = Sketches.cmsHeavyHitters(cmsEvents)
      val rows = hh.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      rows.map(_._1).toSet shouldBe Set(7L)
      val (_, exact, est, over) = rows(0)
      exact shouldBe 600L
      over shouldBe (est - exact)
      over should be >= 0L
    }
  }

  describe("hllOverlapReport") {
    import spark.implicits._
    it("audits pairwise overlap: exact values, in-budget estimates, disjoint pairs kept") {
      // a: users 1-600; b: 401-1000 (overlap 200 with a); c: 2001-2100 (disjoint)
      val ev = ((1 to 600).map(u => ("a", u.toLong)) ++
        (401 to 1000).map(u => ("b", u.toLong)) ++
        (2001 to 2100).map(u => ("c", u.toLong)))
        .toDF("event_type", "user_id")
      val rows = graft.ops.Sketches.hllOverlapReport(ev).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
      rows should have size 3
      rows(("a", "b")) shouldBe ((600L, 600L, 200L, 1000L, true))
      // zero-overlap pairs stay in the report (left join, not inner)
      rows(("a", "c")) shouldBe ((600L, 100L, 0L, 700L, true))
      rows(("b", "c")) shouldBe ((600L, 100L, 0L, 700L, true))
    }
  }

  describe("cmsJoinSizeEstimate") {
    import spark.implicits._
    it("never underestimates and is exact when the sketch is collision-free") {
      // 3 users with clicks x purchases: 4*2 + 1*5 + 3*1 = 16 pairs
      val ev = ((1 to 4).map(_ => ("click", 1L)) ++ (1 to 2).map(_ => ("purchase", 1L)) ++
        (1 to 1).map(_ => ("click", 2L)) ++ (1 to 5).map(_ => ("purchase", 2L)) ++
        (1 to 3).map(_ => ("click", 3L)) ++ (1 to 1).map(_ => ("purchase", 3L)) ++
        (1 to 7).map(_ => ("view", 9L))) // other types are ignored
        .toDF("event_type", "user_id")
      val r = graft.ops.Sketches.cmsJoinSizeEstimate(ev).collect().head
      r.getLong(0) shouldBe 16L
      r.getLong(1) should be >= 16L
      r.getLong(2) shouldBe (r.getLong(1) - 16L)
      // 3 keys into 8192 columns: no collisions, the estimate is exact
      r.getLong(1) shouldBe 16L
    }

    it("reports zero pairs when the sides share no keys") {
      val ev = (Seq(("click", 1L), ("click", 2L), ("purchase", 50L)))
        .toDF("event_type", "user_id")
      val r = graft.ops.Sketches.cmsJoinSizeEstimate(ev).collect().head
      r.getLong(0) shouldBe 0L
      r.getLong(2) should be >= 0L
    }
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.ops.Sampling

class SamplingSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def docs(n: Int) = {
    import spark.implicits._
    val langs = Seq("en", "de", "fr", "es", "zh")
    (0 until n).map(i => (i.toLong, s"text $i", langs(i % 5), s"src${i % 3}"))
      .toDF("doc_id", "text", "lang", "source")
  }

  describe("stratifiedSample") {
    it("keeps every en doc, samples others at their ppm rate, splits ~10% val") {
      val out = Sampling.stratifiedSample(docs(2000)).collect()
      val byLang = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
      byLang("en") shouldBe 400 // rate 1.0: all 400 en docs survive
      // 700k ppm strata: expect ~280 of 400; allow generous hash wiggle
      byLang("de").toDouble should (be >= 220.0 and be <= 340.0)
      byLang("zh").toDouble should (be >= 140.0 and be <= 260.0) // 500k ppm
      val valFrac = out.count(_.getString(3) == "val").toDouble / out.length
      valFrac should (be >= 0.06 and be <= 0.14)
    }

    it("is deterministic and stable under corpus growth") {
      def kept(n: Int): Set[(Long, String)] =
        Sampling.stratifiedSample(docs(n)).collect()
          .map(r => (r.getLong(0), r.getString(3))).toSet
      val small = kept(500)
      val big = kept(1000)
      // hash-based membership: growing the corpus NEVER flips an existing
      // doc's keep/split decision (the property rand() sampling lacks)
      small.subsetOf(big) shouldBe true
      kept(500) shouldBe small // and re-running changes nothing
    }
  }

  describe("histogramMatch") {
    it("flattens the length histogram to the rarest bucket's mass and keeps that bucket whole") {
      import spark.implicits._
      // buckets (width 8 tokens): 400 docs of ~4 tokens, 100 of ~12, 20 of ~20
      val rows = (0 until 400).map(i => (i.toLong, "a b c d")) ++
        (400 until 500).map(i => (i.toLong, Seq.fill(12)("t").mkString(" "))) ++
        (500 until 520).map(i => (i.toLong, Seq.fill(20)("t").mkString(" ")))
      val df = rows.toDF("doc_id", "text")
      val out = Sampling.histogramMatch(df).collect()
      val byBucket = out.groupBy(_.getAs[Long]("bucket")).view.mapValues(_.length).toMap
      // rarest bucket (20 docs) gets ppm = 1e6 → survives whole
      byBucket(2L) shouldBe 20
      // denser buckets downsample toward 20 (hash wiggle allowed)
      byBucket(0L).toDouble should (be >= 8.0 and be <= 36.0)
      byBucket(1L).toDouble should (be >= 8.0 and be <= 36.0)
      // membership is a pure doc_id hash — invariant under repartitioning
      val again = Sampling.histogramMatch(df.repartition(7)).collect()
        .map(_.getAs[Long]("doc_id")).toSet
      again shouldBe out.map(_.getAs[Long]("doc_id")).toSet
    }
  }

  describe("temperatureMix") {
    // 900/100 source skew: S = 30 + 10 = 40, so rate_A = 0.5·1000/(40·30)
    // ≈ 0.4167 and rate_B = 0.5·1000/(40·10) = 1.25 → capped at 1.0
    def skewed = {
      import spark.implicits._
      (0 until 1000).map(i =>
        (i.toLong, s"text $i", "en", if (i < 900) "srcA" else "srcB"))
        .toDF("doc_id", "text", "lang", "source")
    }

    it("flattens source skew: minority kept whole, majority downsampled") {
      val out = Sampling.temperatureMix(skewed).collect()
      val rates = out.map(r => (r.getString(1), r.getLong(2))).toMap
      rates("srcB") shouldBe 1000000L // sqrt smoothing caps the minority at keep-all
      rates("srcA") shouldBe 416667L // round(1e6·0.5·1000/(40·30))
      // kept counts follow the rates (hash gate is uniform; generous band)
      val kept = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
      kept("srcB") shouldBe 100
      kept("srcA").toDouble should (be >= 315.0 and be <= 435.0)
      // expectation: ~475 of 1000 total ≈ MixTargetFrac·N
    }

    it("is deterministic across runs") {
      def ids = Sampling.temperatureMix(skewed).collect().map(_.getLong(0)).toSet
      ids shouldBe ids
    }
  }

  describe("leakageSafeSplit") {
    it("no near-dup component ever straddles train and val; isolated docs keep the naive split") {
      import spark.implicits._
      val d = docs(200)
      // synthetic component table: docs 0-9 form one component (rep 0),
      // docs 10-14 another (rep 10); everyone else isolated
      val comp = ((0L to 9L).map(_ -> 0L) ++ (10L to 14L).map(_ -> 10L))
        .toDF("doc_id", "rep")
      val out = Sampling.leakageSafeSplit(d, comp).collect()
        .map(r => r.getLong(0) -> ((r.getLong(3), r.getString(4)))).toMap
      // split coherence within each component
      (0L to 9L).map(out(_)._2).toSet should have size 1
      (10L to 14L).map(out(_)._2).toSet should have size 1
      // the naive per-doc decision, computed directly from the same gate
      val naive = d.select(col("doc_id"),
          org.apache.spark.sql.functions.when(
            pmod(graft.functions.PortableHash.h31("split", col("doc_id").cast("string")),
              lit(1000L)) < Sampling.ValPerMille, "val").otherwise("train").as("s"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // the exact contract: every doc gets its REPRESENTATIVE's naive
      // split — isolated docs (rep = self) degrade to the per-doc split
      val repOf = (id: Long) => if (id <= 9L) 0L else if (id <= 14L) 10L else id
      (0L until 200L).foreach(id => out(id)._2 shouldBe naive(repOf(id)))
    }
  }

  describe("cappedPerSource") {
    it("keeps at most cap docs per source, row-identical to the window reference") {
      import org.apache.spark.sql.expressions.Window
      val d = docs(90) // 3 sources x 30 docs
      val out = Sampling.cappedPerSource(d, cap = 7).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      out.groupBy(_._1).foreach { case (_, rows) => rows.size should be <= 7 }
      // reference: ranking window over the same (hash, doc_id) priority
      val h = graft.functions.PortableHash.h31("cap", col("doc_id").cast("string"))
      val w = Window.partitionBy(col("source")).orderBy(h.asc, col("doc_id").asc)
      val ref = d.select(col("source"), col("doc_id"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 7)
        .select(col("source"), col("rank").cast("int"), col("doc_id")).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      out shouldBe ref
    }

    it("a new document displaces at most the boundary entry per source") {
      val before = Sampling.cappedPerSource(docs(90), cap = 7).collect()
        .map(r => (r.getString(0), r.getLong(2))).toSet
      val after = Sampling.cappedPerSource(docs(93), cap = 7).collect()
        .map(r => (r.getString(0), r.getLong(2))).toSet
      // each of the 3 sources gained one candidate doc → at most one swap each
      (before -- after).size should be <= 3
    }
  }

  describe("weightedSample") {
    import spark.implicits._

    def scored(rows: Seq[(Long, Double)]) =
      rows.toDF("doc_id", "quality_score")

    it("rate is floor(score*base) capped at 1e6; score >= 5/6 always survives") {
      val rows = (1L to 600L).map(i => (i, if (i <= 300) 1.0 else 0.9))
      val out = Sampling.weightedSample(scored(rows)).collect()
      out.foreach { r =>
        val expect = math.min(1000000L,
          math.floor(r.getDouble(1) * Sampling.WeightBasePpm).toLong)
        r.getLong(2) shouldBe expect
      }
      // both 1.0 and 0.9 map to rate >= 1e6 → certain keep
      out.length shouldBe 600
    }

    it("keep fraction tracks the score and zero-score docs never survive") {
      val n = 4000L
      val rows = (1L to n).map(i => (i, if (i % 2 == 0) 0.5 else 0.0))
      val out = Sampling.weightedSample(scored(rows)).collect()
      out.foreach(_.getDouble(1) shouldBe 0.5) // no zero-score doc kept
      // rate 600000 ppm over 2000 docs: expect ~1200, generous hash wiggle
      out.length.toDouble should (be >= 1050.0 and be <= 1350.0)
    }

    it("is deterministic and stable under corpus growth") {
      def kept(n: Long): Set[Long] =
        Sampling.weightedSample(scored((1L to n).map(i => (i, 0.4))))
          .collect().map(_.getLong(0)).toSet
      val small = kept(300)
      small.subsetOf(kept(900)) shouldBe true
      kept(300) shouldBe small
    }
  }

  describe("weightedReservoirPerSource") {
    import spark.implicits._

    // two quality tiers realized through TEXT (the operator derives its
    // weights from qualityScore): distinct-token docs score ~0.92, docs
    // of one repeated token score ~0.50 — race odds ~0.65 : 0.35
    def twoTier(nSources: Int) = {
      val hi = (1 to 60).map(i => s"w$i").mkString(" ")
      val lo = Seq.fill(60)("rep").mkString(" ")
      (0 until nSources).flatMap { s =>
        Seq((s * 2L, hi, "en", s"src$s"), (s * 2L + 1L, lo, "en", s"src$s"))
      }.toDF("doc_id", "text", "lang", "source")
    }

    it("fixed size per source, keys match the explicit E-S formula") {
      val d = twoTier(20)
      val out = Sampling.weightedReservoirPerSource(d, k = 1).collect()
      out.length shouldBe 20 // exactly one winner per source
      // replay one winner's race key by hand
      val r0 = out.head
      val h = d.filter(col("doc_id") === r0.getLong(2))
        .select(graft.functions.PortableHash.h31("res", col("doc_id").cast("string")))
        .collect()(0).getLong(0)
      val q = graft.ops.TextOps.qualityScore(d)
        .filter(col("doc_id") === r0.getLong(2))
        .select("quality_score").collect()(0).getDouble(0)
      val expect = math.rint(math.log((h + 1).toDouble / 2147483648.0) / q * 1e6) / 1e6
      r0.getDouble(3) shouldBe expect
    }

    it("inclusion tracks the weight: high-quality docs win most single-slot races") {
      val wins = Sampling.weightedReservoirPerSource(twoTier(50), k = 1)
        .collect().map(_.getLong(2)).count(_ % 2 == 0) // even ids = high tier
      // p(high wins) = w_hi/(w_hi+w_lo) ~ 0.65 over 50 independent races;
      // the draw is a fixed hash, so this count is DETERMINISTIC - the
      // range just documents the statistical reading
      wins should be >= 25
      wins should be <= 45
    }

    it("fills from the remaining pool when k exceeds a tier") {
      val out = Sampling.weightedReservoirPerSource(twoTier(5), k = 2).collect()
      out.length shouldBe 10 // both docs of every source, ranked
      out.map(r => (r.getString(0), r.getInt(1))).toSet.size shouldBe 10
    }
  }
}

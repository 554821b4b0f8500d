package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.ops.Privacy

class PrivacySpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  // one day, one event_type: 6 rows in value-bucket 0 (safe at k=5),
  // 2 rows in bucket 9 (at risk)
  private def ev = ((1L to 6L).map(i => (i, "click", 1700000000000L, 3.0)) ++
    Seq((7L, "click", 1700000000000L, 95.0), (8L, "click", 1700000000000L, 97.5)))
    .map { case (id, t, ms, v) => (id, t, new java.sql.Timestamp(ms), v) }
    .toDF("event_id", "event_type", "ts", "value")

  describe("kAnonymityReport") {
    it("counts classes, at-risk rows, and the exact integer-ppm risk share") {
      val r = Privacy.kAnonymityReport(ev).collect()(0)
      r.getString(0) shouldBe "click"
      r.getLong(1) shouldBe 2L // n_classes
      r.getLong(2) shouldBe 8L // n_rows
      r.getLong(3) shouldBe 2L // rows_at_risk
      r.getLong(4) shouldBe 2L // min_class
      r.getLong(5) shouldBe 250000L // 2/8 exactly
    }
  }

  describe("kAnonymize") {
    it("suppresses quasi columns only for rows in small classes") {
      val rows = Privacy.kAnonymize(ev).collect()
        .map(r => r.getLong(0) -> ((r.isNullAt(2), r.isNullAt(3), r.getLong(4)))).toMap
      (1L to 6L).foreach(id => rows(id) shouldBe ((false, false, 0L)))
      Seq(7L, 8L).foreach(id => rows(id) shouldBe ((true, true, 1L)))
    }

    it("after suppression every visible class is >= k") {
      val out = Privacy.kAnonymize(ev)
      val sizes = out.filter(org.apache.spark.sql.functions.col("suppressed") === 0L)
        .groupBy("event_type", "day", "vb").count()
        .collect().map(_.getLong(3))
      sizes.foreach(_ should be >= Privacy.KAnon)
    }
  }

  describe("lDiversityReport") {
    it("flags the k-anonymous-but-homogeneous class") {
      // bucket 0: 6 rows from 4 distinct users (diverse at l=3, and safe
      // under k=5); bucket 9: 5 rows ALL from user 42 - k-anonymous at
      // k=5 yet fully re-identifying, which only the diversity audit sees
      val rows = ((1L to 6L).map(i => (i, (i % 4) + 1, "click", 1700000000000L, 3.0)) ++
        (7L to 11L).map(i => (i, 42L, "click", 1700000000000L, 95.0)))
        .map { case (id, u, t, ms, v) => (id, u, t, new java.sql.Timestamp(ms), v) }
        .toDF("event_id", "user_id", "event_type", "ts", "value")
      val k = Privacy.kAnonymityReport(rows).collect()(0)
      k.getLong(3) shouldBe 0L // no class below k=5: k-anonymity is happy
      val r = Privacy.lDiversityReport(rows).collect()(0)
      r.getLong(1) shouldBe 2L  // n_classes
      r.getLong(3) shouldBe 1L  // low_classes: the homogeneous bucket
      r.getLong(4) shouldBe 5L  // its 5 rows are at risk
      r.getLong(5) shouldBe 1L  // min_diversity: one user
      r.getLong(6) shouldBe 454545L // 5/11 in integer ppm
    }
  }

  describe("tClosenessReport") {
    it("flags the diverse-but-skewed class that l-diversity passes") {
      // global (incl. the skewed class): u1=7, u2=7, u3=10 over N=24.
      // bucket 0 (18 rows, 6/6/6) sits near the global mix (TVD = 1/12);
      // bucket 9 (6 rows) is DIVERSE at l=3 (users 1,2,3 all present)
      // but skewed toward user 3 (1,1,4): TVD = (18+18+36)/(2*6*24)
      // = 1/4 -> 250000 ppm exactly
      val rows = (
        (1 to 6).map(i => (i.toLong, 1L, 3.0)) ++
        (7 to 12).map(i => (i.toLong, 2L, 3.0)) ++
        (13 to 18).map(i => (i.toLong, 3L, 3.0)) ++
        Seq((19L, 1L, 95.0), (20L, 2L, 95.0)) ++
        (21 to 24).map(i => (i.toLong, 3L, 95.0)))
        .map { case (id, u, v) =>
          (id, u, "click", new java.sql.Timestamp(1700000000000L), v) }
        .toDF("event_id", "user_id", "event_type", "ts", "value")
      val ld = Privacy.lDiversityReport(rows).collect()(0)
      ld.getLong(3) shouldBe 0L // both classes diverse: l-diversity is happy
      val t = Privacy.tClosenessReport(rows, tPpm = 200000L).collect()(0)
      t.getLong(1) shouldBe 2L      // n_classes
      t.getLong(3) shouldBe 1L      // far_classes: the skewed bucket
      t.getLong(4) shouldBe 6L      // its 6 rows at risk
      t.getLong(5) shouldBe 250000L // exact integer-ppm TVD of the skew
      t.getLong(6) shouldBe 250000L // 6/24 risk share in ppm
    }


    it("survives billion-scale counts (the DECIMAL path; BIGINT would overflow)") {
      // two classes of 4e9 rows each, mirrored skews: per-row products
      // reach |3e9*8e9 - 4e9*4e9| = 8e18 and the scaled numerator ~1.6e25
      // - far beyond BIGINT; exact TVD is still 1/4 = 250000 ppm
      val b = 1000000000L
      val ts0 = new java.sql.Timestamp(1700000000000L)
      val cu = Seq(
        ("click", new java.sql.Date(ts0.getTime), 0L, 1L, 3 * b),
        ("click", new java.sql.Date(ts0.getTime), 0L, 2L, 1 * b),
        ("click", new java.sql.Date(ts0.getTime), 9L, 1L, 1 * b),
        ("click", new java.sql.Date(ts0.getTime), 9L, 2L, 3 * b))
        .toDF("event_type", "day", "vb", "user_id", "c_u")
      val t = Privacy.tClosenessFromCounts(cu, tPpm = 200000L).collect()(0)
      t.getLong(5) shouldBe 250000L // max_tvd_ppm, exact
      t.getLong(3) shouldBe 2L      // both mirrored skews are far
    }

    it("a class mirroring the global distribution has TVD exactly zero") {
      val rows = ((1 to 4).map(i => (i.toLong, (i % 2).toLong + 1, 3.0)) ++
        (5 to 8).map(i => (i.toLong, (i % 2).toLong + 1, 95.0)))
        .map { case (id, u, v) =>
          (id, u, "click", new java.sql.Timestamp(1700000000000L), v) }
        .toDF("event_id", "user_id", "event_type", "ts", "value")
      val t = Privacy.tClosenessReport(rows).collect()(0)
      t.getLong(5) shouldBe 0L // max_tvd_ppm: both classes mirror global
      t.getLong(3) shouldBe 0L
    }
  }

  describe("tClosenessApply") {
    // the CASCADE fixture: class A (bucket 0) = 10 rows all u1;
    // class B (bucket 1) = 10 rows 5 u1 / 5 u2; class C (bucket 2) =
    // 80 rows 10 u1 / 70 u2. Global: u1=25, u2=75 over N=100.
    //   round 1: TVD(A)=750000, TVD(B)=250000, TVD(C)=125000 ppm
    //            -> at t=300000 only A is far (the one-shot answer)
    //   round 2: with A gone the global shifts to u1=15/u2=75, and
    //            TVD(B)=333333 ppm -> B is NOW far; C settles at 0
    // so apply must drop A *and* B where one-shot filtering keeps B.
    def cascade = (
      (1 to 10).map(i => (i.toLong, 1L, 3.0)) ++
      (11 to 15).map(i => (i.toLong, 1L, 13.0)) ++
      (16 to 20).map(i => (i.toLong, 2L, 13.0)) ++
      (21 to 30).map(i => (i.toLong, 1L, 23.0)) ++
      (31 to 100).map(i => (i.toLong, 2L, 23.0)))
      .map { case (id, u, v) =>
        (id, u, "click", new java.sql.Timestamp(1700000000000L), v) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")

    it("iterated suppression catches the cascade one-shot filtering misses") {
      // the one-shot view: exactly ONE far class on the original table
      Privacy.tClosenessReport(cascade, tPpm = 300000L)
        .collect()(0).getLong(3) shouldBe 1L
      val out = Privacy.tClosenessApply(cascade, tPpm = 300000L)
      out.select("event_id").collect().map(_.getLong(0)).toSet shouldBe
        (21L to 100L).toSet
    }

    it("the output table's own audit passes at t") {
      val out = Privacy.tClosenessApply(cascade, tPpm = 300000L)
      val audit = Privacy.tClosenessReport(out, tPpm = 300000L).collect()(0)
      audit.getLong(3) shouldBe 0L // far_classes
      audit.getLong(5) should be <= 300000L // max_tvd_ppm
    }

    it("is idempotent, and a fully-close table passes through whole") {
      val once = Privacy.tClosenessApply(cascade, tPpm = 300000L)
      Privacy.tClosenessApply(once, tPpm = 300000L)
        .select("event_id").collect().map(_.getLong(0)).toSet shouldBe
        once.select("event_id").collect().map(_.getLong(0)).toSet
      // the mirror fixture from the report spec: TVD 0 everywhere
      val mirror = ((1 to 4).map(i => (i.toLong, (i % 2).toLong + 1, 3.0)) ++
        (5 to 8).map(i => (i.toLong, (i % 2).toLong + 1, 95.0)))
        .map { case (id, u, v) =>
          (id, u, "click", new java.sql.Timestamp(1700000000000L), v) }
        .toDF("event_id", "user_id", "event_type", "ts", "value")
      Privacy.tClosenessApply(mirror).count() shouldBe 8L
    }
  }

}

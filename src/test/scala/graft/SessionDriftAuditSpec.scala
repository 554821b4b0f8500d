package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.streaming.{SessionDriftAudit, Sessionize}

/** The composed session-length drift audit end to end: sessionization's
  * emitted micro-batches score near zero PSI while traffic matches the
  * reference, a planted batch of pathologically long sessions is flagged,
  * and the metrics sink stays exactly-once under batch replay.
  */
class SessionDriftAuditSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private val GapMs = 10000L
  private val CapMs = 10000000L

  private def ev(user: String, sec: Long) =
    Sessionize.SEvent(user, new java.sql.Timestamp(sec * 1000L))

  /** A tight session per user: events at +0/+5/+10 s, closed by a far
    * event — span 10 s, recorded length 20 s (end = last + gap) → bin 0.
    */
  private def tightRun(user: String, startSec: Long): Seq[Sessionize.SEvent] =
    Seq(ev(user, startSec), ev(user, startSec + 5), ev(user, startSec + 10),
      ev(user, startSec + 100))

  // reference: batch-mode sessionization of known-good traffic (tight
  // runs; the batch flush also emits the closer-event singletons, so the
  // reference distribution includes both shapes the stream will emit)
  private def reference = {
    import spark.implicits._
    val events = (0 until 30).flatMap(i => tightRun(s"r$i", 0))
    SessionDriftAudit.referenceFromSessions(
      Sessionize.sessionize(events.toDS(), GapMs, CapMs).toDF())
  }

  describe("SessionDriftAudit") {
    it("stays quiet on in-distribution sessions and flags a planted long-session batch") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-sess-drift").toString
      val (metricsDir, ckpt) = (s"$dir/metrics", s"$dir/ckpt")
      val ref = reference

      val mem = MemoryStream[Sessionize.SEvent]
      val q = SessionDriftAudit.start(
        mem.toDS(), ref, metricsDir, ckpt, GapMs, CapMs)
      try {
        // batch of in-distribution sessions (fresh users: no dangling state)
        mem.addData((0 until 30).flatMap(i => tightRun(s"a$i", 0)): _*)
        q.processAllAvailable()
        // planted drift: 90 events over 445 s per user, gap-closed — length
        // 455 s lands in the top (capped) bin, nowhere near the reference
        mem.addData((0 until 10).flatMap { i =>
          (300L to 745L by 5L).map(t => ev(s"b$i", t)) :+ ev(s"b$i", 2000L)
        }: _*)
        q.processAllAvailable()
      } finally q.stop()

      val psi = spark.read.parquet(metricsDir)
        .select(col("batch_id").cast("long"), col("psi"), col("n_cur"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      // every non-empty emitted batch scored exactly once
      psi.map(_._1).distinct.length shouldBe psi.length
      // quiet bound 0.15: the +1 Laplace smoothing alone contributes ~0.09
      // when a 30-session batch scores against the 60-session reference
      // (same-bin mass, different totals) — an order of magnitude under
      // the planted batch's score either way
      val flagged = psi.filter(_._2 > 1.0)
      val quiet = psi.filter(_._2 < 0.15)
      // exactly one drifted batch, and it is the 10-long-session one
      flagged.length shouldBe 1
      flagged.head._3 shouldBe 10L
      // the in-distribution batch scored near zero
      quiet.map(_._3) should contain(30L)
      // nothing ambiguous in between
      psi.length shouldBe (flagged.length + quiet.length)
    }

    it("a replayed audit batch is exactly-once in the metrics sink") {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-sess-drift-rt").toString
      val ref = reference
      // one emitted micro-batch of sessions, replayed verbatim (the
      // crash-after-commit case for the composed foreachBatch body)
      val sessions = Sessionize.sessionize(
        (0 until 5).flatMap(i => tightRun(s"c$i", 0)).toDS(), GapMs, CapMs).toDF()
      graft.streaming.StreamingDrift.processBatch(
        SessionDriftAudit.sessionLengths(sessions), 7L, ref, s"$dir/m", "k", "len_s")
      graft.streaming.StreamingDrift.processBatch(
        SessionDriftAudit.sessionLengths(sessions), 7L, ref, s"$dir/m", "k", "len_s")
      val rows = spark.read.parquet(s"$dir/m")
      rows.count() shouldBe 1L
      rows.select(col("batch_id").cast("long")).collect()(0).getLong(0) shouldBe 7L
    }
  }
}

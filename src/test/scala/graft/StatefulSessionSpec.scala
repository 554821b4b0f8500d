package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Sessionize
import graft.streaming.Sessionize.SEvent

/** Arbitrary-state streaming (flatMapGroupsWithState): the custom
  * gap+duration-cap session policy, event-time-timeout eviction, and the
  * same pipeline running on the RocksDB state store provider.
  */
class StatefulSessionSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
  private def at(u: String, offsetSec: Int) =
    SEvent(u, new java.sql.Timestamp(base + offsetSec * 1000L))

  describe("batch-mode sessionize with gap + cap policy") {
    it("splits on gaps AND caps a continuous run (built-in session_window cannot)") {
      import spark.implicits._
      // u1: continuous 30s cadence — no gap ever exceeds 60s, so
      // session_window would merge all 10 events; the 120s cap must split
      val continuous = (0 until 10).map(i => at("u1", i * 30))
      // u2: two bursts separated by a 10-minute gap
      val bursts = Seq(at("u2", 0), at("u2", 10), at("u2", 600))
      val out = Sessionize.sessionize(
          (continuous ++ bursts).toDS(), gapMs = 60000L, capMs = 120000L)
        .collect().toSeq

      val u1 = out.filter(_.user_id == "u1").sortBy(_.session_start.getTime)
      u1.map(s => (s.closed_by, s.n_events)) shouldBe Seq(("cap", 5L), ("flush", 5L))
      u1.map(_.session_start.getTime - base) shouldBe Seq(0L, 150000L)
      u1.map(_.session_end.getTime - base) shouldBe Seq(180000L, 330000L) // last + gap

      val u2 = out.filter(_.user_id == "u2").sortBy(_.session_start.getTime)
      u2.map(s => (s.closed_by, s.n_events)) shouldBe Seq(("gap", 2L), ("flush", 1L))
    }
  }

  describe("streaming sessionize with event-time timeout") {
    it("closes idle sessions when the watermark passes last-event + gap") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = MemoryStream[SEvent]
      val sessions = Sessionize.sessionize(
        mem.toDS(), gapMs = 60000L, capMs = 600000L, watermarkDelay = "10 seconds")
      val ckpt = java.nio.file.Files.createTempDirectory("graft-fmgws").toString
      val sink = s"sessions_${System.nanoTime()}"
      val q = sessions.writeStream.outputMode("append").format("memory")
        .queryName(sink).option("checkpointLocation", ckpt).start()
      def rows() = spark.table(sink)
        .as[Sessionize.Session].collect().toSeq
      try {
        mem.addData(at("u1", 0), at("u1", 30))
        q.processAllAvailable()
        rows() shouldBe empty // session still open, nothing timed out

        // far-future event: watermark → 09:59:50+20min ≫ u1 last + gap
        mem.addData(at("u9", 1200))
        q.processAllAvailable()
        val closed = rows()
        closed.map(_.user_id) shouldBe Seq("u1")
        closed.head.closed_by shouldBe "timeout"
        closed.head.n_events shouldBe 2L
        closed.head.session_end.getTime - base shouldBe 90000L // 30s + 60s gap
      } finally q.stop()
    }
  }

  describe("cross-batch out-of-order arrival") {
    it("a late-but-within-watermark event extends the open session backward") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = MemoryStream[SEvent]
      // generous watermark so a genuinely out-of-order event still clears
      // the pre-operator late-row filter in the NEXT micro-batch
      val sessions = Sessionize.sessionize(
        mem.toDS(), gapMs = 60000L, capMs = 600000L, watermarkDelay = "120 seconds")
      val ckpt = java.nio.file.Files.createTempDirectory("graft-ooo").toString
      val sink = s"ooo_${System.nanoTime()}"
      val q = sessions.writeStream.outputMode("append").format("memory")
        .queryName(sink).option("checkpointLocation", ckpt).start()
      try {
        // batch 1: open session [60s, 90s]; watermark after it = 90s - 120s
        mem.addData(at("u1", 60), at("u1", 90))
        q.processAllAvailable()
        // batch 2: event at 30s — BEFORE the stored session_start, above
        // the watermark. Folds into the open session and must move
        // session_start backward (pre-fix it could only extend lastMs).
        mem.addData(at("u1", 30))
        q.processAllAvailable()
        // batch 3: far-future event advances the watermark past
        // last(90s) + gap(60s) → the u1 session times out and emits
        mem.addData(at("u9", 1200))
        q.processAllAvailable()

        val closed = spark.table(sink).as[Sessionize.Session]
          .collect().filter(_.user_id == "u1").toSeq
        closed should have size 1
        closed.head.closed_by shouldBe "timeout"
        closed.head.n_events shouldBe 3L
        closed.head.session_start.getTime - base shouldBe 30000L // extended back
        closed.head.session_end.getTime - base shouldBe 150000L // 90s + 60s gap
      } finally q.stop()
    }

    it("pins the documented divergence: a late gap-predecessor MERGES, never splits") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = MemoryStream[SEvent]
      val sessions = Sessionize.sessionize(
        mem.toDS(), gapMs = 60000L, capMs = 600000L, watermarkDelay = "300 seconds")
      val ckpt = java.nio.file.Files.createTempDirectory("graft-merge").toString
      val sink = s"merge_${System.nanoTime()}"
      val q = sessions.writeStream.outputMode("append").format("memory")
        .queryName(sink).option("checkpointLocation", ckpt).start()
      try {
        // batch 1: open session [200s, 230s]
        mem.addData(at("u1", 200), at("u1", 230))
        q.processAllAvailable()
        // batch 2: late event at 100s. IN ORDER, 100s→200s is a 100s gap
        // (> 60s): two sessions. The O(1)-state operator folds it into the
        // stored accumulator (gap checked against lastMs=230s, not the true
        // in-order successor) → ONE merged session — the exact divergence
        // Sessionize's scaladoc documents (merge, never split).
        mem.addData(at("u1", 100))
        q.processAllAvailable()
        // advance the watermark far enough to time the session out
        mem.addData(at("u9", 2000))
        q.processAllAvailable()

        val closed = spark.table(sink).as[Sessionize.Session]
          .collect().filter(_.user_id == "u1").toSeq
        closed should have size 1 // merged — in-order replay would yield 2
        closed.head.n_events shouldBe 3L
        closed.head.session_start.getTime - base shouldBe 100000L
        closed.head.session_end.getTime - base shouldBe 290000L // 230s + gap
      } finally q.stop()
    }
  }

  describe("sessionize on the RocksDB state store") {
    it("runs the same stateful pipeline with RocksDBStateStoreProvider") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val mem = MemoryStream[SEvent]
        val sessions = Sessionize.sessionize(
          mem.toDS(), gapMs = 60000L, capMs = 600000L, watermarkDelay = "10 seconds")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-rocksdb").toString
        val sink = s"rocks_${System.nanoTime()}"
        val q = sessions.writeStream.outputMode("append").format("memory")
          .queryName(sink).option("checkpointLocation", ckpt).start()
        try {
          mem.addData(at("u1", 0), at("u1", 30))
          q.processAllAvailable()
          mem.addData(at("u9", 1200))
          q.processAllAvailable()
          // identical semantics on the scale-targeted state backend
          spark.table(sink).as[Sessionize.Session].collect()
            .map(s => (s.user_id, s.closed_by, s.n_events)).toSeq shouldBe
            Seq(("u1", "timeout", 2L))
          q.lastProgress.stateOperators should not be empty
        } finally q.stop()
      } finally {
        prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      }
    }
  }

  describe("complete output mode") {
    it("replaces the full result table each micro-batch") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = MemoryStream[SEvent]
      val counts = mem.toDS().toDF("user_id", "ts").groupBy($"user_id").count()
      val ckpt = java.nio.file.Files.createTempDirectory("graft-complete").toString
      val sink = s"cmp_${System.nanoTime()}"
      val q = counts.writeStream.outputMode("complete").format("memory")
        .queryName(sink).option("checkpointLocation", ckpt).start()
      try {
        mem.addData(at("u1", 0), at("u2", 5))
        q.processAllAvailable()
        mem.addData(at("u1", 30))
        q.processAllAvailable()
        // complete mode: the sink holds exactly the current full table —
        // u1's old count=1 row was replaced, not appended
        spark.table(sink).as[(String, Long)].collect().toSet shouldBe
          Set(("u1", 2L), ("u2", 1L))
      } finally q.stop()
    }
  }

  describe("update output mode") {
    it("emits refined counts per micro-batch for an open window") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = MemoryStream[SEvent]
      val counts = mem.toDS().toDF("user_id", "ts")
        .groupBy($"user_id").count()
      val ckpt = java.nio.file.Files.createTempDirectory("graft-update").toString
      val sink = s"upd_${System.nanoTime()}"
      val q = counts.writeStream.outputMode("update").format("memory")
        .queryName(sink).option("checkpointLocation", ckpt).start()
      try {
        mem.addData(at("u1", 0))
        q.processAllAvailable()
        mem.addData(at("u1", 30))
        q.processAllAvailable()
        // update mode re-emits the refined row each time it changes:
        // the memory sink accumulates 1 then 2
        spark.table(sink).as[(String, Long)].collect().toSeq
          .sortBy(_._2) shouldBe Seq(("u1", 1L), ("u1", 2L))
      } finally q.stop()
    }
  }
}

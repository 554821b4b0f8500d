package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{Sessionize, SessionizeV2}
import graft.streaming.Sessionize.SEvent

/** transformWithState sessionizer (SessionizeV2): the Spark 4 typed-state +
  * timer API must emit EXACTLY what the flatMapGroupsWithState backend
  * emits on the same trace — an API migration, not a semantic change.
  * transformWithState requires the RocksDB state store provider, which is
  * also the 100 TB-scale backend.
  */
class SessionizeV2Spec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
  private def at(u: String, offsetSec: Int) =
    SEvent(u, new java.sql.Timestamp(base + offsetSec * 1000L))

  /** The shared trace: u1 stays open until the watermark closes it; u2
    * closes by gap inside batch 1; u3 trips the duration cap in batch 2.
    */
  private def runTrace(
      make: org.apache.spark.sql.Dataset[SEvent] => org.apache.spark.sql.Dataset[Sessionize.Session],
      tag: String): Seq[(String, String, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[SEvent]
    val sessions = make(mem.toDS())
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft-$tag").toString
    val sink = s"${tag}_${System.nanoTime()}"
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName(sink).option("checkpointLocation", ckpt).start()
    try {
      mem.addData(at("u1", 0), at("u1", 30), at("u2", 0), at("u2", 120))
      q.processAllAvailable()
      mem.addData(at("u3", 200), at("u3", 230), at("u3", 290), at("u3", 330))
      q.processAllAvailable()
      // far-future event drives the watermark past every open session
      mem.addData(at("u9", 3600))
      q.processAllAvailable()
      spark.table(sink).as[Sessionize.Session].collect().toSeq
        .map(s => (s.user_id, s.closed_by,
          s.session_start.getTime - base, s.session_end.getTime - base, s.n_events))
        .sorted
    } finally q.stop()
  }

  describe("SessionizeV2 (transformWithState)") {
    it("emits exactly the flatMapGroupsWithState sessions on the same trace") {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val v2 = runTrace(SessionizeV2.sessionize(_, gapMs = 60000L, capMs = 90000L), "twsv2")
        val v1 = runTrace(Sessionize.sessionize(_, gapMs = 60000L, capMs = 90000L), "fmgws")
        v2 shouldBe v1
        // and the trace exercises all three close reasons
        v2.map(_._2).toSet shouldBe Set("gap", "cap", "timeout")
        // u2: 0s and 120s are 2 gap-lengths apart → first event closes by
        // gap with n=1 as soon as the second arrives
        v2.filter(t => t._1 == "u2" && t._2 == "gap")
          .map(t => (t._3, t._5)) shouldBe Seq((0L, 1L))
      } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }
}

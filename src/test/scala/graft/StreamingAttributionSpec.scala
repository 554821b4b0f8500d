package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingAttribution

/** The watermarked stream-stream interval join end to end over real
  * micro-batch streams: in-window clicks attribute, out-of-window and
  * late clicks don't, the left-outer variant emits unattributed
  * purchases only after the watermark closes their window, and the
  * streamed inner join equals the batch time-binned interval join on
  * identical data.
  */
class StreamingAttributionSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def runBoth(
      clickRows: Seq[Seq[(Long, java.sql.Timestamp)]],
      purchaseRows: Seq[Seq[(Long, Long, java.sql.Timestamp)]],
      joinType: String): Seq[(Long, Long, Option[java.sql.Timestamp], java.sql.Timestamp)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cMem = MemoryStream[(Long, java.sql.Timestamp)]
    val pMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val out = StreamingAttribution.attribute(
      cMem.toDS().toDF("user_id", "click_ts"),
      pMem.toDS().toDF("event_id", "p_user", "purchase_ts"),
      windowSec = 60L, watermarkDelay = "5 seconds", joinType = joinType)
    val q = out.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      clickRows.zipAll(purchaseRows, Seq.empty, Seq.empty).foreach { case (cb, pb) =>
        if (cb.nonEmpty) cMem.addData(cb: _*)
        if (pb.nonEmpty) pMem.addData(pb: _*)
        q.processAllAvailable()
      }
      spark.table("attr_out").collect().map { r =>
        (r.getLong(0), r.getLong(1),
          Option(r.getTimestamp(2)), r.getTimestamp(3))
      }.toSeq
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS attr_out") }
  }

  it("attributes in-window same-user clicks and nothing else") {
    val got = runBoth(
      clickRows = Seq(Seq(
        (7L, ts(100)),  // in window of purchase at 130
        (7L, ts(20)),   // 110s before: outside the 60s window
        (8L, ts(105)))),// other user
      purchaseRows = Seq(Seq((500L, 7L, ts(130)))),
      joinType = "inner")
    got.map(g => (g._1, g._2, g._3.get.getTime / 1000L)) shouldBe Seq((500L, 7L, 100L))
  }

  it("drops a click arriving later than the watermark allows") {
    // the JOIN watermark is the min across BOTH inputs, so both streams
    // must advance before anything is late; after batch 1 the global
    // watermark is ~195, so the click at 100 (behind eviction bound
    // watermark − window = 135) is unbufferable and the purchase at 130
    // (behind the watermark itself) is late — event 501 never attributes
    val got = runBoth(
      clickRows = Seq(
        Seq((9L, ts(200))), // advances the click watermark
        Seq((7L, ts(100))), // arrives behind the eviction bound
        Seq.empty),
      purchaseRows = Seq(
        Seq((900L, 9L, ts(200))), // advances the purchase watermark
        Seq.empty,
        Seq((501L, 7L, ts(130)))),
      joinType = "inner")
    got.filter(_._1 == 501L) shouldBe empty
    // the watermark-advancing pair itself attributed normally
    got.map(_._1) should contain(900L)
  }

  it("left-outer emits the unattributed purchase only after its window closes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cMem = MemoryStream[(Long, java.sql.Timestamp)]
    val pMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val out = StreamingAttribution.attribute(
      cMem.toDS().toDF("user_id", "click_ts"),
      pMem.toDS().toDF("event_id", "p_user", "purchase_ts"),
      windowSec = 60L, watermarkDelay = "5 seconds", joinType = "leftOuter")
    val q = out.writeStream.format("memory").queryName("attr_outer")
      .outputMode("append").start()
    try {
      pMem.addData((600L, 7L, ts(130)))
      cMem.addData((8L, ts(130)))
      q.processAllAvailable()
      // watermark has not passed 130: absence is not yet a fact
      spark.table("attr_outer").count() shouldBe 0L
      // advance BOTH watermarks far past the window end
      cMem.addData((8L, ts(400)))
      pMem.addData((601L, 8L, ts(400)))
      q.processAllAvailable()
      cMem.addData((8L, ts(500)))
      pMem.addData((602L, 8L, ts(500)))
      q.processAllAvailable()
      val rows = spark.table("attr_outer").collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(2)))).toMap
      rows.keySet should contain(600L)
      rows(600L) shouldBe None // unattributed: null click after the close
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS attr_outer") }
  }

  it("join state is EVICTED at watermark minus window — bounded by rate x window, not stream length") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cMem = MemoryStream[(Long, java.sql.Timestamp)]
    val pMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val out = StreamingAttribution.attribute(
      cMem.toDS().toDF("user_id", "click_ts"),
      pMem.toDS().toDF("event_id", "p_user", "purchase_ts"),
      windowSec = 60L, watermarkDelay = "5 seconds", joinType = "inner")
    val q = out.writeStream.format("memory").queryName("attr_state")
      .outputMode("append").start()
    try {
      // 40 clicks buffered around t=100
      cMem.addData((1L to 40L).map(i => (i, ts(100 + i % 10))): _*)
      pMem.addData((700L, 1L, ts(105)))
      q.processAllAvailable()
      val loaded = q.lastProgress.stateOperators(0).numRowsTotal
      loaded should be >= 40L
      // advance BOTH watermarks far past eviction (wm - window > 110):
      // the 40 buffered clicks can no longer match any future purchase
      cMem.addData((99L, ts(1000)))
      pMem.addData((701L, 99L, ts(1000)))
      q.processAllAvailable()
      cMem.addData((98L, ts(1100)))
      pMem.addData((702L, 98L, ts(1100)))
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators(0).numRowsTotal
      after should be < 10L // the old window's 41+ rows are gone
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS attr_state") }
  }

  it("streamed inner attribution equals the batch binned-range join") {
    val clicks = Seq((7L, ts(100)), (7L, ts(20)), (8L, ts(105)), (9L, ts(126)))
    val purchases = Seq((500L, 7L, ts(130)), (501L, 9L, ts(131)))
    val streamed = runBoth(Seq(clicks), Seq(purchases), "inner")
      .map(g => (g._1, g._2, g._3.get.getTime / 1000L)).toSet
    val batch = graft.ops.Joins.binnedRangeJoin(
        clicks.toDF("user_id", "click_ts")
          .select(col("user_id"), unix_millis(col("click_ts")).as("ts_ms")),
        purchases.toDF("event_id", "p_user", "purchase_ts")
          .select(col("event_id"), col("p_user"),
            (unix_millis(col("purchase_ts")) - 60000L).as("start_ms"),
            unix_millis(col("purchase_ts")).as("end_ms")),
        leftKey = "user_id", rightKey = "p_user",
        leftTsMs = "ts_ms", startMs = "start_ms", endMs = "end_ms",
        binMillis = 60000L)
      .select(col("event_id"), col("p_user"), (col("ts_ms") / 1000L).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    streamed shouldBe batch
    streamed.nonEmpty shouldBe true
  }
}

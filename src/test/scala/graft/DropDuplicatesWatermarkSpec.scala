package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Spark's built-in TTL-state streaming dedup
  * (`dropDuplicatesWithinWatermark`): duplicates arriving within the
  * watermark delay are dropped while per-key state EXPIRES once the
  * watermark passes it — the bounded-state contract that makes streaming
  * dedup survive unbounded key domains (the custom StreamingDedup keeps
  * an EXACT persistent index instead; this is the built-in
  * bounded-memory twin, trading re-admission of old keys for O(live
  * window) state).
  */
class DropDuplicatesWatermarkSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)

  it("drops in-window duplicates but re-admits a key after its state expires") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val deduped = mem.toDS().toDF("k", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
    val q = deduped.writeStream
      .format("memory").queryName("ddw_out").outputMode("append").start()
    try {
      // batch 1: key 1 twice within the window → one survivor
      mem.addData((1L, ts(0)), (1L, ts(1)), (2L, ts(1)))
      q.processAllAvailable()
      // batch 2: watermark still below expiry → duplicate still dropped
      mem.addData((1L, ts(5)))
      q.processAllAvailable()
      // batch 3: advance event time far past 1's state (+10 min delay)
      mem.addData((9L, ts(60)))
      q.processAllAvailable()
      // batch 4: key 1 returns AFTER its state expired → re-admitted
      mem.addData((1L, ts(61)))
      q.processAllAvailable()
      val ks = spark.table("ddw_out").select(col("k")).collect().map(_.getLong(0))
      ks.count(_ == 1L) shouldBe 2 // once per state lifetime, not 4×
      ks.count(_ == 2L) shouldBe 1
      ks.count(_ == 9L) shouldBe 1
    } finally q.stop()
  }
}

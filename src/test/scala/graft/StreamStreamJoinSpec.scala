package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-stream interval join — a Structured Streaming capability beyond
  * the reference's single-stream pipeline: clicks joined to impressions of
  * the same user within [impression, impression + 10 min], both sides
  * watermarked so join state expires.
  */
class StreamStreamJoinSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  describe("watermarked stream-stream interval join") {
    it("matches rows within the interval and expires state") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

      val impressions = MemoryStream[(Long, java.sql.Timestamp)]
      val clicks = MemoryStream[(Long, java.sql.Timestamp)]
      val imp = impressions.toDS().toDF("i_user", "i_ts").withWatermark("i_ts", "10 seconds")
      val clk = clicks.toDS().toDF("c_user", "c_ts").withWatermark("c_ts", "10 seconds")
      val joined = imp.join(clk,
        expr("""i_user = c_user AND c_ts >= i_ts AND c_ts <= i_ts + interval 10 minutes"""))

      val ckpt = java.nio.file.Files.createTempDirectory("graft-ssj").toString
      val sink = s"ssj_out_${System.nanoTime()}"
      val q = joined.writeStream.outputMode("append").format("memory")
        .queryName(sink).option("checkpointLocation", ckpt).start()
      try {
        impressions.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
        q.processAllAvailable()
        // in-window click for user 1; late-window click for user 2 (outside 10 min)
        clicks.addData((1L, ts("2024-01-01 10:05:00")), (2L, ts("2024-01-01 10:20:00")))
        q.processAllAvailable()
        val got = spark.table(sink)
          .select(col("i_user"), col("c_ts").cast("string"))
          .as[(Long, String)].collect().toSet
        got shouldBe Set((1L, "2024-01-01 10:05:00"))
      } finally q.stop()
    }

    it("left-outer emits the null-padded row only after watermark expiry") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

      val impressions = MemoryStream[(Long, java.sql.Timestamp)]
      val clicks = MemoryStream[(Long, java.sql.Timestamp)]
      val imp = impressions.toDS().toDF("i_user", "i_ts").withWatermark("i_ts", "10 seconds")
      val clk = clicks.toDS().toDF("c_user", "c_ts").withWatermark("c_ts", "10 seconds")
      val joined = imp.join(clk,
        expr("""i_user = c_user AND c_ts >= i_ts AND c_ts <= i_ts + interval 10 minutes"""),
        "left_outer")

      val ckpt = java.nio.file.Files.createTempDirectory("graft-ssjo").toString
      val sink = s"ssjo_out_${System.nanoTime()}"
      val q = joined.writeStream.outputMode("append").format("memory")
        .queryName(sink).option("checkpointLocation", ckpt).start()
      try {
        // user 1 converts; user 3 never clicks
        impressions.addData((1L, ts("2024-01-01 10:00:00")), (3L, ts("2024-01-01 10:00:00")))
        clicks.addData((1L, ts("2024-01-01 10:05:00")))
        q.processAllAvailable()
        // watermark has not passed impression+10min: user 3 must NOT be
        // reported unmatched yet (emitting it now could be contradicted by
        // a click still inside the window)
        spark.table(sink).filter(col("c_user").isNull).count() shouldBe 0L
        // advance event time on BOTH sides past the window, twice — the
        // null-padded row emits on the batch AFTER state eviction
        impressions.addData((99L, ts("2024-01-01 11:00:00")))
        clicks.addData((99L, ts("2024-01-01 11:00:00")))
        q.processAllAvailable()
        impressions.addData((98L, ts("2024-01-01 11:30:00")))
        clicks.addData((98L, ts("2024-01-01 11:30:00")))
        q.processAllAvailable()
        val unmatched = spark.table(sink).filter(col("c_user").isNull)
          .select(col("i_user")).as[Long].collect().toSet
        unmatched shouldBe Set(3L)
        // and the matched rows are exactly the in-window conversions
        spark.table(sink).filter(col("c_user").isNotNull)
          .select(col("i_user")).as[Long].collect().toSet shouldBe Set(1L, 99L, 98L)
      } finally q.stop()
    }
  }
}

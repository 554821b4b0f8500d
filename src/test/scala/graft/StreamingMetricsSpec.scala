package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Operational observability of a watermarked job through
  * StreamingQueryListener — the per-micro-batch progress feed an ops
  * dashboard consumes: event-time watermark advancement and the
  * state-store's own count of rows dropped for arriving behind it
  * (`numRowsDroppedByWatermark`). Pinning the metric matters because
  * late-drop is otherwise silent: the output just lacks rows, while the
  * progress feed names the cause and the count.
  */
class StreamingMetricsSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)

  it("reports watermark advance and late-row drops in the progress feed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dropped = new java.util.concurrent.atomic.AtomicLong(0)
    val sawWatermark = new java.util.concurrent.atomic.AtomicReference[String]("")
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        e.progress.stateOperators.foreach { so =>
          dropped.addAndGet(so.numRowsDroppedByWatermark)
        }
        val wm = e.progress.eventTime.get("watermark")
        if (wm != null && wm != "") sawWatermark.set(wm)
      }
    }
    spark.streams.addListener(listener)
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val agg = mem.toDS().toDF("user_id", "ts")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("user_id"))
      .count()
    val q = agg.writeStream.format("memory")
      .queryName("metrics_out").outputMode("append").start()
    try {
      mem.addData((1L, ts(0)), (2L, ts(1)))
      q.processAllAvailable()
      // advance event time far ahead so the watermark passes minute 0-10
      mem.addData((3L, ts(60)))
      q.processAllAvailable()
      // this row is now far behind the watermark → the state store drops
      // it and the progress feed must say so
      mem.addData((1L, ts(2)))
      q.processAllAvailable()
      // one more batch so the last progress (with the drop count) is out
      mem.addData((4L, ts(61)))
      q.processAllAvailable()

      dropped.get() should be >= 1L
      sawWatermark.get() should not be ""
      // and the dropped row really is absent from the finalized output
      val rows = spark.table("metrics_out")
        .select(col("user_id"), col("count")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.getOrElse(1L, 1L) shouldBe 1L // still the single on-time event
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }
}

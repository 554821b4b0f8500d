package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.{Event, UserActivity}
import graft.streaming.ActivityStream

/** Streaming-mode semantics the batch oracle cannot observe
  * (reference parity: FlinkTest.java's MiniCluster test + A8/A9 —
  * append-mode finalization and late-data drop).
  */
class ActivityStreamingSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def ua(id: String, ts: String, tpe: String): UserActivity =
    UserActivity(id, java.sql.Timestamp.valueOf(ts).getTime, Event(tpe, "https://x.com/t"))

  describe("append-mode windowed count over a memory stream") {
    it("emits windows only once watermark-closed and drops too-late rows") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

      val mem = MemoryStream[UserActivity]
      val raw = mem.toDS().select(
        to_json(struct(col("id"), col("date"), col("event"))).cast("binary").as("value"))
      val agg = ActivityStream.aggPipeline(ActivityStream.parseAndClean(raw))

      val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-test").toString
      val sinkName = s"agg_out_${System.nanoTime()}"
      val q = agg.writeStream
        .outputMode("append")
        .format("memory")
        .queryName(sinkName)
        .option("checkpointLocation", ckpt)
        .start()
      def rows(): Set[(String, String, String, Long)] =
        spark.table(sinkName)
          .select(col("id"), col("event_type"), col("window_start").cast("string"), col("count"))
          .as[(String, String, String, Long)].collect().toSet

      try {
        // batch 1: three keep-events in minute 00:12 → window still open
        mem.addData(
          ua("user1", "2023-08-25 00:12:14", "LIKED"),
          ua("user1", "2023-08-25 00:12:45", "COMMENTED"),
          ua("user1", "2023-08-25 00:12:45", "LIKED"))
        q.processAllAvailable()
        rows() shouldBe empty

        // batch 2: event in minute 00:14 advances the watermark to
        // 00:14:20; the engine immediately runs a follow-up empty batch
        // that closes and emits the minute-12 window (processAllAvailable
        // spans both micro-batches)
        mem.addData(ua("user2", "2023-08-25 00:14:30", "LIKED"))
        q.processAllAvailable()
        rows() shouldBe Set(
          ("user1", "liked", "2023-08-25 00:12:00", 2L),
          ("user1", "commented", "2023-08-25 00:12:00", 1L))

        // batch 3: a row far behind the watermark is dropped from state (A9)
        mem.addData(ua("user1", "2023-08-25 00:12:50", "LIKED"))
        q.processAllAvailable()

        // batch 4: push watermark past minute 00:14 to flush the rest
        mem.addData(ua("user9", "2023-08-25 00:20:00", "LIKED"))
        q.processAllAvailable()

        val finalRows = rows()
        // minute-14 window emitted with exactly the one in-time user2 event,
        // and the late user1@00:12:50 row influenced nothing
        finalRows should contain(("user2", "liked", "2023-08-25 00:14:00", 1L))
        finalRows.filter(_._3 == "2023-08-25 00:12:00") shouldBe Set(
          ("user1", "liked", "2023-08-25 00:12:00", 2L),
          ("user1", "commented", "2023-08-25 00:12:00", 1L))
      } finally q.stop()
    }
  }

  describe("watermark-bounded streaming dedup") {
    it("drops duplicate rows arriving within the watermark horizon") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = MemoryStream[(Long, java.sql.Timestamp)]
      val dedup = graft.ops.ActivityOps.distinctRows(
        mem.toDS().toDF("id", "ts"), watermark = Some(("ts", "10 seconds")))
      val ckpt = java.nio.file.Files.createTempDirectory("graft-dedup").toString
      val sink = s"dedup_out_${System.nanoTime()}"
      val q = dedup.writeStream.outputMode("append").format("memory")
        .queryName(sink).option("checkpointLocation", ckpt).start()
      try {
        val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
        mem.addData((1L, t1), (1L, t1), (2L, t1)) // duplicate within batch
        q.processAllAvailable()
        mem.addData((1L, t1)) // duplicate across batches, still in horizon
        q.processAllAvailable()
        spark.table(sink).groupBy("id").count()
          .as[(Long, Long)].collect().toMap shouldBe Map(1L -> 1L, 2L -> 1L)
      } finally q.stop()
    }

    it("dropDuplicatesWithinWatermark dedups a key subset and expires its state") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = MemoryStream[(Long, java.sql.Timestamp)]
      val dedup = graft.ops.ActivityOps.distinctWithinWatermark(
        mem.toDS().toDF("id", "ts"), "ts", "10 seconds", Seq("id"))
      val ckpt = java.nio.file.Files.createTempDirectory("graft-dedup-ww").toString
      val sink = s"dedup_ww_${System.nanoTime()}"
      val q = dedup.writeStream.outputMode("append").format("memory")
        .queryName(sink).option("checkpointLocation", ckpt).start()
      try {
        val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
        // duplicates inside the horizon collapse (within and across batches)
        mem.addData((1L, t1), (1L, t1), (2L, t1))
        q.processAllAvailable()
        mem.addData((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:05")))
        q.processAllAvailable()
        spark.table(sink).groupBy("id").count()
          .as[(Long, Long)].collect().toMap shouldBe Map(1L -> 1L, 2L -> 1L)
        // advance the watermark far past id=1's expiry...
        mem.addData((9L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00")))
        q.processAllAvailable()
        // ...a re-arrival of id=1 is a NEW occurrence: state expired, row
        // emitted again — the bounded-state semantics plain dropDuplicates
        // on a subset key does not have
        mem.addData((1L, java.sql.Timestamp.valueOf("2024-01-01 10:05:01")))
        q.processAllAvailable()
        spark.table(sink).groupBy("id").count()
          .as[(Long, Long)].collect().toMap shouldBe Map(1L -> 2L, 2L -> 1L, 9L -> 1L)
      } finally q.stop()
    }
  }

  describe("append-mode session windows over a memory stream") {
    it("closes a session once the watermark passes last-event + gap") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

      val mem = MemoryStream[(String, java.sql.Timestamp)]
      val df = mem.toDS().toDF("user_id", "ts")
      val agg = graft.ops.ActivityOps.sessionWindowCount(
        df, tsCol = "ts", keyCols = Seq("user_id"), gap = "1 minute",
        watermark = Some("5 seconds"))

      val ckpt = java.nio.file.Files.createTempDirectory("graft-session-test").toString
      val sinkName = s"session_out_${System.nanoTime()}"
      val q = agg.writeStream.outputMode("append").format("memory")
        .queryName(sinkName).option("checkpointLocation", ckpt).start()
      try {
        mem.addData(
          ("u1", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
          ("u1", java.sql.Timestamp.valueOf("2024-01-01 10:00:30"))) // merges
        q.processAllAvailable()
        spark.table(sinkName).count() shouldBe 0 // session still open

        // far-future event closes u1's session via watermark advance
        mem.addData(("u2", java.sql.Timestamp.valueOf("2024-01-01 11:00:00")))
        q.processAllAvailable()
        val rows = spark.table(sinkName)
          .select(col("user_id"), col("session_start").cast("string"),
            col("session_end").cast("string"), col("count"))
          .as[(String, String, String, Long)].collect().toSet
        rows shouldBe Set(("u1", "2024-01-01 10:00:00", "2024-01-01 10:01:30", 2L))
      } finally q.stop()
    }
  }

  describe("kafka source option contract") {
    it("spells every spark-sql-kafka option exactly (no broker needed)") {
      import graft.streaming.ActivityStream
      val cfg = ActivityStream.Config(
        topic = "user_activity", bootstrapServers = "broker:9092",
        startingOffsets = "earliest", groupId = Some("g1"))
      // consumer configs carry the kafka. prefix, source options do not —
      // a misspelling here is the one Kafka failure this image can't surface
      ActivityStream.kafkaOptions(cfg) shouldBe Map(
        "kafka.bootstrap.servers" -> "broker:9092",
        "subscribe" -> "user_activity",
        "startingOffsets" -> "earliest",
        "kafka.group.id" -> "g1")
      // default config: no group id → Spark assigns one (Flink-twin option
      // only when the caller pins it)
      ActivityStream.kafkaOptions(ActivityStream.Config())
        .contains("kafka.group.id") shouldBe false
    }
  }
}

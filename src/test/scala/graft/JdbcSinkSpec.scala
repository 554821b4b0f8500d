package graft

import java.sql.DriverManager

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.{Event, UserActivity}
import graft.streaming.ActivityStream

/** K2-K4/K6 executed for real: the reference's stream → foreachBatch → JDBC
  * append chain (reference: spark/spark_streaming.py:67-92,
  * flink UserActivityInsert.java:66-87) driven end-to-end against embedded
  * Derby — the JDBC engine shipped in Spark's own jars. No Postgres exists
  * in this environment; everything except URL/driver-class (options map,
  * `batchsize` chunking, append semantics, the per-batch persist+count log)
  * is the identical writer code path.
  */
class JdbcSinkSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def ua(id: String, ts: String, tpe: String): UserActivity =
    UserActivity(id, java.sql.Timestamp.valueOf(ts).getTime, Event(tpe, "https://x.com/t"))

  describe("streaming foreachBatch JDBC append into embedded Derby") {
    it("appends filtered rows across micro-batches with batchsize chunking and batch-count logs") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

      val url = s"jdbc:derby:memory:graft${System.nanoTime()};create=true"
      val logs = scala.collection.mutable.ArrayBuffer.empty[String]

      // pre-created target table, like the reference's Postgres DDL —
      // quoted lowercase columns match Spark's dialect-quoted INSERT,
      // VARCHAR (not the dialect's CLOB default) keeps values comparable
      locally {
        val c = DriverManager.getConnection(url)
        try c.createStatement().execute(
          """CREATE TABLE user_activity
            |("id" VARCHAR(64), "date" TIMESTAMP,
            | "event_type" VARCHAR(64), "url" VARCHAR(512))""".stripMargin)
        finally c.close()
      }

      val mem = MemoryStream[UserActivity]
      val raw = mem.toDS().select(
        to_json(struct(col("id"), col("date"), col("event"))).cast("binary").as("value"))
      val out = ActivityStream.rawInsertPipeline(ActivityStream.parseAndClean(raw))

      val cfg = ActivityStream.Config(checkpointLocation =
        java.nio.file.Files.createTempDirectory("graft-jdbc-test").toString)
      // batchSize=2 with >2 rows per micro-batch exercises executeBatch
      // chunking inside Spark's JDBC writer (K3's reference option)
      val sink = ActivityStream.jdbcForeachBatch(
        url, "user_activity", user = "app", password = "app",
        batchSize = 2, driver = "org.apache.derby.jdbc.EmbeddedDriver",
        log = logs += _)
      val q = ActivityStream.writer(out, cfg, sink).start()

      try {
        // micro-batch 1: 3 kept (mixed-case normalized) + 1 filtered out
        mem.addData(
          ua("u1", "2023-08-25 00:12:14", "LIKED"),
          ua("u2", "2023-08-25 00:12:20", "Bookmarked"),
          ua("u1", "2023-08-25 00:12:45", "commented"),
          ua("u3", "2023-08-25 00:12:50", "viewed"))
        q.processAllAvailable()
        // micro-batch 2: appends on top of batch 1's rows
        mem.addData(
          ua("u4", "2023-08-25 00:13:10", "LIKED"),
          ua("u5", "2023-08-25 00:13:11", "liked"),
          ua("u6", "2023-08-25 00:13:12", "liked"))
        q.processAllAvailable()
      } finally q.stop()

      val conn = DriverManager.getConnection(url)
      try {
        val byType = scala.collection.mutable.Map.empty[String, Int]
        val rs = conn.createStatement().executeQuery(
          """SELECT "event_type", COUNT(*) FROM user_activity GROUP BY "event_type"""")
        while (rs.next()) byType(rs.getString(1)) = rs.getInt(2)
        byType.toMap shouldBe Map("liked" -> 4, "bookmarked" -> 1, "commented" -> 1)

        // filtered event never reached the sink; timestamps survived the
        // epoch-millis→TIMESTAMP round trip
        val rs2 = conn.createStatement().executeQuery(
          """SELECT "url", "date" FROM user_activity WHERE "id" = 'u1' AND "event_type" = 'liked'""")
        rs2.next() shouldBe true
        rs2.getString(1) shouldBe "https://x.com/t"
        rs2.getTimestamp(2) shouldBe java.sql.Timestamp.valueOf("2023-08-25 00:12:14")
      } finally conn.close()

      // K6: one count log per processed micro-batch, real row counts
      logs.exists(_.matches("Processing batch \\d+ with 3 rows")) shouldBe true
      logs.count(_.contains("with 3 rows")) shouldBe 2
    }
  }

  describe("idempotent batch-id JDBC writer") {
    it("a replayed batch scrubs its earlier attempt: exactly-once, even after a torn write") {
      import spark.implicits._
      val url = s"jdbc:derby:memory:graftid${System.nanoTime()};create=true"
      locally {
        val c = DriverManager.getConnection(url)
        try c.createStatement().execute(
          """CREATE TABLE activity_eo
            |("id" VARCHAR(64), "event_type" VARCHAR(64),
            | "graft_batch_id" BIGINT)""".stripMargin)
        finally c.close()
      }
      val logs = scala.collection.mutable.ArrayBuffer.empty[String]
      val sink = ActivityStream.jdbcIdempotentForeachBatch(
        url, "activity_eo", user = "app", password = "app", batchSize = 2,
        driver = "org.apache.derby.jdbc.EmbeddedDriver", log = logs += _)

      def rows(): Seq[(String, String, Long)] = {
        val c = DriverManager.getConnection(url)
        try {
          val rs = c.createStatement().executeQuery(
            """SELECT "id", "event_type", "graft_batch_id" FROM activity_eo""")
          val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
          while (rs.next()) buf += ((rs.getString(1), rs.getString(2), rs.getLong(3)))
          buf.toSeq
        } finally c.close()
      }

      val b0 = Seq(("u1", "liked"), ("u2", "commented")).toDF("id", "event_type")
      val b1 = Seq(("u3", "liked"), ("u4", "bookmarked"), ("u5", "liked"))
        .toDF("id", "event_type")

      sink(b0, 0L)
      // TORN first attempt of batch 1: only part of it reached the table
      // before the crash (inserted out-of-band, as a failed executor
      // batch would leave it)
      locally {
        val c = DriverManager.getConnection(url)
        try c.createStatement().execute(
          """INSERT INTO activity_eo VALUES ('u3', 'liked', 1)""")
        finally c.close()
      }
      // the checkpoint replays batch 1 in full: the DELETE scrubs the
      // torn rows, the insert lands the batch exactly once
      sink(b1, 1L)
      rows().sorted shouldBe Seq(
        ("u1", "liked", 0L), ("u2", "commented", 0L),
        ("u3", "liked", 1L), ("u4", "bookmarked", 1L), ("u5", "liked", 1L))
      logs.exists(_.startsWith("Scrubbed 1 rows from a replayed attempt of batch 1")) shouldBe true

      // a full crash-after-write retry is also a no-op net of itself
      sink(b1, 1L)
      rows().size shouldBe 5
      rows().count(_._3 == 1L) shouldBe 3
    }
  }
}

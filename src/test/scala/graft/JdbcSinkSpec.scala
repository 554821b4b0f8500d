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
}

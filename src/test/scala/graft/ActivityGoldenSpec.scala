package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.model.{Event, UserActivity}
import graft.ops.ActivityOps
import graft.streaming.ActivityStream

/** Golden test transcribing the reference's Spark unit test verbatim
  * (reference: spark/spark_test/spark-test.py:31-83 — same epochs, same
  * expected rows; FIXTURES.md §2). Runs the streaming transform in batch
  * mode, exactly as the reference test does: `withWatermark` is a no-op on
  * batch frames so all windows emit.
  */
class ActivityGoldenSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private val goldenInput = Seq(
    UserActivity("user1", 1692922334000L, Event("LIKED", "https://x.com/1")),
    UserActivity("user1", 1692922365000L, Event("COMMENTED", "https://x.com/2")),
    UserActivity("user1", 1692922365000L, Event("LIKED", "https://x.com/2")),
    UserActivity("user2", 1692922399000L, Event("LIKED", "https://x.com/3")),
    UserActivity("user3", 1692922401000L, Event("VIEWED", "https://x.com/4")))

  private val expected = Set(
    ("user1", "liked", "2023-08-25 00:12:00", "2023-08-25 00:13:00", 2L),
    ("user1", "commented", "2023-08-25 00:12:00", "2023-08-25 00:13:00", 1L),
    ("user2", "liked", "2023-08-25 00:13:00", "2023-08-25 00:14:00", 1L))

  describe("reference golden pipeline (spark-test.py parity)") {
    it("filtered 1-min windowed counts match the hand-computed rows") {
      import spark.implicits._
      // typed rows → JSON bytes → the full production parse path (P14+P1+P2)
      val raw = goldenInput.toDS().select(
        to_json(struct(col("id"), col("date"), col("event"))).cast("binary").as("value"))
      val agg = ActivityStream.aggPipeline(ActivityStream.parseAndClean(raw))
      val got = agg.select(
          col("id"), col("event_type"),
          col("window_start").cast("string"), col("window_end").cast("string"),
          col("count"))
        .as[(String, String, String, String, Long)]
        .collect().toSet
      got shouldBe expected
    }

    it("PERMISSIVE json parse drops malformed events via the null filter") {
      import spark.implicits._
      val raw = (Seq("not json", """{"id":"u1","date":bad}""") :+
          """{"id":"user9","date":1692922334000,"event":{"event_type":"LIKED","url":"u"}}""")
        .toDF("json").select(col("json").cast("binary").as("value"))
      val clean = ActivityStream.parseAndClean(raw)
      val rows = ActivityOps.filterEvents(clean, Seq("liked", "commented")).collect()
      rows.map(_.getString(0)).toSeq shouldBe Seq("user9")
    }

    it("generator output round-trips through the production parse path") {
      import spark.implicits._
      val base = Seq((0L, java.sql.Timestamp.valueOf("2023-08-25 00:12:14")),
        (7L, java.sql.Timestamp.valueOf("2023-08-25 00:12:45")))
        .toDF("value", "timestamp")
      val clean = ActivityStream.parseAndClean(
        graft.streaming.ActivityGenerator.toActivityJson(base))
      val got = clean.select("id", "event_type").as[(String, String)].collect().toSet
      got shouldBe Set(("1", "liked"), ("8", "commented"))
    }
  }
}

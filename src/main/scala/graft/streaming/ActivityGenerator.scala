package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S5 twin: synthetic `user_activity` event generator
  * (reference: generate_data/kafka_producer.py:34-52 — random user "1".."10",
  * 4 event types, faker URL, epoch-millis now, ~1.25 events/s).
  *
  * Built on the `rate` streaming source + pure expressions, so the generator
  * itself scales to any events/s and runs without Kafka; the output column
  * is the same `value: binary` JSON the Kafka source yields, so it plugs
  * straight into ActivityStream.parseAndClean.
  */
object ActivityGenerator {

  val eventTypes: Seq[String] = Seq("liked", "viewed", "bookmarked", "commented")

  /** JSON-encode the reference event shape from (value, timestamp) rows —
    * also used batch-side in tests via a manually built frame.
    */
  def toActivityJson(rows: DataFrame): DataFrame = {
    val types = array(eventTypes.map(lit): _*)
    rows.select(
      to_json(struct(
        (pmod(col("value"), lit(10)) + 1).cast("string").as("id"),
        unix_millis(col("timestamp")).as("date"),
        struct(
          element_at(types, (pmod(col("value"), lit(4)) + 1).cast("int")).as("event_type"),
          concat(lit("https://example.com/p/"), col("value")).as("url")
        ).as("event")
      )).cast("binary").as("value"))
  }

  /** Streaming generator at `eventsPerSecond` (reference default ≈ 1.25). */
  def stream(spark: SparkSession, eventsPerSecond: Double = 1.25): DataFrame =
    toActivityJson(
      spark.readStream.format("rate")
        .option("rowsPerSecond", math.max(1, math.round(eventsPerSecond)).toString)
        .load())
}

package graft.model

import org.apache.spark.sql.types._

/** Typed twin of the reference's event POJOs
  * (reference: flink/src/main/java/com/flink/UserActivityFilterAgg.java:32-41).
  */
case class Event(event_type: String, url: String)

/** Typed activity row (reference: spark/spark_streaming.py:28-37 declares the
  * same shape as a nested StructType; all fields nullable).
  */
case class UserActivity(id: String, date: Long, event: Event)

/** Declared (never inferred) schemas for the `user_activity` JSON event
  * stream, mirroring the reference's consumer-side StructTypes
  * (reference: spark/spark_streaming.py:28-37, spark/spark_test/spark-test.py:17-26).
  */
object Schemas {
  val eventSchema: StructType = StructType(Seq(
    StructField("event_type", StringType, nullable = true),
    StructField("url", StringType, nullable = true)))

  val activitySchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = true),
    StructField("date", LongType, nullable = true),
    StructField("event", eventSchema, nullable = true)))

  /** Windowed-aggregate output shape shared by both reference engines
    * (reference: UserActivityFilterAgg.java:59-62 emits
    * (id, event_type, window start, window end, count); Spark side:
    * spark_streaming.py:65). We standardize count on `bigint`
    * (the reference diverges: Spark long vs Flink int).
    */
  val windowedCountSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = true),
    StructField("event_type", StringType, nullable = true),
    StructField("window_start", TimestampType, nullable = true),
    StructField("window_end", TimestampType, nullable = true),
    StructField("count", LongType, nullable = false)))
}

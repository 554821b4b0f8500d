package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Time-series operators: bucketed resampling with gap filling.
  *
  * Scale shape: the aggregation is one partial+final hash agg; the bucket
  * grid is (distinct keys) × (bucket range) built from a broadcast one-row
  * bounds aggregate and an exploded `sequence` — no driver-side collect.
  * The left join back to the aggregates hash-partitions on (key, bucket),
  * the same key the aggregation already produced, so AQE reuses the
  * exchange where possible.
  */
object TimeSeries {

  /** Floor a timestamp to a `stepMillis` bucket (epoch-aligned, matching
    * DuckDB's time_bucket).
    */
  private def bucketFloor(ts: Column, stepMillis: Long): Column =
    timestamp_millis(unix_millis(ts) - pmod(unix_millis(ts), lit(stepMillis)))

  /** Resample `valueCol` to per-key fixed buckets with gap filling: every
    * (key, bucket) cell in [min(ts), max(ts)] appears exactly once; cells
    * with no data carry NULL. Average is rounded 6dp for cross-engine
    * stability.
    */
  def resampleAvg(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      stepMillis: Long = 300000L): DataFrame = {
    val bucket = bucketFloor(col(tsCol), stepMillis)
    val agg = df.groupBy(col(keyCol), bucket.as("bucket_start"))
      .agg(round(avg(col(valueCol)), 6).as("avg_v"))
    val bounds = df.agg(
      bucketFloor(min(col(tsCol)), stepMillis).as("mn"),
      bucketFloor(max(col(tsCol)), stepMillis).as("mx"))
    val grid = df.select(col(keyCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(keyCol), explode(
        sequence(col("mn"), col("mx"), expr(s"interval $stepMillis milliseconds")))
        .as("bucket_start"))
    grid.join(agg, Seq(keyCol, "bucket_start"), "left")
      .select(col(keyCol), col("bucket_start"), col("avg_v"))
  }
}

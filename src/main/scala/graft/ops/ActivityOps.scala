package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Reference-parity transforms (SURVEY.md §2), factored as pure
  * `DataFrame => DataFrame` functions so batch verification and the streaming
  * assembly share one implementation — the factoring the reference's own test
  * architecture implies (reference: spark/spark_test/spark-test.py:39-54 runs
  * the production chain in batch mode).
  *
  * Everything here is built-in Catalyst expressions: the whole chain stays
  * inside WholeStageCodegen, filters are pushed ahead of the shuffle, and the
  * grouped count splits into partial + final aggregation around a single
  * exchange hashed on the grouping keys — the shape that scales linearly with
  * input on a 1000-executor cluster.
  */
object ActivityOps {

  /** P1+P2: raw Kafka `value: binary` → parsed activity struct.
    * (reference: spark/spark_streaming.py:50-51). PERMISSIVE parse: malformed
    * JSON yields a null struct, which the downstream filter drops (P11
    * semantics for free).
    */
  def parseActivityJson(raw: DataFrame): DataFrame =
    raw.selectExpr("CAST(value AS STRING) AS json")
      .select(from_json(col("json"), Schemas.activitySchema).as("data"))

  /** P4-P9: nested-field extraction, epoch-millis → timestamp, lowercase
    * normalization (reference: spark/spark_streaming.py:53-57).
    *
    * The reference has two inequivalent epoch conversions
    * (`from_unixtime(date/1000)` — second precision, session-TZ dependent,
    * spark_streaming.py:55 — vs `to_utc_timestamp`, spark-test.py:44). We
    * standardize on `timestamp_millis`: exact and TZ-safe (SURVEY.md §7.4).
    */
  def cleanActivity(parsed: DataFrame): DataFrame =
    parsed.select(
      col("data.id").as("id"),
      expr("timestamp_millis(data.date)").as("date"),
      lower(col("data.event.event_type")).as("event_type"),
      col("data.event.url").as("url"))

  /** F1/F2: IN-list keep filter (reference: spark/spark_streaming.py:60-62;
    * Flink disjunction twin UserActivityInsert.java:54-60).
    */
  def filterEvents(df: DataFrame, keep: Seq[String], eventCol: String = "event_type"): DataFrame =
    df.filter(col(eventCol).isin(keep: _*))

  /** F3: negated IN-list — the "all other events" split stream the reference
    * declares but comments out (reference: spark/spark_streaming.py:63).
    */
  def filterEventsNot(df: DataFrame, drop: Seq[String], eventCol: String = "event_type"): DataFrame =
    df.filter(!col(eventCol).isin(drop: _*))

  /** P11: explicit null guard (reference: UserActivityFilterAgg.java:97). */
  def nonNullEvents(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.filter(col(c).isNotNull))

  /** A1-A8: watermark + tumbling event-time window + grouped count with
    * flattened window bounds (reference: spark/spark_streaming.py:64-65;
    * Flink twin UserActivityFilterAgg.java:96-107). `withWatermark` is a
    * no-op on batch frames, so the same function serves the DuckDB oracle
    * (batch) and the streaming assembly (append mode).
    *
    * Scale: count is algebraic → map-side partial aggregation runs before the
    * exchange; state per key is O(1); watermark bounds total state.
    */
  def windowedCount(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      windowDuration: String,
      watermark: Option[String] = None): DataFrame = {
    val withWm = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    val groups: Seq[Column] = keyCols.map(col) :+ window(col(tsCol), windowDuration)
    withWm
      .groupBy(groups: _*)
      .agg(count(lit(1)).as("count"))
      .select(keyCols.map(col) ++ Seq(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("count")): _*)
  }

  /** A7: the commented-out reduce-style variant — tumbling window + sum
    * (reference: UserActivityFilterAgg.java:109-117, 1-hour window).
    * Sum is cast to decimal first so results are exact (engine-independent) —
    * double summation order varies with partitioning.
    */
  def windowedSum(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      valueCol: String,
      windowDuration: String,
      watermark: Option[String] = None): DataFrame = {
    val withWm = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    val groups: Seq[Column] = keyCols.map(col) :+ window(col(tsCol), windowDuration)
    withWm
      .groupBy(groups: _*)
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("sum_value"),
        count(lit(1)).as("count"))
      .select(keyCols.map(col) ++ Seq(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("sum_value").cast("double").as("sum_value"),
        col("count")): _*)
  }

  /** K4-shape raw pass-through projection (reference:
    * UserActivityInsert.java:54-75: filter + (id, date, event_type, url)).
    */
  def rawInsertProjection(df: DataFrame, keep: Seq[String]): DataFrame =
    filterEvents(df, keep)
      .select(col("id"), col("date"), col("event_type"), col("url"))

  /** Sliding-window count — beyond the reference's tumbling-only windows
    * (SURVEY §2.6 scope boundary): each event lands in duration/slide
    * overlapping windows. Same partial-agg + single-exchange shape as the
    * tumbling variant; state grows by the overlap factor.
    */
  def slidingWindowCount(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      windowDuration: String,
      slide: String,
      watermark: Option[String] = None): DataFrame = {
    val withWm = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    val groups: Seq[Column] = keyCols.map(col) :+ window(col(tsCol), windowDuration, slide)
    withWm
      .groupBy(groups: _*)
      .agg(count(lit(1)).as("count"))
      .select(keyCols.map(col) ++ Seq(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("count")): _*)
  }

  /** Session-window count (gap-based): a session closes after `gap` of
    * inactivity; window end = last event + gap. Streaming state is bounded
    * by the watermark; batch mode computes the same gaps-and-islands
    * grouping the SQL oracle replays with lag + cumulative sum.
    */
  def sessionWindowCount(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      gap: String,
      watermark: Option[String] = None): DataFrame = {
    val withWm = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    val groups: Seq[Column] = keyCols.map(col) :+ session_window(col(tsCol), gap)
    withWm
      .groupBy(groups: _*)
      .agg(count(lit(1)).as("count"))
      .select(keyCols.map(col) ++ Seq(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("count")): _*)
  }

  /** Exact row-level dedup (north-star family): batch = DISTINCT; in
    * streaming the same call after `withWatermark` performs watermark-bounded
    * streaming dedup (state expires with the watermark).
    */
  def distinctRows(df: DataFrame, watermark: Option[(String, String)] = None): DataFrame =
    watermark.fold(df) { case (c, w) => df.withWatermark(c, w) }.dropDuplicates()

  /** Bounded-state streaming dedup on a KEY SUBSET
    * (dropDuplicatesWithinWatermark): a key's state expires once the
    * watermark passes its first-seen event time + delay, so duplicate
    * suppression is exact within the horizon WITHOUT keying state on the
    * event-time column. Contrast `distinctRows` on a subset key: plain
    * dropDuplicates holds every key seen forever — unbounded state on an
    * unbounded stream. This is the engine-native complement to
    * StreamingDedup's index-backed "all of history" horizon: pick this when
    * duplicates only ever arrive close together (retries, at-least-once
    * sources), the index when they can arrive years apart.
    */
  def distinctWithinWatermark(
      df: DataFrame, tsCol: String, delay: String, keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)
}

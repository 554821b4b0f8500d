package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Watermarked STREAM-STREAM interval join — the attribution shape: each
  * purchase joins the same-user clicks from the preceding attribution
  * window, with both sides arriving as live streams (the batch twin is
  * `attribution_window`, which plans the same predicate as a time-binned
  * equi-join; reference spark_streaming.py:49-55 builds its windowed agg
  * from one stream — this is the two-stream capability beyond it).
  *
  * Mechanics (Structured Streaming's stream-stream join contract):
  *  - both sides carry a watermark, and the join condition pairs the key
  *    equality with a BOUNDED event-time interval
  *    (`click_ts` ∈ [`purchase_ts` − window, `purchase_ts`]) — together
  *    these let the engine EVICT state: a buffered click older than
  *    watermark − window can never match a future purchase and is
  *    dropped, so state is bounded by (arrival rate × window), never by
  *    stream length;
  *  - the left-outer variant emits an unattributed purchase (null click
  *    columns) only once the watermark passes its window end — the point
  *    where "no click arrived" becomes a fact rather than a race.
  *
  * Scale: state is partitioned by the join key (user), so the join
  * shuffles each micro-batch once on user_id and holds one window's
  * worth of rows per active user — the same per-key bounded-state story
  * as the watermarked aggregations.
  */
object StreamingAttribution {

  /** Clicks (user_id, click_ts) × purchases (event_id, p_user,
    * purchase_ts) within `windowSec` seconds before the purchase.
    * `joinType` "inner" for attributed pairs, "leftOuter" (purchases
    * left) to also emit never-attributed purchases after the watermark
    * closes their window.
    */
  def attribute(
      clicks: DataFrame,
      purchases: DataFrame,
      windowSec: Long = 3600L,
      watermarkDelay: String = "10 seconds",
      joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("click_ts", watermarkDelay)
    val p = purchases.withWatermark("purchase_ts", watermarkDelay)
    val cond = expr(
      s"""user_id = p_user
         |AND click_ts >= purchase_ts - INTERVAL $windowSec SECONDS
         |AND click_ts <= purchase_ts""".stripMargin)
    val joined =
      if (joinType == "leftOuter") p.join(c, cond, "leftOuter")
      else c.join(p, cond, joinType)
    joined.select(
      expr("event_id"), expr("p_user AS user_id"),
      expr("click_ts"), expr("purchase_ts"))
  }
}

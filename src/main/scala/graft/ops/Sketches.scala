package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch tables — the pre-aggregation pattern that makes
  * cardinality dashboards tractable at 100 TB: build one small DataSketches
  * HLL sketch per (key, partition-grain) ONCE, persist the sketch bytes as
  * an ordinary binary column, and answer any coarser-grained distinct-count
  * rollup later by unioning sketches — never re-scanning the raw events.
  * (Same architecture as Druid/Pinot rollup segments; sketch union is a
  * register-wise max, so it is associative, commutative, and
  * order-independent — a deterministic estimate for a fixed input set.)
  */
object Sketches {

  /** log2 of the HLL register count: 2^12 registers ≈ 1.6% relative
    * standard error — sketch bytes ≤ ~4 KiB per (key, day).
    */
  val LgK = 12

  /** Multi-sigma error budget for the within-budget contract: 5 × the
    * ~1.625% RSE at LgK=12, rounded up — an estimate outside ±9% is a
    * broken sketch, not noise (same contract shape as
    * `approx_distinct_users`'s 5-sigma bound).
    */
  val ErrorBudget = 0.09

  /** Per-(event_type, day) HLL partials over distinct users — the sketch
    * table a daily ingest job appends. One map-side-combinable hash agg;
    * the exchange carries one ≤4 KiB sketch per (type, day, partition).
    */
  def hllPartials(events: DataFrame, lgK: Int = LgK): DataFrame =
    events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sk"),
        count(lit(1)).as("n_events"))

  /** Roll partial sketches up to per-event_type distinct-user estimates:
    * union the day sketches (register-wise max — no raw-event rescan) and
    * estimate. `n_days` counts the partials merged.
    */
  def hllRollup(partials: DataFrame): DataFrame =
    partials.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("approx_users"))
}

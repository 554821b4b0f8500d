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

  /** Decimal places kept for quantile-partial value buckets: the declared
    * GRANULARITY of every quantile answered from the partials table. 2dp
    * over this value domain (~[0, 500]) bounds the histogram at ~5·10⁴
    * buckets per key — per-key state is domain/granularity-sized, never
    * corpus-sized.
    */
  val QuantileGranularity = 2

  /** Quantile positions answered by `quantileRollup`, in integer ppm (the
    * Sampling convention — cutoff tests are exact integer
    * cross-multiplications, no division for an engine to round).
    */
  val QuantilesPpm: Seq[(String, Long)] =
    Seq("p50" -> 500000L, "p95" -> 950000L, "p99" -> 990000L)

  /** Per-(event_type, day) value-histogram partials — the quantile twin of
    * `hllPartials`, with a stronger contract: partials merge by ADDITION
    * (associative/commutative), and any rollup quantile computed from the
    * merged histogram is EXACTLY the type-1 quantile of the
    * granularity-rounded values — deterministic, not an estimate (KLL-style
    * sketches trade that exactness away; at a declared granularity the
    * histogram is strictly better until the value domain explodes).
    *
    * One map-side-combinable hash agg; the exchange carries ≤ |domain| /
    * granularity rows per (type, day, partition).
    */
  def quantilePartials(events: DataFrame, granularity: Int = QuantileGranularity): DataFrame =
    events.groupBy(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value"), granularity).as("vb"))
      .agg(count(lit(1)).as("c"))

  /** Answer per-key quantiles from a partials table without rescanning raw
    * events: merge day histograms by addition, cumulative-sum over the
    * BOUNDED per-key bucket list, and pick each quantile as the smallest
    * bucket with cum·10⁶ ≥ n·ppm (type-1, same integer-exact cutoff as
    * qualityQuantileFilter).
    */
  def quantileRollup(
      partials: DataFrame,
      ps: Seq[(String, Long)] = QuantilesPpm): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val merged = partials.groupBy(col("event_type"), col("vb"))
      .agg(sum(col("c")).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("vb"))
    val wAll = Window.partitionBy(col("event_type"))
    val cum = merged.select(col("event_type"), col("vb"),
      sum(col("c")).over(w).as("cum"), sum(col("c")).over(wAll).as("n"))
    val qCols = ps.map { case (name, ppm) =>
      min(when(col("cum") * 1000000L >= col("n") * ppm, col("vb"))).as(name)
    }
    cum.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), qCols: _*)
  }

  /** Per-(event_type, day) moment partials: row count + EXACT decimal
    * power sums Σv, Σv², Σv³ of the 2dp value column — the
    * mean/variance/skewness twin of `quantilePartials`. DECIMAL power sums
    * make the merge EXACT addition: a float-sum partial table merges with
    * summation-order drift, while these fold across any
    * day/shard/stream boundary with zero error — so a 100 TB scan can be
    * moment-summarized once, incrementally, and every later rollup is as
    * good as a rescan. 2dp values cast losslessly to DECIMAL(10,2); v³
    * sums in DECIMAL(38,6) with ~30 integer digits of headroom.
    *
    * One map-side-combinable hash agg per day grain.
    */
  def momentPartials(events: DataFrame): DataFrame = {
    val v = col("value").cast("decimal(10,2)")
    events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), sum(v).as("s1"),
        sum(v * v).as("s2"), sum(v * v * v).as("s3"))
  }

  /** Roll moment partials up to per-key n / Σv / mean / sample variance /
    * population skewness: merge = decimal addition (exact), derived stats
    * computed in double from the exact sums with expression shapes the
    * DuckDB oracle mirrors token for token (m2^1.5 as m2·√m2 — sqrt is
    * IEEE-exact where a general pow differs by ulps). Constant groups
    * (m2 = 0) emit skewness 0 rather than a 0/0.
    */
  def momentsRollup(partials: DataFrame): DataFrame = {
    val merged = partials.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("s1")).as("s1"),
        sum(col("s2")).as("s2"), sum(col("s3")).as("s3"))
    val nd = col("n").cast("double")
    val s1 = col("s1").cast("double")
    val s2 = col("s2").cast("double")
    val s3 = col("s3").cast("double")
    val mu = s1 / nd
    val m2 = s2 / nd - mu * mu
    val m3 = s3 / nd - lit(3.0) * mu * (s2 / nd) + lit(2.0) * mu * mu * mu
    merged.select(col("event_type"), col("n"),
      // exact decimal sum surfaced as DOUBLE: both engines round the same
      // exact decimal to the same nearest double, so the hash compare is
      // type-stable (pandas reads Spark parquet DECIMAL as objects, DuckDB
      // fetches its DECIMAL as float — DOUBLE on both sides removes the skew)
      col("s1").cast("decimal(18,2)").cast("double").as("sum_v"),
      round(mu, 6).as("mean_v"),
      round((s2 - s1 * s1 / nd) / (nd - lit(1.0)), 6).as("var_samp"),
      round(when(m2 > 0, m3 / (m2 * sqrt(m2))).otherwise(lit(0.0)), 6).as("skew_pop"))
  }
}

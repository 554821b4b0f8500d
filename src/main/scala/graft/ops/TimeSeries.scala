package graft.ops

import graft.ops.Materialize.EagerOps
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

  /** Fixed-width value bins for the drift monitor (overflow clamps to the
    * last bin) and the Laplace smoothing the PSI terms use.
    */
  val PsiBinWidth = 25.0
  val PsiBins = 17

  /** Reference/current window boundary for the registered drift query
    * (mid-range of the synthetic events' 30-day span).
    */
  val PsiSplitTs = "2024-01-16"

  /** Population-stability-index drift monitor: PSI of the `valueCol`
    * distribution between a reference window (ts < split) and the current
    * window, per key — the deploy-gate metric that catches a feature or
    * corpus distribution shifting between training snapshots
    * (rule of thumb: <0.1 stable, >0.25 action). Bins are FIXED-WIDTH
    * (deterministic; quantile bins would couple the monitor to a
    * cross-engine percentile), counts are Laplace-smoothed
    * (p = (cnt+1)/(n+bins)) so empty bins contribute finite terms, and
    * psi = Σ (p_cur − p_ref)·ln(p_cur/p_ref) is rounded 6dp at the end
    * (exact-integer-derived inputs; same ln convention as unigramLogprob).
    *
    * Scale: one hash agg over the events (bucket, side) + a key×bins spine
    * join — the spine is (distinct keys)·bins rows, metadata-sized.
    */
  def psiDrift(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      splitTs: String,
      binWidth: Double = PsiBinWidth,
      nBins: Int = PsiBins): DataFrame = {
    val bucket = least(lit(nBins - 1), floor(col(valueCol) / binWidth)).cast("int")
    val sided = df.select(col(keyCol), bucket.as("b"),
      (col(tsCol) < lit(splitTs).cast("timestamp")).as("is_ref"))
    val counts = sided.groupBy(col(keyCol), col("b"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("c_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("c_cur"))
    val spine = df.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(sequence(lit(0), lit(nBins - 1))).as("b0"))
      .select(col(keyCol), col("b0").cast("int").as("b"))
    val filled = spine.join(counts, Seq(keyCol, "b"), "left")
      .select(col(keyCol), col("b"),
        coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"))
    psiOfCounts(filled, keyCol, nBins)
  }

  /** Daily active/new/returning-user growth report — the retention axis
    * every activity pipeline publishes: per epoch day, event volume,
    * distinct active users, users seen for the FIRST time ever that day,
    * and the returning remainder. First-seen derives from one per-user
    * min-day aggregate, so the report is two user-keyed hash aggs + one
    * calendar-sized left join — never a corpus-sized window or a
    * day-by-day scan (at 100 TB the first-seen table is the thing you
    * maintain incrementally: new = not in yesterday's table, a
    * StreamingIvm-shape fold).
    */
  def dailyActiveNew(events: DataFrame): DataFrame =
    dailyActiveNewFromCensus(dailyCensus(events))

  /** The (day, user, count) census the growth report rolls up from —
    * exactly what the streaming fold maintains ADDITIVELY (integer
    * counts, so merge is exact addition and late events land in their
    * true day; StreamingDailyActive).
    */
  private[graft] def dailyCensus(events: DataFrame): DataFrame =
    events.select(
        floor(unix_millis(col("ts")) / lit(86400000L)).cast("bigint").as("d"),
        col("user_id"))
      .groupBy(col("d"), col("user_id")).agg(count(lit(1)).as("c"))

  /** The growth report from a prebuilt census: every derived table
    * (daily volume/actives, per-user first-seen day) is a rollup of the
    * census itself, so serving from the maintained state equals the
    * batch operator exactly.
    */
  def dailyActiveNewFromCensus(census: DataFrame): DataFrame = {
    val firstSeen = census.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
    val daily = census.groupBy(col("d"))
      .agg(sum(col("c")).as("n_events"), count(lit(1)).as("n_active"))
    val news = firstSeen.groupBy(col("d0").as("d")).agg(count(lit(1)).as("n_new"))
    daily.join(news, Seq("d"), "left")
      .select(col("d"), col("n_events"), col("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        (col("n_active") - coalesce(col("n_new"), lit(0L))).as("n_returning"))
  }

  /** Conversion latency from a user's FIRST `fromType` event to their
    * first `toType` event strictly after it — the time-to-convert report
    * behind the ordered funnel: converts counted exactly, latency p50/p90
    * as exact interpolated percentiles of millisecond deltas (the
    * value_percentiles convention), conversion rate in integer ppm.
    * Earlier `toType` events don't count (the strictly-after guard rides
    * the aggregate, so a user whose purchases all precede signup still
    * reports as unconverted instead of vanishing).
    *
    * Scale: two type-filtered scans, one user-keyed join + aggregate
    * (users × their toType events, the funnel shape), one global rollup.
    */
  def conversionLatency(
      events: DataFrame,
      fromType: String = "signup",
      toType: String = "purchase"): DataFrame = {
    val s = events.filter(col("event_type") === fromType)
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts_from"))
    val p = events.filter(col("event_type") === toType)
      .select(col("user_id"), col("ts").as("ts_to"))
    s.join(p, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("ts_from"))
      .agg(min(when(col("ts_to") > col("ts_from"), col("ts_to"))).as("ts_to"))
      .select((unix_millis(col("ts_to")) - unix_millis(col("ts_from"))).as("dt"))
      .agg(count(lit(1)).as("n_from"),
        count(col("dt")).as("n_converted"),
        round(expr("percentile(dt, 0.5)"), 6).as("p50_ms"),
        round(expr("percentile(dt, 0.9)"), 6).as("p90_ms"))
      .select(col("n_from"), col("n_converted"), col("p50_ms"), col("p90_ms"),
        // empty-funnel guard: n_from = 0 emits rate 0 (not NULL), and the
        // oracle carries the same CASE so neither engine divides by zero
        expr("CAST(CASE WHEN n_from = 0 THEN 0" +
          " ELSE (n_converted * 1000000) div n_from END AS BIGINT)")
          .as("convert_ppm"))
  }

  /** Jensen-Shannon drift per key — the third lens of the drift panel:
    * PSI saturates on within-bin shifts and is unbounded; KS sees any
    * shift but only its MAXIMUM; JSD = ½KL(p‖m) + ½KL(q‖m) with
    * m = (p+q)/2 is symmetric, BOUNDED in [0, ln 2], and weighs the whole
    * distribution — the comparable-across-keys drift score mix monitors
    * alert on. Same fixed-width-bin + Laplace-smoothing geometry as
    * `psiDrift` (shared histogram CTEs in the oracle), ln terms summed
    * and 6dp-rounded under the module's PSI convention.
    */
  def jsDrift(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      splitTs: String,
      binWidth: Double = PsiBinWidth,
      nBins: Int = PsiBins): DataFrame = {
    val bucket = least(lit(nBins - 1), floor(col(valueCol) / binWidth)).cast("int")
    val sided = df.select(col(keyCol), bucket.as("b"),
      (col(tsCol) < lit(splitTs).cast("timestamp")).as("is_ref"))
    val counts = sided.groupBy(col(keyCol), col("b"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("c_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("c_cur"))
    val spine = df.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(sequence(lit(0), lit(nBins - 1))).as("b0"))
      .select(col(keyCol), col("b0").cast("int").as("b"))
    val filled = spine.join(counts, Seq(keyCol, "b"), "left")
      .select(col(keyCol), col("b"),
        coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"))
    val tot = filled.groupBy(col(keyCol))
      .agg(sum(col("c_ref")).as("n_ref"), sum(col("c_cur")).as("n_cur"))
    filled.join(broadcast(tot), Seq(keyCol))
      .select(col(keyCol), col("n_ref"), col("n_cur"),
        ((col("c_ref") + 1).cast("double") / (col("n_ref") + nBins).cast("double")).as("pr"),
        ((col("c_cur") + 1).cast("double") / (col("n_cur") + nBins).cast("double")).as("pc"))
      .withColumn("m", (col("pr") + col("pc")) / 2)
      .groupBy(col(keyCol))
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        round(sum(col("pr") * log(col("pr") / col("m")) / 2 +
          col("pc") * log(col("pc") / col("m")) / 2), 6).as("jsd"))
  }

  /** Per-key OLS trend of the hourly count series over the gap-filled
    * grid: slope (events/hour), intercept, and r² — the volume-growth
    * probe beside `hourlyAcf`'s seasonality probe. t is re-based to the
    * key's first hour so every power sum is an exact small integer; the
    * closed-form normal-equation ratios are the only float ops (the r²
    * numerator square runs in double — its integer form can exceed
    * int64 — identically in both engines). Zero-variance sides emit 0.
    */
  def hourlyTrend(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val filled = hourlyFilled(events)
    val t = (col("h") - min(col("h")).over(Window.partitionBy(col("event_type"))))
      .as("t")
    val sums = filled.select(col("event_type"), col("c"), t)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("st"), sum(col("c")).as("sy"),
        sum(col("t") * col("c")).as("sty"), sum(col("t") * col("t")).as("stt"),
        sum(col("c") * col("c")).as("syy"))
    val vx = col("n") * col("stt") - col("st") * col("st")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    val cov = (col("n") * col("sty") - col("st") * col("sy")).cast("double")
    sums.select(col("event_type"), col("n"),
      round(when(vx > 0, cov / vx.cast("double")).otherwise(lit(0.0)), 6)
        .as("slope_per_hour"),
      round(when(vx > 0, (col("sy") * col("stt") - col("st") * col("sty"))
        .cast("double") / vx.cast("double")).otherwise(lit(0.0)), 6).as("intercept"),
      round(when(vx > 0 && vy > 0,
        cov * cov / (vx.cast("double") * vy.cast("double"))).otherwise(lit(0.0)), 6)
        .as("r2"))
  }

  /** Theil-Sen robust trend per event type, on a gap-filled DAILY grid:
    * the slope estimate is the exact lower MEDIAN of all pairwise slopes
    * (c_j − c_i)/(d_j − d_i), i < j — up to ~29% of days can be arbitrary
    * outliers (incident spikes, backfill days) without moving the
    * estimate, where `hourlyTrend`'s least-squares slope chases every
    * spike quadratically. The robust companion to the OLS fit, same
    * pairing as classic Sen (1968).
    *
    * Determinism: every pairwise slope is ONE exactly rounded IEEE
    * division of integers — bit-identical across engines — so ordering by
    * (s, d1, d2) needs no pre-rounding; the median picks row
    * (n_pairs+1) div 2 by integer arithmetic; only the emitted slope is
    * 6dp-rounded.
    *
    * Scale: the pair self-join fans each key's grid into (days choose 2)
    * rows — CALENDAR-bounded (a decade ≈ 6.7M pairs/key), independent of
    * corpus row count; the per-key fanout on a few-valued event_type key
    * is the AQE skew-split case. The grid itself derives from one hash agg
    * over events. For multi-decade spans the repeated-median variant
    * (median over d1 of per-d1 medians) caps the blowup at O(days·k) —
    * not needed at this span.
    */
  def theilSenDaily(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dc = events
      .select(col("event_type"),
        floor(unix_millis(col("ts")) / lit(86400000L)).cast("bigint").as("d"))
      .groupBy(col("event_type"), col("d")).agg(count(lit(1)).as("c"))
    val bounds = dc.groupBy(col("event_type"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val grid = bounds
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("d"))
      .join(dc, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"), coalesce(col("c"), lit(0L)).as("c"))
    val nd = grid.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
    val b = grid.select(col("event_type").as("et2"), col("d").as("d2"), col("c").as("c2"))
    val pairs = grid
      .select(col("event_type"), col("d").as("d1"), col("c").as("c1"))
      .join(b, col("event_type") === col("et2") && col("d1") < col("d2"))
      .select(col("event_type"), col("d1"), col("d2"),
        ((col("c2") - col("c1")).cast("double") /
          (col("d2") - col("d1")).cast("double")).as("s"))
    val w = Window.partitionBy(col("event_type"))
    pairs
      .select(col("event_type"), col("s"),
        row_number().over(w.orderBy(col("s"), col("d1"), col("d2"))).as("rn"),
        count(lit(1)).over(w).as("np"))
      .filter(col("rn") === expr("(np + 1) div 2"))
      .select(col("event_type"), col("np").as("n_pairs"),
        round(col("s"), 6).as("ts_slope_per_day"))
      .join(nd, Seq("event_type"))
  }

  /** Weekly SEASONAL decomposition over the gap-filled daily count grid
    * (STL-lite, the classical-decomposition special case for period 7):
    * trend at day d = the centered 7-day window; the detrended value is
    * kept as the EXACT integer 7·c_d − Σ_{|j|≤3} c_{d+j} (scaling by 7
    * instead of dividing keeps the subtraction integer-exact), and the
    * seasonal component per (event_type, day-of-week) is
    * Σ detrended_scaled / (7 · n_dow) — ONE IEEE division of exact
    * integers, so no accumulation order exists for the engines to
    * disagree on. Days without a full centered window (the 3-day edges)
    * are excluded, as in classical decomposition. Day-of-week = epoch-day
    * mod 7 — calendar-free, timezone-free, shared with the oracle.
    *
    * Reading: a constant series decomposes to seasonal ≡ 0; a pure
    * period-7 pattern yields seasonal = c_dow − weekly_mean exactly
    * (spec-pinned). The weekday-activity signal a training-data mix
    * audit reads before trusting per-day quotas.
    *
    * Scale: one hash agg to the daily grid (calendar-bounded), one per-key
    * window pass, one |types|×7-row rollup — never corpus-sized state.
    */
  def seasonalDow(events: DataFrame): DataFrame =
    seasonalDowFromDaily(events
      .select(col("event_type"),
        floor(unix_millis(col("ts")) / lit(86400000L)).cast("bigint").as("d"))
      .groupBy(col("event_type"), col("d")).agg(count(lit(1)).as("c")))

  /** `seasonalDow` served from a maintained HOURLY count table — the
    * StreamingEwma state: hours roll up to epoch days exactly
    * (d = h div 24, both floors of the same millis), so the decomposition
    * over the folded state equals the batch operator over every event
    * ever streamed (spec-pinned). The drift triad's seasonal lens joins
    * the maintained-state family for free.
    */
  def seasonalDowFromHourly(hc: DataFrame): DataFrame =
    seasonalDowFromDaily(
      hc.groupBy(col("event_type"), expr("h div 24").as("d"))
        .agg(sum(col("c")).as("c")))

  /** The decomposition over a prebuilt (event_type, d, c) daily table. */
  def seasonalDowFromDaily(dc: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = dc.groupBy(col("event_type"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val grid = bounds
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("d"))
      .join(dc, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"), coalesce(col("c"), lit(0L)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(-3, 3)
    grid
      .select(col("event_type"), col("d"), col("c"),
        sum(col("c")).over(w).as("sum7"), count(lit(1)).over(w).as("n7"))
      .filter(col("n7") === 7)
      .select(col("event_type"), (col("d") % 7).as("dow"),
        (col("c") * 7 - col("sum7")).as("ds"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("ds")).as("ds_sum"))
      .select(col("event_type"), col("dow"), col("n_days"),
        round(col("ds_sum").cast("double") / (col("n_days") * 7).cast("double"), 6)
          .as("seasonal"))
  }

  /** Two-sample Kolmogorov-Smirnov drift per key: the EXACT
    * D = max_v |F_ref(v) − F_cur(v)| over the pooled distinct values —
    * the binning-free companion to `psiDrift` (PSI needs a declared bin
    * width and saturates on within-bin shifts; KS sees any change
    * anywhere in the distribution). Alongside D: the α=0.05 rejection
    * flag from the classic c(α)·√((n₁+n₂)/(n₁n₂)) critical value.
    *
    * Determinism: cumulative and total counts are exact integers from one
    * per-key value-ordered window pass; the only float ops are the two
    * divisions, the difference, and the critical value — mirrored token
    * for token and compared after 6dp rounding on both sides.
    *
    * Scale: one hash agg to per-(key, value) side counts (value-domain-
    * sized, not row-sized), one per-key window, one final agg. Keys with
    * an empty side drop (no two-sample test exists).
    */
  def ksDrift(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      splitTs: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sided = df.select(col(keyCol), col(valueCol).as("v"),
      (col(tsCol) < lit(splitTs).cast("timestamp")).as("is_ref"))
    val counts = sided.groupBy(col(keyCol), col("v"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("cr"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cc"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("v"))
    val wAll = Window.partitionBy(col(keyCol))
    val cum = counts.select(col(keyCol), col("v"),
      sum(col("cr")).over(w).as("r"), sum(col("cc")).over(w).as("c"),
      sum(col("cr")).over(wAll).as("nr"), sum(col("cc")).over(wAll).as("nc"))
    cum.filter(col("nr") > 0 && col("nc") > 0)
      .groupBy(col(keyCol))
      .agg(max(col("nr")).as("n_ref"), max(col("nc")).as("n_cur"),
        round(max(abs(col("r").cast("double") / col("nr")
          - col("c").cast("double") / col("nc"))), 6).as("ks_d"))
      .select(col(keyCol), col("n_ref"), col("n_cur"), col("ks_d"),
        (col("ks_d") > round(lit(1.358) * sqrt((col("n_ref") + col("n_cur"))
          .cast("double") / (col("n_ref") * col("n_cur")).cast("double")), 6))
          .as("drift_05"))
  }

  /** SAX parameters for time-series similarity search (shared with the
    * oracle): the 30-day window splits into 6 five-day PAA segments,
    * z-normalized and discretized into a 4-symbol alphabet at the Gaussian
    * quartile breakpoints ±0.6745; the 6-symbol word splits into two
    * 3-symbol bands for candidate blocking.
    */
  val SaxStart = "2024-01-01"
  val SaxDays = 30
  val SaxSegWidth = 5
  val SaxSegCount: Int = SaxDays / SaxSegWidth
  val SaxBreak = 0.6745
  val SaxBandLen = 3
  val SaxDistThreshold = 1.0

  /** Per-user z-normalized PAA segment vectors — the aligned fixed-length
    * representation behind the SAX sketch. Missing segments are zero
    * activity (the division is by the constant segment width, so no
    * gap-fill join is needed); segment values, means, and stds are rounded
    * 6dp before the z-score so both engines divide identical doubles.
    */
  def saxZ(events: DataFrame, start: String = SaxStart): DataFrame = {
    val d = datediff(to_date(col("ts")), to_date(lit(start)))
    val seg = events
      .select(col("user_id"), d.as("d"), col("value"))
      .filter(col("d") >= 0 && col("d") < SaxDays)
      .groupBy(col("user_id"), floor(col("d") / SaxSegWidth).cast("int").as("seg"))
      .agg(round(sum(col("value")) / SaxSegWidth.toDouble, 6).as("segv"))
    val grid = seg.select(col("user_id")).distinct()
      .select(col("user_id"), explode(sequence(lit(0), lit(SaxSegCount - 1))).as("seg"))
    val full = grid.join(seg, Seq("user_id", "seg"), "left")
      .select(col("user_id"), col("seg"), coalesce(col("segv"), lit(0.0)).as("segv"))
    val stats = full.groupBy(col("user_id"))
      .agg(round(avg(col("segv")), 6).as("mu"), round(stddev_samp(col("segv")), 6).as("sd"))
    full.join(stats, Seq("user_id"))
      .select(col("user_id"), col("seg"),
        when(col("sd") > 0, round((col("segv") - col("mu")) / col("sd"), 6))
          .otherwise(lit(0.0)).as("zv"))
  }

  /** Distributed time-series similarity search (the EDBT'19 problem shape,
    * built on the repo's candidate-generation convention): SAX words block
    * candidate user pairs via a banded EQUI-join — two 3-symbol half-words,
    * pigeonhole-style like simhashPairs' byte bands — and candidates verify
    * with the exact z-normalized Euclidean distance. Never an O(n²) series
    * cross-product; candidate volume follows SAX-word collision rates
    * (~4% of all-pairs on the harness data).
    */
  def saxSimilarPairs(
      events: DataFrame,
      start: String = SaxStart,
      threshold: Double = SaxDistThreshold): DataFrame = {
    // cache ownership (the minhashLshPairs convention): the z table feeds
    // the word derivation AND both verify arms; the result is materialized
    // eagerly so the cache can be released before returning instead of
    // pinning a users×segments frame per call in a long-lived driver
    val z = saxZ(events, start).persist()
    try saxSimilarPairsFromZ(z, threshold).eagerCkpt
    finally z.unpersist()
  }

  /** Bucket-occupancy cap for the SAX band join (the audited-cap
    * discipline, round 13): the 3-symbol band words range over only 4³ =
    * 64 values, so buckets grow ∝ users and the banded join's candidate
    * volume is quadratic no matter how the output is bounded (the round-13
    * re-measure caught `ts_similar_topk` growing 2.4× for 3× rows with the
    * uncapped join). Unlike the media tier there is no entropy to
    * redistribute — 64 possible words IS the sketch's capacity — so the
    * cap is the only linear-work guarantee; `ts_band_stats` prices the
    * recall trade per band.
    */
  val SaxBucketCap = 128

  /** Bounded-output similarity SERVING: per user, the k nearest banded
    * candidates by exact z-normalized distance — the production shape at
    * scale, because the all-pairs contract's output is itself quadratic
    * in SAX-word bucket occupancy (SCALING.md §2) while top-k output is
    * |users|·k no matter how the buckets saturate. Candidate generation
    * is the banded equi-join under the occupancy cap (work ≤
    * |users|·2·cap — linear; cap = Int.MaxValue recovers the uncapped
    * join bit-exactly); emission is capped by a per-user window rank
    * (partitioned by user — never a global sort).
    */
  def saxSimilarTopK(
      events: DataFrame,
      start: String = SaxStart,
      k: Int = 5,
      cap: Int = SaxBucketCap): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val z = saxZ(events, start).persist()
    try {
      val dist = saxCandDist(z, cap)
      val symd = dist
        .select(col("ua").as("user_id"), col("ub").as("neighbor_id"), col("dist"))
        .unionByName(dist
          .select(col("ub").as("user_id"), col("ua").as("neighbor_id"), col("dist")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("dist").asc, col("neighbor_id").asc)
      symd.withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= k)
        .select(col("user_id"), col("rank"), col("neighbor_id"), col("dist"))
        .eagerCkpt
    } finally z.unpersist()
  }

  private def saxSimilarPairsFromZ(
      z: DataFrame, threshold: Double): DataFrame =
    saxCandDist(z).filter(col("dist") <= threshold)

  /** The per-band word table (user_id, band, h) behind the candidate
    * join — shared by the pair/top-k paths and the saturation audit.
    */
  private def saxBands(z: DataFrame): DataFrame = {
    val sym = z.select(col("user_id"), col("seg"),
      when(col("zv") < -SaxBreak, "a")
        .when(col("zv") < 0, "b")
        .when(col("zv") < SaxBreak, "c")
        .otherwise("d").as("s"))
    val word = sym.groupBy(col("user_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("seg"), col("s")))), t => t("s")),
        "").as("w"))
    word.select(col("user_id"), lit(0).as("band"),
        substring(col("w"), 1, SaxBandLen).as("h"))
      .union(word.select(col("user_id"), lit(1).as("band"),
        substring(col("w"), SaxBandLen + 1, SaxBandLen).as("h")))
  }

  /** Banded candidates with their exact verify distance (ua < ub, no
    * threshold) — shared by the all-pairs and top-k emissions. Buckets
    * above `cap` are skipped (Int.MaxValue = the uncapped baseline).
    */
  private def saxCandDist(z: DataFrame, cap: Int = Int.MaxValue): DataFrame = {
    // materialize the band table ONCE (round 14): it is consumed by both
    // self-join sides AND (capped path) by the occupancy count + its
    // semi-join left side — without the checkpoint the word-assembly
    // aggregation (groupBy + collect_list + sort per user) re-ran up to
    // ~8× per serve. 2 rows per user, the cheapest frame in the query.
    val bands0 = saxBands(z).eagerCkpt
    val bands =
      if (cap == Int.MaxValue) bands0
      else bands0.join(
        bands0.groupBy(col("band"), col("h")).agg(count(lit(1)).as("m"))
          .filter(col("m") <= cap).select(col("band"), col("h")),
        Seq("band", "h"), "left_semi")
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("ua"), col("b.user_id").as("ub"))
      .distinct()
    cand
      .join(z.select(col("user_id").as("ua"), col("seg"), col("zv").as("za")), Seq("ua"))
      .join(z.select(col("user_id").as("ub"), col("seg"), col("zv").as("zb")), Seq("ub", "seg"))
      .groupBy(col("ua"), col("ub"))
      .agg(round(sqrt(sum(pow(col("za") - col("zb"), 2))), 6).as("dist"))
  }

  /** Per-band saturation audit of the SAX banding (the mediaBandStats
    * shape): bucket counts, the largest bucket, total candidate volume
    * Σ C(m,2), and what the occupancy cap skips — the report a curator
    * reads before trusting either SAX emission at a new corpus. One
    * groupBy over 2·|users| band rows — linear, unlike the join it audits.
    */
  def saxBandStats(
      events: DataFrame, start: String = SaxStart,
      cap: Int = SaxBucketCap): DataFrame = {
    val z = saxZ(events, start).persist()
    try {
      saxBands(z).groupBy(col("band"), col("h"))
        .agg(count(lit(1)).as("m"))
        .groupBy(col("band"))
        .agg(
          count(lit(1)).as("n_buckets"),
          max(col("m")).as("max_occupancy"),
          sum(col("m") * (col("m") - 1) / 2).cast("long").as("candidate_pairs"),
          sum(when(col("m") > cap, 1L).otherwise(0L)).as("n_buckets_over_cap"),
          sum(when(col("m") > cap, col("m") * (col("m") - 1) / 2)
            .otherwise(lit(0.0))).cast("long").as("candidates_over_cap"))
        .eagerCkpt
    } finally z.unpersist()
  }

  /** Rolling z-score anomaly detection: each event's value against the
    * mean/stddev of its key's `w` PRECEDING events (the current row is
    * excluded so an outlier cannot mask itself), flagged when the
    * deviation exceeds `nSigma` standard deviations and at least `minN`
    * history rows exist.
    *
    * Determinism: the window frame is row-bounded with a total
    * (ts, event_id) order; mean/std are rounded to 6dp BEFORE the
    * comparison (both engines then evaluate the identical flag
    * expression — same convention as value_outliers' MAD gate, because
    * DuckDB's segment-tree window aggregation sums in a different order
    * than Spark's sequential frame).
    *
    * Scale: one shuffle on the key, per-key sort, O(1) state per row —
    * the streaming twin is the same expression over
    * dropDuplicates-bounded state. Keys are users (bounded history);
    * a hot key degrades to one task's sort, AQE-skew territory.
    */
  def rollingZscore(
      events: DataFrame,
      w: Int = 10,
      minN: Int = 5,
      nSigma: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-w, -1)
    events
      .select(col("event_id"), col("user_id"), col("value"),
        count(col("value")).over(win).as("n_hist"),
        round(avg(col("value")).over(win), 6).as("mu"),
        round(stddev_samp(col("value")).over(win), 6).as("sd"))
      .withColumn("is_anomaly",
        col("n_hist") >= minN && col("sd").isNotNull && col("sd") > 0 &&
          abs(col("value") - col("mu")) > lit(nSigma) * col("sd"))
  }

  /** ACF lags computed by `hourlyAcf`. */
  val AcfLags: Seq[Int] = Seq(1, 2, 3)

  /** Autocorrelation of the hourly event-count series per event_type at
    * small lags — the seasonality probe behind "is this signal hourly-
    * periodic enough to forecast". The series is GAP-FILLED with zero
    * counts (ACF over the regular grid, not over observed rows only);
    * Pearson r at lag l comes from the textbook sum formula with every
    * power sum computed in EXACT integer arithmetic (counts are longs),
    * so the only floating-point steps are the final three casts, one
    * multiply and one divide — mirrored token for token in the oracle.
    * Degenerate windows (zero variance on either side) emit r = 0.
    *
    * Scale: one hash agg to hourly counts, a per-type bounded sequence()
    * explode (series length, not event count), ONE per-type-partitioned
    * lag window pass shared by all lags, one final agg. Integer power
    * sums assume per-hour counts ≲ 2^31 (beyond that, move the sums to
    * DECIMAL — the formula is unchanged).
    */
  /** Gap-filled hourly count grid per event_type: (event_type, h, c) with
    * every hour from the key's min to max present (zeros inserted) —
    * shared by `hourlyAcf` and `hourlyTrend`. The sequence() explode is
    * series-length-sized, never event-sized.
    */
  /** EWMA horizon: terms beyond `EwmaWindow` hours back are dropped —
    * their combined weight is < 2⁻³², below the 6dp output rounding, so
    * the truncation is invisible in the result while bounding per-row
    * work (and streaming state) at a CONSTANT `EwmaWindow` lags instead
    * of the unbounded recursion s_t = α·x_t + (1−α)·s_{t−1}.
    */
  val EwmaWindow = 32

  /** Exponentially-weighted moving average of the gap-filled hourly count
    * series per event_type, smoothing factor α = 1/2 — the DYADIC
    * operating point: every weight 2⁻⁽ʲ⁺¹⁾ and the head-normalization
    * denominator are exact powers of two, so the whole computation is
    * integer arithmetic + one final IEEE division and both engines agree
    * bit-for-bit (the module's no-transcendentals convention; a general α
    * would put powᵏ in the hot path and libm in the replay gap).
    *
    * Head normalization: the first m < W rows renormalize by the
    * available weight mass Σ_{j<m} 2⁻⁽ʲ⁺¹⁾ = (2^W − 2^(W−m))/2^W, so the
    * series starts unbiased (row 0's EWMA is exactly its own value)
    * instead of decaying in from zero.
    *
    * Scale: W lag expressions over one keyed window — codegen'd, no
    * self-join, one shuffle on event_type; the anomaly read is
    * "current count vs its own smoothed baseline" (pair with
    * rollingZscoreAnomalies' variance-aware flag).
    */
  def ewmaHourly(events: DataFrame, w: Int = EwmaWindow): DataFrame =
    ewmaFromCounts(fillGrid(hourlyCounts(events)), w)

  /** The EWMA window block over a prebuilt dense (event_type, h, c) grid
    * — the serving half, split out so the maintained count table
    * (StreamingEwma) smooths identically to the raw-event path.
    */
  def ewmaFromCounts(filled: DataFrame, w: Int = EwmaWindow): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(w >= 1 && w <= 62, s"ewmaFromCounts: window $w must fit a long power of two")
    val win = Window.partitionBy(col("event_type")).orderBy(col("h"))
    // numerator Σ_j c_{t−j} · 2^(W−1−j) in DECIMAL(38,0): with the default
    // w=32 the largest weight is 2³¹, so a per-(type,hour) count near 2³²
    // would silently wrap a BIGINT term — the same scale-overflow class the
    // t-closeness audit hit. 38 digits hold counts to ~10²⁸ at any w ≤ 62.
    val num = (0 until w).map(j =>
      coalesce(lag(col("c"), j).over(win), lit(0L)).cast("decimal(38,0)") *
        lit(1L << (w - 1 - j)))
      .reduce(_ + _)
    filled
      .select(col("event_type"), col("h"), col("c"),
        least(row_number().over(win), lit(w)).as("m"), num.as("num"))
      .select(col("event_type"), col("h"), col("c"),
        round(col("num").cast("double") /
          (lit(1L << w) - expr(s"shiftleft(CAST(1 AS BIGINT), $w - m)"))
            .cast("double"), 6).as("ewma"))
  }

  /** Raw per-(type, hour) event counts — the domain-sized table the
    * streaming fold maintains additively (StreamingEwma).
    */
  private[graft] def hourlyCounts(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        floor(unix_millis(col("ts")) / lit(3600000L)).cast("bigint").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))

  /** Gap-fill a sparse (event_type, h, c) count table onto the dense
    * per-type [min h, max h] grid, absent hours as zero — shared by the
    * raw-event path and serving from a maintained count table.
    */
  private[graft] def fillGrid(hc: DataFrame): DataFrame = {
    val bounds = hc.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    bounds
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(hc, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), coalesce(col("c"), lit(0L)).as("c"))
  }

  private def hourlyFilled(events: DataFrame): DataFrame =
    fillGrid(hourlyCounts(events))

  def hourlyAcf(events: DataFrame, lags: Seq[Int] = AcfLags): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val filled = hourlyFilled(events)
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val lagged = filled.select(
      col("event_type") +: col("c").as("y") +:
        lags.map(l => lag(col("c"), l).over(w).as(s"x$l")): _*)
    val aggs = lags.flatMap { l =>
      val x = col(s"x$l")
      Seq(count(x).as(s"n$l"), sum(x).as(s"sx$l"),
        sum(when(x.isNotNull, col("y"))).as(s"sy$l"),
        sum(x * col("y")).as(s"sxy$l"), sum(x * x).as(s"sxx$l"),
        sum(when(x.isNotNull, col("y") * col("y"))).as(s"syy$l"))
    }
    val perLag = lags.map { l =>
      struct(lit(l).as("lag"), col(s"n$l").as("n"), col(s"sx$l").as("sx"),
        col(s"sy$l").as("sy"), col(s"sxy$l").as("sxy"),
        col(s"sxx$l").as("sxx"), col(s"syy$l").as("syy"))
    }
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    lagged.groupBy(col("event_type")).agg(aggs.head, aggs.tail: _*)
      .select(col("event_type"), explode(array(perLag: _*)).as("r"))
      .select(col("event_type"), col("r.lag").as("lag"), col("r.n").as("n"),
        col("r.sx").as("sx"), col("r.sy").as("sy"), col("r.sxy").as("sxy"),
        col("r.sxx").as("sxx"), col("r.syy").as("syy"))
      .select(col("event_type"), col("lag"), col("n"),
        round(when(vx > 0 && vy > 0,
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
          .otherwise(lit(0.0)), 6).as("acf"))
  }

  /** Markov next-event transition matrix: per (src → dst) count and
    * row-normalized probability from a lag-1 self-alignment over each
    * user's event sequence (ORDER BY ts, event_id — the repo's
    * deterministic tie-break). The lead() window is PARTITIONED per user
    * so the sort is per-key, never global; the normalizing window runs
    * over the |types|²-row matrix — negligible at any scale.
    */
  def transitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val counts = events
      .select(col("event_type").as("src"),
        lead(col("event_type"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    counts.select(col("src"), col("dst"), col("n"),
      round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("src"))), 6).as("prob"))
  }

  /** PSI rollup over a pre-filled per-(key, bin) count table with columns
    * (keyCol, b, c_ref, c_cur) — the tail of `psiDrift`, shared with the
    * streaming monitor so the two can never diverge.
    */
  def psiOfCounts(filled: DataFrame, keyCol: String, nBins: Int = PsiBins): DataFrame = {
    val tot = filled.groupBy(col(keyCol))
      .agg(sum(col("c_ref")).as("n_ref"), sum(col("c_cur")).as("n_cur"))
    filled.join(broadcast(tot), Seq(keyCol))
      .select(col(keyCol), col("n_ref"), col("n_cur"),
        ((col("c_ref") + 1).cast("double") / (col("n_ref") + nBins).cast("double")).as("pr"),
        ((col("c_cur") + 1).cast("double") / (col("n_cur") + nBins).cast("double")).as("pc"))
      .groupBy(col(keyCol))
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        round(sum((col("pc") - col("pr")) * log(col("pc") / col("pr"))), 6).as("psi"))
  }

  /** Per-(key, bin) reference histogram for the streaming drift monitor —
    * computed ONCE from a trusted snapshot, persisted, and compared
    * against every arriving micro-batch.
    */
  def referenceHistogram(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      binWidth: Double = PsiBinWidth,
      nBins: Int = PsiBins): DataFrame =
    df.select(col(keyCol),
        least(lit(nBins - 1), floor(col(valueCol) / binWidth)).cast("int").as("b"))
      .groupBy(col(keyCol), col("b")).agg(count(lit(1)).as("c_ref"))

  /** Incident-window length (and the interval-join bucket width). */
  val IncidentWindowMs = 1800000L // 30 minutes

  /** BUCKETIZED interval join: which events fall inside any [error,
    * error+30 min) incident window? A pure range-condition join has no
    * equi key, so Spark plans a broadcast nested loop — quadratic blowup
    * the moment the window table outgrows a broadcast. The scale
    * technique: quantize time into buckets the width of the longest
    * interval, explode each window to the (≤2) buckets it covers, and
    * join on the BUCKET as an equi key with the exact range as a
    * residual filter. The join is now shuffle/broadcast-hash on an
    * integer key; each event meets only the windows sharing its bucket,
    * and correctness is restored by the residual predicate + distinct
    * (an event in two overlapping windows counts once).
    *
    * Report: per event_type, total events, events inside ≥1 incident
    * window, and the integer-ppm hit share — the blast-radius panel for
    * an incident review.
    */
  /** CUSUM drift constants: target mean, slack (half the shift worth
    * detecting), and the alarm threshold — exact decimals shared with the
    * oracle SQL.
    */
  val CusumTarget = "50.00"
  val CusumSlack = "10.00"
  val CusumThreshold = "300.00"

  /** Per-user CUSUM change-point detection (Page 1954) over the event
    * value stream: upward statistic S⁺ᵢ = max(0, S⁺ᵢ₋₁ + xᵢ − (μ₀+s)),
    * downward S⁻ᵢ = max(0, S⁻ᵢ₋₁ + (μ₀−s) − xᵢ), alarms where either
    * exceeds h. The recurrence looks inherently sequential, but the
    * clamped fold has a PREFIX-SCAN closed form: with Aᵢ = Pᵢ − i·c
    * (running value sum minus drift line), S⁺ᵢ = Aᵢ − min(0, min_{j≤i} Aⱼ)
    * — two stock window functions (running sum + running min), no UDF,
    * no recursion, whole-stage codegen throughout. All arithmetic is
    * DECIMAL(18,2)-exact, so alarm counts and peak excursions replay
    * bit-identically in the oracle.
    *
    * Scale: two keyed windows over (user, time) — the same partitioning
    * every sessionizer here uses; no global window, no driver loop, and
    * a 100-TB event log fans out by user exactly like windowed_count.
    */
  def cusumChangepoints(
      events: DataFrame,
      target: String = CusumTarget,
      slack: String = CusumSlack,
      threshold: String = CusumThreshold): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val dec = (s: String) => lit(s).cast("decimal(18,2)")
    val cUp = dec(target) + dec(slack)
    val cDn = dec(target) - dec(slack)
    val h = dec(threshold)
    val base = events.select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast("decimal(18,2)").as("v"))
      .withColumn("p", sum(col("v")).over(w))
      .withColumn("i", row_number().over(w))
      .withColumn("a_up", (col("p") - col("i") * cUp).cast("decimal(28,2)"))
      .withColumn("a_dn", (col("p") - col("i") * cDn).cast("decimal(28,2)"))
    val zero = lit("0.00").cast("decimal(28,2)")
    val scored = base
      .withColumn("s_plus",
        (col("a_up") - least(zero, min(col("a_up")).over(w))).cast("decimal(28,2)"))
      .withColumn("s_minus",
        (greatest(zero, max(col("a_dn")).over(w)) - col("a_dn")).cast("decimal(28,2)"))
    scored.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("s_plus") > h, 1L).otherwise(0L)).as("n_up_alarms"),
        sum(when(col("s_minus") > h, 1L).otherwise(0L)).as("n_down_alarms"),
        max(col("s_plus")).cast("decimal(18,2)").cast("double").as("peak_up"),
        max(col("s_minus")).cast("decimal(18,2)").cast("double").as("peak_down"))
  }

  def incidentWindowHits(events: DataFrame): DataFrame = {
    val bucket = (c: Column) => floor(unix_millis(c) / lit(IncidentWindowMs)).cast("long")
    val win = events.filter(col("event_type") === "error")
      .select(col("ts").as("ws"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("we"))
    val wb = win.select(col("ws"), col("we"),
      explode(array(bucket(col("ws")), bucket(col("ws")) + 1)).as("b"))
    val eb = events.select(col("event_id"), col("event_type"), col("ts"),
      bucket(col("ts")).as("b"))
    val hits = eb.join(wb, Seq("b"))
      .filter(col("ts") >= col("ws") && col("ts") < col("we"))
      .select(col("event_id"), col("event_type")).distinct()
    events.groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
      .join(hits.groupBy(col("event_type")).agg(count(lit(1)).as("n_hits")),
        Seq("event_type"), "left")
      .select(col("event_type"), col("n_events"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr("CAST((coalesce(n_hits, 0) * 1000000) div n_events AS BIGINT)").as("hit_ppm"))
  }
}

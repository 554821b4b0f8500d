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

  /** Relative error budget for the inclusion–exclusion overlap estimate,
    * scaled by the exact UNION size: |A∩B| = |A| + |B| − |A∪B| composes
    * THREE ±1.6%-RSE estimates whose errors do not cancel, so the band is
    * materially wider than a single estimate's — ~5σ of the composed
    * error over the union. A small overlap of two large sets is exactly
    * where sketch intersection degrades; the audit boolean is the signal
    * a dashboard needs before trusting it.
    */
  val OverlapBudget = 0.15

  /** Pairwise audience-overlap audit from HLL sketches: per unordered
    * event-type pair, the exact overlap/union beside a boolean asserting
    * the sketch-side inclusion–exclusion estimate (est_A + est_B −
    * est_union, the union being the register-wise max merge) lands within
    * `OverlapBudget` × exact-union. The set-INTERSECTION question HLL
    * cannot answer directly, answered the standard way and audited
    * against truth — at 100 TB the per-type sketches come from the
    * partials table and the exact side is the one-off validation run.
    *
    * Scale: one sketch per type (map-side-combinable agg), a |types|²
    * pair cross of ≤4 KiB sketches, and the exact side's distinct
    * (type, user) self-join — the only corpus-sized work, shared with
    * every other exact-audit query.
    */
  def hllOverlapReport(events: DataFrame, lgK: Int = LgK): DataFrame = {
    val sk = events.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sk"),
        count_distinct(col("user_id")).as("n"))
    val a = sk.select(col("event_type").as("type_a"), col("sk").as("ska"), col("n").as("n_a"))
    val b = sk.select(col("event_type").as("type_b"), col("sk").as("skb"), col("n").as("n_b"))
    val tu = events.select(col("event_type"), col("user_id")).distinct()
    val ov = tu.as("x").join(tu.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("ov_cnt"))
    val est = hll_sketch_estimate(col("ska")) + hll_sketch_estimate(col("skb")) -
      hll_sketch_estimate(hll_union(col("ska"), col("skb")))
    a.join(b, col("type_a") < col("type_b"))
      .join(ov, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        coalesce(col("ov_cnt"), lit(0L)).as("exact_overlap"),
        (col("n_a") + col("n_b") - coalesce(col("ov_cnt"), lit(0L))).as("exact_union"),
        est.as("est"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("exact_overlap"), col("exact_union"),
        (abs(col("est") - col("exact_overlap").cast("double")) <=
          lit(OverlapBudget) * col("exact_union").cast("double"))
          .as("overlap_within_budget"))
  }

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

  /** The band positions (integer ppm) `dailyValueBands` reports. */
  val BandPpm: Seq[(String, Long)] =
    Seq("p10" -> 100000L, "p50" -> 500000L, "p90" -> 900000L)

  /** Per-(event_type, day) exact value bands (p10/p50/p90) — the
    * percentile time series a drift dashboard plots (a widening
    * p10..p90 envelope is variance drift the daily mean hides). Same
    * exact type-1 histogram machinery as quantileRollup, with the day in
    * the partition key; one domain-sized histogram agg + one window.
    */
  def dailyValueBands(
      events: DataFrame,
      ps: Seq[(String, Long)] = BandPpm): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value"), 2).as("vb"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type"), col("day")).orderBy(col("vb"))
    val wAll = Window.partitionBy(col("event_type"), col("day"))
    val cum = h.select(col("event_type"), col("day"), col("vb"),
      sum(col("c")).over(w).as("cum"), sum(col("c")).over(wAll).as("n"))
    val qCols = ps.map { case (name, ppm) =>
      min(when(col("cum") * lit(1000000L) >= col("n") * lit(ppm), col("vb"))).as(name)
    }
    cum.groupBy(col("event_type"), col("day"))
      .agg(max(col("n")).as("n"), qCols: _*)
  }

  /** MAD outlier multiplier: flag |v − median| > k·MAD. An integer k
    * keeps the threshold arithmetic exact (the textbook 1.4826·σ
    * normalization is a non-binary constant; at a fixed k the flag set
    * is identical either way, just at a different nominal sigma level).
    */
  val MadK = 3

  /** Robust outlier report per event_type: exact type-1 median and
    * median-absolute-deviation from the same granularity-bounded
    * histograms quantileRollup uses, plus the count (and integer-ppm
    * share) of rows beyond k·MAD. The robust twin of the z-score gate:
    * one contaminated heavy tail moves mean/σ and masks itself, while
    * median/MAD stay put — the estimator a cleaning pipeline trusts on
    * raw data.
    *
    * Exactness: values are 2dp, so every histogram bucket, cumulative
    * rank cut, |v − med| deviation (re-rounded 2dp), and the k·MAD
    * comparison is the identical IEEE arithmetic in both engines.
    * Scale: two histogram aggs (value domain-sized), two broadcast
    * joins of the per-type cut table against the scan.
    */
  def madOutliers(events: DataFrame, k: Int = MadK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def median(df: DataFrame, vCol: String): DataFrame = {
      val h = df.groupBy(col("event_type"), col(vCol).as("vb"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("vb"))
      val wAll = Window.partitionBy(col("event_type"))
      h.select(col("event_type"), col("vb"),
          sum(col("c")).over(w).as("cum"), sum(col("c")).over(wAll).as("n"))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          min(when(col("cum") * lit(1000000L) >= col("n") * lit(500000L), col("vb")))
            .as("m"))
    }
    val vals = events.select(col("event_type"), round(col("value"), 2).as("vb"))
    val med = median(vals, "vb")
      .select(col("event_type"), col("n"), col("m").as("med"))
    val dev = vals.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), col("n"), col("med"),
        round(abs(col("vb") - col("med")), 2).as("d"))
    val mad = median(dev.select(col("event_type"), col("d")), "d")
      .select(col("event_type"), col("m").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("med")).as("med"), max(col("mad")).as("mad"),
        sum(when(col("d") > lit(k.toDouble) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("event_type"), col("n"), col("med"), col("mad"), col("n_outliers"),
        expr("CAST((n_outliers * 1000000) div n AS BIGINT)").as("outlier_ppm"))
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

  /** Count-min sketch geometry: depth × width counters of state no matter
    * how many distinct keys flow through — the heavy-hitter primitive when
    * the key domain itself (user ids, URLs, n-grams) is too large to
    * groupBy-count exactly in one pass at 100 TB. The overestimate is
    * ~stream-mass/width per probe (min over depth rows), so width must
    * dominate the live key count for a mean-rate threshold to separate:
    * 8192 columns × 4 rows = 32k counters (≤ a few hundred KB broadcast)
    * keeps the error well under the mean rate up to ~10⁴ keys; production
    * sizing scales width with the key budget, not the data volume.
    */
  val CmsDepth = 4
  val CmsWidth = 8192L

  /** 2³¹−1 (Mersenne prime) for the universal hash family
    * h_i(x) = ((a_i·x + b_i) mod p) mod w. a_i < p and x < 2³¹ keep
    * a_i·x < 2⁶² — no BIGINT overflow in either engine; the arithmetic is
    * pure integer ops, so DuckDB replays every counter bit-exactly.
    */
  val CmsPrime = 2147483647L
  val CmsA: Seq[Long] = Seq(1103515245L, 12345701L, 998244353L, 69069L)
  val CmsB: Seq[Long] = Seq(12345L, 54321L, 7L, 1000003L)

  private def cmsCell(row: Int, key: org.apache.spark.sql.Column) =
    pmod(pmod(lit(CmsA(row)) * key + lit(CmsB(row)), lit(CmsPrime)), lit(CmsWidth))

  /** The sketch in table form: (row_idx, col_idx, cnt) over `user_id`.
    * Each event lands in `CmsDepth` cells (a narrow array-explode — no
    * pre-shuffle); the groupBy has BOUNDED cardinality depth×width =
    * 4×8192 = 32768,
    * so map-side combine collapses every 100 TB partition to ≤32768 rows
    * before the only exchange. Sketches merge by per-cell ADDITION —
    * associative, commutative, exact — across days, shards, or streams.
    */
  def cmsSketch(events: DataFrame): DataFrame = {
    val cells = array((0 until CmsDepth).map(i =>
      struct(lit(i).as("row_idx"), cmsCell(i, col("user_id")).as("col_idx"))): _*)
    events.select(explode(cells).as("cell"))
      .select(col("cell.row_idx"), col("cell.col_idx"))
      .groupBy(col("row_idx"), col("col_idx"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate each candidate key's frequency from a sketch table:
    * est(x) = min over rows of cnt[i, h_i(x)] — never under the true
    * count. The sketch is a ≤depth×width-row broadcast; candidates probe
    * it with a map-side join (at scale the candidate set is whatever keyed
    * stream you route past the sketch). Works identically over a batch
    * sketch or the streamed fold's state snapshot — the sketch TABLE is
    * the interface. The probe is a LEFT join with absent cells counted as
    * zero: the sketch table stores only touched cells, so a candidate the
    * stream never hashed into some (or any) cell must read that cell as 0
    * — an inner join would silently drop unseen keys and report min over
    * only the populated cells (an estimate ABOVE the true CMS minimum)
    * for partially-colliding ones.
    */
  def cmsEstimatesFrom(sketch: DataFrame, candidates: DataFrame): DataFrame = {
    val cells = array((0 until CmsDepth).map(i =>
      struct(lit(i).as("row_idx"), cmsCell(i, col("user_id")).as("col_idx"))): _*)
    candidates
      .select(col("user_id"), explode(cells).as("cell"))
      .select(col("user_id"), col("cell.row_idx"), col("cell.col_idx"))
      .join(broadcast(sketch), Seq("row_idx", "col_idx"), "left")
      .groupBy(col("user_id"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** Batch convenience: sketch the events and probe with their own
    * distinct keys.
    */
  def cmsEstimates(events: DataFrame): DataFrame =
    cmsEstimatesFrom(cmsSketch(events), events.select(col("user_id")).distinct())

  /** Heavy-hitter threshold as a ratio over the MEAN per-key rate
    * (est ≥ 12/10 × total/keys): a fixed share-of-stream cut is
    * scale-dependent (half the keys at 10× the data and nothing crosses
    * 1%), while "X× the mean rate" flags the same skew shape at every sf.
    */
  val CmsHeavyNum = 12L
  val CmsHeavyDen = 10L

  /** Keys whose CMS estimate exceeds `num/den` × the mean per-key rate —
    * the decision is an exact integer cross-multiplication
    * (est·keys·den ≥ total·num), no division for an engine to round.
    * Emits the exact count beside the estimate so the report doubles as
    * the sketch's accuracy audit (overestimate = est − exact ≥ 0 always).
    */
  def cmsHeavyHitters(
      events: DataFrame,
      num: Long = CmsHeavyNum,
      den: Long = CmsHeavyDen): DataFrame = {
    val exact = events.groupBy(col("user_id")).agg(count(lit(1)).as("exact_cnt"))
    val total = events.agg(count(lit(1)).as("n_total"),
      count_distinct(col("user_id")).as("n_keys"))
    cmsEstimates(events)
      .join(exact, Seq("user_id"))
      .crossJoin(broadcast(total))
      .filter(col("est_cnt") * col("n_keys") * lit(den) >= col("n_total") * lit(num))
      .select(col("user_id"), col("exact_cnt"), col("est_cnt"),
        (col("est_cnt") - col("exact_cnt")).as("overestimate"))
  }

  /** Join-size estimation from CMS inner products (Alon-Matias-Szegedy
    * by way of Cormode-Muthukrishnan §4.2): |A ⋈_k B| = Σ_k f_A(k)·f_B(k)
    * is estimated by min over hash rows of the row-wise sketch dot
    * product Σ_col cntA·cntB — never an underestimate, overestimate
    * bounded by (e/w)·|A|·|B| w.h.p. The cardinality-estimation question
    * a cost-based optimizer asks BEFORE committing to a join strategy,
    * answered from two ≤depth×width sketch tables without touching
    * either input — at 100 TB the sketches come from the maintained
    * StreamingCms states (additive folds, so the estimate composes over
    * shards/days for free) and the planner never scans a fact table to
    * size its join.
    *
    * The report pairs clicks × purchases per user (the attribution join)
    * and emits the exact pair count beside the estimate — all integer
    * arithmetic, so the oracle replays every value bit-exactly (no
    * error-budget boolean needed) and `overestimate ≥ 0` is a checked
    * invariant, not a comment.
    */
  /** The serving half: the inner-product estimate from two PREBUILT
    * sketch tables — e.g. two maintained StreamingCms states, so a
    * planner sizes the join of two live streams from their folds alone.
    */
  def cmsJoinSizeFromSketches(skA: DataFrame, skB: DataFrame): DataFrame = {
    val dots = skA.withColumnRenamed("cnt", "ca")
      .join(skB.withColumnRenamed("cnt", "cb"), Seq("row_idx", "col_idx"))
      .groupBy(col("row_idx"))
      .agg(sum(col("ca") * col("cb")).as("dot"))
    // a hash row with NO shared cells has dot = 0 and must participate
    // in the min (disjoint key sets estimate 0, not null / not the min
    // of only the colliding rows) — left-join the full row spine
    import skA.sparkSession.implicits._
    (0 until CmsDepth).toDF("row_idx")
      .join(dots, Seq("row_idx"), "left")
      .agg(min(coalesce(col("dot"), lit(0L))).as("est_pairs"))
  }

  def cmsJoinSizeEstimate(events: DataFrame): DataFrame = {
    val a = events.filter(col("event_type") === "click")
    val b = events.filter(col("event_type") === "purchase")
    val est = cmsJoinSizeFromSketches(cmsSketch(a), cmsSketch(b))
    val fa = a.groupBy(col("user_id")).agg(count(lit(1)).as("ca"))
    val fb = b.groupBy(col("user_id")).agg(count(lit(1)).as("cb"))
    val exact = fa.join(fb, Seq("user_id"))
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("exact_pairs"))
    exact.crossJoin(broadcast(est))
      .select(col("exact_pairs"), col("est_pairs"),
        (col("est_pairs") - col("exact_pairs")).as("overestimate"))
  }

  /** Bloom filter geometry: m = 65536 bits stored as 32-bit words (a set
    * mask never reaches the sign bit of either engine's BIGINT carrier),
    * k = 4 probes from the same universal-hash family as the CMS cells
    * with its own constants (independent probes, no correlation with the
    * CMS geometry). a_i < p and key < 2³¹ keep a_i·key < 2⁵⁹ — pure
    * integer arithmetic, replayed bit-exactly by the oracle.
    */
  val BloomBits = 65536L
  val BloomWordBits = 32L
  val BloomK = 4
  val BloomA: Seq[Long] = Seq(1664525L, 22695477L, 134775813L, 214013L)
  val BloomB: Seq[Long] = Seq(1013904223L, 1L, 69069L, 2531011L)

  /** Shifted-key cohort guaranteed absent from the stream (anti-joined
    * against the present keys, so the guarantee is checked, not assumed).
    */
  val BloomAbsentOffset = 1000000000L

  private def bloomPos(i: Int, key: org.apache.spark.sql.Column) =
    pmod(pmod(lit(BloomA(i)) * key + lit(BloomB(i)), lit(CmsPrime)), lit(BloomBits))

  private def bloomPositions(key: org.apache.spark.sql.Column) =
    array((0 until BloomK).map(i => bloomPos(i, key)): _*)

  /** The filter in table form: (word_idx, bits) over `user_id` — each
    * event sets k bits (a narrow array-explode, no pre-shuffle), the
    * groupBy has BOUNDED cardinality m/32 = 2048 words so map-side
    * combine collapses every 100 TB partition to ≤2048 rows before the
    * only exchange. Sketches merge by per-word BITWISE OR — associative,
    * commutative, IDEMPOTENT (a replayed shard cannot corrupt the
    * filter, unlike additive sketches) — across days, shards, or
    * streams. No distinct pass is needed: setting a bit twice is the
    * same bit.
    */
  def bloomSketch(events: DataFrame): DataFrame =
    events.select(explode(bloomPositions(col("user_id"))).as("pos"))
      .select(expr(s"pos DIV $BloomWordBits").as("word_idx"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos % $BloomWordBits AS INT))").as("mask"))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(mask)").as("bits"))

  /** Membership probe of (cohort, user_id) candidates against a sketch
    * table: a key is reported present iff ALL k probed bits are set. The
    * sketch is a ≤2048-row broadcast; absent WORDS read as bits=0 via the
    * left join (the sketch stores only touched words — an inner join
    * would report a never-hashed key as present-by-vacuity). Works
    * identically over a batch sketch or the streamed fold's state
    * snapshot — the sketch TABLE is the interface.
    */
  def bloomProbeFrom(sketch: DataFrame, candidates: DataFrame): DataFrame =
    candidates
      .select(col("cohort"), col("user_id"),
        explode(bloomPositions(col("user_id"))).as("pos"))
      .select(col("cohort"), col("user_id"),
        expr(s"pos DIV $BloomWordBits").as("word_idx"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos % $BloomWordBits AS INT))").as("mask"))
      .join(broadcast(sketch), Seq("word_idx"), "left")
      .groupBy(col("cohort"), col("user_id"))
      .agg(min(when(coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask")) =!= 0, 1L)
        .otherwise(0L)).as("all_set"))

  /** The filter's accuracy audit in one table: hit rate per cohort —
    * `present` (every key the stream contains; the Bloom guarantee is a
    * hit rate of EXACTLY 1.0, no false negatives) vs `absent` (shifted
    * keys proven absent by anti-join; the hit rate IS the measured
    * false-positive rate, to be read against (set_bits/m)^k). Counts and
    * rates are exact integers/ratios — no transcendental bound is
    * computed in-engine.
    */
  def bloomProbeReport(events: DataFrame): DataFrame = {
    val present = events.select(col("user_id")).distinct()
    val absent = present
      .select((col("user_id") + lit(BloomAbsentOffset)).as("user_id"))
      .join(present, Seq("user_id"), "left_anti")
    val cand = present.withColumn("cohort", lit("present"))
      .unionByName(absent.withColumn("cohort", lit("absent")))
    bloomProbeFrom(bloomSketch(events), cand)
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_keys"), sum(col("all_set")).as("n_found"))
      .select(col("cohort"), col("n_keys"), col("n_found"),
        round(col("n_found").cast("double") / col("n_keys"), 6).as("hit_rate"))
  }
}

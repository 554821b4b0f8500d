package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Deterministic corpus sampling for training-data pipelines: stratified
  * keep-rates per stratum plus a train/validation split, both driven by the
  * portable document hash — no RNG state, so any subset is reproducible
  * from the doc_id alone, membership is stable under corpus growth
  * (adding documents never flips existing decisions — the property
  * rand()-based sampling lacks), and the DuckDB oracle replays bit-identical
  * decisions.
  *
  * Scale: one narrow projection + filter over the corpus; no shuffle, no
  * driver state. Rates are integer PARTS-PER-MILLION so the keep threshold
  * is exact integer arithmetic in every engine (a double rate like 0.7
  * would make the cutoff depend on float rounding).
  */
object Sampling {

  /** Per-language keep rates (ppm) — an upsample-English / downsample-zh
    * mix of the kind LLM data recipes pin per source or language.
    */
  val DefaultRatesPpm: Seq[(String, Long)] = Seq(
    "en" -> 1000000L, "de" -> 700000L, "fr" -> 700000L, "es" -> 700000L,
    "zh" -> 500000L)
  val DefaultPpm: Long = 300000L

  /** Validation share: 100/1000 hashed docs (an independent hash stream
    * from the sampling decision, so val membership is unbiased within every
    * stratum).
    */
  val ValPerMille: Long = 100L

  /** Sampled corpus with split assignment: keep doc iff
    * hash("samp", doc_id) mod 1e6 < rate_ppm(lang); split = "val" for
    * hash("split", doc_id) mod 1000 < 100 else "train".
    */
  def stratifiedSample(
      docs: DataFrame,
      ratesPpm: Seq[(String, Long)] = DefaultRatesPpm,
      defaultPpm: Long = DefaultPpm,
      hash: (String, Column) => Column = PortableHash.h31): DataFrame = {
    val ppm = ratesPpm.foldRight(lit(defaultPpm)) { case ((l, r), e) =>
      when(col("lang") === l, lit(r)).otherwise(e)
    }
    docs
      .withColumn("u", pmod(hash("samp", col("doc_id").cast("string")), lit(1000000L)))
      .filter(col("u") < ppm)
      .select(col("doc_id"), col("lang"), col("source"),
        when(pmod(hash("split", col("doc_id").cast("string")), lit(1000L)) < ValPerMille,
          lit("val")).otherwise(lit("train")).as("split"))
  }

  /** Leakage-safe train/validation split: the split decision hashes the
    * document's near-dup COMPONENT representative, not the document — so a
    * near-duplicate pair can never straddle train and validation (the
    * eval-contamination channel a per-doc hash split leaves wide open:
    * with 10% val and independent per-doc decisions, ~18% of near-dup
    * pairs land split-crossed). Documents outside the near-dup graph are
    * their own representative, so the op degrades to `stratifiedSample`'s
    * split exactly where no duplication exists.
    *
    * Scale: the component table is pair-graph-sized (never corpus-sized);
    * the join back to the corpus is one equi-join on doc_id; the split
    * gate is the same integer-ppm hash as every other sampling decision.
    */
  def leakageSafeSplit(
      docs: DataFrame,
      components: DataFrame,
      hash: (String, Column) => Column = PortableHash.h31): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("source"))
      .join(components, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("source"),
        coalesce(col("rep"), col("doc_id")).as("rep"))
      .select(col("doc_id"), col("lang"), col("source"), col("rep"),
        when(pmod(hash("split", col("rep").cast("string")), lit(1000L)) < ValPerMille,
          lit("val")).otherwise(lit("train")).as("split"))

  /** Bucket width (whitespace tokens) for the length histogram. */
  val LenBucketTokens = 8

  /** Length-histogram matching resample — the distribution-matching move
    * (here with a uniform target): flatten the token-length histogram to
    * the RAREST bucket's mass, so bucket b survives at
    * `floor(1e6·min_count/count_b)` ppm through the shared integer-ppm
    * hash gate. Every step is integer-exact: bucket ids come from `div`
    * (never double division, whose floor can misbucket on exact
    * boundaries), and the ppm is a 64-bit integer quotient — at corpus
    * counts ~1e11 the double path would already be past 2^53.
    *
    * Scale: one |buckets|-row aggregate, its one-row min broadcast-crossed
    * back (the temperature_mix pattern), one broadcast equi-join onto the
    * corpus — scanned once, never shuffled.
    */
  def histogramMatch(
      docs: DataFrame,
      bucketTokens: Int = LenBucketTokens,
      hash: (String, Column) => Column = PortableHash.h31): DataFrame = {
    val base = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("bucket", expr(s"n_tokens div $bucketTokens"))
    val counts = base.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    val minCnt = counts.agg(min(col("cnt")).as("min_cnt"))
    val ppm = counts.join(broadcast(minCnt))
      .select(col("bucket"), expr("1000000 * min_cnt div cnt").as("ppm"))
    base.join(broadcast(ppm), Seq("bucket"))
      .filter(pmod(hash("lenmatch", col("doc_id").cast("string")), lit(1000000L)) < col("ppm"))
      .select(col("doc_id"), col("n_tokens"), col("bucket"), col("ppm"))
  }

  /** Fraction of the corpus the temperature mix targets in expectation. */
  val MixTargetFrac: Double = 0.5

  /** Temperature-based source mixing — the data-recipe resampler that
    * flattens a skewed source distribution before training: sampling
    * probability p_s ∝ q_s^α for source share q_s, here pinned at α = 1/2
    * (exponential smoothing as in multilingual LM recipes; sqrt is
    * IEEE-exact in every engine where a general pow differs by ulps, so the
    * per-source rates — and therefore every membership decision — replay
    * bit-identically in the DuckDB oracle). Per-source keep rate
    * r_s = targetFrac·N / (Σ_t √n_t · √n_s), capped at 1, quantized to
    * integer ppm; a doc survives iff its portable hash lands under its
    * source's rate — deterministic, growth-stable membership exactly like
    * `stratifiedSample`.
    *
    * Scale: one count aggregate over the corpus (map-side combinable), a
    * few-row rate table derived from it (the one-row totals frame is
    * broadcast-crossed onto the per-source counts — the same labeled
    * one-row NLJ shape as resample_hourly's bounds), then one broadcast
    * equi-join + hash-gate filter over the corpus. No corpus shuffle at all.
    */
  /** Maximum documents kept per source by `cappedPerSource`. */
  val SourceCap = 10

  /** Per-source quota capping — the "at most N documents per domain" gate
    * web-scale recipes apply so no single domain dominates the mix (the
    * complement of `temperatureMix`: a hard per-source ceiling instead of a
    * proportional rate). Keeps, per source, the `cap` documents with the
    * smallest portable hash (doc_id tie-break) — a deterministic priority
    * sample whose membership is as stable under corpus growth as hashing
    * allows: a new document displaces at most the current boundary doc.
    *
    * Scale shape: implemented with the bounded-heap `TopKAggregator`, NOT a
    * ranking window — the window form shuffles and SORTS every source's
    * full document list (hot domains are exactly where the cap matters and
    * exactly where that sort blows up), while the aggregator ships ≤ cap
    * rows per (source, partition) map-side and never materializes a sort.
    * The DuckDB oracle ranks with row_number over the same (hash, doc_id)
    * order, so the aggregator path stays hash-checked row-identical.
    */
  def cappedPerSource(
      docs: DataFrame,
      cap: Int = SourceCap,
      hash: (String, Column) => Column = PortableHash.h31): DataFrame = {
    val topk = udaf(new graft.functions.TopKAggregator(cap),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong))
    docs
      .select(col("source"), col("doc_id"),
        hash("cap", col("doc_id").cast("string")).as("h"))
      // TopKAggregator keeps the LARGEST sortValues; negate the 31-bit hash
      // (exactly representable in double) so "largest" = smallest hash,
      // ties to the smallest doc_id — row_number() over (h ASC, doc_id ASC)
      .groupBy(col("source"))
      .agg(topk((-col("h")).cast("double"), col("doc_id")).as("topk"))
      .select(col("source"), posexplode(col("topk")).as(Seq("i", "t")))
      .select(col("source"), (col("i") + 1).cast("int").as("rank"),
        col("t._2").as("doc_id"))
  }

  /** Base ppm multiplier for `weightedSample`: a quality score of 1.0 maps
    * to rate 1.2e6 (clamped to certain-keep), so top-quality docs always
    * survive and the keep probability degrades linearly below ~0.83.
    * 1 200 000 is deliberately NOT a multiple that can land a 6dp score on
    * a .5 tie (1.2·d mod 1 ∈ {0, .2, .4, .6, .8}), and the rate is
    * floor()ed from the identical IEEE product in both engines.
    */
  val WeightBasePpm: Long = 1200000L

  /** Quality-weighted deterministic Bernoulli sampling: keep probability
    * proportional to a per-doc score (capped at 1) — the soft keep/drop
    * gate between hard quality filtering (lose borderline docs entirely)
    * and uniform sampling (ignore quality). Input needs (doc_id,
    * quality_score[6dp]); a doc survives iff its portable hash lands under
    * floor(score·base) ppm — deterministic, growth-stable, replayable,
    * like every other sampling decision here.
    *
    * Scale: a projection + filter over the scored corpus; no shuffle.
    */
  def weightedSample(
      scored: DataFrame,
      basePpm: Long = WeightBasePpm,
      hash: (String, Column) => Column = PortableHash.h31): DataFrame =
    scored
      .select(col("doc_id"), col("quality_score"),
        least(lit(1000000L),
          floor(col("quality_score") * lit(basePpm)).cast("bigint")).as("rate_ppm"))
      .filter(pmod(hash("wsamp", col("doc_id").cast("string")), lit(1000000L))
        < col("rate_ppm"))

  /** Reservoir size per source for `weightedReservoirPerSource`. */
  val ReservoirK = 8

  /** Deterministic weighted sampling WITHOUT replacement, fixed size per
    * source — Efraimidis-Spirakis A-Res (IPL 2006): each doc draws
    * u ∈ (0,1] from its portable hash and competes with race key
    * ln(u)/w (monotone in the classic u^(1/w)); the k largest keys per
    * source win, giving inclusion probability proportional to the doc's
    * quality score. The missing point on the sampling spectrum:
    * `weightedSample` is weight-proportional but variable-size
    * (Bernoulli), `cappedPerSource` is fixed-size but uniform — this is
    * fixed-size AND weighted. Deterministic and replayable like every
    * sampling decision here: u is a hash, not an RNG.
    *
    * Scale shape: same bounded-heap aggregator as cappedPerSource — ≤ k
    * rows per (source, partition) ship map-side, no per-source sort ever
    * materializes. ln runs on engine-identical doubles (u's divisor is a
    * power of two, so the quotient is exact) — the unigramLogprob
    * determinism argument; keys round to 6dp with doc_id tie-breaks.
    * ACCEPTED RISK (the documented exception to the "no transcendental
    * functions" module convention): JVM Math.log and DuckDB's libm log may
    * differ in the final ulp for identical inputs, so a key landing
    * EXACTLY on a 6dp rounding boundary could round apart and flip a race
    * outcome between engines. With 52 mantissa bits a boundary hit needs
    * the quotient's last ~32 bits to spell .xxxxx5000…, ~2⁻³² per row —
    * the oracle has stayed hash-green across every SF; if a corpus ever
    * trips it, widen the rounding or compare keys with a tolerance.
    */
  def weightedReservoirPerSource(
      docs: DataFrame,
      k: Int = ReservoirK,
      hash: (String, Column) => Column = PortableHash.h31): DataFrame = {
    val q = TextOps.qualityScore(docs).select(col("doc_id"), col("quality_score"))
    val topk = udaf(new graft.functions.TopKAggregator(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong))
    docs.select(col("source"), col("doc_id")).join(q, Seq("doc_id"))
      .select(col("source"), col("doc_id"),
        round(
          log((hash("res", col("doc_id").cast("string")) + 1).cast("double") /
            lit(2147483648.0)) / col("quality_score"), 6).as("key"))
      .groupBy(col("source"))
      .agg(topk(col("key"), col("doc_id")).as("topk"))
      .select(col("source"), posexplode(col("topk")).as(Seq("i", "t")))
      .select(col("source"), (col("i") + 1).cast("int").as("rank"),
        col("t._2").as("doc_id"), col("t._1").as("race_key"))
  }

  /** Power-law exponent for mixture reweighting (the "unified scaling"
    * α: n^0.7 flattens source sizes less aggressively than sqrt).
    */
  val MixAlpha: Double = 0.7
  /** Token budget as a multiple of the corpus; per-source repeat ceiling
    * (the >4-epoch degradation line from the data-constrained scaling
    * literature).
    */
  val MixBudgetMultiple: Double = 2.0
  val MixCapEpochs: Double = 4.0

  /** Mixture EPOCH PLANNER — the artifact a training run compiles its data
    * recipe into: given a token budget (a multiple of the corpus) and a
    * temperature-flattened target distribution w_s ∝ tokens_s^α, emit per
    * source how many EPOCHS (repeat passes, fractional) to take, capped at
    * `capEpochs` so no small source is repeated past the degradation
    * ceiling. `temperatureMix` SELECTS documents for one pass; this plans
    * the pass COUNTS — together they are the sampling half and the
    * scheduling half of a data recipe.
    *
    * Columns: n_docs/n_tokens (census), weight (normalized w_s), epochs
    * (budget·w_s/tokens_s, capped, 6dp), planned_tokens (epochs·tokens_s,
    * integer), capped (whether the ceiling bound). The cap means planned
    * tokens can undershoot the budget — the report makes the shortfall
    * visible rather than silently renormalizing (re-spreading it changes
    * every downstream weight; that decision belongs to the recipe owner).
    *
    * Scale: one map-side-combined per-source aggregate over the corpus +
    * a one-row broadcast of totals — no wide shuffle, no driver loop;
    * the 100 TB cost is the single token-count pass.
    */
  def mixtureEpochPlan(
      docs: DataFrame,
      budgetMultiple: Double = MixBudgetMultiple,
      alpha: Double = MixAlpha,
      capEpochs: Double = MixCapEpochs): DataFrame = {
    val perSource = docs
      .select(col("source"), size(split(col("text"), " ")).cast("bigint").as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      // 6dp round after pow: Math.pow vs the oracle's libm can differ in
      // the last ulp (~1e-13 relative); the grid absorbs it — the same
      // cross-engine double convention as every emitted float
      .withColumn("p", round(pow(col("n_tokens").cast("double"), lit(alpha)), 6))
    val totals = perSource.agg(
      sum(col("n_tokens")).as("tot_tokens"), round(sum(col("p")), 6).as("p_sum"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("weight", round(col("p") / col("p_sum"), 6))
      .withColumn("epochs_raw",
        round(lit(budgetMultiple) * col("tot_tokens") * col("weight") / col("n_tokens"), 6))
      .withColumn("epochs", least(lit(capEpochs), col("epochs_raw")))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
        col("epochs"),
        round(col("epochs") * col("n_tokens"), 0).cast("bigint").as("planned_tokens"),
        (col("epochs_raw") > lit(capEpochs)).as("capped"))
  }

  def temperatureMix(
      docs: DataFrame,
      targetFrac: Double = MixTargetFrac,
      hash: (String, Column) => Column = PortableHash.h31): DataFrame = {
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    // totals rounded to 6dp before the rate division: a handful of sqrt
    // terms can sum in different orders across engines (cross-engine float
    // convention, same as every other emitted double)
    val totals = counts.agg(
      sum(col("n_s")).as("n_tot"), round(sum(sqrt(col("n_s"))), 6).as("s_sum"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col("source"),
        least(lit(1000000L),
          round(lit(1e6) * lit(targetFrac) * col("n_tot") / col("s_sum") / sqrt(col("n_s")), 0)
            .cast("bigint")).as("rate_ppm"))
    docs.join(broadcast(rates), Seq("source"))
      .filter(pmod(hash("mix", col("doc_id").cast("string")), lit(1000000L)) < col("rate_ppm"))
      .select(col("doc_id"), col("source"), col("rate_ppm"))
  }
}

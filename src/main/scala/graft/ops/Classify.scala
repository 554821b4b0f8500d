package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.PortableHash

/** Model-based document classification for LLM training-data curation.
  *
  * The reference pipeline's quality gates are hand-crafted heuristics
  * (TextOps.qualityScore) and self-trained LMs (unigram/bigramLogprob);
  * production curation stacks (CCNet, fastText lang-id, the GPT-3/LLaMA
  * "looks-like-Wikipedia" filters) add a SUPERVISED linear classifier over
  * hashed bag-of-words features. This is that operator, Spark-first:
  * multinomial Naive Bayes with the hashing trick, trained and applied in
  * one declarative plan — no MLlib, no driver-side model object, no UDFs.
  *
  * Design choices that matter at 100 TB:
  *
  *  - '''Hashed features''' (`NbFeatures` buckets via the portable seeded
  *    hash): the model is a (class × bucket) count table bounded at C·F rows
  *    REGARDLESS of corpus vocabulary, so it always fits in a broadcast —
  *    the scoring join is map-side against every instance split, no shuffle
  *    of the token stream. An unhashed vocabulary model over 100 TB of web
  *    text would be billions of rows and force a Zipf-skewed shuffle join.
  *
  *  - '''Fixed-point log-probabilities''': each per-token term
  *    ln((c+1)/(tot+F)) is quantized to integer micro-nats
  *    (round(·) × 1e6) BEFORE accumulation. Integer sums are exact and
  *    order-independent, so the per-document score — and therefore the
  *    argmax class decision — is bit-identical no matter how 1000 executors
  *    interleave partial aggregation. A double sum is NOT reproducible
  *    across runs/cluster sizes (floating-point addition is not
  *    associative); quantize-then-sum makes the decision boundary
  *    deterministic, which is what lets DuckDB replay the classifier
  *    hash-exactly. The ±0.5e-6-per-token quantization error is orders of
  *    magnitude below the class-separation signal.
  *
  *  - '''Laplace smoothing over the fixed bucket domain''' (V = F): the
  *    smoothing denominator is a constant, not a corpus-dependent distinct
  *    count — one less global aggregate, and unseen-feature terms are
  *    derivable per class without a vocabulary lookup.
  *
  * Plan shape: one bounded hash-agg for the model (map-side combinable,
  * output ≤ C·F rows), broadcast back; the scoring side is
  * explode → hash → broadcast-join → per-(doc,class) hash-agg → size-C
  * per-doc window. The only shuffles are keyed on doc_id — the same
  * partitioning both stages reuse.
  */
object Classify {

  /** Feature-hash buckets (power of two, C·F model rows ≈ tens of KB here;
    * at a production 2^20 the model is still a ~100 MB broadcast).
    */
  val NbFeatures = 4096

  /** Seed for the portable feature hash (shared with the oracle SQL). */
  val NbSeed = "nb"

  /** Fixed-point scale: micro-nats per unit log-probability. */
  val FpScale = 1000000L

  private def tokens(text: Column): Column = split(text, " ")

  /** Per-(doc, class) fixed-point NB scores: doc_id, lang (true label),
    * cls (candidate class), score_fp (integer micro-nats, prior included).
    *
    * One hashed token scan: the corpus is aggregated to per-(doc, feat)
    * counts FIRST, so the (expensive, oracle-portable) feature hash runs
    * exactly once per token instance, training counts derive from the
    * same aggregate (cnt = Σ over docs, ctot = Σ over cnt — never a
    * second scan), and the ×C class fanout multiplies the much smaller
    * distinct-(doc, feat) frame. Scoring weights each (feat, cls) term by
    * the in-doc count — an integer × the quantized term, so the result is
    * EXACTLY the per-instance sum the oracle replays.
    */
  def nbLangScores(docs: DataFrame): DataFrame = {
    val docFeat = docs
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("lang"),
        pmod(PortableHash.h31(NbSeed, col("tok")), lit(NbFeatures.toLong)).as("feat"))
      .groupBy(col("doc_id"), col("lang"), col("feat"))
      .agg(count(lit(1)).as("n"))

    // Model: bounded (class × bucket) counts + per-class totals + doc
    // priors — all derived from docFeat, no second corpus scan.
    val cnt = docFeat.groupBy(col("lang").as("cls"), col("feat"))
      .agg(sum(col("n")).as("c"))
    val ctot = cnt.groupBy(col("cls")).agg(sum(col("c")).as("tot"))
    val cdocs = docs.groupBy(col("lang").as("cls")).agg(count(lit(1)).as("nd"))
    val tdocs = docs.agg(count(lit(1)).as("n_total"))
    val prior = cdocs.crossJoin(broadcast(tdocs)).select(
      col("cls"),
      fp(log(col("nd").cast("double") / col("n_total").cast("double"))).as("prior_fp"))

    // Score every (doc, feat) against every class: C-row broadcast cross,
    // then the broadcast model join (≤ C·F rows); unseen (cls, feat)
    // smooths to c=0.
    val classes = cdocs.select(col("cls"))
    val terms = docFeat
      .crossJoin(broadcast(classes))
      .join(broadcast(cnt), Seq("cls", "feat"), "left")
      .join(broadcast(ctot), Seq("cls"))
      .select(col("doc_id"), col("lang"), col("cls"),
        (col("n") * fp(log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
          (col("tot") + lit(NbFeatures.toLong)).cast("double")))).as("t_fp"))

    terms.groupBy(col("doc_id"), col("lang"), col("cls"))
      .agg(sum(col("t_fp")).as("s_fp"))
      .join(broadcast(prior), Seq("cls"))
      .select(col("doc_id"), col("lang"), col("cls"),
        (col("s_fp") + col("prior_fp")).as("score_fp"))
  }

  /** Quantize a log-probability to integer micro-nats (exact, summable). */
  private def fp(logp: Column): Column =
    round(logp * lit(FpScale.toDouble), 0).cast("long")

  /** Per-document prediction: doc_id, lang (true), pred_lang, score
    * (nats, 6dp), correct (0/1). Argmax over the exact integer scores,
    * ties broken by class name ascending — fully deterministic.
    */
  def nbLangClassify(docs: DataFrame): DataFrame =
    nbLangClassifyFrom(nbLangScores(docs))

  /** `nbLangClassify` over a PREBUILT score table (the serve-side
    * artifact: all three NB reports are projections/rollups of the same
    * per-(doc, class) fixed-point scores, so the hashed token scan and
    * the C-fanout scoring run once per corpus, not once per report).
    */
  def nbLangClassifyFrom(scores: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_fp").desc, col("cls").asc)
    scores
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("cls").as("pred_lang"),
        round(col("score_fp").cast("double") / lit(FpScale.toDouble), 6).as("score"),
        when(col("cls") === col("lang"), 1L).otherwise(0L).as("correct"))
  }

  /** Confusion matrix of the self-trained classifier: lang, pred_lang, n.
    * (Training on the scored corpus itself — the resubstitution view a
    * curation pipeline dashboards to sanity-check label/feature coherence.)
    */
  def nbLangConfusion(docs: DataFrame): DataFrame =
    nbLangConfusionFrom(nbLangScores(docs))

  /** `nbLangConfusion` over a prebuilt score table. */
  def nbLangConfusionFrom(scores: DataFrame): DataFrame =
    nbLangClassifyFrom(scores)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))

  /** Margin-bucket width in micro-nats (0.1 nat) and the top bucket cap. */
  val MarginBucketFp = 100000L
  val MarginBucketMax = 9L

  /** Calibration-by-margin report: bucket documents by the DECISION
    * MARGIN (top score − runner-up score, an exact integer in micro-nats)
    * and report per-bucket accuracy as an integer-ppm quotient. The
    * margin is the confidence signal a curation gate thresholds on
    * ("keep only confidently-classified docs"); this report is the audit
    * that says whether that confidence is EARNED — accuracy should rise
    * monotonically with margin, and a flat curve means the gate is
    * filtering noise. Every number is integer arithmetic over the same
    * fixed-point scores the classifier ranks by, so the oracle replays it
    * exactly. Scale: one size-C window per doc (shared with classify) +
    * one ≤10-bucket hash agg.
    */
  def nbMarginCalibration(docs: DataFrame): DataFrame =
    nbMarginCalibrationFrom(nbLangScores(docs))

  /** `nbMarginCalibration` over a prebuilt score table. */
  def nbMarginCalibrationFrom(scores: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_fp").desc, col("cls").asc)
    // one window pass: the winner row carries the runner-up score via
    // lead() — no string-pivot aggregate (max(string) would fall back to
    // SortAggregate), no second join
    val top2 = scores
      .withColumn("rn", row_number().over(w))
      .withColumn("s2", lead(col("score_fp"), 1).over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("cls").as("pred"),
        col("score_fp").as("s1"), col("s2"))
    top2.select(col("lang"), col("pred"),
        // a single-class corpus has no runner-up: maximal confidence
        when(col("s2").isNull, lit(MarginBucketMax)).otherwise(
          least(expr(s"CAST((s1 - s2) div $MarginBucketFp AS BIGINT)"),
            lit(MarginBucketMax))).as("margin_bucket"))
      .groupBy(col("margin_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred") === col("lang"), 1L).otherwise(0L)).as("n_correct"))
      .select(col("margin_bucket"), col("n_docs"), col("n_correct"),
        expr("CAST((n_correct * 1000000) div n_docs AS BIGINT)").as("acc_ppm"))
  }
}

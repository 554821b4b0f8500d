package graft.ops

import graft.ops.Materialize.EagerOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy / re-identification governance over the event stream — the
  * audit a training-data pipeline runs after PII scrubbing (TextOps
  * .scrubPii removes direct identifiers; these operators measure and
  * mitigate what QUASI-identifiers still leak: combinations of
  * innocuous-looking columns unique enough to single a row out).
  *
  * Quasi-identifier here: (event_type, day, coarse value bucket) — the
  * classic "zip/birthdate/sex" shape translated to this schema. An
  * equivalence class is a distinct quasi tuple; a row in a class smaller
  * than k is re-identifiable by anyone who knows those three attributes.
  *
  * All decisions are integer arithmetic (class counts, integer-ppm risk
  * quotients, bucket floors), so the DuckDB oracle replays both the
  * report and the suppression row for row.
  *
  * Scale: one hash agg on the quasi tuple (map-side combinable,
  * cardinality = the quasi domain, not the corpus), then either a
  * domain-sized rollup (report) or one equi-join of rows against their
  * class size (anonymize) — the same shape as dedup_exact; AQE broadcasts
  * the class table when the domain is small.
  */
object Privacy {

  /** Minimum indistinguishable-group size (the "k" of k-anonymity). */
  val KAnon = 5L

  /** Coarseness of the value quasi-column: floor(value / 10). */
  val ValueBucket = 10.0

  private def quasi(df: DataFrame): DataFrame =
    df.select(col("event_id"), col("event_type"),
      to_date(col("ts")).as("day"),
      floor(col("value") / lit(ValueBucket)).cast("long").as("vb"))

  private def classSizes(q: DataFrame): DataFrame =
    q.groupBy(col("event_type"), col("day"), col("vb"))
      .agg(count(lit(1)).as("cls_n"))

  /** Per-class census (event_type, day, vb → row count + distinct
    * sensitive users) — the table BOTH audits roll up from, and exactly
    * what StreamingGovernance maintains incrementally: cls_n and n_sens
    * are per-class recomputable from a class-sized snapshot slice, so
    * the recompute-affected-classes fold keeps the view equal to this
    * aggregation of the latest snapshot.
    */
  def classStats(events: DataFrame): DataFrame =
    events.select(col("event_type"), to_date(col("ts")).as("day"),
        floor(col("value") / lit(ValueBucket)).cast("long").as("vb"),
        col("user_id"))
      .groupBy(col("event_type"), col("day"), col("vb"))
      .agg(count(lit(1)).as("cls_n"), countDistinct(col("user_id")).as("n_sens"))

  /** Per-event_type k-anonymity audit: equivalence-class count, total
    * rows, rows at risk (class < k), the smallest class, and the risk
    * share as an exact integer-ppm quotient.
    */
  def kAnonymityReport(events: DataFrame, k: Long = KAnon): DataFrame =
    kAnonymityReportFromClasses(classSizes(quasi(events)), k)

  /** The k-anonymity rollup from a prebuilt class table (needs cls_n;
    * the maintained class view or the inline census both qualify).
    */
  def kAnonymityReportFromClasses(classes: DataFrame, k: Long = KAnon): DataFrame =
    classes
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("cls_n")).as("n_rows"),
        sum(when(col("cls_n") < k, col("cls_n")).otherwise(lit(0L))).as("rows_at_risk"),
        min(col("cls_n")).as("min_class"))
      .select(col("event_type"), col("n_classes"), col("n_rows"),
        col("rows_at_risk"), col("min_class"),
        expr("CAST((rows_at_risk * 1000000) div n_rows AS BIGINT)").as("risk_ppm"))

  /** Minimum distinct-sensitive-value count per class (the "l" of
    * l-diversity).
    */
  val LDiv = 3L

  /** Per-event_type l-DIVERSITY audit — the attack k-anonymity misses:
    * a class of k rows that all belong to ONE user is k-anonymous yet
    * fully re-identifying (homogeneity attack, Machanavajjhala et al.
    * ICDE'06). Sensitive attribute here = user_id; a class is diverse
    * iff it mixes ≥ l distinct users. Reports, per event_type, the
    * class census, rows in under-diverse classes, the worst class's
    * diversity, and the exact integer-ppm risk share.
    *
    * Scale: the same quasi hash agg as the k-report with one extra
    * distinct-count (quasi-domain-sized, never corpus-sized), then a
    * domain rollup.
    */
  def lDiversityReport(events: DataFrame, l: Long = LDiv): DataFrame =
    lDiversityReportFromClasses(classStats(events), l)

  /** The l-diversity rollup from a prebuilt class table (cls_n + n_sens). */
  def lDiversityReportFromClasses(classes: DataFrame, l: Long = LDiv): DataFrame =
    classes
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("cls_n")).as("n_rows"),
        sum(when(col("n_sens") < l, 1L).otherwise(0L)).as("low_classes"),
        sum(when(col("n_sens") < l, col("cls_n")).otherwise(lit(0L))).as("rows_at_risk"),
        min(col("n_sens")).as("min_diversity"))
      .select(col("event_type"), col("n_classes"), col("n_rows"),
        col("low_classes"), col("rows_at_risk"), col("min_diversity"),
        expr("CAST((rows_at_risk * 1000000) div n_rows AS BIGINT)").as("risk_ppm"))

  /** Suppression-based k-anonymization: rows whose equivalence class is
    * smaller than k get their quasi columns (day, value bucket)
    * suppressed to NULL — the suppressed rows then share one
    * per-event_type class. Emits the suppression flag so downstream
    * consumers can weigh or exclude generalized rows.
    */
  def kAnonymize(events: DataFrame, k: Long = KAnon): DataFrame = {
    val q = quasi(events)
    q.join(classSizes(q), Seq("event_type", "day", "vb"))
      .select(col("event_id"), col("event_type"),
        when(col("cls_n") >= k, col("day")).otherwise(lit(null)).as("day"),
        when(col("cls_n") >= k, col("vb")).otherwise(lit(null)).as("vb"),
        when(col("cls_n") < k, 1L).otherwise(0L).as("suppressed"))
  }

  /** t-closeness threshold in integer ppm (t = 0.5 over the [0, 1] TVD
    * scale — generous on purpose: small synthetic classes are sparse,
    * and the audit's job is flagging the OUTLIER classes, not failing
    * every small one).
    */
  val TCloseTPpm = 500000L

  /** Per-event_type t-CLOSENESS audit — the attack l-diversity misses
    * (Li, Li & Venkatasubramanian, ICDE'07): a class can mix l distinct
    * sensitive values yet have a DISTRIBUTION wildly different from the
    * table's (e.g. 9-of-10 rows one user where that user is 1% of the
    * table) — the skew itself leaks. For a categorical sensitive
    * attribute the prescribed distance is total variation
    * TVD = ½ Σ_u |p_u − q_u| between the class distribution p and the
    * event_type-wide distribution q.
    *
    * Every class TVD is an EXACT integer ppm: with class counts c_u,
    * class size n_c, global counts g_u, total N,
    *   TVD·(2·n_c·N) = Σ_{u∈class} |c_u·N − g_u·n_c| + (N − Σ_{u∈class} g_u)·n_c
    * (the second term folds every user absent from the class), so the
    * quotient is one integer division — no float accumulation order for
    * the engines to disagree on.
    *
    * Scale: one (class, user) hash agg (map-side combinable, cardinality
    * = classes × users-per-class, never corpus-sized), two broadcast-
    * sized per-type totals, a class rollup.
    */
  def tClosenessReport(events: DataFrame, tPpm: Long = TCloseTPpm): DataFrame =
    tClosenessFromCounts(classUserCounts(events), tPpm)

  /** Per-(class, user) census (quasi tuple, user → row count) — the ONE
    * table the t-closeness audit needs: class sizes, global per-user
    * counts, and per-type totals all derive from it by rollup, so the
    * streamed fold (StreamingGovernance) maintains only this census and
    * the audit serves from the state snapshot.
    */
  def classUserCounts(events: DataFrame): DataFrame =
    events.select(col("event_type"), to_date(col("ts")).as("day"),
        floor(col("value") / lit(ValueBucket)).cast("long").as("vb"), col("user_id"))
      .groupBy(col("event_type"), col("day"), col("vb"), col("user_id"))
      .agg(count(lit(1)).as("c_u"))

  /** Per-class TVD from a (class, user) census: (event_type, day, vb,
    * cls_n, tvd_ppm) — the shared core of the audit rollup and the apply
    * operator's per-round far-class detection.
    *
    * DECIMAL(38,0) arithmetic throughout the quotient: the numerator
    * reaches ~2·cls_n·n_tot·10⁶, which blows through BIGINT once
    * cls_n·n_tot > ~4.6·10¹² (a 10M-row type with a 1M-row class) —
    * exactly the scale this audit exists for. Still exact integers;
    * the `div` is one integral divide, no float enters.
    */
  private[graft] def perClassTvd(cu: DataFrame): DataFrame = {
    val cls = cu.groupBy(col("event_type"), col("day"), col("vb"))
      .agg(sum(col("c_u")).as("cls_n"))
    val gu = cu.groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("c_u")).as("g_u"))
    val gn = gu.groupBy(col("event_type")).agg(sum(col("g_u")).as("n_tot"))
    cu
      .join(cls, Seq("event_type", "day", "vb"))
      .join(gu, Seq("event_type", "user_id"))
      .join(broadcast(gn), Seq("event_type"))
      .groupBy(col("event_type"), col("day"), col("vb"),
        col("cls_n"), col("n_tot"))
      .agg(sum(abs(col("c_u").cast("decimal(38,0)") * col("n_tot") -
          col("g_u").cast("decimal(38,0)") * col("cls_n"))).as("num_in"),
        sum(col("g_u")).as("g_in"))
      .select(col("event_type"), col("day"), col("vb"), col("cls_n"),
        expr("""CAST(((num_in + (CAST(n_tot AS DECIMAL(38,0)) - g_in) * cls_n)
                 * 1000000) div (CAST(2 AS DECIMAL(38,0)) * cls_n * n_tot) AS BIGINT)""")
          .as("tvd_ppm"))
  }

  /** The t-closeness rollup from a prebuilt (class, user) census —
    * identical to the inline audit because every derived table (class
    * sizes, global counts, totals) is a rollup of the census itself.
    */
  def tClosenessFromCounts(cu: DataFrame, tPpm: Long = TCloseTPpm): DataFrame =
    perClassTvd(cu).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("cls_n")).as("n_rows"),
        sum(when(col("tvd_ppm") > tPpm, 1L).otherwise(0L)).as("far_classes"),
        sum(when(col("tvd_ppm") > tPpm, col("cls_n")).otherwise(lit(0L))).as("rows_at_risk"),
        max(col("tvd_ppm")).as("max_tvd_ppm"))
      .select(col("event_type"), col("n_classes"), col("n_rows"),
        col("far_classes"), col("rows_at_risk"), col("max_tvd_ppm"),
        expr("CAST((rows_at_risk * 1000000) div n_rows AS BIGINT)").as("risk_ppm"))

  /** Rounds of far-class suppression `tClosenessApply` runs. Fixed (not
    * a convergence loop) so the DuckDB oracle can unroll it verbatim; a
    * round after the fixpoint is a no-op, so extra rounds are free of
    * semantic effect. 4 cascade levels is far beyond what real skew
    * needs — each round only triggers when dropping a far class shifted
    * the GLOBAL distribution enough to push a previously-close class
    * over t.
    */
  val TCloseApplyRounds = 4

  /** Default remediation threshold (integer ppm). Deliberately LOOSER
    * than the audit's flagging threshold: on a census whose classes are
    * sparse relative to the user population (every small class has TVD
    * near 1 − its user coverage — the measured testdata range is
    * 0.80-0.9997), remediating at the audit's t would suppress the whole
    * table. The apply knob targets the far TAIL (worst ~quarter of
    * classes) while the audit keeps flagging everything over its own t;
    * production tunes both to the corpus.
    */
  val TCloseApplyTPpm = 980000L

  /** t-closeness REMEDIATION — the apply path the audit lacked: suppress
    * (drop) every equivalence class whose TVD to the event_type-wide
    * sensitive distribution exceeds t, and ITERATE, because removing a
    * far class changes the global distribution every other class is
    * measured against (the cascade one-shot filtering misses: a class
    * can be t-close only thanks to the skew a dropped neighbor
    * contributed). Record suppression rather than value suppression —
    * NULLing the quasi columns (the kAnonymize treatment) would pool the
    * far classes into one residual class whose skew is the very leak
    * t-closeness measures, with nothing further to generalize.
    *
    * Returns the surviving events with their original columns, so
    * `tClosenessReport(tClosenessApply(df, t), t)` is directly the
    * output's own audit — far_classes = 0 after the cascade settles
    * (spec-pinned, including a planted second-round cascade).
    *
    * Scale: the events table is scanned twice (census once, final
    * semi-join once); every round iterates on the DOMAIN-sized census
    * only (classes × users-per-class rows), localCheckpoint-truncated so
    * the lineage never nests across rounds.
    */
  def tClosenessApply(
      events: DataFrame,
      tPpm: Long = TCloseApplyTPpm,
      rounds: Int = TCloseApplyRounds): DataFrame = {
    var cu = classUserCounts(events).eagerCkpt
    // A round with an EMPTY far set is the fixpoint: cu is unchanged, so
    // every later round is provably a no-op and the residual audit is
    // provably zero — stop paying for them (each skipped round is a full
    // perClassTvd: three aggregations + three joins). Materializing `far`
    // per executed round costs one small job and makes the anti-join read
    // a tiny checkpointed frame; output is bit-identical to running all
    // `rounds` rounds unconditionally.
    var converged = false
    var i = 0
    while (i < rounds && !converged) {
      val far = perClassTvd(cu).filter(col("tvd_ppm") > tPpm)
        .select(col("event_type"), col("day"), col("vb"))
        .eagerCkpt
      if (far.isEmpty) converged = true
      else cu = cu.join(far, Seq("event_type", "day", "vb"), "left_anti")
        .eagerCkpt
      i += 1
    }
    // fixpoint guard: the scaladoc promises the output's own audit passes;
    // if a cascade needs more than `rounds` suppression rounds, fail loudly
    // (one domain-sized scalar count) instead of returning a table that
    // silently under-suppresses — a privacy remediation must not lie.
    // Skipped when a round already observed the empty far set (residual ≡ 0).
    if (!converged) {
      val residual = perClassTvd(cu).filter(col("tvd_ppm") > tPpm).count()
      require(residual == 0L,
        s"tClosenessApply: $residual class(es) still above $tPpm ppm after " +
          s"$rounds suppression rounds — raise `rounds` (cascade unconverged)")
    }
    val kept = cu.select(col("event_type"), col("day"), col("vb")).distinct()
    events
      .withColumn("day", to_date(col("ts")))
      .withColumn("vb", floor(col("value") / lit(ValueBucket)).cast("long"))
      .join(kept, Seq("event_type", "day", "vb"), "left_semi")
      .drop("day", "vb")
  }
}

package graft.ops

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

  /** Per-event_type k-anonymity audit: equivalence-class count, total
    * rows, rows at risk (class < k), the smallest class, and the risk
    * share as an exact integer-ppm quotient.
    */
  def kAnonymityReport(events: DataFrame, k: Long = KAnon): DataFrame =
    classSizes(quasi(events))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("cls_n")).as("n_rows"),
        sum(when(col("cls_n") < k, col("cls_n")).otherwise(lit(0L))).as("rows_at_risk"),
        min(col("cls_n")).as("min_class"))
      .select(col("event_type"), col("n_classes"), col("n_rows"),
        col("rows_at_risk"), col("min_class"),
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
}

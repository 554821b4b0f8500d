package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-profiling audit — the first query anyone runs against an unknown
  * table: per column, null count, exact distinct count, and min/max. The
  * output is one ROW per column (an audit table to diff between snapshots),
  * not one wide row.
  *
  * Scale: all columns profile in ONE scan — the multi-distinct aggregate
  * plans as a single Expand (+|cols|× row multiplication) into one hash
  * agg, which is how a profiler pays for exactness; swap `countDistinct`
  * for `approx_count_distinct` when the audit tolerates HLL error and the
  * Expand multiplier hurts (the sketch variants live in `Sketches`).
  * min/max compare in the COLUMN's type and cast to string only for the
  * uniform report schema.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_s"),
        col(s"${c}__max").as("max_s"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Key-skew diagnostic per `groupCol` over `keyCol`: key count, max and
    * mean per-key row counts, top-key share in integer ppm, and the
    * max/mean skew ratio — the panel read before picking a salting factor
    * for a hot key. Two keyed hash aggs; the ratio columns derive from
    * the emitted integers (no avg() aggregator crosses the engine
    * boundary).
    */
  /** Columns the storage advisor profiles and the day-run thresholds
    * (integer ppm) deciding its encoding advice.
    */
  val StorageCols: Seq[String] = Seq("event_type", "user_id", "value", "props")
  val RlePpmMax = 200000L
  val DictPpmMax = 10000L

  /** Storage-encoding advisor — the layout decision a 100 TB table pays
    * for on every scan: per column, exact distinct count, and the number
    * of RUNS (adjacent-value change points within each day partition, in
    * event_id order — the write order). Low runs/rows ⇒ run-length
    * encoding wins; low distinct/rows ⇒ dictionary encoding wins;
    * otherwise plain. Both quotients are exact integer ppm, and the
    * advice is a CASE over them, so the oracle replays the whole report.
    *
    * Counts are invariant to value REPRESENTATION (any injective cast
    * preserves distinct counts and run boundaries), so both engines
    * profile through a string cast without a cross-engine format
    * contract. Scale: one unpivoted scan (|cols| × rows, narrow), windows
    * partitioned by (col, day) — write-partition-sized, never global —
    * then a |cols|-row rollup.
    */
  def storageProfile(events: DataFrame, cols: Seq[String] = StorageCols): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val long = cols.map { c =>
      events.select(lit(c).as("col"), to_date(col("ts")).as("day"),
        col("event_id"), col(c).cast("string").as("v"))
    }.reduce(_.unionByName(_))
    val w = Window.partitionBy(col("col"), col("day")).orderBy(col("event_id"))
    val runs = long
      .withColumn("chg",
        when(lag(col("v"), 1).over(w) <=> col("v"), 0L).otherwise(1L))
      .groupBy(col("col"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("v")).as("n_distinct"),
        sum(col("chg")).as("n_runs"))
    runs.select(col("col"), col("n_rows"), col("n_distinct"), col("n_runs"),
      expr("CAST((n_distinct * 1000000) div n_rows AS BIGINT)").as("distinct_ppm"),
      expr("CAST((n_runs * 1000000) div n_rows AS BIGINT)").as("runs_ppm"),
      expr(s"""CASE WHEN (n_runs * 1000000) div n_rows <= $RlePpmMax THEN 'rle'
              WHEN (n_distinct * 1000000) div n_rows <= $DictPpmMax THEN 'dict'
              ELSE 'plain' END""").as("advice"))
  }

  def keySkew(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val per = df.groupBy(col(groupCol), col(keyCol)).agg(count(lit(1)).as("c"))
    per.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
        max(col("c")).as("max_per_key"))
      .select(col(groupCol), col("n_keys"), col("n_rows"), col("max_per_key"),
        floor(col("max_per_key") * lit(1000000L) / col("n_rows"))
          .cast("bigint").as("top_share_ppm"),
        round(col("n_rows").cast("double") / col("n_keys"), 6).as("avg_per_key"),
        round(col("max_per_key") * col("n_keys")
          / col("n_rows").cast("double"), 6).as("skew_ratio"))
  }

  /** Data-contract rules over the events stream: (rule name, VIOLATION
    * predicate). The predicates are ANSI SQL strings that parse
    * identically in Spark (`expr`) and DuckDB — one source of truth for
    * the operator and its oracle, so a contract can never drift between
    * the enforcement path and the audit path.
    */
  val ContractRules: Seq[(String, String)] = Seq(
    "user_id_not_null" -> "user_id IS NULL",
    "user_id_positive" -> "user_id <= 0",
    "value_in_range" -> "value < 0 OR value > 400",
    "event_type_enum" ->
      "event_type NOT IN ('click', 'view', 'purchase', 'error', 'signup')",
    "ts_in_window" ->
      "ts < TIMESTAMP '2024-01-01' OR ts >= TIMESTAMP '2027-01-01'")

  /** Contract-validation report — the data-quality gate a pipeline runs
    * before promoting a batch: every rule's violation count from ONE scan
    * (all CASE-sums fold into a single hash aggregate; no per-rule pass),
    * with the rate as an exact integer ppm quotient. A NULL predicate
    * result counts as non-violating (the not-null rule itself is explicit).
    */
  def contractReport(
      df: DataFrame,
      rules: Seq[(String, String)] = ContractRules): DataFrame = {
    val aggs = rules.map { case (n, p) =>
      sum(when(expr(p), 1L).otherwise(0L)).as(s"v__$n")
    } :+ count(lit(1)).as("n_checked")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.map { case (n, _) =>
      struct(lit(n).as("rule"), col(s"v__$n").as("n_violations"))
    }
    one.select(explode(array(rows: _*)).as("r"), col("n_checked"))
      .select(col("r.rule").as("rule"), col("r.n_violations").as("n_violations"),
        col("n_checked"),
        expr("1000000 * r.n_violations div n_checked").as("violation_ppm"))
  }
}

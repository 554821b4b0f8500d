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
}

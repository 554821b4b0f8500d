package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as built-ins, composed from core primitives.
  */
object Joins {

  /** As-of join: for every left row, attach the LATEST right row with
    * `rightTs <= leftTs` for the same key (inner semantics — left rows with
    * no qualifying right row are dropped). Ties on rightTs break by the
    * greatest `rightTieBreak`, making the result deterministic.
    *
    * Algorithm: the distributed union-sort formulation, NOT a range join —
    * tag both inputs, hash-partition by key, sort each partition by
    * (ts, side, tie), and carry the last non-null right payload forward with
    * a running `last(..., ignoreNulls)` window. One shuffle + one sort,
    * O(n log n) total, no per-row right-side fan-out — a range join would
    * produce |left| × avg-qualifying-rights intermediate rows (quadratic in
    * the worst case), which at 100 TB is the difference between a working
    * job and an OOM. Right rows sort before left rows at equal timestamps,
    * giving the inclusive `<=` bound.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String],
      rightTieBreak: String): DataFrame = {
    val rTagged = right.select(
      col(rightKey).as("__k"), col(rightTs).as("__t"), lit(0).as("__side"),
      col(rightTieBreak).cast("long").as("__tb"),
      struct(rightVals.map(col): _*).as("__rv"))
    val lTagged = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__t"), lit(1).as("__side"),
      lit(null).cast("long").as("__tb"),
      lit(null).cast(rTagged.schema("__rv").dataType).as("__rv"),
      struct(left.columns.map(col): _*).as("__lrow"))
    val rFull = rTagged.withColumn("__lrow", lit(null).cast(lTagged.schema("__lrow").dataType))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rFull.unionByName(lTagged)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__m").isNotNull)
      .select(col("__lrow.*"), col("__m.*"))
  }
}

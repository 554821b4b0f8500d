package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as built-ins, composed from core primitives.
  */
object Joins {

  /** Skew-salted inner equi-join: the left (skewed, large) side spreads each
    * hot key over `factor` salt buckets by hashing stable row identity; the
    * right side is replicated `factor`× so every (key, salt) bucket finds
    * its match. Result rows are identical to a plain inner join — only the
    * partitioning changes: a key holding p% of the left input occupies
    * p/factor % per task instead of one straggler task.
    *
    * AQE's skew-join handles sort-merge skew automatically; this helper is
    * for the cases AQE can't split (e.g. aggregation-after-join pipelines
    * keyed on the hot key, or bucketed inputs where AQE is bypassed).
    * `leftSaltSource` must be a deterministic column (a row id), keeping the
    * join reproducible run-to-run.
    */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftSaltSource: String,
      factor: Int = 8): DataFrame = {
    val salted = left.withColumn("__salt", pmod(xxhash64(col(leftSaltSource)), lit(factor)))
    val replicated = right.withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated,
        salted(leftKey) === replicated(rightKey) &&
          salted("__salt") === replicated("__salt").cast("long"))
      .drop("__salt")
  }

  /** Time-binned range join: match left point rows (`leftTsMs`) to right
    * interval rows [`startMs`, `endMs`] sharing `key` — as an EQUI-join.
    * Every interval explodes into the time bins it covers (≤ span/bin + 1
    * rows; pick binMillis ≈ the typical span so the fan-out is ~2×), every
    * point maps to its single bin, and the bin+key equi-join plus the exact
    * range predicate reproduce the interval-join result. This is the same
    * move the LSH band table and the SimHash byte bands make — turn a
    * non-equi predicate into a bucketed equi-join so cost is O(collisions):
    * Spark plans a raw `BETWEEN` join as a nested-loop (every left row
    * scans every right row — the quadratic disaster PlanAudit flags), while
    * this shape is a plain shuffled/broadcast hash join at any scale.
    * Inclusive on both interval endpoints.
    */
  def binnedRangeJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTsMs: String,
      startMs: String,
      endMs: String,
      binMillis: Long): DataFrame = {
    val lb = left.withColumn("__bin", floor(col(leftTsMs) / binMillis).cast("bigint"))
    val rb = right.withColumn("__bin", explode(sequence(
      floor(col(startMs) / binMillis).cast("bigint"),
      floor(col(endMs) / binMillis).cast("bigint"))))
    lb.as("l").join(rb.as("r"),
        col("l.__bin") === col("r.__bin") &&
          col(s"l.$leftKey") === col(s"r.$rightKey") &&
          col(s"l.$leftTsMs") >= col(s"r.$startMs") &&
          col(s"l.$leftTsMs") <= col(s"r.$endMs"))
      .drop("__bin")
  }

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

  /** As-of join on the native merge operator (graft.plans.AsofJoinExec) —
    * same semantics and argument shape as [[asofJoin]], but executed as a
    * single forward merge per co-partition instead of the union-sort
    * composition: each side is shuffled/sorted independently (the smaller
    * right side no longer rides along in the left's sort) and per-partition
    * state is one candidate row. Registers graft's planner strategy and
    * pushdown rule on the session idempotently.
    */
  def asofJoinMerge(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String],
      rightTieBreak: String,
      outer: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graftbridge.{analyzedPlan, exprColumn, ofRows}
    val spark = left.sparkSession
    graft.plans.GraftExtensions.install(spark)
    // pre-project the right side so column pruning happens below the
    // custom node (Catalyst cannot prune through a node it doesn't know)
    val rightSlim = right.select(
      (Seq(rightKey, rightTs, rightTieBreak) ++ rightVals).distinct.map(col): _*)
    val lPlan = analyzedPlan(left)
    val rPlan = analyzedPlan(rightSlim)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column '$name' in ${p.output.map(_.name)}"))
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lt, rt) = (attr(lPlan, leftTs), attr(rPlan, rightTs))
    // The merge exec compares RAW internal values with orderings built from
    // the LEFT side's types (AsofJoinExec keyOrd/tsOrd); a plausible-looking
    // mismatch — DateType days-int vs TimestampType micros-long, int vs
    // bigint keys — would silently return wrong matches, so reject it here
    // (callers cast explicitly, keeping the cast visible in THEIR plan).
    require(lk.dataType == rk.dataType,
      s"as-of join key types differ: $leftKey is ${lk.dataType}, $rightKey is ${rk.dataType}; cast one side explicitly")
    require(lt.dataType == rt.dataType,
      s"as-of join timestamp types differ: $leftTs is ${lt.dataType}, $rightTs is ${rt.dataType}; cast one side explicitly")
    val node = graft.plans.AsofJoinPlan(
      leftKeys = Seq(lk),
      rightKeys = Seq(rk),
      leftTs = lt,
      rightTs = rt,
      rightTieBreak = attr(rPlan, rightTieBreak),
      outer = outer,
      left = lPlan,
      right = rPlan)
    val keep = lPlan.output ++ rightVals.map(attr(rPlan, _))
    ofRows(spark, node).select(keep.map(exprColumn): _*)
  }
}

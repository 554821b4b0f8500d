package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst extension: a native merge AS-OF JOIN — the
  * custom-operator tier (c) from the build plan: LogicalPlan + optimizer
  * Rule + SparkStrategy + SparkPlan, registered through
  * SparkSessionExtensions (see [[graft.plans.GraftExtensions]]).
  *
  * Semantics (same as the composed `graft.ops.Joins.asofJoin`,
  * backward-looking): for every left row, the single right row with equal
  * key and the greatest `rightTs <= leftTs`, ties on rightTs broken by the
  * greatest `rightTieBreak`; left rows with no qualifying right row drop
  * (inner, default) or survive with a null right side (`outer = true`,
  * the kdb/QuestDB convention).
  *
  * Physical algorithm: both sides hash-partitioned on key and sorted within
  * partitions — Catalyst inserts the exchanges/sorts from
  * `requiredChildDistribution`/`requiredChildOrdering`, reusing existing
  * partitioning when available — then ONE forward merge pass per partition.
  * vs the alternatives at 100 TB:
  *  - a range join fans out |left| × avg-qualifying-rights intermediate
  *    rows before its row_number dedup (quadratic on dense keys);
  *  - the union-sort composition (Joins.asofJoin) sorts |left|+|right|
  *    combined and carries a running-last window over the union;
  *  - this operator sorts each side separately (right side is usually far
  *    smaller), streams both, keeps ONE candidate row of state, and
  *    allocates nothing per non-matching row.
  */
case class AsofJoinPlan(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Expression,
    outer: Boolean,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: push deterministic left-side-only Filter conjuncts below
  * the as-of join. Catalyst's own PushPredicateThroughJoin only knows Join
  * nodes; without this rule a `.filter` over the joined frame scans and
  * sorts the full left input. Sound because every output row derives from
  * exactly one left row and the right match depends only on that row's
  * (key, ts) — removing left rows never changes other rows' matches.
  */
object AsofJoinPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsofJoinPlan) =>
      val (pushable, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(a.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(pushable.reduce(And), a.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Optimizer rule: prune unused columns THROUGH the as-of join. Catalyst's
  * ColumnPruning only narrows nodes it knows, so without this a
  * `select(few)` over the joined frame still scans and sorts every column
  * of both inputs. Columns required = whatever the parent references plus
  * the join's own keys/timestamps/tie-break; anything else is cut with a
  * Project under the node, which then folds into the file scan's
  * ReadSchema. Fires only when it strictly narrows a side (fixed point).
  */
object AsofJoinPruning extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, a: AsofJoinPlan) =>
      val required = AttributeSet(p.references.toSeq) ++
        AttributeSet((a.leftKeys ++ a.rightKeys ++
          Seq(a.leftTs, a.rightTs, a.rightTieBreak)).flatMap(_.references))
      def prune(side: LogicalPlan): LogicalPlan = {
        val keep = side.output.filter(required.contains)
        if (keep.length < side.output.length) Project(keep, side) else side
      }
      val (nl, nr) = (prune(a.left), prune(a.right))
      if (nl.eq(a.left) && nr.eq(a.right)) p
      else p.copy(child = a.copy(left = nl, right = nr))
  }
}

/** Planner strategy mapping the logical node to the merge exec. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(lk, rk, lts, rts, tb, outer, l, r) =>
      AsofJoinExec(lk, rk, lts, rts, tb, outer, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Expression,
    outer: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)

  // co-partition both sides on the join key (EnsureRequirements adds the
  // exchanges, or reuses compatible existing partitioning/bucketing)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // within-partition sort: (key, ts) on the left; (key, ts, tieBreak) on
  // the right — the merge's last-consumed candidate is then automatically
  // the max-(ts, tieBreak) qualifying row
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTs, Ascending), SortOrder(rightTieBreak, Ascending)))

  // the merge emits left rows in their incoming order — downstream sorts
  // on the same prefix are elided
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head
  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val lOutput = left.output
    val rOutput = right.output
    val outAttrs = output
    val isOuter = outer

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOutput)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOutput)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOutput)
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val tsOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(Seq(lTsExpr.dataType))
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight: InternalRow =
        new GenericInternalRow(rOutput.size) // all-null, for outer misses

      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      // the one piece of merge state: latest consumed qualifying right row
      var candRow: InternalRow = null
      var candKey: UnsafeRow = null

      lIter.flatMap { lRow =>
        val lKey = lKeyProj(lRow)
        if (lKey.anyNull) { // null keys never equi-match
          if (isOuter) Some(resultProj(joined(lRow, nullRight))) else None
        } else {
          val lTsRow = lTsProj(lRow)
          var scanning = true
          while (scanning && rRow != null) {
            val rKey = rKeyProj(rRow)
            if (rKey.anyNull) { // unmatchable; skip
              rRow = if (rIter.hasNext) rIter.next() else null
            } else {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0 || (c == 0 && tsOrd.compare(rTsProj(rRow), lTsRow) <= 0)) {
                // consumed rows arrive in (ts, tieBreak) order, so the last
                // one kept is the match; copies: sort iterators reuse rows
                candRow = rRow.copy()
                candKey = rKey.copy()
                rRow = if (rIter.hasNext) rIter.next() else null
              } else scanning = false
            }
          }
          if (candRow != null && keyOrd.compare(candKey, lKey) == 0)
            Some(resultProj(joined(lRow, candRow)))
          else if (isOuter) Some(resultProj(joined(lRow, nullRight)))
          else None
        }
      }
    }
  }
}

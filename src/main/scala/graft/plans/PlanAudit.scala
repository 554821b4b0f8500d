package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.SortAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan scale audit — the SURVEY §8.3 invariant as executable code
  * instead of documentation. Flags the plan shapes that are fine on 60k test
  * rows and catastrophic at 100 TB:
  *
  *  - `cartesian`        CartesianProductExec — O(n·m) partitions;
  *  - `nested-loop-join` BroadcastNestedLoopJoinExec — every probe row scans
  *                       the whole broadcast side (legitimate only for
  *                       labeled all-pairs baselines and one-row bounds);
  *  - `global-window`    WindowExec with an empty partitionSpec — an
  *                       Exchange to a SINGLE partition sorting the full
  *                       input (the round-2 k-means-init defect class);
  *  - `sort-aggregate`   SortAggregateExec — hash aggregation fell back to
  *                       sort-based, usually an unorderable/unhashable
  *                       grouping type sneaking in;
  *  - `codegen-fallback` an expression evaluated via CodegenFallback,
  *                       flagged in EVERY operator that carries it
  *                       (deliberately broader than the codegen-eligible
  *                       hot path: an interpreted expression inside an
  *                       already-interpreted operator still costs per-row
  *                       virtual dispatch, and the allowlist — not the
  *                       detector — is where intrinsically-interpreted
  *                       built-ins like from_json are excused).
  *
  * PlanAuditSpec runs this over every SparkEntry query with a per-query
  * allowlist; anything new that shuffles-to-one or goes quadratic fails CI
  * instead of surfacing as a 100× bench regression later.
  */
object PlanAudit {

  final case class Violation(kind: String, node: String) {
    override def toString: String = s"$kind: $node"
  }

  /** Audit the physical tree of `df` (nothing is executed). The plan is
    * re-derived with AQE disabled: an AdaptiveSparkPlanExec wrapper has no
    * children (its inner plan is private state), so auditing the adaptive
    * plan would silently see nothing — the deterministic pre-runtime shape
    * is also the right thing to assert against.
    *
    * The AQE toggle briefly mutates the shared session conf (set, plan,
    * restore); an originally-unset key is UNSET again rather than pinned to
    * its default, so the audit leaves no conf residue. Concurrent planning
    * on the same session during that window would see AQE off — CI runs
    * audits sequentially, so this is a documented single-threaded contract,
    * not a lock.
    */
  def audit(df: DataFrame): Seq[Violation] = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try spark.sessionState.executePlan(df.queryExecution.logical).executedPlan
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
        case None => spark.conf.unset("spark.sql.adaptive.enabled")
      }
    val nodes: Seq[SparkPlan] = plan.collect { case p => p }
    val structural = nodes.flatMap {
      case p: CartesianProductExec =>
        Some(Violation("cartesian", p.nodeName))
      case p: BroadcastNestedLoopJoinExec =>
        Some(Violation("nested-loop-join", p.nodeName))
      case p: WindowExec if p.partitionSpec.isEmpty =>
        Some(Violation("global-window", p.nodeName))
      case p: SortAggregateExec =>
        Some(Violation("sort-aggregate", p.nodeName))
      case _ => None
    }
    val fallbacks = nodes.flatMap { p =>
      p.expressions.flatMap(_.collect {
        case e: CodegenFallback => Violation("codegen-fallback", e.prettyName)
      })
    }.distinct
    structural ++ fallbacks
  }
}

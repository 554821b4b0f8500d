package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session-extension registration for graft's custom operators.
  *
  * Builder path (new sessions):
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   // or spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  * Runtime path (sessions graft didn't build, e.g. a host-provided one):
  * `GraftExtensions.install(spark)` — idempotent, registers the same
  * strategy/rule through `spark.experimental`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
    ext.injectOptimizerRule(_ => AsofJoinPushdown)
    ext.injectOptimizerRule(_ => AsofJoinPruning)
    ext.injectFunction(GraftExtensions.arrayDotFunction)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import graft.functions.ArrayDotProduct

  /** SQL registration of the codegen'd dot product:
    * `SELECT array_dot(a, b)`. Inputs must be array<double> (the Column
    * API's cast is the caller's job in SQL).
    */
  val arrayDotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("array_dot"),
    new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "array_dot expects exactly 2 arguments")
      ArrayDotProduct(children.head, children(1))
    })

  def install(spark: SparkSession): Unit =
    org.apache.spark.sql.graftbridge.installPlanner(
      spark, AsofJoinStrategy, Seq(AsofJoinPushdown, AsofJoinPruning), arrayDotFunction)
}

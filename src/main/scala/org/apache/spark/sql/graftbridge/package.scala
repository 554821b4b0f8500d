package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's private[sql] surface, so graft can expose
  * custom Catalyst expressions and logical plans through the public
  * Column/DataFrame API. This is the standard extension-package pattern;
  * nothing else from the private surface is touched:
  *  - Column ↔ Expression converters (classic.ExpressionUtils)
  *  - DataFrame from a custom LogicalPlan (classic.Dataset.ofRows)
  *  - the analyzed plan of a DataFrame (for building plan nodes over it)
  *  - runtime strategy/rule registration on an existing session
  *    (`spark.experimental` — for sessions graft didn't build; sessions
  *    built by graft use `SparkSessionExtensions` via GraftExtensions)
  */
package object graftbridge {
  def exprColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def columnExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  def installPlanner(
      spark: SparkSession,
      strategy: execution.SparkStrategy,
      rules: Seq[catalyst.rules.Rule[LogicalPlan]],
      function: (catalyst.FunctionIdentifier,
        catalyst.expressions.ExpressionInfo,
        Seq[Expression] => Expression)): Unit = {
    val session = spark.asInstanceOf[classic.SparkSession]
    val exp = session.experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
    rules.foreach { rule =>
      if (!exp.extraOptimizations.contains(rule))
        exp.extraOptimizations = exp.extraOptimizations :+ rule
    }
    session.sessionState.functionRegistry
      .registerFunction(function._1, function._2, function._3)
  }
}

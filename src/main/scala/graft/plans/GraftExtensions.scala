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
  }
}

object GraftExtensions {
  def install(spark: SparkSession): Unit =
    org.apache.spark.sql.graftbridge.installPlanner(spark, AsofJoinStrategy, AsofJoinPushdown)
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

/** Runtime skew mitigation: prove AQE's OptimizeSkewedJoin actually splits
  * a hot partition on this build (the second leg of the skew story next to
  * the manual salted join in JoinsSpec — salting for when you KNOW the hot
  * keys, AQE for when you don't).
  */
class SkewJoinSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  describe("AQE skew-join") {
    it("splits a hot key's partition at runtime (skew=true in the final plan)") {
      import spark.implicits._
      val confs = Seq(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        // shrink the size thresholds so a local fixture qualifies as skewed
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        // fact: one hot key (0) carrying 50k rows, 99 cold keys with 10 each
        val fact = spark.range(50000).select(lit(0L).as("k"), col("id").as("v"))
          .union(spark.range(990).select((col("id") % 99 + 1).as("k"), col("id").as("v")))
        val dim = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("w"))
        val joined = fact.join(dim, "k")
        // execute THIS dataset (count() would plan a different wrapped
        // query) so its adaptive plan reaches its final form
        joined.collect().length shouldBe 50990
        // the skewed SMJ leg is marked in the final plan — the runtime
        // re-plan a static optimizer can't do
        val finalPlan = joined.queryExecution.executedPlan.toString
        finalPlan should include("skew=true")
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}

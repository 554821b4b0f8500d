package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Runtime bloom-filter join pruning (Catalyst's InjectRuntimeFilter):
  * a selective filter on the DIMENSION side of a shuffle join injects a
  * bloom-filter semi-join reduction on the FACT side, so fact rows that
  * cannot match are dropped at (or right after) the scan instead of
  * riding the full shuffle. At 100 TB this is the difference between
  * shuffling the whole fact table and shuffling the matching fraction —
  * the optimizer does it FROM THE DECLARATIVE PLAN, which is exactly why
  * the operators here stay DataFrame-first. The thresholds below are
  * lowered only because the test corpus is small; production leaves the
  * size gates at their defaults.
  */
class RuntimeFilterSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private val sfDir = "/root/testdata/sf0.01"

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  it("a selective dim filter injects a bloom filter on the fact scan side") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // the size gates exist to protect small queries from filter-build
      // overhead; the test corpus is far below the 10 GiB default, so
      // open them to observe the mechanism itself
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force the shuffle join the reduction exists for (a broadcast hash
      // join already prunes at the probe and gets no bloom filter)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val orders = Tables.orders(spark, sfDir)
      val cust = Tables.customer(spark, sfDir)
        .filter(col("c_mktsegment") === "BUILDING")
      val q = orders.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      plan.toLowerCase should include("bloomfilter") // might_contain on the fact side
      // and the pruned join still computes the exact result
      val n = q.collect()
      n.length shouldBe 1
      n.head.getLong(1) should be > 0L
    }
  }

  it("without the dim filter no runtime filter is injected") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val orders = Tables.orders(spark, sfDir)
      val cust = Tables.customer(spark, sfDir) // no selective predicate
      val plan = orders.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.toString
      plan.toLowerCase should not include "bloomfilter"
    }
  }
}

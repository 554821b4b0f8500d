package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: prove Spark's InjectRuntimeFilter
  * actually plants a creation-side bloom filter into the application-side
  * scan on this build — the third leg of the join-scale story (salting for
  * KNOWN hot keys, AQE skew-join for unknown ones, runtime filters so a
  * selective dim predicate prunes the fact scan before the shuffle). At
  * 100 TB this is the difference between shuffling the whole fact table
  * and shuffling only the rows that can possibly join.
  */
class RuntimeFilterSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  describe("runtime bloom-filter join") {
    it("injects a bloom filter from the filtered dim side into the fact scan") {
      val confs = Seq(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
        // shrink every size gate so a local fixture qualifies
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        // fact scans wide; dim carries a SELECTIVE predicate — the exact
        // shape the optimizer targets (filter one side, prune the other)
        val dir = java.nio.file.Files.createTempDirectory("graft-rtf").toString
        spark.range(100000)
          .select((col("id") % 1000).as("k"), col("id").as("v"))
          .write.parquet(s"$dir/fact")
        spark.range(1000)
          .select(col("id").as("k"), (col("id") % 7).as("cat"))
          .write.parquet(s"$dir/dim")
        val fact = spark.read.parquet(s"$dir/fact")
        val dim = spark.read.parquet(s"$dir/dim").filter(col("cat") === 3)
        val joined = fact.join(dim, "k")
        val expected = 100L * 143 // 143 dim keys survive cat=3, 100 fact rows each
        joined.count() shouldBe expected
        // the application side carries a might_contain probe over a bloom
        // aggregate built from the filtered creation side
        val optimized = joined.queryExecution.optimizedPlan.toString
        optimized.toLowerCase should include("bloomfilter")
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}

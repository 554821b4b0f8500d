package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ops.Entity

/** Blocked fuzzy entity resolution: planted-typo recall and the blocking's
  * candidate-pruning ratio (the scale argument — verification work follows
  * block selectivity, not n²).
  */
class EntitySpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private val sfDir = "/root/testdata/sf0.001"

  it("recovers every planted dirty twin (distance exactly 1, recall 1.0)") {
    val cust = Tables.customer(spark, sfDir)
    val planted = Entity.withPlantedDirty(cust)
    val pairs = Entity.resolvePairs(planted).collect()
    val expected = cust.filter(col("c_custkey") % Entity.PlantEvery === 0)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val found = pairs.filter(r => r.getLong(1) == r.getLong(0) + 1000000L)
      .map(_.getLong(0)).toSet
    found shouldBe expected
    pairs.filter(r => found(r.getLong(0))).foreach(_.getInt(2) shouldBe 1)
  }

  it("the block join prunes candidates far below the name cross-product") {
    val planted = Entity.withPlantedDirty(Tables.customer(spark, sfDir))
    val n = planted.count()
    val r = planted.select(col("c_nationkey").as("nk"),
      col("c_acctbal").cast("decimal(18,2)").as("bal"), col("c_custkey").as("id"))
    val candidates = r.as("a").join(r.as("b"), Seq("nk", "bal"))
      .filter(col("a.id") < col("b.id")).count()
    val allPairs = n * (n - 1) / 2
    assert(candidates.toDouble / allPairs < 0.01,
      s"blocking kept $candidates of $allPairs pairs")
  }

  it("corruption preserves length and the block attributes") {
    val cust = Tables.customer(spark, sfDir)
    val twins = Entity.withPlantedDirty(cust).filter(col("c_custkey") >= 1000000L)
      .select((col("c_custkey") - 1000000L).as("c_custkey"),
        col("c_name").as("dirty"), col("c_acctbal").as("bal2"))
    val joined = cust.join(twins, Seq("c_custkey"))
    joined.filter(
      org.apache.spark.sql.functions.length(col("dirty")) =!=
        org.apache.spark.sql.functions.length(col("c_name"))).count() shouldBe 0L
    joined.filter(col("bal2") =!= col("c_acctbal")).count() shouldBe 0L
    joined.filter(col("dirty") === col("c_name")).count() shouldBe 0L
  }
}

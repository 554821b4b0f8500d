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

  it("golden records fold each twin into its base entity with keeper-name + max-balance survivorship") {
    val cust = Tables.customer(spark, sfDir)
    val planted = Entity.withPlantedDirty(cust)
    val golden = Entity.goldenRecords(planted)
    val byEntity = golden.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getDouble(3)))).toMap
    // every record lands in exactly one entity
    byEntity.values.map(_._1).sum shouldBe planted.count()
    // twins vanish as entity ids (min-key rep = the base)
    byEntity.keys.count(_ >= 1000000L) shouldBe 0
    // a planted base is a 2-member entity carrying ITS name (the keeper's,
    // not the corrupted twin's) and the shared balance
    val base = cust.filter(col("c_custkey") % Entity.PlantEvery === 0)
      .select("c_custkey", "c_name", "c_acctbal").collect()
    base.foreach { r =>
      val (n, name, bal) = byEntity(r.getLong(0))
      n should be >= 2L
      name shouldBe r.getString(1)
      bal shouldBe (math.round(r.getDouble(2) * 100) / 100.0) +- 1e-9
    }
  }

  it("golden records fold a typo CHAIN transitively even when the endpoints exceed the match bound") {
    import spark.implicits._
    // A~B at dist 1, B~C at dist 2, but dist(A,C)=3 > MaxEditDist:
    // pairwise matching alone never links A-C; the CC stage must. All
    // four rows share one block (same nation + balance — the block key
    // here IS the balance); the far name must still stay separate.
    val blockRows = Seq(
      (1L, "Customer#0000vwxyz", 7, 10.0, "SEG"),
      (2L, "Customer#0000vwxyQ", 7, 10.0, "SEG"),
      (3L, "Customer#0000RSxyQ", 7, 10.0, "SEG"),
      (9L, "Customer#unrelated", 7, 10.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val golden = Entity.goldenRecords(blockRows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    golden.keySet shouldBe Set(1L, 9L)
    golden(1L)._1 shouldBe 3L // A, B, C folded transitively
    golden(1L)._2 shouldBe "Customer#0000vwxyz" // keeper = min key
    golden(9L)._1 shouldBe 1L // the far name stays its own entity
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

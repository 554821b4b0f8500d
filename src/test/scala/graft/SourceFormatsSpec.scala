package graft

import java.nio.file.Files

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Tables

/** Source-format coverage beyond parquet: CSV (explicit schema + corrupt
  * -record quarantine), ORC (round trip + filter/column pushdown), and
  * JSON lines (round trip under an explicit schema). The contract at scale
  * is always the same: schemas are DECLARED (inferSchema is a full extra
  * pass over 100 TB), malformed rows are quarantined not dropped, and
  * scans must accept pushed filters/pruned columns.
  */
class SourceFormatsSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private val sfDir = "/root/testdata/sf0.001"

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  describe("CSV source") {
    it("reads an explicit schema and quarantines malformed rows instead of dropping them") {
      val dir = tmp("graft-csv")
      val csv =
        """1,42,click,1.5
          |2,43,view,2.25
          |oops,not,numeric,x
          |4,44,purchase,0.75""".stripMargin
      Files.write(java.nio.file.Paths.get(dir, "part.csv"), csv.getBytes)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType),
        StructField("_corrupt", StringType)))
      val df = spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(dir)
        .cache() // corrupt-record column requires a materialized referenced row set
      df.count() shouldBe 4L
      val bad = df.filter(col("_corrupt").isNotNull)
      bad.count() shouldBe 1L
      bad.collect()(0).getAs[String]("_corrupt") should startWith("oops")
      df.filter(col("_corrupt").isNull).agg(sum(col("value"))).collect()(0).getDouble(0) shouldBe 4.5
      df.unpersist()
    }

    it("round-trips a written CSV under the declared schema") {
      val dir = tmp("graft-csv-rt")
      val src = Tables.events(spark, sfDir)
        .select("event_id", "user_id", "event_type")
      src.write.mode("overwrite").option("header", "true").csv(dir)
      val back = spark.read
        .schema(StructType(Seq(
          StructField("event_id", LongType), StructField("user_id", LongType),
          StructField("event_type", StringType))))
        .option("header", "true").csv(dir)
      back.count() shouldBe src.count()
      back.except(src).count() shouldBe 0L
      src.except(back).count() shouldBe 0L
    }
  }

  describe("ORC source") {
    it("round-trips events (timestamps included) and accepts pushdown") {
      val dir = tmp("graft-orc")
      val src = Tables.events(spark, sfDir)
        .select("event_id", "ts", "user_id", "event_type", "value")
      src.write.mode("overwrite").orc(dir)
      val back = spark.read.orc(dir)
      back.count() shouldBe src.count()
      back.except(src).count() shouldBe 0L
      src.except(back).count() shouldBe 0L
      val plan = back.filter(col("user_id") === 7L).select("event_id")
        .queryExecution.executedPlan.toString
      plan should include("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]")
      plan should include("ReadSchema: struct<event_id:bigint,user_id:bigint>")
    }
  }

  describe("JSON lines source") {
    it("round-trips under an explicit schema (no inference pass)") {
      val dir = tmp("graft-json")
      val src = Tables.events(spark, sfDir)
        .select("event_id", "user_id", "event_type", "value")
      src.write.mode("overwrite").json(dir)
      val back = spark.read
        .schema(StructType(Seq(
          StructField("event_id", LongType), StructField("user_id", LongType),
          StructField("event_type", StringType), StructField("value", DoubleType))))
        .json(dir)
      back.count() shouldBe src.count()
      back.except(src).count() shouldBe 0L
      src.except(back).count() shouldBe 0L
    }
  }
}

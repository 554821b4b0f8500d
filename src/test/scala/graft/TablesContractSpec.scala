package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.types._

import graft.model.Tables

/** Schema contract for the external testdata: every column/type the
  * operators assume, asserted in one second. Round 4 lost 53 queries and 7
  * specs to a silent regeneration of events.ts (TIMESTAMP(NANOS) →
  * timestamp[us]); this spec turns the next drift into ONE named failure
  * instead of dozens of cryptic analysis errors.
  */
class TablesContractSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  // ALL generated sf dirs, not just one: the round-4 drift regenerated every
  // dir at once, but a PARTIAL regeneration would leave the dirs disagreeing
  // — pin each so the drifted dir is named in the failure.
  private val sfDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private def assertCols(table: String, got: StructType, want: (String, DataType)*): Unit = {
    val byName = got.fields.map(f => f.name -> f.dataType).toMap
    want.foreach { case (name, dt) =>
      withClue(s"$table.$name: ") {
        byName.get(name) shouldBe Some(dt)
      }
    }
  }

  describe("testdata schema contract") {
    sfDirs.foreach { sfDir =>
      val sf = sfDir.split('/').last

      it(s"[$sf] events (through Tables.events) normalizes ts to TimestampType") {
        val ev = Tables.events(spark, sfDir)
        assertCols("events", ev.schema,
          "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
          "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
      }

      it(s"[$sf] lineitem / orders carry the date and measure columns the queries filter on") {
        val li = Tables.lineitem(spark, sfDir).schema
        assertCols("lineitem", li,
          "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
          "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
          "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
          "l_tax" -> DoubleType, "l_returnflag" -> StringType,
          "l_linestatus" -> StringType)
        withClue("lineitem.l_shipdate: ") {
          Set[DataType](DateType, TimestampType, TimestampNTZType) should
            contain(li("l_shipdate").dataType)
        }
        val o = Tables.orders(spark, sfDir).schema
        assertCols("orders", o,
          "o_orderkey" -> LongType, "o_custkey" -> LongType,
          "o_totalprice" -> DoubleType, "o_orderpriority" -> StringType)
        withClue("orders.o_orderdate: ") {
          Set[DataType](DateType, TimestampType, TimestampNTZType) should
            contain(o("o_orderdate").dataType)
        }
      }

      it(s"[$sf] dimension tables keep their join keys") {
        assertCols("customer", Tables.customer(spark, sfDir).schema,
          "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
          "c_mktsegment" -> StringType, "c_acctbal" -> DoubleType)
        assertCols("supplier", Tables.supplier(spark, sfDir).schema,
          "s_suppkey" -> LongType, "s_name" -> StringType,
          "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
        assertCols("part", Tables.part(spark, sfDir).schema,
          "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
          "p_type" -> StringType, "p_size" -> IntegerType,
          "p_retailprice" -> DoubleType)
        assertCols("nation", Tables.nation(spark, sfDir).schema,
          "n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType,
          "n_name" -> StringType)
        assertCols("region", Tables.region(spark, sfDir).schema,
          "r_regionkey" -> IntegerType, "r_name" -> StringType)
      }

      it(s"[$sf] documents / embeddings match the text and ANN operators' assumptions") {
        assertCols("documents", Tables.documents(spark, sfDir).schema,
          "doc_id" -> LongType, "source" -> StringType, "lang" -> StringType,
          "text" -> StringType, "n_chars" -> LongType)
        val e = Tables.embeddings(spark, sfDir).schema
        assertCols("embeddings", e, "vec_id" -> LongType, "label" -> IntegerType)
        withClue("embeddings.embedding: ") {
          e("embedding").dataType match {
            case ArrayType(FloatType, _) => succeed
            case other => fail(s"expected array<float>, got $other")
          }
        }
        // the ANN family hard-codes EmbeddingDim-sized slices
        val dim = Tables.embeddings(spark, sfDir)
          .selectExpr("size(embedding) AS d").take(1)(0).getInt(0)
        dim shouldBe graft.ops.VectorOps.EmbeddingDim
      }
    }

    it("events nanos-as-long era files still normalize through the LongType branch") {
      import spark.implicits._
      // simulate the rounds-1..3 testdata generation: ts physically a long
      // of epoch NANOS (what nanosAsLong surfaces for TIMESTAMP(NANOS))
      val dir = java.nio.file.Files.createTempDirectory("graft-nanos").toString
      Seq((1L, 1700000000123456789L, 7L, "click", 1.5, "{}"),
          (2L, 1700000000987654321L, 8L, "view", 2.5, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val ev = Tables.events(spark, dir)
      ev.schema("ts").dataType shouldBe TimestampType
      // floor-truncation to micros, the same conversion DuckDB applies
      val micros = ev.select(org.apache.spark.sql.functions
          .unix_micros(org.apache.spark.sql.functions.col("ts")))
        .collect().map(_.getLong(0)).sorted
      micros shouldBe Array(1700000000123456L, 1700000000987654L)
    }

    it("an unsupported events.ts dtype fails loudly naming the table and column") {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-baddtype").toString
      Seq((1L, "not-a-timestamp")).toDF("event_id", "ts")
        .write.parquet(s"$dir/events.parquet")
      val e = intercept[IllegalStateException] { Tables.events(spark, dir) }
      e.getMessage should include("events.ts")
    }

  }
}

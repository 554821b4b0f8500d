package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Entity
import graft.streaming.StreamingEntityRes

/** The record tier's ingest + forget story: the streamed matched-pair
  * index EQUALS the batch `resolvePairs` over everything ingested at
  * every micro-batch, golden records served from the maintained index
  * equal the batch survivorship, replays are exactly-once, a tombstone
  * removes the record as BOTH pair endpoints (splitting any typo chain
  * it was the middle of), and a CDC update (delete+insert of the same
  * key) re-resolves afresh.
  */
class StreamingEntityResSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  // one block (same nation + balance); a typo chain 1~2~3 whose
  // endpoints exceed the edit bound, an exact dup arriving late, and an
  // unrelated far name
  private def rec(id: Long, name: String) = (id, name, 7, 10.0, "SEG")
  private val b0 = Seq(rec(1L, "Customer#0000vwxyz"), rec(2L, "Customer#0000vwxyQ"),
    rec(9L, "Customer#unrelated"))
  private val b1 = Seq(rec(3L, "Customer#0000RSxyQ")) // d2 from 2, d3 from 1
  private val b2 = Seq(rec(4L, "Customer#0000vwxyz")) // exact dup of 1

  private def df(rows: Seq[(Long, String, Int, Double, String)]): DataFrame =
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  private def rowSet(d: DataFrame): Set[String] =
    d.collect().map(_.mkString("|")).toSet

  private def assertEqualsBatch(indexDir: String, rows: Seq[(Long, String, Int, Double, String)]): Unit = {
    rowSet(StreamingEntityRes.readPairs(spark, indexDir)
        .select(col("id_a"), col("id_b"), col("dist").cast("long"))) shouldBe
      rowSet(Entity.resolvePairs(df(rows))
        .select(col("id_a"), col("id_b"), col("dist").cast("long")))
    rowSet(StreamingEntityRes.serveGoldenRecords(spark, indexDir)) shouldBe
      rowSet(Entity.goldenRecords(df(rows)))
  }

  describe("StreamingEntityRes") {
    it("streamed pairs == batch resolvePairs and served golden records == batch survivorship, every batch") {
      val dir = java.nio.file.Files.createTempDirectory("graft-ser").toString
      var seen = Seq.empty[(Long, String, Int, Double, String)]
      Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
        StreamingEntityRes.processBatch(df(b), i.toLong, dir)
        seen = seen ++ b
        assertEqualsBatch(dir, seen)
      }
      // the incrementality was real: the late exact dup (batch 2) paired
      // against records from batches 0 and 1
      StreamingEntityRes.readPairs(spark, dir)
        .filter(col("id_a") === 1L && col("id_b") === 4L).count() shouldBe 1L
      // and the chain 1~2~3 folded into ONE entity across batches
      StreamingEntityRes.serveGoldenRecords(spark, dir)
        .filter(col("entity_id") === 1L).head().getLong(1) shouldBe 4L
    }

    it("a replayed batch is exactly-once") {
      val dir = java.nio.file.Files.createTempDirectory("graft-ser-retry").toString
      StreamingEntityRes.processBatch(df(b0), 0L, dir)
      StreamingEntityRes.processBatch(df(b1), 1L, dir)
      val snap = rowSet(StreamingEntityRes.serveGoldenRecords(spark, dir))
      StreamingEntityRes.processBatch(df(b1), 1L, dir) // crash-retry
      rowSet(StreamingEntityRes.serveGoldenRecords(spark, dir)) shouldBe snap
      assertEqualsBatch(dir, b0 ++ b1)
    }

    it("forgetting the MIDDLE of a typo chain splits the entity; post-delete == batch over survivors") {
      val dir = java.nio.file.Files.createTempDirectory("graft-ser-del").toString
      Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
        StreamingEntityRes.processBatch(df(b), i.toLong, dir)
      }
      // record 2 bridges 1 and 3; forgetting it must split them
      StreamingEntityRes.processDeletes(Seq(2L).toDF("c_custkey"), dir)
      val survivors = (b0 ++ b1 ++ b2).filterNot(_._1 == 2L)
      assertEqualsBatch(dir, survivors)
      val golden = StreamingEntityRes.serveGoldenRecords(spark, dir)
      golden.filter(col("entity_id") === 3L).count() shouldBe 1L // split off
      golden.filter(col("entity_id") === 1L).head().getLong(1) shouldBe 2L // 1 + exact dup 4
      // physically gone from both state tables
      StreamingEntityRes.readRecords(spark, dir)
        .filter(col("c_custkey") === 2L).count() shouldBe 0L
      StreamingEntityRes.readPairs(spark, dir)
        .filter(col("id_a") === 2L || col("id_b") === 2L).count() shouldBe 0L
      // replay: exactly-once
      StreamingEntityRes.processDeletes(Seq(2L).toDF("c_custkey"), dir)
      assertEqualsBatch(dir, survivors)
    }

    it("a CDC update (delete+insert of the same key) re-resolves afresh, exactly-once on retry") {
      val dir = java.nio.file.Files.createTempDirectory("graft-ser-cdc").toString
      Seq(b0, b1).zipWithIndex.foreach { case (b, i) =>
        StreamingEntityRes.processBatch(df(b), i.toLong, dir)
      }
      // record 9's name is corrected to a near-dup of the 1-chain: the
      // update must drop its old (unmatched) identity and pair afresh
      val cdc = df(Seq(rec(9L, "Customer#0000vwxyR")))
        .withColumn("is_delete", lit(false))
        .unionByName(df(Seq(rec(9L, "Customer#unrelated")))
          .withColumn("is_delete", lit(true)))
      StreamingEntityRes.processCdcBatch(cdc, 2L, dir)
      StreamingEntityRes.processCdcBatch(cdc, 2L, dir) // crash-retry
      val merged = b0.filterNot(_._1 == 9L) ++ b1 :+ rec(9L, "Customer#0000vwxyR")
      assertEqualsBatch(dir, merged)
      // the corrected record joined the chain's entity
      StreamingEntityRes.serveGoldenRecords(spark, dir)
        .filter(col("entity_id") === 1L).head().getLong(1) shouldBe 4L
    }
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.functions.TopKDedupAggregator

/** Pins for the dedup-under-eviction contract underpinning every graph-ANN
  * ranking path (ADVICE r13): inputs may repeat a (value, tieBreak) pair any
  * number of times, split across arbitrary partial buffers, and the result
  * must equal distinct + ranking-window top-k. The subtle case: a duplicate
  * arriving AFTER its tieBreak was evicted from a full buffer must not
  * re-enter (eviction is final under the sortValue-is-a-function-of-tieBreak
  * contract — the re-arrival carries the same value that already lost).
  */
class TopKDedupAggregatorSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  describe("TopKDedupAggregator") {
    it("dedups tieBreaks across arbitrary partial-buffer splits") {
      val agg = new TopKDedupAggregator(3)
      // duplicates of every pair, interleaved; distinct set:
      // (9,1) (9,4) (5,1)... note tieBreak 1 appears at value 9 ONLY
      // (sortValue is a function of tieBreak within a group)
      val items = List(
        (5.0, 7L), (9.0, 1L), (5.0, 7L), (2.0, 2L), (9.0, 4L),
        (9.0, 1L), (5.0, 3L), (2.0, 2L), (9.0, 4L), (5.0, 3L))
      val expected = Seq((9.0, 1L), (9.0, 4L), (5.0, 3L))

      agg.finish(items.foldLeft(agg.zero)(agg.reduce)) shouldBe expected
      for (split <- 1 until items.size) {
        val (a, b) = items.splitAt(split)
        val bufA = a.foldLeft(agg.zero)(agg.reduce)
        val bufB = b.foldLeft(agg.zero)(agg.reduce)
        agg.finish(agg.merge(bufA, bufB)) shouldBe expected
        agg.finish(agg.merge(bufB, bufA)) shouldBe expected
      }
    }

    it("a duplicate of an evicted tieBreak cannot re-enter a full buffer") {
      val agg = new TopKDedupAggregator(2)
      // (1.0, 9) enters, is evicted by two better pairs, then re-arrives
      val buf = List((1.0, 9L), (5.0, 1L), (4.0, 2L), (1.0, 9L))
        .foldLeft(agg.zero)(agg.reduce)
      agg.finish(buf) shouldBe Seq((5.0, 1L), (4.0, 2L))
    }

    it("through the DataFrame UDAF path matches distinct + ranking window") {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val rng = new scala.util.Random(7)
      // value derived from (g, id) so duplicates are exact — then each row
      // duplicated 1-3 times and shuffled across 7 partitions
      val base = (1 to 300).map { i =>
        val g = s"g${i % 4}"; val id = i.toLong
        (g, ((id * 2654435761L) % 50L).toDouble, id)
      }
      val dup = base.flatMap(r => Seq.fill(1 + rng.nextInt(3))(r))
      val df = rng.shuffle(dup).toDF("g", "v", "id").repartition(7)
      val topk = udaf(new TopKDedupAggregator(5),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong))
      val viaAgg = df.groupBy(col("g")).agg(topk(col("v"), col("id")).as("t"))
        .select(col("g"), posexplode(col("t")).as(Seq("i", "p")))
        .select(col("g"), (col("i") + 1).cast("long").as("rank"),
          col("p._1").as("v"), col("p._2").as("id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
      val viaWindow = df.distinct()
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("g"), col("rank").cast("long"), col("v"), col("id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      viaAgg shouldBe viaWindow
    }
  }
}

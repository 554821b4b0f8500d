package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.functions.TopKAggregator

class TopKAggregatorSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  describe("TopKAggregator") {
    it("keeps the k best with deterministic tie-break regardless of merge order") {
      val agg = new TopKAggregator(3)
      val items = List((5.0, 7L), (5.0, 3L), (9.0, 1L), (2.0, 2L), (9.0, 4L), (5.0, 1L))
      val expected = Seq((9.0, 1L), (9.0, 4L), (5.0, 1L))

      // single-pass reduce
      agg.finish(items.foldLeft(agg.zero)(agg.reduce)) shouldBe expected
      // arbitrary partial-buffer merges (map-side combine simulation)
      for (split <- 1 until items.size) {
        val (a, b) = items.splitAt(split)
        val bufA = a.foldLeft(agg.zero)(agg.reduce)
        val bufB = b.foldLeft(agg.zero)(agg.reduce)
        agg.finish(agg.merge(bufA, bufB)) shouldBe expected
        agg.finish(agg.merge(bufB, bufA)) shouldBe expected
      }
    }

    it("through the DataFrame UDAF path matches a ranking window") {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val rng = new scala.util.Random(11)
      val df = (1 to 500).map(i => (s"g${i % 5}", rng.nextInt(50).toDouble, i.toLong))
        .toDF("g", "v", "id")
      val topk = udaf(new TopKAggregator(4),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong))
      val viaAgg = df.repartition(7).groupBy(col("g")).agg(topk(col("v"), col("id")).as("t"))
        .select(col("g"), posexplode(col("t")).as(Seq("i", "p")))
        .select(col("g"), (col("i") + 1).cast("long").as("rank"), col("p._1").as("v"), col("p._2").as("id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
      val viaWindow = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 4)
        .select(col("g"), col("rank").cast("long"), col("v"), col("id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      viaAgg shouldBe viaWindow
    }
  }
}

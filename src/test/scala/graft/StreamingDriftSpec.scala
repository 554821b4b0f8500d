package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.ops.TimeSeries
import graft.streaming.StreamingDrift

/** The streaming drift monitor end to end: an in-distribution micro-batch
  * scores near zero against the reference, a shifted batch scores high,
  * metrics land once per batch, and a replayed batch is exactly-once.
  */
class StreamingDriftSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  // reference: values uniform over [0, 200) for one key
  private def refDf = {
    import spark.implicits._
    TimeSeries.referenceHistogram(
      (0 until 1000).map(i => ("k1", (i % 200).toDouble)).toDF("k", "v"), "k", "v")
  }

  describe("StreamingDrift") {
    it("flags a shifted batch and stays quiet on an in-distribution one") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
      val (metricsDir, ckpt) = (s"$dir/metrics", s"$dir/ckpt")
      val ref = refDf

      val mem = MemoryStream[(String, Double)]
      val q = StreamingDrift.start(
        mem.toDS().toDF("k", "v"), ref, metricsDir, ckpt, "k", "v")
      try {
        // batch 0: same distribution as the reference
        mem.addData((0 until 500).map(i => ("k1", (i % 200).toDouble)): _*)
        q.processAllAvailable()
        // batch 1: mass concentrated far from the reference's bins
        mem.addData((0 until 500).map(_ => ("k1", 420.0)): _*)
        q.processAllAvailable()
      } finally q.stop()

      val psi = spark.read.parquet(metricsDir)
        .select(col("batch_id").cast("long"), col("psi"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      psi.keySet shouldBe Set(0L, 1L)
      psi(0L) should be < 0.1  // stable
      psi(1L) should be > 1.0  // drifted hard
    }

    it("a replayed batch is exactly-once in the metrics sink") {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-drift-retry").toString
      val ref = refDf
      val b = (0 until 300).map(i => ("k1", (i % 200).toDouble)).toDF("k", "v")
      StreamingDrift.processBatch(b, 0L, ref, s"$dir/m", "k", "v")
      StreamingDrift.processBatch(b, 0L, ref, s"$dir/m", "k", "v")
      spark.read.parquet(s"$dir/m").count() shouldBe 1L
    }
  }
}

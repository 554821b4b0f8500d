package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming resilience guarantees: exactly-once file output across a
  * query restart (checkpoint offset tracking + file-sink commit log), and
  * stream-static dimension enrichment.
  */
class StreamResilienceSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  describe("checkpointed restart with a file sink") {
    it("resumes from committed offsets: no loss, no duplicates") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ckpt = java.nio.file.Files.createTempDirectory("graft-restart-ckpt").toString
      val outDir = java.nio.file.Files.createTempDirectory("graft-restart-out").toString
      val mem = MemoryStream[(Long, String)]

      def start() = mem.toDS().toDF("id", "v")
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt).start()

      val q1 = start()
      try {
        mem.addData((1L, "a"), (2L, "b"))
        q1.processAllAvailable()
      } finally q1.stop()

      // data arriving while the query is DOWN must be picked up on restart
      mem.addData((3L, "c"))

      val q2 = start()
      try {
        mem.addData((4L, "d"))
        q2.processAllAvailable()
      } finally q2.stop()

      val rows = spark.read.parquet(outDir).as[(Long, String)].collect().toSeq
      rows.sortBy(_._1) shouldBe Seq(
        (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")) // each exactly once
    }
  }

  describe("stream-static dimension join") {
    it("enriches each micro-batch against a static table without restart") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dims = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
      val mem = MemoryStream[(Long, Double)]
      val enriched = mem.toDS().toDF("user_id", "amount")
        .join(broadcast(dims), Seq("user_id"), "left")
        .select($"user_id", $"amount", coalesce($"tier", lit("unknown")).as("tier"))
      val ckpt = java.nio.file.Files.createTempDirectory("graft-dim").toString
      val sink = s"dim_${System.nanoTime()}"
      val q = enriched.writeStream.outputMode("append").format("memory")
        .queryName(sink).option("checkpointLocation", ckpt).start()
      try {
        mem.addData((1L, 10.0), (2L, 20.0), (9L, 5.0))
        q.processAllAvailable()
        spark.table(sink).as[(Long, Double, String)].collect().toSet shouldBe
          Set((1L, 10.0, "gold"), (2L, 20.0, "silver"), (9L, 5.0, "unknown"))
      } finally q.stop()
    }

    it("foreachBatch re-reads the dimension per batch, so dim UPDATES reach later batches") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-dimrf").toString
      val (dimDir, outDir, ckpt) = (s"$dir/dim", s"$dir/out", s"$dir/ckpt")
      Seq((1L, "gold")).toDF("user_id", "tier")
        .write.mode("overwrite").parquet(dimDir)

      val mem = MemoryStream[(Long, Double)]
      // the production dimension-refresh pattern: the plain stream-static
      // join PINS the dim at plan time; re-reading INSIDE foreachBatch
      // resolves it per batch, so slowly-changing dims need no restart
      val q = mem.toDS().toDF("user_id", "amount").writeStream
        .outputMode("append").option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val dim = batch.sparkSession.read.parquet(dimDir)
          batch.join(broadcast(dim), Seq("user_id"), "left")
            .select(col("user_id"), col("amount"),
              coalesce(col("tier"), lit("unknown")).as("tier"),
              lit(batchId).as("batch_id"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(outDir)
        }.start()
      try {
        mem.addData((1L, 10.0))
        q.processAllAvailable()
        // the dimension changes BETWEEN batches — no stream restart
        Seq((1L, "platinum")).toDF("user_id", "tier")
          .write.mode("overwrite").parquet(dimDir)
        mem.addData((1L, 11.0))
        q.processAllAvailable()
      } finally q.stop()

      val rows = spark.read.parquet(outDir)
        .select("user_id", "amount", "tier")
        .as[(Long, Double, String)].collect().toSet
      rows shouldBe Set((1L, 10.0, "gold"), (1L, 11.0, "platinum"))
    }
  }
}

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
  }
}

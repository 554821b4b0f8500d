package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.streaming.ActivityStream

/** File-based streaming source: the drop-a-file-in-a-directory ingestion
  * pattern (the production alternative to Kafka this image can actually
  * execute end-to-end). New files become new micro-batches; the same
  * parse/clean/filter chain runs unchanged on the binary `value` column.
  */
class FileStreamSourceSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  describe("streaming over an arriving-files directory") {
    it("picks up each new file as a micro-batch through the reference parse chain") {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-filesrc").toString

      def writeBatch(n: Int, rows: Seq[(String, Long, String)]): Unit = {
        // one JSON-lines file in the reference wire shape
        val lines = rows.map { case (id, ms, tpe) =>
          s"""{"id":"$id","date":$ms,"event":{"event_type":"$tpe","url":"https://x.com/t"}}"""
        }
        val tmp = java.nio.file.Files.createTempFile("part", ".txt")
        java.nio.file.Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
        // atomic move into the watched dir (the required file-source protocol)
        java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$dir/batch$n.txt"))
      }

      val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
      writeBatch(1, Seq(("u1", base, "LIKED"), ("u2", base + 1000, "viewed")))

      val raw = spark.readStream.format("text").load(dir)
        .select(col("value").cast("binary").as("value"))
      val clean = ActivityStream.rawInsertPipeline(ActivityStream.parseAndClean(raw))

      val ckpt = java.nio.file.Files.createTempDirectory("graft-filesrc-ckpt").toString
      val sink = s"filesrc_${System.nanoTime()}"
      val q = clean.writeStream.outputMode("append").format("memory")
        .queryName(sink).option("checkpointLocation", ckpt).start()
      def ids() = spark.table(sink).select("id").as[String].collect().toSet
      try {
        q.processAllAvailable()
        ids() shouldBe Set("u1") // viewed filtered out, LIKED normalized+kept

        writeBatch(2, Seq(("u3", base + 2000, "bookmarked")))
        q.processAllAvailable()
        ids() shouldBe Set("u1", "u3") // second file = incremental micro-batch
      } finally q.stop()
    }

    it("Trigger.AvailableNow drains a backlog through the SAME pipeline and terminates (backfill replay)") {
      import org.apache.spark.sql.streaming.Trigger
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-backfill").toString
      val base = java.sql.Timestamp.valueOf("2024-02-01 10:00:00").getTime
      // a pre-existing backlog of files (the backfill scenario: reprocess
      // history with the exact code the live stream runs)
      val rows = (1 to 30).map(i =>
        (s"b$i", base + i * 1000L, if (i % 3 == 0) "viewed" else "LIKED"))
      rows.grouped(10).zipWithIndex.foreach { case (g, i) =>
        val lines = g.map { case (id, ms, tpe) =>
          s"""{"id":"$id","date":$ms,"event":{"event_type":"$tpe","url":"https://x.com/t"}}"""
        }
        val tmp = java.nio.file.Files.createTempFile("part", ".txt")
        java.nio.file.Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
        java.nio.file.Files.move(tmp, java.nio.file.Paths.get(s"$dir/backlog$i.txt"))
      }

      val raw = spark.readStream.format("text").load(dir)
        .select(col("value").cast("binary").as("value"))
      val clean = ActivityStream.rawInsertPipeline(ActivityStream.parseAndClean(raw))
      val ckpt = java.nio.file.Files.createTempDirectory("graft-backfill-ckpt").toString
      val sink = s"backfill_${System.nanoTime()}"
      val q = clean.writeStream.outputMode("append").format("memory")
        .queryName(sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000) shouldBe true // drains the backlog, then STOPS

      // batch parity: the drained result equals running the same transform
      // chain in plain batch mode over the same files
      val streamed = spark.table(sink).select("id").as[String].collect().toSet
      val batchRaw = spark.read.format("text").load(dir)
        .select(col("value").cast("binary").as("value"))
      val batch = ActivityStream.rawInsertPipeline(ActivityStream.parseAndClean(batchRaw))
        .select("id").as[String].collect().toSet
      streamed shouldBe batch
      streamed.size shouldBe 20 // the 10 'viewed' rows filtered in both paths
    }
  }
}

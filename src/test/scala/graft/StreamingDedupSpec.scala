package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingDedup

/** The ingest-dedup loop end to end over a real micro-batch stream: history
  * collisions drop, within-batch duplicates drop, fresh docs survive, and
  * the band index accumulates exactly the survivors' bands.
  */
class StreamingDedupSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private val base = (1 to 60).map(i => s"tok$i").mkString(" ")
  private val nearDup = ((1 to 59).map(i => s"tok$i") :+ "changed").mkString(" ")
  private val unrelated = (1 to 60).map(i => s"other$i").mkString(" ")
  private val fresh = (1 to 60).map(i => s"fresh$i").mkString(" ")

  describe("StreamingDedup") {
    it("dedups each micro-batch against accumulated history and itself") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
      val (histDir, corpusDir, ckptDir) = (s"$dir/hist", s"$dir/corpus", s"$dir/ckpt")
      // seed an empty band index so batch 0 has a readable history
      spark.emptyDataset[(Long, Int, Long)].toDF("doc_id", "band", "bh")
        .write.parquet(histDir)

      val mem = MemoryStream[(Long, String)]
      val q = StreamingDedup.start(
        mem.toDS().toDF("doc_id", "text"), histDir, corpusDir, ckptDir)
      try {
        mem.addData((1L, base), (2L, unrelated))
        q.processAllAvailable()
        // batch 2: 10 collides with history (near-dup of 1), 11 is fresh,
        // 12 duplicates 11 within the batch (higher id drops)
        mem.addData((10L, nearDup), (11L, fresh), (12L, fresh))
        q.processAllAvailable()
      } finally q.stop()

      val corpus = spark.read.parquet(corpusDir)
        .collect().map(_.getLong(0)).toSet
      corpus shouldBe Set(1L, 2L, 11L)
      // the index holds exactly the survivors' bands (4 bands per doc)
      val bands = spark.read.parquet(histDir)
      bands.select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet shouldBe Set(1L, 2L, 11L)
      bands.count() shouldBe 3 * graft.ops.Dedup.MinhashBands
    }
  }
}

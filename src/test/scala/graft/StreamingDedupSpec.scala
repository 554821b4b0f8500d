package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingDedup

/** The ingest-dedup loop end to end over a real micro-batch stream: history
  * collisions drop, within-batch duplicates drop, fresh docs survive, the
  * band index accumulates exactly the survivors' bands — and a replayed
  * batch (the crash-retry path) leaves both sinks with exactly one copy.
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
      // no pre-seeded index: batch 0 must read the missing path as empty

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
        .select("doc_id").collect().map(_.getLong(0)).toSet
      corpus shouldBe Set(1L, 2L, 11L)
      // the index holds exactly the survivors' bands (4 bands per doc)
      val bands = spark.read.parquet(histDir)
      bands.select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet shouldBe Set(1L, 2L, 11L)
      bands.count() shouldBe 3 * graft.ops.Dedup.MinhashBands
    }

    it("a replayed batch is exactly-once: no duplicate corpus or index rows") {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-sdedup-retry").toString
      val (histDir, corpusDir) = (s"$dir/hist", s"$dir/corpus")

      val b0 = Seq((1L, base), (2L, unrelated)).toDF("doc_id", "text")
      val b1 = Seq((10L, nearDup), (11L, fresh), (12L, fresh)).toDF("doc_id", "text")
      StreamingDedup.processBatch(b0, 0L, histDir, corpusDir)
      StreamingDedup.processBatch(b1, 1L, histDir, corpusDir)
      // crash-after-commit retry: Structured Streaming replays batch 1 with
      // the SAME contents; the sinks must end up byte-identical to one run
      StreamingDedup.processBatch(b1, 1L, histDir, corpusDir)

      val corpus = spark.read.parquet(corpusDir).select("doc_id")
        .collect().map(_.getLong(0)).toList.sorted
      corpus shouldBe List(1L, 2L, 11L) // one copy each — no retry duplicates
      val bands = spark.read.parquet(histDir)
      bands.count() shouldBe 3 * graft.ops.Dedup.MinhashBands
      bands.select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet shouldBe Set(1L, 2L, 11L)
    }
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.TextOps
import graft.streaming.StreamingCuration

/** The streaming curation loop end to end over real micro-batches: every
  * arriving doc lands in exactly one sink (kept with scrubbed text, or
  * rejects with the first-breached gate), routing matches the batch
  * retentionReport bit-for-bit, and a replayed batch is exactly-once.
  */
class StreamingCurationSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  // gate outcomes by construction (default thresholds: minTokens=20,
  // minQuality=0.6, dup/top-frac 0.2/0.1)
  private val short = "too few tokens"
  private val good = (1 to 30).map(i => s"word$i").mkString(" ")
  private val withPii = ((1 to 29).map(i => s"word$i") :+ "mail me@example.com").mkString(" ")
  private val stuffed = ((1 to 25).map(i => s"w$i") ++ Seq.fill(8)(Seq("buy", "now")).flatten).mkString(" ")

  describe("StreamingCuration") {
    it("routes each doc to exactly one sink, matching the batch report") {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-scur").toString
      val (keptDir, rejDir, ckptDir) = (s"$dir/kept", s"$dir/rej", s"$dir/ckpt")

      val all = Seq((1L, short), (2L, good), (3L, withPii), (4L, stuffed))
      val mem = MemoryStream[(Long, String)]
      val q = StreamingCuration.start(
        mem.toDS().toDF("doc_id", "text"), keptDir, rejDir, ckptDir)
      try {
        mem.addData(all.take(2): _*)
        q.processAllAvailable()
        mem.addData(all.drop(2): _*)
        q.processAllAvailable()
      } finally q.stop()

      val kept = spark.read.parquet(keptDir)
      val rejects = spark.read.parquet(rejDir)
      val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
      val rejIds = rejects.select("doc_id").collect().map(_.getLong(0)).toSet
      (keptIds ++ rejIds) shouldBe all.map(_._1).toSet
      (keptIds & rejIds) shouldBe empty

      // routing + reasons must equal the batch-mode report on the same docs
      val report = TextOps.retentionReport(all.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> (r.getBoolean(r.fieldIndex("retained")),
          Option(r.getAs[String]("reject_reason")))).toMap
      keptIds shouldBe report.collect { case (id, (true, _)) => id }.toSet
      rejects.collect().map(r => r.getLong(0) -> r.getString(1)).toMap shouldBe
        report.collect { case (id, (false, Some(why))) => id -> why }.toMap

      // kept text is the scrubbed form: the PII doc's email is masked
      val keptText = kept.collect()
        .map(r => r.getLong(0) -> r.getAs[String]("text_scrubbed")).toMap
      assert(report(3L)._1, "withPii doc should pass the gates")
      keptText(3L) should include("<EMAIL>")
      keptText(3L) should not include "example.com"
      kept.filter("doc_id = 3").select("had_pii").collect()(0).getBoolean(0) shouldBe true
    }

    it("a replayed batch is exactly-once in both sinks") {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-scur-retry").toString
      val (keptDir, rejDir) = (s"$dir/kept", s"$dir/rej")
      val b0 = Seq((1L, short), (2L, good)).toDF("doc_id", "text")
      val b1 = Seq((3L, withPii), (4L, stuffed)).toDF("doc_id", "text")
      // observed metrics ride the write — no extra pass — and match the sinks
      val m0 = StreamingCuration.processBatch(b0, 0L, keptDir, rejDir)
      m0("n_in") shouldBe 2L
      m0("n_kept") shouldBe 1L
      m0("n_pii") shouldBe 0L
      val m1 = StreamingCuration.processBatch(b1, 1L, keptDir, rejDir)
      m1("n_in") shouldBe 2L
      m1("n_kept") shouldBe 1L
      m1("n_pii") shouldBe 1L
      // crash-after-commit retry replays batch 1 with identical contents
      StreamingCuration.processBatch(b1, 1L, keptDir, rejDir)

      val kept = spark.read.parquet(keptDir).select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      kept.size shouldBe kept.distinct.size
      val rej = spark.read.parquet(rejDir).select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      rej.size shouldBe rej.distinct.size
      (kept ++ rej).toSet shouldBe Set(1L, 2L, 3L, 4L)
    }
  }

  describe("processBatchWithSpanExcision edge cases") {
    it("survives an all-rejected batch 0 (empty kept sink, no schema to infer)") {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-scur-empty").toString
      val (keptDir, rejDir, spanDir, cleanDir) =
        (s"$dir/kept", s"$dir/rej", s"$dir/span", s"$dir/clean")
      // batch 0: every doc fails the token gate — the kept sink commits
      // zero rows and the excision read-back must see an empty frame,
      // not an inference crash that permanently kills the query
      val allSpam = Seq((1L, short), (2L, "also short")).toDF("doc_id", "text")
      noException should be thrownBy
        StreamingCuration.processBatchWithSpanExcision(
          allSpam, 0L, keptDir, rejDir, spanDir, cleanDir)
      // a later good batch still flows through to the clean sink
      val ok = Seq((3L, good)).toDF("doc_id", "text")
      StreamingCuration.processBatchWithSpanExcision(
        ok, 1L, keptDir, rejDir, spanDir, cleanDir)
      spark.read.parquet(cleanDir).select("doc_id")
        .collect().map(_.getLong(0)).toSet shouldBe Set(3L)
    }
  }
}

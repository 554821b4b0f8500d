package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.TextOps
import graft.streaming.StreamingManifest

/** Continuous manifest maintenance: the streamed fold equals the batch
  * manifest of the full stream at every batch boundary, replay is
  * exactly-once, and cold start needs no seed.
  */
class StreamingManifestSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, t, s) => (id, t, s, t.length.toLong) }
      .toDF("doc_id", "text", "source", "n_chars")

  private def mset(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private val b0 = Seq((1L, "aa bb cc", "s1"), (2L, "dd ee", "s2"))
  private val b1 = Seq((3L, "ff gg hh ii", "s1"))
  private val b2 = Seq((4L, "jj", "s2"), (5L, "kk ll", "s3"))

  it("streamed manifest == batch manifest at every batch boundary") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-smani").toString
    val (stateDir, ckpt) = (s"$dir/state", s"$dir/ckpt")
    val mem = MemoryStream[(Long, String, String, Long)]
    val q = StreamingManifest.start(
      mem.toDS().toDF("doc_id", "text", "source", "n_chars"), stateDir, ckpt)
    var seen = Seq.empty[(Long, String, String)]
    try {
      Seq(b0, b1, b2).foreach { b =>
        mem.addData(b.map { case (id, t, s) => (id, t, s, t.length.toLong) }: _*)
        q.processAllAvailable()
        seen = seen ++ b
        mset(StreamingManifest.readManifest(spark, stateDir, Long.MaxValue)) shouldBe
          mset(TextOps.corpusManifest(docsDf(seen)))
      }
    } finally q.stop()
  }

  it("a replayed batch is exactly-once: counts and digest unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-smani-retry").toString
    StreamingManifest.processBatch(docsDf(b0), 0L, dir)
    StreamingManifest.processBatch(docsDf(b1), 1L, dir)
    val once = mset(StreamingManifest.readManifest(spark, dir, Long.MaxValue))
    StreamingManifest.processBatch(docsDf(b1), 1L, dir) // crash-retry
    mset(StreamingManifest.readManifest(spark, dir, Long.MaxValue)) shouldBe once
    once shouldBe mset(TextOps.corpusManifest(docsDf(b0 ++ b1)))
  }

  it("cold start needs no pre-seeded state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-smani-cold").toString
    StreamingManifest.readManifest(spark, dir, Long.MaxValue).count() shouldBe 0L
    StreamingManifest.processBatch(docsDf(b0), 0L, dir)
    mset(StreamingManifest.readManifest(spark, dir, Long.MaxValue)) shouldBe
      mset(TextOps.corpusManifest(docsDf(b0)))
  }
}

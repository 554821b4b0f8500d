package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Dedup
import graft.streaming.StreamingComponents

/** Incremental exact connected components over a streamed edge feed:
  * after every micro-batch the maintained table equals the batch
  * fixpoint over every edge ever streamed — including merges that
  * BRIDGE components built in earlier batches — and a replayed batch is
  * exactly-once.
  */
class StreamingComponentsSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private def edges(rows: Seq[(Long, Long)]) = rows.toDF("doc_a", "doc_b")

  // b0 builds two separate components {1,2} and {5,6,7} plus {10,11};
  // b1 BRIDGES {1,2} and {5,6,7} through the new node 3; b2 extends the
  // untouched {10,11} and starts a fresh {20,21}
  private val b0 = Seq(1L -> 2L, 5L -> 6L, 6L -> 7L, 10L -> 11L)
  private val b1 = Seq(2L -> 3L, 3L -> 5L)
  private val b2 = Seq(11L -> 12L, 20L -> 21L)

  private def stateSet(dir: String): Set[(Long, Long)] =
    StreamingComponents.readComponents(spark, dir, Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def batchRef(rows: Seq[(Long, Long)]): Set[(Long, Long)] =
    Dedup.nearDupComponentsExact(edges(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  it("maintained components == batch fixpoint over the full history, every batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-scc").toString
    val (stateDir, ckpt) = (s"$dir/state", s"$dir/ckpt")
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingComponents.start(
      mem.toDS().toDF("doc_a", "doc_b"), stateDir, ckpt)
    try {
      var seen = Seq.empty[(Long, Long)]
      Seq(b0, b1, b2).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        stateSet(stateDir) shouldBe batchRef(seen)
      }
      // the cross-batch merge, explicitly: 5,6,7 now carry rep 1
      val reps = stateSet(stateDir).toMap
      Seq(2L, 3L, 5L, 6L, 7L).foreach(n => reps(n) shouldBe 1L)
      // untouched component extended without disturbing others
      reps(12L) shouldBe 10L
      reps(21L) shouldBe 20L
    } finally q.stop()
  }

  it("a replayed batch is exactly-once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scc-retry").toString
    StreamingComponents.processBatch(edges(b0), 0L, dir)
    StreamingComponents.processBatch(edges(b1), 1L, dir)
    val once = stateSet(dir)
    StreamingComponents.processBatch(edges(b1), 1L, dir) // crash-retry
    stateSet(dir) shouldBe once
    stateSet(dir) shouldBe batchRef(b0 ++ b1)
  }

  it("cold start needs no seeded state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scc-cold").toString
    StreamingComponents.readComponents(spark, s"$dir/none", Long.MaxValue).count() shouldBe 0L
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Sketches
import graft.streaming.StreamingBloom

/** The Bloom membership filter: zero false negatives by construction, a
  * small measured FP rate on provably-absent keys, bitwise-OR
  * mergeability (shard sketches fold into the union's sketch exactly),
  * and the streamed fold equals the batch sketch of everything ever
  * ingested — so probes from state keep the no-false-negative guarantee.
  */
class BloomSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private def events(ids: Seq[Long]) = ids.toDF("user_id")

  private def sketchMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  describe("bloomProbeReport") {
    it("finds every present key and few absent ones") {
      val report = Sketches.bloomProbeReport(events(1L to 400L))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      val (np, fp, pRate) = report("present")
      np shouldBe 400L
      fp shouldBe 400L
      pRate shouldBe 1.0 // the Bloom guarantee: NO false negatives
      val (na, fa, aRate) = report("absent")
      na shouldBe 400L
      // 400 keys × 4 probes over 65536 bits → load ≈ 2.4%, theoretical
      // FP ≈ (1600/65536)^4 ~ 3e-7; allow generous slack for collisions
      aRate should be < 0.05
      fa.toDouble shouldBe (aRate * na +- 0.5)
    }
  }

  describe("bloomSketch merge") {
    it("bit_or of shard sketches equals the union's sketch") {
      val a = Sketches.bloomSketch(events(1L to 200L))
      val b = Sketches.bloomSketch(events(150L to 350L))
      val folded = a.unionByName(b).groupBy(col("word_idx"))
        .agg(expr("bit_or(bits)").as("bits"))
      sketchMap(folded) shouldBe sketchMap(Sketches.bloomSketch(events(1L to 350L)))
    }
  }

  describe("StreamingBloom") {
    it("maintained filter == batch sketch over full history, every batch") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-sbloom").toString
      val (stateDir, ckpt) = (s"$dir/state", s"$dir/ckpt")
      val batches = Seq(1L to 150L, 151L to 300L, 250L to 420L)
      val mem = MemoryStream[Long]
      val q = StreamingBloom.start(mem.toDS().toDF("user_id"), stateDir, ckpt)
      try {
        var seen = Seq.empty[Long]
        batches.foreach { b =>
          mem.addData(b: _*)
          q.processAllAvailable()
          seen = seen ++ b
          sketchMap(StreamingBloom.readFilter(spark, stateDir, Long.MaxValue)) shouldBe
            sketchMap(Sketches.bloomSketch(events(seen)))
        }
        // probes from state: every streamed key found (no false negatives)
        val cand = events(seen.distinct).withColumn("cohort", lit("present"))
        val probed = Sketches.bloomProbeFrom(
          StreamingBloom.readFilter(spark, stateDir, Long.MaxValue), cand)
        probed.filter(col("all_set") === 0).count() shouldBe 0L
      } finally q.stop()
    }

    it("a replayed batch is exactly-once: state unchanged") {
      val dir = java.nio.file.Files.createTempDirectory("graft-sbloom-retry").toString
      val stateDir = s"$dir/state"
      StreamingBloom.processBatch(events(1L to 100L), 0L, stateDir)
      StreamingBloom.processBatch(events(90L to 200L), 1L, stateDir)
      val snap = sketchMap(StreamingBloom.readFilter(spark, stateDir, Long.MaxValue))
      StreamingBloom.processBatch(events(90L to 200L), 1L, stateDir)
      sketchMap(StreamingBloom.readFilter(spark, stateDir, Long.MaxValue)) shouldBe snap
    }
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Sketches
import graft.streaming.StreamingCms

/** Incremental count-min maintenance: the streamed fold is EXACTLY the
  * batch sketch of everything streamed, serving from the snapshot equals
  * the batch estimates, replay is exactly-once, and cold start needs no
  * seed.
  */
class StreamingCmsSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private def batchIds(seed: Int, n: Int): Seq[Long] = {
    val rng = new scala.util.Random(seed)
    (1 to n).map(_ => (rng.nextInt(30) + 1).toLong) ++
      Seq.fill(n)(7L) // keep one key heavy in every batch
  }

  private def sketchMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  it("the streamed fold equals the batch sketch of the full stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-scms").toString
    val (stateDir, ckpt) = (s"$dir/state", s"$dir/ckpt")
    val mem = MemoryStream[Long]
    val q = StreamingCms.start(mem.toDS().toDF("user_id"), stateDir, ckpt)
    val batches = Seq(batchIds(1, 40), batchIds(2, 55), batchIds(3, 25))
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val streamed = StreamingCms.readSketch(spark, stateDir, Long.MaxValue)
    val direct = Sketches.cmsSketch(batches.flatten.toDF("user_id"))
    sketchMap(streamed) shouldBe sketchMap(direct)

    // serving from the snapshot == serving from a full batch recomputation
    val cand = batches.flatten.distinct.toDF("user_id")
    val fromState = Sketches.cmsEstimatesFrom(streamed, cand)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromBatch = Sketches.cmsEstimatesFrom(direct, cand)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fromState shouldBe fromBatch
    fromState(7L) should be >= 120L // the planted heavy key's true count
  }

  it("probing keys the sketch never saw returns 0 (or the true collision min)") {
    // keys 1..5 seen; 1000001..1000003 never streamed: their cells are
    // either absent from the sketch table (must read as 0) or colliding
    // with seen keys' cells — the estimate is min over ALL 4 cells with
    // absent := 0, so an unseen key can NEVER exceed the smallest
    // collision mass, and with zero collisions must report exactly 0.
    val seen = Seq(1L, 2L, 3L, 4L, 5L).flatMap(k => Seq.fill(10)(k))
    val sk = Sketches.cmsSketch(seen.toDF("user_id"))
    val cand = Seq(1L, 5L, 1000001L, 1000002L, 1000003L).toDF("user_id")
    val est = Sketches.cmsEstimatesFrom(sk, cand)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    est(1L) should be >= 10L
    est(5L) should be >= 10L
    // unseen keys: estimate bounded by total stream mass but must include
    // absent cells as zero — with 50 events over 32k cells a 4-way
    // all-cell collision is essentially impossible, so expect 0
    Seq(1000001L, 1000002L, 1000003L).foreach { k => est(k) shouldBe 0L }
  }

  it("a replayed batch is exactly-once: cells are not double-counted") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scms-retry").toString
    val b0 = batchIds(1, 30).toDF("user_id")
    val b1 = batchIds(2, 20).toDF("user_id")
    StreamingCms.processBatch(b0, 0L, dir)
    StreamingCms.processBatch(b1, 1L, dir)
    val first = sketchMap(StreamingCms.readSketch(spark, dir, Long.MaxValue))
    StreamingCms.processBatch(b1, 1L, dir) // crash-retry
    sketchMap(StreamingCms.readSketch(spark, dir, Long.MaxValue)) shouldBe first
    // total mass per hash row = 100 events (60 + 40), not 140
    first.toSeq.filter(_._1._1 == 0).map(_._2).sum shouldBe 100L
  }

  it("cold start needs no pre-seeded state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scms-cold").toString
    StreamingCms.readSketch(spark, dir, Long.MaxValue).count() shouldBe 0L
    StreamingCms.processBatch(Seq(1L, 2L, 3L).toDF("user_id"), 0L, dir)
    StreamingCms.readSketch(spark, dir, Long.MaxValue)
      .agg(sum(col("cnt"))).head().getLong(0) shouldBe 3L * Sketches.CmsDepth
  }

  it("join size of two live streams is served from their maintained folds alone") {
    // two independently-maintained sketches (click stream, purchase
    // stream); the inner-product estimate from the two STATE snapshots
    // equals the batch estimate over both full histories
    val dir = java.nio.file.Files.createTempDirectory("graft-scms-join").toString
    val (clickDir, purchDir) = (s"$dir/click", s"$dir/purch")
    val clicks = Seq(Seq(1L, 1L, 2L, 3L), Seq(1L, 1L, 3L, 3L))
    val purchases = Seq(Seq(1L, 2L), Seq(2L, 9L))
    clicks.zipWithIndex.foreach { case (b, i) =>
      StreamingCms.processBatch(b.toDF("user_id"), i.toLong, clickDir) }
    purchases.zipWithIndex.foreach { case (b, i) =>
      StreamingCms.processBatch(b.toDF("user_id"), i.toLong, purchDir) }
    val served = Sketches.cmsJoinSizeFromSketches(
      StreamingCms.readSketch(spark, clickDir, Long.MaxValue),
      StreamingCms.readSketch(spark, purchDir, Long.MaxValue))
      .collect().head.getLong(0)
    val inline = Sketches.cmsJoinSizeFromSketches(
      Sketches.cmsSketch(clicks.flatten.toDF("user_id")),
      Sketches.cmsSketch(purchases.flatten.toDF("user_id")))
      .collect().head.getLong(0)
    served shouldBe inline
    // exact pairs: user 1 = 4 clicks x 1 purchase, user 2 = 1 x 2 → 6
    served should be >= 6L
  }
}

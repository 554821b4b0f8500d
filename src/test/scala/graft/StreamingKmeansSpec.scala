package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingKmeans

/** Mini-batch streaming k-means over real micro-batches: centroids follow
  * drifting cluster centers, the fold is exactly-once under replay, and
  * cold start seeds deterministically from the first batch.
  */
class StreamingKmeansSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private val dim = 4

  /** Two tight clusters around (a,a,0,0) and (0,0,b,b), 20 points each,
    * deterministic ±0.01 jitter.
    */
  private def batchAt(a: Double, b: Double, idBase: Long): Seq[(Long, Array[Float])] = {
    def jit(i: Int) = if (i % 2 == 0) 0.01f else -0.01f
    // ids interleave across clusters so the k-lowest-ids cold start
    // seeds one centroid in EACH cluster
    val ca = (0 until 20).map(i =>
      (idBase + 2 * i, Array(a.toFloat + jit(i), a.toFloat - jit(i), 0f, 0f)))
    val cb = (0 until 20).map(i =>
      (idBase + 2 * i + 1, Array(0f, 0f, b.toFloat + jit(i), b.toFloat - jit(i))))
    ca ++ cb
  }

  private def centroids(dir: String, before: Long) =
    StreamingKmeans.readCentroids(spark, dir, dim, before).get

  it("centroids track drifting cluster centers across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-skm").toString
    val (stateDir, ckpt) = (s"$dir/state", s"$dir/ckpt")
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamingKmeans.start(
      mem.toDS().toDF("vec_id", "embedding"), stateDir, ckpt, k = 2, dim = dim)
    try {
      // cluster A drifts 1.0 -> 1.6, cluster B stays at -1.0
      for ((a, i) <- Seq(1.0, 1.2, 1.4, 1.6).zipWithIndex) {
        mem.addData(batchAt(a, -1.0, i * 1000L): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val cents = centroids(stateDir, Long.MaxValue)
    cents.length shouldBe 2
    cents.foreach(_._3 shouldBe 80L) // 4 batches x 20 points per cluster
    // count-weighted blend of 1.0,1.2,1.4,1.6 = 1.3 on the A-dims
    val aCent = cents.map(_._2).find(c => c.head > 0.5).get
    aCent(0) shouldBe 1.3 +- 0.02
    aCent(1) shouldBe 1.3 +- 0.02
    val bCent = cents.map(_._2).find(c => c(2) < -0.5).get
    bCent(2) shouldBe -1.0 +- 0.02
  }

  it("a replayed batch is exactly-once: no double-weighting") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skm-retry").toString
    val b0 = batchAt(1.0, -1.0, 0L).toDF("vec_id", "embedding")
    val b1 = batchAt(2.0, -1.0, 1000L).toDF("vec_id", "embedding")
    StreamingKmeans.processBatch(b0, 0L, dir, k = 2, dim = dim)
    StreamingKmeans.processBatch(b1, 1L, dir, k = 2, dim = dim)
    val first = centroids(dir, Long.MaxValue).toSeq
    StreamingKmeans.processBatch(b1, 1L, dir, k = 2, dim = dim) // crash-retry
    centroids(dir, Long.MaxValue).toSeq shouldBe first
    first.map(_._3).sum shouldBe 80L // not 120: the replay replaced itself
  }

  it("cold start seeds from the first batch's k lowest vec_ids") {
    val dir = java.nio.file.Files.createTempDirectory("graft-skm-init").toString
    val b0 = batchAt(1.0, -1.0, 0L).toDF("vec_id", "embedding")
    StreamingKmeans.processBatch(b0, 0L, dir, k = 2, dim = dim)
    val cents = centroids(dir, Long.MaxValue)
    cents.length shouldBe 2
    // interleaved ids put one seed in each cluster; every point lands in
    // its own cluster's cell
    cents.map(_._3).toSeq.sorted shouldBe Seq(20L, 20L)
  }
}

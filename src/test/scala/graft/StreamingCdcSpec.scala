package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Cdc
import graft.streaming.StreamingCdc

/** The streaming upsert view end to end: every micro-batch folds onto the
  * latest committed snapshot, the materialized state always equals the
  * direct recompute over all changes so far (the same maintenance invariant
  * CdcSpec proves in batch), and a replayed batch is exactly-once.
  */
class StreamingCdcSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private def feed(rows: Seq[(Long, Long, String, Boolean)]) =
    rows.toDF("k", "v", "payload", "is_delete")

  private def snapshotSet(dir: String): Set[(Long, Long, String)] = {
    // no declared schema: partition-column inference may type the version
    // as int — cast before comparing
    val all = spark.read.parquet(dir).withColumn(StreamingCdc.VersionCol,
      org.apache.spark.sql.functions.col(StreamingCdc.VersionCol).cast("long"))
    val maxV = all.agg(org.apache.spark.sql.functions.max(StreamingCdc.VersionCol)).head().getLong(0)
    all.filter(org.apache.spark.sql.functions.col(StreamingCdc.VersionCol) === maxV)
      .select("k", "v", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
  }

  private def direct(rows: Seq[(Long, Long, String, Boolean)]): Set[(Long, Long, String)] =
    Cdc.latestWins(feed(rows), Seq("k"), Seq("v"), "is_delete")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  private val b0 = Seq((1L, 1L, "one-a", false), (2L, 1L, "two-a", false))
  private val b1 = Seq((1L, 2L, "one-b", false), (2L, 2L, "", true), (3L, 2L, "three", false))
  private val b2 = Seq((2L, 3L, "two-back", false), (3L, 3L, "", true))

  describe("StreamingCdc") {
    it("maintains snapshot == direct recompute across real micro-batches") {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft-scdc").toString
      val (snapDir, ckptDir) = (s"$dir/snap", s"$dir/ckpt")

      val mem = MemoryStream[(Long, Long, String, Boolean)]
      val q = StreamingCdc.start(
        mem.toDS().toDF("k", "v", "payload", "is_delete"),
        snapDir, ckptDir, Seq("k"), Seq("v"), "is_delete")
      try {
        mem.addData(b0: _*)
        q.processAllAvailable()
        snapshotSet(snapDir) shouldBe direct(b0)
        mem.addData(b1: _*)
        q.processAllAvailable()
        snapshotSet(snapDir) shouldBe direct(b0 ++ b1)
        mem.addData(b2: _*)
        q.processAllAvailable()
        snapshotSet(snapDir) shouldBe direct(b0 ++ b1 ++ b2)
      } finally q.stop()
    }

    it("a replayed batch is exactly-once: identical snapshot, no duplicate rows") {
      val dir = java.nio.file.Files.createTempDirectory("graft-scdc-retry").toString
      val snapDir = s"$dir/snap"
      StreamingCdc.processBatch(feed(b0), 0L, snapDir, Seq("k"), Seq("v"), "is_delete")
      StreamingCdc.processBatch(feed(b1), 1L, snapDir, Seq("k"), Seq("v"), "is_delete")
      val first = snapshotSet(snapDir)
      // crash-after-commit retry: the same batch id replays
      StreamingCdc.processBatch(feed(b1), 1L, snapDir, Seq("k"), Seq("v"), "is_delete")
      snapshotSet(snapDir) shouldBe first
      // and version=1 holds exactly one copy of each key
      val v1 = spark.read.parquet(snapDir)
        .filter(org.apache.spark.sql.functions.col(StreamingCdc.VersionCol) === 1L)
      v1.count() shouldBe first.size.toLong
      first shouldBe direct(b0 ++ b1)
    }

    it("time-travels: AS OF version v returns exactly the state after batch v") {
      import org.apache.spark.sql.types._
      val dir = java.nio.file.Files.createTempDirectory("graft-scdc-tt").toString
      val snapDir = s"$dir/snap"
      for ((b, i) <- Seq(b0, b1, b2).zipWithIndex)
        StreamingCdc.processBatch(feed(b), i.toLong, snapDir, Seq("k"), Seq("v"), "is_delete")
      val schema = StructType(Seq(StructField("k", LongType),
        StructField("v", LongType), StructField("payload", StringType)))
      def asOf(ver: Long) = StreamingCdc.snapshotAsOf(spark, snapDir, schema, ver)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      asOf(0L) shouldBe direct(b0)
      asOf(1L) shouldBe direct(b0 ++ b1)
      asOf(2L) shouldBe direct(b0 ++ b1 ++ b2)
    }

    it("pruning old versions keeps the latest state serving and folding") {
      import org.apache.spark.sql.types._
      val dir = java.nio.file.Files.createTempDirectory("graft-scdc-prune").toString
      val snapDir = s"$dir/snap"
      for ((b, i) <- Seq(b0, b1, b2).zipWithIndex)
        StreamingCdc.processBatch(feed(b), i.toLong, snapDir, Seq("k"), Seq("v"), "is_delete")
      val schema = StructType(Seq(StructField("k", LongType),
        StructField("v", LongType), StructField("payload", StringType)))
      val doomed = StreamingCdc.pruneVersions(spark, snapDir, schema, keepLatest = 1)
      doomed shouldBe Seq(0L, 1L)
      snapshotSet(snapDir) shouldBe direct(b0 ++ b1 ++ b2)
      // and the NEXT batch still folds onto the retained latest version
      StreamingCdc.processBatch(feed(Seq((9L, 9L, "nine", false))), 3L,
        snapDir, Seq("k"), Seq("v"), "is_delete")
      snapshotSet(snapDir) shouldBe
        direct(b0 ++ b1 ++ b2 ++ Seq((9L, 9L, "nine", false)))
    }

    it("batch 0 folds onto a missing snapshot dir as empty state") {
      val dir = java.nio.file.Files.createTempDirectory("graft-scdc-b0").toString
      StreamingCdc.processBatch(
        feed(Seq((7L, 1L, "seven", false), (8L, 1L, "", true))),
        0L, s"$dir/snap", Seq("k"), Seq("v"), "is_delete")
      snapshotSet(s"$dir/snap") shouldBe Set((7L, 1L, "seven"))
    }
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.ops.Cdc

/** CDC snapshot maintenance: latest-wins compaction + incremental merge.
  * The load-bearing property is the maintenance invariant — folding batches
  * into a snapshot must be indistinguishable from recomputing the snapshot
  * from the full history.
  */
class CdcSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  // (key, version, payload, is_delete)
  private def feed(rows: Seq[(Long, Long, String, Boolean)]) =
    rows.toDF("k", "v", "payload", "is_delete")

  private val history = Seq(
    // key 1: plain upserts, latest should win
    (1L, 1L, "one-a", false), (1L, 3L, "one-c", false), (1L, 2L, "one-b", false),
    // key 2: upsert then tombstone — must vanish
    (2L, 1L, "two-a", false), (2L, 2L, "", true),
    // key 3: tombstone then REINSERT — must resurrect with the new payload
    (3L, 1L, "", true), (3L, 2L, "three-b", false),
    // key 4: only in the early half, untouched later — must pass through
    (4L, 1L, "four-a", false),
    // key 5: born in the late half
    (5L, 9L, "five-i", false),
    // key 6: alive early, tombstoned late — anti join must remove the base row
    (6L, 1L, "six-a", false), (6L, 8L, "", true))

  private def snap(rows: Seq[(Long, Long, String, Boolean)]) =
    Cdc.latestWins(feed(rows), Seq("k"), Seq("v"), "is_delete")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  it("latestWins keeps exactly the latest non-tombstone state per key") {
    snap(history) shouldBe Set(
      (1L, 3L, "one-c"), (3L, 2L, "three-b"), (4L, 1L, "four-a"), (5L, 9L, "five-i"))
  }

  it("incremental merge == direct recompute (the maintenance invariant)") {
    val (early, late) = history.partition(_._2 < 5L)
    val base = Cdc.latestWins(feed(early), Seq("k"), Seq("v"), "is_delete")
    val merged = Cdc.applyChanges(base, feed(late), Seq("k"), Seq("v"), "is_delete")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    merged shouldBe snap(history)
  }

  it("chained batch folds == direct recompute over the whole history") {
    val b1 = history.filter(_._2 < 2L)
    val b2 = history.filter(t => t._2 >= 2L && t._2 < 5L)
    val b3 = history.filter(_._2 >= 5L)
    val s1 = Cdc.latestWins(feed(b1), Seq("k"), Seq("v"), "is_delete")
    val s2 = Cdc.applyChanges(s1, feed(b2), Seq("k"), Seq("v"), "is_delete")
    val s3 = Cdc.applyChanges(s2, feed(b3), Seq("k"), Seq("v"), "is_delete")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    s3 shouldBe snap(history)
  }

  it("holds the maintenance invariant on seeded random histories with random batch cuts") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 6) {
      val n = 30 + rng.nextInt(120)
      val hist = (1 to n).map { v =>
        (rng.nextInt(12).toLong, v.toLong, s"p$v", rng.nextInt(4) == 0)
      }
      val cut1 = 1 + rng.nextInt(n)
      val cut2 = cut1 + rng.nextInt(n - cut1 + 1)
      val (b1, rest) = hist.partition(_._2 <= cut1)
      val (b2, b3) = rest.partition(_._2 <= cut2)
      var snapDf = Cdc.latestWins(feed(b1), Seq("k"), Seq("v"), "is_delete")
      for (b <- Seq(b2, b3) if b.nonEmpty)
        snapDf = Cdc.applyChanges(snapDf, feed(b), Seq("k"), Seq("v"), "is_delete")
      val folded = snapDf.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      folded shouldBe snap(hist)
    }
  }

  it("a stale/late batch never regresses a newer snapshot row (version guard)") {
    val base = Cdc.latestWins(feed(Seq((1L, 5L, "newest", false))), Seq("k"), Seq("v"), "is_delete")
    // stale upsert AND stale tombstone both lose to the base's version
    val out1 = Cdc.applyChanges(base, feed(Seq((1L, 3L, "stale", false))),
      Seq("k"), Seq("v"), "is_delete")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    out1 shouldBe Set((1L, 5L, "newest"))
    val out2 = Cdc.applyChanges(base, feed(Seq((1L, 3L, "", true))),
      Seq("k"), Seq("v"), "is_delete")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    out2 shouldBe Set((1L, 5L, "newest"))
  }

  it("a batch whose latest change per key is a tombstone deletes even fresh base keys") {
    val base = Cdc.latestWins(feed(Seq((7L, 1L, "seven", false))), Seq("k"), Seq("v"), "is_delete")
    val out = Cdc.applyChanges(
      base, feed(Seq((7L, 2L, "seven-b", false), (7L, 3L, "", true))),
      Seq("k"), Seq("v"), "is_delete")
    out.count() shouldBe 0L
  }

  describe("scd2History") {
    it("chains validity intervals; tombstones close without opening; open row is current") {
      val rows = Cdc.scd2History(feed(Seq(
        // key 1: v1 → v3 → v5, still live: two closed intervals + one open
        (1L, 1L, "one-a", false), (1L, 3L, "one-b", false), (1L, 5L, "one-c", false),
        // key 2: upsert then tombstone: ONE interval closed BY the
        // tombstone's version, no current row
        (2L, 1L, "two-a", false), (2L, 2L, "", true),
        // key 3: delete then re-create: the re-created row is current
        (3L, 1L, "three-a", false), (3L, 2L, "", true), (3L, 3L, "three-b", false))),
        Seq("k"), Seq("v"), "is_delete")
        .collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("v"),
          Option(r.getAs[java.lang.Long]("valid_to_v")).map(_.toLong),
          r.getAs[Boolean]("is_current"))).toSet
      rows shouldBe Set(
        (1L, 1L, Some(3L), false), (1L, 3L, Some(5L), false), (1L, 5L, None, true),
        (2L, 1L, Some(2L), false),
        (3L, 1L, Some(2L), false), (3L, 3L, None, true))
      // the current rows are exactly latestWins' snapshot
      val snapKeys = Cdc.latestWins(feed(Seq(
        (1L, 1L, "one-a", false), (1L, 3L, "one-b", false), (1L, 5L, "one-c", false),
        (2L, 1L, "two-a", false), (2L, 2L, "", true),
        (3L, 1L, "three-a", false), (3L, 2L, "", true), (3L, 3L, "three-b", false))),
        Seq("k"), Seq("v"), "is_delete")
        .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("v"))).toSet
      rows.collect { case (k, v, _, true) => (k, v) } shouldBe snapKeys
    }
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.ops.{Dedup, Materialize}
import graft.ops.Materialize.EagerOps

/** The module-wide eager-materialization seam: by default every iterative
  * loop truncates lineage with executor-local `localCheckpoint` (the
  * single-JVM bench contract); when a cluster caller sets
  * `spark.graft.checkpointDir`, the SAME code paths switch to RELIABLE
  * `checkpoint` — fault-tolerant blocks in a real directory — with
  * identical results. Pinned here by running the exact-CC fixpoint (the
  * deepest iterative consumer) both ways.
  */
class MaterializeSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private def pairs = Seq(
    // two components: a 4-chain and a triangle, plus an isolated pair
    (1L, 2L), (2L, 3L), (3L, 4L),
    (10L, 11L), (11L, 12L), (10L, 12L),
    (20L, 21L)).toDF("doc_a", "doc_b")

  describe("Materialize.eagerCkpt") {
    it("defaults to localCheckpoint; with spark.graft.checkpointDir set it writes RELIABLE checkpoints, same results") {
      val expected = Dedup.nearDupComponentsExact(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      expected should contain(4L -> 1L) // chain collapses to min id
      expected should contain(12L -> 10L)

      val dir = java.nio.file.Files.createTempDirectory("graft-relckpt").toString
      spark.conf.set(Materialize.CheckpointDirKey, dir)
      try {
        val reliable = Dedup.nearDupComponentsExact(pairs)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        reliable shouldBe expected
        // the reliable path really ran: the checkpoint dir holds RDD data
        val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
          .filter(java.nio.file.Files.isRegularFile(_)).count()
        files should be > 0L
      } finally spark.conf.unset(Materialize.CheckpointDirKey)

      // and with the conf cleared the seam is back on the local path
      // (no new files appear under the dir)
      val before = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      Seq((1L, 2L)).toDF("doc_a", "doc_b").eagerCkpt.count() shouldBe 1L
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count() shouldBe before
    }
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame

/** Module-wide EAGER MATERIALIZATION convention — every iterative loop
  * (CC fixpoint, LPA/PageRank/k-core rounds, beam search) and every
  * own-the-cache helper truncates lineage through this one seam instead
  * of calling `localCheckpoint(true)` directly.
  *
  * Default (no config): `localCheckpoint(true)` — executor-local blocks,
  * zero I/O beyond memory/disk spill, the right trade for the single-JVM
  * bench/driver contract. NOT fault-tolerant: on a real cluster an
  * executor loss makes the frame unrecoverable (job failure instead of
  * lineage recompute).
  *
  * Cluster callers set `spark.graft.checkpointDir` (a reliable
  * filesystem path — HDFS/S3A in production) and every materialization
  * in the library switches to RELIABLE `checkpoint(eager = true)`:
  * blocks live in the checkpoint dir, survive executor loss, and the
  * fixpoints become restartable mid-iteration. The session's Spark-level
  * checkpoint dir is set lazily from the conf on first use (and never
  * overridden if the caller already set one). The frame is persisted
  * around the checkpoint so the write job reads the just-computed
  * blocks instead of re-running the lineage (RDD reliable checkpointing
  * otherwise recomputes in its second job).
  *
  * FILE LIFECYCLE on the reliable path: Spark only deletes reliable
  * checkpoint files at ContextCleaner GC time when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (a
  * SparkContext-construction-time setting, default false) — cluster
  * callers enable it, or point `spark.graft.checkpointDir` at a
  * per-run directory they delete on exit. Unlike localCheckpoint
  * blocks (always ContextCleaner-managed), leaked reliable files
  * otherwise accumulate one directory per materialization.
  *
  * The conf is read per call — it is a runtime (`spark.conf.set`)
  * switch, so one session can run the bench path and a
  * cluster-semantics spec side by side.
  */
object Materialize {

  /** Runtime conf key naming the reliable checkpoint directory. */
  val CheckpointDirKey = "spark.graft.checkpointDir"

  /** DIAGNOSTIC-ONLY runtime switch: `true` makes eagerCkpt a pass-through
    * so `explain` shows the complete declarative tree of an iterative
    * query instead of a post-checkpoint RDD scan (PlanDump sets it from
    * SPARK_GRAFT_NOCKPT). Never set it for real execution — loops rely on
    * the truncation for both lineage depth and read-before-overwrite
    * ordering.
    */
  val DisableCkptKey = "spark.graft.disableCkpt"

  implicit class EagerOps(private val df: DataFrame) extends AnyVal {

    /** Eagerly materialize `df` and truncate its lineage: reliable
      * `checkpoint` when `spark.graft.checkpointDir` is set, else
      * `localCheckpoint`. Drop-in for `localCheckpoint(true)`.
      */
    def eagerCkpt: DataFrame = {
      val spark = df.sparkSession
      if (spark.conf.getOption(DisableCkptKey).contains("true")) return df
      spark.conf.getOption(CheckpointDirKey) match {
        case Some(dir) if dir.nonEmpty =>
          val sc = spark.sparkContext
          if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
          df.persist()
          try df.checkpoint(eager = true)
          finally { df.unpersist(): Unit }
        case _ => df.localCheckpoint(eager = true)
      }
    }
  }
}

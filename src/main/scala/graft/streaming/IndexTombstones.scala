package graft.streaming

import graft.ops.Materialize.EagerOps
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.streaming.StreamingWrites.GuardedWrites

/** RIGHT-TO-BE-FORGOTTEN support for the served index family: physically
  * remove every row keyed by a tombstoned id from a partitioned index via
  * RECOMPUTE-AFFECTED-PARTITIONS copy-on-write — the StreamingGovernance
  * pattern applied to storage instead of state.
  *
  * Mechanics per scrub:
  *   1. affected partitions = the distinct partition keys of index rows
  *      matching a tombstone (one semi-join; at scale the tombstone side
  *      is a broadcast and parquet min/max + bloom on the key skip most
  *      files, so the discovery scan reads metadata, not the corpus);
  *   2. survivors of those partitions are materialized EAGERLY
  *      (localCheckpoint) — the read must complete before the overwrite
  *      clobbers its own input files;
  *   3. dynamic partition overwrite rewrites exactly the affected
  *      partitions that still have rows; partitions whose every row was
  *      tombstoned are dropped at the filesystem (dynamic overwrite can
  *      only replace partitions PRESENT in the written frame — an emptied
  *      partition would otherwise silently keep its old files).
  *
  * Delivery: IDEMPOTENT, hence exactly-once under the family's replay
  * model — removal commutes with itself; a retry recomputes "affected"
  * from current state, so partitions the first attempt already rewrote
  * are simply no longer affected, and half-deleted directories are
  * re-found because their tombstoned rows still match. No ordering
  * between the rewrite and the directory drops matters.
  *
  * The driver-side `collect()`s touch PARTITION KEYS only (bounded by the
  * number of partitions a delete batch touches — takedown feeds are tiny
  * relative to the corpus), never index rows.
  *
  * Partition-key values must render into hive directory names verbatim —
  * true for the numeric batch/version/cell keys every graft index uses.
  */
object IndexTombstones {

  /** Remove from the index under `dir` (partitioned by `partCols`, read
    * back WITH those columns as `index`) every row whose `keyCols` match a
    * row of `tombs`. No-op when nothing matches. `auxCols` names derived
    * helper columns the caller added to `index` for the key match (e.g. a
    * chunk id's parent document) — they are dropped before the rewrite so
    * the on-disk schema never changes.
    */
  def scrub(
      index: DataFrame,
      tombs: DataFrame,
      keyCols: Seq[String],
      dir: String,
      partCols: Seq[String],
      auxCols: Seq[String] = Nil): Unit = {
    val spark = index.sparkSession
    val affected = index.join(tombs, keyCols, "left_semi")
      .select(partCols.map(col): _*).distinct()
      .collect().map(_.toSeq)
    if (affected.isEmpty) return
    val affectedDf = spark.createDataFrame(
      spark.sparkContext.parallelize(affected.map(Row.fromSeq).toSeq, 1),
      StructType(partCols.map(c => index.schema(c))))
    val survivors = index.join(affectedDf, partCols, "left_semi")
      .join(tombs, keyCols, "left_anti")
      .drop(auxCols: _*)
      .eagerCkpt
    if (!survivors.isEmpty) survivors.overwritePartitions(dir, partCols: _*)
    val survived = survivors
      .select(partCols.map(col): _*).distinct()
      .collect().map(_.toSeq).toSet
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    affected.filterNot(survived).foreach { k =>
      val sub = partCols.zip(k).map { case (c, v) => s"$c=$v" }.mkString("/")
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$sub"), true): Unit
    }
    spark.catalog.refreshByPath(dir)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture snapshot maintenance — the MERGE INTO shape every
  * incrementally-maintained corpus needs (document re-crawls, label fixes,
  * takedown/tombstone requests), expressed with built-in operators only.
  *
  * A change feed carries upserts and tombstones for keyed rows, versioned
  * by one or more ordering columns (lexicographic; e.g. (ts, event_id)).
  * `latestWins` compacts a feed to latest-state-per-key; `applyChanges`
  * folds a compacted batch into an existing snapshot.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - the per-key ranking window runs over the CHANGE BATCH only — its
  *    sort cost follows |changes|, never |snapshot|;
  *  - the snapshot is touched by exactly one anti equi-join on the key
  *    (drop every key the batch mentions) plus a union — no snapshot-side
  *    sort, no snapshot-side window; AQE broadcasts the compacted batch
  *    side when it is small (the common CDC case);
  *  - a key whose LATEST change is a tombstone disappears (the anti join
  *    removes it from the base; the tombstone filter keeps it out of the
  *    upsert side) — delete-then-reinsert within one batch resurrects it,
  *    because only the latest change per key decides.
  *
  * Maintenance invariant (this is the oracle's contract):
  * `applyChanges(latestWins(changes < t), changes >= t) ==
  *  latestWins(all changes)` — the incremental path must be
  * indistinguishable from recomputing the snapshot from scratch.
  */
object Cdc {

  /** Plan note (verified via explain): the row_number()=1 filter triggers
    * Spark's WindowGroupLimit pushdown — a partial per-key top-1 runs
    * BEFORE the exchange, so the shuffle carries at most one row per
    * (key, partition), not the whole change batch.
    */
  private def rankLatest(
      changes: DataFrame, keyCols: Seq[String], versionCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(versionCols.map(c => col(c).desc): _*)
    changes.withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .drop("graft_rn")
  }

  /** Latest state per key from a change feed; keys whose latest change is
    * a tombstone (`deleteCol` true) are dropped. Output schema = input
    * schema minus `deleteCol`.
    */
  def latestWins(
      changes: DataFrame,
      keyCols: Seq[String],
      versionCols: Seq[String],
      deleteCol: String): DataFrame =
    rankLatest(changes, keyCols, versionCols)
      .filter(!col(deleteCol))
      .drop(deleteCol)

  /** Fold a change batch into a snapshot (MERGE INTO): for every key the
    * batch mentions, the VERSION-WISE latest of {current base row, batch
    * changes} wins — so a late/stale batch (replayed from an old offset,
    * or an out-of-order upstream) can never regress a newer snapshot row;
    * all untouched base rows pass through. `base` must have the schema
    * `latestWins` produces (changes minus `deleteCol`).
    *
    * Mechanically: base rows of touched keys re-enter the ranking as
    * non-tombstone "changes" (an equi-join on the key extracts them — the
    * snapshot's single key-shuffle), and the union ranks per key exactly
    * like `latestWins`. The ranking window still sees only touched keys'
    * rows: |batch| + |touched base| — batch-sized, never snapshot-sized.
    *
    * Known limit (standard CDC tombstone-retention tradeoff): a DROPPED
    * key's tombstone version is not retained in the snapshot, so a stale
    * upsert arriving AFTER the delete was applied resurrects the key.
    * Guarding that case needs a tombstone-retention window (Kafka
    * compaction's delete.retention.ms) — orthogonal to this fold's shape.
    */
  /** Type-2 slowly-changing-dimension history from a change feed: every
    * non-tombstone change becomes a VERSION ROW whose validity interval
    * runs from its own version to the NEXT change of the same key (any
    * kind — a newer upsert supersedes, a tombstone closes); the open
    * interval (no later change, not deleted) is the current row. The
    * companion of `latestWins` for consumers that need AS-OF-any-version
    * reads instead of only the latest snapshot: point-in-time dimension
    * joins, training-data reproducibility audits.
    *
    * Scale: ONE per-key window over the change feed (all lead()s share the
    * window spec, so Spark runs a single Window operator; sort cost
    * follows |changes|), zero joins, no snapshot touched.
    */
  def scd2History(
      changes: DataFrame,
      keyCols: Seq[String],
      versionCols: Seq[String],
      deleteCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(versionCols.map(c => col(c).asc): _*)
    val withNext = versionCols.foldLeft(changes) { (df, c) =>
      df.withColumn(s"valid_to_$c", lead(col(c), 1).over(w))
    }
    withNext
      .filter(!col(deleteCol))
      .withColumn("is_current", col(s"valid_to_${versionCols.head}").isNull)
      .drop(deleteCol)
  }

  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      versionCols: Seq[String],
      deleteCol: String): DataFrame = {
    val touched = changes.select(keyCols.map(col): _*).distinct()
    val baseTouched = base.join(touched, keyCols, "left_semi")
      .withColumn(deleteCol, lit(false))
    val merged = latestWins(
      changes.unionByName(baseTouched), keyCols, versionCols, deleteCol)
    base.join(touched, keyCols, "left_anti")
      .unionByName(merged)
  }
}

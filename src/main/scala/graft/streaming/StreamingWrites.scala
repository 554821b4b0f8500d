package graft.streaming

import org.apache.spark.sql.DataFrame

/** The one write primitive every streaming fold's state/sink tables share:
  * dynamic-partition-overwrite keyed by the batch/version column (so a
  * crash-retry REPLACES its own first attempt — the family's exactly-once
  * mechanism) followed by a `refreshByPath` on the target directory.
  *
  * The refresh is load-bearing, not hygiene: Spark's shared FileStatusCache
  * retains the directory listing from any EARLIER read in the same JVM, so
  * after a retry rewrites a partition, a later read would otherwise resolve
  * the first attempt's vanished files and fail mid-scan. Centralizing the
  * write guarantees no fold can reintroduce the hazard by forgetting the
  * refresh (it shipped three times before this helper existed).
  */
object StreamingWrites {

  implicit class GuardedWrites(private val df: DataFrame) extends AnyVal {
    /** Write `df` under `dir` partitioned by `partCols`, overwriting only
      * the partitions this frame carries, then invalidate the cached file
      * listing for `dir`.
      */
    def overwritePartitions(dir: String, partCols: String*): Unit = {
      df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCols: _*)
        .parquet(dir)
      df.sparkSession.catalog.refreshByPath(dir)
    }
  }
}

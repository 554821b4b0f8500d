package graft.ops

import graft.ops.Materialize.EagerOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-clustering layout: Z-order (Morton) interleaving.
  *
  * A single-column sort gives parquet min/max pruning on ONE predicate
  * column only; interleaving the bits of two dimensions into one sort key
  * keeps rows that are close in BOTH dimensions close on disk, so a 2-D box
  * predicate prunes row groups on both columns at once (the Delta/Iceberg
  * `ZORDER BY` layout, here as plain Spark expressions). At 100 TB the
  * layout decides whether a selective 2-D probe reads gigabytes or the
  * whole corpus — pruning is a storage-layout property, not a query
  * property.
  *
  * The z-value is a pure bitwise projection (shifts/ands/adds — all
  * codegen'd built-ins, no UDF), so computing it costs one narrow pass and
  * the clustering write is one range-partitioned sort, the same shuffle any
  * sorted write pays.
  */
object Layout {

  /** Bits taken from each coordinate for the interleave (16+16 → a 32-bit
    * z-value; coordinates are masked to this width first).
    */
  val ZBits = 16

  /** Morton z-value of two non-negative integer coordinates: bit i of `x`
    * lands at even position 2i, bit i of `y` at odd position 2i+1. Unrolled
    * to `bits` add terms — a constant-folded expression tree the whole-stage
    * codegen compiles to straight-line shifts/masks.
    */
  def zValue(x: Column, y: Column, bits: Int = ZBits): Column = {
    require(bits >= 1 && bits <= 31, s"zValue bits=$bits out of range [1,31]")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The corpus re-clustered for 2-D locality: range-partition on the
    * z-value (so partition file boundaries follow the space-filling curve)
    * and sort within each partition. Written as parquet, every row group's
    * (x, y) min/max spans a small curve segment — the pruning measured in
    * ParquetLayoutSpec.
    */
  def zorderCluster(
      df: DataFrame, x: Column, y: Column,
      numParts: Int, bits: Int = ZBits): DataFrame = {
    val z = zValue(x, y, bits).as("z")
    df.withColumn("z", z)
      .repartitionByRange(numParts, col("z"))
      .sortWithinPartitions(col("z"))
  }

  /** Small-file compaction: re-emit a fragmented table as
    * ceil(rows / targetRowsPerFile) files, optionally re-establishing a
    * sort order so min/max row-group pruning survives the rewrite. The
    * storage-hygiene pass every long-lived 100 TB table needs: streaming
    * ingest and per-batch overwrites (StreamingDedup/StreamingAnnIngest
    * write one partition per micro-batch) accrete thousands of KB-sized
    * files, and at scan time each file costs a task launch + footer read —
    * compaction trades one bounded rewrite for every future scan's
    * task-count.
    *
    * The file count derives from a COUNT over the input (one cheap
    * metadata-ish agg) rather than a guessed partition number, so the
    * target size holds regardless of input fragmentation. With a sort key
    * the rewrite is one range shuffle (identical cost shape to
    * zorderCluster); without, a round-robin repartition.
    */
  def compact(
      df: DataFrame,
      targetRowsPerFile: Long,
      orderBy: Seq[Column] = Nil): DataFrame = {
    require(targetRowsPerFile >= 1, s"compact: targetRowsPerFile=$targetRowsPerFile must be >= 1")
    val n = math.max(1L, (df.count() + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    if (orderBy.nonEmpty)
      df.repartitionByRange(n, orderBy: _*).sortWithinPartitions(orderBy: _*)
    else df.repartition(n)
  }

  /** Maintenance compaction for the batch_id-partitioned streaming sinks
    * (StreamingDedup / StreamingAnnIngest / StreamingCuration corpora):
    * consolidate all partitions STRICTLY BEFORE `upToBatchId` into one
    * `compacted=true` partition, leaving newer batch partitions — which a
    * crash-retry of an in-flight batch may still dynamically overwrite —
    * untouched. Exactly-once batch overwrites and compaction compose
    * because they never own the same partition: a replay of batch b
    * rewrites `batch_id=b`, and only batches older than the stream's
    * committed watermark are ever folded into the archive.
    *
    * The consolidated rows land under `batch_id = -1` (the archive
    * partition, merged with any previous archive), so downstream readers
    * keep a single scan path and the retry-exclusion filter
    * (`batch_id =!= currentBatch`) keeps excluding exactly what it must.
    */
  def compactBatchSink(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      upToBatchId: Long,
      targetRowsPerFile: Long,
      orderBy: Seq[Column] = Nil): Unit = {
    val all = spark.read.parquet(dir)
    val old = all.filter(col("batch_id") < upToBatchId && col("batch_id") =!= -1L)
    val archive = all.filter(col("batch_id") === -1L)
    // eager localCheckpoint cuts lineage to the input files: the archive
    // write overwrites a partition the plan would otherwise still be
    // reading (and the folded source partitions are deleted right after)
    val merged = compact(archive.unionByName(old).drop("batch_id"), targetRowsPerFile, orderBy)
      .withColumn("batch_id", lit(-1L))
      .eagerCkpt
    // swap: dynamic overwrite replaces ONLY the batch_id=-1 partition; the
    // folded-in source partitions are removed after the write commits
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    // partition-directory values read back with inferred (possibly INT)
    // type — normalize before building the paths to delete
    old.select(col("batch_id").cast("long")).distinct().collect()
      .map(_.getLong(0)).foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/batch_id=$b"), true)
      }
  }

  /** Oracle-checkable z-value projection over `events`: x = low 16 bits of
    * user_id, y = floor(value) masked to 16 bits (both via pmod so the
    * mapping is total on any input range).
    */
  def zorderEvents(events: DataFrame): DataFrame = {
    val x = pmod(col("user_id"), lit(1L << ZBits))
    val y = pmod(floor(col("value")).cast("long"), lit(1L << ZBits))
    events.select(col("event_id"), x.as("zx"), y.as("zy"))
      .select(col("event_id"), col("zx"), col("zy"),
        zValue(col("zx"), col("zy")).as("zval"))
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

/** Partitioned-parquet layout + pruning — the storage-side half of the
  * 100 TB story: a pipeline that writes hive-partitioned output lets every
  * downstream query skip whole directories. Verifies the layout on disk,
  * that a partition filter prunes at planning time (partition count, not a
  * row filter), and that a non-partition filter still pushes down to the
  * scan.
  */
class ParquetLayoutSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  describe("hive-partitioned write + partition pruning") {
    it("writes one directory per key and prunes non-matching partitions at plan time") {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
      val df = (1 to 3000).map { i =>
        (i.toLong, Seq("click", "view", "purchase", "signup", "error")(i % 5), i % 97)
      }.toDF("event_id", "event_type", "score")

      df.write.partitionBy("event_type").mode("overwrite").parquet(dir)

      // layout: one hive directory per partition value
      new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("event_type="))
        .toSet shouldBe Set("click", "view", "purchase", "signup", "error")
        .map("event_type=" + _)

      val pruned = spark.read.parquet(dir).filter($"event_type" === "click")
      pruned.count() shouldBe 600

      val formatted = pruned.queryExecution.executedPlan.toString
      // partition pruning happened in the scan's partition filters —
      // the predicate is NOT evaluated per row
      val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
      scan should include("PartitionFilters")
      scan should include("event_type")
      // and the scan reads only the one matching directory
      val scannedParts = pruned.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }
      scannedParts shouldBe Seq(1)

      // a non-partition predicate pushes down to the parquet reader instead
      val rowFiltered = spark.read.parquet(dir).filter($"score" > 90)
      val scan2 = rowFiltered.queryExecution.executedPlan.collectLeaves().head.toString
      scan2 should include("PushedFilters: [IsNotNull(score), GreaterThan(score,90)]")
    }
  }

  describe("output file-count control") {
    it("maxRecordsPerFile bounds file sizes; coalesce(1) compacts to one file") {
      import spark.implicits._
      val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")

      val split = java.nio.file.Files.createTempDirectory("graft-split").toString
      df.repartition(1).write.option("maxRecordsPerFile", 100)
        .mode("overwrite").parquet(split)
      val parts = new java.io.File(split).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      parts.length shouldBe 10 // 1000 rows / 100-per-file cap
      parts.foreach { f =>
        spark.read.parquet(f.getPath).count() should be <= 100L
      }

      val compact = java.nio.file.Files.createTempDirectory("graft-compact").toString
      df.coalesce(1).write.mode("overwrite").parquet(compact)
      new java.io.File(compact).listFiles()
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")) shouldBe 1
      spark.read.parquet(compact).count() shouldBe 1000L
    }
  }

  describe("z-order clustering vs single-column sort") {
    it("a 2-D box predicate skips far more data on the z-clustered layout") {
      import spark.implicits._
      import graft.ops.Layout
      // full 256×256 grid, one row per (x, y): 65536 rows, 8 bits/coordinate
      val bits = 8
      val grid = spark.range(0, 1L << (2 * bits)).select(
        col("id"),
        (col("id") % 256).as("x"),
        (col("id") / 256).cast("long").as("y"))

      def write(df: org.apache.spark.sql.DataFrame): String = {
        val dir = java.nio.file.Files.createTempDirectory("graft-z").toString
        // one small row group per file → min/max pruning granularity = 1024
        // rows, standing in for the per-row-group stats a 100 TB table has
        df.write.option("maxRecordsPerFile", 1024).mode("overwrite").parquet(dir)
        dir
      }
      val xSorted = write(grid.repartitionByRange(64, col("x"))
        .sortWithinPartitions(col("x")))
      val zSorted = write(Layout.zorderCluster(grid, col("x"), col("y"), 64, bits))

      // 32×32 box = 1024 matching rows (1/64 of the grid) selective in BOTH dims
      def scannedRows(dir: String): Long = {
        val q = spark.read.parquet(dir)
          .filter(col("x").between(64, 95) && col("y").between(64, 95))
        // collect() drives THIS Dataset's queryExecution, so its scan
        // metrics are the ones populated (count() would plan a fresh one)
        q.collect().length shouldBe 1024 // correctness first: same answer on every layout
        q.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.metrics("numOutputRows").value
        }.sum
      }
      val viaX = scannedRows(xSorted)
      val viaZ = scannedRows(zSorted)
      info(s"rows surviving row-group pruning: x-sorted=$viaX z-clustered=$viaZ")
      // x-sort prunes on x only → reads every row group of the x-slice
      // (all y values); the z-layout bounds BOTH coordinates per row group.
      // Margin note: BOTH layouts go through repartitionByRange, whose
      // boundary SAMPLING is seeded per execution — row-group contents (and
      // so pruning counts) wobble a few percent run to run; 0.65 keeps the
      // dominance claim while absorbing that wobble (observed 0.49-0.55).
      viaZ.toDouble should be <= viaX.toDouble * 0.65
      // and the box itself is a small fraction of what the 1-D layout reads
      viaZ should be < 16384L // << the 65536-row corpus
    }
  }

  describe("schema evolution across parquet files") {
    it("mergeSchema unions columns; old files read the new column as null") {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
      // v1 writer: two columns
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.parquet(s"$dir/p=1")
      // v2 writer: adds a column (the additive evolution a long-lived
      // pipeline actually performs)
      Seq((3L, "c", 0.5), (4L, "d", 0.7)).toDF("id", "v", "score")
        .write.parquet(s"$dir/p=2")

      val merged = spark.read.option("mergeSchema", "true").parquet(dir)
      merged.schema.fieldNames.toSet shouldBe Set("id", "v", "score", "p")
      val rows = merged.select("id", "score").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      rows shouldBe Map(1L -> None, 2L -> None, 3L -> Some(0.5), 4L -> Some(0.7))
    }
  }

  describe("small-file compaction (Layout.compact)") {
    import graft.ops.Layout

    def parquetFiles(dir: String): Array[java.io.File] =
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

    it("rewrites a fragmented table to ceil(rows/target) files, data intact") {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
      // simulate per-batch ingest fragmentation: 40 files of 25 rows
      (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
        .repartition(40).write.parquet(s"$dir/frag")
      parquetFiles(s"$dir/frag").length shouldBe 40

      Layout.compact(spark.read.parquet(s"$dir/frag"), targetRowsPerFile = 250)
        .write.parquet(s"$dir/compacted")
      parquetFiles(s"$dir/compacted").length shouldBe 4
      spark.read.parquet(s"$dir/compacted").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap shouldBe
        (1 to 1000).map(i => i.toLong -> i * 2.0).toMap
    }

    it("folds committed batch partitions into the archive without touching in-flight ones") {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-sink-compact").toString
      def writeBatch(b: Long, ids: Range): Unit =
        ids.map(i => (i.toLong, s"d$i")).toDF("doc_id", "payload")
          .withColumn("batch_id", org.apache.spark.sql.functions.lit(b))
          .repartition(3) // simulate multi-task micro-batch output files
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(dir)
      writeBatch(0L, 0 until 100)
      writeBatch(1L, 100 until 200)
      writeBatch(2L, 200 until 300)
      writeBatch(3L, 300 until 400)

      Layout.compactBatchSink(spark, dir, upToBatchId = 3L, targetRowsPerFile = 300)

      val after = spark.read.parquet(dir)
      after.select(col("batch_id").cast("long")).distinct().collect()
        .map(_.getLong(0)).toSet shouldBe Set(-1L, 3L)
      after.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
        (0 until 400).map(_.toLong).toSet
      // 300 archived rows at 300/file = one file replaces 9 fragments
      parquetFiles(s"$dir/batch_id=-1").length shouldBe 1

      // the in-flight batch can still be exactly-once-replayed...
      writeBatch(3L, 300 until 400)
      // ...and a later compaction folds it into the existing archive
      Layout.compactBatchSink(spark, dir, upToBatchId = 4L, targetRowsPerFile = 300)
      val finalDf = spark.read.parquet(dir)
      finalDf.select(col("batch_id").cast("long")).distinct().collect()
        .map(_.getLong(0)).toSet shouldBe Set(-1L)
      finalDf.count() shouldBe 400L
    }

    it("with a sort key, restores contiguous min/max ranges for pruning") {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-compact-sort").toString
      // shuffled ids: every fragment spans the whole id range, so min/max
      // pruning on the fragmented layout is useless
      val rnd = new scala.util.Random(7)
      rnd.shuffle((1 to 1000).toList).map(i => (i.toLong, s"p$i"))
        .toDF("id", "payload").repartition(20).write.parquet(s"$dir/frag")

      Layout.compact(spark.read.parquet(s"$dir/frag"), 250, Seq(col("id")))
        .write.parquet(s"$dir/sorted")
      // each output file must cover a disjoint contiguous id range
      val ranges = parquetFiles(s"$dir/sorted").map { f =>
        val ids = spark.read.parquet(f.getAbsolutePath).select("id")
          .collect().map(_.getLong(0))
        (ids.min, ids.max)
      }.sortBy(_._1)
      ranges.length shouldBe 4
      ranges.sliding(2).foreach {
        case Array((_, hi), (lo, _)) => hi should be < lo
        case _ =>
      }
    }
  }
}

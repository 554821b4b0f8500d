package graft.streaming

import org.apache.spark.sql.{AnalysisException, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.ops.VectorOps
import graft.streaming.StreamingWrites.GuardedWrites

/** Structured-Streaming maintenance of the SPANN POSTING index — the
  * closure-replicated sibling of StreamingAnnIngest's one-row-per-vector
  * cell index: every micro-batch of arriving vectors is closure-assigned
  * against the FIXED quantizer (nearest cell always, boundary replicas
  * within eps, ≤ maxReplicas postings — the same projection
  * `VectorOps.spannAssign` makes inline), and the postings are appended
  * to a (cell, batch_id)-partitioned table that
  * `VectorOps.spannTopKFromIndex` serves single-probe queries from.
  *
  * Why a separate table rather than a flag on the main index: SPANN's
  * whole trade is storage replication — a vector physically lives in
  * every cell a nearby query might probe, so the serving scan stays one
  * posting-list read with partition pruning intact. Folding replicas
  * into the one-row-per-vector index would either break its uniqueness
  * contract (every other `*FromIndex` server would need de-dup) or force
  * a join at serve time (re-paying what replication pre-paid).
  *
  * Delivery: EXACTLY-ONCE across JVM-crash retries by the family
  * mechanism — closure assignment is a deterministic projection,
  * Structured Streaming pins batch contents in the checkpoint, and
  * dynamic partition overwrite keyed by batch_id makes a replayed batch
  * REPLACE its own (cell, batch_id) leaves exactly.
  *
  * Scale: per batch one literal-argmax-family projection (zero shuffle,
  * ≤ maxReplicas output rows per vector) + one partitioned write;
  * storage grows by the replication factor the eps knob controls
  * (`spannCellStats` is its audit), query cost does not.
  */
object StreamingSpannIngest {

  private val BatchCol = "batch_id"

  private val indexSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("cell", IntegerType),
    StructField("cv", ArrayType(DoubleType)),
    StructField("cn", DoubleType),
    StructField(BatchCol, LongType)))

  /** The accumulated posting index, or an empty same-shaped frame before
    * the first batch commits.
    */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame =
    try spark.read.schema(indexSchema).parquet(indexDir)
    catch {
      case _: AnalysisException =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], indexSchema)
    }

  /** One micro-batch: closure-assign against the fixed quantizer, write
    * the postings under this batch's partitions. Idempotent in `batchId`.
    */
  def processBatch(
      batch: DataFrame,
      batchId: Long,
      cents: DataFrame,
      indexDir: String,
      eps: Double = VectorOps.SpannEps,
      maxReplicas: Int = VectorOps.SpannMaxReplicas): Unit = {
    val centArr: Array[(Int, Seq[Double])] = cents.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    VectorOps.spannAssign(batch, centArr, eps, maxReplicas)
      .withColumn(BatchCol, lit(batchId))
      .overwritePartitions(indexDir, "cell", BatchCol)
  }

  /** TOMBSTONE propagation: remove EVERY posting of the given vec_ids —
    * closure replication means one vector owns rows in several cells, and
    * the copy-on-write scrub (IndexTombstones) finds them all through the
    * vec_id semi-join, so a forgotten vector disappears from every probe
    * path at once. Idempotent, hence exactly-once on replay.
    */
  def processDeletes(
      tombs: DataFrame, indexDir: String, excludeBatch: Option[Long] = None): Unit = {
    val spark = tombs.sparkSession
    val idx = excludeBatch.foldLeft(
      (try spark.read.schema(indexSchema).parquet(indexDir)
      catch { case _: AnalysisException => return })) {
      (d, b) => d.filter(col(BatchCol) =!= b)
    }
    IndexTombstones.scrub(
      idx, tombs.select(col("vec_id")).distinct(), Seq("vec_id"),
      indexDir, Seq("cell", BatchCol))
  }

  def start(
      vecStream: DataFrame,
      cents: DataFrame,
      indexDir: String,
      checkpointDir: String): StreamingQuery =
    vecStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, cents, indexDir)
      }
      .start()
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Dedup

/** Structured-Streaming lift of the batch-incremental dedup
  * (Dedup.incrementalDedup): every micro-batch of arriving documents is
  * deduplicated (a) against the PERSISTED history band index via one
  * equi-join probe and (b) within itself, then survivors are appended to
  * the corpus sink and the survivors' MinHash bands are appended to the
  * history index — keeping the invariant that history is internally dedup'd
  * without ever recomputing old signatures.
  *
  * Scale: per batch the history side is a parquet scan of the BAND INDEX
  * (in production a table bucketed by (band, bh) — DedupSpec proves that
  * probe ships no history-side exchange), never the corpus. State grows in
  * the index, not in streaming state, so there is nothing for watermarks to
  * bound — the pattern Kafka-fed ingest dedup uses when the dedup horizon
  * is "all of history", beyond dropDuplicates' watermark window.
  *
  * Delivery: parquet appends inside foreachBatch are at-least-once across
  * JVM-crash retries (the checkpoint tracks offsets per batch; a retried
  * batch re-appends). Exactly-once needs a transactional sink or
  * batchId-keyed idempotent overwrite — same caveat as the reference's JDBC
  * foreachBatch writer, documented rather than hidden.
  */
object StreamingDedup {

  def start(
      docsStream: DataFrame,
      historyDir: String,
      corpusDir: String,
      checkpointDir: String): StreamingQuery =
    docsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val history = spark.read.parquet(historyDir)
        val survivors = Dedup.incrementalDedup(batch, history)
        // two writes read the survivors: persist for the scope of this
        // batch, release before the next (no cross-batch cache leak)
        survivors.persist()
        try {
          survivors.write.mode("append").parquet(corpusDir)
          Dedup.minhashBands(Dedup.minhashSignatures(survivors))
            .write.mode("append").parquet(historyDir)
        } finally survivors.unpersist()
        ()
      }
      .start()
}

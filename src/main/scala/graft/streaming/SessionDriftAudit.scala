package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.TimeSeries

/** Session-length drift audit — the composition of the two online
  * monitors this pipeline already ships: `Sessionize` (stateful capped
  * sessionization) feeding `StreamingDrift` (per-micro-batch PSI against
  * a trusted reference). Session length is the canonical online health
  * signal of a sessionized product pipeline: bot floods, outage-induced
  * splits, and client clock bugs all move the length distribution before
  * they show up anywhere else, so the windowed-count pipeline the
  * reference runs graduates naturally into this audit.
  *
  * Wiring: closed sessions (gap / cap / timeout) are emitted by the
  * stateful operator as an append stream; each emitted micro-batch is
  * projected to (key, length-in-seconds) and handed to
  * `StreamingDrift.processBatch` — the SAME binning/smoothing/rollup code
  * as the batch `psi_drift` query, so the audit can never drift from the
  * offline monitor's math.
  *
  * Scale: session state is O(active keys) (the `Sessionize` contract);
  * the drift side adds one batch-local hash agg + a broadcast
  * reference join and keeps NO streaming state. Delivery is exactly-once
  * via the shared batch_id dynamic-partition overwrite.
  */
object SessionDriftAudit {

  /** Monitored key (one monitored series; a per-segment audit would key
    * by segment instead).
    */
  val SessionKey = "session_len"

  /** (k, len_s) projection of closed sessions — end-to-start span in
    * seconds. Shared by the reference build and the per-batch audit so
    * the two sides can never bin differently.
    */
  def sessionLengths(sessions: DataFrame): DataFrame =
    sessions.select(lit(SessionKey).as("k"),
      ((unix_millis(col("session_end")) - unix_millis(col("session_start")))
        .cast("double") / 1000.0).as("len_s"))

  /** Trusted reference histogram from a bounded (batch-mode)
    * sessionization of known-good traffic.
    */
  def referenceFromSessions(
      sessions: DataFrame,
      binWidth: Double = TimeSeries.PsiBinWidth,
      nBins: Int = TimeSeries.PsiBins): DataFrame =
    TimeSeries.referenceHistogram(
      sessionLengths(sessions), "k", "len_s", binWidth, nBins)

  /** Start the composed audit: events → stateful sessionization → PSI of
    * each micro-batch's emitted session lengths vs the reference →
    * exactly-once metrics sink ((k, n_ref, n_cur, psi) per batch).
    */
  def start(
      events: Dataset[Sessionize.SEvent],
      reference: DataFrame,
      metricsDir: String,
      checkpointDir: String,
      gapMs: Long,
      capMs: Long,
      binWidth: Double = TimeSeries.PsiBinWidth,
      nBins: Int = TimeSeries.PsiBins): StreamingQuery =
    Sessionize.sessionize(events, gapMs, capMs).toDF()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // stateful streams emit watermark-advance micro-batches with no
        // closed sessions; "no sessions closed" is not drift (all-smoothing
        // PSI against a populated reference would false-flag it), so empty
        // batches produce no metrics row
        if (!batch.isEmpty)
          StreamingDrift.processBatch(sessionLengths(batch), batchId, reference,
            metricsDir, "k", "len_s", binWidth, nBins)
      }
      .start()
}

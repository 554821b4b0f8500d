package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * arbitrary-state streaming tier for session policies the built-in
  * `session_window` cannot express. Policy here: a session closes when
  *  (a) the gap to the next event exceeds `gapMs`  (standard), OR
  *  (b) the session's total span would exceed `capMs` (duration cap —
  *      built-in session windows merge unboundedly under continuous
  *      activity; a capped session bounds both state size and the
  *      staleness of emitted analytics).
  *
  * Scale/state design: state per key is ONE fixed-size [[SessionAcc]] (no
  * event buffering — events fold into the accumulator as they arrive);
  * event-time timeout (watermark-driven) closes and evicts idle sessions,
  * so total state is O(active keys) and expires exactly like the built-in
  * operator's. Works identically over bounded input (batch mode runs each
  * group once with no timeouts, flushing every open session at the end —
  * used by the spec's golden checks).
  */
object Sessionize {

  /** One input event. */
  case class SEvent(user_id: String, ts: java.sql.Timestamp)

  /** Running accumulator for the key's current open session. */
  case class SessionAcc(startMs: Long, lastMs: Long, n: Long)

  /** One closed session. */
  case class Session(
      user_id: String,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long,
      closed_by: String) // "gap" | "cap" | "timeout" | "flush"

  def sessionize(
      events: Dataset[SEvent],
      gapMs: Long,
      capMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val isStreaming = events.isStreaming
    val src = if (isStreaming) events.withWatermark("ts", watermarkDelay) else events

    def close(user: String, acc: SessionAcc, why: String): Session =
      Session(user, new java.sql.Timestamp(acc.startMs),
        new java.sql.Timestamp(acc.lastMs + gapMs), acc.n, why)

    src.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: String, rows: Iterator[SEvent], state: GroupState[SessionAcc]) => {
          if (state.hasTimedOut) {
            // watermark passed last-event + gap: close and evict
            val out = state.getOption.map(close(user, _, "timeout"))
            state.remove()
            out.iterator
          } else {
            // fold this micro-batch's events (sorted: micro-batch iterators
            // carry no order guarantee) into the running accumulator,
            // closing sessions on gap/cap boundaries as they appear.
            //
            // Cross-batch ordering (streaming only): sorting is
            // per-micro-batch, so a late-but-within-watermark event that
            // belongs BEFORE the stored accumulator's events folds into the
            // open session where it belongs — session_start tracks
            // min(startMs, t), so the recorded bounds are exact for every
            // event that reaches the operator. Two residual, pinned
            // approximations (StatefulSessionSpec): the late event's gap
            // check runs against the stored lastMs rather than its true
            // in-order predecessor (it can MERGE two would-be sessions a
            // batch boundary separated, never split one), and the cap
            // check fires on forward extension only, so a backward
            // extension can leave a recorded span up to watermarkDelay past
            // capMs. Exact order-independence would require buffering every
            // open session's events until the watermark passes — O(events)
            // state instead of O(1). Batch mode sees each user's full
            // history in one sorted group, so batch results (and the
            // recursive-CTE oracle) are exact.
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            var acc = state.getOption.orNull
            rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              acc match {
                case null => acc = SessionAcc(t, t, 1)
                case a if t - a.lastMs > gapMs =>
                  closed += close(user, a, "gap"); acc = SessionAcc(t, t, 1)
                case a if t - a.startMs > capMs =>
                  closed += close(user, a, "cap"); acc = SessionAcc(t, t, 1)
                case a => acc = a.copy(
                  startMs = math.min(a.startMs, t),
                  lastMs = math.max(a.lastMs, t), n = a.n + 1)
              }
            }
            if (isStreaming) {
              state.update(acc)
              state.setTimeoutTimestamp(acc.lastMs + gapMs)
              closed.iterator
            } else {
              // bounded input: no later batch will come — flush the open tail
              state.remove()
              (closed :+ close(user, acc, "flush")).iterator
            }
          }
        })(Encoders.product[SessionAcc], Encoders.product[Session])
  }
}

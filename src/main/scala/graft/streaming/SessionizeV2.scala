package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

import Sessionize.{SEvent, Session, SessionAcc}

/** The Sessionize policy (gap + duration cap) re-implemented on Spark 4's
  * `transformWithState` — the arbitrary-state API that supersedes
  * `flatMapGroupsWithState`: typed state handles (`ValueState`) instead of
  * one opaque blob, explicit event-time TIMERS instead of a single
  * per-key timeout, and RocksDB-backed state by design. Same
  * fixed-size-accumulator state story as Sessionize (O(1) per key, no
  * event buffering); SessionizeV2Spec proves the two backends emit
  * identical sessions on the same trace, so callers can migrate APIs
  * without a semantic change.
  *
  * Timer discipline: one live timer per key at `lastMs + gapMs` — each
  * batch deletes the previous registration before arming the new one, and
  * the expiry handler closes + evicts the open session exactly like the
  * old API's `hasTimedOut` branch.
  */
object SessionizeV2 {

  private class SessionProcessor(gapMs: Long, capMs: Long)
      extends StatefulProcessor[String, SEvent, Session] {

    @transient private var acc: org.apache.spark.sql.streaming.ValueState[SessionAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[SessionAcc](
        "acc", Encoders.product[SessionAcc], TTLConfig.NONE)

    private def close(user: String, a: SessionAcc, why: String): Session =
      Session(user, new java.sql.Timestamp(a.startMs),
        new java.sql.Timestamp(a.lastMs + gapMs), a.n, why)

    override def handleInputRows(
        user: String, rows: Iterator[SEvent], timerValues: TimerValues): Iterator[Session] = {
      val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
      val prev = if (acc.exists()) acc.get() else null
      var a = prev
      // same fold as Sessionize (sorted within the batch; gap, then cap)
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        a match {
          case null => a = SessionAcc(t, t, 1)
          case x if t - x.lastMs > gapMs =>
            closed += close(user, x, "gap"); a = SessionAcc(t, t, 1)
          case x if t - x.startMs > capMs =>
            closed += close(user, x, "cap"); a = SessionAcc(t, t, 1)
          case x => a = x.copy(
            startMs = math.min(x.startMs, t),
            lastMs = math.max(x.lastMs, t), n = x.n + 1)
        }
      }
      if (prev != null) getHandle.deleteTimer(prev.lastMs + gapMs)
      acc.update(a)
      getHandle.registerTimer(a.lastMs + gapMs)
      closed.iterator
    }

    override def handleExpiredTimer(
        user: String, timerValues: TimerValues, expired: ExpiredTimerInfo): Iterator[Session] = {
      val out = if (acc.exists()) Iterator.single(close(user, acc.get(), "timeout"))
        else Iterator.empty
      acc.clear()
      out
    }
  }

  def sessionize(
      events: Dataset[SEvent],
      gapMs: Long,
      capMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs, capMs),
        TimeMode.EventTime(), OutputMode.Append(), Encoders.product[Session])
  }
}

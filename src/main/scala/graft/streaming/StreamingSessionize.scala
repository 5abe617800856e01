package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-sessionization — the stateful twin of
  * [[graft.operators.Sessionize.sessions]]. Where the batch form window-scans
  * each user's full history, the streaming form keeps ONE open-session cell
  * per user in the state store (O(active users), not O(events)) and closes
  * sessions two ways:
  *
  *  - in-stream: a new event from the same user arriving more than `gapMs`
  *    after the previous one closes the open session and starts the next;
  *  - by timeout: when the event-time watermark passes `last + gapMs`, the
  *    state store expires the cell and the final session is emitted — so a
  *    user who simply stops producing still gets their last session flushed,
  *    bounded by the watermark delay.
  *
  * Emitted rows are CLOSED sessions only (append mode), matching the batch
  * aggregation row-for-row once the stream is flushed. Events within a
  * micro-batch fold in (t, event_id) order — the batch window's exact sort —
  * so tied timestamps agree between the two forms.
  */
object StreamingSessionize {

  case class SessEvent(user_id: Long, ts: Timestamp, event_id: Long, value: Double)
  case class OpenSession(t_start: Long, t_last: Long, n: Long, sum: Double)
  case class ClosedSession(user_id: Long, t_start: Long, t_end: Long,
                           n_events: Long, session_value: Double)

  /** The one per-event transition both execution modes share: a gap beyond
    * `gapMs` closes the open session and starts a new one; otherwise the
    * event folds in (bounds may move DOWN for allowed-lateness arrivals —
    * the stream merges rather than retroactively splitting). Returns
    * (session to emit closed, the new open session). Sharing THIS is what
    * makes the replay gate pin the streaming semantics themselves.
    */
  private def advance(open: Option[OpenSession], t: Long, value: Double,
                      gapMs: Long): (Option[OpenSession], OpenSession) =
    open match {
      case Some(s) if t - s.t_last > gapMs =>
        (Some(s), OpenSession(t, t, 1L, value))
      case Some(s) =>
        (None, OpenSession(math.min(s.t_start, t), math.max(s.t_last, t),
                           s.n + 1, s.sum + value))
      case None =>
        (None, OpenSession(t, t, 1L, value))
    }

  def sessionizeStream(events: Dataset[SessEvent], gapMs: Long,
                       watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[OpenSession]) =>
          // NaN-safe 4 dp rounding: BigDecimal(NaN/Inf) would throw inside
          // the state function and kill the query; the batch twin's
          // round(sum, 4) just propagates non-finite values
          def r4(x: Double): Double =
            if (java.lang.Double.isFinite(x))
              BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            else x
          def closed(s: OpenSession): ClosedSession =
            ClosedSession(uid, s.t_start, s.t_last, s.n, r4(s.sum))
          val wm = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            // watermark passed last + gap: the open session is final
            val out = state.getOption.map(closed).toSeq
            state.remove()
            out.iterator
          } else {
            // flatMapGroupsWithState does NOT pre-filter late rows (unlike
            // the built-in windowed aggregations): drop events at/below the
            // watermark ourselves — processing one would also make the
            // setTimeoutTimestamp below throw (timeout < watermark)
            val sorted = it.filter(_.ts.getTime > wm)
              .toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            val out = Seq.newBuilder[ClosedSession]
            sorted.foreach { e =>
              val (toClose, next) = advance(open, e.ts.getTime, e.value, gapMs)
              toClose.foreach(s => out += closed(s))
              open = Some(next)
            }
            open.foreach { s =>
              state.update(s)
              // never set a timeout at/below the current watermark — Spark
              // rejects it (and the session would deserve an immediate
              // flush anyway, which the next batch's timeout sweep does)
              state.setTimeoutTimestamp(math.max(s.t_last + gapMs, wm + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Batch replay of the streaming session fold — [[advance]] applied to
    * each user's full history in `(t, event_id)` order, every session
    * emitted closed (a user's final open session flushes at the user
    * boundary; the stream flushes it by watermark timeout instead). This
    * is the gate surface for the streaming sessionizer: the DuckDB oracle
    * is the batch gap-session definition, so the hash compare pins the
    * stream's own transition function against it.
    *
    * `session_value` is the RAW sequential sum — rounding is presentation
    * and stays with the caller (the stream's `closed()` rounds at
    * emission; the gate rounds with Spark's `round`, the batch twin's
    * exact half-up — mixing a second BigDecimal path into the gate would
    * re-open the round-5 tie-rounding divergence).
    *
    * Scale: one shuffle by user, Spark's external sort, then an
    * O(1)-memory per-partition scan that resets at user boundaries —
    * never a user's history materialized in heap.
    */
  def sessionizeReplay(events: Dataset[SessEvent], gapMs: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .mapPartitions { it =>
        var uid = 0L
        var open: Option[OpenSession] = None
        def flush(): Iterator[ClosedSession] = {
          val out = open.map(s =>
            ClosedSession(uid, s.t_start, s.t_last, s.n, s.sum)).iterator
          open = None
          out
        }
        val main = it.flatMap { e =>
          val pre = if (open.isDefined && e.user_id != uid) flush() else Iterator.empty
          uid = e.user_id
          val (toClose, next) = advance(open, e.ts.getTime, e.value, gapMs)
          open = Some(next)
          pre ++ toClose.map(s =>
            ClosedSession(uid, s.t_start, s.t_last, s.n, s.sum)).iterator
        }
        main ++ flush() // by-name ++: runs only after `main` is exhausted
      }
  }
}

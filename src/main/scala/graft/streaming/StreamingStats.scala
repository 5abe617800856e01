package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming statistics over the live TS stream — the incremental
  * twins of the batch smoothers in [[graft.operators.TsOps]]. Where the
  * batch EWMA folds a trailing window per row, the streaming form keeps ONE
  * (level,) state cell per series in the state store and updates it per
  * micro-batch: O(series) state, not O(rows) — the shape that survives an
  * unbounded stream. Emitted rows carry the post-update smoothed value per
  * input event.
  */
object StreamingStats {

  case class Tick(series_id: String, t: Long, event_id: Long, value: Double)
  case class Smoothed(series_id: String, t: Long, event_id: Long,
                      value: Double, ewma: Double)
  /** Explicit state cell: "no state yet" is the absence of the cell, never a
    * sentinel value — a series whose first observation is NaN still
    * initializes (and NaN then propagates through the recursion exactly as
    * the batch fold would propagate it). */
  case class EwmaState(level: Double)

  /** Per-series streaming EWMA via `flatMapGroupsWithState`: state is the
    * running level (init: first observed value, matching the batch fold's
    * y0 = x0). Events within a micro-batch fold in (t, event_id) order —
    * the same tiebreak as [[graft.operators.TsOps.ewma]]'s window ordering —
    * so replays are deterministic and batch/stream agree on tied timestamps.
    */
  def ewmaStream(ticks: Dataset[Tick], alpha: Double): Dataset[Smoothed] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.series_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sid: String, it: Iterator[Tick], state: GroupState[EwmaState]) =>
          val sorted = it.toSeq.sortBy(x => (x.t, x.event_id))
          var level = state.getOption
          val out = sorted.map { x =>
            level = Some(level match {
              case None       => EwmaState(x.value)
              case Some(prev) => EwmaState(alpha * x.value + (1 - alpha) * prev.level)
            })
            Smoothed(sid, x.t, x.event_id, x.value, level.get.level)
          }
          level.foreach(state.update)
          out.iterator
      }
  }
}

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

  /** The one fold both execution modes share: ticks arrive sorted by
    * `(t, event_id)`, the level initializes from the first observation
    * (y0 = x0, matching the batch window fold) and recurses
    * `α·x + (1-α)·level`. Returning the final level lets the streaming
    * caller persist it across micro-batches; the batch replay starts from
    * `None` and discards it.
    */
  private def foldTicks(sid: String, sorted: Seq[Tick], init: Option[EwmaState],
                        alpha: Double): (Seq[Smoothed], Option[EwmaState]) = {
    var level = init
    val out = sorted.map { x =>
      level = Some(level match {
        case None       => EwmaState(x.value)
        case Some(prev) => EwmaState(alpha * x.value + (1 - alpha) * prev.level)
      })
      Smoothed(sid, x.t, x.event_id, x.value, level.get.level)
    }
    (out, level)
  }

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
          val (out, level) =
            foldTicks(sid, it.toSeq.sortBy(x => (x.t, x.event_id)), state.getOption, alpha)
          level.foreach(state.update)
          out.iterator
      }
  }

  /** Batch replay of [[ewmaStream]]'s exact fold — the whole history as one
    * "micro-batch" per series, state starting empty. This is the gate
    * surface for the streaming recursion (the obs_fanout pattern): the
    * DuckDB oracle reproduces the identical left fold via `list_reduce`
    * over the full `(t, event_id)`-ordered prefix, so the hash compare pins
    * the recursion the state store carries, not a reimplementation.
    *
    * Scale: one shuffle by series; each series folds serially (inherent —
    * level N depends on level N-1), series fold in parallel — the
    * documented many-series contract of every per-series recursion here.
    */
  def ewmaReplay(ticks: Dataset[Tick], alpha: Double): Dataset[Smoothed] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.series_id)
      .flatMapGroups { (sid: String, it: Iterator[Tick]) =>
        foldTicks(sid, it.toSeq.sortBy(x => (x.t, x.event_id)), None, alpha)._1.iterator
      }
  }
}

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

  case class Tick(series_id: String, t: Long, value: Double)
  case class Smoothed(series_id: String, t: Long, value: Double, ewma: Double)

  /** Per-series streaming EWMA via `flatMapGroupsWithState`: state is the
    * running level (init: first observed value, matching the batch fold's
    * y0 = x0). Events within a micro-batch fold in (t, value) order so
    * replays are deterministic.
    */
  def ewmaStream(ticks: Dataset[Tick], alpha: Double): Dataset[Smoothed] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.series_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sid: String, it: Iterator[Tick], state: GroupState[Double]) =>
          val sorted = it.toSeq.sortBy(x => (x.t, x.value))
          var level = state.getOption.getOrElse(Double.NaN)
          val out = sorted.map { x =>
            level = if (level.isNaN) x.value else alpha * x.value + (1 - alpha) * level
            Smoothed(sid, x.t, x.value, level)
          }
          if (!level.isNaN) state.update(level)
          out.iterator
      }
  }
}

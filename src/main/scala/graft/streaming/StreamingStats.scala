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

  /** The one recursion step both execution modes share: the level
    * initializes from the first observation (y0 = x0, matching the batch
    * window fold) and recurses `α·x + (1-α)·level`. Sharing THIS — the
    * arithmetic itself — is what makes the replay gate pin the streaming
    * semantics rather than a reimplementation.
    */
  private def step(prev: Option[EwmaState], x: Tick, alpha: Double): EwmaState =
    prev match {
      case None    => EwmaState(x.value)
      case Some(p) => EwmaState(alpha * x.value + (1 - alpha) * p.level)
    }

  /** [[step]] folded over one micro-batch of a series, sorted by
    * `(t, event_id)`; returns the rows plus the final level for the state
    * store. A micro-batch is bounded, so the Seq here is fine — the
    * unbounded-history concern belongs to [[ewmaReplay]], which streams.
    */
  private def foldTicks(sid: String, sorted: Seq[Tick], init: Option[EwmaState],
                        alpha: Double): (Seq[Smoothed], Option[EwmaState]) = {
    var level = init
    val out = sorted.map { x =>
      level = Some(step(level, x, alpha))
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

  /** Batch replay of [[ewmaStream]]'s exact recursion — [[step]] applied to
    * the whole history in `(t, event_id)` order, state starting empty. This
    * is the gate surface for the streaming recursion (the obs_fanout
    * pattern): the DuckDB oracle reproduces the identical left fold via
    * `list_reduce` over the full ordered prefix, so the hash compare pins
    * the arithmetic the state store carries, not a reimplementation.
    *
    * Scale: one shuffle by series, then Spark's external sort and a
    * streaming per-partition fold that resets at series boundaries — O(1)
    * memory per row, never a series' history materialized (a
    * `flatMapGroups`+`toSeq` would hold the whole series in one task's
    * heap). Each series folds serially — inherent, level N depends on
    * level N-1 — but series fold in parallel: the documented many-series
    * contract of every per-series recursion here.
    */
  def ewmaReplay(ticks: Dataset[Tick], alpha: Double): Dataset[Smoothed] = {
    import ticks.sparkSession.implicits._
    ticks.repartition(col("series_id"))
      .sortWithinPartitions(col("series_id"), col("t"), col("event_id"))
      .mapPartitions { it =>
        var sid: String = null
        var level: Option[EwmaState] = None
        it.map { x =>
          if (x.series_id != sid) { sid = x.series_id; level = None }
          level = Some(step(level, x, alpha))
          Smoothed(sid, x.t, x.event_id, x.value, level.get.level)
        }
      }
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Holt double-exponential smoothing (level + trend) — the
  * forecast-state monitor behind "where is this counter heading": TWO
  * doubles of state per series in the state store, exactly the
  * [[StreamingCusum]] architecture. The reference's observe surface has no
  * smoothing (extension); the batch-replay twin is hash-gated as
  * `stream_holt_replay` against a DuckDB recursive-CTE replay of the same
  * recursion, so the streaming fold's arithmetic is oracle-checked
  * end to end.
  *
  * Recursion (alpha, beta fixed per deployment):
  *   l_1 = x_1, b_1 = 0
  *   l_n = α·x_n + (1−α)·(l + b);  b_n = β·(l_n − l) + (1−β)·b
  * Every operation is written identically in the streaming step, the batch
  * replay, and the oracle SQL, so the IEEE doubles agree bit-for-bit
  * before the 6 dp display rounding.
  */
object StreamingHolt {

  case class Tick(series_id: String, t: Long, event_id: Long, v: Double)
  case class HoltRow(series_id: String, t: Long, event_id: Long,
                     level: Double, trend: Double)
  case class HoltState(l: Double, b: Double)

  /** The one step both execution modes share. First observation seeds
    * (l, b) = (x, 0) — the same seed the windowed `TsOps.holt` uses.
    */
  def step(prev: Option[HoltState], x: Tick,
           alpha: Double, beta: Double): (HoltState, HoltState) = prev match {
    case None =>
      val s = HoltState(x.v, 0.0); (s, s)
    case Some(p) =>
      val l1 = alpha * x.v + (1.0 - alpha) * (p.l + p.b)
      val b1 = beta * (l1 - p.l) + (1.0 - beta) * p.b
      val s = HoltState(l1, b1); (s, s)
  }

  /** Per-series streaming smoother via `flatMapGroupsWithState`; in-batch
    * events fold in `(t, event_id)` order, cross-batch carry is the
    * two-double state cell — O(series) state at any history length.
    */
  def holtStream(ticks: Dataset[Tick], alpha: Double, beta: Double): Dataset[HoltRow] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.series_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sid: String, it: Iterator[Tick], state: GroupState[HoltState]) =>
          var st = state.getOption
          val out = it.toSeq.sortBy(x => (x.t, x.event_id)).map { x =>
            val (n, s) = step(st, x, alpha, beta)
            st = Some(n)
            HoltRow(sid, x.t, x.event_id, s.l, s.b)
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  /** Batch replay of [[holtStream]]'s exact fold over the full history —
    * the gate surface: one shuffle by series, external sort, O(1)-memory
    * per-partition fold resetting at series boundaries.
    */
  def holtReplay(ticks: Dataset[Tick], alpha: Double, beta: Double): Dataset[HoltRow] = {
    import ticks.sparkSession.implicits._
    ticks.repartition(col("series_id"))
      .sortWithinPartitions(col("series_id"), col("t"), col("event_id"))
      .mapPartitions { it =>
        var sid: String = null
        var st: Option[HoltState] = None
        it.map { x =>
          if (x.series_id != sid) { sid = x.series_id; st = None }
          val (n, s) = step(st, x, alpha, beta)
          st = Some(n)
          HoltRow(sid, x.t, x.event_id, s.l, s.b)
        }
      }
  }
}

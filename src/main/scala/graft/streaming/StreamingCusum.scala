package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.streaming.GroupState

/** Streaming CUSUM drift monitor (Page 1954): per event, the one-sided
  * CUSUM statistic `hi_i = S_i - min_{0<=j<=i} S_j` where
  * `S_i = Σ (c_j - mu0)` against a fixed reference level `mu0` — the
  * alerting twin of the batch `ts_changepoint` gate's offline argmax.
  * The `max(0, hi + x)` textbook recursion and the running-min closed
  * form are the same statistic; the closed form is what makes the batch
  * oracle one window expression while the stream carries TWO longs per
  * series ((S, minS) — O(series) state, unbounded stream safe).
  */
object StreamingCusum {

  case class Tick(series_id: String, t: Long, event_id: Long, c: Long)
  case class CusumRow(series_id: String, t: Long, event_id: Long, c: Long, hi: Long)
  case class CusumState(s: Long, minS: Long)

  /** The one step both execution modes share: advance the prefix sum,
    * drag the prefix minimum (seeded at S_0 = 0), emit the excursion
    * height above that minimum. Exact integers end to end.
    */
  def step(prev: Option[CusumState], x: Tick, mu0: Long): (CusumState, Long) = {
    val p = prev.getOrElse(CusumState(0L, 0L))
    val s = p.s + (x.c - mu0)
    val minS = math.min(p.minS, s)
    (CusumState(s, minS), s - minS)
  }

  /** Per-series streaming CUSUM via `flatMapGroupsWithState`; in-batch
    * events fold in `(t, event_id)` order, the cross-batch carry is the
    * two-long state cell.
    */
  def cusumStream(ticks: Dataset[Tick], mu0: Long): Dataset[CusumRow] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.series_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sid: String, it: Iterator[Tick], state: GroupState[CusumState]) =>
          var st = state.getOption
          val out = it.toSeq.sortBy(x => (x.t, x.event_id)).map { x =>
            val (n, hi) = step(st, x, mu0)
            st = Some(n)
            CusumRow(sid, x.t, x.event_id, x.c, hi)
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  /** Batch replay of [[cusumStream]]'s exact fold over the full history —
    * the gate surface. Same shape as `StreamingStats.ewmaReplay`: one
    * shuffle by series, external sort, O(1)-memory per-partition fold
    * resetting at series boundaries.
    */
  def cusumReplay(ticks: Dataset[Tick], mu0: Long): Dataset[CusumRow] = {
    import ticks.sparkSession.implicits._
    ticks.repartition(col("series_id"))
      .sortWithinPartitions(col("series_id"), col("t"), col("event_id"))
      .mapPartitions { it =>
        var sid: String = null
        var st: Option[CusumState] = None
        it.map { x =>
          if (x.series_id != sid) { sid = x.series_id; st = None }
          val (n, hi) = step(st, x, mu0)
          st = Some(n)
          CusumRow(sid, x.t, x.event_id, x.c, hi)
        }
      }
  }
}

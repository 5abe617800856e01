package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counter-rate — the incremental twin of the batch `ts_rate`
  * gate (the PromQL rate() primitive): per series, a modular
  * cumulative-cents counter whose wraps model counter RESETS, emitting each
  * event's increase. State is ONE long per series (the current counter
  * residue) — O(series) regardless of stream length, and modular addition
  * makes the incremental residue exactly equal the batch prefix-sum's
  * residue, so the replay gate can pin the stream semantics bit-for-bit.
  */
object StreamingRate {

  /** Counter wrap modulus — shared with the `ts_rate` gate. */
  val Modulus = 1000000L

  case class CTick(series_id: String, t: Long, event_id: Long, cents: Long)
  case class Increase(series_id: String, t: Long, event_id: Long,
                      ctr: Long, d: Long)
  case class RateState(ctr: Long)

  /** The one step both execution modes share: advance the counter residue
    * by this event's cents and derive the increase — `ctr - prev` while
    * monotone, `ctr` after a wrap (counter restarted), 0 for a series'
    * first event (no predecessor, the PromQL convention).
    *
    * Requires `cents >= 0`: with non-negative increments the incremental
    * residue `(prev + cents) % M` equals the batch prefix-sum's residue
    * `cumsum % M` exactly (remainder semantics diverge from modular
    * congruence only when operands change sign), which is what lets the
    * replay gate compare against a window cumsum oracle.
    */
  def step(prev: Option[RateState], cents: Long): (RateState, Long) = {
    val ctr = (prev.map(_.ctr).getOrElse(0L) + cents) % Modulus
    val d = prev match {
      case None                       => 0L
      case Some(p) if ctr >= p.ctr    => ctr - p.ctr
      case Some(_)                    => ctr
    }
    (RateState(ctr), d)
  }

  /** Per-series streaming rate via `flatMapGroupsWithState`; events within
    * a micro-batch fold in (t, event_id) order, the shared tiebreak.
    */
  def rateStream(ticks: Dataset[CTick]): Dataset[Increase] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.series_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sid: String, it: Iterator[CTick], state: GroupState[RateState]) =>
          var st = state.getOption
          val out = it.toSeq.sortBy(x => (x.t, x.event_id)).map { x =>
            val (next, d) = step(st, x.cents)
            st = Some(next)
            Increase(sid, x.t, x.event_id, next.ctr, d)
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  /** Batch replay of [[rateStream]]'s exact recursion over the full
    * history — the gate surface (the stream_ewma_replay pattern). One
    * shuffle by series, external sort, O(1)-memory per-partition fold
    * resetting at series boundaries; series fold in parallel.
    */
  def rateReplay(ticks: Dataset[CTick]): Dataset[Increase] = {
    import ticks.sparkSession.implicits._
    ticks.repartition(col("series_id"))
      .sortWithinPartitions(col("series_id"), col("t"), col("event_id"))
      .mapPartitions { it =>
        var sid: String = null
        var st: Option[RateState] = None
        it.map { x =>
          if (x.series_id != sid) { sid = x.series_id; st = None }
          val (next, d) = step(st, x.cents)
          st = Some(next)
          Increase(sid, x.t, x.event_id, next.ctr, d)
        }
      }
  }
}

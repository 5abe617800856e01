package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming first-occurrence dedup — the live twin of the batch
  * `row_number() = 1` keep-first (and of Structured Streaming's own
  * `dropDuplicatesWithinWatermark`, which StreamingIngestSpec exercises on
  * the ingest path). This form exists to pin the SEMANTICS: one state cell
  * per distinct key, and the per-event admit/suppress decision is a single
  * shared function, so the batch replay gate checks the exact transition
  * the state store carries (the `stream_ewma_replay` /
  * `stream_sessionize_replay` pattern).
  *
  * Scale: state is O(distinct keys), not O(events). An unbounded key
  * universe needs eviction — production streams should bound state with a
  * watermark TTL (the `dropDuplicatesWithinWatermark` contract: a key can
  * re-admit once the watermark passes its first occurrence); this module
  * keeps NoTimeout because the gate replays a finite history where
  * "first ever" is the pinned semantic.
  */
object StreamingDedup {

  case class KeyedEvent(key: String, t: Long, event_id: Long)
  /** First occurrence retained per key — absence of the cell IS "unseen". */
  case class FirstSeen(t: Long, event_id: Long)

  /** The one per-event decision both execution modes share: an unseen key
    * admits the event and pins its (t, event_id) as the key's first
    * occurrence; a seen key suppresses. Sharing THIS is what makes the
    * replay gate pin the streaming semantics rather than a reimplementation.
    */
  private def step(seen: Option[FirstSeen], t: Long, eventId: Long): (Boolean, FirstSeen) =
    seen match {
      case Some(s) => (false, s)
      case None    => (true, FirstSeen(t, eventId))
    }

  /** Per-key streaming dedup via `flatMapGroupsWithState`. Events within a
    * micro-batch fold in (t, event_id) order — the same tiebreak as the
    * batch window — so tied timestamps admit the same winner in both modes.
    * A micro-batch is bounded, so the sort's Seq is fine; the
    * unbounded-history concern belongs to [[dedupReplay]], which streams.
    */
  def dedupStream(events: Dataset[KeyedEvent]): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[KeyedEvent], state: GroupState[FirstSeen]) =>
          var seen = state.getOption
          val out = it.toSeq.sortBy(e => (e.t, e.event_id)).flatMap { e =>
            val (emit, s) = step(seen, e.t, e.event_id)
            seen = Some(s)
            if (emit) Some(e) else None
          }
          seen.foreach(state.update)
          out.iterator
      }
  }

  /** Batch replay of [[dedupStream]]'s exact decision — [[step]] folded
    * over the whole history in (key, t, event_id) order, state starting
    * empty. One shuffle by key, then an O(1)-memory per-partition scan that
    * resets at key boundaries (the `ewmaReplay` shape) — never a key's
    * history materialized in one heap.
    */
  def dedupReplay(events: Dataset[KeyedEvent]): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events.repartition(col("key"))
      .sortWithinPartitions(col("key"), col("t"), col("event_id"))
      .mapPartitions { it =>
        var key: String = null
        var seen: Option[FirstSeen] = None
        it.flatMap { e =>
          if (e.key != key) { key = e.key; seen = None }
          val (emit, s) = step(seen, e.t, e.event_id)
          seen = Some(s)
          if (emit) Some(e) else None
        }
      }
  }
}

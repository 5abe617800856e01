package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.{col, timestamp_millis}
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
  * universe needs eviction — [[dedupStreamTtl]] bounds state with a
  * watermark TTL (a key re-admits once the watermark passes its first
  * occurrence + TTL); [[dedupStream]] keeps NoTimeout because the gate
  * replays a finite history where "first ever" is the pinned semantic.
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

  /** [[dedupStream]] with watermark-bounded state — the production form
    * for an unbounded key universe. A key's FirstSeen cell expires once the
    * event-time watermark passes its first occurrence plus `ttlMs`; a
    * duplicate arriving after expiry re-admits (the
    * `dropDuplicatesWithinWatermark` contract, here with the shared [[step]]
    * so the decision stays the gated one). State is O(keys seen within the
    * TTL horizon), not O(keys ever) — the bound that survives an unbounded
    * stream at 100 TB/day key cardinalities.
    *
    * Expiry is watermark-driven: the cell is removed by the state store's
    * timeout on the first batch AFTER the watermark passes, so a duplicate
    * arriving in the same batch as new data for an expired-but-not-yet-
    * swept key is still suppressed — eviction timing is the watermark's,
    * never wall clock's.
    */
  def dedupStreamTtl(events: Dataset[KeyedEvent], ttlMs: Long,
                     watermarkDelay: String = "0 seconds"): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events.withColumn("__ts", timestamp_millis(col("t")))
      .withWatermark("__ts", watermarkDelay)
      .as[(String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[(String, Long, Long, java.sql.Timestamp)],
         state: GroupState[FirstSeen]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var seen = state.getOption
            val out = it.toSeq.sortBy(e => (e._2, e._3)).flatMap { e =>
              val (emit, s) = step(seen, e._2, e._3)
              seen = Some(s)
              if (emit) Some(KeyedEvent(e._1, e._2, e._3)) else None
            }
            seen.foreach { s =>
              state.update(s)
              // the timeout target must sit at or above the current
              // watermark or Spark rejects it; an already-past expiry
              // clamps to watermark+1 and sweeps next batch
              state.setTimeoutTimestamp(
                math.max(s.t + ttlMs, state.getCurrentWatermarkMs + 1))
            }
            out.iterator
          }
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

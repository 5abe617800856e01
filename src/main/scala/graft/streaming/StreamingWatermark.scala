package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-event watermark admission: an event is DROPPED when its event time
  * lags the maximum event time seen so far (in ARRIVAL order) by more than
  * `delayMs` — the continuous-granularity form of Structured Streaming's
  * `withWatermark` rule (the engine's own watermark advances once per
  * micro-batch, so it admits a superset; this models the strictest
  * per-event admission, the bound every lateness-budget analysis needs).
  *
  * The monitor state is ONE long (the running max event time). Admission
  * is inherently sequential in arrival order, so the STREAM form runs as a
  * single keyed group — an honest monitor, not a throughput path; the
  * batch REPLAY is where scale lives: the prefix max decomposes over
  * arrival-hour buckets ([[admittedBucketed]]) exactly like the repo's
  * bucketed lag/rank carries, so no task ever sorts more than one
  * arrival-hour and the global window form never materializes.
  */
object StreamingWatermark {

  case class Arrival(t: Long, event_id: Long, c: Long, ak: Long)
  case class Admitted(t: Long, event_id: Long, c: Long, kept: Boolean)
  case class WmState(maxT: Long)

  /** The step both modes share: admit against the PRE-update max, then
    * absorb the event's time. The first event is always admitted.
    */
  def step(prev: Option[WmState], x: Arrival, delayMs: Long): (WmState, Boolean) = {
    val kept = prev.forall(p => x.t >= p.maxT - delayMs)
    (WmState(prev.fold(x.t)(p => math.max(p.maxT, x.t))), kept)
  }

  /** Streaming admission monitor via `flatMapGroupsWithState` over ONE
    * group (the watermark is a global scalar); in-batch events fold in
    * `(ak, event_id)` arrival order, the cross-batch carry is the one
    * long of state.
    */
  def admitStream(evs: Dataset[Arrival], delayMs: Long): Dataset[Admitted] = {
    import evs.sparkSession.implicits._
    evs.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[Arrival], state: GroupState[WmState]) =>
          var st = state.getOption
          val out = it.toSeq.sortBy(x => (x.ak, x.event_id)).map { x =>
            val (n, kept) = step(st, x, delayMs)
            st = Some(n)
            Admitted(x.t, x.event_id, x.c, kept)
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  /** Batch replay of the admission decision for every event, scale-shaped:
    * the strict-prefix max over global arrival order decomposes into
    *  1. per-arrival-hour max event time (map-combinable aggregate),
    *  2. a running max over the tiny arrival-hour AXIS, lagged one bucket
    *     (the carry into each bucket),
    *  3. a strict-prefix max WITHIN each bucket (window partitioned by
    *     bucket — parallel across hours),
    * and `maxPrev = greatest(carry, within)` — bit-identical to
    * `max(t) OVER (ORDER BY ak, event_id ROWS UNBOUNDED PRECEDING TO 1
    * PRECEDING)` (spec-pinned), with no global single-task sort.
    * Input columns: t, event_id, c, ak. Output adds `kept`.
    */
  def admittedBucketed(evs: DataFrame, delayMs: Long,
                       bucketMs: Long = 3600000L): DataFrame = {
    val b = evs.withColumn("__bk", expr(s"ak div ${bucketMs}L"))
    val wAxis = Window.orderBy(col("__bk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = b.groupBy("__bk").agg(max("t").as("__bmax"))
      .withColumn("__carry", max("__bmax").over(wAxis))
      .select(col("__bk"), col("__carry"))
    val wB = Window.partitionBy("__bk")
      .orderBy(col("ak").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    b.join(carry, Seq("__bk"))
      .withColumn("__maxprev", greatest(col("__carry"), max("t").over(wB)))
      .withColumn("kept",
        col("__maxprev").isNull || col("t") >= col("__maxprev") - delayMs)
      .drop("__bk", "__carry", "__maxprev")
  }
}

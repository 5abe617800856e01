package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-series standardization monitor: each arriving observation
  * is z-scored against the series' HISTORY (all strictly-earlier events),
  * then folded into the state — the alert-on-arrival form of the batch
  * `ts_zscore` gate (which scores against the full-window mean).
  *
  * The state is THREE EXACT LONGS per series — (n, Σcents, Σcents²) — not
  * Welford doubles: integer prefix sums make the fold order-free, so the
  * batch replay can be a plain window aggregate (no recursive fold, no
  * float-order pinning) and the z expression is one fixed IEEE formula
  * over integers both engines reproduce bit-identically. O(series) state,
  * unbounded stream safe; z is NULL until the history holds >= 2 points
  * or while its variance is zero.
  */
object StreamingZscore {

  case class Tick(series_id: String, t: Long, event_id: Long, c: Long)
  case class ZRow(series_id: String, t: Long, event_id: Long, c: Long,
                  z: Option[Double], anomaly: Boolean)
  case class ZState(n: Long, s: Long, q: Long)

  /** Score `x` against the PRE-update state, then absorb it. The variance
    * is the exact-integer form n·Σc² − (Σc)² over n(n−1), in cents² —
    * identical to the oracle's expression text.
    */
  def step(prev: Option[ZState], x: Tick): (ZState, Option[Double]) = {
    val p = prev.getOrElse(ZState(0L, 0L, 0L))
    val z = if (p.n >= 2) {
      val num = p.n.toDouble * p.q - p.s.toDouble * p.s
      if (num > 0) {
        val sd = math.sqrt(num / (p.n.toDouble * (p.n - 1))) / 100.0
        val mean = p.s.toDouble / (p.n * 100.0)
        Some(BigDecimal(((x.c / 100.0) - mean) / sd)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      } else None
    } else None
    (ZState(p.n + 1, p.s + x.c, p.q + x.c * x.c), z)
  }

  /** Per-series streaming z-monitor via `flatMapGroupsWithState`; in-batch
    * events fold in `(t, event_id)` order, cross-batch carry is the
    * three-long state cell.
    */
  def zscoreStream(ticks: Dataset[Tick]): Dataset[ZRow] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.series_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sid: String, it: Iterator[Tick], state: GroupState[ZState]) =>
          var st = state.getOption
          val out = it.toSeq.sortBy(x => (x.t, x.event_id)).map { x =>
            val (n, z) = step(st, x)
            st = Some(n)
            ZRow(sid, x.t, x.event_id, x.c, z, z.exists(math.abs(_) > 3.0))
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  /** Batch replay of [[zscoreStream]] — and because the state is integer
    * prefix sums, the replay needs NO sequential fold: per-series window
    * sums over the strict-history frame reproduce every state cell
    * exactly, and the z formula is shared textually with [[step]].
    */
  def zscoreReplay(ticks: Dataset[Tick]): Dataset[ZRow] = {
    import ticks.sparkSession.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("series_id").orderBy(col("t").asc, col("event_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    ticks.toDF()
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", coalesce(sum("c").over(w), lit(0L)))
      .withColumn("q", coalesce(sum(col("c") * col("c")).over(w), lit(0L)))
      .withColumn("z", when(col("n") >= 2 &&
          col("n").cast("double") * col("q") - col("s").cast("double") * col("s") > 0,
        round((col("c") / 100.0 - col("s").cast("double") / (col("n") * 100.0)) /
          (sqrt((col("n").cast("double") * col("q") - col("s").cast("double") * col("s")) /
            (col("n").cast("double") * (col("n") - 1))) / 100.0), 4)))
      .withColumn("anomaly", coalesce(abs(col("z")) > 3.0, lit(false)))
      .select(col("series_id"), col("t"), col("event_id"), col("c"),
        col("z"), col("anomaly"))
      .as[ZRow]
  }
}

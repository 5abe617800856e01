package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Largest-Triangle-Three-Buckets downsampling — the standard TS
  * visualization/reporting reduction (Steinarsson, "Downsampling Time
  * Series for Visual Representation", U. Iceland 2013): keep both
  * endpoints, split the interior into `nOut - 2` equal-count buckets, keep
  * from each bucket the point spanning the largest triangle against its
  * neighbor buckets. The reference has no downsample operator
  * (`/root/reference/src/timeseries/timeseries.re` returns raw windows);
  * this is part of the extension surface.
  *
  * Variant notes (pinned, engine-independent):
  *  - Classic LTTB anchors the triangle on the PREVIOUSLY SELECTED point —
  *    an inherently sequential per-series fold. This implementation uses
  *    the parallel variant: both anchors are bucket summaries (previous /
  *    next bucket), so every bucket scores independently — one shuffle by
  *    series, no sequential scan, same visual intent.
  *  - Bucket anchors are extreme MIDPOINTS ((min+max)/2 of t and value),
  *    not means: min/max are accumulation-order-free, so Spark and an
  *    oracle engine compute bit-identical anchors without ordered-fold
  *    gymnastics (means would need a pinned fold order, the cosine_sim
  *    lesson).
  *  - The argmax is over round(area, 6) with ties to the lowest
  *    (t, event_id) — deterministic across engines.
  *
  * Scale shape: rank + count windows ride ONE exchange by series; bucket
  * summaries aggregate map-side onto a tiny (series x nOut) axis; scoring
  * joins candidates back on the (series, bucket) equi key. No per-series
  * arrays are ever materialized.
  */
object Lttb {

  /** @param ts   frame with `series_id`, `t` (epoch ms), `value`, `event_id`
    * @param nOut target points per series (>= 3); series with <= nOut
    *             points pass through unchanged
    */
  def downsample(ts: DataFrame, nOut: Int): DataFrame = {
    require(nOut >= 3, "LTTB needs at least 3 output points (both endpoints + 1)")
    val cols = Seq("series_id", "t", "value", "event_id")
    val w = Window.partitionBy("series_id").orderBy(col("t").asc, col("event_id").asc)
    val ranked = ts.select(cols.map(col): _*)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("series_id")))

    // one branch for everything kept verbatim: whole series of <= nOut
    // points, plus both endpoints of the larger series (the window
    // exchange is shared with the `mids` branch via exchange reuse)
    val keepDirect = ranked.filter(col("n") <= nOut ||
      col("rn") === 1 || col("rn") === col("n"))

    // interior points -> equal-count buckets 0 .. nOut-3
    val mids = ranked.filter(col("n") > nOut && col("rn") > 1 && col("rn") < col("n"))
      .withColumn("b", expr(s"(rn - 2) * ${nOut - 2} div (n - 2)"))

    // per-bucket anchor: extreme midpoint (order-free, bit-deterministic)
    val anchors = mids.groupBy("series_id", "b")
      .agg(((min("t") + max("t")) / 2.0).as("tm"),
           ((min("value") + max("value")) / 2.0).as("vm"))
    // endpoint coordinates stitch the first/last bucket's missing
    // neighbor — min_by/max_by on the (t, event_id) order, a plain
    // partial-aggregated groupBy, no window pass
    val ord = struct(col("t"), col("event_id"))
    val eps = ts.select(cols.map(col): _*).groupBy("series_id")
      .agg(min_by(col("t"), ord).cast("double").as("t1"),
           min_by(col("value"), ord).as("v1"),
           max_by(col("t"), ord).cast("double").as("tn"),
           max_by(col("value"), ord).as("vn"),
           count(lit(1)).as("n_ep"))
      .filter(col("n_ep") > nOut)
    val wb = Window.partitionBy("series_id").orderBy(col("b").asc)
    val framed = anchors.join(eps.drop("n_ep"), "series_id")
      .select(col("series_id"), col("b"),
        coalesce(lag("tm", 1).over(wb), col("t1")).as("tp"),
        coalesce(lag("vm", 1).over(wb), col("v1")).as("vp"),
        coalesce(lead("tm", 1).over(wb), col("tn")).as("tn2"),
        coalesce(lead("vm", 1).over(wb), col("vn")).as("vn2"))

    // triangle area against the neighbor anchors (x2, monotone in area)
    val area = abs(
      (col("tp") - col("tn2")) * (col("value") - col("vp")) -
      (col("tp") - col("t").cast("double")) * (col("vn2") - col("vp")))
    val winners = mids.join(framed, Seq("series_id", "b"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("series_id", "b")
          .orderBy(round(area, 6).desc, col("t").asc, col("event_id").asc)))
      .filter(col("rank") === 1)

    keepDirect.select(cols.map(col): _*)
      .unionByName(winners.select(cols.map(col): _*))
  }

  /** M4 downsampling (Jugel et al., "M4: A Visualization-Oriented Time
    * Series Data Aggregation", VLDB 2014): per fixed-width time bucket keep
    * the four values that pin the rendered line at pixel resolution —
    * min, max, first (by time), last (by time). Where [[downsample]] picks
    * ONE representative point per bucket by triangle area, M4's four
    * extremes make the line-join between pixels error-free, which is why
    * dashboards default to it.
    *
    * Scale shape: a SINGLE partial-aggregable groupBy on (series, bucket) —
    * min/max/min_by/max_by all combine map-side, so the only shuffle
    * carries one row per (series, bucket), not raw points. No windows, no
    * per-series arrays. Values pass through un-arithmetic'd (min/max/argmin
    * select, never compute), so the output is bit-exact by construction on
    * any engine; ties on t break by event_id.
    *
    * @param spanMs bucket width in ms (the "pixel" width)
    */
  def m4(ts: DataFrame, spanMs: Long): DataFrame = {
    val ord = struct(col("t"), col("event_id"))
    ts.select(col("series_id"), col("t"), col("value"), col("event_id"))
      .withColumn("bucket", expr(s"t div ${spanMs}L"))
      .groupBy("series_id", "bucket")
      .agg(
        count(lit(1)).as("n"),
        min(col("value")).as("v_min"),
        max(col("value")).as("v_max"),
        min_by(col("value"), ord).as("v_first"),
        max_by(col("value"), ord).as("v_last"))
      .select(col("series_id"), col("bucket"),
        (col("bucket") * lit(spanMs)).as("t_start"), col("n"), col("v_min"),
        col("v_max"), col("v_first"), col("v_last"))
  }
}

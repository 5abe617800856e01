package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact median with BOUNDED memory at any scale.
  *
  * Spark's exact `median()`/`percentile(0.5)` buffers every value of a
  * group in the aggregation buffer — fine at test scale, an OOM at
  * 100 TB. `percentile_approx` bounds memory but is approximate. This is
  * the third point in the trade space: exact AND bounded, via iterative
  * histogram selection (the classic distributed k-th order statistic):
  * each pass histograms the candidate range into `buckets` ranges with
  * per-bucket count/min/max (one map-side-combined aggregation, a few KB
  * shuffled), then descends into the bucket containing the target rank.
  * The candidate range shrinks `buckets`-fold per pass, so double
  * precision exhausts in <= ~5 passes; a bucket whose min == max resolves
  * immediately.
  *
  * Cost: `passes` full scans (cheap columnar count/min/max, no sort, no
  * per-group buffering) vs `median()`'s one scan + full per-group sort
  * with O(group) memory. Use this for whole-input or few-group medians on
  * huge groups; `median()` for many small groups.
  *
  * Semantics pinned to Spark/DuckDB `median`: NULL and NaN values are
  * ignored; an even count averages the two middle values; +-Infinity
  * participates in ordering.
  */
object ExactMedian {

  def median(df: DataFrame, valueCol: String = "value", buckets: Int = 4096): Option[Double] = {
    val base = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))
    val counts = base.agg(
      count(lit(1)).as("n"),
      count(when(col("v") === Double.NegativeInfinity, 1)).as("cneg"),
      count(when(col("v") === Double.PositiveInfinity, 1)).as("cpos")).head()
    val n = counts.getLong(0)
    if (n == 0L) return None
    val (cneg, cpos) = (counts.getLong(1), counts.getLong(2))
    // even counts descend twice (both middle ranks); the scans could be
    // shared by tracking two ranks per pass, but 2x a handful of cheap
    // columnar scans hasn't justified the added state machine yet
    def kth(k: Long): Double =
      if (k <= cneg) Double.NegativeInfinity
      else if (k > n - cpos) Double.PositiveInfinity
      else selectKth(base.filter(col("v") > Double.NegativeInfinity &&
        col("v") < Double.PositiveInfinity), k - cneg, buckets)
    if (n % 2 == 1) Some(kth(n / 2 + 1))
    else Some((kth(n / 2) + kth(n / 2 + 1)) / 2.0)
  }

  /** k-th smallest (1-based) among the FINITE values of `base.v`. */
  private def selectKth(base: DataFrame, k0: Long, buckets: Int): Double = {
    val mm = base.agg(min("v"), max("v")).head()
    var lo = mm.getDouble(0)
    var hi = mm.getDouble(1)
    var k = k0
    var scoped = base
    while (lo < hi) {
      // (hi - lo) can overflow to Infinity when the range spans most of the
      // double line; hi/n - lo/n is the same width computed overflow-free
      val width = hi / buckets - lo / buckets
      if (width == 0d || lo + width == lo) {
        // range below double resolution (or overflowing): the few distinct
        // representable values left fit on the driver
        val vals = scoped.select("v").distinct().collect().map(_.getDouble(0)).sorted
        val withCounts = scoped.groupBy("v").count().collect()
          .map(r => r.getDouble(0) -> r.getLong(1)).toMap
        var cum = 0L
        for (v <- vals) { cum += withCounts(v); if (cum >= k) return v }
        return vals.last
      }
      val bucketed = scoped
        .withColumn("__bk", least(floor((col("v") - lo) / width), lit(buckets - 1)).cast("int"))
        .groupBy("__bk").agg(count(lit(1)).as("c"), min("v").as("bmin"), max("v").as("bmax"))
        .orderBy("__bk").collect()
      var cum = 0L
      var resolved = false
      var i = 0
      while (!resolved && i < bucketed.length) {
        val r = bucketed(i)
        val c = r.getLong(1)
        if (cum + c >= k) {
          val (bmin, bmax) = (r.getDouble(2), r.getDouble(3))
          if (bmin == bmax) return bmin
          k -= cum; lo = bmin; hi = bmax
          scoped = scoped.filter(col("v") >= bmin && col("v") <= bmax)
          resolved = true
        } else { cum += c; i += 1 }
      }
    }
    lo
  }
}

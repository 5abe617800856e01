package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics beyond the reference surface: gap-based
  * sessionization and skew-safe aggregation — the two patterns every
  * large-scale events pipeline needs.
  */
object Sessionize {

  /** Gap-based sessions: a new session starts when the gap to the previous
    * event of the same user exceeds `gapMs`. One shuffle by user; the
    * running sum stays inside the same window partition so no extra
    * exchange. The per-user window is linear-SERIAL: a user holding 90% of
    * 10M rows funnels through one sort task (PERF.md round 6: ~26 s —
    * finishes via spill, but serialized). [[sessionsBucketed]] is the
    * skew-proof form the gates ship; this one is its parity oracle.
    */
  def sessions(events: DataFrame, gapMs: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("t").asc, col("event_id").asc)
    events
      .withColumn("prev_t", lag(col("t"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_t").isNull || col("t") - col("prev_t") > gapMs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           min("t").as("t_start"),
           max("t").as("t_end"),
           round(sum("value"), 4).as("session_value"))
  }

  /** Split-merge gap sessionization — [[sessions]] without the per-user
    * single-task sort. Bit-identical output (SessionizeSpec pins parity).
    *
    * The heavy per-row windows partition by `(user, time bucket)`, so a
    * hot user's history splits across `span / bucketMs` parallel tasks;
    * the only per-user serial state is a tiny `(user, bucket)` axis:
    *
    *  1. carry: each bucket's LAST timestamp joins to the next bucket, so
    *     that bucket's first row sees its true previous event. A missing
    *     previous bucket needs no carry: with `bucketMs > gapMs`, the gap
    *     across an empty bucket always exceeds `gapMs` — new session.
    *  2. session-start flags + a LOCAL running count per (user, bucket):
    *     the same window exchange, each task sorting one bucket.
    *  3. global session ids = local count + a per-user prefix offset,
    *     cumulative-summed over the (user, bucket) counts axis — the
    *     events_decile/takeQuotaByGroup recipe: global order reconstructed
    *     on the aggregated axis, never by sorting raw rows in one task.
    *
    * Bucket order agrees with time order within a user (bucket = t div
    * bucketMs), so ids match [[sessions]]' numbering exactly; sessions
    * spanning buckets reunite in the final groupBy because their rows
    * share one global id.
    */
  def sessionsBucketed(events: DataFrame, gapMs: Long,
                       bucketMs: Long = 0L): DataFrame = {
    val bMs = if (bucketMs > 0L) bucketMs else 2L * gapMs
    require(bMs > gapMs,
      s"bucketMs ($bMs) must exceed gapMs ($gapMs): the empty-bucket case " +
      "assumes a cross-empty-bucket gap always starts a session")
    val b = events.withColumn("bucket", expr(s"t div ${bMs}L"))
    // (user, bucket) -> last t, shifted to the NEXT bucket (tiny axis)
    val carry = b.groupBy("user_id", "bucket").agg(max("t").as("carry_t"))
      .withColumn("bucket", col("bucket") + 1)
    val wB = Window.partitionBy("user_id", "bucket")
      .orderBy(col("t").asc, col("event_id").asc)
    val flagged = b.join(carry, Seq("user_id", "bucket"), "left")
      .withColumn("prev_t", coalesce(lag(col("t"), 1).over(wB), col("carry_t")))
      .withColumn("new_sess",
        when(col("prev_t").isNull || col("t") - col("prev_t") > gapMs, 1).otherwise(0))
      .withColumn("local_cum", sum("new_sess").over(
        wB.rowsBetween(Window.unboundedPreceding, 0)))
    // per-user prefix offsets over the (user, bucket) counts axis
    val wOff = Window.partitionBy("user_id").orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = flagged.groupBy("user_id", "bucket")
      .agg(sum("new_sess").as("bn"))
      .withColumn("offset", coalesce(sum("bn").over(wOff), lit(0L)))
      .select("user_id", "bucket", "offset")
    flagged.join(offsets, Seq("user_id", "bucket"))
      .withColumn("session_id", (col("offset") + col("local_cum")).cast("long"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           min("t").as("t_start"),
           max("t").as("t_end"),
           round(sum("value"), 4).as("session_value"))
  }

  /** Per-user `lag(valueCol, 1)` in `(t, event_id)` order WITHOUT the
    * per-user single-task sort — [[sessionsBucketed]]'s carry recipe for
    * adjacent-row windows. An adjacent-row dependency needs only a
    * constant-size carry across bucket boundaries, so "lag diffs" are NOT
    * serial-by-semantics (PERF.md round 6 overclaimed this; corrected):
    *
    *  1. the heavy window partitions by (user, t-bucket) — a hot user's
    *     history splits across `span / bucketMs` parallel sort tasks;
    *  2. each bucket's LAST value (a `max_by` aggregate, no window)
    *     becomes the next non-empty bucket's carry via `lag` over the
    *     aggregated (user, bucket) axis — which skips EMPTY buckets by
    *     construction, the case a bucket-(b-1) join would miss;
    *  3. a bucket's first row (row_number = 1) takes the carry, every
    *     other row its in-bucket lag — exact even when `valueCol` itself
    *     holds nulls (a coalesce would mask them).
    *
    * Bit-identical to `lag(valueCol, 1) over (partition by user_id order
    * by t, event_id)` — RewriteParitySpec and SessionizeSpec pin it.
    * `events` needs user_id, t, event_id, `valueCol`; adds `outCol`.
    */
  def lagBucketed(events: DataFrame, valueCol: String, outCol: String,
                  bucketMs: Long = 86400000L): DataFrame = {
    val b = events.withColumn("__bk", expr(s"t div ${bucketMs}L"))
    val wAxis = Window.partitionBy("user_id").orderBy(col("__bk").asc)
    val carry = b.groupBy("user_id", "__bk")
      .agg(max_by(col(valueCol), struct(col("t"), col("event_id"))).as("__last"))
      .withColumn("__carry", lag(col("__last"), 1).over(wAxis))
      .select(col("user_id"), col("__bk"), col("__carry"))
    val wB = Window.partitionBy("user_id", "__bk")
      .orderBy(col("t").asc, col("event_id").asc)
    b.join(carry, Seq("user_id", "__bk")) // same key as wB: exchange reused
      .withColumn(outCol, when(row_number().over(wB) === 1, col("__carry"))
        .otherwise(lag(col(valueCol), 1).over(wB)))
      .drop("__bk", "__carry")
  }

  /** Per-user `lead(valueCol, 1)` and `lead(valueCol, 2)` — the forward
    * twin of [[lagBucketed]]. A lead-2 carry must cross up to TWO bucket
    * boundaries (the next non-empty bucket may hold a single row), so
    * each bucket exports its FIRST TWO values — a bounded `topk_rows`
    * heap aggregate, never a `collect_list` of the bucket — and imports
    * take-2 of the next two exports off the aggregated axis. The last
    * row of a bucket (`remaining = 1`) reads both leads from the import,
    * the second-to-last reads lead-2's first element; everything else
    * stays in-bucket. Bit-identical to the two lead windows over
    * (partition by user_id order by t, event_id).
    */
  def leadBucketed2(events: DataFrame, valueCol: String,
                    out1: String, out2: String,
                    bucketMs: Long = 86400000L): DataFrame = {
    val b = events.withColumn("__bk", expr(s"t div ${bucketMs}L"))
    val wAxis = Window.partitionBy("user_id").orderBy(col("__bk").asc)
    val nxt = b.groupBy("user_id", "__bk")
      .agg(graft.functions.TopKRows.topk_rows(
        struct(col("t"), col("event_id"), col(valueCol)), 2,
        descending = false).as("__f2raw"))
      .withColumn("__f2", expr(s"transform(__f2raw, x -> x.`$valueCol`)"))
      .withColumn("__nx", slice(flatten(filter(array(
          lead(col("__f2"), 1).over(wAxis), lead(col("__f2"), 2).over(wAxis)),
        x => x.isNotNull)), 1, 2))
      .select(col("user_id"), col("__bk"), col("__nx"))
    val wB = Window.partitionBy("user_id", "__bk")
      .orderBy(col("t").asc, col("event_id").asc)
    // rows at-or-after this one within the bucket: 1 = last row, 2 = next
    // to last. NOT a (currentRow, unboundedFollowing) frame — Spark's
    // shrinking-frame processor re-aggregates the tail per row, O(rows²)
    // per bucket (measured: 110+ s vs 6 s at 10M rows / 12k-row buckets);
    // whole-partition count minus row_number is two O(n) passes over the
    // same exchange and sort
    val rem = count(lit(1)).over(Window.partitionBy("user_id", "__bk")) -
      row_number().over(wB) + 1
    b.join(nxt, Seq("user_id", "__bk"))
      .withColumn("__rem", rem)
      .withColumn(out1, when(col("__rem") >= 2, lead(col(valueCol), 1).over(wB))
        .otherwise(get(col("__nx"), lit(0))))
      .withColumn(out2, when(col("__rem") >= 3, lead(col(valueCol), 2).over(wB))
        .when(col("__rem") === 2, get(col("__nx"), lit(0)))
        .otherwise(get(col("__nx"), lit(1))))
      .drop("__bk", "__nx", "__rem")
  }

  /** Two-phase salted aggregation for skewed keys: phase 1 aggregates on
    * (key, salt) spreading a heavy key over `saltBuckets` reducers; phase 2
    * combines the partials per key. Correct for any algebraic aggregate
    * expressed as (partial, combine) pairs — here sum/count, from which
    * mean derives. Use when one key dominates (the TS model's few-series
    * shape) and AQE's skew handling can't help because the skew is in a
    * groupBy, not a join.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     saltBuckets: Int): DataFrame = {
    val salted = df.select(key.as("k"), value.as("v"))
      .withColumn("salt", pmod(crc32(monotonically_increasing_id().cast("string")), lit(saltBuckets)))
    salted
      .groupBy("k", "salt")
      .agg(sum("v").as("ps"), count(lit(1)).as("pc"))
      .groupBy("k")
      .agg(sum("ps").as("sum_v"), sum("pc").cast("long").as("count_v"))
  }

  /** Global `row_number() over (order by metric, tiebreak)` without the
    * single-task global sort — the bucketed-carry trick applied to
    * RANKING: rows land in a coarse range `bucket` that is MONOTONE in
    * `metric` (caller contract: e.g. `metric div 1000`), per-bucket
    * counts collapse to the tiny bucket axis whose running sum is each
    * bucket's rank offset, and within-bucket `row_number` windows are
    * `__rbk`-partitioned. Global rank = offset + in-bucket rank, exactly
    * — bucket monotonicity makes (bucket, metric, tiebreak) order equal
    * (metric, tiebreak) order. The only unpartitioned window runs over
    * the aggregated bucket axis.
    */
  /** Per-GROUP global rank through the same two-level shape as
    * [[rankBucketed]]: per-(group, bucket) row_numbers plus offsets read
    * off the (group, bucket) axis — the axis is |groups| x |buckets|
    * rows, so the offset window is bounded regardless of row count, and
    * no group's rows ever sort through one task unless they share a
    * bucket. Ranks are 1-based by (metric asc, tiebreak asc) within each
    * group — the building block for per-group percentiles/quantile
    * normalization. `bucket` MUST be a monotone (range) function of the
    * metric — equal metrics in one bucket, lower metrics never in a
    * higher bucket — or the offset composition is meaningless (a hash
    * bucket silently produces garbage ranks).
    */
  def rankBucketedBy(df: DataFrame, group: Column, metric: Column,
                     tiebreak: Column, bucket: Column, outCol: String): DataFrame = {
    val b = df.withColumn("__rbg", group).withColumn("__rbk", bucket)
    val wAxis = Window.partitionBy("__rbg").orderBy(col("__rbk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = b.groupBy("__rbg", "__rbk").agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum("__c").over(wAxis), lit(0L)))
      .select(col("__rbg"), col("__rbk"), col("__off"))
    val wB = Window.partitionBy("__rbg", "__rbk").orderBy(metric.asc, tiebreak.asc)
    b.join(broadcast(off), Seq("__rbg", "__rbk"))
      .withColumn(outCol, col("__off") + row_number().over(wB))
      .drop("__rbg", "__rbk", "__off")
  }

  def rankBucketed(df: DataFrame, metric: Column, tiebreak: Column,
                   bucket: Column, outCol: String): DataFrame = {
    val b = df.withColumn("__rbk", bucket)
    val wAxis = Window.orderBy(col("__rbk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = b.groupBy("__rbk").agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum("__c").over(wAxis), lit(0L)))
      .select(col("__rbk"), col("__off"))
    val wB = Window.partitionBy("__rbk").orderBy(metric.asc, tiebreak.asc)
    b.join(broadcast(off), Seq("__rbk"))
      .withColumn(outCol, col("__off") + row_number().over(wB))
      .drop("__rbk", "__off")
  }
}

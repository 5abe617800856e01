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
}

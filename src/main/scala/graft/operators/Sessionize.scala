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
    * exchange. At 100 TB, partition the input by a time bucket so each
    * user's history co-locates (bounded per-task state).
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

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row with
  * the same key at-or-before the left timestamp — the standard TSDB
  * "what was the last reading when X happened" operator (kdb `aj`,
  * DuckDB/QuestDB `ASOF JOIN`), absent from both the reference and Spark.
  *
  * Spark-first formulation (preference (a) of the custom-operator ladder —
  * composition, no custom plan node): tag and UNION both sides, then one
  * window per key ordered by `(t, side, event_id)` carries the latest
  * right row forward onto left rows via `last(_, ignoreNulls = true)`.
  *
  * Design points:
  *  - The matched right row travels as ONE struct column, so a NULL in a
  *    right value column cannot be "filled" from an older row — the match
  *    is atomic (asof_t and every asof_<c> come from the same row).
  *  - Right rows at equal (key, t) need no dedup pre-pass: ordering by
  *    `event_id` inside the single window makes the highest-event_id row
  *    the one `last` retains. Exactly ONE shuffle, by join key.
  *  - `tCol` may be any orderable type (long millis, timestamp, ...);
  *    the null sentinel is cast to the right side's struct type.
  */
object AsOfJoin {

  /** @param left      probe side; must contain `key`, `tCol`, `event_id`
    * @param right     reference side; must contain `key`, `tCol`,
    *                  `event_id` (tiebreak) and `valueCols`
    * @param key       equi-join key column name
    * @param tCol      timestamp column name (same name both sides)
    * @param valueCols right-side columns to carry (emitted as `asof_<c>`)
    * @return left rows (inner semantics: rows with no earlier right row
    *         are dropped) plus `asof_t` and the `asof_<c>` columns
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, tCol: String,
           valueCols: Seq[String]): DataFrame = {
    val rStruct = struct(col(tCol).as("asof_t") +: valueCols.map(c => col(c).as(s"asof_$c")): _*)
    val rStructType = right.select(rStruct.as("__rv")).schema("__rv").dataType

    val leftCols = left.columns
    val tagged =
      left.withColumn("__side", lit(1))
        .withColumn("__rv", lit(null).cast(rStructType))
        .unionByName(
          right.withColumn("__side", lit(0))
            .withColumn("__rv", rStruct)
            .select(col(key), col(tCol), col("event_id"), col("__side"), col("__rv")),
          allowMissingColumns = true)

    // right rows sort before left rows at equal t => "at-or-before" is
    // inclusive; among right rows at equal t the highest event_id lands
    // last and wins
    val w = Window.partitionBy(col(key))
      .orderBy(col(tCol).asc, col("__side").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__match").isNotNull) // inner semantics
      .select(leftCols.map(col) ++
        (col("__match.asof_t").as("asof_t") +:
          valueCols.map(c => col(s"__match.asof_$c").as(s"asof_$c"))): _*)
  }

  /** Skew-hardened as-of join: same semantics as [[asOf]], but the window
    * partitions by `(key, time-bucket)` so a hot key parallelizes across
    * buckets instead of serializing through one reducer — the 100 TB
    * hardening for power-law key distributions (one user holding 90% of
    * the rows).
    *
    * Two phases:
    *  1. per `(key, bucket)` the last right row is pre-aggregated
    *     (map-side combine — the hot key contributes at most
    *     `partitions` rows per bucket to this shuffle), then a carry row
    *     per bucket is derived by running the as-of carry-forward over the
    *     BUCKET axis (one row per (key, bucket) — thousands, not
    *     billions);
    *  2. within each `(key, bucket)` window the union+`last` trick of
    *     [[asOf]] resolves matches, falling back to the bucket's carry for
    *     left rows preceding every right row of their bucket.
    *
    * `tCol` must be numeric (epoch millis) here — the bucket is
    * `floor(t / bucketMs)`.
    */
  def asOfBucketed(left: DataFrame, right: DataFrame, key: String, tCol: String,
                   valueCols: Seq[String], bucketMs: Long = 86400000L): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    val rStruct = struct(col(tCol).as("asof_t") +: valueCols.map(c => col(c).as(s"asof_$c")): _*)
    val rStructType = right.select(rStruct.as("__rv")).schema("__rv").dataType
    def bucket = floor(col(tCol) / bucketMs.toDouble).cast("long")

    val leftCols = left.columns
    val bLeft  = left.withColumn("__b", bucket)
    val bRight = right.withColumn("__b", bucket)

    // phase 1: last right row per (key, bucket) — max_by orders the
    // (t, event_id) struct lexicographically, matching the window order
    val perBucketLast = bRight.groupBy(col(key), col("__b"))
      .agg(max_by(rStruct, struct(col(tCol), col("event_id"))).as("__blast"))

    // carry into bucket b: last right row of any strictly-earlier bucket,
    // over the combined bucket axis of both sides (a left bucket may have
    // no right rows at all)
    val axis = bLeft.select(col(key), col("__b")).distinct()
      .unionByName(perBucketLast.select(col(key), col("__b"))).distinct()
    val wb = Window.partitionBy(col(key)).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = axis.join(perBucketLast, Seq(key, "__b"), "left")
      .withColumn("__carry", last(col("__blast"), ignoreNulls = true).over(wb))
      .select(col(key), col("__b"), col("__carry"))

    // phase 2: the asOf union+window, partitioned by (key, bucket)
    val tagged =
      bLeft.withColumn("__side", lit(1))
        .withColumn("__rv", lit(null).cast(rStructType))
        .unionByName(
          bRight.withColumn("__side", lit(0))
            .withColumn("__rv", rStruct)
            .select(col(key), col(tCol), col("event_id"), col("__b"), col("__side"), col("__rv")),
          allowMissingColumns = true)
    val w = Window.partitionBy(col(key), col("__b"))
      .orderBy(col(tCol).asc, col("__side").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    tagged
      .withColumn("__inb", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .join(carries, Seq(key, "__b"), "left")
      .withColumn("__match", coalesce(col("__inb"), col("__carry")))
      .filter(col("__match").isNotNull) // inner semantics
      .select(leftCols.map(col) ++
        (col("__match.asof_t").as("asof_t") +:
          valueCols.map(c => col(s"__match.asof_$c").as(s"asof_$c"))): _*)
  }
}

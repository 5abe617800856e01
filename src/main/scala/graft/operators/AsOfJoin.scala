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
}

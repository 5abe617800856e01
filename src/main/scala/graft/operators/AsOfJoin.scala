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
  * window per key ordered by (t, side) carries the latest right values
  * forward onto left rows via `last(_, ignoreNulls = true)`.
  *
  * Scale: exactly ONE shuffle, by join key — the same cost as any keyed
  * aggregation, regardless of time skew. The naive alternatives explode: a
  * range theta-join is quadratic per key, and per-left-row subqueries are
  * a shuffle per probe. Right rows at the same (key, t) are deduplicated
  * to the highest `event_id` first so the match is deterministic.
  */
object AsOfJoin {

  /** @param left      probe side; must contain `key` and `tCol`
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
    // deterministic right side: one row per (key, t), latest event wins
    val byKeyT = Window.partitionBy(col(key), col(tCol)).orderBy(col("event_id").desc)
    val r = right.withColumn("__rn", row_number().over(byKeyT))
      .filter(col("__rn") === 1).drop("__rn")

    val leftCols = left.columns
    val tagged =
      left.withColumn("__side", lit(1))
        .withColumn("__asof_t", lit(null).cast("long"))
        .select(Seq(col(key), col(tCol), col("__side"), col("__asof_t")) ++
          valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")) ++
          leftCols.filterNot(c => c == key || c == tCol).map(col): _*)
      .unionByName(
        r.withColumn("__side", lit(0))
          .withColumn("__asof_t", col(tCol))
          .select(Seq(col(key), col(tCol), col("__side"), col("__asof_t")) ++
            valueCols.map(c => col(c).as(s"__v_$c")): _*),
        allowMissingColumns = true)

    // right rows sort before left rows at equal t => "at-or-before" is inclusive
    val w = Window.partitionBy(col(key))
      .orderBy(col(tCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = tagged
      .withColumn("asof_t", last(col("__asof_t"), ignoreNulls = true).over(w))
    val withVals = valueCols.foldLeft(filled) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    withVals
      .filter(col("__side") === 1 && col("asof_t").isNotNull) // inner semantics
      .select(leftCols.map(col) ++ (col("asof_t") +: valueCols.map(c => col(s"asof_$c"))): _*)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe point-in-band counting join: for every left row, how many
  * right rows share `key` and lie within ±`bandMs` (inclusive) of the left
  * row's timestamp — the temporal-correlation shape behind alert-context
  * queries ("clicks around each error").
  *
  * The equi key is `(key, bandMs-bucket)`, NOT `key` alone: keyed only by
  * `key`, a hot key's left x right rows all meet in one reducer and the
  * pair fan-out is quadratic in its row count before the band filter runs.
  * Bucketing by the band width bounds each reducer to a key-bucket, and
  * since |t_r - t_l| <= bandMs confines a right row's bucket to
  * [l_bucket - 1, l_bucket + 1], probing 3 buckets per left row (x3 on the
  * left side only — typically the rare one) finds every qualifying pair
  * exactly once: a right row lives in ONE bucket, so no dedup is needed,
  * and an unmatched left row keeps its count-0 row via its own probes.
  * Sibling of [[AsOfJoin.asOfBucketed]]; the unbucketed form did not
  * finish 1M rows on one hot key in 10 minutes (PERF.md round 5).
  */
object BandJoin {

  /** @param left    frame with `key`, `leftId` (the output key), `tCol`
    *                 (epoch ms)
    * @param right   frame with `key`, `rightId` (the counted column), `tCol`
    * @param bandMs  inclusive half-width of the time band
    * @return one row per left row: (`leftId`, `n` = matching right-row
    *         count, possibly 0)
    */
  def nearCount(left: DataFrame, right: DataFrame, key: String,
                leftId: String, rightId: String, tCol: String,
                bandMs: Long): DataFrame = {
    require(bandMs > 0, "bandMs must be positive")
    val l = left.select(col(key).as("__k"), col(leftId), col(tCol).as("__lt"))
    val r = right.select(col(key).as("__rk"), col(rightId).as("__rid"),
        col(tCol).as("__rt"))
      .withColumn("__rb", expr(s"__rt div ${bandMs}L"))
    val probes = l.withColumn("__b", explode_outer(sequence(
      expr(s"__lt div ${bandMs}L - 1"), expr(s"__lt div ${bandMs}L + 1"))))
    probes.join(r,
        col("__k") === col("__rk") && col("__b") === col("__rb") &&
        col("__rt") >= col("__lt") - bandMs && col("__rt") <= col("__lt") + bandMs,
        "left_outer")
      .groupBy(col(leftId))
      .agg(count(col("__rid")).as("n"))
  }
}

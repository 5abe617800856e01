package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KV store operators (reference
  * `/root/reference/src/keyvalue/keyvalue.re:3-127`, key registry
  * `/root/reference/src/keyvalue/keys.re:3-90`).
  *
  * The store is an append-only change-log
  * `(id, key, value, write_ts, event_id, deleted)`; reads resolve
  * last-writer-wins, deletes are tombstone rows. The reference keeps a
  * separate per-id key registry for `keys`/`count` — here both are derived
  * from the LWW view, so there is no second structure to keep consistent.
  *
  * Scale: LWW is one shuffle by (id, key); with the log bucketed on
  * (id, key) it is shuffle-free. Point reads push `id = ?` into the scan.
  */
object KvOps {

  /** Latest write per (id, key), tombstones still visible. */
  def lwwAll(log: DataFrame): DataFrame = {
    val w = Window.partitionBy("id", "key")
      .orderBy(col("write_ts").desc, col("event_id").desc)
    log.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Live view: LWW minus tombstones — read-after-delete finds nothing
    * (`keyvalue.re:28-31,37-39`).
    */
  def lwwView(log: DataFrame): DataFrame =
    lwwAll(log).filter(!col("deleted"))

  /** Point read (S4); empty result = the reference's `{}` / `""` default. */
  def read(log: DataFrame, id: String, key: String): DataFrame =
    lwwView(log.filter(col("id") === id && col("key") === key))
      .select("id", "key", "value", "write_ts")

  /** Live keys of an id (`keys.re:32-45`). */
  def keys(log: DataFrame, id: String): DataFrame =
    lwwView(log.filter(col("id") === id)).select("key")

  /** Live key count of an id (`keyvalue.re:35-36`). */
  def count(log: DataFrame, id: String): DataFrame =
    lwwView(log.filter(col("id") === id)).agg(org.apache.spark.sql.functions.count(lit(1)).as("count"))
}

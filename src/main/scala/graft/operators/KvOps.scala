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

  /** Diff of the store's live state between two log horizons `t1 <= t2`
    * (the backup/replication-delta primitive the reference's git-backed
    * store gets from `git diff` for free). A cell is `added` if live only
    * at `t2`, `removed` if live only at `t1` (tombstoned or never
    * written), `changed` if live at both with different values; unchanged
    * cells are dropped. Two LWW resolutions off the same `<= t2` scan
    * slice plus one full-outer join on the LWW shuffle key — callers
    * should pre-filter the RAW time column so the `t2` bound reaches the
    * parquet scan.
    */
  def snapshotDiff(log: DataFrame, t1: Long, t2: Long): DataFrame = {
    def snap(t: Long) = lwwView(log.filter(col("write_ts") <= t))
      .select(col("id"), col("key"), col("value"))
    val s1 = snap(t1).withColumnRenamed("value", "v1")
    val s2 = snap(t2).withColumnRenamed("value", "v2")
    s1.join(s2, Seq("id", "key"), "full_outer")
      .withColumn("status",
        when(col("v1").isNull, "added")
          .when(col("v2").isNull, "removed")
          .when(col("v1") =!= col("v2"), "changed")
          .otherwise("same"))
      .filter(col("status") =!= "same")
      .select("id", "key", "status")
  }
}

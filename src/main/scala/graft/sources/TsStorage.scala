package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout + write path for the TS table at cluster scale — the
  * Spark replacement for the reference's shard files + hand-built range
  * index (`/root/reference/src/timeseries/shard.re`,
  * `/root/reference/src/timeseries/index.re`).
  *
  * Layout: parquet partitioned by `(series_id, day)`. Partition pruning on
  * those directories plus parquet row-group min/max stats on `ts_ns` give
  * the same two-level skip as the reference's index (SURVEY §4 row 1) with
  * zero custom code — and it keeps working at 100 TB where the reference's
  * in-memory index cannot.
  *
  * Write path (S1): appends land as new files per partition — Spark's file
  * sink is the LSM-ish buffer+flush (`timeseries.re:133-148`) without the
  * mutable buffer. Out-of-order/late data simply lands in its (old) day
  * partition; readers always see buffer+disk merged because a partition is
  * just a directory listing (T7).
  *
  * Compaction (S2): the reference merges overlapping shards on flush
  * (`timeseries.re:57-111`); here overlap cannot happen (a row belongs to
  * exactly one partition), so compaction degenerates to coalescing small
  * files per partition — [[TsStorage.compact]], the OPTIMIZE analogue.
  */
object TsStorage {

  private def withDay(ts: DataFrame): DataFrame =
    ts.withColumn("day", date_format(timestamp_millis(col("t")), "yyyy-MM-dd"))

  /** Full (re)write of the TS table in the partitioned layout. */
  def write(ts: DataFrame, path: String): Unit =
    withDay(ts).write.partitionBy("series_id", "day")
      .mode(SaveMode.Overwrite).parquet(path)

  /** S1 ingest: append a batch (each micro-batch/file lands per partition). */
  def append(ts: DataFrame, path: String): Unit =
    withDay(ts).write.partitionBy("series_id", "day")
      .mode(SaveMode.Append).parquet(path)

  /** Read back as the canonical TS frame (partition columns restored). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select("series_id", "t", "value", "tags", "event_id", "ts_ns")

  /** S2 compaction analogue: rewrite each `(series_id, day)` partition's
    * many small files into at most `maxFilesPerPartition` (dynamic
    * partition overwrite leaves untouched partitions alone at cluster
    * scale; here we rewrite all). The bound is honored via an event-id
    * salt in the repartition key — repartitioning by the partition columns
    * alone would hash each whole partition to ONE task regardless of the
    * requested count ("at most" because distinct salts can still hash to
    * the same task).
    *
    * Swap order is crash-safe: the new table is fully written to a temp
    * dir, the old one renamed aside, the temp renamed in, and only then
    * the old dropped — at every intermediate point a complete copy exists
    * on disk (the reference's shard rewrite has the same
    * write-then-swap shape, `timeseries.re:57-111`).
    */
  def compact(spark: SparkSession, path: String, maxFilesPerPartition: Int = 1): Unit = {
    val salt = pmod(col("event_id"), lit(maxFilesPerPartition))
    val cur = spark.read.parquet(path)
      .withColumn("__salt", salt)
      .repartition(col("series_id"), col("day"), col("__salt"))
      .drop("__salt")
    val tmp = path.stripSuffix("/") + "_compacting"
    val old = path.stripSuffix("/") + "_old"
    cur.write.partitionBy("series_id", "day").mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val (pathP, tmpP, oldP) =
      (new org.apache.hadoop.fs.Path(path), new org.apache.hadoop.fs.Path(tmp),
       new org.apache.hadoop.fs.Path(old))
    fs.delete(oldP, true)
    fs.rename(pathP, oldP)
    fs.rename(tmpP, pathP)
    fs.delete(oldP, true)
  }
}

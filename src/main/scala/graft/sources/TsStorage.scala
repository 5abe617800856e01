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

  /** Read back as the canonical TS frame (partition columns restored).
    * `ts_ns` is optional (facade-ingested frames carry only epoch-ms `t`);
    * `blob` covers the blob-series layout, which shares this storage.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.parquet(path)
    val cols = Seq("series_id", "t", "value", "tags", "blob", "event_id", "ts_ns")
      .filter(raw.columns.contains)
    raw.select(cols.map(col): _*)
  }

  /** S6 delete at scale: durable delete-by-query as a PARTITION-scoped
    * anti-join rewrite — the Spark analogue of the reference's shard
    * rewrite (`timeseries.re:431-487`), replacing the facade's
    * collect+rebuild (which is correct for a membuf but a scale-killer on
    * a real table).
    *
    * Bystander semantics match [[graft.operators.TsOps.deleteByQuery]]:
    * every record of the QUERIED series sharing a matched timestamp dies,
    * including same-timestamp bystanders that don't match the tag filter.
    *
    * Only partitions that actually contain doomed rows are rewritten;
    * untouched partitions — the vast majority under a time-bounded delete —
    * are never read twice nor rewritten. The affected-partition collect is
    * partition METADATA (two strings per `(series, day)`), not data.
    *
    * Crash atomicity (the reference's every-write-is-a-commit analogue,
    * `timeseries.re:431-487` via Irmin): survivors are FULLY written to a
    * sibling temp dir first; only then is each affected partition dir
    * renamed aside and its rewritten twin renamed in, with every rename
    * result CHECKED (a false return aborts loudly rather than dropping a
    * partition silently). A job killed any time before the swap leaves
    * the table byte-identical (temp/trash siblings are invisible to
    * readers of `path`); a kill mid-swap leaves every partition either
    * old-complete or new-complete, never half-written. The one non-atomic
    * window — killed between parking a partition in the trash and renaming
    * its rewrite in — leaves that partition absent from reads until the
    * next [[delete]] call, whose leading [[recover]] sweep restores any
    * parked partition whose live dir is missing (full read-side atomicity
    * would need a manifest/commit file, documented as the Delta-shaped
    * upgrade). `onBeforeSwap` is the crash-injection test hook.
    */
  def delete(spark: SparkSession, path: String,
             ids: Seq[String], sel: graft.operators.Selector,
             pred: Option[graft.operators.TagPred],
             onBeforeSwap: () => Unit = () => ()): Unit = {
    import graft.operators.TsOps
    import org.apache.hadoop.fs.Path
    val root  = path.stripSuffix("/")
    val tmp   = root + "_delete_tmp"   // rewritten partitions land here first
    val trash = root + "_delete_old"   // originals parked here until the end
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // heal any previous delete killed mid-swap BEFORE reading the table
    recover(fs, root, tmp, trash)

    // partition-value inference types `day` as DATE; pin it back to the
    // directory string so collects and path building stay uniform
    val raw  = spark.read.parquet(path)
      .withColumn("day", col("day").cast("string"))
    val base = TsOps.selectSeries(raw, ids)
    val matchedTs = pred.foldLeft(TsOps.select(raw, ids, sel))(TsOps.tagFilter)
      .select(col("t").as("del_t")).distinct()
    val doomed = base.join(matchedTs, col("t") === col("del_t"), "left_semi")
    val affected = doomed.select("series_id", "day").distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    if (affected.isEmpty) return

    val affectedDf = spark.createDataFrame(affected.toSeq)
      .toDF("a_sid", "a_day")
    val survivors = base
      .join(broadcast(affectedDf),
        col("series_id") === col("a_sid") && col("day") === col("a_day"), "left_semi")
      .join(matchedTs, col("t") === col("del_t"), "left_anti")

    val survivorParts = survivors.select("series_id", "day").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val emptied = affected.filterNot(survivorParts)

    import org.apache.hadoop.fs.Path
    val esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName _

    // phase 1: materialize every surviving row of the affected partitions
    // OUTSIDE the table — the table itself is untouched until this commits
    if (survivorParts.nonEmpty)
      survivors.write.partitionBy("series_id", "day")
        .mode(SaveMode.Overwrite).parquet(tmp)
    onBeforeSwap()

    // phase 2: per-partition directory swap — each rename is atomic, so a
    // partition is always a complete old or complete new directory; a
    // failed rename aborts before the originals are dropped
    def renamed(from: Path, to: Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"delete swap rename failed: $from -> $to")
    affected.foreach { case (sid, day) =>
      val cur  = new Path(s"$root/series_id=${esc(sid)}/day=$day")
      val next = new Path(s"$tmp/series_id=${esc(sid)}/day=$day")
      val old  = new Path(s"$trash/series_id=${esc(sid)}/day=$day")
      fs.mkdirs(old.getParent)
      if (fs.exists(cur)) renamed(cur, old)
      if (fs.exists(next)) renamed(next, cur)
    }
    // drop series dirs left empty by whole-partition deletes
    emptied.map(_._1).distinct.foreach { sid =>
      val dir = new Path(s"$root/series_id=${esc(sid)}")
      if (fs.exists(dir) && fs.listStatus(dir).isEmpty) fs.delete(dir, true)
    }
    fs.delete(new Path(tmp), true); fs.delete(new Path(trash), true)
  }

  /** Self-healing sweep run at the start of every [[delete]]: a partition
    * parked in the trash sibling whose live directory is MISSING marks a
    * previous delete killed between its two swap renames — rename it back
    * before anything reads the table. Completed swaps (live dir present)
    * and pre-swap temp leftovers are plain garbage and are dropped.
    */
  private def recover(fs: org.apache.hadoop.fs.FileSystem, root: String,
                      tmp: String, trash: String): Unit = {
    import org.apache.hadoop.fs.Path
    val trashP = new Path(trash)
    if (fs.exists(trashP)) {
      for (sd <- fs.listStatus(trashP) if sd.getPath.getName.startsWith("series_id=");
           dd <- fs.listStatus(sd.getPath) if dd.getPath.getName.startsWith("day=")) {
        val live = new Path(s"$root/${sd.getPath.getName}/${dd.getPath.getName}")
        if (!fs.exists(live)) {
          fs.mkdirs(live.getParent)
          if (!fs.rename(dd.getPath, live))
            throw new java.io.IOException(s"delete recovery rename failed: ${dd.getPath} -> $live")
        }
      }
      fs.delete(trashP, true)
    }
    fs.delete(new Path(tmp), true)
  }

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

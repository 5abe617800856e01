package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.TsModel
import graft.sources.TsStorage

class StorageAndSqlSpec extends AnyFunSuite with SparkTestBase {

  private lazy val tmpRoot = {
    val p = new java.io.File("target/tmp-storage")
    p.mkdirs()
    p.getAbsolutePath
  }

  test("partitioned layout round-trips and prunes partitions (SURVEY §4 row 1)") {
    val ts = TsModel.ts(spark, "/root/testdata/sf0.001")
    val path = s"$tmpRoot/ts_part"
    TsStorage.write(ts, path)
    val back = TsStorage.read(spark, path)
    assert(back.count() === ts.count())
    // series filter must prune at PARTITION level, not row level
    val plan = back.filter(org.apache.spark.sql.functions.col("series_id") === "purchase")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("(series_id") && plan.contains("purchase"),
      s"no partition filter in:\n$plan")
    // values survive the round trip
    val a = ts.select("event_id", "value").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = back.select("event_id", "value").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a === b)
  }

  test("append lands new rows; compact preserves content (S1/S2)") {
    val ts = TsModel.ts(spark, "/root/testdata/sf0.001")
    val path = s"$tmpRoot/ts_append"
    TsStorage.write(ts, path)
    TsStorage.append(ts.limit(50), path)
    assert(TsStorage.read(spark, path).count() === ts.count() + 50)
    TsStorage.compact(spark, path)
    assert(TsStorage.read(spark, path).count() === ts.count() + 50)
    // single-file compaction: exactly one parquet file per partition dir
    def filesPerDir(p: String): Seq[Int] = {
      val dirs = for {
        sid <- new java.io.File(p).listFiles.toSeq if sid.getName.startsWith("series_id=")
        day <- sid.listFiles.toSeq if day.getName.startsWith("day=")
      } yield day.listFiles.count(_.getName.endsWith(".parquet"))
      dirs
    }
    assert(filesPerDir(path).forall(_ == 1))
    // the file-count bound is honored (salted repartition): <= 3 — via the
    // forced global re-cluster (every dir is at 1 file here, so the
    // partition-scoped compact would correctly skip them all)
    TsStorage.compactFull(spark, path, maxFilesPerPartition = 3)
    val counts = filesPerDir(path)
    assert(counts.forall(_ <= 3), s"over bound: $counts")
    assert(TsStorage.read(spark, path).count() === ts.count() + 50)
    // and the partition-scoped compact squeezes back under a tighter
    // bound, skipping already-single-file dirs
    TsStorage.compact(spark, path)
    assert(filesPerDir(path).forall(_ == 1))
    assert(TsStorage.read(spark, path).count() === ts.count() + 50)
  }

  test("storage delete rewrites only affected partitions, drops emptied ones (S6 at scale)") {
    import org.apache.spark.sql.functions.col
    val ts = TsModel.ts(spark, "/root/testdata/sf0.001")
    val path = s"$tmpRoot/ts_delete"
    TsStorage.write(ts, path)
    val before = TsStorage.read(spark, path)
    val total = before.count()
    // delete one series over a mid-January window (bystander semantics)
    val from = 1704844800000L; val to = 1705276800000L
    val doomedTs = before.filter(col("series_id") === "error" &&
      col("t") >= from && col("t") <= to).select("t").distinct()
      .collect().map(_.getLong(0)).toSet
    val expectDead = before.filter(col("series_id") === "error")
      .collect().count(r => doomedTs(r.getAs[Long]("t")))
    TsStorage.delete(spark, path, Seq("error"),
      graft.operators.TimeRange(from, to), None)
    val after = TsStorage.read(spark, path)
    assert(after.count() === total - expectDead)
    assert(after.filter(col("series_id") === "error" &&
      col("t") >= from && col("t") <= to).count() === 0)
    // other series untouched
    assert(after.filter(col("series_id") =!= "error").count() ===
      before.filter(col("series_id") =!= "error").count())
    // a whole-series delete drops every partition directory of that series
    TsStorage.delete(spark, path, Seq("click"),
      graft.operators.Since(0L), None)
    assert(TsStorage.read(spark, path).filter(col("series_id") === "click").count() === 0)
    assert(!new java.io.File(s"$path/series_id=click").exists())
  }

  test("tombstone delete: masked read equals the rewrite delete; compact folds it in") {
    import org.apache.spark.sql.functions.col
    val ts = TsModel.ts(spark, "/root/testdata/sf0.001")
    val ids = Seq("error")
    val range = graft.operators.TimeRange(1704844800000L, 1705276800000L)
    val pred = Some(graft.operators.TagContains("k", "5"))
    // twin tables, one per delete mechanism
    val pRewrite = s"$tmpRoot/ts_tomb_rewrite"
    val pTomb = s"$tmpRoot/ts_tomb_mor"
    for (p <- Seq(pRewrite, pTomb)) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
      TsStorage.write(ts, p)
    }
    TsStorage.delete(spark, pRewrite, ids, range, pred)
    TsStorage.tombstoneDelete(spark, pTomb, ids, range, pred)
    def rows(p: String) = TsStorage.read(spark, p)
      .select("series_id", "t", "value", "event_id")
      .collect().map(_.toString).sorted.toSeq
    // merge-on-read view identical to the physical rewrite
    assert(rows(pTomb) === rows(pRewrite))
    // the tombstoned rows are still physically present pre-compact
    assert(spark.read.parquet(pTomb).count() === ts.count())
    assert(new java.io.File(pTomb + "_tombstones").exists())
    // compact folds: set cleared, rows physically gone, view unchanged
    TsStorage.compact(spark, pTomb)
    assert(!new java.io.File(pTomb + "_tombstones").exists())
    assert(spark.read.parquet(pTomb).count() ===
      TsStorage.read(spark, pRewrite).count())
    assert(rows(pTomb) === rows(pRewrite))
    // chained: a second tombstone delete composes over the folded table
    val range2 = graft.operators.TimeRange(1705276800001L, 1705536000000L)
    TsStorage.tombstoneDelete(spark, pTomb, ids, range2, None)
    TsStorage.delete(spark, pRewrite, ids, range2, None)
    assert(rows(pTomb) === rows(pRewrite))
  }

  test("tombstone delete killed before its commit rename leaves the view unchanged") {
    val ts = TsModel.ts(spark, "/root/testdata/sf0.001")
    val path = s"$tmpRoot/ts_tomb_crash"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    TsStorage.write(ts, path)
    val before = TsStorage.read(spark, path).collect().map(_.toString).sorted
    val range = graft.operators.TimeRange(1704844800000L, 1705276800000L)
    val boom = intercept[RuntimeException] {
      TsStorage.tombstoneDelete(spark, path, Seq("error"), range, None,
        onBeforeCommit = () => throw new RuntimeException("injected crash"))
    }
    assert(boom.getMessage === "injected crash")
    // the batch never committed: full pre-delete view, tmp is garbage
    val after = TsStorage.read(spark, path).collect().map(_.toString).sorted
    assert(after.sameElements(before), "view changed across a pre-commit crash")
    assert(!new java.io.File(path + "_tombstones").exists())
    // the retry GCs the leftover tmp and commits atomically
    TsStorage.tombstoneDelete(spark, path, Seq("error"), range, None)
    assert(!new java.io.File(path + "_tombstones_tmp").exists())
    import org.apache.spark.sql.functions.col
    assert(TsStorage.read(spark, path).filter(col("series_id") === "error" &&
      col("t") >= range.fromMs && col("t") <= range.toMs).count() === 0)
  }

  test("delete killed between survivor write and swap leaves the table unchanged") {
    import org.apache.spark.sql.functions.col
    val ts = TsModel.ts(spark, "/root/testdata/sf0.001")
    val path = s"$tmpRoot/ts_delete_crash"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    TsStorage.write(ts, path)
    val before = TsStorage.read(spark, path)
      .collect().map(_.toString).sorted
    // kill the job after phase 1 (survivors fully written to the temp
    // sibling) but before any partition dir is swapped
    val boom = intercept[RuntimeException] {
      TsStorage.delete(spark, path, Seq("error"),
        graft.operators.TimeRange(1704844800000L, 1705276800000L), None,
        onBeforeSwap = () => throw new RuntimeException("injected crash"))
    }
    assert(boom.getMessage === "injected crash")
    val after = TsStorage.read(spark, path).collect().map(_.toString).sorted
    assert(after.sameElements(before), "table changed across a pre-swap crash")
    // a clean retry completes the delete
    TsStorage.delete(spark, path, Seq("error"),
      graft.operators.TimeRange(1704844800000L, 1705276800000L), None)
    assert(TsStorage.read(spark, path).filter(col("series_id") === "error" &&
      col("t") >= 1704844800000L && col("t") <= 1705276800000L).count() === 0)
  }

  test("delete killed mid-swap with the rewrite parked: READ rolls the partition forward") {
    import org.apache.spark.sql.functions._
    val ts = TsModel.ts(spark, "/root/testdata/sf0.001")
    val path = s"$tmpRoot/ts_delete_midswap"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    TsStorage.write(ts, path)
    // materialize the pre-delete content locally: the lazy frame would
    // re-list files the swap below moves out from under it
    case class R(sid: String, t: Long)
    val beforeRows = TsStorage.read(spark, path).select("series_id", "t")
      .collect().map(r => R(r.getString(0), r.getLong(1)))
    val total = beforeRows.length.toLong
    def dayOf(t: Long): String = java.time.Instant.ofEpochMilli(t)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    // mid-day bounds: the two boundary (series, day) partitions keep
    // survivors, so the tmp sibling holds rewritten twins to roll forward
    val from = 1704888000000L; val to = 1705233600000L
    val matched = beforeRows.filter(r => r.sid == "error" && r.t >= from && r.t <= to)
      .map(_.t).toSet
    // phase 1 completes (survivor rewrite fully in the tmp sibling), job
    // dies before any swap
    intercept[RuntimeException] {
      TsStorage.delete(spark, path, Seq("error"),
        graft.operators.TimeRange(from, to), None,
        onBeforeSwap = () => throw new RuntimeException("injected crash"))
    }
    // now simulate the kill one rename later: one affected partition parked
    // in the trash, its rewritten twin still in the tmp sibling
    val sid = new java.io.File(s"${path}_delete_tmp").listFiles()
      .filter(_.getName.startsWith("series_id=")).head
    val day = sid.listFiles().filter(_.getName.startsWith("day=")).head
    val trash = new java.io.File(s"${path}_delete_old/${sid.getName}")
    trash.mkdirs()
    assert(new java.io.File(s"$path/${sid.getName}/${day.getName}")
      .renameTo(new java.io.File(trash, day.getName)))
    // a plain READ heals: the twin (post-delete state) is renamed in — the
    // partition's doomed rows are gone, its survivors all present
    val dayStr = day.getName.stripPrefix("day=")
    val doomedInDay = beforeRows
      .count(r => r.sid == "error" && dayOf(r.t) == dayStr && matched(r.t))
    assert(doomedInDay > 0, "picked a partition the delete never touched")
    val healed = TsStorage.read(spark, path).select("series_id", "t")
      .collect().map(r => R(r.getString(0), r.getLong(1)))
    assert(healed.length.toLong === total - doomedInDay)
    assert(healed.filter(r => r.sid == "error" && dayOf(r.t) == dayStr)
      .forall(r => !matched(r.t)))
    // retrying the delete completes the remaining partitions and GCs the
    // siblings (idempotent: the healed partition's matched rows stay gone)
    TsStorage.delete(spark, path, Seq("error"),
      graft.operators.TimeRange(from, to), None)
    assert(!new java.io.File(s"${path}_delete_tmp").exists())
    assert(!new java.io.File(s"${path}_delete_old").exists())
    val after = TsStorage.read(spark, path)
    assert(after.filter(col("series_id") === "error" &&
      col("t") >= from && col("t") <= to).count() === 0)
    assert(after.count() === total -
      beforeRows.count(r => r.sid == "error" && matched(r.t)))
  }

  test("delete killed AT the manifest commit: reads see the intact pre-delete table, the next WRITER applies the whole call") {
    import org.apache.spark.sql.functions.col
    val ts = TsModel.ts(spark, "/root/testdata/sf0.001")
    val path = s"$tmpRoot/ts_delete_manifest"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    TsStorage.write(ts, path)
    case class R(sid: String, t: Long)
    val beforeRows = TsStorage.read(spark, path).select("series_id", "t")
      .collect().map(r => R(r.getString(0), r.getLong(1)))
    val total = beforeRows.length.toLong
    // mid-day bounds again: both survivor and emptied partitions exist, so
    // the writer's completion must both roll twins in AND remove unparked
    // emptied dirs
    val from = 1704888000000L; val to = 1705233600000L
    val matched = beforeRows.filter(r => r.sid == "error" && r.t >= from && r.t <= to)
      .map(_.t).toSet
    val expect = total - beforeRows.count(r => r.sid == "error" && matched(r.t))
    // kill at the commit point: manifest written, ZERO partitions swapped
    intercept[RuntimeException] {
      TsStorage.delete(spark, path, Seq("error"),
        graft.operators.TimeRange(from, to), None,
        onAfterManifest = () => throw new RuntimeException("injected crash"))
    }
    assert(new java.io.File(s"${path}_delete_manifest").exists())
    // reader mode is NON-destructive: nothing is missing yet, so reads see
    // the intact PRE-delete table ("none of it") and leave the manifest
    // for the single writer — a reader must never park live dirs
    assert(TsStorage.read(spark, path).count() === total)
    assert(new java.io.File(s"${path}_delete_manifest").exists())
    // the next WRITER entry completes the ENTIRE committed call
    TsStorage.recover(spark, path)
    assert(!new java.io.File(s"${path}_delete_manifest").exists())
    val after = TsStorage.read(spark, path)
    assert(after.count() === expect)
    assert(after.filter(col("series_id") === "error" &&
      col("t") >= from && col("t") <= to).count() === 0)
    // the next delete GCs the leftovers and the table stays settled
    TsStorage.delete(spark, path, Seq("no-such-series"),
      graft.operators.Since(Long.MaxValue), None)
    assert(!new java.io.File(s"${path}_delete_tmp").exists())
    assert(!new java.io.File(s"${path}_delete_old").exists())
    assert(TsStorage.read(spark, path).count() === expect)
  }

  test("delete killed mid-manifest-swap: reads heal the gap; the writer completes the rest") {
    import org.apache.spark.sql.functions.col
    val ts = TsModel.ts(spark, "/root/testdata/sf0.001")
    val path = s"$tmpRoot/ts_delete_manifest_mid"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    TsStorage.write(ts, path)
    case class R(sid: String, t: Long)
    val beforeRows = TsStorage.read(spark, path).select("series_id", "t")
      .collect().map(r => R(r.getString(0), r.getLong(1)))
    val total = beforeRows.length.toLong
    def dayOf(t: Long): String = java.time.Instant.ofEpochMilli(t)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    val from = 1704888000000L; val to = 1705233600000L
    val matched = beforeRows.filter(r => r.sid == "error" && r.t >= from && r.t <= to)
      .map(_.t).toSet
    val expect = total - beforeRows.count(r => r.sid == "error" && matched(r.t))
    intercept[RuntimeException] {
      TsStorage.delete(spark, path, Seq("error"),
        graft.operators.TimeRange(from, to), None,
        onAfterManifest = () => throw new RuntimeException("injected crash"))
    }
    // hand-advance the swap one step: one survivor partition parked (the
    // state after its first rename) — the guard the all-unswapped test
    // cannot reach
    val sid = new java.io.File(s"${path}_delete_tmp").listFiles()
      .filter(_.getName.startsWith("series_id=")).head
    val day = sid.listFiles().filter(_.getName.startsWith("day=")).head
    val trash = new java.io.File(s"${path}_delete_old/${sid.getName}")
    trash.mkdirs()
    assert(new java.io.File(s"$path/${sid.getName}/${day.getName}")
      .renameTo(new java.io.File(trash, day.getName)))
    // a plain read heals the GAP from the twin (that partition shows its
    // post-delete rewrite; unswapped partitions still show pre-delete)
    val dayStr = day.getName.stripPrefix("day=")
    val doomedInDay = beforeRows
      .count(r => r.sid == "error" && dayOf(r.t) == dayStr && matched(r.t))
    assert(doomedInDay > 0)
    assert(TsStorage.read(spark, path).count() === total - doomedInDay)
    assert(new java.io.File(s"${path}_delete_manifest").exists())
    // the writer completes the remaining partitions from the manifest —
    // including re-using the already-healed one without re-parking it
    TsStorage.recover(spark, path)
    val after = TsStorage.read(spark, path)
    assert(after.count() === expect)
    assert(after.filter(col("series_id") === "error" &&
      col("t") >= from && col("t") <= to).count() === 0)
    assert(!new java.io.File(s"${path}_delete_manifest").exists())
  }

  test("writer park vs reader heal race: survivors never nest into the trash") {
    import org.apache.spark.sql.functions.col
    val ts = TsModel.ts(spark, "/root/testdata/sf0.001")
    val path = s"$tmpRoot/ts_delete_race"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    TsStorage.write(ts, path)
    val before = TsStorage.read(spark, path).select("series_id", "t")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val from = 1704888000000L; val to = 1705233600000L
    val matched = before.filter(r => r._1 == "error" && r._2 >= from && r._2 <= to)
      .map(_._2).toSet
    val expect = before.length - before.count(r => r._1 == "error" && matched(r._2))
    intercept[RuntimeException] {
      TsStorage.delete(spark, path, Seq("error"),
        graft.operators.TimeRange(from, to), None,
        onAfterManifest = () => throw new RuntimeException("injected crash"))
    }
    // hand-advance one survivor partition to the crashed-mid-swap state the
    // advisory names: original parked in the trash, twin present, live
    // missing — the writer's next pass must finish the roll-in
    val sid = new java.io.File(s"${path}_delete_tmp").listFiles()
      .filter(_.getName.startsWith("series_id=")).head
    val day = sid.listFiles().filter(_.getName.startsWith("day=")).head
    val rel = s"${sid.getName}/${day.getName}"
    val trash = new java.io.File(s"${path}_delete_old/${sid.getName}")
    trash.mkdirs()
    assert(new java.io.File(s"$path/$rel").renameTo(new java.io.File(trash, day.getName)))
    // inject a concurrent reader at the worst instant: AFTER the writer has
    // seen the twin, the reader's non-destructive repair rolls the twin
    // into the missing live dir. The unguarded writer then re-parked the
    // healed dir into the OCCUPIED trash slot and lost the survivors.
    var fired = 0
    TsStorage.onSurvivorTwinChecked = { r =>
      if (r == rel && fired == 0) {
        fired += 1
        val live = new java.io.File(s"$path/$r")
        val twin = new java.io.File(s"${path}_delete_tmp/$r")
        if (!live.exists() && twin.exists()) {
          live.getParentFile.mkdirs()
          assert(twin.renameTo(live))
        }
      }
    }
    try TsStorage.recover(spark, path)
    finally TsStorage.onSurvivorTwinChecked = _ => ()
    assert(fired === 1)
    // the whole delete completed: manifest consumed, survivors present,
    // nothing nested inside the occupied trash entry
    assert(!new java.io.File(s"${path}_delete_manifest").exists())
    assert(!new java.io.File(s"${path}_delete_old/$rel/${day.getName}").exists())
    val after = TsStorage.read(spark, path)
    assert(after.count() === expect)
    assert(after.filter(col("series_id") === "error" &&
      col("t") >= from && col("t") <= to).count() === 0)
  }

  test("parked partition with NO twin is a committed delete — never resurrected") {
    import org.apache.spark.sql.functions._
    val ts = TsModel.ts(spark, "/root/testdata/sf0.001")
    val path = s"$tmpRoot/ts_delete_emptied"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    TsStorage.write(ts, path)
    val before = TsStorage.read(spark, path)
    val total = before.count()
    // the advisory's window: a whole-partition (emptied) delete crashed
    // AFTER its swap — partition parked in the trash, no tmp twin, trash
    // cleanup never ran. The parked bytes are the DELETED rows.
    val sid = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("series_id=")).head
    val day = sid.listFiles().filter(_.getName.startsWith("day=")).head
    val dayStr = day.getName.stripPrefix("day=")
    val rowsInDay = before
      .withColumn("day", date_format(timestamp_millis(col("t")), "yyyy-MM-dd"))
      .filter(col("series_id") === sid.getName.stripPrefix("series_id=") &&
        col("day") === dayStr).count()
    val trash = new java.io.File(s"${path}_delete_old/${sid.getName}")
    trash.mkdirs()
    assert(day.renameTo(new java.io.File(trash, day.getName)))
    // neither reads nor the next delete may restore it
    assert(TsStorage.read(spark, path).count() === total - rowsInDay)
    TsStorage.delete(spark, path, Seq("no-such-series"),
      graft.operators.Since(Long.MaxValue), None)
    assert(!new java.io.File(s"${path}_delete_old").exists())
    assert(TsStorage.read(spark, path).count() === total - rowsInDay)
  }

  test("compact killed between its two renames: read rolls forward via _SUCCESS") {
    val ts = TsModel.ts(spark, "/root/testdata/sf0.001")
    val path = s"$tmpRoot/ts_compact_fwd"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    TsStorage.write(ts, path)
    val total = TsStorage.read(spark, path).count()
    // crash state: rewrite fully committed (_SUCCESS present), original
    // renamed aside, table root MISSING — the window the round-5 verdict
    // flagged as having no healing at all
    val root = new java.io.File(path)
    val tmp = new java.io.File(s"${path}_compacting")
    val old = new java.io.File(s"${path}_old")
    org.apache.commons.io.FileUtils.copyDirectory(root, tmp)
    assert(root.renameTo(old))
    // make the parked original distinguishable: drop one partition from it,
    // so rolling BACK would lose rows while rolling FORWARD keeps them all
    val sacrificed = old.listFiles().filter(_.getName.startsWith("series_id=")).head
    org.apache.commons.io.FileUtils.deleteDirectory(sacrificed)
    assert(TsStorage.read(spark, path).count() === total) // rolled forward
    assert(!old.exists(), "forward commit must clear the parked original")
  }

  test("blob-table compact killed between its two renames: facade heals, blobs intact") {
    val path = s"$tmpRoot/ts_blob_compact_crash"
    for (p <- Seq(path, s"${path}_blob", s"${path}_blob_compacting", s"${path}_blob_old"))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    val e = new GraftEngine(spark, () => 1700000000000L, tsStoragePath = Some(path))
    assert(e.post("/ts/blob/cam/at/1000", """{"frame": "AAAA"}""").isRight)
    assert(e.post("/ts/blob/cam/at/2000", """{"frame": "BBBB"}""").isRight)
    assert(e.post("/ts/blob/mic/at/1500", """{"pcm": "CCCC"}""").isRight)
    e.compact() // flushes the write-behind buffer and compacts both tables
    val want = e.get("/ts/blob/cam/last/2")
    // crash state on the BLOB sibling: rewrite committed (_SUCCESS), original
    // parked aside, table root missing — the window between compact's two
    // renames; the numeric table is untouched
    val root = new java.io.File(s"${path}_blob")
    val tmp = new java.io.File(s"${path}_blob_compacting")
    val old = new java.io.File(s"${path}_blob_old")
    org.apache.commons.io.FileUtils.copyDirectory(root, tmp)
    assert(root.renameTo(old))
    // make roll-back distinguishable: the parked original loses a partition
    val sacrificed = old.listFiles().filter(_.getName.startsWith("series_id=")).head
    org.apache.commons.io.FileUtils.deleteDirectory(sacrificed)
    // a FRESH engine over the same path must roll the blob table forward at
    // construction and serve every blob
    val e2 = new GraftEngine(spark, () => 1700000000000L, tsStoragePath = Some(path))
    assert(e2.get("/ts/blob/cam/last/2") === want)
    assert(e2.get("/ts/blob/mic/length") === """{"length": 1}""")
    assert(!old.exists(), "forward commit must clear the parked original")
  }

  test("compact killed mid-rewrite (no _SUCCESS): read rolls back to the original") {
    val ts = TsModel.ts(spark, "/root/testdata/sf0.001")
    val path = s"$tmpRoot/ts_compact_back"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    TsStorage.write(ts, path)
    val total = TsStorage.read(spark, path).count()
    val root = new java.io.File(path)
    val tmp = new java.io.File(s"${path}_compacting")
    val old = new java.io.File(s"${path}_old")
    // crash state: incomplete rewrite (no _SUCCESS, partition missing),
    // original parked, table root missing
    org.apache.commons.io.FileUtils.copyDirectory(root, tmp)
    assert(new java.io.File(tmp, "_SUCCESS").delete())
    org.apache.commons.io.FileUtils.deleteDirectory(
      tmp.listFiles().filter(_.getName.startsWith("series_id=")).head)
    assert(root.renameTo(old))
    assert(TsStorage.read(spark, path).count() === total) // rolled back
    assert(!tmp.exists(), "rollback must drop the incomplete rewrite")
  }

  test("facade backed by TsStorage: post/read/delete against parquet, no membuf") {
    val path = s"$tmpRoot/ts_facade"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val e = new GraftEngine(spark, () => 1700000000000L, tsStoragePath = Some(path))
    assert(e.post("/ts/sensor/at/1000", """{"value": 1}""").isRight)
    assert(e.post("/ts/sensor/at/2000", """{"value": 2, "room": "lounge"}""").isRight)
    assert(e.post("/ts/other/at/1500", """{"value": 7}""").isRight)
    assert(e.get("/ts/sensor/length") === """{"length": 2}""")
    assert(e.get("/ts/sensor/latest") ===
      """[{"timestamp": 2000, "data": {"value": 2, "room": "lounge"}}]""")
    // durable delete through the facade, then re-read from disk
    assert(e.delete("/ts/sensor/range/1500/2500").isRight)
    assert(e.get("/ts/sensor/length") === """{"length": 1}""")
    assert(e.get("/ts/other/length") === """{"length": 1}""")
    // a fresh engine over the same path sees the post-delete state
    val e2 = new GraftEngine(spark, () => 1700000000000L, tsStoragePath = Some(path))
    assert(e2.get("/ts/sensor/latest") === """[{"timestamp": 1000, "data": {"value": 1}}]""")
  }

  test("storage-backed facade edge cases: empty table, pre-write delete, id resume") {
    val path = s"$tmpRoot/ts_facade_edge"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val e = new GraftEngine(spark, () => 1700000000000L, tsStoragePath = Some(path))
    // delete and read before ANY write: no-op / empty, not a crash
    assert(e.delete("/ts/x/range/0/10").isRight)
    assert(e.get("/ts/x/length") === """{"length": 0}""")
    assert(e.post("/ts/x/at/1000", """{"value": 1}""").isRight)
    assert(e.post("/ts/x/at/2000", """{"value": 2}""").isRight)
    // delete EVERYTHING: the table dir remains but holds no partitions —
    // reads must fall back to the empty frame
    assert(e.delete("/ts/x/since/0").isRight)
    assert(e.get("/ts/x/length") === """{"length": 0}""")
    // a restarted engine resumes the event-id sequence from the table
    assert(e.post("/ts/x/at/3000", """{"value": 3}""").isRight)
    val e2 = new GraftEngine(spark, () => 1700000000000L, tsStoragePath = Some(path))
    assert(e2.post("/ts/x/at/3000", """{"value": 9}""").isRight)
    // same timestamp, later write: the new row must WIN the tie, which it
    // only can if its event_id continued past the persisted one
    assert(e2.get("/ts/x/latest") === """[{"timestamp": 3000, "data": {"value": 9}}]""")
  }

  test("append into a crashed-compact state heals first; the rewrite is never orphaned") {
    import org.apache.spark.sql.functions.col
    val ts = TsModel.ts(spark, "/root/testdata/sf0.001")
    val path = s"$tmpRoot/ts_append_heal"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    TsStorage.write(ts, path)
    val total = TsStorage.read(spark, path).count()
    val extra = TsStorage.read(spark, path).orderBy(col("event_id").desc).limit(1)
      .withColumn("t", col("t") + 999999999L)
      .withColumn("event_id", col("event_id") + 1)
    val extraRows = extra.collect() // materialize before the files move
    val extraDf = spark.createDataFrame(
      spark.sparkContext.parallelize(extraRows.toSeq), extra.schema)
    // crash state: the whole table sits in the committed rewrite (root
    // missing). An append that did NOT heal first would create a root
    // holding only the new row — and the next compact would then GC the
    // parked rewrite, silently dropping the entire pre-crash table.
    assert(new java.io.File(path).renameTo(new java.io.File(s"${path}_compacting")))
    TsStorage.append(extraDf, path)
    assert(TsStorage.read(spark, path).count() === total + 1)
    TsStorage.compact(spark, path)
    assert(TsStorage.read(spark, path).count() === total + 1)
    assert(!new java.io.File(s"${path}_compacting").exists())
  }

  test("write-behind ingest batches appends; facade compact sweeps numeric AND blob") {
    val path = s"$tmpRoot/ts_writebehind"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"${path}_blob"))
    val e = new GraftEngine(spark, () => 1700000000000L, tsStoragePath = Some(path),
      flushEveryRows = 4)
    // three posts stay pending: no Spark job, no parquet file per POST
    assert(e.post("/ts/s/at/1000", """{"value": 1}""").isRight)
    assert(e.post("/ts/s/at/2000", """{"value": 2}""").isRight)
    assert(e.post("/ts/s/at/3000", """{"value": 3}""").isRight)
    assert(!new java.io.File(path).exists())
    // reads flush first: read-your-writes holds across the buffer
    assert(e.get("/ts/s/length") === """{"length": 3}""")
    assert(new java.io.File(path).exists())
    assert(e.post("/ts/s/at/4000", """{"value": 4}""").isRight)
    assert(e.post("/ts/s/at/5000", """{"value": 5}""").isRight) // pending
    // blob writes ride the same write-behind; their reads flush too
    assert(e.post("/ts/blob/b/at/1000", """{"x": 1}""").isRight)
    assert(e.get("/ts/blob/b/length") === """{"length": 1}""")
    // durable delete flushes pending rows first (they must not survive)
    assert(e.post("/ts/s/at/6000", """{"value": 6}""").isRight)
    assert(e.delete("/ts/s/range/5500/6500").isRight)
    assert(e.get("/ts/s/length") === """{"length": 5}""")
    // facade compact: flushes, then coalesces BOTH tables to 1 file/partition
    e.compact()
    def files(p: String) = for {
      sid <- new java.io.File(p).listFiles.toSeq if sid.getName.startsWith("series_id=")
      day <- sid.listFiles.toSeq if day.getName.startsWith("day=")
    } yield day.listFiles.count(_.getName.endsWith(".parquet"))
    assert(files(path).nonEmpty && files(path).forall(_ == 1))
    assert(files(s"${path}_blob").nonEmpty && files(s"${path}_blob").forall(_ == 1))
    // a fresh engine over the same path sees the flushed state
    val e2 = new GraftEngine(spark, () => 1700000000000L, tsStoragePath = Some(path))
    assert(e2.get("/ts/s/length") === """{"length": 5}""")
    assert(e2.get("/ts/blob/b/length") === """{"length": 1}""")
  }

  test("bucketed tables co-locate the fact join: no Exchange in the plan") {
    import org.apache.spark.sql.functions.col
    val s = spark // bucketed tables land in the default spark-warehouse dir
    val d = "/root/testdata/sf0.001"
    Seq("orders_bkt", "lineitem_bkt").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      // the catalog is in-memory but the location persists across JVMs
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"spark-warehouse/$t"))
    }
    // bucket both join sides by the key; at 100 TB this is written once at
    // ingest and every orderkey join afterwards skips its shuffle
    Tables.orders(s, d).write.bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").mode("overwrite").saveAsTable("orders_bkt")
    Tables.lineitem(s, d).write.bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").mode("overwrite").saveAsTable("lineitem_bkt")
    val prevThresh = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the merge path
    try {
      val j = s.table("lineitem_bkt").join(s.table("orders_bkt"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(j.count() === Tables.lineitem(s, d).count()) // FK join keeps all lineitems
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("blob series round-trip through the partitioned layout") {
    import org.apache.spark.sql.functions.col
    val blob = TsModel.tsBlob(spark, "/root/testdata/sf0.001")
    val path = s"$tmpRoot/ts_blob"
    TsStorage.write(blob, path)
    val back = TsStorage.read(spark, path)
    assert(back.columns.contains("blob"))
    val a = blob.select("event_id", "blob").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val b = back.select("event_id", "blob").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
    // delete works over the blob layout too (shared storage code path)
    TsStorage.delete(spark, path, Seq("purchase"), graft.operators.Since(0L), None)
    assert(TsStorage.read(spark, path).filter(col("series_id") === "purchase").count() === 0)
  }

  test("custom expressions usable from spark.sql after register()") {
    GraftFunctions.register(spark)
    GraftFunctions.registerViews(spark, "/root/testdata/sf0.001")
    val sim = spark.sql(
      "SELECT cosine_sim(CAST(array(1.0,2.0) AS array<double>), CAST(array(2.0,4.0) AS array<double>)) AS s")
      .head().getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
    val sh = spark.sql("SELECT simhash64(array('a','b')) AS h").head().getLong(0)
    assert(sh === spark.sql("SELECT simhash64(array('a','b')) AS h").head().getLong(0))
    val top = spark.sql(
      """SELECT series_id, inline(topk_rows(struct(t, event_id, value), 2, true))
        |FROM ts GROUP BY series_id""".stripMargin)
    assert(top.count() === 10) // 5 series x 2
    // free-form SQL over the TS view
    val agg = spark.sql("SELECT max(value) FROM ts WHERE series_id = 'purchase'")
    assert(agg.head().getDouble(0) > 0)
  }

  test("GraftExtensions wires the same functions for new sessions") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e) // builds without error; injection is
    // exercised for real through the registry path above (same builders)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 pins: the mechanical gate-key-uniqueness guard, the tombstone
  * write-horizon, partition-scoped incremental compaction, and the
  * incremental graph-layout append.
  */
class Round11OpsSpec extends AnyFunSuite with SparkTestBase {

  // ---- gate-roster uniqueness guard (r10 verdict item 2) ------------------

  test("uniqueMap trips on a planted duplicate key") {
    val e = intercept[IllegalArgumentException] {
      SparkEntry.uniqueMap("a" -> 1, "b" -> 2, "a" -> 3)
    }
    assert(e.getMessage.contains("duplicate gate keys"))
    assert(e.getMessage.contains("a"))
  }

  test("gate rosters construct (no duplicates) and pair completely") {
    // touching either val would throw on a duplicate — this test makes the
    // guard part of every suite run, not just Verify/Bench
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without bodies: ${(o -- q).toSeq.sorted}")
  }

  // ---- TS storage: tombstone write-horizon + incremental compact ----------

  private val tmpRoot = {
    val d = new java.io.File("target/tmp-round11-storage")
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.mkdirs()
    d.getAbsolutePath
  }

  /** 3 series x 3 days x 4 rows, event_ids 0..35 — small but multi-
    * partition, so partition-scoped claims are observable.
    */
  private def fixture: org.apache.spark.sql.DataFrame = {
    val day0 = 1704067200000L // 2024-01-01
    tsFrame(for {
      (sid, si) <- Seq("alpha", "beta", "gamma").zipWithIndex
      d <- 0 until 3
      i <- 0 until 4
    } yield (sid, day0 + d * 86400000L + i * 1000L,
      (si * 100 + d * 10 + i).toDouble, Map("k" -> i.toString),
      (si * 12 + d * 4 + i).toLong))
  }

  private def files(p: String): Map[String, (Long, Long)] = {
    val out = scala.collection.mutable.Map[String, (Long, Long)]()
    def walk(f: java.io.File, rel: String): Unit =
      if (f.isDirectory) f.listFiles.foreach(c => walk(c, s"$rel/${c.getName}"))
      else out(rel) = (f.length(), f.lastModified())
    walk(new java.io.File(p), "")
    out.toMap
  }

  test("tombstone write-horizon: append after delete is visible without compact") {
    import graft.sources.TsStorage
    import graft.operators.{TimeRange, Since}
    val path = s"$tmpRoot/horizon"
    TsStorage.write(fixture, path)
    val day0 = 1704067200000L
    // kill alpha's day-0 rows (t in [day0, day0+4000))
    TsStorage.tombstoneDelete(spark, path, Seq("alpha"),
      TimeRange(day0, day0 + 3000L), None)
    assert(TsStorage.read(spark, path)
      .filter(col("series_id") === "alpha" && col("t") < day0 + 86400000L)
      .count() === 0L)
    // re-ingest two rows at two of the SAME (series, t) keys, higher ids
    TsStorage.append(tsFrame(Seq(
      ("alpha", day0, 7.5, Map("k" -> "9"), 100L),
      ("alpha", day0 + 1000L, 8.5, Map("k" -> "9"), 101L))), path)
    val back = TsStorage.read(spark, path)
      .filter(col("series_id") === "alpha" && col("t") < day0 + 86400000L)
      .select("t", "value", "event_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sorted
    // the appends are visible IMMEDIATELY (no compact ran); the pre-delete
    // rows at those keys stay dead (their ids are at/below the horizon)
    assert(back === Seq((day0, 7.5, 100L), (day0 + 1000L, 8.5, 101L)),
      s"masked or resurrected: ${back.toSeq}")
    // and the fold preserves exactly that view
    TsStorage.compact(spark, path)
    val after = TsStorage.read(spark, path)
      .filter(col("series_id") === "alpha" && col("t") < day0 + 86400000L)
      .select("t", "value", "event_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sorted
    assert(after === back)
    assert(!new java.io.File(path + "_tombstones").exists())
  }

  test("incremental compact touches only tombstoned / over-bound partitions") {
    import graft.sources.TsStorage
    import graft.operators.TimeRange
    val path = s"$tmpRoot/inc"
    TsStorage.write(fixture, path)
    val day0 = 1704067200000L
    // tombstone part of beta's day 1; alpha and gamma are bystanders
    TsStorage.tombstoneDelete(spark, path, Seq("beta"),
      TimeRange(day0 + 86400000L, day0 + 86400000L + 1000L), None)
    val preView = TsStorage.read(spark, path)
      .select("series_id", "t", "event_id")
      .collect().map(_.toString).sorted.toSeq
    val pre = files(path)
    TsStorage.compact(spark, path, maxFilesPerPartition = 4)
    val post = files(path)
    // every file OUTSIDE beta/day-1 is byte-identical (same name, size,
    // mtime — never rewritten, never copied)
    val touched = "/series_id=beta/day=2024-01-02"
    for ((rel, sig) <- pre if !rel.startsWith(touched) && !rel.endsWith("_SUCCESS"))
      assert(post.get(rel).contains(sig), s"untouched file changed: $rel")
    // beta/day-1 WAS rewritten (its old files are gone)
    assert(pre.keys.exists(_.startsWith(touched)))
    assert(pre.keys.filter(_.startsWith(touched)).forall(!post.contains(_)),
      "tombstoned partition not rewritten")
    // view unchanged, set cleared, rows physically gone
    val postView = TsStorage.read(spark, path)
      .select("series_id", "t", "event_id")
      .collect().map(_.toString).sorted.toSeq
    assert(postView === preView)
    assert(!new java.io.File(path + "_tombstones").exists())
    assert(spark.read.parquet(path).count() === preView.size.toLong)
  }

  test("incremental compact: fully-tombstoned partition commits as Emptied") {
    import graft.sources.TsStorage
    import graft.operators.TimeRange
    val path = s"$tmpRoot/empt"
    TsStorage.write(fixture, path)
    val day0 = 1704067200000L
    // kill ALL of gamma's day 2
    TsStorage.tombstoneDelete(spark, path, Seq("gamma"),
      TimeRange(day0 + 2 * 86400000L, day0 + 2 * 86400000L + 4000L), None)
    TsStorage.compact(spark, path, maxFilesPerPartition = 4)
    assert(!new java.io.File(s"$path/series_id=gamma/day=2024-01-03").exists(),
      "emptied partition dir survived the fold")
    assert(TsStorage.read(spark, path)
      .filter(col("series_id") === "gamma").count() === 8L)
  }

  test("incremental compact killed at the per-partition swap completes on recovery") {
    import graft.sources.TsStorage
    import graft.operators.TimeRange
    val path = s"$tmpRoot/crash"
    TsStorage.write(fixture, path)
    val day0 = 1704067200000L
    TsStorage.tombstoneDelete(spark, path, Seq("beta"),
      TimeRange(day0, day0 + 1000L), None)
    val want = TsStorage.read(spark, path)
      .select("series_id", "t", "event_id")
      .collect().map(_.toString).sorted.toSeq
    // kill AFTER the manifest commit, BEFORE any partition swaps
    val boom = new RuntimeException("kill: post-commit")
    val thrown = intercept[RuntimeException] {
      TsStorage.compact(spark, path, maxFilesPerPartition = 4,
        onAfterManifest = () => throw boom)
    }
    assert(thrown eq boom)
    assert(new java.io.File(path + "_delete_manifest").exists())
    // a READER heals only non-destructively; its view is still correct
    // (live dirs intact + tombstone set still masking)
    assert(TsStorage.read(spark, path)
      .select("series_id", "t", "event_id")
      .collect().map(_.toString).sorted.toSeq === want)
    // the next WRITER entry completes the fold in full
    TsStorage.recover(spark, path)
    assert(!new java.io.File(path + "_delete_manifest").exists())
    assert(TsStorage.read(spark, path)
      .select("series_id", "t", "event_id")
      .collect().map(_.toString).sorted.toSeq === want)
    // a fresh compact clears the (now no-op) tombstone set left by the
    // crashed call — the documented idempotent tail
    TsStorage.compact(spark, path, maxFilesPerPartition = 4)
    assert(!new java.io.File(path + "_tombstones").exists())
    assert(TsStorage.read(spark, path)
      .select("series_id", "t", "event_id")
      .collect().map(_.toString).sorted.toSeq === want)
  }

  test("pagerank: knownNodeCount skips the probe, output bit-identical") {
    val s = spark
    import s.implicits._
    import graft.operators.Graph
    val edges = Seq(("a", "b", 3L), ("b", "c", 2L), ("c", "a", 1L),
      ("a", "c", 1L), ("c", "b", 4L)).toDF("src", "dst", "c")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val auto = rows(Graph.pagerank(edges, maxIters = 4, tolMicros = 0L))
    // known count, broadcast regime
    assert(rows(Graph.pagerank(edges, maxIters = 4, tolMicros = 0L,
      knownNodeCount = Some(3L))) === auto)
    // known count forcing the shuffle regime — same ranks either way
    assert(rows(Graph.pagerank(edges, maxIters = 4, tolMicros = 0L,
      broadcastNodeLimit = 0L, knownNodeCount = Some(3L))) === auto)
  }

  // ---- facade merge-on-read deletes ---------------------------------------

  test("facade mergeOnReadDeletes: identical reads to the rewrite engine, fold on compact") {
    def build(path: String, mor: Boolean): GraftEngine = {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      val e = new GraftEngine(spark, () => 1700000000000L,
        tsStoragePath = Some(path), mergeOnReadDeletes = mor)
      for (i <- 1 to 8)
        assert(e.post(s"/ts/x/at/${i * 1000}", s"""{"value": $i}""").isRight)
      assert(e.delete("/ts/x/range/3000/5000").isRight)
      e
    }
    val eRw = build(s"$tmpRoot/facade_rw", mor = false)
    val eMor = build(s"$tmpRoot/facade_mor", mor = true)
    for (q <- Seq("/ts/x/length", "/ts/x/latest", "/ts/x/earliest",
        "/ts/x/since/0"))
      assert(eMor.get(q) === eRw.get(q), q)
    // the MOR table still physically holds every row until the fold
    assert(new java.io.File(s"$tmpRoot/facade_mor_tombstones").exists())
    eMor.compact()
    assert(!new java.io.File(s"$tmpRoot/facade_mor_tombstones").exists())
    for (q <- Seq("/ts/x/length", "/ts/x/since/0"))
      assert(eMor.get(q) === eRw.get(q), s"post-fold $q")
    // append at a deleted timestamp AFTER the delete: visible immediately
    // (write horizon), no compact needed
    assert(eMor.post("/ts/x/at/4000", """{"value": 44}""").isRight)
    assert(eMor.get("/ts/x/range/4000/4000")
      .contains("\"value\": 44"))
  }

  test("tombstone-masked read keeps partition pruning on the series filter") {
    import graft.sources.TsStorage
    import graft.operators.TimeRange
    val path = s"$tmpRoot/maskpush"
    TsStorage.write(fixture, path)
    TsStorage.tombstoneDelete(spark, path, Seq("alpha"),
      TimeRange(1704067200000L, 1704067201000L), None)
    // the anti-join must not block the series predicate from reaching the
    // scan: at 100 TB an unpruned masked read turns every small query
    // into a table scan
    val plan = TsStorage.read(spark, path)
      .filter(col("series_id") === "beta")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("beta"),
      s"series filter not pruning partitions under the mask:\n${plan.take(3000)}")
  }

  test("restarted engine resumes ids past a tombstone horizon, not the masked max") {
    val path = s"$tmpRoot/facade_resume"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val e = new GraftEngine(spark, () => 1700000000000L,
      tsStoragePath = Some(path), mergeOnReadDeletes = true)
    for (i <- 1 to 8)
      assert(e.post(s"/ts/x/at/${i * 1000}", s"""{"value": $i}""").isRight)
    // kill the NEWEST rows: the masked view's max id (5) is now BELOW the
    // batch's write horizon (8)
    assert(e.delete("/ts/x/range/6000/8000").isRight)
    // a restarted engine resuming from the masked max would reissue id 6;
    // its post at deleted t=7000 would then sit at-or-below the horizon
    // and be silently masked — the unmasked high-water resume prevents it
    val e2 = new GraftEngine(spark, () => 1700000000000L,
      tsStoragePath = Some(path), mergeOnReadDeletes = true)
    assert(e2.post("/ts/x/at/7000", """{"value": 77}""").isRight)
    assert(e2.get("/ts/x/range/7000/7000").contains("\"value\": 77"),
      "append after restart masked by a stale-id reissue")
  }

  // ---- IVF index deletion (data removal without a rebuild) ----------------

  test("deleteFromIvf: masked == folded == brute over retained; untouched cells byte-identical") {
    val s = spark
    import s.implicits._
    import graft.operators.Similarity
    // 3 tight clusters in 4-dim so cells are predictable; 60 vectors
    val emb = (0 until 60).map { i =>
      val c = i % 3
      Seq(c * 10.0 + (i % 7) * 0.01, c * -5.0 + (i % 5) * 0.01,
        3.0 - c * 4.0, c + (i % 3) * 0.01).map(_.toFloat)
    }.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val idx = s"$tmpRoot/ivfdel"
    Similarity.writeIvfIndex(emb, idx, nCells = 3)
    val q = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    // kill every cluster-1 member above 30 (same-cell subset) + id 7
    val doomed = emb.filter((col("vec_id") % 3 === 1 && col("vec_id") > 30) ||
      col("vec_id") === 7).select("vec_id")
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    Similarity.deleteFromIvf(spark, idx, doomed)
    val masked = rows(Similarity.ivfTopKIndexed(spark, idx, q, k = 3))
    // no doomed id may surface as a neighbor under the mask
    assert(!masked.exists(r => doomedIds.exists(id => r.contains(s"[$id,"))),
      s"doomed neighbor surfaced: $masked")
    val files = { p: String =>
      val out = scala.collection.mutable.Map[String, (Long, Long)]()
      def walk(f: java.io.File, rel: String): Unit =
        if (f.isDirectory) f.listFiles.foreach(c => walk(c, s"$rel/${c.getName}"))
        else out(rel) = (f.length(), f.lastModified())
      walk(new java.io.File(p), ""); out.toMap
    }
    val preFiles = files(idx)
    val touchedCells = spark.read.parquet(s"$idx/_tombstones")
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    Similarity.compactIvfIndex(spark, idx)
    val postFiles = files(idx)
    for ((rel, sig) <- preFiles
         if rel.startsWith("/cell=") &&
           !touchedCells.exists(c => rel.startsWith(s"/cell=$c/")))
      assert(postFiles.get(rel).contains(sig), s"untouched cell file changed: $rel")
    assert(!new java.io.File(s"$idx/_tombstones").exists())
    // folded search identical to the masked one
    assert(rows(Similarity.ivfTopKIndexed(spark, idx, q, k = 3)) === masked)
    // doomed rows physically gone
    assert(spark.read.parquet(idx).filter(col("vec_id").isin(doomedIds.toSeq: _*))
      .count() === 0L)
  }

  test("deleteFromIvf: a fully-doomed cell's directory is dropped by the fold") {
    val s = spark
    import s.implicits._
    import graft.operators.Similarity
    val emb = (0 until 20).map { i =>
      val c = i % 2
      (i.toLong, Seq(c * 20.0, 1.0 - c * 2.0, 0.5, c * 3.0).map(_.toFloat))
    }.toDF("vec_id", "embedding")
    val idx = s"$tmpRoot/ivfempty"
    Similarity.writeIvfIndex(emb, idx, nCells = 2)
    // doom every odd id — one whole cluster, hence (at 2 cells) a cell
    val cellOfOdd = spark.read.parquet(idx).filter(col("vec_id") === 1)
      .select("cell").head().getInt(0)
    Similarity.deleteFromIvf(spark, idx, emb.filter(col("vec_id") % 2 === 1)
      .select("vec_id"))
    Similarity.compactIvfIndex(spark, idx)
    assert(!new java.io.File(s"$idx/cell=$cellOfOdd").exists(),
      "fully-doomed cell dir survived (would resurrect once the set cleared)")
    assert(spark.read.parquet(idx).filter(col("vec_id") % 2 === 1).count() === 0L)
  }

  test("deleteFromIvf then re-append: the NEW vector is searchable, never re-dropped") {
    val s = spark
    import s.implicits._
    import graft.operators.Similarity
    val emb = (0 until 20).map { i =>
      (i.toLong, Seq((i % 2) * 20.0f, 1.0f, 0.5f, 2.0f))
    }.toDF("vec_id", "embedding")
    val idx = s"$tmpRoot/ivfreadd"
    Similarity.writeIvfIndex(emb, idx, nCells = 2)
    Similarity.deleteFromIvf(spark, idx,
      emb.filter(col("vec_id") === 6L).select("vec_id"))
    // re-ingest id 6 (frozen centers assign it back to its old cell):
    // the append must fold the colliding tombstone first, not let the
    // old mask hide — and the next fold physically drop — the new row
    Similarity.appendIvfIndex(emb.filter(col("vec_id") === 6L), idx)
    assert(spark.read.parquet(idx).filter(col("vec_id") === 6L).count() === 1L)
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def hit() = Similarity.ivfTopKIndexed(spark, idx, q, k = 20)
      .filter(col("neighbor_id") === 6L).count()
    assert(hit() === 1L, "re-appended vector masked by its old tombstone")
    Similarity.compactIvfIndex(spark, idx)
    assert(hit() === 1L, "re-appended vector dropped by the fold")
  }

  test("compactIvfIndex retry survives tombstones for an already-dropped cell") {
    val s = spark
    import s.implicits._
    import graft.operators.Similarity
    val emb = (0 until 20).map { i =>
      (i.toLong, Seq((i % 2) * 20.0f, 1.0f, 0.5f, 2.0f))
    }.toDF("vec_id", "embedding")
    val idx = s"$tmpRoot/ivfwedge"
    Similarity.writeIvfIndex(emb, idx, nCells = 2)
    Similarity.deleteFromIvf(spark, idx,
      emb.filter(col("vec_id") % 2 === 1).select("vec_id"))
    // simulate the crash window: the fully-doomed cell's dir is gone but
    // the batches were never cleared
    val cellOfOdd = spark.read.parquet(s"$idx/_tombstones")
      .select("cell").head().getInt(0)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$idx/cell=$cellOfOdd"))
    // the retry must fold to completion, not wedge on the missing path
    Similarity.compactIvfIndex(spark, idx)
    assert(!new java.io.File(s"$idx/_tombstones").exists())
    assert(spark.read.parquet(idx).filter(col("vec_id") % 2 === 1).count() === 0L)
  }

  // ---- incremental graph-layout maintenance -------------------------------

  test("appendEdges: census parity with full rebuild, idempotent retry") {
    val s = spark
    import s.implicits._
    import graft.operators.Graph
    // a ring + chords, split 70/30; batch overlaps the base by two edges
    // (the per-table dedup must drop them)
    val all = ((0 until 30).map(i => (i.toLong, ((i + 1) % 30).toLong)) ++
      Seq((0L, 15L), (3L, 21L), (7L, 28L), (2L, 9L), (11L, 24L)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val (base, batch) = all.splitAt(24)
    val batchWithDups = batch ++ base.take(2)
    val (tU, tV) = ("graft_r11_app_byu", "graft_r11_app_byv")
    spark.sql(s"DROP TABLE IF EXISTS $tU")
    spark.sql(s"DROP TABLE IF EXISTS $tV")
    val baseDf = base.toDF("a", "b")
    val und = baseDf.select(col("a").as("u"), col("b").as("v"))
      .unionAll(baseDf.select(col("b").as("u"), col("a").as("v")))
    und.write.format("parquet").bucketBy(4, "u").sortBy("u").saveAsTable(tU)
    und.write.format("parquet").bucketBy(4, "v").sortBy("v").saveAsTable(tV)
    Graph.appendEdges(batchWithDups.toDF("a", "b"), tU, tV, nBuckets = 4)
    def censusStored(): Seq[String] = {
      val byU = spark.table(tU)
      val stored = byU.filter(col("u") < col("v"))
        .select(col("u").as("a"), col("v").as("b"))
      Graph.fofCensusStored(spark.table(tV), byU, stored)
        .collect().map(_.toString).sorted.toSeq
    }
    val want = Graph.fofCensus(all.toDF("a", "b"))
      .collect().map(_.toString).sorted.toSeq
    assert(censusStored() === want)
    // no duplicate rows landed; both orders carry exactly 2|E|
    assert(spark.table(tU).count() === 2L * all.size)
    assert(spark.table(tV).count() === 2L * all.size)
    // idempotent retry (the crash-between-the-two-appends story): the
    // same batch again appends nothing anywhere
    Graph.appendEdges(batchWithDups.toDF("a", "b"), tU, tV, nBuckets = 4)
    assert(spark.table(tU).count() === 2L * all.size)
    assert(spark.table(tV).count() === 2L * all.size)
    assert(censusStored() === want)
    spark.sql(s"DROP TABLE IF EXISTS $tU")
    spark.sql(s"DROP TABLE IF EXISTS $tV")
  }

  test("incremental compact killed before its commit rolls back cleanly") {
    import graft.sources.TsStorage
    import graft.operators.TimeRange
    val path = s"$tmpRoot/crashpre"
    TsStorage.write(fixture, path)
    val day0 = 1704067200000L
    TsStorage.tombstoneDelete(spark, path, Seq("alpha"),
      TimeRange(day0, day0 + 1000L), None)
    val want = TsStorage.read(spark, path)
      .select("series_id", "t", "event_id")
      .collect().map(_.toString).sorted.toSeq
    val pre = files(path)
    intercept[RuntimeException] {
      TsStorage.compact(spark, path, maxFilesPerPartition = 4,
        onBeforeSwap = () => throw new RuntimeException("kill: pre-commit"))
    }
    // no manifest committed: the table bytes are untouched, the masked
    // view unchanged, and the next compact completes from scratch
    assert(!new java.io.File(path + "_delete_manifest").exists())
    assert(files(path).filterNot(_._1.endsWith("_SUCCESS")) ===
      pre.filterNot(_._1.endsWith("_SUCCESS")))
    TsStorage.compact(spark, path, maxFilesPerPartition = 4)
    assert(TsStorage.read(spark, path)
      .select("series_id", "t", "event_id")
      .collect().map(_.toString).sorted.toSeq === want)
    assert(!new java.io.File(path + "_tombstones").exists())
  }
}

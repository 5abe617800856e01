package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.model.TsModel
import graft.sources.TsStorage

/** S1 ingest as a streaming pipeline: file-source `readStream` over the
  * events table -> the SAME TsModel projection used in batch -> partitioned
  * parquet sink (the buffer+flush of `timeseries.re:133-148` replaced by
  * micro-batch file commits).
  */
class StreamingIngestSpec extends AnyFunSuite with SparkTestBase {

  test("streaming exact dedup: duplicate event ids within the watermark are dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val deduped = mem.toDF().toDF("event_id", "t_ms", "value")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis(
        org.apache.spark.sql.functions.col("t_ms")))
      .withWatermark("ts", "1 minute")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, 1000L, 1.0), (2L, 2000L, 2.0), (1L, 3000L, 9.0)) // in-batch dup
      q.processAllAvailable()
      mem.addData((2L, 4000L, 9.0), (3L, 5000L, 3.0)) // cross-batch dup within watermark
      q.processAllAvailable()
      val ids = s.sql("select event_id, value from dedup_out").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(ids === Set((1L, 1.0), (2L, 2.0), (3L, 3.0))) // first wins, dups dropped
    } finally q.stop()
  }

  test("observe fan-out + expiry runs end-to-end on a FILE-source stream (T1-T5)") {
    import graft.streaming.ObserveService
    import graft.streaming.ObserveService.{ObsEvent, Subscription}
    val s = spark
    import s.implicits._

    val inbox = new java.io.File("target/tmp-obs-inbox")
    org.apache.commons.io.FileUtils.deleteQuietly(inbox)
    inbox.mkdirs()
    def drop(name: String, events: ObsEvent*): Unit = {
      val tmp = new java.io.File("target/tmp-obs-batch")
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
      events.toDF().coalesce(1).write.parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      org.apache.commons.io.FileUtils.copyFile(part, new java.io.File(inbox, s"$name.parquet"))
    }
    def ev(ts: Long, p: String, payload: String) =
      ObsEvent(ts, p, "json", payload, "POST", "c.local", 65)

    // one subscriber, 60s max-age from t=0 -> expiry at ts 60000
    val subs = Seq(Subscription("u-file", "/ts/*", "json", "data", 0L, 60L)).toDF()
    val schema = Seq.empty[ObsEvent].toDF().schema
    val stream = s.readStream.schema(schema).parquet(inbox.getAbsolutePath)
    val q = ObserveService.deliverWithExpiry(s, stream, subs)
      .writeStream.format("memory").queryName("obs_file_out")
      .outputMode("append").start()
    try {
      drop("b1", ev(1000L, "/ts/sensor", "a"), ev(2000L, "/ts/sensor", "b"))
      q.processAllAvailable()
      drop("b2", ev(59000L, "/ts/sensor", "c"), ev(61000L, "/ts/sensor", "dead"))
      q.processAllAvailable()
      drop("b3", ev(62000L, "/ts/sensor", "late"))
      q.processAllAvailable()
      val rows = s.sql("select * from obs_file_out").collect()
        .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
      // three deliveries before expiry, exactly one 163, nothing after close
      assert(rows.count(!_._3) === 3, rows.mkString(","))
      assert(rows.count(_._3) === 1)
      assert(rows.filter(!_._3).map(_._2).toSet ===
        Set("1000 /ts/sensor json a", "2000 /ts/sensor json b", "59000 /ts/sensor json c"))
      // the 163 lands in the batch of its triggering event, after all
      // pre-expiry deliveries (cross-micro-batch ordering)
      assert(rows.indexWhere(_._3) > rows.lastIndexWhere(r => !r._3 && r._2.startsWith("59000")))
    } finally q.stop()
  }

  test("stream-static enrichment: event stream joined to the LWW KV view") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.model.KvModel
    import graft.operators.KvOps
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    // static side: the LWW-resolved KV state (re-planned per micro-batch,
    // so a restarted batch sees refreshed state — the standard
    // stream-static enrichment shape)
    val kv = KvOps.lwwView(KvModel.changeLog(s, "/root/testdata/sf0.001"))
      .select(col("id"), col("key"), col("value").as("kv_value"))
    val expected = kv.limit(1).collect().head
    val (uid, key) = (expected.getString(0), expected.getString(1))
    val mem = MemoryStream[(String, String, Long)]
    val enriched = mem.toDF().toDF("user_id", "event_type", "t")
      .join(kv, col("user_id") === col("id") && col("event_type") === col("key"))
      .select("user_id", "event_type", "t", "kv_value")
    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      mem.addData((uid, key, 1000L), ("no-such-user", "x", 2000L))
      q.processAllAvailable()
      val rows = s.sql("select * from enrich_out").collect()
      assert(rows.length === 1) // unmatched stream rows drop (inner join)
      assert(rows.head.getString(0) === uid)
      assert(rows.head.getString(3) === expected.getString(2))
    } finally q.stop()
  }

  test("readStream -> TsModel.fromEvents -> partitioned sink lands all rows") {
    val dir = "/root/testdata/sf0.001"
    val batchEv = Tables.events(spark, dir)
    val out = new java.io.File("target/tmp-stream-ingest").getAbsolutePath
    val ckpt = new java.io.File("target/tmp-stream-ckpt").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))

    // the file source streams a DIRECTORY of arriving files
    val inbox = new java.io.File("target/tmp-stream-inbox")
    org.apache.commons.io.FileUtils.deleteQuietly(inbox)
    inbox.mkdirs()
    org.apache.commons.io.FileUtils.copyFile(
      new java.io.File(s"$dir/events.parquet"), new java.io.File(inbox, "events.parquet"))
    val stream = spark.readStream.schema(batchEv.schema)
      .parquet(inbox.getAbsolutePath)
    val tsStream = TsModel.fromEvents(stream)
      .withColumn("day", org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.timestamp_millis(col("t")), "yyyy-MM-dd"))
    val q = tsStream.writeStream
      .format("parquet")
      .option("checkpointLocation", ckpt)
      .partitionBy("series_id", "day")
      .outputMode("append")
      .start(out)
    try q.processAllAvailable() finally q.stop()

    val landed = TsStorage.read(spark, out)
    assert(landed.count() === batchEv.count())
    // partition pruning works on the streamed layout too
    val plan = landed.filter(col("series_id") === "error")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    // batch and stream agree row-for-row
    val a = TsModel.ts(spark, dir).select("event_id", "t", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = landed.select("event_id", "t", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a === b)
  }

  test("checkpointed restart resumes exactly-once: no re-emit, no loss") {
    import org.apache.commons.io.FileUtils
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
    val root = new java.io.File("target/tmp-restart")
    FileUtils.deleteQuietly(root)
    val inbox = new java.io.File(root, "inbox"); inbox.mkdirs()
    val out = new java.io.File(root, "out").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    // split the events into two arriving files
    def stage(cond: org.apache.spark.sql.Column, name: String): Unit = {
      val tmp = new java.io.File(root, s"stage-$name")
      ev.filter(cond).coalesce(1).write.parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      FileUtils.copyFile(part, new java.io.File(inbox, s"$name.parquet"))
    }
    def run(): Unit = {
      val q = spark.readStream.schema(ev.schema).parquet(inbox.getAbsolutePath)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start(out)
      try q.processAllAvailable() finally q.stop()
    }
    stage(col("event_id") % 2 === 0, "even")
    run()                         // first life: sees only the even file
    val afterFirst = spark.read.parquet(out).count()
    stage(col("event_id") % 2 === 1, "odd")
    run()                         // second life: same checkpoint, same sink
    val landed = spark.read.parquet(out)
    assert(afterFirst === ev.filter(col("event_id") % 2 === 0).count())
    assert(landed.count() === ev.count())                    // nothing lost
    assert(landed.select("event_id").distinct().count() === ev.count()) // nothing doubled
  }
}

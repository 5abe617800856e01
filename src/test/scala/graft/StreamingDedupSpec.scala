package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.KeyedEvent

/** The streaming dedup must carry its seen-set ACROSS micro-batches (one
  * cell per key) and agree with the batch replay on the same history.
  */
class StreamingDedupSpec extends AnyFunSuite with SparkTestBase {

  test("a key seen in batch 1 is suppressed in batch 2; ties admit by event_id") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val q = StreamingDedup.dedupStream(mem.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // same t=5 for key a: event_id order (1 before 2) decides the winner
      mem.addData(KeyedEvent("a", 5, 2), KeyedEvent("a", 5, 1), KeyedEvent("b", 1, 3))
      q.processAllAvailable()
      mem.addData(KeyedEvent("a", 0, 4), KeyedEvent("c", 9, 5)) // a already seen
      q.processAllAvailable()
      val rows = s.sql("select * from dedup_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // NOTE: the cross-batch a@t=0 arrives LATER, so the t=5 first-arrival
      // stands — streaming dedup is first-ARRIVAL per key across batches,
      // first-(t,event_id) only within a batch. The replay gate feeds the
      // whole history as one ordered fold, where the two coincide.
      assert(rows === Set(("a", 5L, 1L), ("b", 1L, 3L), ("c", 9L, 5L)))
    } finally q.stop()
  }

  test("batch replay matches the stream fed the same history in one batch") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val events = (1L to 200L).map { i =>
      KeyedEvent(s"k${i % 17}", t = (i * 31) % 50, event_id = i)
    }
    val mem = MemoryStream[KeyedEvent]
    val q = StreamingDedup.dedupStream(mem.toDS())
      .writeStream.format("memory").queryName("dedup_parity")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      val streamed = s.sql("select * from dedup_parity").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val replayed = StreamingDedup.dedupReplay(events.toDS()).collect()
        .map(e => (e.key, e.t, e.event_id)).toSet
      assert(streamed === replayed)
      assert(replayed.size === 17) // one survivor per key
      // each survivor is the (t, event_id)-min of its key
      val model = events.groupBy(_.key).map { case (k, es) =>
        val e = es.minBy(x => (x.t, x.event_id)); (k, e.t, e.event_id)
      }.toSet
      assert(replayed === model)
    } finally q.stop()
  }

  test("TTL form: a key re-admits after the watermark passes first-seen + ttl") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val mem = MemoryStream[KeyedEvent]
    val q = StreamingDedup.dedupStreamTtl(mem.toDS(), ttlMs = 10000L)
      .writeStream.format("memory").queryName("dedup_ttl")
      .outputMode("append").start()
    try {
      mem.addData(KeyedEvent("a", 1000, 1))   // admitted; expiry at 11000
      q.processAllAvailable()
      mem.addData(KeyedEvent("a", 1500, 2))   // within ttl: suppressed
      q.processAllAvailable()
      mem.addData(KeyedEvent("z", 100000, 3)) // watermark -> 100000 at batch end
      q.processAllAvailable()
      mem.addData(KeyedEvent("z2", 100001, 4)) // a's cell sweeps this batch
      q.processAllAvailable()
      // the probe must sit ABOVE the watermark (100001): stateful ops drop
      // late rows before the state logic ever sees them
      mem.addData(KeyedEvent("a", 150000, 5)) // expired: re-admitted
      q.processAllAvailable()
      val rows = s.sql("select * from dedup_ttl").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows === Set(("a", 1000L, 1L), ("z", 100000L, 3L),
                          ("z2", 100001L, 4L), ("a", 150000L, 5L)))
    } finally q.stop()
  }

  test("replay resets state at key boundaries within a partition") {
    val s = spark
    import s.implicits._
    // single partition forces adjacent keys through one scan
    val events = Seq(KeyedEvent("a", 2, 1), KeyedEvent("a", 1, 2),
                     KeyedEvent("b", 7, 3), KeyedEvent("b", 7, 4))
    val out = StreamingDedup.dedupReplay(s.createDataset(events).coalesce(1))
      .collect().map(e => (e.key, e.t, e.event_id)).toSet
    assert(out === Set(("a", 1L, 2L), ("b", 7L, 3L)))
  }
}

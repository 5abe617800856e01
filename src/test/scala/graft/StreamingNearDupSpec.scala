package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.StreamingNearDup

/** The streaming near-dup screen must agree with the batch
  * [[Dedup.minhashLshIncremental]] over the same documents, collapse
  * multi-band witnesses to one row per (doc, hist) pair, and keep working
  * across micro-batches.
  */
class StreamingNearDupSpec extends AnyFunSuite with SparkTestBase {

  private case class Doc(doc_id: Long, text: String, ts: Timestamp)

  test("streamed screen matches the batch incremental screen, across batches") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext

    val histRows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "totally unrelated historical content sits right here"))
    val hist = histRows.toDF("doc_id", "text")

    val newRows = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),        // dups 1 (and near 2)
      (11L, "one two three four five six seven eight nine ten"),     // dups 3
      (12L, "fresh content matching nothing in the history corpus"),
      (13L, "alpha beta gamma delta epsilon zeta eta theta iota"))   // dups 2 (and near 1)
    def doc(id: Long, text: String) = Doc(id, text, new Timestamp(1700000000000L + id))

    val mem = MemoryStream[Doc]
    val q = StreamingNearDup.screen(mem.toDF(), hist, tau = 0.8)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      mem.addData(doc(10L, newRows(0)._2), doc(12L, newRows(2)._2))
      q.processAllAvailable()
      mem.addData(doc(11L, newRows(1)._2), doc(13L, newRows(3)._2))
      q.processAllAvailable()
      val streamed = s.sql("select doc_id, hist_id from neardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // exactly one row per verified pair even though identical docs
      // collide in all 16 bands
      val streamedRows = s.sql("select * from neardup_out").count()
      assert(streamedRows === streamed.size)

      // batch parity: same docs through minhashLshIncremental
      val all = (histRows ++ newRows).toDF("doc_id", "text")
      val batch = Dedup.minhashLshIncremental(all, col("doc_id") < 10L, tau = 0.8)
        .select("doc_id", "hist_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch)
      assert(streamed.contains((10L, 1L)) && streamed.contains((11L, 3L)) &&
        streamed.contains((13L, 2L)))
      assert(!streamed.exists(_._1 == 12L))
    } finally q.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize

class SessionizeSpec extends AnyFunSuite with SparkTestBase {

  test("gap-based sessions split exactly at the gap threshold") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, 0L, 1.0, 1L), (1L, 1000L, 2.0, 2L),      // session 1
      (1L, 10000L, 3.0, 3L),                          // gap 9s > 5s -> session 2
      (2L, 0L, 5.0, 4L)                               // other user
    ).toDF("user_id", "t", "value", "event_id")
    val got = Sessionize.sessions(ev, gapMs = 5000L)
      .orderBy("user_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(got.toSeq === Seq((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 3.0), (2L, 1L, 1L, 5.0)))
  }

  test("bucketed split-merge sessionize == single-window form (bit parity)") {
    // same-bucket, cross-bucket-merge, cross-empty-bucket-break, and
    // session-value cases, on the unit fixture AND two real SFs
    val s = spark
    import s.implicits._
    val unit = Seq(
      (1L, 0L, 1.0, 1L), (1L, 4000L, 2.0, 2L),   // same session, same bucket
      (1L, 9000L, 3.0, 3L),                        // crosses the 10s bucket edge, gap 5s -> SAME session
      (1L, 13000L, 4.0, 4L),                       // still same session (gap 4s)
      (1L, 40000L, 5.0, 5L),                       // empty bucket between -> new session
      (2L, 9999L, 6.0, 6L), (2L, 10000L, 7.0, 7L) // adjacent across the edge
    ).toDF("user_id", "t", "value", "event_id")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("user_id", "session_id").collect().map(_.toString).toSeq
    assert(canon(Sessionize.sessionsBucketed(unit, gapMs = 5000L, bucketMs = 10000L)) ===
      canon(Sessionize.sessions(unit, gapMs = 5000L)))
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val ev = Tables.events(spark, d)
      val base = ev.select(col("user_id"),
        graft.model.TimeCols.millis(ev, "ts").as("t"), col("value"), col("event_id"))
      assert(canon(Sessionize.sessionsBucketed(base, gapMs = 3600000L)) ===
        canon(Sessionize.sessions(base, gapMs = 3600000L)))
    }
  }

  test("sessionsBucketed refuses a bucket no wider than the gap") {
    val s = spark
    import s.implicits._
    val ev = Seq((1L, 0L, 1.0, 1L)).toDF("user_id", "t", "value", "event_id")
    intercept[IllegalArgumentException] {
      Sessionize.sessionsBucketed(ev, gapMs = 5000L, bucketMs = 5000L).collect()
    }
  }

  test("lagBucketed / leadBucketed2 == direct windows: nulls, empty and 1-row buckets") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // bucketMs = 10: single-row buckets, an empty bucket between 20 and 41
    // (lead-2 must cross TWO boundaries: t=19's successors are 20 and 41),
    // a null value mid-stream (carry must NOT paper over it), and a second
    // user interleaved
    val ev = Seq(
      (1L, 0L, 1L, "a"), (1L, 5L, 2L, "b"), (1L, 19L, 3L, null),
      (1L, 20L, 4L, "d"), (1L, 41L, 5L, "e"), (1L, 43L, 6L, "f"),
      (2L, 9L, 7L, "x"), (2L, 30L, 8L, "y")
    ).toDF("user_id", "t", "event_id", "v")
    val w = Window.partitionBy("user_id").orderBy(col("t").asc, col("event_id").asc)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("user_id", "t", "event_id").collect().map(_.toString).toSeq
    assert(canon(Sessionize.lagBucketed(ev, "v", "pv", bucketMs = 10L)
        .select("user_id", "t", "event_id", "v", "pv")) ===
      canon(ev.withColumn("pv", lag("v", 1).over(w))))
    assert(canon(Sessionize.leadBucketed2(ev, "v", "n1", "n2", bucketMs = 10L)
        .select("user_id", "t", "event_id", "v", "n1", "n2")) ===
      canon(ev.withColumn("n1", lead("v", 1).over(w))
        .withColumn("n2", lead("v", 2).over(w))))
  }

  test("salted aggregation equals direct aggregation on skewed data") {
    val s = spark
    import s.implicits._
    // heavy hitter: 5000 rows on one key, a handful elsewhere
    val rows = Seq.tabulate(5000)(i => ("hot", i.toDouble)) ++
      Seq(("a", 1.0), ("b", 2.0), ("b", 3.0))
    val df = rows.toDF("k", "v").repartition(8)
    val direct = df.groupBy("k").agg(sum("v").as("sum_v"), count(lit(1)).as("count_v"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Sessionize.saltedSumCount(df, col("k"), col("v"), saltBuckets = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === direct)
  }
}

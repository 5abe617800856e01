package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {

  test("as-of semantics: most recent right row at-or-before, inner on no-match") {
    val s = spark
    import s.implicits._
    val left = Seq(
      ("u1", 100L, 1L), ("u1", 250L, 2L), ("u1", 300L, 3L),
      ("u2", 50L, 4L),  // before any right row -> dropped (inner)
      ("u3", 500L, 5L)  // key absent on right -> dropped
    ).toDF("k", "t", "event_id")
    val right = Seq(
      ("u1", 100L, 10.0, 100L), // equal t: at-or-before is inclusive
      ("u1", 200L, 20.0, 101L),
      ("u1", 300L, 30.0, 102L),
      ("u1", 300L, 31.0, 103L), // same (k,t): higher event_id wins
      ("u2", 80L, 80.0, 104L)
    ).toDF("k", "t", "value", "event_id")

    val got = AsOfJoin.asOf(left, right, key = "k", tCol = "t", valueCols = Seq("value"))
      .select("k", "t", "event_id", "asof_t", "asof_value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got === Set(
      ("u1", 100L, 1L, 100L, 10.0),  // inclusive match at equal t
      ("u1", 250L, 2L, 200L, 20.0),
      ("u1", 300L, 3L, 300L, 31.0)   // dup (k,t) resolved to event 103
    ))
  }

  test("a NULL right value rides its own row — no fill from older rows") {
    val s = spark
    import s.implicits._
    val left = Seq(("u1", 250L, 1L)).toDF("k", "t", "event_id")
    val right = Seq(("u1", 100L, Some(20.0), 10L), ("u1", 200L, None, 11L))
      .toDF("k", "t", "value", "event_id")
    val row = AsOfJoin.asOf(left, right, "k", "t", Seq("value"))
      .select("asof_t", "asof_value").head()
    assert(row.getLong(0) === 200L) // newest match wins...
    assert(row.isNullAt(1))         // ...and its NULL value is preserved
  }

  test("agrees with a naive range-join + argmax on random data with ties") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    val keys = Seq("a", "b", "c")
    val left = Seq.tabulate(150)(i =>
      (keys(rnd.nextInt(3)), rnd.nextInt(40).toLong, i.toLong)).toDF("k", "t", "event_id")
    val right = Seq.tabulate(80)(i =>
      (keys(rnd.nextInt(3)), rnd.nextInt(40).toLong, rnd.nextInt(100).toDouble, (1000 + i).toLong))
      .toDF("k", "t", "value", "event_id")

    val got = AsOfJoin.asOf(left, right, "k", "t", Seq("value"))
      .select("k", "t", "event_id", "asof_t", "asof_value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet

    // naive: range join then keep the (t, event_id)-max right row per left row
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.t") <= col("l.t"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l.k"), col("l.t"), col("l.event_id"))
          .orderBy(col("r.t").desc, col("r.event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("l.k"), col("l.t"), col("l.event_id"),
              col("r.t").as("asof_t"), col("r.value").as("asof_value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet

    assert(got === naive)
  }

  test("matches DuckDB-style semantics on real events at sf0.001") {
    val q = SparkEntry.queries("ts_asof")(spark, "/root/testdata/sf0.001")
    assert(q.count() === 199) // pinned against the DuckDB ASOF JOIN oracle
  }

  test("bucketed variant agrees with asOf on random tie-heavy data, any bucket width") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val keys = Seq("hot", "b", "c")
    // 90% of rows on one key; timestamps span many buckets at width 10
    val left = Seq.tabulate(300)(i =>
      (if (rnd.nextInt(10) < 9) "hot" else keys(1 + rnd.nextInt(2)),
       rnd.nextInt(200).toLong, i.toLong)).toDF("k", "t", "event_id")
    val right = Seq.tabulate(150)(i =>
      (if (rnd.nextInt(10) < 9) "hot" else keys(1 + rnd.nextInt(2)),
       rnd.nextInt(200).toLong, rnd.nextInt(100).toDouble, (1000 + i).toLong))
      .toDF("k", "t", "value", "event_id")

    def collectSet(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "t", "event_id", "asof_t", "asof_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet

    val plain = collectSet(AsOfJoin.asOf(left, right, "k", "t", Seq("value")))
    // widths chosen to exercise: many buckets (3), empty left-buckets with
    // carry-across-gaps (10), single bucket == plain window (1000)
    for (width <- Seq(3L, 10L, 1000L))
      assert(collectSet(AsOfJoin.asOfBucketed(left, right, "k", "t", Seq("value"),
        bucketMs = width)) === plain, s"divergence at bucket width $width")
  }

  test("bucketed carry: left bucket with no right rows matches the last earlier bucket") {
    val s = spark
    import s.implicits._
    val left = Seq(("u", 5000L, 1L)).toDF("k", "t", "event_id") // bucket 5
    val right = Seq(("u", 100L, 1.0, 10L), ("u", 900L, 2.0, 11L)) // bucket 0
      .toDF("k", "t", "value", "event_id")
    val row = AsOfJoin.asOfBucketed(left, right, "k", "t", Seq("value"), bucketMs = 1000L)
      .select("asof_t", "asof_value").head()
    assert((row.getLong(0), row.getDouble(1)) === ((900L, 2.0)))
  }
}

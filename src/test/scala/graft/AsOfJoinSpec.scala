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

  test("matches DuckDB-style semantics on real events at sf0.001") {
    val q = SparkEntry.queries("ts_asof")(spark, "/root/testdata/sf0.001")
    assert(q.count() === 199) // pinned against the DuckDB ASOF JOIN oracle
  }
}

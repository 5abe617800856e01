package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Pins the reference read-API semantics of SURVEY §2.2 / §7.5. */
class TsOpsSpec extends AnyFunSuite with SparkTestBase {

  private val base = Seq(
    ("a", 100L, 1.0, Map("room" -> "lounge"), 1L),
    ("a", 200L, 2.0, Map("room" -> "kitchen"), 2L),
    ("a", 300L, 3.0, Map.empty[String, String], 3L),
    ("b", 150L, 10.0, Map("room" -> "lounge"), 4L),
    ("b", 250L, 20.0, Map("serial" -> "SN001"), 5L),
    ("b", 250L, 21.0, Map("serial" -> "SN002"), 6L) // duplicate timestamp
  )

  private def df = tsFrame(base)

  test("last/n is PER-SERIES n then union — not a global top-n (timeseries.re:275-283)") {
    // /ts/a,b/last/2 must yield 4 rows (2 per series), not the global top 2
    val got = TsOps.select(df, Seq("a", "b"), LastN(2))
      .select("series_id", "t").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("a", 300L), ("a", 200L), ("b", 250L), ("b", 250L)))
  }

  test("latest is last/1 per series (timeseries.re:285-286)") {
    val got = TsOps.select(df, Seq("a", "b"), Latest)
      .select("series_id", "t").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("a", 300L), ("b", 250L)))
  }

  test("equal timestamps resolve by the pinned event_id tiebreak (§7.5.2)") {
    val got = TsOps.select(df, Seq("b"), Latest).select("event_id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(6L)) // highest event_id wins desc
  }

  test("since/range bounds are inclusive on both ends (timeseries.re:350,411)") {
    val since = TsOps.select(df, Seq("a"), Since(200L)).count()
    assert(since === 2) // t=200 included
    val range = TsOps.select(df, Nil, TimeRange(150L, 250L)).count()
    assert(range === 4) // 150 and both 250s included
  }

  test("length counts the multi-series union (timeseries.re:310-346)") {
    val row = TsOps.select(df, Seq("a", "b"), Length).head()
    assert(row.getAs[Long]("length") === 6L)
  }

  test("filter drops records missing the tag (filter.re:12-14, Not_found -> false)") {
    val eq = TsOps.tagFilter(df, TagEquals("room", "lounge")).count()
    assert(eq === 2) // a@100 and b@150; a@300 (no tags) dropped, not matched
    val contains = TsOps.tagFilter(df, TagContains("serial", "SN00")).count()
    assert(contains === 2)
  }

  test("contains is a literal substring, not a regex (filter.re:19 Str.regexp_string)") {
    val dotted = tsFrame(Seq(
      ("a", 1L, 1.0, Map("tag" -> "v.1"), 1L),
      ("a", 2L, 2.0, Map("tag" -> "vX1"), 2L)))
    // regex "v.1" would match both; literal must match only "v.1"
    val got = TsOps.tagFilter(dotted, TagContains("tag", "v.1")).count()
    assert(got === 1)
  }

  test("delete-by-query removes same-timestamp bystanders (timeseries.re:434-443, §7.5.3)") {
    // delete range [240,260] filtered to serial=SN001 matches only event 5,
    // but event 6 shares t=250 and must die too
    val remaining = TsOps.deleteByQuery(df, Seq("b"), TimeRange(240L, 260L),
      Some(TagEquals("serial", "SN001")))
    assert(remaining.select("event_id").collect().map(_.getLong(0)).toSet === Set(4L))
  }

  test("multi-series select is UNION ALL via isin — unknown ids contribute nothing") {
    assert(TsOps.select(df, Seq("a", "nope"), Since(0L)).count() === 3)
  }
}

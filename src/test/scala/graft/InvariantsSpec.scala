package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.TsModel
import graft.operators._

/** Cross-operator invariants on real driver testdata (SURVEY §5 item 3) —
  * properties that must hold regardless of data content.
  */
class InvariantsSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val ts = TsModel.ts(spark, dir)

  test("last n is a subset of since(min t of the result)") {
    val lastN = TsOps.select(ts, Seq("purchase"), LastN(20))
    val minT = lastN.agg(min("t")).head().getLong(0)
    val since = TsOps.select(ts, Seq("purchase"), Since(minT))
      .select("event_id").collect().map(_.getLong(0)).toSet
    val got = lastN.select("event_id").collect().map(_.getLong(0)).toSet
    assert(got.subsetOf(since))
    assert(got.size === 20)
  }

  test("delete o read = empty: no surviving row carries a deleted timestamp") {
    val sel = TimeRange(1704844800000L, 1705276800000L)
    val deletedTs = TsOps.select(ts, Seq("error"), sel)
      .select("t").collect().map(_.getLong(0)).toSet
    val remaining = TsOps.deleteByQuery(ts, Seq("error"), sel, None)
      .select("t").collect().map(_.getLong(0)).toSet
    assert(remaining.intersect(deletedTs).isEmpty)
  }

  test("filter output is a subset of its input; missing-tag rows never pass") {
    val in = TsOps.select(ts, Nil, Since(0L))
    val out = TsOps.tagFilter(in, TagContains("k", "3"))
    assert(out.count() <= in.count())
    val nope = TsOps.tagFilter(in, TagEquals("nonexistent_tag", "x"))
    assert(nope.count() === 0)
  }

  test("agg(sum) equals the driver-side fold over collected values") {
    val window = TsOps.select(ts, Seq("purchase"), TimeRange(1704844800000L, 1705276800000L))
    val sumAgg = Aggregates.aggregate(window, AggSum).head().getDouble(0)
    val folded = window.select("value").collect().map(_.getDouble(0)).sorted.sum
    assert(math.abs(sumAgg - folded) < 1e-6)
  }

  test("length equals count of the unfiltered selection") {
    val len = TsOps.select(ts, Seq("purchase", "click"), Length)
      .head().getAs[Long]("length")
    assert(len === TsOps.selectSeries(ts, Seq("purchase", "click")).count())
  }

  test("latest(union) == union of per-series latests (R2 per-series rule)") {
    val all = TsOps.select(ts, Seq("purchase", "click", "error"), Latest)
      .select("series_id", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val each = Seq("purchase", "click", "error").flatMap { sid =>
      TsOps.select(ts, Seq(sid), Latest)
        .select("series_id", "event_id").collect()
        .map(r => (r.getString(0), r.getLong(1)))
    }.toSet
    assert(all === each)
  }
}

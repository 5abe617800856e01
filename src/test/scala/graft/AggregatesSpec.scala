package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Pins SURVEY §2.3 / §7.5: count-as-float, empty-input {}, sd flavor. */
class AggregatesSpec extends AnyFunSuite with SparkTestBase {

  private def df = tsFrame(Seq(
    ("s", 1L, 2.0, Map.empty[String, String], 1L),
    ("s", 2L, 4.0, Map.empty[String, String], 2L),
    ("s", 3L, 9.0, Map.empty[String, String], 3L)))

  private def empty = tsFrame(Nil)

  test("seven aggregates compute over the value column") {
    assert(Aggregates.aggregate(df, AggSum).head().getDouble(0) === 15.0)
    assert(Aggregates.aggregate(df, AggMin).head().getDouble(0) === 2.0)
    assert(Aggregates.aggregate(df, AggMax).head().getDouble(0) === 9.0)
    assert(Aggregates.aggregate(df, AggMean).head().getDouble(0) === 5.0)
    assert(Aggregates.aggregate(df, AggMedian).head().getDouble(0) === 4.0)
  }

  test("count returns a float (numeric.re:41)") {
    val json = Aggregates.resultJson(df, AggCount)
    assert(json === """{"result": 3.0}""")
  }

  test("aggregate of empty input is {} — not null, not an error (numeric.re:26)") {
    for (fn <- Seq(AggSum, AggCount, AggMin, AggMax, AggMean, AggMedian, AggSd))
      assert(Aggregates.resultJson(empty, fn) === "{}")
  }

  test("aggregate undefined on the input (sd of one row) yields {} not an NPE") {
    val one = tsFrame(Seq(("s", 1L, 2.0, Map.empty[String, String], 1L)))
    assert(Aggregates.resultJson(one, AggSd) === "{}")
  }

  test("resultJson guards magnitude and non-finite results") {
    // a sum beyond 2^63 must not clamp through toLong; 1e18 is integral
    // but past the 1e15 guard, so it renders in scientific notation
    val huge = tsFrame(Seq(
      ("s", 1L, 1e18, Map.empty[String, String], 1L),
      ("s", 2L, 1e18, Map.empty[String, String], 2L)))
    assert(Aggregates.resultJson(huge, AggSum) === """{"result": 2.0E18}""")
    // NaN (0 * inf below) and Infinity are not valid JSON numbers — they
    // fold to the empty-result shape
    val inf = tsFrame(Seq(
      ("s", 1L, Double.MaxValue, Map.empty[String, String], 1L),
      ("s", 2L, Double.MaxValue, Map.empty[String, String], 2L)))
    assert(Aggregates.resultJson(inf, AggSum) === "{}")
    val nan = tsFrame(Seq(
      ("s", 1L, Double.NaN, Map.empty[String, String], 1L),
      ("s", 2L, 1.0, Map.empty[String, String], 2L)))
    assert(Aggregates.resultJson(nan, AggSum) === "{}")
  }

  test("sd is the SAMPLE standard deviation (pinned vs DuckDB stddev_samp)") {
    // values 2,4,9: mean=5, sample var = (9+1+16)/2 = 13
    val got = Aggregates.aggregate(df, AggSd).head().getDouble(0)
    assert(math.abs(got - math.sqrt(13.0)) < 1e-12)
  }

  test("median of an even count interpolates (Spark exact median, DuckDB parity)") {
    val even = tsFrame(Seq(
      ("s", 1L, 1.0, Map.empty[String, String], 1L),
      ("s", 2L, 2.0, Map.empty[String, String], 2L),
      ("s", 3L, 3.0, Map.empty[String, String], 3L),
      ("s", 4L, 10.0, Map.empty[String, String], 4L)))
    assert(Aggregates.aggregate(even, AggMedian).head().getDouble(0) === 2.5)
  }

  test("filter-then-aggregate composition (server.re:276-303 apply2)") {
    val tagged = tsFrame(Seq(
      ("s", 1L, 1.0, Map("room" -> "lounge"), 1L),
      ("s", 2L, 5.0, Map("room" -> "lounge"), 2L),
      ("s", 3L, 9.0, Map("room" -> "attic"), 3L)))
    val got = Aggregates.aggregate(
      TsOps.tagFilter(tagged, TagEquals("room", "lounge")), AggMax)
    assert(got.head().getDouble(0) === 5.0)
  }
}

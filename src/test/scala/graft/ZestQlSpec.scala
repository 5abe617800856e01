package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators._
import graft.zestql._

/** Parses the reference's own 22-statement corpus
  * (`/root/reference/test/zestql/test.zestql`) plus the docs' path
  * examples, and checks compilation to DataFrame plans.
  */
class ZestQlSpec extends AnyFunSuite with SparkTestBase {

  private val NOW = 1700000000000L

  private def p1(src: String): Statement = ZestQlParser.parseStatement(src, NOW)

  test("the full reference corpus parses") {
    val corpus =
      """connect key "vl6wu0A@XP?}Or/&BR#LSxn>A+}L)p44/W[wXL3<";
        |connect key "vl6wu0A@XP?}Or/&BR#LSxn>A+}L)p44/W[wXL3<" host "foo";
        |post 42.0 to "sensor1";
        |POST 42.1 TO "sensor1";
        |post 43.0 TO "sensor1" where "serial" is "A001";
        |post 43.1 TO "sensor1"
        |where "serial" is "A001";
        |get min from "sensor1" SINCE 1m;
        |get from "sensor1111" SINCE 24h;
        |get from "sensor1111" SINCE 1d;
        |get from "sensor1,sensor2" where "serial" is "A00" since 1s;
        |get from "sensor2" last 10;
        |get count from "sensor1,sensor2" where "serial" is "A00" since 10sec;
        |get from "sensor200" range 1s to 0s;
        |observe from "sensor1" for 10s;
        |observe from "sensor1" mode audit;
        |delete from "sensor42" range 0s to 1s;
        |delete from "sensor1" where "serial" is "A00" range 5s to 10s;
        |disconnect host "localhost";""".stripMargin
    val stmts = ZestQlParser.parseScript(corpus, NOW)
    assert(stmts.length === 18)
  }

  test("relative times resolve against the supplied clock (zestql.re:9-12)") {
    p1("""get from "s" since 1m""") match {
      case Get(q) => assert(q.selector === Since(NOW - 60000L))
      case other => fail(s"$other")
    }
    p1("""get from "s" range 1h to 0s""") match {
      case Get(q) => assert(q.selector === TimeRange(NOW - 3600000L, NOW))
      case other => fail(s"$other")
    }
  }

  test("standalone units lex like glued ones (reference INT + UNIT tokens)") {
    // the reference lexer emits INT and the unit as separate whitespace-
    // skipped tokens; 'since 10 d' must equal 'since 10d'
    assert(p1("""get from "s" since 10 d""") === p1("""get from "s" since 10d"""))
    assert(p1("""observe from "s" for 60 s""") === p1("""observe from "s" for 60s"""))
    // 'min' never merges — it is always the aggregate keyword
    p1("""get min from "s" since 1m""") match {
      case Get(q) => assert(q.agg === Some(AggMin))
      case other => fail(s"$other")
    }
  }

  test("keywords are case-insensitive; where compiles to equals only") {
    p1("""GET MAX FROM "a,b" WHERE "room" IS "lounge" LAST 5""") match {
      case Get(TsQuery(ids, LastN(5), Some(TagEquals("room", "lounge")), Some(AggMax), false)) =>
        assert(ids === Seq("a", "b"))
      case other => fail(s"$other")
    }
  }

  test("median accepted as DSL extension (absent from parser.mly:61)") {
    p1("""get median from "s" last 3""") match {
      case Get(q) => assert(q.agg === Some(AggMedian))
      case other => fail(s"$other")
    }
  }

  test("path language round-trips the docs' flagship example (README.md:216)") {
    val q = PathParser.parseGet("/ts/sensor/last/100/filter/room/equals/lounge/max")
    assert(q === TsQuery(Seq("sensor"), LastN(100), Some(TagEquals("room", "lounge")), Some(AggMax)))
    val q2 = PathParser.parseGet("/ts/sensor1,sensor2/last/10/filter/serial/contains/SN00")
    assert(q2.ids === Seq("sensor1", "sensor2"))
    assert(q2.filter === Some(TagContains("serial", "SN00")))
  }

  test("blob paths reject filters/aggregates (server.re:269-272)") {
    assert(PathParser.parseGet("/ts/blob/s/latest").blob)
    assertThrows[ParseError](PathParser.parseGet("/ts/blob/s/last/5/max"))
  }

  test("DELETE guard: CoAP 134 selectors rejected (server.re:955-979)") {
    PathParser.parseDelete("/ts/s/range/100/200") // fine
    // latest/earliest are deletable: has_unsupported_delete_api flags only
    // first/last selectors and aggregate/length final segments; the
    // reference routes DELETE /ts/<id>/latest through the read path and
    // removes the matched timestamps
    assert(PathParser.parseDelete("/ts/s/latest").selector === Latest)
    assert(PathParser.parseDelete("/ts/s/earliest").selector === Earliest)
    assertThrows[ParseError](PathParser.parseDelete("/ts/s/last/5"))
    assertThrows[ParseError](PathParser.parseDelete("/ts/s/first/5"))
    assertThrows[ParseError](PathParser.parseDelete("/ts/s/length"))
    assertThrows[ParseError](PathParser.parseDelete("/ts/s/since/5/max"))
    // the guard checks only the FINAL segment (server.re:963-973): a filter
    // tag merely named like an aggregate is a legal delete
    val ok = PathParser.parseDelete("/ts/s/since/0/filter/sum/equals/x")
    assert(ok.filter === Some(TagEquals("sum", "x")))
  }

  test("length is an exact route — suffixes rejected (server.re:269-272)") {
    assert(PathParser.parseGet("/ts/s/length").selector === Length)
    assertThrows[ParseError](PathParser.parseGet("/ts/s/length/max"))
    assertThrows[ParseError](PathParser.parseGet("/ts/s/length/filter/k/equals/1"))
  }

  test("script splitter honors escaped quotes inside string literals") {
    val stmts = ZestQlParser.parseScript(
      "post 1.0 to \"se\\\"ri;es\"; get from \"s\" last 1;", NOW)
    assert(stmts.length === 2)
    assert(stmts.head === Post(1.0, "se\"ri;es", None))
  }

  test("compiled query executes: flagship path on a literal frame") {
    val df = tsFrame(Seq(
      ("sensor", 100L, 1.0, Map("room" -> "lounge"), 1L),
      ("sensor", 200L, 9.0, Map("room" -> "attic"), 2L),
      ("sensor", 300L, 5.0, Map("room" -> "lounge"), 3L)))
    val q = PathParser.parseGet("/ts/sensor/last/100/filter/room/equals/lounge/max")
    val out = Compiler.compile(df, q)
    assert(out.head().getDouble(0) === 5.0)
  }

  test("result codec emits the reference wire shapes (§1.2)") {
    val df = tsFrame(Seq(
      ("s", 200L, 2.0, Map("room" -> "kitchen"), 2L),
      ("s", 100L, 1.0, Map.empty[String, String], 1L)))
    assert(ResultCodec.readJson(df) ===
      """[{"timestamp": 200, "data": {"value": 2, "room": "kitchen"}}, {"timestamp": 100, "data": {"value": 1}}]""")
    assert(ResultCodec.lengthJson(
      TsOps.select(df, Seq("s"), Length)) === """{"length": 2}""")
  }
}

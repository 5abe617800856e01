package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.zestql.{Repl, ZestQlParser}

/** Drives the REPL executor end-to-end: parse -> path -> Compiler ->
  * codecs, against a pinned-clock engine (`test/zestql/repl.re`;
  * introspection `server.re:68-72,617-632`).
  */
class ReplSpec extends AnyFunSuite with SparkTestBase {

  private val NOW = 1700000000000L // 2023-11-14T22:13:20Z

  test("a REPL session: post, get, aggregate, observe, delete") {
    val e = new GraftEngine(spark, () => NOW)
    assert(Repl.run(e, """post 1.5 to "sensor" where "room" is "lounge";""", NOW)
      === Seq("created"))
    assert(Repl.run(e, """post 9.0 to "sensor";""", NOW) === Seq("created"))
    // reads route through the same path language + compiler as the API
    assert(Repl.run(e, """get max from "sensor" since 1h;""", NOW)
      === Seq("""{"result": 9.0}"""))
    assert(Repl.run(e, """get from "sensor" where "room" is "lounge" last 5;""", NOW)
      === Seq(s"""[{"timestamp": $NOW, "data": {"value": 1.5, "room": "lounge"}}]"""))
    // multi-statement line; observe returns the subscription uuid
    val out = Repl.run(e, """connect key "k"; observe from "sensor" for 10s;""", NOW)
    assert(out.head === "ok")
    assert(out(1).matches("[0-9a-f-]{36}"))
    assert(Repl.run(e, """delete from "sensor" range 1h to 0s;""", NOW)
      === Seq("deleted"))
    assert(Repl.run(e, """get count from "sensor" since 1d;""", NOW)
      === Seq("{}")) // everything deleted -> empty aggregate shape
    // parse errors report and do not throw
    assert(Repl.run(e, "get nonsense;", NOW).head.startsWith("error: "))
  }

  test("introspection endpoints (S9): hello, time, uptime") {
    var t = NOW
    val e = new GraftEngine(spark, () => t)
    assert(e.get("/hello") === "hello world!")
    assert(e.get("/time") === "Nov 14 22:13:20")
    t = NOW + 65000L
    assert(e.get("/uptime") === """{"uptime": 65}""")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end walkthrough of the reference docs' own examples
  * (`/root/reference/docs/README.md:18-226`) against the engine facade —
  * the "a ZestDB user could switch" check.
  */
class GraftEngineSpec extends AnyFunSuite with SparkTestBase {

  private def engine(startMs: Long = 1000L): GraftEngine = {
    var now = startMs
    new GraftEngine(spark, () => { now += 1; now })
  }

  test("KV walkthrough: write, read, keys, count, delete, delete-after-read") {
    val e = engine()
    assert(e.post("/kv/foo/bar", """{"name":"dave", "age":30}""").isRight)
    assert(e.get("/kv/foo/bar") === """{"name":"dave", "age":30}""")
    e.kvWrite("json", "foo", "baz", """{"x":1}""")
    assert(e.kvKeys("json", "foo") === Seq("bar", "baz"))
    assert(e.get("/kv/foo/count") === """{"count": 2}""")
    assert(e.get("/kv/foo/keys") === """["bar", "baz"]""")
    assert(e.delete("/kv/foo/bar").isRight)
    assert(e.get("/kv/foo/bar") === "{}") // read-after-delete default
    assert(e.kvCount("json", "foo") === 1L)
    e.kvDeleteAll("json", "foo")
    assert(e.get("/kv/foo/count") === """{"count": 0}""")
  }

  test("text and binary stores return empty string on miss") {
    val e = engine()
    e.kvWrite("text", "id1", "k", "plain text")
    assert(e.kvRead("text", "id1", "k") === "plain text")
    assert(e.kvRead("text", "id1", "missing") === "")
    assert(e.kvRead("binary", "id1", "missing") === "")
  }

  test("numeric TS walkthrough: write, latest/last, filter+agg, length, delete") {
    val e = engine()
    assert(e.post("/ts/sensor", """{"room": "lounge", "value": 1}""").isRight)
    assert(e.post("/ts/sensor", """{"room": "kitchen", "value": 2}""").isRight)
    assert(e.post("/ts/sensor", """{"room": "lounge", "value": 5}""").isRight)
    assert(e.post("/ts/sensor", """{"value": "bad"}""").isLeft) // CoAP 128
    // latest returns the newest record in the docs' wire shape
    val latest = e.get("/ts/sensor/latest")
    assert(latest.matches("""\[\{"timestamp": \d+, "data": \{"value": 5, "room": "lounge"\}\}\]"""), latest)
    // last/2 sorted desc
    val last2 = e.get("/ts/sensor/last/2")
    assert(last2.contains(""""value": 5""") && last2.contains(""""value": 2"""))
    // filter + aggregate composition -> {"result": x}
    assert(e.get("/ts/sensor/last/10/filter/room/equals/lounge/max") === """{"result": 5.0}""")
    assert(e.get("/ts/sensor/last/10/filter/room/equals/attic/max") === "{}") // empty -> {}
    assert(e.get("/ts/sensor/length") === """{"length": 3}""")
    assert(e.get("/ts/sensor/last/10/filter/room/equals/lounge/count") === """{"result": 2.0}""")
    // user-specified time write + since
    assert(e.post("/ts/sensor/at/5000", """{"value": 9}""").isRight)
    assert(e.get("/ts/sensor/since/5000") === """[{"timestamp": 5000, "data": {"value": 9}}]""")
    // delete a range; bystander semantics apply
    assert(e.delete("/ts/sensor/range/5000/6000").isRight)
    assert(e.get("/ts/sensor/length") === """{"length": 3}""")
    // DELETE guard (S7)
    assert(e.delete("/ts/sensor/last/2").isLeft)
  }

  test("DELETE latest removes the newest timestamp's records (server.re:955-979)") {
    val e = engine()
    assert(e.post("/ts/sensor/at/1000", """{"value": 1}""").isRight)
    assert(e.post("/ts/sensor/at/2000", """{"value": 2}""").isRight)
    // same-timestamp bystander: deleting the latest kills BOTH t=2000 rows
    assert(e.post("/ts/sensor/at/2000", """{"value": 3}""").isRight)
    assert(e.delete("/ts/sensor/latest").isRight)
    assert(e.get("/ts/sensor/length") === """{"length": 1}""")
    assert(e.get("/ts/sensor/latest") === """[{"timestamp": 1000, "data": {"value": 1}}]""")
    assert(e.delete("/ts/sensor/earliest").isRight)
    assert(e.get("/ts/sensor/length") === """{"length": 0}""")
  }

  test("blob TS accepts arbitrary JSON, no aggregation") {
    val e = engine()
    assert(e.post("/ts/blob/logs", """{"foo":"bar","value":1}""").isRight)
    val got = e.get("/ts/blob/logs/latest")
    assert(got.matches("""\[\{"timestamp": \d+, "data": \{"foo":"bar","value":1\}\}\]"""), got)
    assertThrows[graft.zestql.ParseError](e.get("/ts/blob/logs/last/5/max"))
  }

  test("hypercat registration appears in /cat") {
    val e = engine()
    val item =
      """{"href": "/ts/sensor",
        |"item-metadata": [
        |  {"rel": "urn:X-hypercat:rels:hasDescription:en", "val": "s"},
        |  {"rel": "urn:X-hypercat:rels:isContentType", "val": "application/json"}]}""".stripMargin
    assert(e.hypercatUpdate(item).isRight)
    val cat = e.get("/cat")
    assert(cat.contains(""""href":"/ts/sensor""""))
    assert(e.hypercatUpdate("""{"href": "/x"}""").isLeft)
  }

  test("observe: registration + fan-out in the documented record formats") {
    val e = engine()
    val uuid = e.observe("/ts/sensor", "json", "data", maxAgeSec = 0L)
    val audit = e.observe("/ts/*", "json", "audit", maxAgeSec = 0L)
    val out = e.fanout(1521554211213L, "/ts/sensor", "json", """{"value": 1}""")
    val byUuid = out.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byUuid(uuid) === Seq("""1521554211213 /ts/sensor json {"value": 1}"""))
    assert(byUuid(audit) === Seq("1521554211213 server.local client.local POST /ts/sensor 65"))
  }
}

package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter, OutputStreamWriter}
import java.net.Socket

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.server.WireServer

/** The JSON-lines wire front-end end-to-end over real sockets: REQ/REP
  * verbs against the engine, the OBSERVE push channel receiving each
  * matching write's fan-out frame, macaroon-token enforcement, and the
  * dead-observer GC — the reference's server loop semantics minus
  * CurveZMQ (SURVEY §2.6).
  */
class WireServerSpec extends AnyFunSuite with SparkTestBase {

  private implicit val fmts: Formats = DefaultFormats

  private class Client(port: Int) {
    private val sock = new Socket("127.0.0.1", port)
    sock.setSoTimeout(20000)
    private val out = new PrintWriter(
      new OutputStreamWriter(sock.getOutputStream, "UTF-8"), true)
    private val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, "UTF-8"))
    def send(fields: (String, JValue)*): JValue = {
      out.println(JsonMethods.compact(JObject(fields.toList)))
      JsonMethods.parse(in.readLine())
    }
    def readLine(): JValue = JsonMethods.parse(in.readLine())
    def close(): Unit = sock.close()
  }

  private def j(s: String): JValue = JString(s)

  test("REQ/REP verbs: post, get, delete round-trip over the socket") {
    var now = 1700000000000L
    val engine = new GraftEngine(spark, () => { now += 1; now })
    val srv = new WireServer(engine, clockMs = () => now)
    try {
      val c = new Client(srv.boundPort)
      val p = c.send("verb" -> j("POST"), "path" -> j("/ts/s1/at/1000"),
        "payload" -> j("""{"value": 42}"""))
      assert((p \ "status").extract[String] === "ok")
      val g = c.send("verb" -> j("GET"), "path" -> j("/ts/s1/latest"))
      assert((g \ "status").extract[String] === "ok")
      assert((g \ "body").extract[String].contains("\"value\": 42"))
      val d = c.send("verb" -> j("DELETE"), "path" -> j("/ts/s1/range/0/2000"))
      assert((d \ "status").extract[String] === "ok")
      val g2 = c.send("verb" -> j("GET"), "path" -> j("/ts/s1/length"))
      assert((g2 \ "body").extract[String] === """{"length": 0}""")
      // error surface: a bad path is an err frame, not a dropped line
      val bad = c.send("verb" -> j("DELETE"), "path" -> j("/ts/s1/last/5"))
      assert((bad \ "status").extract[String] === "err")
      c.close()
    } finally srv.close()
  }

  test("OBSERVE: pushes each matching write's wire frame until disconnect") {
    var now = 1700000000000L
    val engine = new GraftEngine(spark, () => { now += 1; now })
    val srv = new WireServer(engine, clockMs = () => now)
    try {
      val obs = new Client(srv.boundPort)
      val sub = obs.send("verb" -> j("OBSERVE"), "path" -> j("/ts/s2/*"),
        "maxAgeSec" -> JLong(3600L))
      assert((sub \ "status").extract[String] === "ok")
      val uuid = (sub \ "body" \ "uuid").extract[String]
      val writer = new Client(srv.boundPort)
      writer.send("verb" -> j("POST"), "path" -> j("/ts/s2/at/5000"),
        "payload" -> j("""{"value": 7}"""))
      val push = obs.readLine()
      assert((push \ "push").extract[String] === uuid)
      val msg = (push \ "message").extract[String]
      // data-mode frame: "ts uri_path format payload"
      assert(msg.contains("/ts/s2/at/5000") && msg.contains("\"value\": 7"),
        msg)
      // a non-matching write pushes nothing; the next matching one arrives
      writer.send("verb" -> j("POST"), "path" -> j("/ts/other/at/1"),
        "payload" -> j("""{"value": 1}"""))
      writer.send("verb" -> j("POST"), "path" -> j("/ts/s2/at/6000"),
        "payload" -> j("""{"value": 8}"""))
      val push2 = obs.readLine()
      assert((push2 \ "message").extract[String].contains("/ts/s2/at/6000"))
      // observer disconnect: its channel is GC'd, later writes don't hang
      obs.close()
      writer.send("verb" -> j("POST"), "path" -> j("/ts/s2/at/7000"),
        "payload" -> j("""{"value": 9}"""))
      val g = writer.send("verb" -> j("GET"), "path" -> j("/ts/s2/length"))
      assert((g \ "body").extract[String] === """{"length": 3}""")
      writer.close()
    } finally srv.close()
  }

  test("macaroon tokens enforced per verb over the wire") {
    var now = 1700000000000L
    val key = "wire-secret"
    val engine = new GraftEngine(spark, () => { now += 1; now },
      tokenSecretKey = Some(key))
    val srv = new WireServer(engine, clockMs = () => now)
    try {
      val c = new Client(srv.boundPort)
      def tok(caveats: String*): String = graft.auth.Macaroons.serialize(
        caveats.foldLeft(graft.auth.Macaroons.mint(key, "wire-client"))(_.addCaveat(_)))
      val good = tok("path = /ts/*", "method = POST")
      val p = c.send("verb" -> j("POST"), "path" -> j("/ts/a/at/1"),
        "payload" -> j("""{"value": 1}"""), "token" -> j(good))
      assert((p \ "status").extract[String] === "ok", p.toString)
      // wrong method caveat: rejected, engine state untouched
      val r = c.send("verb" -> j("DELETE"), "path" -> j("/ts/a/since/0"),
        "token" -> j(good))
      assert((r \ "status").extract[String] === "err")
      val g = c.send("verb" -> j("GET"), "path" -> j("/ts/a/length"),
        "token" -> j(tok("path = /ts/*", "method = GET")))
      assert((g \ "body").extract[String] === """{"length": 1}""")
      c.close()
    } finally srv.close()
  }

  test("NOTIFY round trip: request fans to the observer, response routes to callback") {
    var now = 1700000000000L
    val engine = new GraftEngine(spark, () => { now += 1; now })
    val srv = new WireServer(engine, clockMs = () => now)
    try {
      val obs = new Client(srv.boundPort)
      val sub = obs.send("verb" -> j("OBSERVE"), "path" -> j("/notification/request/app/*"),
        "mode" -> j("notification"), "maxAgeSec" -> JLong(3600L))
      val uuid = (sub \ "body" \ "uuid").extract[String]
      val caller = new Client(srv.boundPort)
      val reg = caller.send("verb" -> j("NOTIFY-REGISTER"),
        "path" -> j("/notification/response/app/cb1"))
      assert((reg \ "status").extract[String] === "ok")
      val rq = caller.send("verb" -> j("NOTIFY"),
        "path" -> j("/notification/request/app/cb1"), "payload" -> j("ping"))
      assert((rq \ "status").extract[String] === "ok")
      // the observer's push channel got the request frame
      val push = obs.readLine()
      assert((push \ "push").extract[String] === uuid)
      assert((push \ "message").extract[String].contains("ping"))
      // unobserved request path: the reference's 163
      val miss = caller.send("verb" -> j("NOTIFY"),
        "path" -> j("/notification/request/nobody/x"), "payload" -> j("hi"))
      assert((miss \ "status").extract[String] === "err")
      obs.close(); caller.close()
    } finally srv.close()
  }
}

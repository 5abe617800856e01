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

  private class Client(port: Int, recvBuf: Int = 0) {
    private val sock = new Socket()
    if (recvBuf > 0) sock.setReceiveBufferSize(recvBuf) // before connect
    sock.connect(new java.net.InetSocketAddress("127.0.0.1", port))
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

  test("absent token is the EMPTY token: every verb rejected when a secret key is set") {
    // the r11 bypass: omitting the token field must not route around
    // macaroon enforcement (reference validates on every request,
    // server.re:811-839)
    var now = 1700000000000L
    val key = "wire-secret-2"
    val engine = new GraftEngine(spark, () => { now += 1; now },
      tokenSecretKey = Some(key))
    val srv = new WireServer(engine, clockMs = () => now)
    try {
      val c = new Client(srv.boundPort)
      def tok(caveats: String*): String = graft.auth.Macaroons.serialize(
        caveats.foldLeft(graft.auth.Macaroons.mint(key, "wire-client"))(_.addCaveat(_)))
      for ((verb, path) <- Seq(
          "POST" -> "/ts/a/at/1", "GET" -> "/ts/a/length",
          "DELETE" -> "/ts/a/since/0", "OBSERVE" -> "/ts/*",
          "NOTIFY" -> "/notification/request/app/x",
          "NOTIFY-REGISTER" -> "/notification/response/app/cb")) {
        val r = c.send("verb" -> j(verb), "path" -> j(path),
          "payload" -> j("""{"value": 1}"""))
        assert((r \ "status").extract[String] === "err", s"$verb without token")
        assert((r \ "body").extract[String].contains("129"), s"$verb body")
      }
      // NOTIFY-REGISTER validates as GET, NOTIFY as POST — the handlers
      // they route through in the reference (server.re:611-618, POST path)
      val reg = c.send("verb" -> j("NOTIFY-REGISTER"),
        "path" -> j("/notification/response/app/cb"),
        "token" -> j(tok("method = GET")))
      assert((reg \ "status").extract[String] === "ok", reg.toString)
      val nt = c.send("verb" -> j("NOTIFY"),
        "path" -> j("/notification/request/app/x"), "payload" -> j("hi"),
        "token" -> j(tok("method = GET")))
      assert((nt \ "body").extract[String].contains("129"), "NOTIFY with GET-only token")
      c.close()
    } finally srv.close()
  }

  test("response routing fidelity: GET audits, DELETE is audit-only, denials audit as 129") {
    var now = 1700000000000L
    val key = "wire-secret-3"
    val engine = new GraftEngine(spark, () => { now += 1; now },
      tokenSecretKey = Some(key))
    val srv = new WireServer(engine, clockMs = () => now)
    try {
      def tok(caveats: String*): String = graft.auth.Macaroons.serialize(
        caveats.foldLeft(graft.auth.Macaroons.mint(key, "wire-obs"))(_.addCaveat(_)))
      val all = tok() // no caveats: everything allowed
      val dat = new Client(srv.boundPort)
      dat.send("verb" -> j("OBSERVE"), "path" -> j("/ts/*"), "mode" -> j("data"),
        "maxAgeSec" -> JLong(0L), "token" -> j(all))
      val aud = new Client(srv.boundPort)
      aud.send("verb" -> j("OBSERVE"), "path" -> j("/ts/*"), "mode" -> j("audit"),
        "maxAgeSec" -> JLong(0L), "token" -> j(all))
      // registrations audit as GET(OBSERVE) — including the audit
      // observer's own (the reference adds, then routes: server.re:103-104)
      assert((aud.readLine() \ "message").extract[String]
        .matches(raw"\d+ server\.local client\.local GET\(OBSERVE\) /ts/\* 69"))
      val c = new Client(srv.boundPort)
      c.send("verb" -> j("POST"), "path" -> j("/ts/w1/at/1000"),
        "payload" -> j("""{"value": 3}"""), "token" -> j(all))
      // data observer got the write; audit observer got the POST line
      assert((dat.readLine() \ "message").extract[String].contains("/ts/w1/at/1000"))
      assert((aud.readLine() \ "message").extract[String]
        .matches(raw"\d+ server\.local client\.local POST /ts/w1/at/1000 65"))
      // GET routes to audit (server.re:836-847) and NOT to data observers
      c.send("verb" -> j("GET"), "path" -> j("/ts/w1/latest"), "token" -> j(all))
      assert((aud.readLine() \ "message").extract[String]
        .matches(raw"\d+ server\.local client\.local GET /ts/w1/latest 69"))
      // DELETE: audit line with 66, data observers get nothing
      c.send("verb" -> j("DELETE"), "path" -> j("/ts/w1/range/0/2000"), "token" -> j(all))
      assert((aud.readLine() \ "message").extract[String]
        .matches(raw"\d+ server\.local client\.local DELETE /ts/w1/range/0/2000 66"))
      // a denied request routes 129 to the audit observer
      val denied = c.send("verb" -> j("POST"), "path" -> j("/ts/w1/at/2000"),
        "payload" -> j("""{"value": 4}"""))
      assert((denied \ "body").extract[String].contains("129"))
      assert((aud.readLine() \ "message").extract[String]
        .matches(raw"\d+ server\.local client\.local POST /ts/w1/at/2000 129"))
      // the data observer saw ONLY the original write: its next frame is
      // its own GET response, not a push from GET/DELETE/denial
      val g = dat.send("verb" -> j("GET"), "path" -> j("/hello"), "token" -> j(all))
      assert((g \ "body").extract[String] === "hello world!")
      aud.close(); dat.close(); c.close()
    } finally srv.close()
  }

  test("expired observer receives exactly one 163 and nothing after (observe.re:96-113)") {
    var now = 1700000000000L
    val engine = new GraftEngine(spark, () => now)
    val srv = new WireServer(engine, clockMs = () => now)
    try {
      val obs = new Client(srv.boundPort)
      obs.send("verb" -> j("OBSERVE"), "path" -> j("/ts/e1/*"),
        "maxAgeSec" -> JLong(10L))
      val writer = new Client(srv.boundPort)
      writer.send("verb" -> j("POST"), "path" -> j("/ts/e1/at/1"),
        "payload" -> j("""{"value": 1}"""))
      assert((obs.readLine() \ "message").extract[String].contains("/ts/e1/at/1"))
      now += 11000L // past maxAge; the next message sweeps (server.re:203-206)
      writer.send("verb" -> j("POST"), "path" -> j("/ts/e1/at/2"),
        "payload" -> j("""{"value": 2}"""))
      val end = obs.readLine()
      assert((end \ "message").extract[String] === "163")
      // matching writes after expiry push nothing: the observer's next
      // frame is its own request's response
      writer.send("verb" -> j("POST"), "path" -> j("/ts/e1/at/3"),
        "payload" -> j("""{"value": 3}"""))
      val g = obs.send("verb" -> j("GET"), "path" -> j("/hello"))
      assert((g \ "body").extract[String] === "hello world!")
      obs.close(); writer.close()
    } finally srv.close()
  }

  test("wire fan-out parity: fanoutLocal equals the DataFrame fanout on the same event") {
    var now = 1700000000000L
    val engine = new GraftEngine(spark, () => { now += 1; now })
    engine.observe("/ts/p/*", "json", "data", 0L)
    engine.observe("/ts/*", "json", "audit", 3600L)
    engine.observe("/ts/p/x", "text", "data", 0L) // format mismatch for json events
    val ts = now + 1
    val local = engine.fanoutLocal(ts, "/ts/p/x/at/5", "json", """{"value":1}""").toSet
    val spark2 = engine.fanout(ts, "/ts/p/x/at/5", "json", """{"value":1}""").toSet
    assert(local === spark2 && local.size === 2)
  }

  test("slow observer is evicted on queue overflow; other clients never block") {
    var now = 1700000000000L
    val engine = new GraftEngine(spark, () => { now += 1; now })
    val srv = new WireServer(engine, clockMs = () => now, observerQueueSize = 4)
    try {
      val obs = new Client(srv.boundPort, recvBuf = 4096)
      obs.send("verb" -> j("OBSERVE"), "path" -> j("/ts/slow/*"),
        "maxAgeSec" -> JLong(0L))
      // the observer stops reading; once the TCP buffers and its bounded
      // queue fill, the channel dies and the store keeps serving (ADVICE
      // r11: slow-observer liveness). Fat payloads overflow the buffers.
      val pad = "x" * 8192
      val writer = new Client(srv.boundPort)
      for (i <- 1 to 1024)
        writer.send("verb" -> j("POST"), "path" -> j(s"/ts/slow/at/$i"),
          "payload" -> j(s"""{"value": $i, "pad": "$pad"}"""))
      val g = writer.send("verb" -> j("GET"), "path" -> j("/ts/slow/length"))
      assert((g \ "body").extract[String] === """{"length": 1024}""")
      // the dead channel's subscription was dropped engine-side too
      assert(engine.subsSnapshot.isEmpty)
      writer.close(); obs.close()
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

package graft

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket

import org.scalatest.funsuite.AnyFunSuite

import graft.server.{SecureChannel, ZestCodec, ZestWireServer, ZmtpCodec, ZmtpCurve}

/** ZMTP-CURVE over the binary port: full HELLO/WELCOME/INITIATE/READY
  * handshake, sealed REQ round trips, DEALER observe pushes, replay and
  * tamper rejection, wrong-server-key failure. The command layouts were
  * validated against a stock libzmq 4.3.5 CURVE client during
  * development (PERF.md r13); this spec's client half pins the same
  * grammar as the committed regression anchor.
  */
class ZmtpCurveSpec extends AnyFunSuite with SparkTestBase {

  private class CurveClient(port: Int, serverPub: Array[Byte],
                            socketType: String = "REQ") {
    private val sock = new Socket("127.0.0.1", port)
    sock.setSoTimeout(20000)
    sock.setTcpNoDelay(true)
    private val out = new DataOutputStream(
      new java.io.BufferedOutputStream(sock.getOutputStream))
    private val in = new DataInputStream(sock.getInputStream)

    private def sendCommand(body: Array[Byte]): Unit = {
      ZmtpCodec.writeFrame(out, ZmtpCodec.FlagCommand, body); out.flush()
    }
    private def readBody(): Array[Byte] = ZmtpCodec.readFrame(in)._2

    val session: ZmtpCurve.Session = {
      out.write(ZmtpCodec.greeting(asServer = false, "CURVE")); out.flush()
      val g = new Array[Byte](64); in.readFully(g)
      assert(new String(g.slice(12, 32), "US-ASCII").takeWhile(_ != 0) == "CURVE")
      val hs = new ZmtpCurve.ClientHandshake(ZmtpCurve.generate(), serverPub,
        socketType)
      sendCommand(hs.hello())
      val (initiate, cont) = hs.onWelcome(readBody())
      sendCommand(initiate)
      val (s, md) = cont(readBody())
      assert(md("Socket-Type") == "ROUTER")
      s
    }

    /** One multipart message, each part a sealed MESSAGE command. */
    def sendMessage(frames: Seq[Array[Byte]]): Unit = {
      frames.zipWithIndex.foreach { case (f, i) =>
        ZmtpCodec.writeFrame(out, 0,
          session.sealMessage(if (i < frames.length - 1) 1 else 0, f))
      }
      out.flush()
    }

    def readMessage(): Seq[Array[Byte]] = {
      val parts = Seq.newBuilder[Array[Byte]]
      var more = true
      while (more) {
        val (mflags, payload) = session.openMessage(readBody())
        parts += payload
        more = (mflags & 1) != 0
      }
      parts.result()
    }

    def sendRawFrame(b: Array[Byte]): Unit = {
      ZmtpCodec.writeFrame(out, 0, b); out.flush()
    }
    def readRaw(): Int = in.read()
    def close(): Unit = sock.close()
  }

  test("CURVE REQ client: handshake, sealed GET/POST round trips, envelope echo") {
    val kp = SecureChannel.generateKeyPair()
    val engine = new GraftEngine(spark, () => 1700000000000L)
    val srv = new ZestWireServer(engine, serverKeys = Some(kp))
    try {
      val c = new CurveClient(srv.boundPort, SecureChannel.rawPublic(kp))
      c.sendMessage(Seq(Array.emptyByteArray,
        ZestCodec.encode(ZestCodec.request(1, "/hello"))))
      val reply = c.readMessage()
      assert(reply.length === 2 && reply.head.isEmpty)
      assert(ZestCodec.decode(reply(1)).payloadString === "hello world!")
      c.sendMessage(Seq(Array.emptyByteArray,
        ZestCodec.encode(ZestCodec.request(2, "/ts/cv/at/1000",
          payload = """{"value": 5}"""))))
      assert(ZestCodec.decode(c.readMessage()(1)).code === 65)
      c.sendMessage(Seq(Array.emptyByteArray,
        ZestCodec.encode(ZestCodec.request(1, "/ts/cv/latest"))))
      assert(ZestCodec.decode(c.readMessage()(1)).payloadString
        .contains("\"value\": 5"))
      c.close()
    } finally srv.close()
  }

  test("CURVE DEALER observer receives sealed pushes") {
    var now = 1700000000000L
    val kp = SecureChannel.generateKeyPair()
    val engine = new GraftEngine(spark, () => { now += 1; now })
    val srv = new ZestWireServer(engine, clockMs = () => now,
      serverKeys = Some(kp))
    try {
      val obs = new CurveClient(srv.boundPort, SecureChannel.rawPublic(kp), "DEALER")
      obs.sendMessage(Seq(ZestCodec.encode(ZestCodec.request(1, "/ts/cw/*",
        observe = Some("data"), maxAgeSec = Some(0L)))))
      val ackF = ZestCodec.decode(obs.readMessage().last)
      assert(ackF.code === 69)
      val uuid = ackF.payloadString
      val w = new CurveClient(srv.boundPort, SecureChannel.rawPublic(kp))
      w.sendMessage(Seq(Array.emptyByteArray,
        ZestCodec.encode(ZestCodec.request(2, "/ts/cw/at/2000",
          payload = """{"value": 3}"""))))
      assert(ZestCodec.decode(w.readMessage()(1)).code === 65)
      val push = obs.readMessage()
      assert(push.length === 1)
      val pf = ZestCodec.decode(push.head)
      assert(pf.code === 69)
      assert(pf.options.exists(o => o.number === 2048 && o.string === uuid))
      obs.close(); w.close()
    } finally srv.close()
  }

  test("tamper and replay both drop the connection") {
    val kp = SecureChannel.generateKeyPair()
    val engine = new GraftEngine(spark, () => 1700000000000L)
    val srv = new ZestWireServer(engine, serverKeys = Some(kp))
    try {
      // tamper: flip a ciphertext byte
      val c1 = new CurveClient(srv.boundPort, SecureChannel.rawPublic(kp))
      val good = c1.session.sealMessage(0,
        ZestCodec.encode(ZestCodec.request(1, "/hello")))
      val bad = good.clone(); bad(good.length - 1) = (bad(good.length - 1) ^ 1).toByte
      c1.sendRawFrame(bad)
      assert(c1.readRaw() === -1) // dropped
      c1.close()
      // replay: resend an already-used nonce
      val c2 = new CurveClient(srv.boundPort, SecureChannel.rawPublic(kp))
      val frame = c2.session.sealMessage(0,
        ZestCodec.encode(ZestCodec.request(1, "/hello")))
      c2.sendRawFrame(frame)
      c2.readMessage() // fine the first time
      c2.sendRawFrame(frame) // identical nonce: must be rejected
      assert(c2.readRaw() === -1)
      c2.close()
    } finally srv.close()
  }

  test("a client with the wrong server key cannot complete the handshake") {
    val kp = SecureChannel.generateKeyPair()
    val wrong = SecureChannel.generateKeyPair()
    val engine = new GraftEngine(spark, () => 1700000000000L)
    val srv = new ZestWireServer(engine, serverKeys = Some(kp))
    try {
      val sock = new Socket("127.0.0.1", srv.boundPort)
      sock.setSoTimeout(20000)
      val out = new DataOutputStream(
        new java.io.BufferedOutputStream(sock.getOutputStream))
      val in = new DataInputStream(sock.getInputStream)
      out.write(ZmtpCodec.greeting(asServer = false, "CURVE")); out.flush()
      val g = new Array[Byte](64); in.readFully(g)
      val hs = new ZmtpCurve.ClientHandshake(ZmtpCurve.generate(),
        SecureChannel.rawPublic(wrong))
      ZmtpCodec.writeFrame(out, ZmtpCodec.FlagCommand, hs.hello()); out.flush()
      // the server cannot open the HELLO box: connection drops, no WELCOME
      assert(in.read() === -1)
      sock.close()
    } finally srv.close()
  }

  test("Session counters: the first server MESSAGE nonce follows READY's") {
    // pin the nonce discipline the stock client enforces (strictly
    // increasing per sender across the whole short-nonce space)
    val serverKeys = ZmtpCurve.generate()
    val clientKeys = ZmtpCurve.generate()
    val hs = new ZmtpCurve.ServerHandshake(serverKeys)
    val chs = new ZmtpCurve.ClientHandshake(clientKeys, serverKeys.publicRaw)
    val welcome = hs.onHello(chs.hello())
    val (initiate, cont) = chs.onWelcome(welcome)
    val (ready, sSess, _, md) = hs.onInitiate(initiate)
    assert(md("Socket-Type") == "REQ")
    val (cSess, _) = cont(ready)
    // server -> client and client -> server both flow through the pair
    val m1 = sSess.sealMessage(0, "push".getBytes)
    assert(new String(cSess.openMessage(m1)._2) === "push")
    val m2 = cSess.sealMessage(0, "req".getBytes)
    assert(new String(sSess.openMessage(m2)._2) === "req")
  }
}

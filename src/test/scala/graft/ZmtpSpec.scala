package graft

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket

import org.scalatest.funsuite.AnyFunSuite

import graft.server.{SecureChannel, ZestCodec, ZestWireServer, ZmtpCodec}

/** ZMTP 3.0 transport mode (r12 verdict task 3): golden greeting/frame
  * bytes against the public spec, a full REQ round trip, DEALER observe
  * pushes, coexistence with the legacy u32 framing on one port, and the
  * secure-mode refusal.
  */
class ZmtpSpec extends AnyFunSuite with SparkTestBase {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  private class ZClient(port: Int, socketType: String) {
    private val sock = new Socket("127.0.0.1", port)
    sock.setSoTimeout(20000)
    sock.setTcpNoDelay(true)
    val out = new DataOutputStream(
      new java.io.BufferedOutputStream(sock.getOutputStream))
    val in = new DataInputStream(sock.getInputStream)

    /** Full NULL handshake; returns the server's raw greeting + its READY
      * properties for assertions.
      */
    def handshake(): (Array[Byte], Map[String, Array[Byte]]) = {
      out.write(ZmtpCodec.greeting(asServer = false)); out.flush()
      val g = new Array[Byte](64); in.readFully(g)
      val bos = new ByteArrayOutputStream()
      ZmtpCodec.writeFrame(new DataOutputStream(bos), ZmtpCodec.FlagCommand,
        ZmtpCodec.ready(socketType))
      out.write(bos.toByteArray); out.flush()
      val (flags, body) = ZmtpCodec.readFrame(in)
      assert((flags & ZmtpCodec.FlagCommand) != 0)
      val (name, props) = ZmtpCodec.parseCommand(body)
      assert(name === "READY")
      (g, props)
    }

    def sendMessage(frames: Seq[Array[Byte]]): Unit = {
      val bos = new ByteArrayOutputStream()
      val o = new DataOutputStream(bos)
      frames.zipWithIndex.foreach { case (f, i) =>
        ZmtpCodec.writeFrame(o,
          if (i < frames.length - 1) ZmtpCodec.FlagMore else 0, f)
      }
      out.write(bos.toByteArray); out.flush()
    }

    def readMessage(): Seq[Array[Byte]] = {
      val frames = Seq.newBuilder[Array[Byte]]
      var more = true
      while (more) {
        val (flags, body) = ZmtpCodec.readFrame(in)
        frames += body
        more = (flags & ZmtpCodec.FlagMore) != 0
      }
      frames.result()
    }

    def readCommand(): (String, Map[String, Array[Byte]]) = {
      val (flags, body) = ZmtpCodec.readFrame(in)
      assert((flags & ZmtpCodec.FlagCommand) != 0)
      ZmtpCodec.parseCommand(body)
    }

    def close(): Unit = sock.close()
  }

  test("golden bytes: greeting, short frame, long frame, READY command") {
    // greeting per https://rfc.zeromq.org/spec/23/: signature FF..7F,
    // version 3.0, mechanism NULL zero-padded, as-server, 31 filler
    assert(hex(ZmtpCodec.greeting(asServer = true)) ===
      "ff" + "00" * 8 + "7f" + "0300" +
        hex("NULL".getBytes("US-ASCII")) + "00" * 16 + "01" + "00" * 31)
    assert(ZmtpCodec.greeting(asServer = false)(32) === 0.toByte)

    def frameBytes(flags: Int, body: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ZmtpCodec.writeFrame(new DataOutputStream(bos), flags, body)
      bos.toByteArray
    }
    // short final frame "abc": flags 0x00, size 0x03, body
    assert(hex(frameBytes(0, "abc".getBytes)) === "0003616263")
    // short MORE frame: flags 0x01
    assert(hex(frameBytes(ZmtpCodec.FlagMore, "abc".getBytes)) === "0103616263")
    // long frame (>255): flags 0x02, 8-octet BE size
    val big = Array.fill[Byte](256)(0x61)
    assert(hex(frameBytes(0, big)).startsWith("02" + "0000000000000100" + "61"))
    // READY command body: 05 'READY' + "Socket-Type" metadata
    assert(hex(ZmtpCodec.ready("REQ")) ===
      "05" + hex("READY".getBytes) +
        "0b" + hex("Socket-Type".getBytes) + "00000003" + hex("REQ".getBytes))
    // round trip through the reader
    val in = new DataInputStream(
      new java.io.ByteArrayInputStream(frameBytes(0, big)))
    val (f, b) = ZmtpCodec.readFrame(in)
    assert(f === ZmtpCodec.FlagLong && b.length === 256)
  }

  test("a ZMTP REQ client completes the NULL handshake and a GET round trip") {
    val engine = new GraftEngine(spark, () => 1700000000000L)
    val srv = new ZestWireServer(engine)
    try {
      val c = new ZClient(srv.boundPort, "REQ")
      val (g, props) = c.handshake()
      // the server's greeting, byte-exact (as-server is 0 under NULL —
      // the field is meaningful only for CURVE/PLAIN per the spec)
      assert(hex(g) === hex(ZmtpCodec.greeting(asServer = false)))
      assert(new String(props("Socket-Type"), "US-ASCII") === "ROUTER")
      // REQ message: [empty delimiter][zest request frame]
      c.sendMessage(Seq(Array.emptyByteArray,
        ZestCodec.encode(ZestCodec.request(1, "/hello"))))
      val reply = c.readMessage()
      assert(reply.length === 2)
      assert(reply.head.isEmpty, "reply must echo the REQ envelope")
      val f = ZestCodec.decode(reply(1))
      assert(f.code === 69 && f.payloadString === "hello world!")
      // a POST and a readback through the same connection
      c.sendMessage(Seq(Array.emptyByteArray,
        ZestCodec.encode(ZestCodec.request(2, "/ts/z/at/1000",
          payload = """{"value": 7}"""))))
      assert(ZestCodec.decode(c.readMessage()(1)).code === 65)
      c.sendMessage(Seq(Array.emptyByteArray,
        ZestCodec.encode(ZestCodec.request(1, "/ts/z/latest"))))
      val latest = ZestCodec.decode(c.readMessage()(1))
      assert(latest.payloadString.contains("\"value\": 7"))
      c.close()
    } finally srv.close()
  }

  test("a DEALER observer gets pushes; legacy and ZMTP clients share the port") {
    var now = 1700000000000L
    val engine = new GraftEngine(spark, () => { now += 1; now })
    val srv = new ZestWireServer(engine, clockMs = () => now)
    try {
      val obs = new ZClient(srv.boundPort, "DEALER")
      obs.handshake()
      // DEALER registration: no envelope
      obs.sendMessage(Seq(ZestCodec.encode(ZestCodec.request(1, "/ts/zz/*",
        observe = Some("data"), maxAgeSec = Some(0L)))))
      val ackF = ZestCodec.decode(obs.readMessage().last)
      assert(ackF.code === 69)
      val uuid = ackF.payloadString

      // writer on the SAME port, LEGACY framing (auto-detect coexistence)
      val ls = new Socket("127.0.0.1", srv.boundPort)
      ls.setSoTimeout(20000); ls.setTcpNoDelay(true)
      val lout = new DataOutputStream(
        new java.io.BufferedOutputStream(ls.getOutputStream))
      val lin = new DataInputStream(ls.getInputStream)
      val req = ZestCodec.encode(ZestCodec.request(2, "/ts/zz/at/1000",
        payload = """{"value": 3}"""))
      lout.writeInt(req.length); lout.write(req); lout.flush()
      val rl = lin.readInt(); val rb = new Array[Byte](rl); lin.readFully(rb)
      assert(ZestCodec.decode(rb).code === 65)

      // the push arrives as an envelope-free single-frame ZMTP message
      val push = obs.readMessage()
      assert(push.length === 1)
      val pf = ZestCodec.decode(push.head)
      assert(pf.code === 69)
      assert(pf.options.exists(o => o.number === 2048 && o.string === uuid))
      assert(pf.payloadString.contains("/ts/zz/at/1000"))
      ls.close(); obs.close()
    } finally srv.close()
  }

  test("an expired ZMTP observer gets its one 163 as an envelope-free push") {
    var now = 1700000000000L
    val engine = new GraftEngine(spark, () => now)
    val srv = new ZestWireServer(engine, clockMs = () => now)
    try {
      val obs = new ZClient(srv.boundPort, "DEALER")
      obs.handshake()
      obs.sendMessage(Seq(ZestCodec.encode(ZestCodec.request(1, "/ts/ex/*",
        observe = Some("data"), maxAgeSec = Some(10L)))))
      val uuid = ZestCodec.decode(obs.readMessage().last).payloadString
      now += 11000L
      // any next message triggers the sweep — a legacy client's GET here
      val ls = new java.net.Socket("127.0.0.1", srv.boundPort)
      ls.setSoTimeout(20000); ls.setTcpNoDelay(true)
      val lout = new DataOutputStream(
        new java.io.BufferedOutputStream(ls.getOutputStream))
      val lin = new DataInputStream(ls.getInputStream)
      val req = ZestCodec.encode(ZestCodec.request(1, "/hello"))
      lout.writeInt(req.length); lout.write(req); lout.flush()
      val n = lin.readInt(); val b = new Array[Byte](n); lin.readFully(b)
      assert(ZestCodec.decode(b).code === 69)
      val end = obs.readMessage()
      assert(end.length === 1)
      val ef = ZestCodec.decode(end.head)
      assert(ef.code === 163)
      assert(ef.options.exists(o => o.number === 2048 && o.string === uuid))
      ls.close(); obs.close()
    } finally srv.close()
  }

  test("a multipart body is a protocol error (128), never a silent truncation") {
    val engine = new GraftEngine(spark, () => 1700000000000L)
    val srv = new ZestWireServer(engine)
    try {
      val c = new ZClient(srv.boundPort, "DEALER")
      c.handshake()
      c.sendMessage(Seq(
        ZestCodec.encode(ZestCodec.request(2, "/ts/m/at/1",
          payload = """{"value":""")),
        "1}".getBytes("UTF-8"))) // request split across two body frames
      assert(ZestCodec.decode(c.readMessage().last).code === 128)
      // the connection survives and a well-formed request still works
      c.sendMessage(Seq(ZestCodec.encode(ZestCodec.request(1, "/hello"))))
      assert(ZestCodec.decode(c.readMessage().last).payloadString === "hello world!")
      c.close()
    } finally srv.close()
  }

  test("an invalid peer socket type is refused with an ERROR command") {
    val engine = new GraftEngine(spark, () => 1700000000000L)
    val srv = new ZestWireServer(engine)
    try {
      val c = new ZClient(srv.boundPort, "PUB")
      c.handshake()
      val (name, props) = c.readCommand()
      assert(name === "ERROR")
      assert(new String(props("reason"), "US-ASCII").contains("invalid socket type"))
      c.close()
    } finally srv.close()
  }

  test("secure mode speaks CURVE on ZMTP; a NULL client is refused with ERROR") {
    val engine = new GraftEngine(spark, () => 1700000000000L)
    val srv = new ZestWireServer(engine,
      serverKeys = Some(SecureChannel.generateKeyPair()))
    try {
      val c = new ZClient(srv.boundPort, "REQ")
      c.out.write(ZmtpCodec.greeting(asServer = false)); c.out.flush()
      val g = new Array[Byte](64); c.in.readFully(g)
      // the server advertises CURVE (NULL can never bypass the crypto)
      assert(new String(g.slice(12, 32), "US-ASCII").takeWhile(_ != 0) === "CURVE")
      assert(g(32) === 1.toByte) // as-server
      val (name, props) = c.readCommand()
      assert(name === "ERROR")
      assert(new String(props("reason"), "US-ASCII").contains("NULL not supported"))
      c.close()
    } finally srv.close()
  }
}

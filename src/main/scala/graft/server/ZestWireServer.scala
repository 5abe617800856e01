package graft.server

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket}
import java.security.KeyPair
import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import graft.GraftEngine
import graft.server.ZestCodec._

/** The BINARY wire front-end: [[ZestCodec]] frames over TCP — the
  * faithful-framing twin of the JSON-lines [[WireServer]], closing the
  * reference-fidelity gap SURVEY §2.6 documented. Request/response and
  * push frames are the reference's exact byte format
  * (`/root/reference/src/protocol/zest.re:12-216`); the transport
  * differences, both documented stand-ins:
  *
  *  - ZeroMQ's REQ/REP + ROUTER/DEALER delimited messages ride TWO
  *    transports on one port, auto-detected from the first byte: the
  *    repo's u32-length-prefix framing (leads 0x00), and — r13 — real
  *    ZMTP 3.0 with NULL security ([[ZmtpCodec]]; a greeting leads
  *    0xFF), so a stock libzmq REQ/DEALER client can connect the way it
  *    does to the reference's sockets (`zest.re:224-263`). The ROUTER
  *    identity is carried IN-BAND on both: pushes append option 2048
  *    (the router-key option number) holding the subscription uuid, and
  *    flow to the observer's own connection;
  *  - channel crypto: pass `serverKeys` to require it. On the ZMTP
  *    transport this is CurveZMQ PROPER — the full ZMTP CURVE mechanism
  *    ([[ZmtpCurve]]: HELLO/WELCOME cookie/INITIATE vouch/READY +
  *    XSalsa20-Poly1305 MESSAGE boxes; a stock libzmq client with the
  *    published server key connects, interop-validated PERF.md r13). On
  *    the legacy u32 framing it is [[SecureChannel]] (same trust model
  *    and cipher suite, Noise-NK-shaped exchange): the first frame pair
  *    is the 32-byte ephemeral handshake, every later frame is sealed.
  *
  * Verb dispatch is the reference's `handle_msg` tree
  * (`server.re:1042-1060`): code 1 GET (an Observe option upgrades to a
  * registration, `/notification/response/...` registers a notify
  * callback), 2 POST (`/notification/request/...` is the notification
  * RPC), 4 DELETE; every request validates the (possibly empty) token;
  * every response routes to observers in-process; the expiry sweep runs
  * before each message and owes each dead observer one bare-163 frame.
  * Concurrency is [[WireServer]]'s reader-writer split with per-connection
  * bounded outbound queues.
  */
class ZestWireServer(engine: GraftEngine, port: Int = 0,
                     clockMs: () => Long = () => System.currentTimeMillis(),
                     serverKeys: Option[KeyPair] = None,
                     observerQueueSize: Int = 1024,
                     runtime: Option[WireRuntime] = None) {

  // shared with every other front-end of this engine (see WireRuntime)
  private val rt = runtime.getOrElse(new WireRuntime(engine))

  private val server = new ServerSocket(port)
  def boundPort: Int = server.getLocalPort

  /** The router-key string handed out in observe/notify acks — the
    * channel public key when encryption is on (what the reference
    * publishes, `zest.re:236-249`), else a fixed tag.
    */
  val routerPublicKey: String = serverKeys
    .map(kp => java.util.Base64.getEncoder.encodeToString(SecureChannel.rawPublic(kp)))
    .getOrElse("router-key")

  // one outbound-queue entry; the transport decision (legacy u32 framing,
  // ZMTP multipart, raw handshake bytes) and the seal decision are both
  // pinned AT ENQUEUE TIME — reading channel state at dequeue time would
  // race the handshakes that mutate it (ADVICE r12: the secure handshake
  // used to dodge this with a second DataOutputStream on the same socket,
  // safe only while the queue was provably empty)
  private sealed trait OutEntry
  private final case class LegacyFrame(b: Array[Byte], sealable: Boolean) extends OutEntry
  private final case class ZmtpMsg(frames: Seq[Array[Byte]]) extends OutEntry
  private final case class RawBytes(b: Array[Byte]) extends OutEntry

  private final class Channel(sock: Socket) {
    sock.setTcpNoDelay(true)
    // buffer so the length prefix and body leave as ONE packet — the
    // unbuffered writeInt+write pair triggers Nagle/delayed-ACK stalls
    // (~40 ms per frame, measured: 11 posts/s before, wire-rate after)
    private val out = new DataOutputStream(
      new java.io.BufferedOutputStream(sock.getOutputStream))
    private val q = new LinkedBlockingQueue[OutEntry](observerQueueSize)
    @volatile private var dead = false
    @volatile var session: SecureChannel.Session = null
    /** ZMTP transport mode (set before the greeting is enqueued). */
    @volatile var zmtp = false
    /** CURVE record session (set before READY is enqueued — no ZmtpMsg
      * can exist earlier, so every message entry sees it).
      */
    @volatile var curveSession: ZmtpCurve.Session = null
    /** The in-flight ZMTP request's envelope (leading empty frames) —
      * replies echo it (the REQ contract); set by the single reader
      * thread before dispatch, so it is stable while the reply enqueues.
      */
    @volatile var requestEnvelope: Seq[Array[Byte]] = Nil
    def isDead: Boolean = dead
    private val writer = new Thread(() => {
      while (!dead) {
        val e = q.poll(200, TimeUnit.MILLISECONDS)
        if (e != null) {
          try e match {
            case LegacyFrame(m, sealable) =>
              val wire = if (sealable && session != null) session.seal(m) else m
              out.writeInt(wire.length); out.write(wire); out.flush()
            case ZmtpMsg(frames) =>
              val cs = curveSession
              if (cs != null) {
                // CURVE: each part travels as a sealed MESSAGE command in
                // a flags-0 ZMTP frame; MORE rides INSIDE the box
                frames.zipWithIndex.foreach { case (f, i) =>
                  ZmtpCodec.writeFrame(out, 0,
                    cs.sealMessage(if (i < frames.length - 1) 1 else 0, f))
                }
                out.flush()
              } else ZmtpCodec.writeMessage(out, frames)
            case RawBytes(b) => out.write(b); out.flush()
          } catch { case _: java.io.IOException => dead = true }
        }
      }
    }, "zest-channel-writer")
    writer.setDaemon(true)
    writer.start()
    private def offer(e: OutEntry): Boolean =
      !dead && (q.offer(e) || { dead = true; false })
    /** A REPLY: echoes the request envelope in ZMTP mode. */
    def send(m: Array[Byte]): Boolean =
      offer(if (zmtp) ZmtpMsg(requestEnvelope :+ m) else LegacyFrame(m, sealable = true))
    /** A PUSH (observe fan-out / notify): envelope-free single frame in
      * ZMTP mode — the ROUTER-to-DEALER delivery shape.
      */
    def sendPush(m: Array[Byte]): Boolean =
      offer(if (zmtp) ZmtpMsg(Seq(m)) else LegacyFrame(m, sealable = true))
    /** Pre-session raw send (secure handshake only): never sealed. */
    def sendRaw(m: Array[Byte]): Boolean = offer(LegacyFrame(m, sealable = false))
    /** Pre-encoded transport bytes (ZMTP greeting/handshake commands). */
    def sendBytes(b: Array[Byte]): Boolean = offer(RawBytes(b))
    def close(): Unit = {
      dead = true
      try sock.close() catch { case _: Exception => () }
    }
  }

  private val live = java.util.concurrent.ConcurrentHashMap.newKeySet[Channel]()
  @volatile private var running = true

  private val accepter = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => handle(s))
        t.setDaemon(true)
        t.start()
      } catch { case _: java.io.IOException => () }
    }
  }, "zest-server-accept")
  accepter.setDaemon(true)
  accepter.start()

  def close(): Unit = {
    running = false
    server.close()
    live.forEach { ch => rt.dropOwned(ch); ch.close() }
    live.clear()
  }

  private def evict(ch: Channel): Unit = rt.dropOwned(ch)

  /** A push: the reference ack frame + option 2048 carrying the ident (the
    * ROUTER-identity, in-band).
    */
  private def push(ident: String, base: Frame): Frame =
    base.copy(options = base.options :+ strOption(2048, ident))

  /** This transport's delivery endpoint for one registration: length-
    * prefixed (sealed) frames; the 163 is the bare ack
    * (`handle_expire` routes create_ack(163)).
    */
  private def binSink(ident: String, ch: Channel): rt.Sink = new rt.Sink {
    def push(formatCode: Int, message: String): Boolean =
      ch.sendPush(encode(ZestWireServer.this.push(ident, ackPayload(formatCode, message))))
    def end(): Unit = ch.sendPush(encode(ZestWireServer.this.push(ident, ack(163))))
    def owner: AnyRef = ch
  }

  private def readFrame(in: DataInputStream): Array[Byte] = {
    val len = in.readInt()
    require(len >= 0 && len <= 16 * 1024 * 1024, s"bad frame length $len")
    val b = new Array[Byte](len)
    in.readFully(b)
    b
  }

  private def handle(sock: Socket): Unit = {
    val pin = new java.io.PushbackInputStream(
      new java.io.BufferedInputStream(sock.getInputStream), 1)
    val in = new DataInputStream(pin)
    val ch = new Channel(sock)
    live.add(ch)
    try {
      // transport auto-detect: a ZMTP greeting leads with 0xFF; the
      // legacy u32 length prefix of a <=16 MB frame leads with 0x00 (in
      // secure legacy mode the first frame is the 32-byte ephemeral, so
      // its prefix also leads 0x00). A ZMTP client on a secure server
      // gets the CURVE mechanism — the reference's actual transport
      // security; NULL is refused there so it can never bypass the
      // channel crypto.
      val first = pin.read()
      if (first < 0) return
      pin.unread(first)
      if (first == 0xff) { zmtpHandle(sock, ch, in); return }
      serverKeys.foreach { kp => // required handshake before any frame
        // a connect-and-say-nothing client must not pin this thread: the
        // handshake has 30 s; an established session blocks freely
        sock.setSoTimeout(30000)
        val clientEph = readFrame(in)
        val (serverEph, session) = SecureChannel.serverHandshake(kp, clientEph)
        // the ephemeral reply rides the Channel's own writer (raw mode) —
        // ONE stream owns the socket; FIFO order guarantees it leaves
        // before the sealed ReadyFrame
        ch.sendRaw(serverEph)
        ch.session = session // writer thread seals sealable frames from here on
        ch.send(SecureChannel.ReadyFrame)
        sock.setSoTimeout(0)
      }
      var open = true
      while (open && running && !ch.isDead) {
        try {
          val raw = readFrame(in)
          val plain = if (ch.session != null) ch.session.open(raw) else raw
          dispatch(plain, ch)
        } catch {
          case _: EOFException => open = false
          case _: java.io.IOException => open = false
          case _: javax.crypto.AEADBadTagException => open = false // tamper: drop
        }
      }
    } catch { case _: Exception => () }
    finally {
      evict(ch)
      ch.close()
      live.remove(ch)
    }
  }

  /** ZMTP session (`ZmtpCodec`): greeting exchange, NULL-mechanism READY
    * handshake (this endpoint plays ROUTER — valid peer for the
    * reference's REQ clients and for DEALER observers), then each inbound
    * message's body frame is one zest request dispatched through the SAME
    * verb tree as the legacy framing; replies echo the request envelope
    * (the REQ contract), pushes leave as envelope-free single-frame
    * messages (the ROUTER-to-DEALER shape).
    */
  private def zmtpHandle(sock: Socket, ch: Channel, in: DataInputStream): Unit = {
    ch.zmtp = true
    // the handshake phase gets the secure branch's guard: a
    // connect-and-greet-then-stall client must not pin this thread (r13
    // review); an established session blocks freely
    sock.setSoTimeout(30000)
    // a secure server speaks CURVE on this transport (the reference's
    // actual mechanism, zest.re:236-263); plaintext servers speak NULL
    val myMech = if (serverKeys.isDefined) "CURVE" else "NULL"
    // send eagerly: libzmq completes its own greeting only after reading
    // the peer's signature — both sides waiting would deadlock
    ch.sendBytes(ZmtpCodec.greeting(asServer = serverKeys.isDefined, myMech))
    // a handshake reject must actually LEAVE before the socket closes:
    // the writer thread drains asynchronously, so park until the peer
    // reads the ERROR and closes — bounded by the handshake SoTimeout, so
    // a peer that never closes costs 30 s, not a thread forever
    def rejectAndLinger(reason: String): Unit = {
      ch.sendBytes(encodeZmtpCommand(ZmtpCodec.error(reason)))
      try { while (in.read() >= 0) () } catch { case _: Exception => () }
    }
    val (_, mech) = ZmtpCodec.readGreeting(in)
    if (mech != myMech) {
      rejectAndLinger(s"mechanism $mech not supported")
      return
    }
    if (myMech == "CURVE") { zmtpCurveLoop(sock, ch, in); return }
    ch.sendBytes(encodeZmtpCommand(ZmtpCodec.ready("ROUTER")))
    val (flags, body) = ZmtpCodec.readFrame(in)
    require((flags & ZmtpCodec.FlagCommand) != 0, "expected a ZMTP command")
    val (name, props) = ZmtpCodec.parseCommand(body)
    require(name == "READY", s"expected READY, got $name")
    val peerType = props.get("Socket-Type")
      .map(new String(_, "US-ASCII")).getOrElse("")
    if (!ZmtpCodec.acceptedPeers(peerType)) {
      rejectAndLinger(s"invalid socket type $peerType")
      return
    }
    sock.setSoTimeout(0) // handshake done: idle connections are allowed
    var open = true
    while (open && running && !ch.isDead) {
      try {
        val (env, bodyFrames) = ZmtpCodec.readMessage(in)
        ch.requestEnvelope = env
        // zest requests are SINGLE-frame: a multipart body is a protocol
        // error, answered 128 rather than silently truncated (r13 review)
        if (bodyFrames.lengthIs == 1) dispatch(bodyFrames.head, ch)
        else ch.send(encode(ack(128)))
      } catch {
        case _: EOFException => open = false
        case _: java.io.IOException => open = false
      }
    }
  }

  /** The CURVE side of the ZMTP transport ([[ZmtpCurve]]): HELLO ->
    * WELCOME (cookie) -> INITIATE (vouch) -> READY, then each inbound
    * flags-0 frame is a sealed MESSAGE command; multipart (the REQ
    * envelope) rides the box flags. A handshake violation throws and
    * drops the connection (libzmq's own behavior on a failed CURVE
    * exchange). Like the reference, client permanent keys are not
    * allow-listed — request auth is the macaroon tokens in the zest
    * frames.
    */
  private def zmtpCurveLoop(sock: Socket, ch: Channel, in: DataInputStream): Unit = {
    val hs = new ZmtpCurve.ServerHandshake(ZmtpCurve.keysFrom(serverKeys.get))
    val (f1, helloBody) = ZmtpCodec.readFrame(in)
    require((f1 & ZmtpCodec.FlagCommand) != 0, "expected HELLO command")
    ch.sendBytes(encodeZmtpCommand(hs.onHello(helloBody)))
    val (f2, initBody) = ZmtpCodec.readFrame(in)
    require((f2 & ZmtpCodec.FlagCommand) != 0, "expected INITIATE command")
    val (ready, session, _, _) = hs.onInitiate(initBody)
    ch.curveSession = session // before READY enqueues: no ZmtpMsg exists yet
    ch.sendBytes(encodeZmtpCommand(ready))
    sock.setSoTimeout(0)
    val cur = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var open = true
    while (open && running && !ch.isDead) {
      try {
        val (_, body) = ZmtpCodec.readFrame(in)
        val (mflags, payload) = session.openMessage(body)
        cur += payload
        if ((mflags & 1) == 0) { // final part: one complete message
          val all = cur.toSeq; cur.clear()
          val (env, rest) = all.span(_.isEmpty)
          val (envF, bodyF) =
            if (rest.isEmpty) (all.dropRight(1), all.takeRight(1)) else (env, rest)
          ch.requestEnvelope = envF
          if (bodyF.lengthIs == 1) dispatch(bodyF.head, ch)
          else ch.send(encode(ack(128)))
        }
      } catch {
        case _: EOFException => open = false
        case _: java.io.IOException => open = false
        case _: javax.crypto.AEADBadTagException => open = false // tamper: drop
      }
    }
  }

  private def encodeZmtpCommand(body: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    ZmtpCodec.writeFrame(new DataOutputStream(bos), ZmtpCodec.FlagCommand, body)
    bos.toByteArray
  }

  private def route(path: String, format: Int, payload: String,
                    method: String, respCode: Int,
                    client: String = "client.local"): Unit =
    rt.deliver(format, engine.fanoutLocal(clockMs(), path,
      ZestCodec.formatName(format), payload, method = method,
      respCode = respCode,
      client = if (client.isEmpty) "client.local" else client))

  /** True for `/kv/<id>/<key>` value reads (NOT keys/count, whose results
    * are JSON text in every store — `server.re:525-559`).
    */
  private def isKvValueRead(path: String): Boolean =
    path.stripPrefix("/").split("/").toList match {
      case "kv" :: _ :: key :: Nil => key != "keys" && key != "count"
      case _ => false
    }

  private def locked[A](l: java.util.concurrent.locks.Lock)(f: => A): A = {
    l.lock(); try f finally l.unlock()
  }

  private def dispatch(bytes: Array[Byte], ch: Channel): Unit = {
    var replied = false
    def reply(f: Frame): Unit =
      if (!replied) { replied = true; if (!ch.send(encode(f))) evict(ch) }
    try {
      val f = decode(bytes)
      val path = f.uriPath
      val fmt = f.contentFormat
      val fname = f.contentFormatName
      // sweep under the WRITE lock (see WireRuntime.rw), gated on the
      // earliest-expiry bound so reads skip the write lock when nothing
      // can be expired (ADVICE r12)
      val nowMs = clockMs()
      if (engine.sweepDue(nowMs))
        locked(rt.rw.writeLock()) { rt.sweep(nowMs) }
      def denied(method: String): Unit = {
        route(path, fmt, "", method, respCode = 129, client = f.uriHost)
        reply(ack(129))
      }
      f.code match {
        case 1 if f.observed != "none" => // observation request
          locked(rt.rw.writeLock()) {
            engine.observeAuthed(f.token, path, fname, f.observed, f.maxAge) match {
              case Left(_) => denied("GET")
              case Right(uuid) =>
                rt.register(uuid, binSink(uuid, ch))
                reply(ackObserve(routerPublicKey, uuid))
                route(path, fmt, "", "GET(OBSERVE)", respCode = 69, client = f.uriHost)
            }
          }
        case 1 if path.startsWith("/notification/response/") =>
          // notify-callback registration (`server.re:611-618`): Notify ack
          // with the router key, 163 on duplicate
          locked(rt.rw.writeLock()) {
            if (!engine.isValidToken(f.token, path, "GET")) denied("GET")
            else engine.notifyRegister(path) match {
              case Left(_)  => reply(ack(163))
              case Right(_) =>
                // the registering connection is the response route's
                // target, keyed by the callback path
                rt.register(path, binSink(path, ch))
                reply(ackNotification(routerPublicKey))
            }
          }
        case 1 =>
          locked(rt.rw.readLock()) {
            engine.getAuthed(f.token, path, fname) match {
              case Left(_) => denied("GET")
              case Right(body) =>
                route(path, fmt, "", "GET", respCode = 69, client = f.uriHost)
                // binary kv VALUES round-trip as raw bytes on this wire:
                // the engine stores them base64 (its string-typed store),
                // the frame carries the decoded bytes (`server.re:548-559`
                // returns the binary store's content verbatim)
                if (fname == "binary" && isKvValueRead(path))
                  reply(Frame(69, "", Seq(u16Option(12, fmt)),
                    java.util.Base64.getDecoder.decode(body)))
                else reply(ackPayload(fmt, body))
            }
          }
        case 2 if path.startsWith("/notification/") =>
          locked(rt.rw.writeLock()) {
            if (!engine.isValidToken(f.token, path, "POST")) denied("POST")
            else engine.notificationLocal(path, f.payloadString, fname,
              client = if (f.uriHost.isEmpty) "client.local" else f.uriHost) match {
              case Left(m) if m.startsWith("bad notification") => reply(ack(128))
              case Left(_) => reply(ack(163)) // no observer
              case Right(out) =>
                rt.deliver(fmt, out)
                // the notification POST's response routes like any POST:
                // data/audit observers of the request path see it too
                // (`handle_post_observed`, `server.re:896-907`)
                route(path, fmt, f.payloadString, "POST", respCode = 65,
                  client = f.uriHost)
                reply(ack(65))
            }
          }
        case 2 =>
          // binary kv values land base64 in the engine's string store
          val payloadStr =
            if (fname == "binary" && path.startsWith("/kv/"))
              java.util.Base64.getEncoder.encodeToString(f.payload)
            else f.payloadString
          locked(rt.rw.writeLock()) {
            engine.postAuthed(f.token, path, payloadStr, fname) match {
              case Left(m) if m.startsWith("unauthorized") => denied("POST")
              case Left(_) => reply(ack(128))
              case Right(_) =>
                route(path, fmt, payloadStr, "POST", respCode = 65, client = f.uriHost)
                reply(ack(65))
            }
          }
        case 4 =>
          locked(rt.rw.writeLock()) {
            engine.deleteAuthed(f.token, path, fname) match {
              case Left(m) if m.startsWith("unauthorized") => denied("DELETE")
              case Left(_) => reply(ack(128))
              case Right(_) =>
                route(path, fmt, "", "DELETE", respCode = 66, client = f.uriHost)
                reply(ack(66))
            }
          }
        case _ => reply(ack(128)) // reference failwith("invalid code")
      }
    } catch {
      case _: graft.zestql.ParseError => reply(ack(128))
      case _: graft.ResultCodec.ResultTooLarge => reply(ack(143))
      case _: Exception => reply(ack(128))
    }
  }
}

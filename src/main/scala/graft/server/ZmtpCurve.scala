package graft.server

import java.security.{KeyFactory, KeyPair, SecureRandom}
import java.security.interfaces.XECPrivateKey
import java.security.spec.{NamedParameterSpec, XECPrivateKeySpec}
import javax.crypto.KeyAgreement

/** The ZMTP CURVE mechanism — CurveZMQ's HELLO / WELCOME (cookie) /
  * INITIATE (vouch) / READY handshake and MESSAGE record protection —
  * implemented from the public specs (rfc.zeromq.org 25/ZMTP-CURVE,
  * 26/CurveZMQ) over [[NaclCrypto]]'s libsodium-vector-pinned
  * primitives and the JDK's X25519.
  *
  * This is the reference's ACTUAL transport security
  * (`/root/reference/src/protocol/zest.re:236-263` sets
  * `set_curve_server/set_curve_secretkey` on both sockets): with this
  * mechanism on the ZMTP transport, a STOCK libzmq client configured
  * with the server's public key — exactly how zest clients get
  * `--server-key` — completes the curve handshake against this server.
  * Every command layout below was confirmed byte-for-byte against a
  * real libzmq 4.3.5 CURVE client driven during development (PERF.md
  * r13); the committed regression anchor is ZmtpCurveSpec, whose client
  * half exercises the same grammar.
  *
  * Wire grammar (all boxes are NaCl `crypto_box`; `C`/`S` permanent,
  * `C'`/`S'` ephemeral; 8-byte short nonces are each sender's strictly
  * increasing counter under a 16-byte ASCII prefix, 16-byte long nonces
  * are random under an 8-byte prefix):
  *
  *  - HELLO  (C->S, 200 octets): `%x05 "HELLO"` version=1.0, 72 zero
  *    padding, C' (32), nonce8, box(64 zeros, "CurveZMQHELLO---"+n8,
  *    C'->S) — proves the client holds C''s secret and knows S.
  *  - WELCOME (S->C, 168): `%x07 "WELCOME"` nonce16,
  *    box(S' + cookie(96), "WELCOME-"+n16, S->C'). The cookie =
  *    nonce16 + secretbox(C' + s'-secret, "COOKIE--"+n16, cookie key)
  *    lets the server hold NO state until INITIATE proves liveness.
  *  - INITIATE (C->S): `%x08 "INITIATE"` cookie(96), nonce8,
  *    box(C + vouch(96) + metadata, "CurveZMQINITIATE"+n8, C'->S');
  *    vouch = nonce16 + box(C' + S, "VOUCH---"+n16, C->S') — binds the
  *    ephemeral to the client's permanent key.
  *  - READY (S->C): `%x05 "READY"` nonce8, box(metadata,
  *    "CurveZMQREADY---"+n8, S'->C').
  *  - MESSAGE (both ways, NON-command ZMTP frames): `%x07 "MESSAGE"`
  *    nonce8, box(flags(1) + payload, "CurveZMQMESSAGEC"/"S"+n8,
  *    C'<->S'); flags bit0 = MORE (multipart rides INSIDE the boxes,
  *    the outer ZMTP frame flags stay 0).
  *
  * Metadata is ZMTP's name-octet/value-u32 property list (Socket-Type
  * et al). Like the reference, client PERMANENT keys are not
  * authenticated against a list (no ZAP handler) — request auth is the
  * macaroon tokens inside the zest frames.
  */
object ZmtpCurve {

  private val rng = new SecureRandom()

  /** A raw X25519 keypair (32-byte public u-coordinate + 32-byte
    * scalar) — the form every box needs and the cookie serializes.
    */
  final case class Keys(publicRaw: Array[Byte], scalar: Array[Byte])

  def generate(): Keys = keysFrom(SecureChannel.generateKeyPair())

  def keysFrom(kp: KeyPair): Keys = {
    val scalar = kp.getPrivate.asInstanceOf[XECPrivateKey].getScalar
      .orElseThrow(() => new IllegalStateException("opaque X25519 key"))
    Keys(SecureChannel.rawPublic(kp), scalar)
  }

  private def dh(ownScalar: Array[Byte], peerPubRaw: Array[Byte]): Array[Byte] = {
    val kf = KeyFactory.getInstance("XDH")
    val priv = kf.generatePrivate(
      new XECPrivateKeySpec(NamedParameterSpec.X25519, ownScalar))
    val ka = KeyAgreement.getInstance("XDH")
    ka.init(priv)
    ka.doPhase(SecureChannel.publicFromRaw(peerPubRaw), true)
    ka.generateSecret()
  }

  /** `crypto_box` precomputed key for (my secret, their public). */
  private def boxKey(ownScalar: Array[Byte], peerPubRaw: Array[Byte]): Array[Byte] =
    NaclCrypto.beforeNm(dh(ownScalar, peerPubRaw))

  private def nonce24(prefix: String, n: Array[Byte]): Array[Byte] = {
    val p = prefix.getBytes("US-ASCII")
    require(p.length + n.length == 24, s"bad nonce parts: $prefix")
    p ++ n
  }

  private def shortNonce(count: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(count).array()

  private def longNonce(): Array[Byte] = {
    val b = new Array[Byte](16); rng.nextBytes(b); b
  }

  // ---- metadata ------------------------------------------------------------

  def metadata(props: Seq[(String, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    props.foreach { case (k, v) =>
      o.writeByte(k.length); o.writeBytes(k)
      val vb = v.getBytes("US-ASCII")
      o.writeInt(vb.length); o.write(vb)
    }
    bos.toByteArray
  }

  def parseMetadata(b: Array[Byte]): Map[String, String] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(b))
    val out = Map.newBuilder[String, String]
    while (in.available() > 0) {
      val kl = in.readUnsignedByte()
      val k = new Array[Byte](kl); in.readFully(k)
      val vl = in.readInt()
      require(vl >= 0 && vl <= (1 << 20), s"bad metadata value length $vl")
      val v = new Array[Byte](vl); in.readFully(v)
      out += new String(k, "US-ASCII") -> new String(v, "US-ASCII")
    }
    out.result()
  }

  // ---- post-handshake record protection -------------------------------------

  /** Established MESSAGE session: one C'<->S' box key, per-direction
    * strictly-increasing counters (receive side enforces monotonicity —
    * the replay guard the transmitted nonce exists for).
    */
  final class Session(msgKey: Array[Byte], isServer: Boolean,
                      private var sendCount: Long) {
    private var lastRecv = 0L
    private def sendPrefix = if (isServer) "CurveZMQMESSAGES" else "CurveZMQMESSAGEC"
    private def recvPrefix = if (isServer) "CurveZMQMESSAGEC" else "CurveZMQMESSAGES"

    /** Full MESSAGE command body: `%x07 "MESSAGE"` nonce8 box. */
    def sealMessage(flags: Int, payload: Array[Byte]): Array[Byte] = this.synchronized {
      val n = shortNonce(sendCount); sendCount += 1
      Array[Byte](7) ++ "MESSAGE".getBytes("US-ASCII") ++ n ++
        NaclCrypto.secretboxSeal(msgKey, nonce24(sendPrefix, n), flags.toByte +: payload)
    }

    /** Open a MESSAGE command body -> (flags, payload); throws
      * `AEADBadTagException` on tamper and `IllegalArgumentException`
      * on grammar/replay violations.
      */
    def openMessage(body: Array[Byte]): (Int, Array[Byte]) = this.synchronized {
      require(body.length >= 16 + 17 &&
        body(0) == 7 && new String(body, 1, 7, "US-ASCII") == "MESSAGE",
        "not a MESSAGE command")
      val n = body.slice(8, 16)
      val count = java.nio.ByteBuffer.wrap(n).getLong
      require(count > lastRecv, s"non-increasing MESSAGE nonce $count")
      val plain = NaclCrypto.secretboxOpen(msgKey, nonce24(recvPrefix, n), body.drop(16))
      lastRecv = count
      (plain(0) & 0xff, plain.drop(1))
    }
  }

  // ---- server role -----------------------------------------------------------

  /** Server-side handshake. Holds the per-connection cookie key; the
    * ephemeral secret itself travels inside the cookie (the stateless
    * trick the spec designs for), so nothing else persists between
    * HELLO and INITIATE.
    */
  final class ServerHandshake(serverKeys: Keys) {
    private val cookieKey = { val b = new Array[Byte](32); rng.nextBytes(b); b }
    private var serverNonce = 0L
    private def nextNonce(): Array[Byte] = { serverNonce += 1; shortNonce(serverNonce) }
    private var lastClientNonce = 0L
    private def checkClientNonce(n: Array[Byte]): Unit = {
      val c = java.nio.ByteBuffer.wrap(n).getLong
      require(c > lastClientNonce, s"non-increasing client nonce $c")
      lastClientNonce = c
    }

    /** Validate HELLO, mint the ephemeral + cookie, return WELCOME. */
    def onHello(body: Array[Byte]): Array[Byte] = {
      require(body.length == 200 && body(0) == 5 &&
        new String(body, 1, 5, "US-ASCII") == "HELLO", "not a HELLO command")
      require(body(6) == 1, s"unsupported CURVE version ${body(6)}.${body(7)}")
      val cEph = body.slice(80, 112)
      val n8 = body.slice(112, 120)
      checkClientNonce(n8)
      val helloPlain = NaclCrypto.secretboxOpen(
        boxKey(serverKeys.scalar, cEph),
        nonce24("CurveZMQHELLO---", n8), body.slice(120, 200))
      require(helloPlain.length == 64 && helloPlain.forall(_ == 0),
        "HELLO box is not 64 zeros")
      val eph = generate()
      val cn = longNonce()
      val cookie = cn ++ NaclCrypto.secretboxSeal(cookieKey,
        nonce24("COOKIE--", cn), cEph ++ eph.scalar)
      val wn = longNonce()
      val wBox = NaclCrypto.secretboxSeal(boxKey(serverKeys.scalar, cEph),
        nonce24("WELCOME-", wn), eph.publicRaw ++ cookie)
      Array[Byte](7) ++ "WELCOME".getBytes("US-ASCII") ++ wn ++ wBox
    }

    /** Validate INITIATE (cookie + vouch), return (READY bytes, the
      * established session, client permanent key, client metadata).
      */
    def onInitiate(body: Array[Byte]): (Array[Byte], Session, Array[Byte], Map[String, String]) = {
      require(body.length >= 9 + 96 + 8 + 16 && body(0) == 8 &&
        new String(body, 1, 8, "US-ASCII") == "INITIATE", "not an INITIATE command")
      val cookie = body.slice(9, 105)
      val n8 = body.slice(105, 113)
      checkClientNonce(n8)
      // recover (C', s'-secret) from our own cookie
      val rec = NaclCrypto.secretboxOpen(cookieKey,
        nonce24("COOKIE--", cookie.take(16)), cookie.drop(16))
      val cEph = rec.take(32)
      val sEphScalar = rec.drop(32)
      val msgKey = boxKey(sEphScalar, cEph)
      val iPlain = NaclCrypto.secretboxOpen(msgKey,
        nonce24("CurveZMQINITIATE", n8), body.drop(113))
      require(iPlain.length >= 128, "INITIATE box too short")
      val cPerm = iPlain.take(32)
      val vouchPlain = NaclCrypto.secretboxOpen(boxKey(sEphScalar, cPerm),
        nonce24("VOUCH---", iPlain.slice(32, 48)), iPlain.slice(48, 128))
      require(java.util.Arrays.equals(vouchPlain.take(32), cEph) &&
        java.util.Arrays.equals(vouchPlain.drop(32), serverKeys.publicRaw),
        "vouch does not bind C' to S")
      val md = parseMetadata(iPlain.drop(128))
      val rn = nextNonce()
      val rBox = NaclCrypto.secretboxSeal(msgKey,
        nonce24("CurveZMQREADY---", rn), metadata(Seq("Socket-Type" -> "ROUTER")))
      val ready = Array[Byte](5) ++ "READY".getBytes("US-ASCII") ++ rn ++ rBox
      (ready, new Session(msgKey, isServer = true, sendCount = serverNonce + 1),
        cPerm, md)
    }
  }

  // ---- client role (library clients + the regression spec) -------------------

  final class ClientHandshake(clientKeys: Keys, serverPubRaw: Array[Byte],
                              socketType: String = "REQ") {
    private val eph = generate()
    private var clientNonce = 0L
    private def nextNonce(): Array[Byte] = { clientNonce += 1; shortNonce(clientNonce) }

    def hello(): Array[Byte] = {
      val n8 = nextNonce()
      val box = NaclCrypto.secretboxSeal(boxKey(eph.scalar, serverPubRaw),
        nonce24("CurveZMQHELLO---", n8), new Array[Byte](64))
      Array[Byte](5) ++ "HELLO".getBytes("US-ASCII") ++ Array[Byte](1, 0) ++
        new Array[Byte](72) ++ eph.publicRaw ++ n8 ++ box
    }

    /** Parse WELCOME, build INITIATE + the continuation that completes
      * on READY.
      */
    def onWelcome(body: Array[Byte]): (Array[Byte], Array[Byte] => (Session, Map[String, String])) = {
      require(body.length == 168 && body(0) == 7 &&
        new String(body, 1, 7, "US-ASCII") == "WELCOME", "not a WELCOME command")
      val wPlain = NaclCrypto.secretboxOpen(boxKey(eph.scalar, serverPubRaw),
        nonce24("WELCOME-", body.slice(8, 24)), body.drop(24))
      val sEph = wPlain.take(32)
      val cookie = wPlain.drop(32)
      val msgKey = boxKey(eph.scalar, sEph)
      val vn = longNonce()
      val vouch = vn ++ NaclCrypto.secretboxSeal(boxKey(clientKeys.scalar, sEph),
        nonce24("VOUCH---", vn), eph.publicRaw ++ serverPubRaw)
      val n8 = nextNonce()
      val iBox = NaclCrypto.secretboxSeal(msgKey,
        nonce24("CurveZMQINITIATE", n8),
        clientKeys.publicRaw ++ vouch ++ metadata(Seq("Socket-Type" -> socketType)))
      val initiate = Array[Byte](8) ++ "INITIATE".getBytes("US-ASCII") ++
        cookie ++ n8 ++ iBox
      val cont = (ready: Array[Byte]) => {
        require(ready.length >= 14 && ready(0) == 5 &&
          new String(ready, 1, 5, "US-ASCII") == "READY", "not a READY command")
        val rPlain = NaclCrypto.secretboxOpen(msgKey,
          nonce24("CurveZMQREADY---", ready.slice(6, 14)), ready.drop(14))
        (new Session(msgKey, isServer = false, sendCount = clientNonce + 1),
          parseMetadata(rPlain))
      }
      (initiate, cont)
    }
  }
}

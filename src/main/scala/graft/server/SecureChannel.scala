package graft.server

import java.math.BigInteger
import java.security.{KeyFactory, KeyPair, KeyPairGenerator, SecureRandom}
import java.security.interfaces.XECPublicKey
import java.security.spec.{NamedParameterSpec, XECPublicKeySpec}
import javax.crypto.{Cipher, KeyAgreement, Mac}
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** Channel encryption for the binary wire server — the JVM-native
  * equivalent of the reference's CurveZMQ transport security
  * (`/root/reference/src/protocol/zest.re:236-263`: curve server keys on
  * both sockets; clients dial with the server's published public key).
  *
  * CurveZMQ itself (Curve25519 + XSalsa20-Poly1305, the CZMQ handshake)
  * has no JDK implementation and pulling a native libsodium binding is
  * out of scope, so this is a DOCUMENTED STAND-IN with the same trust
  * model and JDK-only primitives:
  *
  *  - identity: a long-term X25519 keypair on the server; clients are
  *    configured with the server's 32-byte public key out of band
  *    (exactly how zest clients get `--server-key`);
  *  - handshake (Noise-NK shape): the client sends a fresh ephemeral
  *    public key; the server replies with its own ephemeral key; both
  *    sides derive `HKDF-SHA256( DH(c_eph, s_static) || DH(c_eph,
  *    s_eph) )` into one key per direction. Only the holder of the
  *    server's static secret can compute the first term, so decrypting
  *    the server's READY frame authenticates it — a MITM with a
  *    substituted key produces garbage that fails the AEAD tag;
  *  - record protection: ChaCha20-Poly1305 (JDK 11+), 12-byte nonces =
  *    4-byte direction tag || 8-byte frame counter, so reorder/replay
  *    breaks the tag. Forward secrecy comes from the ephemeral pair —
  *    CurveZMQ's property as well.
  *
  * Like the reference, client authentication is not part of the channel
  * (requests authenticate via macaroon tokens inside it).
  */
object SecureChannel {

  private val X25519 = NamedParameterSpec.X25519

  def generateKeyPair(): KeyPair = {
    val g = KeyPairGenerator.getInstance("XDH")
    g.initialize(X25519, new SecureRandom())
    g.generateKeyPair()
  }

  /** RFC 7748 wire form: the u-coordinate as 32 little-endian bytes. */
  def rawPublic(kp: KeyPair): Array[Byte] = {
    val u = kp.getPublic.asInstanceOf[XECPublicKey].getU
    val be = u.toByteArray.dropWhile(_ == 0) // strip sign byte
    val out = new Array[Byte](32)
    // reverse big-endian -> little-endian into the fixed width
    be.indices.foreach(i => out(i) = be(be.length - 1 - i))
    out
  }

  private def publicFromRaw(raw: Array[Byte]): java.security.PublicKey = {
    require(raw.length == 32, "X25519 public key must be 32 bytes")
    val be = raw.reverse // little-endian wire -> big-endian BigInteger
    KeyFactory.getInstance("XDH")
      .generatePublic(new XECPublicKeySpec(X25519, new BigInteger(1, be)))
  }

  private def dh(priv: java.security.PrivateKey, peerRaw: Array[Byte]): Array[Byte] = {
    val ka = KeyAgreement.getInstance("XDH")
    ka.init(priv)
    ka.doPhase(publicFromRaw(peerRaw), true)
    ka.generateSecret()
  }

  private def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(data)
  }

  /** HKDF-SHA256 (RFC 5869), two 32-byte outputs. */
  private def deriveKeys(ikm: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val prk = hmac("graft-wire-v1".getBytes("UTF-8"), ikm) // extract
    val t1 = hmac(prk, "c2s".getBytes("UTF-8") :+ 1.toByte) // expand
    val t2 = hmac(prk, "s2c".getBytes("UTF-8") :+ 1.toByte)
    (t1, t2)
  }

  /** One direction-keyed AEAD session; counters make nonces unique and
    * ordering-enforcing.
    */
  final class Session(c2s: Array[Byte], s2c: Array[Byte], isClient: Boolean) {
    private var sendCount = 0L
    private var recvCount = 0L
    private def nonce(tag: Int, count: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(12)
      b.putInt(tag).putLong(count).array()
    }
    private def cipher(mode: Int, key: Array[Byte], iv: Array[Byte]): Cipher = {
      val c = Cipher.getInstance("ChaCha20-Poly1305")
      c.init(mode, new SecretKeySpec(key, "ChaCha20"), new IvParameterSpec(iv))
      c
    }
    def seal(plain: Array[Byte]): Array[Byte] = this.synchronized {
      val (key, tag) = if (isClient) (c2s, 1) else (s2c, 2)
      val c = cipher(Cipher.ENCRYPT_MODE, key, nonce(tag, sendCount))
      sendCount += 1
      c.doFinal(plain)
    }
    /** Throws `AEADBadTagException` on tamper/reorder/wrong key. The
      * counter advances only AFTER a successful open: a frame that fails
      * the tag must not desync the receive sequence, or a caller that
      * catches and continues (both servers today drop the connection, but
      * that's their policy, not this class's contract) would garble every
      * subsequent frame (ADVICE r12).
      */
    def open(ct: Array[Byte]): Array[Byte] = this.synchronized {
      val (key, tag) = if (isClient) (s2c, 2) else (c2s, 1)
      val c = cipher(Cipher.DECRYPT_MODE, key, nonce(tag, recvCount))
      val out = c.doFinal(ct)
      recvCount += 1
      out
    }
  }

  /** Server side: given the static keypair and the client's ephemeral
    * public key, mint an ephemeral pair and the session. Returns
    * (ephemeral public to send back, session).
    */
  def serverHandshake(serverStatic: KeyPair,
                      clientEphRaw: Array[Byte]): (Array[Byte], Session) = {
    val eph = generateKeyPair()
    val ikm = dh(serverStatic.getPrivate, clientEphRaw) ++
      dh(eph.getPrivate, clientEphRaw)
    val (c2s, s2c) = deriveKeys(ikm)
    (rawPublic(eph), new Session(c2s, s2c, isClient = false))
  }

  /** Client side: given the server's published static public key, mint
    * the ephemeral pair. Returns (ephemeral public to send, continuation
    * that builds the session from the server's ephemeral reply).
    */
  def clientHandshake(serverStaticRaw: Array[Byte])
      : (Array[Byte], Array[Byte] => Session) = {
    val eph = generateKeyPair()
    val send = rawPublic(eph)
    val cont = (serverEphRaw: Array[Byte]) => {
      val ikm = dh(eph.getPrivate, serverStaticRaw) ++
        dh(eph.getPrivate, serverEphRaw)
      val (c2s, s2c) = deriveKeys(ikm)
      new Session(c2s, s2c, isClient = true)
    }
    (send, cont)
  }

  /** The server's first sealed frame; a client that opens it successfully
    * has authenticated the server.
    */
  val ReadyFrame: Array[Byte] = "graft-ready".getBytes("UTF-8")
}

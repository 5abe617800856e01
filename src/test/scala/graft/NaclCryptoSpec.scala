package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.server.NaclCrypto

/** Golden-vector pins for the pure-Scala NaCl suite. Every expected value
  * below was generated on this machine from the SYSTEM libsodium
  * (libsodium.so.23 via python ctypes: crypto_core_hsalsa20,
  * crypto_stream, crypto_onetimeauth, crypto_secretbox_easy,
  * crypto_scalarmult, crypto_box_beforenm) with the deterministic inputs
  * shown — so a pass here means byte-interoperability with the real
  * library, not self-consistency.
  */
class NaclCryptoSpec extends AnyFunSuite {

  private def hx(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  private val key = hx("000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f")
  private val nonce = hx("202122232425262728292a2b2c2d2e2f3031323334353637")
  private val msg = "graft curvezmq record protection test vector 0123456789"
    .getBytes("US-ASCII")

  test("HSalsa20 matches libsodium crypto_core_hsalsa20") {
    val in16 = hx("404142434445464748494a4b4c4d4e4f")
    assert(hex(NaclCrypto.hsalsa20(key, in16)) ===
      "deafbadff2314f2c4aa59a89d8405450d9f063188fcb1fd3b82ade68baa82089")
  }

  test("XSalsa20 keystream matches libsodium crypto_stream") {
    assert(hex(NaclCrypto.xsalsa20Stream(key, nonce, 96)) ===
      "0ce40aff3ea2781485dabc30df0e5094aef08ad21579467890970753aeaee026" +
        "f1594da54d275a960935556e0c48b7f4b9b2bd8bf1192374bc763392c21bacfd" +
        "b70bd0c3fba979cfa36e538bf5dd7e52b3d6aac90836f4ffa95b7f9b99194c01")
  }

  test("Poly1305 matches libsodium crypto_onetimeauth") {
    val pkey = hx("606162636465666768696a6b6c6d6e6f707172737475767778797a7b7c7d7e7f")
    assert(hex(NaclCrypto.poly1305(msg, pkey)) === "05f6c65f43058ffb2f2225fb61be66fc")
  }

  test("secretbox seal matches libsodium crypto_secretbox_easy; open round-trips; tamper throws") {
    val box = NaclCrypto.secretboxSeal(key, nonce, msg)
    assert(hex(box) ===
      "ee71ff6a3727e8de536baccc286f1e32962b2cc3390739e37b43301461399786" +
        "dcd1d2f995395306d30256f1b672c393977fb5b08f890faac01a3cf9d5ed4f60" +
        "80e29fff3f0ecd")
    assert(NaclCrypto.secretboxOpen(key, nonce, box).toSeq === msg.toSeq)
    val bad = box.clone(); bad(20) = (bad(20) ^ 1).toByte
    intercept[javax.crypto.AEADBadTagException] {
      NaclCrypto.secretboxOpen(key, nonce, bad)
    }
    // wrong nonce fails too
    val n2 = nonce.clone(); n2(0) = (n2(0) ^ 1).toByte
    intercept[javax.crypto.AEADBadTagException] {
      NaclCrypto.secretboxOpen(key, n2, box)
    }
    // empty message round-trips (tag-only box)
    val empty = NaclCrypto.secretboxSeal(key, nonce, Array.emptyByteArray)
    assert(empty.length === 16)
    assert(NaclCrypto.secretboxOpen(key, nonce, empty).isEmpty)
  }

  test("JDK X25519 agreement == libsodium crypto_scalarmult; beforeNm == crypto_box_beforenm") {
    import java.security.KeyFactory
    import java.security.spec.{NamedParameterSpec, XECPrivateKeySpec, XECPublicKeySpec}
    import javax.crypto.KeyAgreement
    val csk = Array.fill[Byte](32)(1)
    val spkRaw = hx("ce8d3ad1ccb633ec7b70c17814a5c76ecd029685050d344745ba05870e587d59")
    val kf = KeyFactory.getInstance("XDH")
    val priv = kf.generatePrivate(
      new XECPrivateKeySpec(NamedParameterSpec.X25519, csk))
    // little-endian raw -> BigInteger u coordinate
    val u = new java.math.BigInteger(1, spkRaw.reverse)
    val pub = kf.generatePublic(new XECPublicKeySpec(NamedParameterSpec.X25519, u))
    val ka = KeyAgreement.getInstance("XDH")
    ka.init(priv); ka.doPhase(pub, true)
    val shared = ka.generateSecret()
    assert(hex(shared) ===
      "2ed76ab549b1e73c031eb49c9448f0798aea81b698279a0c3dc3e49fbfc4b953")
    assert(hex(NaclCrypto.beforeNm(shared)) ===
      "18a99320f3488fa18a04239715d8ee738065e65c3d4b2898522d6c3d4ead588c")
  }
}

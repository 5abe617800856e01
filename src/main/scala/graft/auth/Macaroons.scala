package graft.auth

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Minimal first-party macaroon: an HMAC-SHA256 chain over an identifier
  * and an ordered caveat list (the standard bearer-token construction the
  * reference consumes via its macaroon library — `token.re:15-22`).
  * `sig = HMAC(...HMAC(HMAC(key, id), caveat_1)..., caveat_n)`; holders can
  * only ever ADD caveats (attenuate), never remove them, because each
  * signature is the key for the next link.
  *
  * Serialization is a base64 envelope of newline-joined fields — caveat
  * strings are the reference's `"name = value"` shape and never contain
  * newlines.
  */
object Macaroons {

  final case class Macaroon(identifier: String, caveats: List[String], sig: Vector[Byte]) {
    def addCaveat(c: String): Macaroon =
      copy(caveats = caveats :+ c, sig = hmac(sig.toArray, c).toVector)
  }

  def mint(key: String, identifier: String): Macaroon =
    Macaroon(identifier, Nil, hmac(key.getBytes(UTF_8), identifier).toVector)

  /** Valid iff the signature chain recomputes under `key` AND every caveat
    * the token carries passes `check` against the request context.
    */
  def verify(m: Macaroon, key: String, check: String => Boolean): Boolean = {
    val expected = m.caveats.foldLeft(hmac(key.getBytes(UTF_8), m.identifier)) {
      (sig, c) => hmac(sig, c)
    }
    java.security.MessageDigest.isEqual(expected, m.sig.toArray) &&
      m.caveats.forall(check)
  }

  def serialize(m: Macaroon): String = {
    val body = (m.identifier :: m.caveats ::: List(
      Base64.getEncoder.encodeToString(m.sig.toArray))).mkString("\n")
    Base64.getUrlEncoder.encodeToString(body.getBytes(UTF_8))
  }

  def deserialize(s: String): Either[String, Macaroon] =
    try {
      val lines = new String(Base64.getUrlDecoder.decode(s), UTF_8).split("\n", -1).toList
      lines match {
        case id :: rest if rest.nonEmpty =>
          Right(Macaroon(id, rest.init,
            Base64.getDecoder.decode(rest.last).toVector))
        case _ => Left("malformed macaroon")
      }
    } catch { case _: IllegalArgumentException => Left("malformed macaroon") }

  private def hmac(key: Array[Byte], msg: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    // HMAC keys must be non-empty; pad like an empty-password KDF would
    mac.init(new SecretKeySpec(if (key.isEmpty) Array[Byte](0) else key, "HmacSHA256"))
    mac.doFinal(msg.getBytes(UTF_8))
  }
}

/** The reference's caveat check + token validation (`token.re:3-22`):
  * a token caveat ending in `*` prefix-matches a request caveat; otherwise
  * exact membership in the request context list.
  */
object Token {

  /** `has_prefix` (`token.re:3-4`): `pat` (ending in `*`) matches `s` iff
    * `s` starts with `pat` minus the `*`.
    */
  def hasPrefix(pat: String, s: String): Boolean =
    pat.length <= s.length && pat == s.substring(0, pat.length - 1) + "*"

  /** `check` (`token.re:6-13`). */
  def check(tokenCaveat: String, requestCaveats: Seq[String]): Boolean =
    if (tokenCaveat.nonEmpty && tokenCaveat.last == '*')
      requestCaveats.exists(rc => hasPrefix(tokenCaveat, rc))
    else requestCaveats.contains(tokenCaveat)

  /** `is_valid` (`token.re:15-22`): deserialize, verify chain + caveats. */
  def isValid(token: String, key: String, requestCaveats: Seq[String]): Boolean =
    Macaroons.deserialize(token) match {
      case Right(m) => Macaroons.verify(m, key, c => check(c, requestCaveats))
      case Left(_)  => false
    }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.auth.{Macaroons, Token}

/** Macaroon caveat verification pinned against the reference
  * (`token.re:3-22`, `server.re:811-820`): wildcard prefix match, exact
  * membership, attenuation-only chain, observe caveat, auth-disabled mode.
  */
class AuthSpec extends AnyFunSuite with SparkTestBase {

  private val KEY = "vl6wu0A@XP?}Or/&BR#LSxn>A+}L)p44/W[wXL3<"

  private def tok(caveats: String*): String =
    Macaroons.serialize(caveats.foldLeft(Macaroons.mint(KEY, "graft-client"))(_.addCaveat(_)))

  private def ctx(path: String, meth: String, obs: Option[String] = None): Seq[String] =
    Seq(s"path = $path", s"method = $meth") ++ obs.map(o => s"observe = $o") ++
      Seq("target = graft.local")

  test("caveat-free token verifies on signature alone") {
    assert(Token.isValid(tok(), KEY, ctx("/ts/s/latest", "GET")))
  }

  test("exact caveats grant exactly; mismatches deny") {
    val t = tok("path = /ts/sensor/latest", "method = GET", "target = graft.local")
    assert(Token.isValid(t, KEY, ctx("/ts/sensor/latest", "GET")))
    assert(!Token.isValid(t, KEY, ctx("/ts/sensor/latest", "DELETE")))
    assert(!Token.isValid(t, KEY, ctx("/ts/other/latest", "GET")))
    assert(!Token.isValid(t, KEY,
      Seq("path = /ts/sensor/latest", "method = GET", "target = other.host")))
  }

  test("wildcard caveat prefix-matches (token.re:3-4)") {
    val t = tok("path = /ts/sensor/*", "method = GET")
    assert(Token.isValid(t, KEY, ctx("/ts/sensor/latest", "GET")))
    assert(Token.isValid(t, KEY, ctx("/ts/sensor/last/10", "GET")))
    assert(!Token.isValid(t, KEY, ctx("/ts/other/latest", "GET")))
    // bare-star caveat matches any path caveat value
    assert(Token.isValid(tok("path = *"), KEY, ctx("/kv/a/b", "POST")))
  }

  test("wrong key, tampered caveat, and stripped caveat all fail the chain") {
    val t = tok("method = GET")
    assert(!Token.isValid(t, "other-key", ctx("/ts/s/latest", "GET")))
    // tamper: rebuild with an edited caveat but the old signature
    val m = Macaroons.deserialize(t).toOption.get
    val forged = Macaroons.serialize(m.copy(caveats = List("method = DELETE")))
    assert(!Token.isValid(forged, KEY, ctx("/ts/s/latest", "DELETE")))
    // strip: removing the caveat entirely invalidates the signature too
    val stripped = Macaroons.serialize(m.copy(caveats = Nil))
    assert(!Token.isValid(stripped, KEY, ctx("/ts/s/latest", "DELETE")))
    assert(!Token.isValid("not-a-token", KEY, ctx("/ts/s/latest", "GET")))
  }

  test("attenuation: adding a caveat only narrows the grant") {
    val broad = Macaroons.mint(KEY, "client")
    val narrow = broad.addCaveat("path = /ts/public/*")
    assert(Macaroons.verify(narrow, KEY,
      c => Token.check(c, ctx("/ts/public/latest", "GET"))))
    assert(!Macaroons.verify(narrow, KEY,
      c => Token.check(c, ctx("/ts/private/latest", "GET"))))
  }

  test("observe caveat gates observe mode (server.re:816-818)") {
    val t = tok("observe = data")
    assert(Token.isValid(t, KEY, ctx("/ts/s", "GET", obs = Some("data"))))
    assert(!Token.isValid(t, KEY, ctx("/ts/s", "GET", obs = Some("audit"))))
    assert(!Token.isValid(t, KEY, ctx("/ts/s", "GET"))) // plain GET lacks the caveat
  }

  test("engine enforcement: guarded entry points allow/deny; no key = open") {
    val e = new GraftEngine(spark, () => 1000L, tokenSecretKey = Some(KEY))
    // note: a star pattern is strictly LONGER-or-equal than what it matches
    // ("/ts/sensor*" cannot match the shorter "/ts/sensor" — token.re:3-4)
    val writer = tok("path = /ts/sensor/*", "method = POST")
    assert(e.postAuthed(writer, "/ts/sensor/at/1000", """{"value": 1}""").isRight)
    assert(e.postAuthed(writer, "/ts/secret/at/1000", """{"value": 1}""") === Left("unauthorized (129)"))
    assert(e.getAuthed(writer, "/ts/sensor/latest") === Left("unauthorized (129)"))
    val reader = tok("method = GET")
    assert(e.getAuthed(reader, "/ts/sensor/latest").isRight)
    assert(e.deleteAuthed(reader, "/ts/sensor/latest") === Left("unauthorized (129)"))
    assert(e.observeAuthed(tok("observe = data"), "/ts/sensor").isRight)
    assert(e.observeAuthed(tok("observe = data"), "/ts/sensor", mode = "audit")
      === Left("unauthorized (129)"))
    // empty secret key disables auth entirely (server.re:812-814)
    val open = new GraftEngine(spark, () => 1000L, tokenSecretKey = Some(""))
    assert(open.getAuthed("garbage", "/ts/x/latest").isRight)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.NumericValidator
import graft.zestql.{Post, ZestQlParser}

/** Pins the write-schema rules of numeric_timeseries.re:5-13 (§7.5.6). */
class NumericValidatorSpec extends AnyFunSuite {

  private def ok(s: String) = assert(NumericValidator.validate(s).isRight, s)
  private def bad(s: String) = assert(NumericValidator.validate(s).isLeft, s)

  test("valid shapes: bare value, one string tag, either field order, any number form") {
    ok("""{"value": 42}""")
    ok("""{"value": 42.5}""")
    ok("""{"value": -1e3}""")
    ok("""{"value": 1, "room": "lounge"}""")
    ok("""{"room": "lounge", "value": 1}""") // reversed order accepted
  }

  test("rejected shapes (CoAP 128)") {
    bad("""{"value": "42"}""")                         // quoted number
    bad("""{"value": 1, "a": "x", "b": "y"}""")        // two tags
    bad("""{"value": 1, "room": 7}""")                 // non-string tag value
    bad("""{"room": "lounge"}""")                      // missing value
    bad("""[1, 2]""")                                  // not an object
    bad("""not json""")
  }

  test("regression: the reference ZestQL CLI's own post payload is rejected (zestql.re:46-51 bug)") {
    // The reference DSL compiles `post 42.0 to "s"` into {"value": "42.000000"}
    // (value quoted) — its own server would refuse it. Our parser keeps the
    // value numeric, so the compiled write validates.
    val stmt = ZestQlParser.parseStatement("""post 42.0 to "sensor1"""", nowMs = 0L)
    val Post(v, series, tag) = stmt: @unchecked
    assert(series === "sensor1" && tag.isEmpty)
    val payload = s"""{"value": $v}"""
    assert(NumericValidator.validate(payload).isRight)
    // and the reference's buggy quoted form is (correctly) invalid:
    assert(NumericValidator.validate("""{"value": "42.000000"}""").isLeft)
  }
}

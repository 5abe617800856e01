package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Numeric-TS write validation
  * (`/root/reference/src/numeric_timeseries.re:5-13`): a payload is valid
  * iff it is a JSON object of exactly `{"value": <number>}` or
  * `{"value": <number>, "<tag>": "<string>"}` — either field order, at most
  * one tag, tag value must be a JSON string, any JSON number accepted as
  * the value. Invalid writes are rejected with CoAP 128
  * (`server.re:656-668,758-761`).
  *
  * Known reference bug (SURVEY §7.5.6): the ZestQL CLI's `post` serializes
  * the value as a QUOTED string (`zestql.re:46-51`), which this validator —
  * like the reference server — rejects. Pinned in NumericValidatorSpec.
  */
object NumericValidator {

  final case class Parsed(value: Double, tag: Option[(String, String)])

  def validate(payload: String): Either[String, Parsed] =
    try {
      JsonMethods.parse(payload) match {
        case JObject(fields) =>
          val names = fields.map(_._1)
          if (names.distinct.size != names.size) Left("duplicate fields")
          else {
            val value = fields.collectFirst { case ("value", v) => v }
            val others = fields.filter(_._1 != "value")
            (value, others) match {
              case (Some(num), Nil) =>
                numOf(num).map(Parsed(_, None)).toRight("value must be a number")
              case (Some(num), (tag, JString(tv)) :: Nil) =>
                numOf(num).map(v => Parsed(v, Some(tag -> tv))).toRight("value must be a number")
              case (Some(_), _ :: Nil) => Left("tag value must be a string")
              case (Some(_), _)        => Left("at most one tag allowed")
              case (None, _)           => Left("missing value field")
            }
          }
        case _ => Left("payload must be a JSON object")
      }
    } catch { case _: Throwable => Left("not valid JSON") }

  private def numOf(v: JValue): Option[Double] = v match {
    case JDouble(d)  => Some(d)
    case JInt(i)     => Some(i.toDouble)
    case JLong(l)    => Some(l.toDouble)
    case JDecimal(d) => Some(d.toDouble)
    case _           => None
  }
}

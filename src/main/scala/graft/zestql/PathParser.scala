package graft.zestql

import graft.operators._

/** The reference's URI path query language
  * (`/root/reference/src/server.re:260-510` for GET routing,
  * `:208-215` for the comma id list, `:217-258` for the function suffix).
  *
  * Shapes:
  * {{{
  * /ts/<id1,id2,...>/(latest | earliest | length | last/<n> | first/<n>
  *                    | since/<t> | range/<t1>/<t2>)
  *                   [/filter/<tag>/(equals|contains)/<val>] [/<agg>]
  * /ts/blob/<ids>/(latest|earliest|length|last/<n>|first/<n>|since/<t>|range/<t1>/<t2>)
  * }}}
  * Blob reads accept no filter/aggregate suffix (`server.re:269-272`;
  * `docs/README.md:208`). DELETE rejects the first/last/length selectors
  * and any aggregate/length FINAL segment with CoAP 134
  * (`has_unsupported_delete_api`, `server.re:955-979`); latest/earliest
  * remain deletable — the reference routes them through the read path and
  * removes the matched timestamps.
  */
object PathParser {

  private val aggs: Map[String, AggFn] = Map(
    "sum" -> AggSum, "count" -> AggCount, "min" -> AggMin, "max" -> AggMax,
    "mean" -> AggMean, "median" -> AggMedian, "sd" -> AggSd)

  def parseGet(path: String): TsQuery = parse(path, isDelete = false)

  /** DELETE guard (S7): no first/last/length selectors, no functions. */
  def parseDelete(path: String): TsQuery = parse(path, isDelete = true)

  private def parse(path: String, isDelete: Boolean): TsQuery = {
    val segs = path.stripPrefix("/").split("/", -1).toList
    val (blob, rest) = segs match {
      case "ts" :: "blob" :: r => (true, r)
      case "ts" :: r           => (false, r)
      case _ => throw ParseError(s"not a /ts path: $path")
    }
    val (ids, tail) = rest match {
      case ids :: t if ids.nonEmpty => (ids.split(",").toSeq, t)
      case _ => throw ParseError(s"missing id list: $path")
    }
    val (sel, suffix) = tail match {
      case "latest" :: t              => (Latest, t)
      case "earliest" :: t            => (Earliest, t)
      // length is an exact route — no filter/aggregate suffix exists for it
      // (server.re:269-272 matches ["","ts",id,"length"] with nothing after)
      case "length" :: Nil            => (Length, Nil)
      case "length" :: t => throw ParseError(s"length takes no suffix: ${t.mkString("/")}")
      case "last" :: n :: t           => (LastN(intOf(n)), t)
      case "first" :: n :: t          => (FirstN(intOf(n)), t)
      case "since" :: ts :: t         => (Since(longOf(ts)), t)
      case "range" :: t1 :: t2 :: t   => (TimeRange(longOf(t1), longOf(t2)), t)
      case other => throw ParseError(s"bad selector: ${other.mkString("/")}")
    }
    if (isDelete) {
      sel match {
        case Since(_) | TimeRange(_, _) | Latest | Earliest => ()
        case _ => throw ParseError(s"DELETE unsupported on this selector (CoAP 134): $path")
      }
      // the reference inspects only the FINAL path segment
      // (server.re:963-973, List.rev head) — a filter tag merely named
      // like an aggregate must not trip the guard
      if (suffix.lastOption.exists(s => aggs.contains(s) || s == "length"))
        throw ParseError(s"DELETE with function suffix (CoAP 134): $path")
    }
    val (filt, agg) = suffix match {
      case Nil => (None, None)
      case a :: Nil if aggs.contains(a) => (None, Some(aggs(a)))
      case "filter" :: tag :: op :: v :: more =>
        val pred = op match {
          case "equals"   => TagEquals(tag, v)
          case "contains" => TagContains(tag, v)
          case _ => throw ParseError(s"bad filter op: $op")
        }
        more match {
          case Nil                          => (Some(pred), None)
          case a :: Nil if aggs.contains(a) => (Some(pred), Some(aggs(a)))
          case other => throw ParseError(s"bad function suffix: ${other.mkString("/")}")
        }
      case other => throw ParseError(s"bad function suffix: ${other.mkString("/")}")
    }
    if (blob && (filt.nonEmpty || agg.nonEmpty))
      throw ParseError("blob store supports plain reads only (server.re:269-272)")
    TsQuery(ids, sel, filt, agg, blob)
  }

  private def intOf(s: String): Int =
    try s.toInt catch { case _: NumberFormatException => throw ParseError(s"bad int: $s") }
  private def longOf(s: String): Long =
    try s.toLong catch { case _: NumberFormatException => throw ParseError(s"bad long: $s") }
}

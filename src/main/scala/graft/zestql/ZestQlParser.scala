package graft.zestql

import graft.operators._

/** Hand-rolled recursive-descent parser for the ZestQL DSL
  * (grammar `/root/reference/test/zestql/parser.mly:39-91`, lexer
  * `/root/reference/test/zestql/lexer.mll:29-64`).
  *
  * Faithful quirks:
  *  - keywords are case-insensitive (`lexer.mll` lists both cases);
  *  - relative times resolve to absolute epoch-ms AT PARSE TIME against a
  *    supplied clock (`zestql.re:9-12`) — pass `nowMs` for determinism;
  *  - `min` is always the aggregate keyword, never the minutes unit (the
  *    reference lexer's MIN rule shadows the unit rule), so minutes are
  *    `m`/`minutes` only;
  *  - `median` is absent from the DSL though the server supports it
  *    (`parser.mly:61` omits it) — we ACCEPT it as an extension;
  *  - `where` compiles only to `equals` filters (`zestql.re:59-64`);
  *  - the reference's `post` serializes the value as a quoted JSON string
  *    which its own server would reject (`zestql.re:46-51` vs
  *    `numeric_timeseries.re:5-13`) — a reference bug; our Post carries the
  *    value numerically.
  *
  * Statements end with `;`. Multi-statement scripts parse to a list.
  */
object ZestQlParser {

  def parseScript(src: String, nowMs: Long = System.currentTimeMillis()): Seq[Statement] =
    split(src).map(s => parseStatement(s, nowMs))

  /** Split on top-level ';' (quotes respected, incl. \" escapes inside
    * string literals — same escape rules as the lexer); drop blanks.
    */
  private def split(src: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inStr = false
    var i = 0
    while (i < src.length) {
      val c = src(i)
      if (inStr && c == '\\' && i + 1 < src.length) {
        cur += c; cur += src(i + 1); i += 2
      } else {
        if (c == '"') { inStr = !inStr; cur += c }
        else if (c == ';' && !inStr) {
          val s = cur.result().trim; if (s.nonEmpty) out += s; cur.clear()
        } else cur += c
        i += 1
      }
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.result()
  }

  // ---- lexer ---------------------------------------------------------------

  private sealed trait Tok
  private case class Kw(s: String) extends Tok     // lowercased keyword/ident
  private case class Str(s: String) extends Tok    // "quoted"
  private case class Num(s: String) extends Tok    // int or float literal
  private case class NumUnit(n: Long, unit: String) extends Tok // e.g. 10s, 24h

  // longest alternative first — regex alternation is first-match, so
  // "sec" must be tried before "s" or "10sec" lexes as 10s + Kw(ec)
  private val unitSuffix = "(seconds|sec|s|minutes|m|hours|hr|h|days|d)".r

  private def lex(s: String): List[Tok] = {
    val toks = List.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < s.length && s(i) != '"') {
          if (s(i) == '\\' && i + 1 < s.length) { // escape subset of lexer.mll:71-78
            sb += (s(i + 1) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case 'b' => '\b'; case 'f' => '\f'; case other => other
            })
            i += 2
          } else { sb += s(i); i += 1 }
        }
        if (i >= s.length) throw ParseError("string is not terminated")
        i += 1
        toks += Str(sb.result())
      } else if (c.isDigit || (c == '-' && i + 1 < s.length && s(i + 1).isDigit)) {
        val start = i
        i += 1
        while (i < s.length && (s(i).isDigit || s(i) == '.' || s(i) == 'e' ||
               s(i) == 'E' || ((s(i) == '+' || s(i) == '-') && (s(i - 1) == 'e' || s(i - 1) == 'E'))))
          i += 1
        val num = s.substring(start, i)
        // attach a GLUED time-unit suffix here ("10s"); a whitespace-
        // separated unit ("10 s") is merged post-lex below, matching the
        // reference where INT and UNIT are separate whitespace-skipped
        // tokens combined by the grammar (lexer.mll:29-64)
        val rest = s.substring(i)
        val glued = unitSuffix.findPrefixOf(rest.takeWhile(!_.isWhitespace))
        glued match {
          case Some(u) if !num.contains('.') &&
              rest.take(u.length + 1).startsWith(u) &&
              (rest.length == u.length || !rest(u.length).isLetter) =>
            toks += NumUnit(num.toLong, u); i += u.length
          case _ => toks += Num(num)
        }
      } else if (c.isLetter) {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        toks += Kw(s.substring(start, i).toLowerCase)
      } else throw ParseError(s"unexpected char: $c")
    }
    mergeUnits(toks.result())
  }

  // "min" stays an aggregate keyword, never a unit (the reference lexer's
  // MIN rule shadows its unit rule)
  private val unitKws = Set("seconds", "sec", "s", "minutes", "m",
                            "hours", "hr", "h", "days", "d")

  /** Merge `Num` followed by a standalone unit keyword ("since 10 d") into
    * `NumUnit`, as the reference grammar does with its separate INT and
    * UNIT tokens. Floats never take a unit.
    */
  private def mergeUnits(ts: List[Tok]): List[Tok] = ts match {
    case Num(n) :: Kw(u) :: rest if unitKws(u) && !n.contains('.') &&
        !n.exists(c => c == 'e' || c == 'E') =>
      NumUnit(n.toLong, u) :: mergeUnits(rest)
    case h :: rest => h :: mergeUnits(rest)
    case Nil => Nil
  }

  // ---- parser --------------------------------------------------------------

  private val aggKw: Map[String, AggFn] = Map(
    "min" -> AggMin, "max" -> AggMax, "sum" -> AggSum, "count" -> AggCount,
    "mean" -> AggMean, "sd" -> AggSd, "median" -> AggMedian)

  private def unitMs(u: String): Long = u match {
    case "s" | "sec" | "seconds" => 1000L
    case "m" | "minutes"         => 60000L
    case "h" | "hr" | "hours"    => 3600000L
    case "d" | "days"            => 86400000L
    case other => throw ParseError(s"bad time unit: $other")
  }

  def parseStatement(src: String, nowMs: Long): Statement = {
    var toks = lex(src)
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = toks match {
      case h :: t => toks = t; h
      case Nil => throw ParseError(s"unexpected end of statement: $src")
    }
    def expectKw(k: String): Unit = next() match {
      case Kw(`k`) => ()
      case other => throw ParseError(s"expected '$k', got $other")
    }
    def str(): String = next() match {
      case Str(v) => v
      case other => throw ParseError(s"expected string, got $other")
    }
    def relTime(): Long = next() match { // get_seconds/... zestql.re:9-12
      case NumUnit(n, u) => nowMs - n * unitMs(u)
      case other => throw ParseError(s"expected <n><unit>, got $other")
    }
    def optHost(): Option[String] = peek match {
      case Some(Kw("host")) => next(); Some(str())
      case _ => None
    }
    def optWhere(): Option[(String, String)] = peek match {
      case Some(Kw("where")) =>
        next(); val t = str(); expectKw("is"); Some((t, str()))
      case _ => None
    }

    next() match {
      case Kw("connect") =>
        expectKw("key"); val key = str(); Connect(key, optHost())
      case Kw("disconnect") => Disconnect(optHost())
      case Kw("post") =>
        val v = next() match {
          case Num(n) => n.toDouble
          case NumUnit(n, u) => throw ParseError(s"expected number, got $n$u")
          case other => throw ParseError(s"expected number, got $other")
        }
        expectKw("to"); val series = str(); Post(v, series, optWhere())
      case Kw("get") =>
        val agg = peek match {
          case Some(Kw(k)) if aggKw.contains(k) => next(); Some(aggKw(k))
          case _ => None
        }
        expectKw("from")
        val ids = str().split(",").toSeq
        val filt = optWhere().map { case (t, v) => TagEquals(t, v) }
        val sel = next() match {
          case Kw("since") => Since(relTime())
          case Kw("range") =>
            val t1 = relTime(); expectKw("to"); TimeRange(t1, relTime())
          case Kw("last") => next() match {
            case Num(n) => LastN(n.toInt)
            case NumUnit(n, _) => LastN(n.toInt) // "last 10s" tolerated as count
            case other => throw ParseError(s"expected int, got $other")
          }
          case other => throw ParseError(s"expected since/range/last, got $other")
        }
        Get(TsQuery(ids, sel, filt, agg))
      case Kw("observe") =>
        expectKw("from"); val series = str()
        val mode = peek match {
          case Some(Kw("mode")) => next(); next() match {
            case Kw(m @ ("data" | "audit")) => Some(m)
            case other => throw ParseError(s"bad observe mode: $other")
          }
          case _ => None
        }
        val maxAge = peek match {
          case Some(Kw("for")) => next(); next() match {
            case NumUnit(n, u) if unitMs(u) == 1000L => Some(n.toInt)
            case other => throw ParseError(s"expected <n>s, got $other")
          }
          case _ => None
        }
        ObserveStmt(series, mode, maxAge)
      case Kw("delete") =>
        expectKw("from"); val ids = str().split(",").toSeq
        val filt = optWhere().map { case (t, v) => TagEquals(t, v) }
        expectKw("range"); val t1 = relTime(); expectKw("to"); val t2 = relTime()
        DeleteRange(ids, t1, t2, filt)
      case other => throw ParseError(s"unknown statement head: $other")
    }
  }
}

package graft.zestql

import graft.operators.{AggFn, Selector, TagPred}

/** Logical query ADT — the structural mirror of the reference's closed
  * query surface: a query is a selection plus 0, 1 or 2 functions (optional
  * tag filter, then optional aggregate) —
  * `/root/reference/src/server.re:217-258` (`apply`),
  * `/root/reference/src/numeric_timeseries.re:18` (fold application).
  */
final case class TsQuery(
    ids: Seq[String],
    selector: Selector,
    filter: Option[TagPred],
    agg: Option[AggFn],
    blob: Boolean = false)

/** ZestQL statements (`/root/reference/test/zestql/zestql.re:28-37`). */
sealed trait Statement
final case class Connect(key: String, host: Option[String]) extends Statement
final case class Disconnect(host: Option[String]) extends Statement
final case class Post(value: Double, series: String, tag: Option[(String, String)]) extends Statement
final case class Get(query: TsQuery) extends Statement
final case class ObserveStmt(series: String, mode: Option[String], maxAgeSec: Option[Int]) extends Statement
final case class DeleteRange(ids: Seq[String], fromMs: Long, toMs: Long,
                             filter: Option[TagPred]) extends Statement

final case class ParseError(message: String) extends RuntimeException(message)

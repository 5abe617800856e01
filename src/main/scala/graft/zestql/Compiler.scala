package graft.zestql

import org.apache.spark.sql.DataFrame

import graft.operators._

/** Compiles the logical [[TsQuery]] ADT onto DataFrame operators — the
  * whole query (selection, filter, aggregate) becomes ONE declarative
  * expression tree, so Catalyst is free to push the time predicate into the
  * scan and fuse the rest, unlike the reference's fixed
  * select-then-filter-then-fold pipeline
  * (`/root/reference/src/numeric_timeseries.re:18-36`).
  */
object Compiler {

  /** Compile a query against a TS frame (see [[graft.model.TsModel]]). */
  def compile(ts: DataFrame, q: TsQuery): DataFrame = {
    val selected = TsOps.select(ts, q.ids, q.selector)
    val filtered = q.filter.foldLeft(selected)(TsOps.tagFilter)
    q.agg.fold(filtered)(fn => Aggregates.aggregate(filtered, fn))
  }

  /** Compile a statement. Reads return result frames; `DeleteRange`
    * returns the surviving rows (the caller owns the rewrite sink); other
    * statements are session/service control with no batch plan.
    */
  def compile(ts: DataFrame, stmt: Statement): Option[DataFrame] = stmt match {
    case Get(q) => Some(compile(ts, q))
    case DeleteRange(ids, from, to, filt) =>
      Some(TsOps.deleteByQuery(ts, ids, TimeRange(from, to), filt))
    case _: Connect | _: Disconnect | _: Post | _: ObserveStmt => None
  }
}

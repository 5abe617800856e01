package graft.model

import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

import graft.Tables

/** Epoch-ms extraction over the stored time column, handling every reading
  * Spark gives parquet TIMESTAMP(NANOS): the shipped 4.1.2 yields
  * `timestamp_ntz` (microsecond precision, nanos floored; the legacy
  * `nanosAsLong` flag is dead there), older readers yield an epoch-ns
  * long. All math stays in exact integer space — a double round-trip
  * would lose precision at 1e18.
  */
object TimeCols {
  def millis(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case LongType => expr(s"$c div 1000000")
    case _        => unix_millis(col(c).cast(TimestampType))
  }

  /** Inclusive epoch-ms window bounds expressed as literals of the RAW
    * stored column's type. Predicates on the derived `t` (`div` /
    * `unix_millis`) never reach parquet `PushedFilters`; a plain
    * comparison against a same-typed literal does
    * (`PushedFilters: [GreaterThanOrEqual(ts,...)]`), which at 100 TB is
    * the difference between row-group skipping and a full scan —
    * [[graft.operators.TsOps]] rewrites every time window onto these.
    *
    * Exactness (session timezone pinned UTC, stored values floored to the
    * column's precision): `t >= from  <=>  raw >= from` at the ms
    * boundary, and `t <= to  <=>  raw <= to + (1ms - 1ulp)` — 999999 ns
    * for a nanos long, 999 us for an ntz timestamp.
    */
  /** Whether an epoch-ms bound is representable as a literal of the raw
    * column's type — `Long.MaxValue`-ish sentinels overflow the ns
    * multiplication / Spark's micros conversion (which throws eagerly for
    * timestamp literals). Callers fall back to the derived-`t` predicate
    * for such bounds: no stored value can be near them anyway, so only
    * the pushdown is lost, never correctness.
    */
  def msPushable(dt: DataType, ms: Long): Boolean = dt match {
    case LongType => ms >= Long.MinValue / 1000000L + 1 && ms <= Long.MaxValue / 1000000L - 1
    case _        => ms >= Long.MinValue / 1000L + 1000 && ms <= Long.MaxValue / 1000L - 1000
  }

  def msLowerBound(dt: DataType, fromMs: Long): Column = dt match {
    case LongType         => lit(fromMs * 1000000L)
    case TimestampNTZType => lit(ntzOfMs(fromMs))
    case _                => lit(java.time.Instant.ofEpochMilli(fromMs))
  }

  def msUpperBound(dt: DataType, toMs: Long): Column = dt match {
    case LongType         => lit(toMs * 1000000L + 999999L)
    case TimestampNTZType => lit(ntzOfMs(toMs).plusNanos(999999L))
    case _                => lit(java.time.Instant.ofEpochMilli(toMs).plusNanos(999999L))
  }

  private def ntzOfMs(ms: Long): LocalDateTime =
    LocalDateTime.ofEpochSecond(Math.floorDiv(ms, 1000L),
      Math.floorMod(ms, 1000L).toInt * 1000000, ZoneOffset.UTC)
}

/** The ZestDB data model, re-expressed relationally.
  *
  * Reference model (`/root/reference/src/timeseries/timeseries.re:3-17`,
  * `/root/reference/src/numeric_timeseries.re:5-13`): a numeric time series
  * is a named stream `id -> [(timestamp_ms, {value, tag?})]` where the
  * payload carries a double `value` and at most one string tag with a
  * dynamic name. We map that to one columnar table:
  *
  * {{{ series_id string, t long (epoch ms), value double,
  *     tags map<string,string>, event_id long }}}
  *
  * `event_id` is a deterministic tiebreak: the reference's sort comparator
  * never returns 0 for equal timestamps so its tie order is unspecified
  * (`timeseries.re:168-175`); we pin a total order instead so results are
  * reproducible and oracle-comparable.
  *
  * At 100 TB the physical layout for this table is parquet partitioned by
  * `series_id` and a time bucket (e.g. day of `t`): partition pruning plus
  * parquet row-group min/max stats reproduce the reference's two-level
  * shard-index skip (`/root/reference/src/timeseries/index.re:78-96`) with
  * no custom code. The driver testdata is a single unpartitioned file, so
  * here pruning happens at row-group level only — same plan shape.
  */
object TsModel {

  /** TS view over the `events` table: series = event_type, tag `k` parsed
    * from the JSON `props`. The cast handles parquet NTZ timestamps
    * uniformly (session timezone is UTC, matching the DuckDB oracle).
    */
  def ts(spark: SparkSession, sfDir: String): DataFrame =
    fromEvents(Tables.events(spark, sfDir))

  /** The same projection over any events-shaped frame — batch or
    * streaming (`readStream` hands this the identical schema, so the S1
    * ingest pipeline reuses this exact plan). `ts_raw` carries the stored
    * time column UNCHANGED (alias only): time-window predicates land on it
    * so Catalyst can substitute the alias away and push them into the
    * scan ([[TimeCols.msLowerBound]]).
    */
  def fromEvents(ev: DataFrame): DataFrame = {
    ev.select(
      col("event_type").as("series_id"),
      TimeCols.millis(ev, "ts").as("t"),
      col("value"),
      map(lit("k"), regexp_extract(col("props"), "\"k\"\\s*:\\s*(\\d+)", 1)).as("tags"),
      col("event_id"),
      col("ts").as("ts_raw")
    )
  }

  /** Blob-TS view: same stream with the raw JSON payload kept opaque
    * (reference blob store, `/root/reference/src/blob_timeseries.re:1-6`).
    */
  def tsBlob(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.select(
      col("event_type").as("series_id"),
      TimeCols.millis(ev, "ts").as("t"),
      col("props").as("blob"),
      col("event_id")
    )
  }

  /** The DuckDB-oracle CTE matching [[ts]] exactly (column names + types). */
  val tsOracleCte: String =
    """WITH ts AS (
      |  SELECT event_type AS series_id, epoch_ms(ts) AS t, value,
      |         regexp_extract(props, '"k"\s*:\s*(\d+)', 1) AS k, event_id
      |  FROM events
      |)""".stripMargin
}

/** KV model (reference `/root/reference/src/keyvalue/keyvalue.re:3-43`):
  * `(id, key) -> value`, last-writer-wins, delete = tombstone. We derive a
  * deterministic KV change-log from `events` so the LWW/tombstone semantics
  * are exercised against real data: multiple users fold onto one id, so
  * every (id,key) cell sees many conflicting writes.
  *
  * LWW resolution is a window rank over the change-log — at scale this is
  * one shuffle by (id,key), the same cost as any keyed upsert compaction;
  * with the table bucketed by (id,key) it is shuffle-free.
  */
object KvModel {
  def changeLog(spark: SparkSession, sfDir: String): DataFrame =
    changeLogOf(Tables.events(spark, sfDir))

  /** The change-log projection over an already-selected events frame —
    * lets callers pre-filter on the RAW `ts` column first (e.g. a TTL
    * horizon) so the predicate reaches the parquet scan before the
    * projection hides the column behind `write_ts`.
    */
  def changeLogOf(ev: DataFrame): DataFrame = {
    ev.select(
      concat(lit("u"), (col("user_id") % 50).cast("string")).as("id"),
      col("event_type").as("key"),
      col("props").as("value"),
      TimeCols.millis(ev, "ts").as("write_ts"),
      col("event_id"),
      (col("event_id") % 23 === 0).as("deleted")
    )
  }

  val kvOracleCte: String =
    """WITH kv AS (
      |  SELECT 'u' || CAST(user_id % 50 AS VARCHAR) AS id, event_type AS key,
      |         props AS value, epoch_ms(ts) AS write_ts, event_id,
      |         (event_id % 23 = 0) AS deleted
      |  FROM events
      |)""".stripMargin
}

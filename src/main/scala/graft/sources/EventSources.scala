package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-pinned readers/writers for the ingest formats the reference
  * accepts over its wire API (JSON always; text/CSV-ish via the blob path —
  * `/root/reference/src/server.re` content-format dispatch). Each reader
  * yields the SAME frame shape as the parquet `events` table, so
  * everything downstream — the TS model, selectors, aggregates, storage —
  * is format-oblivious.
  *
  * Schemas are pinned explicitly: schema inference reads the data twice
  * and guesses types per-file, which at 100 TB is both a double scan and a
  * correctness hazard (a shard of all-integral doubles infers long).
  * DDL-pinned readers stream single-pass with zero inference.
  *
  * The time column is `timestamp_ntz` — what the shipped Spark 4.1.2
  * yields for the parquet table's TIMESTAMP(NANOS) column (floored to
  * microseconds; the legacy `nanosAsLong` long reading no longer occurs).
  * Spark's DEFAULT text timestamp format carries milliseconds only, which
  * silently drops the microsecond digits on write — so the wire format
  * pins a 6-digit fractional second on BOTH directions
  * ([[EventSources.TsFormat]]); round-tripping is exact because micros is
  * also the column's full precision.
  */
object EventSources {

  /** Wire timestamp format: micros-exact, both read and write. */
  val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  /** The canonical events schema (parquet-table shape). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** JSON-lines events (the reference's native ingest format). */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema)
      .option("timestampNTZFormat", TsFormat)
      .json(path)

  /** Headered CSV events. `props` carries JSON-in-CSV, so quoting/escaping
    * must round-trip — pinned by SourceFormatsSpec.
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema)
      .option("timestampNTZFormat", TsFormat)
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)

  /** Writers emitting the exact wire shape the readers pin. */
  def writeJson(ev: DataFrame, path: String): Unit =
    wireWriter(ev).json(path)

  def writeCsv(ev: DataFrame, path: String): Unit =
    wireWriter(ev).option("header", "true").option("escape", "\"").csv(path)

  private def wireWriter(ev: DataFrame): DataFrameWriter[Row] =
    ev.write.mode("overwrite").option("timestampNTZFormat", TsFormat)
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-pinned readers for the ingest formats the reference accepts over
  * its wire API (JSON always; text/CSV-ish via the blob path —
  * `/root/reference/src/server.re` content-format dispatch). Each reader
  * yields the SAME frame shape as the parquet `events` table (epoch-ns
  * long `ts`), so everything downstream — the TS model, selectors,
  * aggregates, storage — is format-oblivious.
  *
  * Schemas are pinned explicitly: schema inference reads the data twice
  * and guesses types per-file, which at 100 TB is both a double scan and a
  * correctness hazard (a shard of all-integral doubles infers long).
  * DDL-pinned readers stream single-pass with zero inference.
  */
object EventSources {

  /** The canonical events schema with ns-long timestamps (what the parquet
    * table yields under `nanosAsLong`).
    */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),            // epoch NANOSECONDS
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** JSON-lines events (the reference's native ingest format). */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** Headered CSV events. `props` carries JSON-in-CSV, so quoting/escaping
    * must round-trip — pinned by SourceFormatsSpec.
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)
}

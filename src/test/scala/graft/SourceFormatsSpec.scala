package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.EventSources

/** Format-obliviousness: the same events round-trip through JSON lines and
  * CSV and produce the identical TS frame — so every operator above the
  * source layer is storage-format-independent (the reference ingests JSON
  * over its wire API; parquet is our lake format; CSV is the common
  * interchange fallback).
  */
class SourceFormatsSpec extends AnyFunSuite with SparkTestBase {

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("event_id")
      .collect().map(_.toSeq).toSeq

  test("events round-trip identically through json and csv sources") {
    val pq = Tables.events(spark, "/root/testdata/sf0.001")
    val dir = new File("target/tmp-source-formats").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new File(dir))

    // the PINNED writers: Spark's default text timestamp format carries
    // millis only and silently drops the ntz column's microsecond digits
    EventSources.writeJson(pq, s"$dir/json")
    EventSources.writeCsv(pq, s"$dir/csv")

    val fromJson = EventSources.readJson(spark, s"$dir/json")
    val fromCsv = EventSources.readCsv(spark, s"$dir/csv")
    val base = canon(pq)
    assert(base.nonEmpty)
    assert(canon(fromJson) === base)
    assert(canon(fromCsv) === base)
  }

  test("a TS query over a json source matches the parquet-sourced result") {
    val dir = new File("target/tmp-source-formats/json").getAbsolutePath
    val viaJson = graft.model.TsModel.fromEvents(EventSources.readJson(spark, dir))
    val viaPq = graft.model.TsModel.ts(spark, "/root/testdata/sf0.001")
    val q = (df: org.apache.spark.sql.DataFrame) =>
      graft.operators.TsOps.select(df, Seq("purchase"), graft.operators.LastN(10))
        .select("series_id", "t", "value", "event_id")
        .collect().map(_.toSeq).toSet
    assert(q(viaJson) === q(viaPq))
  }
}

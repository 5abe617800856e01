package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TsOps

/** The custom bounded-heap aggregate must agree with the window
  * implementation on arbitrary inputs (including timestamp ties and
  * multi-partition layouts that force partial-buffer merges).
  */
class TopKRowsSpec extends AnyFunSuite with SparkTestBase {

  test("topk_rows == window row_number on random data with ties") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 12) {
      val n = 1 + rnd.nextInt(8)
      val desc = rnd.nextBoolean()
      val rows = Seq.fill(120) {
        (Seq("a", "b", "c")(rnd.nextInt(3)),
         rnd.nextInt(50).toLong, // small range => many ties
         rnd.nextInt(1000).toDouble)
      }
      val withIds = rows.zipWithIndex.map { case ((s, t, v), i) =>
        (s, t, v, Map.empty[String, String], i.toLong)
      }
      val df = tsFrame(withIds).repartition(7) // force multi-partition merge
      val got = TsOps.perSeriesTopN(df, n, desc)
        .select("series_id", "t", "event_id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val exp = TsOps.perSeriesTopNWindow(df, n, desc)
        .select("series_id", "t", "event_id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === exp, s"trial=$trial n=$n desc=$desc")
    }
  }

  test("k larger than the group returns every row; buffer survives serialization") {
    val df = tsFrame(Seq(
      ("s", 1L, 1.0, Map.empty[String, String], 1L),
      ("s", 2L, 2.0, Map.empty[String, String], 2L))).repartition(3)
    assert(TsOps.perSeriesTopN(df, 100, descending = true).count() === 2)
    // direct serialize/deserialize round-trip of the aggregate buffer
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
    import org.apache.spark.sql.types._
    val st = StructType(Seq(StructField("t", LongType), StructField("event_id", LongType)))
    val agg = graft.functions.TopKRows(
      BoundReference(0, st, nullable = false), k = 2, descending = true)
    val proj = UnsafeProjection.create(st)
    val buf = agg.createAggregationBuffer()
    Seq((5L, 1L), (3L, 2L), (9L, 3L), (9L, 0L)).foreach { case (t, e) =>
      buf.add(proj(org.apache.spark.sql.catalyst.InternalRow(t, e)).copy())
    }
    val back = agg.deserialize(agg.serialize(buf))
    val kept = back.sortedRows.map(r => (r.getLong(0), r.getLong(1)))
    assert(kept === Seq((9L, 3L), (9L, 0L))) // top-2 of the tie at t=9, desc order
  }

  test("result arrays come back sorted in the query direction") {
    val df = tsFrame(Seq(
      ("s", 3L, 1.0, Map.empty[String, String], 1L),
      ("s", 1L, 2.0, Map.empty[String, String], 2L),
      ("s", 2L, 3.0, Map.empty[String, String], 3L)))
    val desc = TsOps.perSeriesTopN(df, 2, descending = true)
      .select("t").collect().map(_.getLong(0)).toSeq
    assert(desc.toSet === Set(3L, 2L))
    val asc = TsOps.perSeriesTopN(df, 2, descending = false)
      .select("t").collect().map(_.getLong(0)).toSeq
    assert(asc.toSet === Set(1L, 2L))
  }
}

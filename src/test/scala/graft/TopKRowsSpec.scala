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

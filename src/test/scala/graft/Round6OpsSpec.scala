package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant tests for the round-6 gates (the oracle pins exact values;
  * these pin the properties that must hold at ANY scale factor).
  */
class Round6OpsSpec extends AnyFunSuite with SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  test("dedup_canonical: one keeper per component, a member of it, quality in [0,1]") {
    val comps = graft.operators.Dedup.connectedComponents(
        graft.operators.Dedup.jaccardPairs(Tables.documents(spark, d), tau = 0.8, idCap = 500L))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component")).toMap
    val out = SparkEntry.queries("dedup_canonical")(spark, d).collect()
    assert(out.nonEmpty)
    // exactly one row per component, covering every component
    assert(out.map(_.getAs[Long]("component")).distinct.length === out.length)
    assert(out.map(_.getAs[Long]("component")).toSet === comps.values.toSet)
    out.foreach { r =>
      val c = r.getAs[Long]("component")
      assert(comps(r.getAs[Long]("keep_id")) === c, "keeper outside its cluster")
      assert(r.getAs[Long]("n_members") === comps.values.count(_ == c).toLong)
      assert(r.getAs[Long]("n_members") >= 2L) // every graph node has an edge
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0, s"quality $q")
    }
  }

  test("mm_gif_frames: frame count follows 1 + doc_id % 3, dims constant per doc") {
    val out = SparkEntry.queries("mm_gif_frames")(spark, d).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rows) =>
      assert(rows.length === (1 + id % 3).toInt, s"doc $id frame count")
      assert(rows.map(_.getAs[Int]("width")).distinct.length === 1)
      assert(rows.map(_.getAs[Int]("height")).distinct.length === 1)
      assert(rows.map(_.getAs[Int]("frame_idx")).sorted.toSeq === (0 until rows.length))
    }
  }
}

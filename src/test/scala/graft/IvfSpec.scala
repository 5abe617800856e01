package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class IvfSpec extends AnyFunSuite with SparkTestBase {

  test("IVF top-k recall vs brute force on real embeddings") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val brute = Similarity.bruteForceTopK(emb, nQueries = 5, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, nQueries = 5, k = 5, nCells = 8, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // approximate: require >= 60% recall at nProbe/nCells = 0.5 scan fraction
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall $recall too low; ivf=$ivf brute=$brute")
    assert(ivf.groupBy(_._1).forall(_._2.size == 5)) // k results per query
  }
}

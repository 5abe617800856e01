package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Graph}

/** Round-13 optimization invariants: every fast path introduced this round
  * must be output-identical to the path it bypasses.
  */
class OptR13Spec extends AnyFunSuite with SparkTestBase {

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("wedges: shuffled-hash fallback (broadcast limit 0) census-equal") {
    val s = spark
    import s.implicits._
    // hub 0 adjacent to 1..40 plus a tail chain — same fixture family as
    // Round9OpsSpec's guard-invariance matrix
    val edges = ((1L to 40L).map(i => (0L, i)) ++
      Seq((41L, 42L), (42L, 43L), (1L, 2L))).toDF("a", "b")
    def census() = Graph.fofCensus(edges, hotCap = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaBroadcast = census()
    val viaShuffleHash = withConf("spark.graft.wedgeBroadcastRows", "0")(census())
    assert(viaShuffleHash === viaBroadcast)
    assert(viaBroadcast.contains((1L, 2L, 38L)))
    // carryE2 flavor (adamic-adar) through the same fallback
    def aa() = Graph.adamicAdar(edges, hotCap = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val aaB = aa()
    val aaS = withConf("spark.graft.wedgeBroadcastRows", "0")(aa())
    assert(aaS === aaB)
  }

  test("connectedComponents: iterative fallback (local limit 0) label-equal") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (4L, 3L)).toDF("id_a", "id_b")
    def run() = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val local = run()
    val iterative = withConf("spark.graft.ccLocalEdgeLimit", "0")(run())
    assert(local === iterative)
    assert(local === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("union-find path matches min-reachable-id on a long chain") {
    val s = spark
    import s.implicits._
    // a 60-hop chain exceeds any single-digit propagation budget locally —
    // the union-find must still label every node with the chain head
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size === 60)
    assert(got.values.toSet === Set(1L))
  }
}

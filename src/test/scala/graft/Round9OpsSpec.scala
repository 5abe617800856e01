package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Graph, PowerIteration}

/** Round-9 pins: skew guards must not change answers (hamming chunk join,
  * co-occurrence pair builder, FoF wedge join), and the iterate-until-
  * converged drivers must reproduce their unrolled hash-gate special
  * cases exactly.
  */
class Round9OpsSpec extends AnyFunSuite with SparkTestBase {

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---- hammingNearDup hot-bucket guard ------------------------------------

  test("hamming near-dup guard emits the identical pair set on a mega-bucket") {
    val s = spark
    import s.implicits._
    // 50 sketches sharing chunk 0 (low 16 bits = 0x1234) but differing in
    // higher chunks beyond maxDist for most pairs: the (0, 0x1234) bucket
    // holds all 50 docs — the pigeonhole-guaranteed hot bucket. A planted
    // trio at distance <= 2 plus far-apart noise pins both accept and
    // reject paths through the decomposed join.
    val sketches = (
      Seq(1L -> 0x1234L, 2L -> 0x1234L, 3L -> (0x1234L | (1L << 17))) ++
      (10L until 57L).map(i => i -> (0x1234L | (i << 16)))
    ).toDF("doc_id", "sh")
    def run(cap: Int) = Dedup.hammingNearDup(sketches, maxDist = 3, hotBucketCap = cap)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val unguarded = run(Int.MaxValue)
    assert(unguarded.contains((1L, 2L, 0L)))
    assert(unguarded.contains((1L, 3L, 1L)))
    // cap=4 forces k = ceil(50/4) = 13 blocks in the shared bucket
    assert(run(4) === unguarded)
    assert(run(1) === unguarded)
  }

  // ---- co-occurrence edge builder guard -----------------------------------

  test("coOccurrenceEdges guard emits the identical edge set on a hot key") {
    val s = spark
    import s.implicits._
    // one hot key (A, 0) with 30 members + two cold keys; node 3 appears
    // in two keys so cross-key dup edges exercise the distinct
    val occ = ((0L until 30L).map(i => (i, "A", 0L)) ++
      Seq((3L, "B", 1L), (4L, "B", 1L), (99L, "C", 2L)))
      .toDF("user_id", "event_type", "m")
    def run(cap: Int) = Graph.coOccurrenceEdges(occ, "user_id",
        Seq("event_type", "m"), hotCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = occ.as("x").join(occ.as("y"),
        col("x.event_type") === col("y.event_type") && col("x.m") === col("y.m") &&
          col("x.user_id") < col("y.user_id"))
      .select(col("x.user_id"), col("y.user_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(Int.MaxValue) === plain)
    // (3,4) arises in BOTH keys — distinct folds it into the hot key's 435
    assert(plain.size === 30 * 29 / 2)
    assert(run(4) === plain)
    assert(run(1) === plain)
  }

  // ---- FoF census hub guard -----------------------------------------------

  test("fofCensus hub decomposition matches the plain wedge join") {
    val s = spark
    import s.implicits._
    // hub 0 adjacent to 1..40 (degree 40), plus a tail 41-42-43 chain and
    // an edge 1-2 so some FoF pairs are also direct edges (anti-join path)
    val edges = ((1L to 40L).map(i => (0L, i)) ++
      Seq((41L, 42L), (42L, 43L), (1L, 2L))).toDF("a", "b")
    def census(cap: Int) =
      Graph.fofCensus(edges, hotCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = {
      val und = edges.select(col("a").as("u"), col("b").as("v"))
        .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
      val deg = und.groupBy("u").agg(count(lit(1)).as("deg"))
      val two = und.as("e1").join(und.as("e2"),
          col("e1.v") === col("e2.u") && col("e1.u") =!= col("e2.v"))
        .select(col("e1.u").as("src"), col("e2.v").as("dst")).distinct()
      val fof = two.join(und.select(col("u").as("src"), col("v").as("dst")),
          Seq("src", "dst"), "left_anti")
        .groupBy("src").agg(count(lit(1)).as("n_fof"))
      deg.join(fof, col("u") === col("src"), "left")
        .select(col("u"), col("deg"), coalesce(col("n_fof"), lit(0L)))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    // node 1: neighbors {0, 2}; FoF = hub's other 38 spokes via 0 (3..40)
    // minus nothing, plus 2's... 2 is DIRECT — via 0 reaches 2 too but
    // anti-joined away; so n_fof(1) = 38
    assert(plain.contains((1L, 2L, 38L)))
    assert(census(Int.MaxValue) === plain)
    // cap=8 forces k = ceil(40/8) = 5 row/col blocks at the hub midpoint
    assert(census(8) === plain)
    assert(census(1) === plain)
  }

  // ---- common-neighbor link prediction ------------------------------------

  test("commonNeighbors counts wedges per non-edge pair, guard-invariant") {
    val s = spark
    import s.implicits._
    // hub 0 adjacent to 1..40 (degree 40) + edge 1-2: every spoke pair
    // shares neighbor 0; (1,2) is a direct edge and must be excluded
    val edges = ((1L to 40L).map(i => (0L, i)) ++ Seq((1L, 2L))).toDF("a", "b")
    def run(cap: Int) = Graph.commonNeighbors(edges, hotCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = run(Int.MaxValue)
    assert(plain.contains((3L, 4L, 1L)))              // via hub only
    assert(!plain.exists(p => p._1 == 1L && p._2 == 2L)) // direct edge
    // (2, 40): via hub; 1 is a neighbor of 2 but not of 40 — still 1
    assert(plain.contains((2L, 40L, 1L)))
    // spoke pairs: C(40,2) minus the (1,2) edge
    assert(plain.size === 40 * 39 / 2 - 1)
    assert(run(8) === plain)  // k = ceil(40/8) = 5 blocks at the hub
    assert(run(1) === plain)
  }

  test("adamicAdar discounts by ln(midpoint degree), guard-invariant") {
    val s = spark
    import s.implicits._
    // hub 0 adjacent to 1..40 (deg 40) plus a triangle corner 1-2-50:
    // pair (1,2) is an edge (excluded); pair (2,50)... 50 adjacent to 1,2
    val edges = ((1L to 40L).map(i => (0L, i)) ++
      Seq((1L, 2L), (1L, 50L), (2L, 50L))).toDF("a", "b")
    def run(cap: Int) = Graph.adamicAdar(edges, hotCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val plain = run(Int.MaxValue)
    val wHub = math.round(1e6 / math.log(40.0)) // hub degree 40
    // (3,4): only common neighbor is the hub
    assert(plain((3L, 4L)) === ((wHub, 1L)))
    // (0, 50): common neighbors 1 (deg 3) and 2 (deg 3) — two discounted terms
    val w3 = math.round(1e6 / math.log(3.0))
    assert(plain((0L, 50L)) === ((2 * w3, 2L)))
    assert(run(8) === plain)
    assert(run(1) === plain)
  }

  test("events_pit_join: feature reads are at-or-before, tombstones blank") {
    val s = spark
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("events_pit_join")(s, d)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // no future leak: every feature timestamp is at or before the event
    assert(rows.forall(r => r.getLong(3) <= r.getLong(1)))
    // tombstone path exercised: some reads land on a deleted write -> NULL
    assert(rows.exists(r => r.isNullAt(4)) && rows.exists(r => !r.isNullAt(4)))
    // brute recheck of one probe: the chosen write is the max (t, event_id)
    // at-or-before among 'click' writes of the entity
    import org.apache.spark.sql.functions._
    val kv = graft.model.KvModel.changeLog(s, d).filter(col("key") === "click")
      .select(col("id"), col("write_ts"), col("event_id"), col("deleted"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val probe = rows.head
    val best = kv.filter(w => w._1 == probe.getString(0) && w._2 <= probe.getLong(1))
      .maxBy(w => (w._2, w._3))
    assert(best._2 === probe.getLong(3))
    assert(probe.isNullAt(4) === best._4)
  }

  // ---- k-core peel --------------------------------------------------------

  test("kcorePeel cascades and kcore converges to the same fixpoint") {
    val s = spark
    import s.implicits._
    // triangle {1,2,3} + chain 3-4, 4-5: at k=2, node 5 peels in round 1,
    // which drops node 4 below k in round 2 — the cascade that makes
    // peeling iterative
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    def peel(r: Int) = Graph.kcorePeel(edges, k = 2, rounds = r)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val converged = Graph.kcore(edges, k = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(converged === Set((1L, 2L), (2L, 2L), (3L, 2L)))
    assert(peel(1) !== converged)  // node 4 still present after one round
    assert(peel(3) === converged)  // fixpoint reached
    assert(peel(4) === converged)  // further rounds are no-ops
  }

  // ---- hybrid RRF fusion --------------------------------------------------

  test("ann_rrf_hybrid fuses the bm25 and cosine ranks in exact micros") {
    val s = spark
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("ann_rrf_hybrid")(s, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === 50)
    // scores descend with the doc_id tiebreak, and every score is a sum
    // of at most two 1e6/(60+r) terms with r in 1..100
    assert(out.sliding(2).forall { case Array(x, y) =>
      x._2 > y._2 || (x._2 == y._2 && x._1 < y._1) })
    val hi = 1000000L / 61L * 2
    assert(out.forall { case (_, m) => m > 0 && m <= hi })
    // a doc on BOTH lists outscores the best single-list doc at equal rank:
    // the top fused doc must beat the pure rank-1 single-list score
    assert(out.head._2 >= 1000000L / 61L)
  }

  // ---- embedding dimension profile ----------------------------------------

  test("embed_dim_stats matches a brute double-precision recount per dim") {
    val s = spark
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("embed_dim_stats")(s, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.size === 64)
    val brute = Tables.embeddings(s, d)
      .select(posexplode(graft.functions.VectorFunctions.asDouble(col("embedding")))
        .as(Seq("dim", "x")))
      .groupBy("dim").agg(count(lit(1)).as("n"), sum("x").as("sx"),
        (count(lit(1)) * sum(col("x") * col("x")) - sum("x") * sum("x")).as("v"))
      .collect().map(r => r.getInt(0).toLong -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    for ((dim, (n, sm, v2)) <- out) {
      val (bn, bsx, bv) = brute(dim)
      assert(n === bn)
      assert(math.abs(sm / 1e6 - bsx) < 1e-3)          // micros truncation
      assert(v2 >= 0L && math.abs(v2 / 1e12 - bv) < 1.0)
    }
  }

  test("q1_incremental: merged partial states equal the direct recompute") {
    val s = spark
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val merged = SparkEntry.queries("q1_incremental")(s, d)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val direct = Tables.lineitem(s, d)
      .filter(col("l_shipdate").cast("date") <= lit("1998-09-02"))
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_quantity")).cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        round(col("l_discount") * 100).cast("long").as("d2"),
        round(col("l_tax") * 100).cast("long").as("t2"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("qty"), sum("cents"),
        sum(col("cents") * (lit(100L) - col("d2"))),
        sum(col("cents") * (lit(100L) - col("d2")) * (lit(100L) + col("t2"))),
        count(lit(1)))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(merged === direct)
  }

  test("sample_negatives: never-bought pairs, true 5 smallest priorities") {
    val s = spark
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("sample_negatives")(s, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bought = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val parts = Tables.part(s, d).select(col("p_partkey"))
      .collect().map(_.getLong(0))
    assert(out.forall { case (c, p, _) => !bought.contains((c, p)) })
    for ((c, rows) <- out.groupBy(_._1)) {
      assert(rows.length === 5)
      val brute = parts.filter(p => !bought.contains((c, p)))
        .map(p => ((c * 2654435761L + p * 40503L) % 1000000L, p))
        .sorted.take(5).map { case (pr, p) => (c, p, pr) }.toSet
      assert(rows.toSet === brute)
    }
  }

  // ---- iterate-until-converged drivers ------------------------------------

  test("pagerank driver reproduces the unrolled 3-iteration gate arithmetic") {
    val s = spark
    import s.implicits._
    val edges = Seq(("a", "b", 3L), ("b", "c", 2L), ("c", "a", 1L),
      ("a", "c", 1L), ("c", "b", 4L)).toDF("src", "dst", "c")
    // the gate's unrolled loop, verbatim arithmetic
    def unrolled(iters: Int) = {
      val wout = edges.groupBy("src").agg(sum("c").as("wout"))
      val nodes = edges.select(col("src").as("node"))
        .unionAll(edges.select(col("dst").as("node"))).distinct()
      var r = nodes.withColumn("r", lit(200000L))
      for (_ <- 1 to iters) {
        val contrib = edges
          .join(broadcast(wout), "src")
          .join(broadcast(r.select(col("node").as("src"), col("r"))), "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(expr("c * r div wout")).as("sc"))
        r = nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(30000L) + expr("850000 * coalesce(sc, 0L) div 1000000")).as("r"))
      }
      r.collect().map(x => (x.getString(0), x.getLong(1))).toMap
    }
    def driver(maxIters: Int, tol: Long) =
      Graph.pagerank(edges, maxIters = maxIters, tolMicros = tol)
        .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    assert(driver(3, 0L) === unrolled(3))
    // convergence: the 50-iteration run is a fixpoint within tolerance —
    // one more unrolled step from it moves total rank by <= tol
    val conv = driver(50, 100L)
    val more = driver(51, 100L)
    assert(conv.keys === more.keys)
    val moved = conv.keys.map(k => math.abs(conv(k) - more(k))).sum
    assert(moved <= 100L)
  }

  test("power iteration driver reproduces the unrolled 2-step gate arithmetic") {
    val s = spark
    import s.implicits._
    // small synthetic symmetric positive matrix on a 4-dim axis
    val gram = (for (i <- 0 until 4; j <- 0 until 4)
      yield (i, j, (10L - math.abs(i - j)) * 100L)).toDF("i", "j", "m")
    def unrolled(steps: Int) = {
      var v = s.range(4).select(col("id").cast("int").as("j"), lit(100000L).as("v"))
      for (_ <- 1 to steps) {
        val w = gram.join(broadcast(v), "j")
          .groupBy(col("i").as("dim")).agg(sum(col("m") * col("v")).as("w"))
        val mx = w.agg(max(abs(col("w"))).as("mx"))
        v = w.crossJoin(broadcast(mx))
          .selectExpr("dim AS j", "(w * 100000L) div mx AS v")
      }
      v.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    }
    def driver(maxIters: Int, tol: Long) =
      PowerIteration.iterate(gram, 4, maxIters = maxIters, tolMicros = tol)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(driver(2, -1L) === unrolled(2))
    // convergence: the driver's integer fixpoint stops moving — running
    // with a generous cap equals running one iteration longer
    assert(driver(50, 0L) === driver(51, 0L))
  }
}

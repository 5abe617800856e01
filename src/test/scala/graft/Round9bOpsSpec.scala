package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{JaroWinkler, JaroWinklerImpl}
import graft.operators.{Dedup, Graph}

/** Round-9 session-2 pins: the Jaro-Winkler native expression matches its
  * DuckDB oracle semantics case-by-case, the generic blocked-pairs guard
  * never changes the candidate set, and label propagation's converged
  * driver reproduces the unrolled gate rounds.
  */
class Round9bOpsSpec extends AnyFunSuite with SparkTestBase {

  // ---- JaroWinklerImpl: values validated against DuckDB this session -----

  test("jaro-winkler matches DuckDB on the classic cases") {
    def jw(a: String, b: String) = JaroWinklerImpl.sim(a, b)
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("crate", "trace") - 0.7333333333333334) < 1e-12)
    assert(jw("abc", "abc") === 1.0)
    // empty sides are 0, not 1 (DuckDB's convention)
    assert(jw("", "") === 0.0)
    assert(jw("a", "") === 0.0)
    // window-0 edge: max(2,2)/2 - 1 = 0, so only same-position compares
    assert(jw("ab", "ba") === 0.0)
    // odd transposition count floors (t=3 -> 1): DuckDB gives 0.9444...
    // for the 3-cycle, and the 'a'/'b' prefix mismatch means no boost
    assert(math.abs(jw("abcxxx", "bcaxxx") - 0.9444444444444445) < 1e-12)
  }

  test("jaro-winkler expression evaluates under codegen and handles nulls") {
    val s = spark
    import s.implicits._
    val df = Seq(("martha", "marhta"), ("abc", "abc"), (null, "x"))
      .toDF("a", "b")
      .select(round(JaroWinkler.jaro_winkler(col("a"), col("b")), 4).as("jw"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got.toSeq === Seq(0.9611, 1.0, null))
  }

  // ---- blockedPairs hot-block guard ---------------------------------------

  test("blockedPairs emits the identical pair set at any cap, each pair once") {
    val s = spark
    import s.implicits._
    // one planted 40-member hot block + two cold blocks
    val rows = ((0L until 40L).map(i => (i, "hot", s"p$i")) ++
      Seq((100L, "c1", "x"), (101L, "c1", "y"), (200L, "c2", "z")))
      .toDF("doc_id", "blk", "payload")
    def run(cap: Int) = Dedup.blockedPairs(rows, "doc_id", "blk",
        carry = Seq("payload"), hotBlockCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    val unguarded = run(Int.MaxValue)
    val guarded = run(7) // 40/7 -> k=6 blocks on the hot key
    // multiset equality: the guard must not duplicate OR drop a pair
    assert(guarded.sorted.toSeq === unguarded.sorted.toSeq)
    assert(unguarded.length === 40 * 39 / 2 + 1) // hot-block pairs + (100,101)
    assert(unguarded.contains((100L, 101L, "x", "y")))
  }

  // ---- label propagation ---------------------------------------------------

  private def edges(pairs: Seq[(String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    pairs.toDF("a", "b")
  }

  // ---- time-decay EWMA ------------------------------------------------------

  test("ewmaIrregular forgets across long gaps, barely across short ones") {
    val rows = tsFrame(Seq(
      ("s", 0L, 10.0, Map.empty[String, String], 1L),
      ("s", 60000L, 0.0, Map.empty[String, String], 2L),       // 1-min gap
      ("t", 0L, 10.0, Map.empty[String, String], 3L),
      ("t", 86400000L, 0.0, Map.empty[String, String], 4L)))   // 24-h gap
    val got = graft.operators.TsOps.ewmaIrregular(rows)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // w = round(exp(-1/60), 6) = 0.983471 -> level 9.83471: a minute
    // forgets almost nothing
    assert(math.abs(got(("s", 60000L)) - 9.83471) < 1e-9)
    // w = round(exp(-24), 6) = 0.0 -> level 0.0: a day forgets everything
    assert(got(("t", 86400000L)) === 0.0)
    // the first observation of every series is its own level
    assert(got(("s", 0L)) === 10.0 && got(("t", 0L)) === 10.0)
  }

  /** In-memory reference: synchronous rounds, argmax by (max count, min
    * label) — the model the distributed plan must replay exactly. */
  private def refLpa(pairs: Seq[(String, String)], rounds: Int): Map[String, String] = {
    val und = pairs ++ pairs.map(p => (p._2, p._1))
    val nodes = und.map(_._1).distinct
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = nodes.map { n =>
        val counts = und.filter(_._1 == n).map(e => lab(e._2))
          .groupBy(identity).view.mapValues(_.size).toMap
        val cmax = counts.values.max
        n -> counts.filter(_._2 == cmax).keys.min
      }.toMap
    }
    lab
  }

  // two bridged 3-cliques plus a pendant — exercises ties, bridge pull,
  // and degree-1 nodes
  private val lpaFixture = Seq("u1" -> "u2", "u1" -> "u3", "u2" -> "u3",
    "v1" -> "v2", "v1" -> "v3", "v2" -> "v3", "u3" -> "v1", "v3" -> "w9")

  test("label propagation replays the in-memory model round-for-round") {
    val e = edges(lpaFixture)
    for (r <- 1 to 4) {
      val got = Graph.labelPropagation(e, rounds = r)
        .collect().map(x => x.getString(0) -> x.getString(1)).toMap
      assert(got === refLpa(lpaFixture, r), s"round $r diverged")
    }
  }

  test("converged label propagation equals the unrolled rounds at fixpoint") {
    val e = edges(lpaFixture)
    // find the model's fixpoint round first, then pin the drivers to it
    val fix = (1 to 20).find(r =>
      refLpa(lpaFixture, r) == refLpa(lpaFixture, r + 1)).get
    val conv = Graph.labelPropagationConverged(e, maxRounds = 25)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(conv === refLpa(lpaFixture, fix))
  }
}

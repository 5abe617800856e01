package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, Dedup, ExactMedian}

/** Seeded randomized model tests: each distributed operator is replayed
  * against a trivially-correct in-memory model on generated inputs —
  * shapes the fixed specs don't enumerate (dense ties, singleton keys,
  * empty sides, random bucket widths).
  */
class PropertySpec extends AnyFunSuite with SparkTestBase {

  test("asOf and asOfBucketed match the in-memory model on random inputs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(97) // per-test seed: order-independent
    for (iter <- 1 to 4) {
      val keys = Seq.tabulate(1 + rnd.nextInt(3))(i => s"k$i")
      val lRows = Seq.tabulate(60)(i =>
        (keys(rnd.nextInt(keys.size)), rnd.nextInt(30).toLong, i.toLong))
      val rRows = Seq.tabulate(40)(i =>
        (keys(rnd.nextInt(keys.size)), rnd.nextInt(30).toLong,
         rnd.nextInt(50).toDouble, (100 + i).toLong))
      val left = lRows.toDF("k", "t", "event_id")
      val right = rRows.toDF("k", "t", "value", "event_id")
      // model: max (t, event_id) right row at-or-before, per left row
      val model = lRows.flatMap { case (k, t, eid) =>
        val cand = rRows.filter(r => r._1 == k && r._2 <= t)
        if (cand.isEmpty) None
        else {
          val best = cand.maxBy(r => (r._2, r._4))
          Some((k, t, eid, best._2, best._3))
        }
      }.toSet
      val plain = AsOfJoin.asOf(left, right, "k", "t", Seq("value"))
        .select("k", "t", "event_id", "asof_t", "asof_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(plain === model, s"asOf diverged at iter $iter")
      val width = 1L + rnd.nextInt(40)
      val bucketed = AsOfJoin.asOfBucketed(left, right, "k", "t", Seq("value"), width)
        .select("k", "t", "event_id", "asof_t", "asof_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(bucketed === model, s"asOfBucketed(width=$width) diverged at iter $iter")
    }
  }

  test("connectedComponents matches in-memory union-find on random graphs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(98)
    for (iter <- 1 to 4) {
      val n = 30 + rnd.nextInt(40)
      val edges = Seq.fill(20 + rnd.nextInt(40))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (e._1 min e._2, e._1 max e._2)).distinct
      // union-find model
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra max rb) = ra min rb
      }
      val model = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> {
          // component = min reachable node id
          val root = find(x)
          parent.keys.filter(find(_) == root).min min root
        }).toMap
      // a random graph can realize a long path, whose diameter bounds the
      // propagation rounds — give it headroom beyond the operator default
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"), maxRounds = 200)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === model, s"components diverged at iter $iter (edges=$edges)")
    }
  }

  test("ExactMedian matches the sorted-list median on random inputs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(99)
    for (iter <- 1 to 4) {
      val n = 1 + rnd.nextInt(200)
      // mixture: heavy duplicates, negatives, huge magnitudes
      val vals = Seq.fill(n)(rnd.nextInt(4) match {
        case 0 => rnd.nextInt(5).toDouble
        case 1 => -rnd.nextDouble() * 1e6
        case 2 => rnd.nextDouble() * 1e12
        case _ => rnd.nextDouble()
      })
      val sorted = vals.sorted
      val expect =
        if (n % 2 == 1) sorted(n / 2)
        else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
      val got = ExactMedian.median(vals.toDF("value")).get
      assert(got === expect, s"median diverged at iter $iter n=$n")
    }
  }

  test("macaroon chain: any single-caveat tamper or strip invalidates") {
    import graft.auth.{Macaroons, Token}
    val KEY = "prop-key"
    val rnd = new scala.util.Random(100)
    for (iter <- 1 to 5) {
      val caveats = Seq.fill(1 + rnd.nextInt(4))(s"c${rnd.nextInt(10)} = v${rnd.nextInt(10)}")
      val m = caveats.foldLeft(Macaroons.mint(KEY, s"id$iter"))(_.addCaveat(_))
      val ctx = caveats // exact context: token must verify
      assert(Token.isValid(Macaroons.serialize(m), KEY, ctx))
      val i = rnd.nextInt(caveats.size)
      val tampered = m.copy(caveats = m.caveats.updated(i, "c = forged"))
      assert(!Token.isValid(Macaroons.serialize(tampered), KEY, "c = forged" +: ctx))
      val stripped = m.copy(caveats = m.caveats.patch(i, Nil, 1))
      assert(!Token.isValid(Macaroons.serialize(stripped), KEY, ctx))
    }
  }
}

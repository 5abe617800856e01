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

  test("nextFitPack invariants hold on random inputs and match the sequential model") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(99)
    for (iter <- 1 to 3) {
      val budget = 50L + rnd.nextInt(200)
      val rows = Seq.tabulate(120)(i =>
        ("sh" + rnd.nextInt(4), i.toLong, 1L + rnd.nextInt(120)))
      val df = rows.map { case (sh, id, n) => (sh, id, Seq.fill(n.toInt)("w").mkString(" ")) }
        .toDF("source", "doc_id", "text")
      val out = graft.operators.Packing.nextFitPack(df, budget,
          graft.functions.TextFunctions.tokenCount(col("text")), col("source"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // sequential model per shard in id order
      val model = rows.groupBy(_._1).flatMap { case (sh, rs) =>
        var bin = 0L; var acc = 0L
        rs.sortBy(_._2).map { case (_, id, n) =>
          if (acc > 0 && acc + n > budget) { bin += 1; acc = 0L }
          acc += n
          (sh, id, n, bin)
        }
      }.toSet
      assert(out.toSet === model, s"nextFitPack diverged at iter $iter (budget=$budget)")
    }
  }

  test("takeQuotaByGroup matches the window-rank model on random inputs") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(101)
    for (iter <- 1 to 4) {
      val groups = Seq.tabulate(1 + rnd.nextInt(4))(i => s"g$i")
      // ids dense enough to hit multi-row buckets; buckets deliberately
      // coarse (mod 7) so boundary buckets hold several rows
      val rows = Seq.tabulate(80 + rnd.nextInt(80))(i =>
        (i.toLong, groups(rnd.nextInt(groups.size)), (i * 13 % 7).toLong))
      val df = rows.toDF("doc_id", "source", "bucket")
      val quotas = groups.map(g => (g, rnd.nextInt(40).toLong)).toDF("source", "quota")
      val qmap = quotas.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // model: per group, first `quota` rows in (bucket, doc_id) order
      val model = rows.groupBy(_._2).flatMap { case (g, rs) =>
        rs.sortBy(r => (r._3, r._1)).take(qmap(g).toInt)
      }.map(r => (r._1, r._2)).toSet
      val got = graft.operators.Packing.takeQuotaByGroup(df, quotas)
        .select("doc_id", "source").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === model, s"takeQuotaByGroup diverged at iter $iter (quotas=$qmap)")
    }
  }

  test("sessionsBucketed matches the sequential gap-session model on random inputs") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(102)
    for (iter <- 1 to 4) {
      val gap = 5L + rnd.nextInt(20)
      val bucket = gap + 1L + rnd.nextInt(30) // must exceed the gap
      val users = 1 + rnd.nextInt(3)
      val rows = Seq.tabulate(70 + rnd.nextInt(60))(i =>
        (rnd.nextInt(users).toLong, rnd.nextInt(300).toLong,
         rnd.nextInt(10).toDouble, i.toLong))
      val df = rows.toDF("user_id", "t", "value", "event_id")
      // sequential model: walk each user's (t, event_id) order, split on
      // gap. NOTE the .toSeq before flatMap — flatMapping a groupBy Map
      // with pair-shaped elements rebuilds a Map and silently drops
      // duplicate (user, session) keys.
      val model = rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._4))
        var sess = 0L; var prev = Long.MinValue
        sorted.map { case (_, t, v, _) =>
          if (prev == Long.MinValue || t - prev > gap) sess += 1
          prev = t
          (u, sess, t, v)
        }
      }.groupBy(r => (r._1, r._2)).map { case ((u, sess), evs) =>
        (u, sess, evs.size.toLong, evs.map(_._3).min, evs.map(_._3).max,
          BigDecimal(evs.map(_._4).sum).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSet
      val got = graft.operators.Sessionize.sessionsBucketed(df, gap, bucket)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
      assert(got === model, s"sessionsBucketed diverged at iter $iter (gap=$gap bucket=$bucket)")
    }
  }

  test("pii redaction is idempotent and never invents matches") {
    val s2 = spark
    import s2.implicits._
    import graft.functions.Pii
    val samples = Seq(
      "a@b.co 1.2.3.4 555-123-4567", "plain words only", "x 999.999.999.999 y",
      "a@b@c.com", "7.0.0.1ish", "<EMAIL> already", "555-12-34567", "e.g. v1.2.3.4.5"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = samples.toDF("doc_id", "text")
    val once = df.select(col("doc_id"), Pii.redact(col("text")).as("r"))
    val twice = once.select(col("doc_id"), Pii.redact(col("r")).as("r"))
    assert(once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ===
           twice.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
    val clean = df.filter(!Pii.hasPii(col("text")))
      .select(col("doc_id"), Pii.redact(col("text")).as("r"), col("text"))
      .collect()
    clean.foreach(r => assert(r.getString(1) === r.getString(2), s"doc ${r.getLong(0)} changed"))
  }

  test("chunking partitions every token stream: sizes sum to doc length") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(100)
    val docs = Seq.tabulate(50)(i => (i.toLong, Seq.fill(1 + rnd.nextInt(90))("w").mkString(" ")))
      .toDF("doc_id", "text")
    // stride == window -> disjoint cover: chunk sizes sum to token count
    val out = graft.operators.CorpusAnalysis.chunkTokens(docs, window = 16, stride = 16)
      .groupBy("doc_id").agg(org.apache.spark.sql.functions.sum("n_tokens").as("tot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === expect)
  }
}

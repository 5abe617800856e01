package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Independent-model checks for the round-8 structure/testing gates: the
  * degree-oriented triangle join, histogram Mann-Whitney ranks, as-of
  * attribution, CUSUM change-points, phrase adjacency, and the per-domain
  * quota heap — each replayed by a brute-force Scala model over the same
  * input, so a bug in the distributed plan cannot hide behind the oracle
  * sharing its SQL shape.
  */
class GraphAndRankSpec extends AnyFunSuite with SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  test("triangles: parity with brute enumeration on a pseudo-random graph") {
    val s = spark
    import s.implicits._
    // deterministic G(30, ~0.2): edge (a,b) present iff hash parity says so
    val edges = for {
      a <- 0L until 30L; b <- (a + 1) until 30L
      if ((a * 31 + b) * 2654435761L % 97) < 20
    } yield (a, b)
    val df = edges.toDF("a", "b")
    val got = Graph.triangles(df)
      .as[(Long, Long, Long)].collect().toSet
    val es = edges.toSet
    val want = (for {
      x <- 0L until 30L; y <- (x + 1) until 30L; z <- (y + 1) until 30L
      if es((x, y)) && es((y, z)) && es((x, z))
    } yield (x, y, z)).toSet
    assert(want.nonEmpty, "fixture must contain triangles")
    assert(got === want)
  }

  test("triangles: hub star yields none; closing one edge yields exactly one") {
    val s = spark
    import s.implicits._
    // star around 0: high-degree hub — degree orientation points every
    // edge AT the hub, so the hub apexes no wedges and the join stays flat
    val star = (1L to 20L).map(i => (0L, i))
    assert(Graph.triangles(star.toDF("a", "b")).count() === 0L)
    val plusOne = star :+ (1L, 2L)
    assert(Graph.triangles(plusOne.toDF("a", "b"))
      .as[(Long, Long, Long)].collect().toSeq === Seq((0L, 1L, 2L)))
  }

  test("edgeSupport: support and jaccard-micros match brute common-neighbor counts") {
    val s = spark
    import s.implicits._
    val edges = for {
      a <- 0L until 30L; b <- (a + 1) until 30L
      if ((a * 31 + b) * 2654435761L % 97) < 20
    } yield (a, b)
    val es = edges.toSet
    def adj(n: Long) = (0L until 30L).filter(o =>
      es((math.min(n, o), math.max(n, o))) && o != n).toSet
    val got = Graph.edgeSupport(edges.toDF("a", "b"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4, t._5, t._6)).toMap
    assert(got.keySet === es)
    for ((a, b) <- es) {
      val (na, nb) = (adj(a), adj(b))
      val sup = (na & nb).size.toLong
      val denom = na.size + nb.size - 2L - sup
      val j = if (denom > 0) sup * 1000000L / denom else 0L
      assert(got((a, b)) === ((sup, na.size.toLong, nb.size.toLong, j)),
        s"edge ($a,$b)")
    }
  }

  test("ts_motif: the reported word is the max-count 4-gram of the SAX stream") {
    // recompute the symbol stream via the ts_sax gate (its own oracle gate
    // certifies the symbols), fold 4-grams, argmax with the same tiebreak
    val sax = SparkEntry.queries("ts_sax")(spark, d)
      .select("series_id", "bucket", "symbol").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val want = sax.groupBy(_._1).map { case (sid, rows) =>
      val syms = rows.sortBy(_._2).map(_._3)
      val counts = syms.sliding(4).filter(_.size == 4).map(_.mkString)
        .toSeq.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
      val (w, c) = counts.minBy { case (word, cnt) => (-cnt, word) }
      sid -> (w, c)
    }
    val got = SparkEntry.queries("ts_motif")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got === want)
  }

  test("events_ab_mwu: U, ties, and z match brute ranks over raw rows") {
    val got = SparkEntry.queries("events_ab_mwu")(spark, d).collect().head
    val rows = Tables.events(spark, d)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sorted = rows.map(_._2).sorted
    // brute average ranks (1-based) with ties
    val rankOf: Map[Long, Double] = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> (g.map(_._2 + 1).sum.toDouble / g.size) }
    val n1 = rows.count(_._1 == "purchase").toLong
    val n2 = rows.count(_._1 == "view").toLong
    val r1 = rows.filter(_._1 == "purchase").map(r => rankOf(r._2)).sum
    val twoU1 = math.rint(2 * r1 - n1 * (n1 + 1)).toLong
    val ties = rows.groupBy(_._2).map { case (_, g) =>
      val t = g.size.toLong; t * t * t - t
    }.sum
    assert(got.getAs[Long]("n1") === n1)
    assert(got.getAs[Long]("n2") === n2)
    assert(got.getAs[Long]("two_u1") === twoU1)
    assert(got.getAs[Long]("tie_cubes") === ties)
    val n = (n1 + n2).toDouble
    val z = (twoU1 / 2.0 - n1 * n2 / 2.0) /
      math.sqrt(n1 * n2 / 12.0 * ((n + 1) - ties / (n * (n - 1))))
    assert(math.abs(got.getAs[Double]("z") - z) < 1e-5)
  }

  test("events_attribution: every purchase credits the latest prior click") {
    val rows = Tables.events(spark, d)
      .select(col("user_id"), unix_millis(col("ts").cast("timestamp")).as("t"),
        col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicks = rows.filter(_._3 == "click").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._2).sorted }
    val attributed = rows.filter(_._3 == "purchase").flatMap { case (u, t, _, cents) =>
      clicks.get(u).flatMap { ts =>
        val prior = ts.filter(_ <= t)
        if (prior.isEmpty) None else Some((prior.max / 3600000L, u, cents))
      }
    }
    val want = attributed.groupBy(_._1).map { case (h, g) =>
      h -> (g.size.toLong, g.map(_._3).sum, g.map(_._2).distinct.size.toLong)
    }
    val got = SparkEntry.queries("events_attribution")(spark, d).collect()
      .map(r => r.getAs[Long]("click_hour") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("rev_cents"),
          r.getAs[Long]("n_users"))).toMap
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("ts_changepoint: argmax |CUSUM| matches a mean-shift model fold") {
    val got = SparkEntry.queries("ts_changepoint")(spark, d).collect()
      .map(r => r.getAs[String]("series_id") ->
        (r.getAs[Long]("cp_t"), r.getAs[Long]("cusum_max"), r.getAs[Long]("n"))).toMap
    val byS = graft.model.TsModel.ts(spark, d)
      .select(col("series_id"), col("t"), col("event_id"),
        round(col("value") * 100).cast("long").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val want = byS.map { case (sid, rows) =>
      val ord = rows.sortBy(r => (r._2, r._3))
      val n = ord.length.toLong
      val tot = ord.map(_._4).sum
      var cs = 0L
      val stats = ord.zipWithIndex.map { case ((_, t, _, c), i0) =>
        cs += c
        (math.abs(n * cs - (i0 + 1) * tot), t, i0)
      }
      val best = stats.maxBy(s => (s._1, -s._3))
      sid -> (best._2, best._1, n)
    }
    assert(got === want)
  }

  test("text_phrase: postings adjacency equals per-doc substring-free token scan") {
    val phrases = Seq("hash join", "table scan", "sort merge")
    val docs = Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = (for {
      (id, text) <- docs
      toks = text.trim.toLowerCase.split("\\s+")
      ph <- phrases
      Array(w1, w2) = ph.split(" ")
      hits = toks.indices.dropRight(1).filter(i => toks(i) == w1 && toks(i + 1) == w2)
      if hits.nonEmpty
    } yield (ph, id) -> (hits.size.toLong, hits.head.toLong)).toMap
    val got = SparkEntry.queries("text_phrase")(spark, d).collect()
      .map(r => (r.getAs[String]("phrase"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("first_pos"))).toMap
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("snapshotDiff: added/removed/changed/same classify a hand-built log") {
    val s = spark
    import s.implicits._
    // (id, key, value, write_ts, event_id, deleted)
    val log = Seq(
      ("u1", "a", "v1", 5L, 1L, false),   // unchanged across horizons -> dropped
      ("u1", "b", "v1", 5L, 2L, false), ("u1", "b", "v2", 15L, 3L, false), // changed
      ("u1", "c", "v1", 5L, 4L, false), ("u1", "c", "", 15L, 5L, true),    // removed
      ("u1", "d", "v9", 15L, 6L, false),  // added
      ("u1", "e", "x", 5L, 7L, false), ("u1", "e", "y", 5L, 8L, false),    // LWW tie:
      // event_id 8 wins at BOTH horizons -> same -> dropped
      ("u2", "a", "z", 20L, 9L, false)    // beyond t2 -> invisible
    ).toDF("id", "key", "value", "write_ts", "event_id", "deleted")
    val got = graft.operators.KvOps.snapshotDiff(log, t1 = 10L, t2 = 19L)
      .as[(String, String, String)].collect().toSet
    assert(got === Set(("u1", "b", "changed"), ("u1", "c", "removed"),
      ("u1", "d", "added")))
  }

  test("user_transition_latency: bucketed lag carries equal the global lag windows") {
    val s = spark
    import s.implicits._
    val ev = Tables.events(spark, d)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("t"), col("event_id"))
    val want = ev.select(col("user_id"), col("event_id"),
        unix_millis(col("ts").cast("timestamp")).as("t"), col("event_type"))
      .withColumn("from_type", lag("event_type", 1).over(w))
      .withColumn("prev_t", lag("t", 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy("from_type", "event_type")
      .agg(count(lit(1)).as("n"), sum(col("t") - col("prev_t")).as("sum_ms"))
      .as[(String, String, Long, Long)].collect().toSet
    val got = SparkEntry.queries("user_transition_latency")(spark, d)
      .select("from_type", "to_type", "n", "sum_ms")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("Dtw.banded: equals the full O(n·m) DP inside the band; -1 outside") {
    import graft.operators.Dtw
    def brute(a: Array[Long], b: Array[Long], band: Int): Long = {
      val INF = Long.MaxValue / 4
      val n = a.length; val m = b.length
      val dp = Array.fill(n + 1, m + 1)(INF)
      for (i <- 1 to n; j <- 1 to m if math.abs(i - j) <= band) {
        val c = math.abs(a(i - 1) - b(j - 1))
        val best = if (i == 1 && j == 1) 0L
          else math.min(dp(i - 1)(j), math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
        if (best < INF) dp(i)(j) = c + best
      }
      if (dp(n)(m) >= INF) -1L else dp(n)(m)
    }
    val rnd = (seed: Long, n: Int) =>
      Array.tabulate(n)(i => (seed * 31 + i) * 2654435761L % 10000)
    for ((na, nb, band) <- Seq((40, 40, 5), (40, 37, 5), (30, 40, 12), (25, 25, 1))) {
      val (a, b) = (rnd(na, na), rnd(nb + 1, nb))
      assert(Dtw.banded(a, b, band) === brute(a, b, band), s"($na,$nb,$band)")
    }
    // identical sequences cost 0; end cell out of band is unreachable
    val x = rnd(9, 20)
    assert(Dtw.banded(x, x, 3) === 0L)
    assert(Dtw.banded(rnd(1, 30), rnd(2, 10), 5) === -1L)
  }

  test("ts_dtw: distributed pair DP equals the local banded fold") {
    import graft.operators.Dtw
    val got = SparkEntry.queries("ts_dtw")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("dtw")).toMap
    val paa = graft.model.TsModel.ts(spark, d)
      .select(col("series_id"), expr("t div 43200000").as("bucket"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy("series_id", "bucket").agg(sum("c").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val seqs = paa.map { case (sid, rows) => sid -> rows.sortBy(_._2).map(_._3) }
    val want = (for {
      (sa, va) <- seqs; (sb, vb) <- seqs if sa < sb
      dtw = Dtw.banded(va, vb, 6) if dtw >= 0
    } yield (sa, sb) -> dtw).toMap
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("text_collocations: PMI top-20 matches a brute corpus recount") {
    // sf0.01: the sf0.001 corpus is too small for any bigram to reach the
    // gate's min-count 20, which would make this test vacuous
    val d = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, d)
      .select("text").collect().map(_.getString(0))
    val toks = docs.map(_.trim.toLowerCase.split("\\s+"))
    val uni = toks.flatten.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val bgs = toks.flatMap(t => t.indices.dropRight(1).map(i => (t(i), t(i + 1))))
    val bgc = bgs.groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    val n1 = uni.values.sum.toDouble
    val n2 = bgs.length.toDouble
    val got = SparkEntry.queries("text_collocations")(spark, d).collect()
    assert(got.length === 20)
    got.foreach { r =>
      val (w1, w2) = (r.getString(0), r.getString(1))
      val cab = r.getAs[Long]("c_ab")
      assert(cab === bgc((w1, w2)))
      assert(r.getAs[Long]("c_a") === uni(w1))
      assert(r.getAs[Long]("c_b") === uni(w2))
      val pmi = math.log((cab / n2) / ((uni(w1) / n1) * (uni(w2) / n1)))
      assert(math.abs(r.getAs[Double]("pmi") - pmi) < 1e-5, s"($w1,$w2)")
    }
    // and the selection is the true top-20 under (pmi desc, w1, w2)
    val all = bgc.filter(_._2 >= 20).toSeq.map { case ((w1, w2), cab) =>
      val pmi = math.rint(math.log((cab / n2) /
        ((uni(w1) / n1) * (uni(w2) / n1))) * 1e6) / 1e6
      (w1, w2, pmi)
    }
    val want = all.sortBy { case (w1, w2, p) => (-p, w1, w2) }.take(20)
      .map(t => (t._1, t._2)).toSet
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet === want)
  }

  test("kv_history_scd2: intervals chain per cell and current matches LWW") {
    val rows = SparkEntry.queries("kv_history_scd2")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.longValue),
        r.getAs[Boolean]("is_current")))
    val byCell = rows.groupBy(r => (r._1, r._2))
    assert(byCell.nonEmpty)
    byCell.foreach { case (cell, hist) =>
      val ord = hist.sortBy(h => (h._4, h._3))
      // each version's valid_to is the next version's valid_from; only the
      // last interval is open
      ord.zip(ord.tail).foreach { case (prev, next) =>
        assert(prev._5.contains(next._4), s"$cell: broken chain")
      }
      assert(ord.last._5.isEmpty, s"$cell: last interval must be open")
      assert(ord.init.forall(!_._6), s"$cell: closed interval marked current")
    }
    // cells marked current are exactly the LWW live view
    val cur = rows.filter(_._6).map(r => (r._1, r._2, r._3)).toSet
    val lww = graft.operators.KvOps.lwwView(
        graft.model.KvModel.changeLog(spark, d))
      .select("id", "key", "event_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(cur === lww)
  }

  test("embed_covariance: gram cells match a brute accumulation") {
    val vecs = Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(_.getSeq[Float](1).toArray.map(x => math.rint(x.toDouble * 1e6).toLong))
    val got = SparkEntry.queries("embed_covariance")(spark, d).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getAs[Long]("n"), r.getAs[Long]("sxx")))
      .toMap
    assert(got.size === 64 * 65 / 2)
    for (i <- 0 until 64; j <- i until 64) {
      val sxx = vecs.map(v => v(i) * v(j)).sum
      assert(got((i, j)) === ((vecs.length.toLong, sxx)), s"cell ($i,$j)")
    }
  }

  test("embed_pca_power: integer iterate aligns with a double-precision power iteration") {
    val vecs = Tables.embeddings(spark, d)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val n = 64
    val g = Array.tabulate(n, n)((i, j) => vecs.map(v => v(i) * v(j)).sum)
    // the SAME two max-abs-normalized iterations in double precision:
    // the gate pins the integer ARITHMETIC, so parity at equal iteration
    // count is the claim (convergence to the true axis needs many more
    // rounds on a near-isotropic random spectrum)
    var v = Array.fill(n)(1.0)
    for (_ <- 1 to 2) {
      val w = Array.tabulate(n)(i => (0 until n).map(j => g(i)(j) * v(j)).sum)
      val mx = w.map(math.abs).max
      v = w.map(_ / mx)
    }
    val got = SparkEntry.queries("embed_pca_power")(spark, d).collect()
      .map(r => r.getInt(0) -> r.getAs[Long]("v_micros")).toMap
    val u = Array.tabulate(n)(i => got(i).toDouble)
    val cos = (0 until n).map(i => u(i) * v(i)).sum /
      (math.sqrt(u.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum))
    assert(cos > 0.999, s"cos=$cos")
    // and power iteration did its job: the iterate's Rayleigh quotient
    // strictly improves over the start vector's
    def rayleigh(x: Array[Double]): Double = {
      val gx = Array.tabulate(n)(i => (0 until n).map(j => g(i)(j) * x(j)).sum)
      (0 until n).map(i => x(i) * gx(i)).sum / (0 until n).map(i => x(i) * x(i)).sum
    }
    assert(rayleigh(u) > rayleigh(Array.fill(n)(1.0)))
  }

  test("ts_nearest_join: each probe picks the true nearest ref, ties to before") {
    val rows = Tables.events(spark, d)
      .select(col("user_id"), unix_millis(col("ts").cast("timestamp")).as("t"),
        col("event_type"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val refs = rows.filter(_._3 == "error").groupBy(_._1)
    val want = rows.filter(_._3 == "purchase").flatMap { case (u, t, _, eid) =>
      refs.get(u).map { rs =>
        val best = rs.minBy { case (_, rt, _, rid) =>
          (math.abs(rt - t), rt > t, -rid)
        }
        (u, t, eid) -> (best._2, best._4, math.abs(best._2 - t))
      }
    }.toMap
    val got = SparkEntry.queries("ts_nearest_join")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getAs[Long]("near_t"), r.getAs[Long]("near_event_id"),
          r.getAs[Long]("dist_ms"))).toMap
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("graph_fof: degree and distance-2 counts match brute adjacency sets") {
    val rows = Tables.events(spark, d)
      .select(col("user_id"), col("event_type"),
        (unix_millis(col("ts").cast("timestamp")) / 300000L).cast("long").as("m"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).distinct
    val edges = (for {
      (u1, et1, m1) <- rows; (u2, et2, m2) <- rows
      if et1 == et2 && m1 == m2 && u1 < u2
    } yield (u1, u2)).distinct
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set())
    edges.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val got = SparkEntry.queries("graph_fof")(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("deg"), r.getAs[Long]("n_fof"))).toMap
    assert(got.keySet === adj.keySet.toSet)
    adj.foreach { case (u, nb) =>
      val fof = nb.flatMap(adj) - u -- nb
      assert(got(u) === ((nb.size.toLong, fof.size.toLong)), s"node $u")
    }
  }

  test("graph_modularity: q_terms recompute from brute partition counts, Q in [-1,1]") {
    val rows = Tables.events(spark, d)
      .select(col("user_id"), col("event_type"),
        (unix_millis(col("ts").cast("timestamp")) / 300000L).cast("long").as("m"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).distinct
    val edges = (for {
      (u1, et1, m1) <- rows; (u2, et2, m2) <- rows
      if et1 == et2 && m1 == m2 && u1 < u2
    } yield (u1, u2)).distinct
    val m2 = edges.length.toLong
    val got = SparkEntry.queries("graph_modularity")(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("e_in"), r.getAs[Long]("d_sum"),
        r.getAs[Long]("q_term"))).toMap
    for (c <- 0L until 8L) {
      val ein = edges.count { case (a, b) => a % 8 == c && b % 8 == c }.toLong
      val dsum = edges.flatMap(e => Seq(e._1, e._2)).count(_ % 8 == c).toLong
      if (ein > 0 || dsum > 0)
        assert(got(c) === ((ein, dsum, 4 * m2 * ein - dsum * dsum)), s"community $c")
    }
    val q = got.values.map(_._3).sum.toDouble / (4.0 * m2 * m2)
    assert(q >= -1.0 && q <= 1.0)
  }

  test("events_ab_srm: variant counts and chi2 match a brute assignment") {
    val users = Tables.events(spark, d).select("user_id").collect()
      .map(_.getLong(0))
    val byV = users.distinct.groupBy(u => if (u * 2654435761L % 1000 < 500) "A" else "B")
      .map { case (v, g) => v -> g.size.toLong }
    val tu = byV.values.sum.toDouble
    val got = SparkEntry.queries("events_ab_srm")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_users"), r.getAs[Double]("chi2_users")))
      .toMap
    assert(got.keySet === byV.keySet)
    byV.foreach { case (v, n) =>
      assert(got(v)._1 === n)
      val chi = (n - tu / 2.0) * (n - tu / 2.0) / (tu / 2.0)
      assert(math.abs(got(v)._2 - chi) < 1e-5)
    }
  }

  test("ts_forecast_eval: seasonal-naive and naive MAE match a brute backtest") {
    val hourly = graft.model.TsModel.ts(spark, d)
      .select(col("series_id"), expr("t div 3600000").as("h"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy("series_id", "h").agg(sum("c").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = hourly.keys.groupBy(_._1).map { case (sid, _) =>
      val scored = hourly.collect {
        case ((s2, h), v) if s2 == sid &&
          hourly.contains((sid, h - 1)) && hourly.contains((sid, h - 24)) =>
          (math.abs(v - hourly((sid, h - 1))), math.abs(v - hourly((sid, h - 24))))
      }
      sid -> (scored.size.toLong, scored.map(_._1).sum, scored.map(_._2).sum)
    }
    val got = SparkEntry.queries("ts_forecast_eval")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"),
        r.getAs[Long]("mae_naive_cents"), r.getAs[Long]("mae_seasonal_cents"))).toMap
    assert(want.values.exists(_._1 > 0))
    assert(got === want.filter(_._2._1 > 0))
  }

  test("ts_gap_stats: gap census matches a per-series sorted fold") {
    val rows = graft.model.TsModel.ts(spark, d)
      .select("series_id", "t", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).map { case (sid, g) =>
      val ts = g.sortBy(r => (r._2, r._3)).map(_._2)
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      sid -> (gaps.length.toLong, gaps.count(_ > 300000L).toLong,
        gaps.max, gaps.filter(_ > 300000L).sum)
    }
    val got = SparkEntry.queries("ts_gap_stats")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_intervals"),
        r.getAs[Long]("n_gaps"), r.getAs[Long]("max_gap_ms"),
        r.getAs[Long]("gap_ms_total"))).toMap
    assert(got === want)
  }

  test("sample_domain_cap: bounded heap equals per-source sort-take") {
    val docs = Tables.documents(spark, d)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = docs.groupBy(_._1).toSeq.flatMap { case (src, g) =>
      g.sortBy(x => (-x._3, x._2)).take(10).map(x => (src, x._2, x._3))
    }.toSet
    val got = SparkEntry.queries("sample_domain_cap")(spark, d).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_chars"))).toSet
    assert(got === want)
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusAnalysis, KmvSketch, Sessionize}

class Round8OpsSpec extends AnyFunSuite with SparkTestBase {

  test("kmv sketch: exactly the k smallest hashes per group, model-replayed") {
    val s = spark
    import s.implicits._
    val rows = (0L until 200L).map(i => ("g" + (i % 2), i))
    val df = rows.toDF("g", "key")
    val sk = KmvSketch.sketch(df, "g", col("key"), k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val model = rows.groupBy(_._1).toSeq.flatMap { case (g, es) =>
      es.map { case (_, k) => (k * 2654435761L + 40503L) % 2147483647L }
        .distinct.sorted.take(10).map((g, _))
    }.toSet
    assert(sk.toSet === model)
    assert(sk.length === 20)
  }

  test("kmv pairOverlap degenerates to the exact jaccard when sets fit in k") {
    val s = spark
    import s.implicits._
    // |A|=8, |B|=8, |A∩B|=4 — both far below k=64, so the union sample IS
    // the union and the estimate must be exactly 4/12
    val a = (0L until 8L).map(("a", _))
    val b = (4L until 12L).map(("b", _))
    val df = (a ++ b).toDF("g", "key")
    val sk = KmvSketch.sketch(df, "g", col("key"), k = 64)
    val est = KmvSketch.pairOverlap(sk, "g", k = 64).collect()
    assert(est.length === 1)
    val r = est.head
    assert(r.getAs[String]("ga") === "a" && r.getAs[String]("gb") === "b")
    assert(r.getAs[Long]("k_eff") === 12L)
    assert(r.getAs[Long]("kmv_both") === 4L)
    assert(r.getAs[Double]("kmv_jaccard") === math.rint(4.0 / 12.0 * 1e6) / 1e6)
    val exact = KmvSketch.exactOverlap(df, "g", col("key")).collect().head
    assert(exact.getAs[Long]("exact_inter") === 4L)
    assert(exact.getAs[Double]("exact_jaccard") === r.getAs[Double]("kmv_jaccard"))
  }

  test("rankBucketed equals the global row_number window, ties and all") {
    val s = spark
    import s.implicits._
    // metric with heavy ties across bucket boundaries; bucket = metric div 10
    val rows = (0L until 500L).map(i => (i, (i * 7919L) % 40L))
    val df = rows.toDF("id", "metric")
    val got = Sessionize.rankBucketed(df, col("metric"), col("id"),
        expr("metric div 10"), "r")
      .select("id", "r").as[(Long, Long)].collect().toMap
    val w = Window.orderBy(col("metric").asc, col("id").asc)
    val want = df.withColumn("r", row_number().over(w).cast("long"))
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("linearScore: all-integer scores, vocab misses score 0 and stay present") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "alpha beta beta"), (1L, "alpha gamma"),
      (2L, "zzz-not-in-top"), (3L, "solo")).toDF("doc_id", "text")
    // vocabSize 4 keeps alpha(2), beta(2), gamma(1), solo(1) — c desc then
    // tok asc ranks them 1..4; zzz-not-in-top falls outside
    val out = CorpusAnalysis.linearScore(docs, vocabSize = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    def wt(rank: Long) = ((rank * 2654435761L) % 2001L) - 1000L
    val (wa, wb, wg, ws) = (wt(1), wt(2), wt(3), wt(4))
    assert(out(0L) === ((3L, wa + 2 * wb, wa + 2 * wb > 0)))
    assert(out(1L) === ((2L, wa + wg, wa + wg > 0)))
    assert(out(2L) === ((0L, 0L, false)))
    assert(out(3L) === ((1L, ws, ws > 0)))
  }

  test("importanceWeights: target-only tokens score positive, off-target negative") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "med med med", true), (1L, "med spam", true),
      (2L, "spam spam spam", false), (3L, "spam junk", false))
      .toDF("doc_id", "text", "t")
    val out = CorpusAnalysis.importanceWeights(docs, col("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(0L) > 0, "pure target-domain doc must score positive")
    assert(out(2L) < 0, "pure off-target doc must score negative")
    assert(out(0L) > out(1L), "mixing in an off-target token lowers the score")
  }

  test("domainMixture weights sum to 1 and favor (sublinearly) bigger domains") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "a b c d e f g h", "big"), (1L, "a b c d e f g h", "big"),
      (2L, "a b", "small")).toDF("doc_id", "text", "source")
    val out = CorpusAnalysis.domainMixture(docs, "source").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-6)
    // sqrt temperature: big has 8x the tokens but < 8x the weight
    val ratio = out("big")._2 / out("small")._2
    assert(ratio > 1.0 && ratio < 8.0)
    assert(math.abs(ratio - math.sqrt(8.0)) < 0.01)
  }

  test("kmv sketches are mergeable: k-min of unioned sketches = sketch of union") {
    val s = spark
    import s.implicits._
    val a = (0L until 300L).map(("x", _))
    val b = (150L until 450L).map(("y", _))
    val df = (a ++ b).toDF("g", "key")
    val k = 32
    // sketch each group, merge the two sketches, take the k smallest of
    // the merged DISTINCT hashes — must equal sketching the union directly
    val perGroup = KmvSketch.sketch(df, "g", col("key"), k)
    val mergedTopK = perGroup.select(col("h")).distinct()
      .orderBy(col("h").asc).limit(k).as[Long].collect().toSet
    val unionDirect = KmvSketch.sketch(
      df.select(lit("u").as("g"), col("key")), "g", col("key"), k)
      .select(col("h")).as[Long].collect().toSet
    assert(mergedTopK === unionDirect)
  }

  test("graph_pagerank matches an independent Scala integer-micros model") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("graph_pagerank")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent model: edges from a plain Spark lag window (not the
    // bucketed carry), iterations folded in Scala
    val ev = Tables.events(spark, d)
    val base = ev.select(col("user_id"),
      graft.model.TimeCols.millis(ev, "ts").as("t"), col("event_id"),
      col("event_type"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("t"), col("event_id"))
    val edges = base.withColumn("src", lag(col("event_type"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nodes = got.keySet
    val wout = edges.groupBy(_._1._1).map { case (u, es) => u -> es.values.sum }
    var r = nodes.map(_ -> 200000L).toMap
    for (_ <- 1 to 3) {
      val sc = nodes.map { v =>
        v -> edges.collect { case ((u, `v`), c) => c * r(u) / wout(u) }.sum
      }.toMap
      r = nodes.map(v => v -> (30000L + 850000L * sc(v) / 1000000L)).toMap
    }
    assert(got === r)
    // total mass stays near 1.0 (floor divisions only ever lose micros)
    assert(got.values.sum <= 1000000L && got.values.sum > 950000L)
  }

  test("ts_sax: z-scores and symbols replay from exact cents sums on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("ts_sax")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getString(5))).toMap
    val src = graft.model.TsModel.ts(spark, d)
      .select("series_id", "t", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), math.rint(r.getDouble(2) * 100).toLong))
    val bySeries = src.groupBy(_._1)
    val model = bySeries.toSeq.flatMap { case (sid, rows) =>
      val n = rows.length.toLong
      val sct = rows.map(_._3).sum
      val qct = rows.map(x => x._3 * x._3).sum
      val mu = sct.toDouble / (n * 100.0)
      val sigma = math.sqrt((qct.toDouble / 10000.0 - n * mu * mu) / n)
      rows.groupBy(_._2 / 3600000L).map { case (bk, es) =>
        val nb = es.length.toLong
        val sb = es.map(_._3).sum
        val z = (sb.toDouble / (nb * 100.0) - mu) / sigma
        val sym = if (z < -0.6745) "a" else if (z < 0.0) "b"
                  else if (z < 0.6745) "c" else "d"
        (sid, bk) -> (nb, sb, math.rint(z * 1e6) / 1e6, sym)
      }
    }.toMap
    assert(got === model)
    assert(got.values.map(_._4).toSet.size > 1, "alphabet must actually vary")
  }

  test("ts_rate: wrap-reset counter model replayed per series on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("ts_rate")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val src = graft.model.TsModel.ts(spark, d)
      .select("series_id", "t", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val model = src.groupBy(_._1).toSeq.flatMap { case (sid, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      var cum = 0L
      var prev = Option.empty[Long]
      val perRow = ordered.map { case (_, t, _, v) =>
        cum += math.rint(v * 100).toLong
        val ctr = cum % 1000000L
        val d0 = prev match {
          case None               => 0L
          case Some(p) if ctr >= p => ctr - p
          case Some(_)            => ctr
        }
        prev = Some(ctr)
        (t / 3600000L, d0)
      }
      perRow.groupBy(_._1).map { case (h, ds) =>
        (sid, h) -> ds.map(_._2).sum
      }
    }.toMap
    assert(got.keySet === model.keySet)
    got.foreach { case (k, (inc, rate)) =>
      assert(inc === model(k), s"inc_cents mismatch at $k")
      assert(rate === math.rint(inc / 360000.0 * 1e6) / 1e6)
    }
    // the modular wrap must actually fire at this SF or the reset branch
    // is untested
    assert(got.values.map(_._1).sum !=
      src.map(r => math.rint(r._4 * 100).toLong).sum, "no counter reset occurred")
  }

  test("ts_heatmap cells partition the table: counts and cents sums reconcile") {
    val d = "/root/testdata/sf0.001"
    val cells = SparkEntry.queries("ts_heatmap")(spark, d).collect()
    val total = graft.model.TsModel.ts(spark, d).count()
    assert(cells.map(_.getLong(3)).sum === total, "cell counts must cover every row")
    cells.foreach { r =>
      val (hod, band) = (r.getLong(1), r.getLong(2))
      assert(hod >= 0 && hod < 24 && band >= 0)
    }
    assert(cells.map(r => (r.getLong(1), r.getLong(2))).distinct.length > 24,
      "value bands must actually split hours")
  }

  test("text_novelty: first doc is fully novel, totals reconcile with the vocab") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("text_novelty")(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val (n0, nov0, f0) = rows(rows.keySet.min)
    assert(n0 === nov0 && f0 === 1.0, "the earliest doc introduces all its tokens")
    // every token's occurrences inside its first-carrier doc are novel, so
    // Σ n_novel = Σ occurrences of each token within its first doc —
    // recompute independently
    val toks = Tables.documents(spark, d)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val firstDoc = toks.groupBy(_._2).map { case (tok, es) => tok -> es.map(_._1).min }
    val wantNovel = toks.count { case (doc, tok) => firstDoc(tok) == doc }
    assert(rows.values.map(_._2).sum === wantNovel)
  }

  test("ann_recall: recall is n_hit/k with 0 <= n_hit <= k = 5") {
    val rows = SparkEntry.queries("ann_recall")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (k, hit, rec) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(k === 5L)
      assert(hit >= 0L && hit <= k)
      assert(rec === math.rint(hit.toDouble / k * 1e6) / 1e6)
    }
  }

  test("events_ab_ttest matches Spark's own stddev_samp-based Welch t") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("events_ab_ttest")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(7)).toMap
    val ev = Tables.events(spark, d)
    val base = ev.select(
      (graft.model.TimeCols.millis(ev, "ts") / 86400000L).cast("long").as("day"),
      col("event_type"), col("value"))
    def sideStats(tp: String) = base.filter(col("event_type") === tp)
      .groupBy("day")
      .agg(count(lit(1)).as("n"), avg("value").as("m"),
        var_samp("value").as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val p = sideStats("purchase"); val w = sideStats("view")
    got.foreach { case (day, t) =>
      val (n1, m1, v1) = p(day); val (n2, m2, v2) = w(day)
      val want = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
      assert(math.abs(t - want) < 1e-6, s"day $day: $t vs $want")
    }
    assert(got.nonEmpty)
  }

  test("kv_expire drops LWW winners written before the horizon, keeps the rest") {
    val d = "/root/testdata/sf0.001"
    val lww = SparkEntry.queries("kv_lww")(spark, d)
      .select("id", "key", "write_ts").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val kept = SparkEntry.queries("kv_expire")(spark, d)
      .select("id", "key", "write_ts").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val horizon = 1706572800000L
    assert(kept === lww.filter { case (_, ts) => ts >= horizon })
    assert(kept.size < lww.size, "fixture must actually expire something")
    // the TTL horizon must reach the parquet scan (filter-then-LWW is
    // equivalent because the winner is max(write_ts)); losing this
    // pushdown means reading the full history instead of the horizon
    val plan = SparkEntry.queries("kv_expire")(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"TTL bound not in PushedFilters:\n$plan")
  }

  test("ts_rollup_cascade merges exactly: cascade == direct daily aggregate") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("ts_rollup_cascade")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val t = graft.model.TsModel.ts(spark, d)
    val direct = t.select(col("series_id"), expr("t div 86400000").as("day"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy("series_id", "day")
      .agg(count(lit(1)).as("n"), sum("c").as("s"), min("c").as("mn"), max("c").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got === direct)
  }

  test("user_sliding_dau: window count >= any member day, <= union of the 3 days") {
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
    val daily = ev.select(col("user_id"),
        (graft.model.TimeCols.millis(ev, "ts") / 86400000L).cast("long").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = daily.groupBy(_._2).map { case (day, es) => day -> es.map(_._1).toSet }
    val got = SparkEntry.queries("user_sliding_dau")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (winEnd, n) =>
      val days = (winEnd - 2 to winEnd).flatMap(byDay.get)
      assert(n === days.foldLeft(Set.empty[Long])(_ ++ _).size.toLong,
        s"window ending $winEnd")
    }
    assert(got.nonEmpty)
  }

  test("dedup_lsh_recall: measured recall is monotone and tracks the S-curve") {
    val rows = SparkEntry.queries("dedup_lsh_recall")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.length >= 8, "the corpus must populate most jaccard deciles")
    // recall rises with jaccard (allowing exact ties at the saturated top)
    rows.sliding(2).foreach { case Array((_, _, r1, _), (d2, _, r2, _)) =>
      assert(r2 >= r1 - 1e-9, s"recall not monotone at decile $d2")
    }
    // where a decile has enough pairs for the empirical rate to settle,
    // it must track the banding theory
    rows.filter(_._2 >= 1000).foreach { case (d, _, rec, th) =>
      assert(math.abs(rec - th) < 0.08, s"decile $d: measured $rec vs theory $th")
    }
    assert(rows.last._3 === 1.0, "near-identical pairs must always be caught")
  }

  test("user_funnel_windowed: window only tightens the plain funnel") {
    val d = "/root/testdata/sf0.001"
    val plain = SparkEntry.queries("user_funnel")(spark, d).collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    val win = SparkEntry.queries("user_funnel_windowed")(spark, d).collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4))).toMap
    assert(win.keySet === plain.keySet)
    win.foreach { case (u, (ck, pk, depth)) =>
      assert(depth === 1L + ck.size + pk.size)
      assert(pk.isEmpty || ck.nonEmpty, "purchase stage requires the click stage")
      // a windowed stage, when reached, can only start at or after the
      // unconstrained stage's time (the window filters candidates)
      (ck, plain(u)._1) match {
        case (Some(w), Some(p)) => assert(w >= p)
        case (Some(_), None)    => fail(s"user $u: windowed click without plain click")
        case _                  => ()
      }
    }
    val tightened = win.count { case (u, (ck, _, _)) => ck.isEmpty && plain(u)._1.nonEmpty }
    assert(tightened > 0, "the 2h window must actually exclude some conversions")
  }

  test("user_rfm quintile arithmetic matches ntile(5) replayed in Spark SQL") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("user_rfm")(spark, d)
      .select("user_id", "r_score", "f_score", "m_score")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ev = Tables.events(spark, d)
    val ua = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"),
        graft.model.TimeCols.millis(ev, "ts").as("t"), col("value"))
      .groupBy("user_id")
      .agg(max("t").as("r_t"), count(lit(1)).as("f"),
        sum(round(col("value") * 100).cast("long")).as("m_cents"))
    val want = ua
      .withColumn("r_score", ntile(5).over(Window.orderBy(col("r_t"), col("user_id"))).cast("long"))
      .withColumn("f_score", ntile(5).over(Window.orderBy(col("f"), col("user_id"))).cast("long"))
      .withColumn("m_score", ntile(5).over(Window.orderBy(col("m_cents"), col("user_id"))).cast("long"))
      .select("user_id", "r_score", "f_score", "m_score")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === want)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Lttb

class Round7OpsSpec extends AnyFunSuite with SparkTestBase {

  test("m4: per-bucket min/max/first/last match a per-group model, ties by event_id") {
    val s = spark
    import s.implicits._
    // bucket width 10: rows at t 0-9 -> bucket 0, 10-19 -> bucket 1.
    // Bucket 0 of series a has a t-tie at 0 (event_id decides first)
    // and its max in the middle; bucket 1 is a single row.
    val rows = Seq(
      ("a", 0L, 5.0, 2L), ("a", 0L, 3.0, 1L), ("a", 4L, 9.0, 3L),
      ("a", 9L, -1.0, 4L), ("a", 13L, 7.0, 5L),
      ("b", 2L, 2.0, 6L), ("b", 8L, 1.0, 7L))
    val df = rows.toDF("series_id", "t", "value", "event_id")
    val out = Lttb.m4(df, spanMs = 10L).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
         r.getDouble(6), r.getDouble(7))).toMap
    // model: group rows by (series, t div 10) and fold explicitly
    val model = rows.groupBy { case (sid, t, _, _) => (sid, t / 10) }
      .map { case ((sid, b), es) =>
        val sorted = es.sortBy { case (_, t, _, id) => (t, id) }
        (sid, b) -> (b * 10, es.size.toLong, es.map(_._3).min, es.map(_._3).max,
          sorted.head._3, sorted.last._3)
      }
    assert(out === model)
    assert(out(("a", 0L)) === ((0L, 4L, -1.0, 9.0, 3.0, -1.0)))
    assert(out(("a", 1L)) === ((10L, 1L, 7.0, 7.0, 7.0, 7.0)))
  }

  test("count-min: estimate never undercounts, and is exact when no collision") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("agg_count_min")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS undercounted user ${r.getLong(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
  }

  test("ts_crossings: matches a per-series scala model on the fixture") {
    val s = spark
    import s.implicits._
    val src = graft.model.TsModel.ts(s, "/root/testdata/sf0.001")
      .select("series_id", "t", "value", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val model = src.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._4))
      sorted.zip(sorted.drop(1)).collect {
        case (p, c) if p._3 < 50.0 && c._3 >= 50.0 => (c._1, c._2, c._4, p._3, c._3)
      }
    }.toSet
    val out = SparkEntry.queries("ts_crossings")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSet
    assert(out === model)
    assert(out.nonEmpty)
  }

  test("m4: plan is one partial aggregation, no window exec") {
    val s = spark
    import s.implicits._
    val df = (1L to 100L).map(i => ("s", i, i.toDouble, i)).toDF("series_id", "t", "value", "event_id")
    val p = Lttb.m4(df, spanMs = 7L).queryExecution.executedPlan.toString
    assert(!p.contains("WindowExec"), p.take(1200))
    assert(p.contains("partial_min_by") || p.contains("partial_minby") ||
      "HashAggregate.*partial".r.findFirstIn(p).isDefined, p.take(1200))
  }

  test("bloom join: no false negatives, and bloom_hit replays the scala bitmap exactly") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("events_bloom_join")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    // a member's bits are all set by construction — is_member implies bloom_hit
    rows.foreach { case (eid, uid, hit, member) =>
      assert(!member || hit, s"false negative for member user $uid (event $eid)")
    }
    // the filter must actually reject someone, or the gate proves nothing
    assert(rows.exists(r => !r._3), "bloom rejected no one — member set too large?")
    // exact replay: same hashes, same 256-bit bitmap, folded in plain scala
    val members = rows.collect { case (_, uid, _, true) => uid }.toSet
    val hs = Seq((2654435761L, 1L), (2246822519L, 7L), (3266489917L, 13L), (668265263L, 31L))
    def buckets(u: Long) = hs.map { case (a, b) => ((u * a + b) % 2147483647L) % 256L }
    val setBits = members.flatMap(buckets)
    rows.foreach { case (eid, uid, hit, _) =>
      assert(hit === buckets(uid).forall(setBits.contains),
        s"bloom_hit mismatch vs scala model for user $uid (event $eid)")
    }
  }

  test("q2: one row per part, cheapest unit cost, lowest suppkey on ties (scala model)") {
    val d = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q2_min_cost_supplier")(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(4))).toMap
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val parts = spark.read.parquet(s"$d/part.parquet")
      .filter(col("p_size") === 10).select("p_partkey").collect().map(_.getLong(0)).toSet
    def lv(r: org.apache.spark.sql.Row, i: Int) = r.getAs[Number](i).longValue
    val asia = {
      val n = spark.read.parquet(s"$d/nation.parquet").collect()
        .map(r => lv(r, 0) -> lv(r, 2)).toMap
      val rg = spark.read.parquet(s"$d/region.parquet")
        .filter(col("r_name") === "ASIA").collect().map(lv(_, 0)).toSet
      spark.read.parquet(s"$d/supplier.parquet").collect()
        .map(r => (lv(r, 0), lv(r, 2))).collect {
          case (sk, nk) if rg.contains(n(nk)) => sk
        }.toSet
    }
    val model = li.filter(e => parts.contains(e._1) && asia.contains(e._2))
      .groupBy(e => (e._1, e._2)).toSeq
      .map { case ((pk, sk), es) => (pk, sk, es.map(e => e._3 / e._4).min) }
      .groupBy(_._1).map { case (pk, cs) =>
        val mc = cs.map(_._3).min
        pk -> (cs.filter(_._3 == mc).map(_._2).min,
               BigDecimal(mc).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    assert(out === model)
    assert(out.nonEmpty)
  }

  test("q21: agg-rejoin rewrite equals brute-force EXISTS/NOT EXISTS replay") {
    val d = "/root/testdata/sf0.001"
    // collect (order, supplier, late) once; the model then replays the
    // original correlated form literally: a late line survives iff some
    // OTHER supplier has a line on the order and no OTHER supplier is late
    val lo = spark.read.parquet(s"$d/lineitem.parquet")
      .join(spark.read.parquet(s"$d/orders.parquet")
              .filter(col("o_orderstatus") === "F")
              .select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (datediff(col("l_shipdate").cast("date"),
                  col("o_orderdate").cast("date")) > 365).as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byOrder = lo.groupBy(_._1)
    def lv(r: org.apache.spark.sql.Row, i: Int) = r.getAs[Number](i).longValue
    val nk = spark.read.parquet(s"$d/nation.parquet")
      .filter(col("n_name") === "NATION_3").collect().map(lv(_, 0)).toSet
    val nat3 = spark.read.parquet(s"$d/supplier.parquet").collect()
      .collect { case r if nk.contains(lv(r, 2)) =>
        lv(r, 0) -> r.getString(1) }.toMap
    val model = lo.filter(_._3).filter { case (ok, sk, _) =>
      val os = byOrder(ok)
      os.exists(_._2 != sk) && !os.exists(e => e._2 != sk && e._3)
    }.collect { case (_, sk, _) if nat3.contains(sk) => nat3(sk) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val out = SparkEntry.queries("q21_waiting_supplier")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === model)
    assert(out.nonEmpty)
  }

  test("q16: flagged suppliers are excluded from the variety counts (scala model)") {
    val d = "/root/testdata/sf0.001"
    val flagged = spark.read.parquet(s"$d/supplier.parquet")
      .filter(col("s_acctbal") < 0.0).collect().map(_.getLong(0)).toSet
    val pmap = spark.read.parquet(s"$d/part.parquet")
      .filter(col("p_type") =!= "PROMO" && col("p_size").isin(1, 14, 23, 45))
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getInt(4))).toMap
    val model = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .collect { case (pk, sk) if pmap.contains(pk) && !flagged.contains(sk) =>
        (pmap(pk), sk) }
      .groupBy(_._1).map { case (k, es) => k -> es.map(_._2).distinct.size.toLong }
    val out = SparkEntry.queries("q16_supplier_variety")(spark, d).collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    assert(out === model)
    assert(out.nonEmpty)
  }
}

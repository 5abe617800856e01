package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Semantic invariants for the round-4 gates, beyond the DuckDB hash-match:
  * the properties that must hold for ANY input, checked on the sf0.001
  * tables.
  */
class Round4OpsSpec extends AnyFunSuite with SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  test("q13_custdist: bins partition the customer table (outer join keeps zero-order customers)") {
    val dist = SparkEntry.queries("q13_custdist")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nCust = Tables.customer(spark, d).count()
    assert(dist.values.sum === nCust)           // every customer in exactly one bin
  }

  test("q13 shape: a customer with no orders lands in the zero bin, not nowhere") {
    val s = spark
    import s.implicits._
    val cust = Seq((1L, "a"), (2L, "b")).toDF("c_custkey", "c_name")
    val ords = Seq((10L, 1L)).toDF("o_orderkey", "o_custkey")
    val dist = cust.join(ords, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy("n_orders").agg(count(lit(1)).as("custdist"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === Map(0L -> 1L, 1L -> 1L))
  }

  test("q15_top_supplier: every returned supplier holds exactly the max revenue") {
    val rows = SparkEntry.queries("q15_top_supplier")(spark, d).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length === 1, s"mixed revenues in max-only result: ${revs.toSeq}")
  }

  test("q4_priority_exists: semi join never exceeds the order count per priority") {
    val withHeavy = SparkEntry.queries("q4_priority_exists")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = Tables.orders(spark, d).groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    withHeavy.foreach { case (p, n) => assert(n <= all(p), s"$p: $n > ${all(p)}") }
  }

  test("sample_balance: every source downsampled to the same quota, deterministically") {
    val out = SparkEntry.queries("sample_balance")(spark, d)
    val perSource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.values.toSet.size === 1, s"unequal quotas: $perSource")
    val counts = Tables.documents(spark, d).groupBy("source").count()
      .agg(min("count")).head().getLong(0)
    assert(perSource.values.head === math.ceil(0.6 * counts).toLong)
    // re-running selects the identical doc set (hash order, no RNG)
    val a = out.collect().map(_.getLong(0)).toSet
    val b = SparkEntry.queries("sample_balance")(spark, d).collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("text_entropy: 0 for single-token docs, log2(k) for k distinct equal-count tokens") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "hello"), (2L, "a b c d"), (3L, "x x y y"))
      .toDF("doc_id", "text")
    val ent = docs
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(round(log2(sum("c")) - sum(col("c") * log2(col("c"))) / sum("c"), 4).as("entropy"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ent(1L) === 0.0)
    assert(ent(2L) === 2.0)   // 4 distinct uniform tokens
    assert(ent(3L) === 1.0)   // 2 distinct uniform tokens
  }

  test("vocab_topk: at most 50 rows, counts non-increasing, ties broken by token") {
    val rows = SparkEntry.queries("vocab_topk")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val vocab = Tables.documents(spark, d)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .agg(countDistinct("t")).head().getLong(0)
    assert(rows.length === math.min(50L, vocab))
    rows.sliding(2).foreach { case Array((t1, c1), (t2, c2)) =>
      assert(c1 > c2 || (c1 == c2 && t1 < t2), s"order broken at ($t1,$c1) -> ($t2,$c2)")
    }
  }

  test("embed_centroid: one row per label, vector counts partition the corpus") {
    val rows = SparkEntry.queries("embed_centroid")(spark, d).collect()
    val total = Tables.embeddings(spark, d).count()
    assert(rows.map(_.getInt(0)).distinct.length === rows.length)
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach(r => assert(r.getDouble(2) >= 0.0)) // norms non-negative
  }

  test("cluster_assign: cells partition the corpus and each medoid minimizes rounded distance") {
    val emb = Tables.embeddings(spark, d)
    val out = SparkEntry.queries("cluster_assign")(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._2).sum === emb.count())
    // medoid really is the (d, vec_id)-minimal member of its cell
    val centers = Similarity.fitCenters(emb, 16)
    val assigned = Similarity.assignCellsRounded(emb, centers, dp = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val byCell = assigned.groupBy(_._3)
    out.foreach { case (cell, n, medoid) =>
      val members = byCell(cell)
      assert(members.length.toLong === n)
      val best = members.minBy(m => (m._2, m._1))
      assert(best._1 === medoid, s"cell $cell: medoid $medoid vs ${best._1}")
    }
  }

  test("events_sliding: every event lands in exactly 4 overlapping windows") {
    val total = Tables.events(spark, d).count()
    val windowed = SparkEntry.queries("events_sliding")(spark, d)
      .agg(sum("n")).head().getLong(0)
    assert(windowed === 4 * total)
  }

  test("user_path_topk: bounded output, counts non-increasing with path tiebreak") {
    val rows = SparkEntry.queries("user_path_topk")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.sliding(2).foreach { case Array((p1, c1), (p2, c2)) =>
      assert(c1 > c2 || (c1 == c2 && p1 < p2))
    }
    rows.foreach { case (p, _) => assert(p.split(">").length === 3) }
  }

  test("ts_autocorr: r1 in [-1, 1] and pair counts one less than bucket counts") {
    val rows = SparkEntry.queries("ts_autocorr")(spark, d).collect()
    assert(rows.nonEmpty)
    val buckets = graft.model.TsModel.ts(spark, d)
      .select(col("series_id"), expr("t div 3600000").as("b")).distinct()
      .groupBy("series_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val r1 = r.getDouble(1)
      assert(r1 >= -1.0 && r1 <= 1.0, s"${r.getString(0)}: $r1")
      assert(r.getLong(2) === buckets(r.getString(0)) - 1,
        s"${r.getString(0)}: n_pairs ${r.getLong(2)} vs buckets ${buckets(r.getString(0))}")
    }
  }

  test("approx_percentile tracks the exact percentile inside its accuracy bound") {
    // the 100 TB path for ts_percentiles-class queries: fixed-size sketch,
    // single pass — worth a pinned accuracy check against the exact form
    val t = graft.model.TsModel.ts(spark, "/root/testdata/sf0.01")
    val rows = t.groupBy("series_id").agg(
      expr("percentile(value, 0.95)").as("exact"),
      expr("approx_percentile(value, 0.95, 10000)").as("approx"),
      expr("max(value) - min(value)").as("range")).collect()
    rows.foreach { r =>
      val (exact, approx, range) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(exact - approx) <= math.max(range * 0.01, 1e-9),
        s"series ${r.getString(0)}: exact=$exact approx=$approx range=$range")
    }
  }

  test("assignCellsRounded agrees with a driver-side argmin on every vector") {
    val emb = Tables.embeddings(spark, d)
    val centers = Similarity.fitCenters(emb, 4)
    val got = Similarity.assignCellsRounded(emb, centers, dp = 4).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val vecs = emb.select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    vecs.foreach { case (id, v) =>
      val exp = centers.zipWithIndex.map { case (c, i) =>
        val d = v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        (BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, i)
      }.min._2
      assert(got(id) === exp, s"vec $id")
    }
  }
}

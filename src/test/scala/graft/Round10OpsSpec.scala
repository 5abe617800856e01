package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroWinklerImpl

/** Round-10 pins: the Jaro-Winkler ASCII byte fast path is bit-identical
  * to the validated String form, and the iterate-to-fixpoint drivers
  * still converge after the per-round checkpoint release.
  */
class Round10OpsSpec extends AnyFunSuite with SparkTestBase {

  test("jaro-winkler ASCII byte path is bit-identical to the String path") {
    val rnd = new scala.util.Random(421)
    def randAscii(n: Int): String =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    for (_ <- 1 to 500) {
      val a = randAscii(rnd.nextInt(12))
      val b = randAscii(rnd.nextInt(12))
      val fast = JaroWinklerImpl.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(fast === JaroWinklerImpl.sim(a, b), s"diverged on ($a, $b)")
    }
  }

  // ---- composite text-identity key (the anti-collision convention) -------

  test("textKey: planted primary-hash collision never merges distinct texts") {
    val s = spark
    import s.implicits._
    import graft.operators.Dedup
    // primary component FORCED constant = every row "collides" on the
    // 64-bit hash; the length and crc32 components must still separate
    // distinct texts while true duplicates still merge
    val docs = Seq((1L, "aaa"), (2L, "aab"), (3L, "aaa"), (4L, "longer text"))
      .toDF("doc_id", "text")
    val collide: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      _ => lit(0L)
    val groups = docs.groupBy(Dedup.textKey(col("text"), collide).as("k"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("keep"))
      .collect()
    assert(groups.length === 3) // aaa (x2), aab, longer text
    assert(groups.map(_.getLong(1)).sorted.toSeq === Seq(1L, 1L, 2L))
    // same grouping as by the text itself — the property the convention buys
    val byText = docs.groupBy("text").count().count()
    assert(groups.length.toLong === byText)
  }

  test("exact dedup: distinct texts sharing a shuffle partition never merge") {
    val s = spark
    import s.implicits._
    import graft.operators.Dedup
    // 200 distinct texts over 32 shuffle partitions: pigeonhole guarantees
    // many distinct texts co-locate in one hash partition — the
    // within-bucket lag(text) verify must keep them all; planted dup
    // groups must still collapse to their min doc_id
    val rows = (0L until 200L).map(i => (i, s"text body number ${i % 150}"))
    val out = Dedup.exact(rows.toDF("doc_id", "text"))
    assert(out.count() === 150)
    // identical keeper set to the PARTITION BY text form, computed locally
    val expect = rows.groupBy(_._2).map { case (_, g) => g.map(_._1).min }.toSet
    assert(out.collect().map(_.getLong(0)).toSet === expect)
  }

  test("incremental dedup: canonical-form identity, length-armored anti-join") {
    val s = spark
    import s.implicits._
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "the same   text"), // history
      (2L, "another doc"),     // history
      (10L, "The same text"),  // fresh: canonical-equal to 1 -> dropped
      (11L, "a brand new doc") // fresh: kept
    ).toDF("doc_id", "text")
    val out = Dedup.incremental(docs, col("doc_id") < 10L)
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(11L))
  }

  // ---- persisted bucketed graph layout ------------------------------------

  test("stored-layout graph census and link prediction match the built path") {
    val s = spark
    import s.implicits._
    import graft.operators.Graph
    // hub node 0 plus a ring: wedges through hubs and through cold nodes
    val rnd = new scala.util.Random(77)
    val edges = ((1L to 40L).map(i => (0L, i)) ++
      (1L to 39L).map(i => (i, i + 1)) ++
      (0 until 60).map { _ =>
        val a = rnd.nextInt(200).toLong + 50L
        val b = a + 1L + rnd.nextInt(20).toLong
        (a, b)
      }).distinct.toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft-gidx-spec").toString
    val und = edges.select(col("a").as("u"), col("b").as("v"))
      .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
    und.write.mode("overwrite").format("parquet").bucketBy(4, "u").sortBy("u")
      .option("path", s"$dir/by_u").saveAsTable("graft_spec_gidx_byu")
    und.write.mode("overwrite").format("parquet").bucketBy(4, "v").sortBy("v")
      .option("path", s"$dir/by_v").saveAsTable("graft_spec_gidx_byv")
    try {
      val byU = s.table("graft_spec_gidx_byu")
      val byV = s.table("graft_spec_gidx_byv")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
      assert(rows(Graph.fofCensusStored(byV, byU, edges)) ===
        rows(Graph.fofCensus(edges)))
      assert(rows(Graph.commonNeighborsStored(byV, byU, edges)) ===
        rows(Graph.commonNeighbors(edges)))
      // the triangle family on its stored oriented layout
      Graph.orientEdges(edges)
        .write.mode("overwrite").format("parquet").bucketBy(4, "u").sortBy("u")
        .option("path", s"$dir/tri").saveAsTable("graft_spec_gidx_tri")
      assert(rows(Graph.trianglesStored(s.table("graft_spec_gidx_tri"))) ===
        rows(Graph.triangles(edges)))
    } finally {
      s.sql("DROP TABLE IF EXISTS graft_spec_gidx_byu")
      s.sql("DROP TABLE IF EXISTS graft_spec_gidx_byv")
      s.sql("DROP TABLE IF EXISTS graft_spec_gidx_tri")
    }
  }

  test("pagerank shuffle-join regime equals the broadcast fast path") {
    val s = spark
    import s.implicits._
    import graft.operators.Graph
    val edges = Seq(("a", "b", 3L), ("b", "c", 2L), ("c", "a", 1L),
      ("a", "c", 1L), ("c", "b", 4L)).toDF("src", "dst", "c")
    def run(limit: Long) =
      Graph.pagerank(edges, maxIters = 3, tolMicros = 0L,
          broadcastNodeLimit = limit)
        .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    // limit 0 forces the shuffle regime even on 3 nodes; the arithmetic
    // (and therefore the fixpoint) must be identical to the broadcast path
    assert(run(0L) === run(Long.MaxValue))
  }

  // ---- BPE merge-loop trainer ---------------------------------------------

  /** Plain-Scala reference BPE: word counts, per-round pair counts with
    * (n desc, pair asc) tie-break, left-to-right non-overlapping merge.
    */
  private def bpeReference(texts: Seq[String], k: Int): Seq[(Int, String, String, Long)] = {
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) =>
        w.map(_.toString).toVector -> g.size.toLong
      }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (rank <- 1 to k) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.nonEmpty) {
        val ((l, r), n) = counts.toSeq.minBy { case ((a, b), m) => (-m, a, b) }
        out += ((rank, l, r, n))
        words = words.groupMapReduce { case (syms, _) =>
          val acc = scala.collection.mutable.ArrayBuffer[String]()
          for (s <- syms)
            if (acc.nonEmpty && acc.last == l && s == r)
              acc(acc.length - 1) = l + r
            else acc += s
          acc.toVector
        } { case (_, c) => c } (_ + _)
      }
    }
    out.toSeq
  }

  test("bpeTrain matches the independent Scala model, merges build on merges") {
    val s = spark
    import s.implicits._
    import graft.operators.CorpusModel
    val texts = Seq(
      "low low low low low", "lower lower newest newest",
      "newest newest newest newest", "wider wider wider new new",
      "the lowest newest widest", "aaa aaa baaab")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = CorpusModel.bpeTrain(docs, merges = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val want = bpeReference(texts, 10)
    assert(got === want)
    // the overlap rule: "aaa" under a first (a,a) merge must segment
    // left-to-right non-overlapping — the reference model enforces it, so
    // equality above pins it; sanity-check a later merge reuses an earlier
    // merge's symbol (multi-round dependency, not 10 independent bigrams)
    val syms = got.map { case (_, l, r, _) => l + r }
    assert(got.exists { case (_, l, r, _) =>
      syms.contains(l) || syms.contains(r) },
      s"no merge built on a prior merge in $got")
  }

  test("bpeTrain suffix-collision: a merged symbol's suffix never fakes adjacency") {
    val s = spark
    import s.implicits._
    import graft.operators.CorpusModel
    // engineered so merge 1 = (a,b) (count 13) and merge 2 = (b,c)
    // (count 5, tie with (x,b) broken lft-asc). After merge 1 the word
    // "abc" is ["ab","c"]: a substring-matched replace of "b<SEP>c" would
    // corrupt it to the single symbol "abc" though (b,c) was never
    // adjacent — the boundary-anchored encoding must leave it ["ab","c"],
    // keeping the (ab,c) pair alive for merge 4 (the ADVICE r10 defect)
    val texts = Seq(
      "ab ab ab ab ab ab ab ab ab ab",
      "abc abc abc",
      "xbc xbc xbc xbc xbc")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = CorpusModel.bpeTrain(docs, merges = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === bpeReference(texts, 4))
    assert(got.take(2) === Seq((1, "a", "b", 13L), (2, "b", "c", 5L)))
    // the buggy replace had no 4th merge: "abc" collapsed to one symbol
    assert(got.map(_._1).contains(4), s"merge chain ended early: $got")
    // and apply-side: "abc" under merges [(a,b),(b,c)] is 2 symbols, not 1
    val n = CorpusModel.bpeSegmentStats(
        Seq((0L, "abc")).toDF("doc_id", "text"),
        Seq(("a", "b"), ("b", "c")))
      .head().getLong(1)
    assert(n === 2L, s"apply-side suffix collision: n_symbols = $n")
  }

  test("bpeSegmentStats: segmentation shrinks monotonically with more merges") {
    val s = spark
    import s.implicits._
    import graft.operators.CorpusModel
    val texts = Seq("low lower lowest", "new newer newest", "wide wider widest")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = CorpusModel.bpeTrain(docs, merges = 6)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    def total(k: Int) = CorpusModel.bpeSegmentStats(docs, merges.take(k))
      .agg(sum("n_symbols")).head().getLong(0)
    val totals = (0 to 6).map(total)
    assert(totals === totals.sorted.reverse, s"not monotone: $totals")
    assert(totals.last < totals.head)
  }

  test("lloydConverged reaches an exact fixpoint of lloydRefine") {
    val s = spark
    import s.implicits._
    import graft.operators.Similarity
    // three well-separated clusters in 4 dims: convergence is certain and
    // the exact-integer center updates make the fixpoint bit-stable
    val rnd = new scala.util.Random(99)
    val emb = (0 until 60).map { i =>
      val c = i % 3
      val base = Array(c * 10.0, c * -5.0, 3.0 - c * 4.0, c.toDouble)
      (i.toLong, base.map(v => (v + rnd.nextInt(100) / 1000.0).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val c0 = Similarity.fitCenters(emb, 3)
    val (cf, iters) = Similarity.lloydConverged(emb, c0, maxIters = 30,
      tolMicros = 0L)
    assert(iters < 30, s"did not converge: $iters")
    // fixpoint: one more distributed refine moves nothing (exact equality
    // — the integer-micros update leaves no float drift to hide behind)
    assert(Similarity.lloydRefine(emb, cf, 1).flatten.toSeq === cf.flatten.toSeq)
    // the bounded unroll at the convergence count is the same operator
    assert(Similarity.lloydRefine(emb, c0, iters).flatten.toSeq === cf.flatten.toSeq)
  }

  test("jaro-winkler multi-byte operands fall back to the String path") {
    // é is 2 UTF-8 bytes, 中 is 3: byte indexing would misalign — the
    // dispatch must route any non-ASCII operand to the char-based form
    for ((a, b) <- Seq(("café", "cafe"), ("中文本", "中本文"),
        ("naïve", "naive"), ("é", ""))) {
      val got = JaroWinklerImpl.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got === JaroWinklerImpl.sim(a, b), s"diverged on ($a, $b)")
    }
  }
}

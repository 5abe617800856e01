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
    } finally {
      s.sql("DROP TABLE IF EXISTS graft_spec_gidx_byu")
      s.sql("DROP TABLE IF EXISTS graft_spec_gidx_byv")
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

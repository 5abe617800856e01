package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

class PackingSpec extends AnyFunSuite with SparkTestBase {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq.tabulate(200)(i => (i.toLong, Seq.fill(1 + (i * 7) % 90)("w").mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("contiguous packing: bins fill to the budget, order pinned, straddle opens next bin") {
    val packed = Packing.contiguousPack(docs, budgetTokens = 100L,
      tokensCol = graft.functions.TextFunctions.tokenCount(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // bin ids are non-decreasing in doc order and start at 0
    assert(packed.head._3 === 0L)
    assert(packed.sliding(2).forall(p => p(0)._3 <= p(1)._3))
    // exact semantic pin: bin = floor(running-tokens-before / budget),
    // recomputed sequentially on the driver
    var cum = 0L
    packed.foreach { case (id, nt, bin) =>
      assert(bin === cum / 100L, s"doc $id: bin $bin != ${cum / 100L}")
      cum += nt
    }
    // a bin's assigned docs never span more than budget + one straddling
    // document's overhang
    val byBin = packed.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val maxDoc = packed.map(_._2).max
    assert(byBin.values.forall(_ <= 100L + maxDoc))
  }

  test("per-shard packing parallelizes: bin ids restart per partition key") {
    val sharded = docs.withColumn("shard", col("doc_id") % 4)
    val packed = Packing.contiguousPack(sharded, budgetTokens = 100L,
      tokensCol = graft.functions.TextFunctions.tokenCount(col("text")),
      partitionCols = Seq("shard"))
    assert(packed.filter(col("bin") === 0).select("shard").distinct().count() === 4)
  }

  test("bucketed pack == global pack: sparse ids, tiny buckets, with and without shards") {
    // sparse non-contiguous ids so bucket boundaries fall on gaps and some
    // buckets go empty — the offset axis must skip them without drift
    val sparse = docs.withColumn("doc_id", col("doc_id") * 37 + 5)
    val tok = graft.functions.TextFunctions.tokenCount(col("text"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toString).toSeq
    assert(rows(Packing.contiguousPackBucketed(sparse, 100L, tok, bucketSize = 256L))
      === rows(Packing.contiguousPack(sparse, 100L, tok)))
    val sharded = sparse.withColumn("shard", col("doc_id") % 3)
    def rowsSh(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("shard", "doc_id").collect().map(_.toString).toSeq
    assert(rowsSh(Packing.contiguousPackBucketed(sharded, 100L, tok,
        partitionCols = Seq("shard"), bucketSize = 256L))
      === rowsSh(Packing.contiguousPack(sharded, 100L, tok,
        partitionCols = Seq("shard"))))
  }

  test("split assignment is deterministic, partition-independent, ~80/10/10") {
    val a = Packing.splitAssign(docs).select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val b = Packing.splitAssign(docs.repartition(7)).select("doc_id", "split")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a === b) // a document never migrates between splits
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 200.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.1, frac)
    assert(frac.keySet === Set("train", "val", "test"))
  }

  test("next-fit no-straddle: no bin exceeds the budget, docs never split") {
    val s2 = spark
    import s2.implicits._
    val in = Seq(
      ("a", 1L, 60L), ("a", 2L, 30L), ("a", 3L, 30L), ("a", 4L, 150L), ("a", 5L, 10L),
      ("b", 6L, 100L), ("b", 7L, 1L)
    ).map { case (sh, id, n) => (sh, id, Seq.fill(n.toInt)("w").mkString(" ")) }
      .toDF("source", "doc_id", "text")
    val out = Packing.nextFitPack(in, budgetTokens = 100L,
        tokensCol = graft.functions.TextFunctions.tokenCount(col("text")),
        shardCol = col("source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDoc = out.map(r => r._2 -> r._4).toMap
    // shard a: 60+30 | 30 | 150 (oversized, alone) | 10
    assert(byDoc(1L) === 0L); assert(byDoc(2L) === 0L); assert(byDoc(3L) === 1L)
    assert(byDoc(4L) === 2L); assert(byDoc(5L) === 3L)
    // shard b restarts at bin 0; the full bin can't take one more token
    assert(byDoc(6L) === 0L); assert(byDoc(7L) === 1L)
    // invariant: no bin over budget unless it is a single oversized doc
    out.groupBy(r => (r._1, r._4)).foreach { case (_, rows) =>
      val tot = rows.map(_._3).sum
      assert(tot <= 100L || rows.length === 1)
    }
  }

  test("next-fit packing is stable under repartitioning") {
    val s2 = spark
    import s2.implicits._
    val in = Seq.tabulate(300)(i =>
        ("sh" + (i % 7), i.toLong, Seq.fill(1 + (i * 13) % 80)("w").mkString(" ")))
      .toDF("source", "doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.nextFitPack(df, 128L,
          graft.functions.TextFunctions.tokenCount(col("text")), col("source"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(run(in) === run(in.repartition(17)))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class IvfSpec extends AnyFunSuite with SparkTestBase {

  test("IVF top-k recall vs brute force on real embeddings") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val brute = Similarity.bruteForceTopK(emb, nQueries = 5, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, nQueries = 5, k = 5, nCells = 8, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // approximate: require >= 60% recall at nProbe/nCells = 0.5 scan fraction
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall $recall too low; ivf=$ivf brute=$brute")
    assert(ivf.groupBy(_._1).forall(_._2.size == 5)) // k results per query
  }

  test("persisted IVF index: probes prune partitions; agrees with the in-memory form") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val path = new java.io.File("target/tmp-ivf-index").getAbsolutePath
    Similarity.writeIvfIndex(emb, path, nCells = 16)
    val queries = emb.filter(col("vec_id") < 5).select(
      col("vec_id").as("query_id"), col("embedding"))
    val indexed = Similarity.ivfTopKIndexed(spark, path, queries, k = 5, nProbe = 4)
    // the scan must carry a PartitionFilters entry on the cell column —
    // only probed cell directories are read, nProbe/nCells of the corpus
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition pruning in:\n$plan")
    // same seed + same corpus => identical results to the in-memory form
    val mem = Similarity.ivfTopK(emb, nQueries = 5, k = 5, nCells = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = indexed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === mem)
  }

  test("index append with frozen centers equals a rebuild over the full corpus") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 5).select(
      col("vec_id").as("query_id"), col("embedding"))
    def searchSet(path: String) =
      Similarity.ivfTopKIndexed(spark, path, queries, k = 5, nProbe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // incremental: build on even ids, append odd ids against stored centers
    val inc = new java.io.File("target/tmp-ivf-append").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(inc))
    Similarity.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), inc, nCells = 16)
    Similarity.appendIvfIndex(emb.filter(col("vec_id") % 2 === 1), inc)
    // model: the same frozen (even-id-fit) centers assigning everything.
    // A plain writeIvfIndex(emb) would REFIT on the full corpus — different
    // centers, a legitimately different index — so the equivalence target
    // is assignment under the history centers, exactly what ivfAppendParts
    // exports for the gate's oracle.
    val (celledAll, _) = Similarity.ivfAppendParts(
      emb, col("vec_id") % 2 === 0, nQueries = 5, nCells = 16)
    val full = new java.io.File("target/tmp-ivf-full").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(full))
    celledAll.write.partitionBy("cell").parquet(full)
    spark.read.parquet(inc.stripSuffix("/") + "/_centers")
      .write.parquet(full.stripSuffix("/") + "/_centers")
    assert(searchSet(inc) === searchSet(full))
    // and the appended rows really landed inside existing cell dirs
    val cells = new java.io.File(inc).listFiles().filter(_.getName.startsWith("cell="))
    assert(cells.nonEmpty)
  }
}

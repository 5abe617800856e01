package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with the (small) query set broadcast —
  * one pass over the corpus, no corpus shuffle, which is exactly the plan
  * you want at 100 TB when the query side fits in memory. Scale path for
  * large query sets: sign-LSH bucketing turns the cross join into an
  * equi-join on bucket id.
  */
object Similarity {

  private def prep(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))

  /** Brute-force cosine top-k: queries = `vec_id < nQueries`, neighbors =
    * every other vector. Ranking uses the rounded similarity plus a
    * neighbor-id tiebreak so the order is reproducible across engines.
    */
  def bruteForceTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val e = prep(emb)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val sim = round(VectorFunctions.cosine(col("qv"), col("v")), 6)
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), sim.as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  /** Fixed-seed random hyperplanes for sign-LSH (deterministic sketches). */
  def planes(nPlanes: Int, dim: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Actual embedding dimensionality, read from one row — a plane set
    * narrower than the vectors would silently sketch only a prefix of each
    * vector (`zip_with` truncates to the shorter array) and recall would
    * degrade with no error.
    */
  def embeddingDim(emb: DataFrame): Int =
    // empty corpus -> any dim works (every downstream result is empty);
    // 1 keeps plane construction trivial instead of throwing on head
    emb.select(size(col("embedding")).as("d")).head(1)
      .headOption.map(_.getInt(0)).getOrElse(1)

  /** `(vec_id, v, bucket)` sign-sketch assignment. Plane dimensionality is
    * derived from the data unless pinned explicitly.
    */
  def signBuckets(emb: DataFrame, nPlanes: Int = 8, dim: Option[Int] = None,
                  seed: Long = 7L): DataFrame = {
    val d = dim.getOrElse(embeddingDim(emb))
    prep(emb).withColumn("bucket",
      VectorFunctions.lshBucket(col("v"), planes(nPlanes, d, seed)))
  }

  /** LSH-bucketed cosine candidate pairs: vectors sharing a sign-sketch
    * bucket are compared exactly; others never meet. `nPlanes` trades
    * recall (fewer planes = bigger buckets) against join fan-out. This is
    * the 100 TB path for all-pairs near-dup: shuffle keys are bucket ids.
    */
  def lshCosinePairs(emb: DataFrame, tau: Double, nPlanes: Int = 8,
                     dim: Option[Int] = None): DataFrame = {
    val e = signBuckets(emb, nPlanes, dim)
    val sim = round(VectorFunctions.cosine(col("a.v"), col("b.v")), 6)
    e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), sim.as("sim"))
      .filter(col("sim") >= tau)
  }

  /** IVF top-k: a seeded KMeans coarse quantizer cells the corpus once;
    * each query probes its `nProbe` nearest cells and runs exact cosine
    * only there. At 100 TB: the corpus is written bucketed by `cell`, so a
    * query touches `nProbe/nCells` of the data and the probe join is an
    * equi-join on cell id — the standard IVF-flat trade of recall for scan
    * fraction (the LSH variant above is the hash-based alternative).
    */
  def ivfTopK(emb: DataFrame, nQueries: Int, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val (celled, probes) = ivfParts(emb, nQueries, nCells, nProbe)
    val sim = round(VectorFunctions.cosine(col("qv"), col("v")), 6)
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    celled.join(broadcast(probes),
        celled("cell") === probes("cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), sim.as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  /** The two IVF inputs — cell assignment `(vec_id, v, cell)` and probe
    * list `(query_id, qv, cell)` — exposed so the correctness gate can
    * export them and have DuckDB re-derive the top-k independently. The
    * seeded KMeans is deterministic for a fixed input and partitioning, so
    * two fits in one session yield identical cells.
    */
  def ivfParts(emb: DataFrame, nQueries: Int,
               nCells: Int = 16, nProbe: Int = 4): (DataFrame, DataFrame) = {
    val (celled, centers) = fitCells(emb, nCells)
    val q = celled.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    (celled, probeList(q, centers, nProbe))
  }

  /** Seeded-KMeans coarse quantizer: `(vec_id, v, cell)` assignment plus
    * the `(cell, center)` table.
    */
  def fitCells(emb: DataFrame, nCells: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    // cache ONLY for the fit (10 iterations re-read the corpus otherwise)
    // and release before returning — no storage leak across invocations.
    // Downstream consumers of `celled` recompute one transform pass from
    // the source, which is a single scan, not a refit.
    // coalesce for the fit: a coarse quantizer trains on a sample-scale
    // table (here the whole toy corpus), and 10 iterations x 32 near-empty
    // tasks is pure scheduler overhead — 8 partitions keeps the fit
    // parallel while halving the wall cost. Determinism note: the fit
    // depends on the partitioning, but gate query and sketch export both
    // come through this one code path in one session, so they agree.
    val e = prep(emb).withColumn("features", array_to_vector(col("v")))
      .coalesce(8).cache()
    try {
      val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(10).fit(e)
      val celled = model.transform(e).select(col("vec_id"), col("v"), col("prediction").as("cell"))
      val centers = emb.sparkSession.createDataFrame(
        model.clusterCenters.zipWithIndex.toSeq.map { case (c, i) => (i, c.toArray) }
      ).toDF("cell", "center")
      (celled, centers)
    } finally e.unpersist()
  }

  /** `nProbe` nearest centers per query (tiny cross join, broadcast). */
  private def probeList(q: DataFrame, centers: DataFrame, nProbe: Int): DataFrame = {
    val probeW = Window.partitionBy("query_id").orderBy(col("dist").asc, col("cell").asc)
    q.crossJoin(broadcast(centers))
      .withColumn("dist", VectorFunctions.l2sq(col("qv"), col("center")))
      .withColumn("pr", row_number().over(probeW)).filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
  }

  // ---- persisted IVF index ------------------------------------------------

  /** Materialize the IVF index: corpus parquet PARTITIONED BY cell (so a
    * probe is a partition-pruned scan), centers in an underscore dir the
    * partition discovery ignores. This is the durable form of the "at
    * 100 TB the corpus is written bucketed by cell" claim in [[ivfTopK]]'s
    * doc — a query then touches `nProbe/nCells` of the DATA ON DISK, not
    * just of a frame already in memory.
    */
  def writeIvfIndex(emb: DataFrame, path: String, nCells: Int = 16): Unit = {
    val (celled, centers) = fitCells(emb, nCells)
    celled.write.partitionBy("cell")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
    centers.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path.stripSuffix("/") + "/_centers")
  }

  /** Top-k against a persisted index: probe selection runs on the tiny
    * centers table, then ONLY the probed cell partitions are read — the
    * `.isin` filter on the partition column prunes directories, so scan
    * cost is `nProbe/nCells` of the corpus regardless of corpus size.
    * `queries` carries `(query_id, embedding)`.
    */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, k: Int, nProbe: Int = 4): DataFrame = {
    val centers = spark.read.parquet(path.stripSuffix("/") + "/_centers")
    val q = queries.select(col("query_id"), VectorFunctions.asDouble(col("embedding")).as("qv"))
    val probes = probeList(q, centers, nProbe)
    // partition METADATA collect (a few ints), not data
    val probedCells = probes.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val corpus = spark.read.parquet(path).filter(col("cell").isin(probedCells: _*))
    val sim = round(VectorFunctions.cosine(col("qv"), col("v")), 6)
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    corpus.join(broadcast(probes),
        corpus("cell") === probes("cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), sim.as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }
}

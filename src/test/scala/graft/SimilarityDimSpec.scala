package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Plane-dimensionality safety for sign-LSH: the planes must span the FULL
  * embedding width. A plane set narrower than the vectors sketches only a
  * prefix (`zip_with` truncates), so vectors that differ only in the tail
  * would always share a bucket and the sketch would carry no information
  * about those dimensions.
  */
class SimilarityDimSpec extends AnyFunSuite with SparkTestBase {

  private def embFrame(rows: Seq[(Long, Seq[Float])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("signBuckets derives plane dim from data (128-dim, tail-only signal)") {
    // zero prefix (64 dims) + opposite tails: any prefix-only plane set
    // gives dot = 0 for both -> identical buckets; full-width planes give
    // opposite dots on every plane -> complementary buckets.
    val tailUp   = Seq.fill(64)(0f) ++ Seq.fill(64)(1f)
    val tailDown = Seq.fill(64)(0f) ++ Seq.fill(64)(-1f)
    val emb = embFrame(Seq((0L, tailUp), (1L, tailDown)))
    val buckets = Similarity.signBuckets(emb).select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets(0L) != buckets(1L),
      s"tail-opposite vectors share bucket ${buckets(0L)} — planes not spanning full dim")
  }

  test("lshCosinePairs finds identical 128-dim vectors and skips orthogonal ones") {
    val base = Seq.tabulate(128)(i => math.sin(i * 0.7).toFloat)
    val orth = Seq.tabulate(128)(i => math.cos(i * 0.7).toFloat)
    val emb = embFrame(Seq((0L, base), (1L, base), (2L, orth)))
    val pairs = Similarity.lshCosinePairs(emb, tau = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"identical pair missing from $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), s"orthogonal vector matched: $pairs")
  }

  test("product quantization: deterministic fit, exact codes, centers beat random") {
    // 3 well-separated families in 16 dims so the per-subspace codebooks
    // have unambiguous structure
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Long, Seq[Float])] = (0L until 90L).map { i =>
      val fam = (i % 3).toInt
      i -> Seq.tabulate(16)(dd =>
        (fam * 10.0 + math.sin(dd * 0.9 + fam) + rnd.nextGaussian() * 0.05).toFloat)
    }
    val emb = embFrame(rows)
    val m = 4; val k = 4
    val cb1 = Similarity.pqFit(emb, m, k)
    val cb2 = Similarity.pqFit(emb, m, k)
    // determinism: the gate's fit and the oracle export's fit must agree
    assert(cb1.map(_.map(_.toSeq).toSeq).toSeq === cb2.map(_.map(_.toSeq).toSeq).toSeq)
    assert(cb1.length === m)
    assert(cb1.forall(_.forall(_.length === 16 / m)))
    val enc = Similarity.pqEncode(emb, cb1).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getInt(2), r.getDouble(3)))).toMap
    // every (vec, subspace) encoded exactly once; codes within range
    assert(enc.size === rows.size * m)
    assert(enc.values.forall { case (code, d) => code >= 0 && code < k && d >= 0.0 })
    // the chosen center is the argmin: its distance is <= every
    // alternative cell's distance, recomputed locally
    val byId = rows.toMap
    for (vid <- Seq(0L, 1L, 57L); j <- 0 until m) {
      val (lo, sd) = Similarity.pqSlice(16, m, j)
      val sub = byId(vid).slice(lo, lo + sd).map(_.toDouble)
      val dists = cb1(j).map(c =>
        BigDecimal(sub.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val (code, d) = enc((vid, j))
      assert(d === dists.min, s"vec $vid subspace $j")
      assert(code === dists.indexOf(dists.min), s"vec $vid subspace $j tie rule")
    }
    // with 3 tight families and k=4, quantization error is far below the
    // family separation — the codebooks learned the structure
    val meanErr = enc.values.map(_._2).sum / enc.size
    assert(meanErr < 1.0, s"mean subspace error $meanErr")
  }

  test("pqSearch matches a local ADC model and ranks the query's own code first") {
    val rnd = new scala.util.Random(11)
    val rows: Seq[(Long, Seq[Float])] = (0L until 60L).map { i =>
      val fam = (i % 3).toInt
      i -> Seq.tabulate(16)(dd =>
        (fam * 8.0 + math.cos(dd * 1.1 + fam) + rnd.nextGaussian() * 0.05).toFloat)
    }
    val emb = embFrame(rows)
    val m = 4; val k = 4; val nQ = 3; val topK = 5
    val cb = Similarity.pqFit(emb, m, k)
    val got = Similarity.pqSearch(emb, cb, nQueries = nQ, k = topK).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(t => (t._2, t._3)).toSeq }
    // local model: encode every vector (rounded argmin), build the
    // integer luts, sum, rank (adc asc, id asc), take topK
    val byId = rows.toMap
    def slice(v: Seq[Float], j: Int) = {
      val (lo, sd) = Similarity.pqSlice(16, m, j)
      v.slice(lo, lo + sd).map(_.toDouble).toArray
    }
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val codes = rows.map { case (id, v) =>
      id -> (0 until m).map { j =>
        val ds = cb(j).map(c => BigDecimal(d2(slice(v, j), c))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        ds.indexOf(ds.min)
      }
    }.toMap
    for (q <- 0L until nQ.toLong) {
      val expect = rows.map { case (id, _) =>
        val adc = (0 until m).map { j =>
          math.round(d2(slice(byId(q), j), cb(j)(codes(id)(j))) * 10000d)
        }.sum
        (id, adc)
      }.sortBy { case (id, adc) => (adc, id) }.take(topK)
      assert(got(q) === expect, s"query $q")
      // the query's own code minimizes every subspace lut -> it ranks first
      assert(got(q).head._1 === q)
    }
  }

  test("ivfpq: residual codes beat raw PQ at equal bits; search scores probed cells only") {
    val rnd = new scala.util.Random(23)
    // 8 tight clusters far apart vs k=4 codewords per subspace: raw PQ
    // cannot cover the 8 cluster offsets with 4 codes, residual PQ spends
    // all its codes on within-cluster detail
    val rows: Seq[(Long, Seq[Float])] = (0L until 160L).map { i =>
      val fam = (i % 8).toInt
      i -> Seq.tabulate(16)(dd =>
        (fam * 50.0 + math.sin(dd + fam) + rnd.nextGaussian() * 0.3).toFloat)
    }
    val emb = embFrame(rows)
    val m = 4; val k = 4
    val centers = Similarity.fitCenters(emb, 8)
    val ivfCb = Similarity.ivfPqFit(emb, centers, m, k)
    val rawCb = Similarity.pqFit(emb, m, k)
    def totalErr(df: org.apache.spark.sql.DataFrame) =
      df.agg(org.apache.spark.sql.functions.sum("d_r")).head().getDouble(0)
    val ivfErr = totalErr(Similarity.ivfPqEncode(emb, centers, ivfCb))
    val rawErr = totalErr(Similarity.pqEncode(emb, rawCb))
    assert(ivfErr < rawErr / 2,
      s"residual coding should dominate on clustered data: ivf=$ivfErr raw=$rawErr")
    // search: with nProbe=1 every result's neighbor must live in the
    // query's own probed (= nearest) cell — unprobed cells are never scored
    val cells = Similarity.ivfPqCodesWide(emb, centers, ivfCb).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Similarity.ivfPqSearch(emb, centers, ivfCb,
      nQueries = 4, nProbe = 1, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    got.foreach { case (q, n) =>
      assert(cells(n) === cells(q), s"query $q (cell ${cells(q)}) matched " +
        s"neighbor $n from unprobed cell ${cells(n)}")
    }
    // widening the probe set can only add candidates
    val got3 = Similarity.ivfPqSearch(emb, centers, ivfCb,
      nQueries = 4, nProbe = 8, k = 10).collect().length
    assert(got3 >= got.length)
  }

  test("int8 quantization round-trips within per-element scale/2 and preserves cosine") {
    import graft.operators.Quantization
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val joined = Quantization.dequantize(Quantization.quantizeInt8(emb)).as("q")
      .join(emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("orig")).as("o"), "vec_id")
    val rows = joined.select("orig", "v").collect()
    rows.foreach { r =>
      val orig = r.getSeq[Double](0); val deq = r.getSeq[Double](1)
      val scale = orig.map(math.abs).max / 127.0
      orig.zip(deq).foreach { case (a, b) =>
        assert(math.abs(a - b) <= scale / 2 + 1e-12, s"err ${math.abs(a - b)} > ${scale / 2}")
      }
      val cos = { // quantization must not disturb similarity materially
        def dot(x: Seq[Double], y: Seq[Double]) = x.zip(y).map(p => p._1 * p._2).sum
        dot(orig, deq) / (math.sqrt(dot(orig, orig)) * math.sqrt(dot(deq, deq)))
      }
      assert(cos > 0.999, s"cosine degraded to $cos")
    }
  }

  test("JL projection is deterministic, linear, and preserves pairwise distance") {
    val dim = 64; val k = 16
    // deterministic matrix: two fits are identical
    val m1 = Similarity.jlMatrix(dim, k)
    val m2 = Similarity.jlMatrix(dim, k)
    assert(m1.flatten.toSeq === m2.flatten.toSeq)
    assert(m1.flatten.forall(v => math.abs(math.abs(v) - 1.0 / math.sqrt(k)) < 1e-12))
    // pairwise distances survive within JL-lemma-scale distortion on a
    // deterministic pseudo-random point set
    val rnd = new scala.util.Random(7)
    val pts = (0L until 40L).map(i => (i, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
    val proj = Similarity.jlProject(embFrame(pts), m1, dp = 9).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    def d2(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- 0L until 40L; j <- (i + 1) until 40L
      orig = d2(pts(i.toInt)._2.map(_.toDouble), pts(j.toInt)._2.map(_.toDouble))
      if orig > 0
    } yield d2(proj(i).toSeq, proj(j).toSeq) / orig
    // k=16 is a coarse sketch; the sign-JL bound still keeps every ratio
    // within a small constant factor and the mean near 1
    assert(ratios.forall(r => r > 0.2 && r < 3.0), s"worst=${ratios.min}/${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean distortion $mean")
  }

  test("explicit dim override is honored") {
    val emb = embFrame(Seq((0L, Seq.fill(16)(1f)), (1L, Seq.fill(16)(1f))))
    val withDim = Similarity.lshCosinePairs(emb, tau = 0.99, dim = Some(16))
      .collect()
    assert(withDim.length == 1)
  }
}

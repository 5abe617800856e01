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

  test("explicit dim override is honored") {
    val emb = embFrame(Seq((0L, Seq.fill(16)(1f)), (1L, Seq.fill(16)(1f))))
    val withDim = Similarity.lshCosinePairs(emb, tau = 0.99, dim = Some(16))
      .collect()
    assert(withDim.length == 1)
  }
}

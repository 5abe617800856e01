package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant tests for the round-6 gates (the oracle pins exact values;
  * these pin the properties that must hold at ANY scale factor).
  */
class Round6OpsSpec extends AnyFunSuite with SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  test("dedup_canonical: one keeper per component, a member of it, quality in [0,1]") {
    val comps = graft.operators.Dedup.connectedComponents(
        graft.operators.Dedup.jaccardPairs(Tables.documents(spark, d), tau = 0.8, idCap = 500L))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component")).toMap
    val out = SparkEntry.queries("dedup_canonical")(spark, d).collect()
    assert(out.nonEmpty)
    // exactly one row per component, covering every component
    assert(out.map(_.getAs[Long]("component")).distinct.length === out.length)
    assert(out.map(_.getAs[Long]("component")).toSet === comps.values.toSet)
    out.foreach { r =>
      val c = r.getAs[Long]("component")
      assert(comps(r.getAs[Long]("keep_id")) === c, "keeper outside its cluster")
      assert(r.getAs[Long]("n_members") === comps.values.count(_ == c).toLong)
      assert(r.getAs[Long]("n_members") >= 2L) // every graph node has an edge
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0, s"quality $q")
    }
  }

  test("mm_frames: real MJPEG-AVI round trip — counts, dims, order; garbage drops") {
    val s = spark
    import s.implicits._
    import graft.operators.Multimodal
    val docs = Seq((0L, 100L), (3L, 57L), (7L, 260L)).toDF("doc_id", "n_chars")
    val avis = Multimodal.synthAvis(s, docs)
    // junk and truncated payloads degrade to no rows, never throw
    val junk = Seq((99L, "not an avi".getBytes), (98L, Array.empty[Byte]))
      .toDF("doc_id", "media")
    assert(Multimodal.aviFrames(s, junk).collect().isEmpty)
    val frames = Multimodal.aviFrames(s, avis).collect()
      .groupBy(_.doc_id)
    docs.collect().foreach { r =>
      val (id, nc) = (r.getLong(0), r.getLong(1))
      val fs = frames(id).sortBy(_.frame_idx)
      assert(fs.length === (1 + id % 4).toInt, s"doc $id")
      assert(fs.map(_.frame_idx).toSeq === (0 until fs.length))
      assert(fs.forall(f => f.width == (20 + nc % 13).toInt &&
        f.height == (20 + (nc * 7) % 11).toInt))
    }
  }

  test("aviFrames: frames inside 'rec ' grouping LISTs (interleaved layout) are found") {
    val s = spark
    import s.implicits._
    import graft.operators.Multimodal
    // hand-assembled AVI: movi holds one frame nested in a rec LIST and
    // one direct frame — the standard interleaved shape our generator
    // doesn't emit
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos); bos.toByteArray
    }
    val (j1, j2) = (jpeg(9, 5), jpeg(9, 5))
    val out = new java.io.ByteArrayOutputStream()
    def ascii(x: String) = out.write(x.getBytes("US-ASCII"))
    def le32(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >>> 24) & 0xff) }
    def pad(n: Int) = n + (n & 1)
    val recBody = 4 + 8 + pad(j1.length)            // 'rec ' + 00dc chunk
    val moviBody = 4 + 8 + recBody + 8 + pad(j2.length)
    ascii("RIFF"); le32(4 + 8 + moviBody); ascii("AVI ")
    ascii("LIST"); le32(moviBody); ascii("movi")
    ascii("LIST"); le32(recBody); ascii("rec ")
    ascii("00dc"); le32(j1.length); out.write(j1)
    if ((j1.length & 1) == 1) out.write(0)
    ascii("00dc"); le32(j2.length); out.write(j2)
    if ((j2.length & 1) == 1) out.write(0)
    val got = Multimodal.aviFrames(s,
        Seq((42L, out.toByteArray)).toDF("doc_id", "media")).collect()
      .map(f => (f.frame_idx, f.width, f.height)).sorted.toSeq
    assert(got === Seq((0, 9, 5), (1, 9, 5)))
  }

  test("mm_gif_frames: frame count follows 1 + doc_id % 3, dims constant per doc") {
    val out = SparkEntry.queries("mm_gif_frames")(spark, d).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rows) =>
      assert(rows.length === (1 + id % 3).toInt, s"doc $id frame count")
      assert(rows.map(_.getAs[Int]("width")).distinct.length === 1)
      assert(rows.map(_.getAs[Int]("height")).distinct.length === 1)
      assert(rows.map(_.getAs[Int]("frame_idx")).sorted.toSeq === (0 until rows.length))
    }
  }
}

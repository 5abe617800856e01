package graft

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MediaMeta
import graft.operators.Multimodal

/** Container-header decode against REAL encoder output (javax.imageio for
  * PNG/JPEG/GIF/BMP, hand-built RIFF/WAVE) plus hand-built headers and
  * garbage — the decode path is no longer a stub for metadata.
  */
class MediaMetaSpec extends AnyFunSuite with SparkTestBase {

  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt encoder")
    out.toByteArray
  }

  private def wavBytes(sampleRate: Int, channels: Int, bits: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def le16(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int) = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    out.write("RIFF".getBytes); le32(36); out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); le32(16)
    le16(1); le16(channels); le32(sampleRate)
    le32(sampleRate * channels * bits / 8); le16(channels * bits / 8); le16(bits)
    out.write("data".getBytes); le32(0)
    out.toByteArray
  }

  test("parses real encoder output: PNG, JPEG, GIF, BMP dimensions") {
    for ((fmt, expect) <- Seq("png" -> "png", "jpg" -> "jpeg", "gif" -> "gif", "bmp" -> "bmp")) {
      val m = MediaMeta.parse(imageBytes(fmt, 31, 17))
      assert(m.format === expect, fmt)
      assert((m.width, m.height) === ((Some(31), Some(17))), fmt)
    }
  }

  test("parses WAV fmt chunk: sample rate, channels, bits") {
    val m = MediaMeta.parse(wavBytes(44100, 2, 16))
    assert(m === MediaMeta.Meta("wav", sampleRate = Some(44100),
      channels = Some(2), bits = Some(16)))
  }

  test("garbage, truncation, and empty input degrade to unknown — never throw") {
    assert(MediaMeta.parse(Array.emptyByteArray).format === "unknown")
    assert(MediaMeta.parse("plain text".getBytes).format === "unknown")
    assert(MediaMeta.parse(imageBytes("png", 8, 8).take(10)).format === "unknown")
    val rnd = new scala.util.Random(5)
    val junk = Array.fill(256)(rnd.nextInt(256).toByte)
    junk(0) = 0xff.toByte; junk(1) = 0xd8.toByte // JPEG magic then garbage
    assert(MediaMeta.parse(junk).format === "unknown")
  }

  test("decodeHeaders runs as a native expression over a binary column, and in SQL") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, imageBytes("png", 64, 48)),
      (2L, wavBytes(16000, 1, 8)),
      (3L, "not media".getBytes)).toDF("doc_id", "media")
    val got = Multimodal.decodeHeaders(df)
      .select("doc_id", "format", "width", "sample_rate").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), if (r.isNullAt(3)) -1 else r.getInt(3)))
      .toSet
    assert(got === Set((1L, "png", 64, -1), (2L, "wav", -1, 16000), (3L, "unknown", -1, -1)))
    GraftFunctions.register(s)
    df.createOrReplaceTempView("media_tbl")
    val viaSql = s.sql(
      "SELECT media_meta(media).format AS f FROM media_tbl WHERE doc_id = 1").head().getString(0)
    assert(viaSql === "png")
  }
}

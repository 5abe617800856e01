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

  test("parses AVI hdrl: format and frame dimensions from avih") {
    val s = spark
    import s.implicits._
    val avi = graft.operators.Multimodal.synthAvis(s,
        Seq((5L, 120L)).toDF("doc_id", "n_chars"))
      .head().getAs[Array[Byte]]("media")
    val m = MediaMeta.parse(avi)
    assert(m === MediaMeta.Meta("avi",
      width = Some((20 + 120 % 13)), height = Some((20 + (120 * 7) % 11))))
    // truncated past the magic: format certain, dims absent, never throws
    assert(MediaMeta.parse(avi.take(13)).format === "avi")
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

  private def solidImage(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt encoder")
    out.toByteArray
  }

  test("decodePixels: real raster decode — exact means on PNG/BMP, dims on JPEG, skip garbage") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, solidImage("png", 10, 6, 0x204060)),  // r=32 g=64 b=96
      (2L, solidImage("bmp", 4, 4, 0xFF0000)),
      (3L, solidImage("jpg", 12, 8, 0x808080)),
      (4L, "not an image".getBytes)).toDF("doc_id", "media")
    val got = Multimodal.decodePixels(s, df).collect().map(p => p.doc_id -> p).toMap
    assert(got.keySet === Set(1L, 2L, 3L)) // garbage decodes to no row
    assert((got(1L).format, got(1L).width, got(1L).height) === (("png", 10, 6)))
    assert((got(1L).mean_r, got(1L).mean_g, got(1L).mean_b) === ((32.0, 64.0, 96.0)))
    assert(got(1L).mean_lum === (32.0 + 64.0 + 96.0) / 3.0)
    assert((got(2L).format, got(2L).mean_r, got(2L).mean_g) === (("bmp", 255.0, 0.0)))
    // JPEG is lossy: dims exact, a mid-gray solid stays close to itself
    assert((got(3L).format, got(3L).width, got(3L).height) === (("jpeg", 12, 8)))
    assert(math.abs(got(3L).mean_r - 128.0) < 3.0, got(3L))
  }

  test("thumbSketches: deterministic, brightness-near images hamming-close, different far") {
    val s = spark
    import s.implicits._
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val df = Seq(
      (1L, solidImage("png", 16, 16, 0x808080)),  // gray 128
      (2L, solidImage("png", 16, 16, 0x828282)),  // gray 130: same nibble
      (3L, solidImage("png", 16, 16, 0x101010)),  // gray 16: far
      (4L, "not an image".getBytes)).toDF("doc_id", "media")
    val sh = Multimodal.thumbSketches(s, df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh.keySet === Set(1L, 2L, 3L))          // garbage -> no row
    val sh2 = Multimodal.thumbSketches(s, df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh === sh2)                             // bit-stable
    assert(ham(sh(1L), sh(2L)) === 0)              // 128 and 130 share nibble 8
    assert(ham(sh(1L), sh(3L)) >= 16)              // every cell nibble differs
    // and the generalized hamming join pairs exactly the close ones
    val pairs = graft.operators.Dedup.hammingNearDup(
        Multimodal.thumbSketches(s, df).toDF("doc_id", "sh"), maxDist = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("resizeImages: real re-render, output decodes at the target size") {
    val s = spark
    import s.implicits._
    val df = Seq((7L, solidImage("png", 31, 17, 0x123456))).toDF("doc_id", "media")
    val resized = Multimodal.resizeImages(s, df, 8, 5)
    val meta = Multimodal.decodeHeaders(resized).head()
    assert((meta.getAs[String]("format"), meta.getAs[Int]("width"),
      meta.getAs[Int]("height")) === (("png", 8, 5)))
    // a solid color survives the resample exactly
    val p = Multimodal.decodePixels(s, resized).head()
    assert((p.mean_r, p.mean_g, p.mean_b) === ((0x12.toDouble, 0x34.toDouble, 0x56.toDouble)))
  }

  test("gifFrames: real animated-GIF frame iteration") {
    val s = spark
    import s.implicits._
    // build a 3-frame animated GIF through the ImageIO sequence writer
    val out = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (i <- 0 until 3) {
      val img = new java.awt.image.BufferedImage(9, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 7; x <- 0 until 9) img.setRGB(x, y, i * 0x303030)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val df = Seq((5L, out.toByteArray), (6L, "junk".getBytes)).toDF("doc_id", "media")
    val frames = Multimodal.gifFrames(s, df).collect()
    assert(frames.map(f => (f.doc_id, f.frame_idx, f.width, f.height)).sorted.toSeq ===
      Seq((5L, 0, 9, 7), (5L, 1, 9, 7), (5L, 2, 9, 7)))
  }

  test("wavStats: real PCM16 sample decode — square wave stats are exact") {
    val s = spark
    import s.implicits._
    val df = Multimodal.synthWavs(s,
      Seq((11L, 250L), (12L, 299L)).toDF("doc_id", "n_chars"))
    val got = Multimodal.wavStats(s, df).collect().map(w => w.doc_id -> w).toMap
    // amplitude = 100 + doc_id % 900; samples = 200 + n_chars % 100
    assert(got(11L).n_samples === 250L && got(11L).peak === 111L)
    assert(got(11L).mean_abs === 111.0 && got(11L).rms === 111.0)
    assert(got(12L).n_samples === 299L && got(12L).peak === 112L)
    // header-only (zero data) and garbage payloads produce no row
    val empty = Seq((13L, wavBytes(8000, 1, 16)), (14L, "x".getBytes)).toDF("doc_id", "media")
    val ws = Multimodal.wavStats(s, empty).collect()
    assert(ws.map(_.doc_id).toSeq === Seq(13L) && ws.head.n_samples === 0L)
  }

  test("wavStats: corrupt chunk lengths degrade to no row, never hang or throw") {
    val s = spark
    import s.implicits._
    def withChunkLen(len: Int): Array[Byte] = {
      val b = wavBytes(8000, 1, 16).clone()
      // chunk walk starts at offset 12; patch the fmt chunk's length field
      b(16) = (len & 0xff).toByte; b(17) = ((len >> 8) & 0xff).toByte
      b(18) = ((len >> 16) & 0xff).toByte; b(19) = ((len >> 24) & 0xff).toByte
      b
    }
    val df = Seq(
      (1L, withChunkLen(-8)),         // len=-8 advanced the cursor by ZERO -> hang
      (2L, withChunkLen(-1000)),      // walks backwards
      (3L, withChunkLen(0x7ffffff8)), // overflows the offset
      (4L, wavBytes(44100, 2, 16))).toDF("doc_id", "media")
    val got = Multimodal.wavStats(s, df).collect()
    assert(got.map(_.doc_id).toSeq === Seq(4L))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video carried as opaque `binary` with a
  * typed metadata struct.
  *
  * Decode is REAL end-to-end for the formats the JDK ships codecs for:
  *  - header metadata: [[decodeHeaders]] / [[graft.functions.MediaMeta]]
  *    parses PNG/JPEG/GIF/BMP/WAV container bytes natively;
  *  - pixels: [[decodePixels]] decodes PNG/JPEG/GIF/BMP rasters through
  *    `javax.imageio` (in the JDK — no external codec needed) and emits
  *    per-image channel statistics; [[resizeImages]] re-renders through
  *    `Graphics2D` and re-encodes; [[gifFrames]] iterates real animated-GIF
  *    frames off the ImageIO reader;
  *  - audio: [[wavStats]] parses RIFF/WAVE PCM16 sample data directly.
  * Formats with no JVM codec (video, MP3, ...) stay header-only — that
  * boundary is the container's, not a stub.
  *
  * All decode runs as partition-parallel `mapPartitions` over the binary
  * column (the JVM analogue of the `mapInPandas` batch shape): codec setup
  * amortizes per partition, undecodable bytes degrade to null rows rather
  * than failing the task, and column pruning keeps the payload bytes out
  * of every operation that doesn't need them.
  */
object Multimodal {

  // ImageIO defaults every ImageInputStream/ImageOutputStream to a DISK
  // cache — a temp file created and deleted per encode/decode call, which
  // at one blob per row serializes the whole codec pipeline on filesystem
  // churn (r13 optimization: measured ~35% off the GIF gates). Memory
  // caching is strictly better for our in-memory byte-array blobs. Object
  // initialization runs once per JVM wherever the decode closures load, so
  // executors get the same setting.
  javax.imageio.ImageIO.setUseCache(false)

  /** The same setting applied idempotently from INSIDE the codec helpers
    * (r14, ADVICE): Scala closures compile to static methods of this
    * object's class, so executing any of them already initializes the
    * object on every executor JVM — but routing the setting through an
    * explicit call makes executor coverage independent of that
    * compilation detail. `getUseCache` is a plain field read, free per
    * row.
    */
  @inline private def ensureMemCachedIo(): Unit =
    if (javax.imageio.ImageIO.getUseCache) javax.imageio.ImageIO.setUseCache(false)

  /** The known per-blob decoder failure modes for TRUNCATED/MALFORMED
    * payloads — the only throwables a "corrupt chunk degrades to no row"
    * guard may swallow. IOException is the documented contract;
    * javax.imageio's GIF/JPEG readers additionally throw raw
    * IndexOutOfBounds / IllegalArgument / NegativeArraySize on some
    * malformed blobs (observed decoder behavior, not our code). Anything
    * else — NPEs, class errors, our own regressions — must surface and
    * fail the task, never silently shrink the result set.
    */
  private def corruptBlobFailure(t: Throwable): Boolean = t match {
    case _: NullPointerException      => false // a code bug, not bad bytes
    case _: java.io.IOException       => true
    case _: IndexOutOfBoundsException => true
    case _: NegativeArraySizeException => true
    case _: IllegalArgumentException  => true
    // corrupt/truncated ICC color profiles surface as CMMException from
    // the JPEG path — bad bytes, not code (IllegalStateException is NOT
    // here: ImageIO throws it for misuse like "input not set")
    case _: java.awt.color.CMMException => true
    case _ => false
  }

  /** `ImageIO.read` under the corrupt-blob guard: null on undecodable or
    * malformed bytes (caller drops the row), decoder-code regressions
    * propagate. One body so the four pixel-path call sites can't drift.
    */
  private def readImageOrNull(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    ensureMemCachedIo()
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    catch { case t: Throwable if corruptBlobFailure(t) => null }
  }

  /** Real container-header decode: format + dimensions / audio shape from
    * the payload bytes (native expression, garbage-safe). Use over any
    * frame with a `media` binary column.
    */
  def decodeHeaders(media: DataFrame): DataFrame =
    media.withColumn("meta", graft.functions.MediaMeta.media_meta(col("media")))
      .select(col("doc_id"), length(col("media")).cast("long").as("byte_len"),
        col("meta.format").as("format"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("meta.sample_rate").as("sample_rate"),
        col("meta.channels").as("channels"), col("meta.bits").as("bits"))

  /** Media table derived from documents: the text bytes stand in for an
    * encoded media payload; `media_kind` is driven by `source`.
    */
  def mediaFrame(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      col("n_chars"),
      when(col("source").isin("src0", "src1"), "image")
        .when(col("source") === "src2", "audio")
        .otherwise("video").as("media_kind"))

  final case class MediaRow(doc_id: Long, media: Array[Byte], media_kind: String)
  final case class MediaFeature(doc_id: Long, media_kind: String, histogram: Array[Long])
  final case class ImageRow(doc_id: Long, media: Array[Byte])
  final case class PixelStats(doc_id: Long, format: String, width: Int, height: Int,
    mean_r: Double, mean_g: Double, mean_b: Double, mean_lum: Double)
  final case class FrameRow(doc_id: Long, frame_idx: Int, width: Int, height: Int)
  final case class SceneCut(doc_id: Long, frame_idx: Int, sad_per_px: Long,
    cut: Boolean)
  final case class WavStats(doc_id: Long, n_samples: Long, mean_abs: Double,
    rms: Double, peak: Long)
  final case class WavWindow(doc_id: Long, win: Long, n_in_win: Long,
    sum_sq: Long, sum_abs: Long)

  final case class DocKey(doc_id: Long, n_chars: Long)

  /** Deterministic synthetic PNG per document: a two-band image whose
    * dimensions and channel means are closed-form in (doc_id, n_chars) —
    * the top half is one solid color, the bottom half another, so every
    * channel mean is exactly (top + bottom) / 2. Feeding these through
    * [[decodePixels]] gives the `mm_pixels` gate: a DuckDB oracle
    * recomputes the statistics from the closed form, so a hash match
    * proves encode -> PNG container -> ImageIO decode -> raster statistics
    * end-to-end with REAL codec work on both sides of the container.
    */
  def synthImages(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      .as[DocKey].mapPartitions { it =>
        it.map { d =>
          val w = (16 + d.n_chars % 17).toInt
          val h = (16 + 2 * ((d.n_chars * 3) % 5)).toInt // even: exact halves
          val top = Array(d.doc_id % 256, (d.doc_id * 7) % 256, (d.doc_id * 13) % 256)
          val bot = Array((d.doc_id * 3) % 256, (d.doc_id * 11) % 256, (d.doc_id * 17) % 256)
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            val c = if (y < h / 2) top else bot
            val rgb = (c(0).toInt << 16) | (c(1).toInt << 8) | c(2).toInt
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          ensureMemCachedIo()
          javax.imageio.ImageIO.write(img, "png", out)
          ImageRow(d.doc_id, out.toByteArray)
        }
      }.toDF("doc_id", "media")
  }

  /** Deterministic synthetic PCM16 WAV per document: a square wave of
    * amplitude `100 + doc_id % 900` over `200 + n_chars % 100` samples —
    * mean_abs, rms and peak all equal the amplitude exactly, so the
    * `mm_audio` oracle recomputes them closed-form while the Spark side
    * does REAL RIFF/PCM sample decode.
    */
  def synthWavs(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      .as[DocKey].mapPartitions { it =>
        it.map { d =>
          val amp = (100 + d.doc_id % 900).toInt
          val n = (200 + d.n_chars % 100).toInt
          val out = new java.io.ByteArrayOutputStream()
          def le16(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
          def le32(v: Int) = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
          out.write("RIFF".getBytes("US-ASCII")); le32(36 + 2 * n)
          out.write("WAVE".getBytes("US-ASCII"))
          out.write("fmt ".getBytes("US-ASCII")); le32(16)
          le16(1); le16(1); le32(16000); le32(32000); le16(2); le16(16)
          out.write("data".getBytes("US-ASCII")); le32(2 * n)
          var i = 0
          while (i < n) { le16(if (i % 2 == 0) amp else -amp); i += 1 }
          ImageRow(d.doc_id, out.toByteArray)
        }
      }.toDF("doc_id", "media")
  }

  /** Deterministic synthetic ANIMATED GIF per document: `1 + doc_id % 3`
    * solid-color frames at a closed-form (w, h) — the `mm_gif_frames`
    * oracle recomputes (doc, frame, width, height) from the generation
    * rule while the Spark side runs the REAL ImageIO sequence writer and
    * [[gifFrames]] reader, certifying multi-frame encode -> GIF container
    * -> frame-iterating decode end-to-end.
    */
  def synthGifs(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      .as[DocKey].mapPartitions { it =>
        it.map { d =>
          val w = (12 + d.n_chars % 9).toInt
          val h = (12 + (d.n_chars * 5) % 7).toInt
          val nFrames = (1 + d.doc_id % 3).toInt
          val out = new java.io.ByteArrayOutputStream()
          ensureMemCachedIo()
          val ios = javax.imageio.ImageIO.createImageOutputStream(out)
          val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var i = 0
          while (i < nFrames) {
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = img.createGraphics()
            try {
              g.setColor(new java.awt.Color(((d.doc_id + 37L * i) % 256).toInt,
                ((d.doc_id * 7 + i) % 256).toInt, ((d.doc_id * 13) % 256).toInt))
              g.fillRect(0, 0, w, h)
            } finally g.dispose()
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
            i += 1
          }
          writer.endWriteSequence(); ios.close(); writer.dispose()
          ImageRow(d.doc_id, out.toByteArray)
        }
      }.toDF("doc_id", "media")
  }

  /** Deterministic synthetic MJPEG-AVI per document: `1 + doc_id % 4`
    * solid-color JPEG frames at a closed-form (w, h), wrapped in a real
    * RIFF/AVI container (hdrl with avih + vids/MJPG strl, frames as
    * `00dc` chunks in the movi LIST). MJPEG is the one video codec whose
    * frames the JDK can decode (each frame IS a JPEG), which makes
    * `mm_frames` a REAL container-parse + frame-decode gate instead of a
    * sampling-schedule stub; H.264/VP9-class codecs remain genuinely
    * undecodable without external libraries.
    */
  def synthAvis(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      .as[DocKey].mapPartitions { it =>
        it.map { d =>
          val w = (20 + d.n_chars % 13).toInt
          val h = (20 + (d.n_chars * 7) % 11).toInt
          val nFrames = (1 + d.doc_id % 4).toInt
          val jpegs = (0 until nFrames).map { i =>
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = img.createGraphics()
            try {
              g.setColor(new java.awt.Color(((d.doc_id + 31L * i) % 256).toInt,
                ((d.doc_id * 5 + i) % 256).toInt, ((d.doc_id * 11) % 256).toInt))
              g.fillRect(0, 0, w, h)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            ensureMemCachedIo()
            javax.imageio.ImageIO.write(img, "jpg", bos)
            bos.toByteArray
          }
          val out = new java.io.ByteArrayOutputStream()
          def ascii(s: String) = out.write(s.getBytes("US-ASCII"))
          def le32(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
            out.write((v >> 16) & 0xff); out.write((v >>> 24) & 0xff) }
          def le16(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
          // movi payload size: per frame 8-byte chunk header + padded body
          val moviBody = jpegs.map(j => 8 + j.length + (j.length & 1)).sum
          val hdrlLen = 4 + 8 + 56 + 12 + 8 + 56 + 8 + 40 // 'hdrl'+avih+LIST strl
          val riffLen = 4 + 8 + hdrlLen + 8 + 4 + moviBody // 'AVI '+hdrl+movi
          ascii("RIFF"); le32(riffLen); ascii("AVI ")
          ascii("LIST"); le32(hdrlLen); ascii("hdrl")
          ascii("avih"); le32(56)
          le32(40000); le32(0); le32(0); le32(0)    // usec/frame, bps, pad, flags
          // flags = 0: AVIF_HASINDEX would promise an idx1 chunk we never
          // write, and strict demuxers reject files that break that promise
          le32(nFrames); le32(0); le32(1); le32(0)  // totalFrames, init, streams, sugBuf
          le32(w); le32(h); le32(0); le32(0); le32(0); le32(0)
          ascii("LIST"); le32(4 + 8 + 56 + 8 + 40); ascii("strl")
          ascii("strh"); le32(56)
          ascii("vids"); ascii("MJPG")
          le32(0); le16(0); le16(0); le32(0)        // flags, prio, lang, initFrames
          le32(1); le32(25); le32(0); le32(nFrames) // scale, rate, start, length
          le32(0); le32(-1); le32(0)                // sugBuf, quality, sampleSize
          le16(0); le16(0); le16(w); le16(h)        // rcFrame
          ascii("strf"); le32(40)
          le32(40); le32(w); le32(h); le16(1); le16(24)
          ascii("MJPG"); le32(w * h * 3); le32(0); le32(0); le32(0); le32(0)
          ascii("LIST"); le32(4 + moviBody); ascii("movi")
          jpegs.foreach { j =>
            ascii("00dc"); le32(j.length); out.write(j)
            if ((j.length & 1) == 1) out.write(0) // RIFF word alignment
          }
          ImageRow(d.doc_id, out.toByteArray)
        }
      }.toDF("doc_id", "media")
  }

  /** REAL MJPEG-AVI frame extraction: RIFF walk to the `movi` LIST, then
    * each `..dc` (compressed video) chunk decodes through the JDK's JPEG
    * reader. Corrupt lengths and undecodable chunks degrade to no row —
    * the same garbage discipline as [[wavStats]].
    */
  def aviFrames(spark: SparkSession, media: DataFrame): Dataset[FrameRow] = {
    import spark.implicits._
    media.select("doc_id", "media").as[ImageRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val b = r.media
        def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
          ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
        def tag(o: Long, s: String) = o + 4 <= b.length &&
          new String(b, o.toInt, 4, "US-ASCII") == s
        if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "AVI ")) Iterator.empty
        else {
          val frames = scala.collection.mutable.ArrayBuffer.empty[FrameRow]
          var idx = 0 // global: multiple movi lists continue the numbering
          var corrupt = false
          def decodeAt(p: Long, clen: Int): Unit = {
            ensureMemCachedIo()
            val img = try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(b, p.toInt, clen))
              catch { case t: Throwable if corruptBlobFailure(t) => null }
            if (img != null) {
              frames += FrameRow(r.doc_id, idx, img.getWidth, img.getHeight)
              idx += 1
            }
          }
          // walk a chunk run in [from, end): video chunks decode; 'rec '
          // grouping LISTs (standard interleaved layout) recurse one level
          def walkChunks(from: Long, end: Long): Unit = {
            var p = from
            while (!corrupt && p + 8 <= end) {
              val cid = new String(b, p.toInt, 4, "US-ASCII")
              val clen = le32(p.toInt + 4)
              if (clen < 0 || p + 8 + clen > end) corrupt = true
              else {
                if (cid == "LIST" && tag(p + 8, "rec "))
                  walkChunks(p + 12, p + 8 + clen)
                else if (cid.endsWith("dc")) decodeAt(p + 8, clen)
                p += 8L + clen + (clen & 1)
              }
            }
          }
          var o = 12L
          while (!corrupt && o + 8 <= b.length) {
            val len = le32(o.toInt + 4)
            if (len < 0) corrupt = true
            else {
              if (tag(o, "LIST") && tag(o + 8, "movi"))
                walkChunks(o + 12, math.min(o + 8 + len.toLong, b.length.toLong))
              o += 8L + len.toLong + (len & 1)
            }
          }
          if (corrupt) Iterator.empty else frames.iterator
        }
      }
    }
  }

  /** REAL pixel decode via `javax.imageio` (JDK built-in): per image, the
    * channel means over the full raster and a flat luminance
    * ((r+g+b)/3) mean, all exact integer sums divided once — bit-stable
    * for an oracle to recompute. Undecodable payloads yield no row
    * (inner semantics, like a failed codec in a real pipeline).
    */
  def decodePixels(spark: SparkSession, media: DataFrame): Dataset[PixelStats] = {
    import spark.implicits._
    media.select("doc_id", "media").as[ImageRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val img = readImageOrNull(r.media)
        if (img == null) Iterator.empty
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          val fmt = graft.functions.MediaMeta.parse(r.media).format
          Iterator.single(PixelStats(r.doc_id, fmt, w, h,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
            (sr + sg + sb).toDouble / (3.0 * n)))
        }
      }
    }
  }

  /** 64-bit perceptual thumbnail sketch: decode, block-average to a 4x4
    * grayscale grid (integer-exact: BT.601 luma in integer thousandths,
    * floor-divided block sums over `floor(j*w/4)` boundaries), quantize
    * each cell to its high nibble, pack row-major. Two sketches are
    * hamming-close iff the images' coarse luminance layouts are close —
    * the image-side analogue of SimHash, feeding the same pigeonhole
    * chunk join ([[Dedup.hammingNearDup]]) so image near-dup detection is
    * an equi-join at any corpus size, never an image-pair scan. All
    * arithmetic is integer, so the sketch is bit-stable across JVMs and
    * exportable for the gate's oracle to replay the pairing.
    */
  def thumbSketches(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media").as[ImageRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val img = readImageOrNull(r.media)
        if (img == null) Iterator.empty
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var sh = 0L
          var gy = 0
          while (gy < 4) {
            var gx = 0
            val y0 = gy * h / 4; val y1 = (gy + 1) * h / 4
            while (gx < 4) {
              val x0 = gx * w / 4; val x1 = (gx + 1) * w / 4
              var sum = 0L; var n = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val p = img.getRGB(x, y)
                  sum += (((p >> 16) & 0xff) * 299L + ((p >> 8) & 0xff) * 587L +
                          (p & 0xff) * 114L) / 1000L
                  n += 1; x += 1
                }
                y += 1
              }
              val mean = if (n == 0) 0L else sum / n
              sh = (sh << 4) | ((mean >> 4) & 0xfL)
              gx += 1
            }
            gy += 1
          }
          Iterator.single((r.doc_id, sh))
        }
      }
    }.toDF("doc_id", "sh")
  }

  /** REAL resize: decode, redraw at (w, h) through Graphics2D, re-encode
    * PNG. The output is a media column again — resize composes with
    * [[decodePixels]]/[[decodeHeaders]] like any pipeline stage.
    */
  def resizeImages(spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media").as[ImageRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val img = readImageOrNull(r.media)
        if (img == null) Iterator.empty
        else {
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
          val bytes = new java.io.ByteArrayOutputStream()
          ensureMemCachedIo()
          javax.imageio.ImageIO.write(out, "png", bytes)
          Iterator.single(ImageRow(r.doc_id, bytes.toByteArray))
        }
      }
    }.toDF("doc_id", "media")
  }

  /** REAL animated-GIF frame extraction: the ImageIO GIF reader iterates
    * every frame; emit one row per frame with its decoded dimensions.
    */
  def gifFrames(spark: SparkSession, media: DataFrame): Dataset[FrameRow] = {
    import spark.implicits._
    media.select("doc_id", "media").as[ImageRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
        if (!readers.hasNext) Iterator.empty
        else {
          val reader = readers.next()
          try {
            ensureMemCachedIo()
            reader.setInput(javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(r.media)))
            val n = reader.getNumImages(true)
            (0 until n).map { i =>
              val f = reader.read(i)
              FrameRow(r.doc_id, i, f.getWidth, f.getHeight)
            }.iterator
          // corrupt-blob failures only (IOException plus the GIF reader's
          // raw RuntimeExceptions on malformed blobs): a truncated blob
          // legitimately yields no rows, but a decoder CODE regression
          // (NPE, class errors) must surface, not shrink the result set
          } catch { case t: Throwable if corruptBlobFailure(t) => Iterator.empty }
          finally reader.dispose()
        }
      }
    }
  }

  /** REAL scene-cut detection over decoded GIF frames: per adjacent frame
    * pair, the sum of absolute per-channel pixel deltas (exact long over
    * the full rasters), reported per pixel (truncating div) and flagged a
    * cut above the threshold — the shot-boundary primitive of every video
    * ingest pipeline. GIF decode is LOSSLESS (palette round-trips the
    * synthetic fills exactly), which is what lets the oracle recompute
    * the per-pixel SAD closed-form from the generation rule while the
    * gate earns it from real rasters; the MJPEG twin would be decoder-
    * dependent (JPEG is lossy) and is deliberately not gated on pixels.
    */
  def gifSceneCuts(spark: SparkSession, media: DataFrame,
                   threshold: Long = 60L): Dataset[SceneCut] = {
    import spark.implicits._
    media.select("doc_id", "media").as[ImageRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
        if (!readers.hasNext) Iterator.empty
        else {
          val reader = readers.next()
          try {
            ensureMemCachedIo()
            reader.setInput(javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(r.media)))
            val n = reader.getNumImages(true)
            var prev: java.awt.image.BufferedImage = null
            (0 until n).flatMap { i =>
              val f = reader.read(i)
              val out = if (prev != null && prev.getWidth == f.getWidth &&
                  prev.getHeight == f.getHeight) {
                var sad = 0L
                var y = 0
                while (y < f.getHeight) {
                  var x = 0
                  while (x < f.getWidth) {
                    val a = prev.getRGB(x, y); val b = f.getRGB(x, y)
                    sad += math.abs(((a >> 16) & 0xff) - ((b >> 16) & 0xff)) +
                      math.abs(((a >> 8) & 0xff) - ((b >> 8) & 0xff)) +
                      math.abs((a & 0xff) - (b & 0xff))
                    x += 1
                  }
                  y += 1
                }
                val perPx = sad / (f.getWidth.toLong * f.getHeight)
                Some(SceneCut(r.doc_id, i, perPx, perPx > threshold))
              } else None
              prev = f
              out
            }.iterator
          // corrupt-blob failures only (IOException plus the GIF reader's
          // raw RuntimeExceptions on malformed blobs): a truncated blob
          // legitimately yields no rows, but a decoder CODE regression
          // (NPE, class errors) must surface, not shrink the result set
          } catch { case t: Throwable if corruptBlobFailure(t) => Iterator.empty }
          finally reader.dispose()
        }
      }
    }
  }

  /** REAL PCM16 WAV sample decode: RIFF walk to the `data` chunk, then
    * little-endian 16-bit samples. Sums are exact longs; rms is the one
    * sqrt at the end.
    */
  def wavStats(spark: SparkSession, media: DataFrame): Dataset[WavStats] = {
    import spark.implicits._
    media.select("doc_id", "media").as[ImageRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val b = r.media
        def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
          ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
        def tag(o: Int, s: String) = b.length >= o + 4 &&
          new String(b, o, 4, "US-ASCII") == s
        if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) Iterator.empty
        else {
          // chunk walk: fmt must be PCM16; data carries the samples. The
          // cursor is a Long and negative/huge chunk lengths bail out —
          // a corrupt length field must degrade to no row, never hang the
          // task (len = -8 would otherwise advance the cursor by zero) or
          // throw on an overflowed offset.
          var o = 12L; var dataAt = -1L; var dataLen = 0; var ok = false
          var corrupt = false
          while (!corrupt && o + 8 <= b.length && (dataAt < 0 || !ok)) {
            val id = new String(b, o.toInt, 4, "US-ASCII"); val len = le32(o.toInt + 4)
            if (len < 0) corrupt = true
            else {
              if (id == "fmt " && o + 24 <= b.length)
                ok = ((b(o.toInt + 8) & 0xff) | ((b(o.toInt + 9) & 0xff) << 8)) == 1 &&
                     ((b(o.toInt + 22) & 0xff) | ((b(o.toInt + 23) & 0xff) << 8)) == 16
              if (id == "data") { dataAt = o + 8; dataLen = len }
              o += 8L + len.toLong + (len & 1)
            }
          }
          if (corrupt || !ok || dataAt < 0 || dataAt + dataLen > b.length) Iterator.empty
          else {
            val da = dataAt.toInt
            val n = dataLen / 2
            var i = 0; var sumAbs = 0L; var sumSq = 0L; var peak = 0L
            while (i < n) {
              val s = ((b(da + 2 * i) & 0xff) |
                       (b(da + 2 * i + 1) << 8)).toShort.toLong
              val a = math.abs(s)
              sumAbs += a; sumSq += s * s; if (a > peak) peak = a
              i += 1
            }
            Iterator.single(WavStats(r.doc_id, n,
              if (n == 0) 0.0 else sumAbs.toDouble / n,
              if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n), peak))
          }
        }
      }
    }
  }

  /** Windowed PCM energy over REAL WAV decode: per `winSamples`-sample
    * window, exact integer sum of squares / sum of |s| — the loudness/
    * silence-detection primitive audio curation filters on (silence
    * trimming, clipping detection, VAD pre-screens). Same RIFF chunk walk
    * as [[wavStats]]; emits one row per (doc, window), all-BIGINT so the
    * gate hash-compares with a closed-form oracle. Partition-parallel:
    * each task decodes its own docs, no shuffle until the caller's.
    */
  def wavWindows(spark: SparkSession, media: DataFrame,
                 winSamples: Int): Dataset[WavWindow] = {
    import spark.implicits._
    media.select("doc_id", "media").as[ImageRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val b = r.media
        def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
          ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
        def tag(o: Int, s: String) = b.length >= o + 4 &&
          new String(b, o, 4, "US-ASCII") == s
        if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) Iterator.empty
        else {
          var o = 12L; var dataAt = -1L; var dataLen = 0; var ok = false
          var corrupt = false
          while (!corrupt && o + 8 <= b.length && (dataAt < 0 || !ok)) {
            val id = new String(b, o.toInt, 4, "US-ASCII"); val len = le32(o.toInt + 4)
            if (len < 0) corrupt = true
            else {
              if (id == "fmt " && o + 24 <= b.length)
                ok = ((b(o.toInt + 8) & 0xff) | ((b(o.toInt + 9) & 0xff) << 8)) == 1 &&
                     ((b(o.toInt + 22) & 0xff) | ((b(o.toInt + 23) & 0xff) << 8)) == 16
              if (id == "data") { dataAt = o + 8; dataLen = len }
              o += 8L + len.toLong + (len & 1)
            }
          }
          if (corrupt || !ok || dataAt < 0 || dataAt + dataLen > b.length) Iterator.empty
          else {
            val da = dataAt.toInt
            val n = dataLen / 2
            (0 until (n + winSamples - 1) / winSamples).iterator.map { w =>
              val from = w * winSamples
              val until = math.min(from + winSamples, n)
              var i = from; var sumAbs = 0L; var sumSq = 0L
              while (i < until) {
                val s = ((b(da + 2 * i) & 0xff) |
                         (b(da + 2 * i + 1) << 8)).toShort.toLong
                sumAbs += math.abs(s); sumSq += s * s
                i += 1
              }
              WavWindow(r.doc_id, w.toLong, (until - from).toLong, sumSq, sumAbs)
            }
          }
        }
      }
    }
  }

  /** Partition-parallel feature extraction — the `mapPartitions` shape an
    * external decoder (JNI/ffmpeg) runs in: batch-amortized setup per
    * partition, one feature row per media row. The feature is a 16-bin
    * byte histogram — a real (if simple) content fingerprint, useful as a
    * cheap dedup/corruption signal over any payload; swap the loop body
    * for a codec call to extract richer features in the same plan shape.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select("doc_id", "media", "media_kind").as[MediaRow].mapPartitions { rows =>
      // per-partition setup would init the decoder here (once, not per row)
      rows.map { r =>
        val hist = new Array[Long](16)
        var i = 0
        while (i < r.media.length) { hist((r.media(i) & 0xff) >> 4) += 1; i += 1 }
        MediaFeature(r.doc_id, r.media_kind, hist)
      }
    }
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-header metadata decode for an opaque media `binary` column —
  * REAL byte parsing of the public container formats (PNG IHDR, JPEG SOF
  * markers, GIF logical screen, BMP info header, RIFF/WAVE fmt chunk), no
  * media libraries needed. This replaces the deterministic stub the
  * multimodal pipeline shipped with: pixel/sample DECODING still needs a
  * codec library, but format detection + dimensions/audio-shape come
  * straight from the header bytes.
  *
  * Returns `struct(format, width, height, sample_rate, channels, bits)`
  * with nulls for fields a format doesn't carry; unrecognized payloads
  * yield `("unknown", null...)` rather than an error — at 100 TB some rows
  * WILL be garbage and a poison row must not kill the stage.
  */
case class MediaMeta(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = MediaMeta.schema
  override def checkInputDataTypes() = child.dataType match {
    case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"media_meta expects binary, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val m = MediaMeta.parse(input.asInstanceOf[Array[Byte]])
    InternalRow(UTF8String.fromString(m.format),
      m.width.map(Int.box).orNull, m.height.map(Int.box).orNull,
      m.sampleRate.map(Int.box).orNull, m.channels.map(Int.box).orNull,
      m.bits.map(Int.box).orNull)
  }

  override protected def withNewChildInternal(newChild: Expression): MediaMeta = copy(newChild)
}

object MediaMeta {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType)))

  final case class Meta(format: String,
                        width: Option[Int] = None, height: Option[Int] = None,
                        sampleRate: Option[Int] = None, channels: Option[Int] = None,
                        bits: Option[Int] = None)

  private def be16(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(j => (b(i + j) & 0xff) == s.charAt(j))

  /** Dispatch on magic bytes; every branch bounds-checks and falls through
    * to "unknown" on truncated/garbage payloads.
    */
  def parse(b: Array[Byte]): Meta = {
    if (b.length >= 24 && be32(b, 0) == 0x89504e47 && be32(b, 4) == 0x0d0a1a0a &&
        ascii(b, 12, "IHDR"))
      Meta("png", width = Some(be32(b, 16)), height = Some(be32(b, 20)))
    else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      parseJpeg(b)
    else if (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a"))
      if (b.length >= 10) Meta("gif", width = Some(le16(b, 6)), height = Some(le16(b, 8)))
      else Meta("unknown")
    else if (ascii(b, 0, "BM") && b.length >= 26)
      Meta("bmp", width = Some(le32(b, 18)), height = Some(math.abs(le32(b, 22))))
    else if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE"))
      parseWav(b)
    else if (ascii(b, 0, "RIFF") && ascii(b, 8, "AVI "))
      parseAvi(b)
    else Meta("unknown")
  }

  /** Walk RIFF lists to `hdrl`; the mandatory leading `avih` chunk carries
    * dwWidth/dwHeight at fixed offsets 32/36 of its body. Long cursor for
    * the same overflow-proofing as [[parseWav]]; any corruption yields
    * `Meta("avi")` without dimensions — the RIFF/AVI magic already
    * certified the FORMAT, so a bad chunk length may only cost the dims.
    */
  private def parseAvi(b: Array[Byte]): Meta = {
    var i = 12L
    while (i + 8 <= b.length) {
      val size = le32(b, i.toInt + 4)
      if (size < 0) return Meta("avi")
      if (ascii(b, i.toInt, "LIST") && ascii(b, i.toInt + 8, "hdrl")) {
        val a = i.toInt + 12 // avih must open the hdrl list
        return if (ascii(b, a, "avih") && a + 8 + 40 <= b.length)
          Meta("avi", width = Some(le32(b, a + 8 + 32)),
            height = Some(le32(b, a + 8 + 36)))
        else Meta("avi") // format is certain; dimensions aren't
      }
      i += 8L + size.toLong + (size & 1)
    }
    Meta("avi")
  }

  /** Walk JPEG markers to the first SOF0/1/2 frame header (the public
    * JFIF layout: 0xFF marker, 2-byte big-endian segment length).
    */
  private def parseJpeg(b: Array[Byte]): Meta = {
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return Meta("unknown")
      val marker = b(i + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone
      else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return Meta("unknown")
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          if (len < 7) return Meta("unknown")
          return Meta("jpeg", width = Some(be16(b, i + 7)), height = Some(be16(b, i + 5)))
        }
        i += 2 + len
      }
    }
    Meta("unknown")
  }

  /** Scan RIFF chunks for `fmt ` (chunks are word-aligned). The cursor is
    * a LONG: a crafted size near Int.MaxValue would overflow an Int
    * increment negative and walk out of bounds — the never-throw contract
    * requires the skip arithmetic itself to be overflow-proof.
    */
  private def parseWav(b: Array[Byte]): Meta = {
    var i = 12L
    while (i + 8 <= b.length) {
      val size = le32(b, i.toInt + 4)
      if (ascii(b, i.toInt, "fmt ") && size >= 16 && i + 8 + 16 <= b.length) {
        val base = i.toInt + 8
        return Meta("wav",
          sampleRate = Some(le32(b, base + 4)),
          channels = Some(le16(b, base + 2)),
          bits = Some(le16(b, base + 14)))
      }
      if (size < 0) return Meta("unknown")
      i += 8L + size.toLong + (size & 1)
    }
    Meta("unknown")
  }

  /** Column wrapper: media_meta(binary) -> struct. */
  def media_meta(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(MediaMeta(ColumnShim.expression(c)))
  }
}

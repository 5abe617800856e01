package graft.server

import java.nio.charset.StandardCharsets.UTF_8

/** The reference's binary CoAP-style wire framing, pure JVM
  * (`/root/reference/src/protocol/zest.re:12-216`):
  *
  * {{{
  * frame   := header token options payload
  * header  := code:u8  oc:u8  tkl:u16be
  * token   := tkl raw bytes
  * options := oc x (number:u16be  len:u16be  value:len-bytes)
  * payload := remaining bytes
  * }}}
  *
  * Option numbers (CoAP-flavored, `zest.re:25-66`): 11 Uri-Path, 3
  * Uri-Host, 12 Content-Format (u16be: 0 text / 50 json / 42 binary,
  * `prov.re:30-36`), 6 Observe (string "", "data", "audit",
  * "notification"), 14 Max-Age (u32be seconds), 2048 router public key.
  * Request codes 1 GET / 2 POST / 4 DELETE; response codes ride the same
  * header (65 Created, 66 Deleted, 69 Content, 128/129/143/163 errors).
  *
  * Ack builders mirror `create_ack*` (`zest.re:155-216`): a bare code,
  * Content + format option + payload, the observe ack (format 0 +
  * router key + uuid payload), and the notification ack (key only,
  * code 65).
  */
object ZestCodec {

  final case class ZOption(number: Int, value: Array[Byte]) {
    def string: String = new String(value, UTF_8)
  }

  final case class Frame(code: Int, token: String, options: Seq[ZOption],
                         payload: Array[Byte]) {
    private def opt(n: Int): scala.Option[ZOption] = options.find(_.number == n)
    def uriPath: String = opt(11).map(_.string).getOrElse("")
    def uriHost: String = opt(3).map(_.string).getOrElse("")
    /** `prov.re:30-36`: 0 text, 50 json, 42 binary. */
    def contentFormat: Int = opt(12).map(o => u16(o.value, 0)).getOrElse(0)
    def contentFormatName: String = ZestCodec.formatName(contentFormat)
    /** `zest.re:53-66`: absent -> "none", "" -> "data". */
    def observed: String = opt(6).map(_.string) match {
      case Some("") | Some("data") => "data"
      case Some("audit")           => "audit"
      case Some("notification")    => "notification"
      case _                       => "none"
    }
    def maxAge: Long = opt(14).map(o => u32(o.value, 0)).getOrElse(60L)
    def payloadString: String = new String(payload, UTF_8)
  }

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  def encode(f: Frame): Array[Byte] = {
    val token = f.token.getBytes(UTF_8)
    require(token.length <= 0xffff, "token too long")
    require(f.options.size <= 0xff, "too many options")
    val optBytes = f.options.map { o =>
      require(o.value.length <= 0xffff, s"option ${o.number} too long")
      val b = new Array[Byte](4 + o.value.length)
      b(0) = (o.number >> 8).toByte; b(1) = o.number.toByte
      b(2) = (o.value.length >> 8).toByte; b(3) = o.value.length.toByte
      System.arraycopy(o.value, 0, b, 4, o.value.length)
      b
    }
    val out = java.nio.ByteBuffer.allocate(
      4 + token.length + optBytes.map(_.length).sum + f.payload.length)
    out.put(f.code.toByte).put(f.options.size.toByte)
      .putShort(token.length.toShort)
    out.put(token)
    optBytes.foreach(out.put)
    out.put(f.payload)
    out.array()
  }

  /** Parse a frame; malformed input raises `IllegalArgumentException`
    * (the reference `failwith`s — `zest.re:68-115`).
    */
  def decode(bytes: Array[Byte]): Frame = {
    require(bytes.length >= 4, "frame shorter than header")
    val code = bytes(0) & 0xff
    val oc = bytes(1) & 0xff
    val tkl = u16(bytes, 2)
    var pos = 4
    require(bytes.length >= pos + tkl, "invalid token")
    val token = new String(bytes, pos, tkl, UTF_8)
    pos += tkl
    val opts = (0 until oc).map { _ =>
      require(bytes.length >= pos + 4, "invalid options")
      val number = u16(bytes, pos); val len = u16(bytes, pos + 2)
      pos += 4
      require(bytes.length >= pos + len, "invalid option value")
      val v = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len
      ZOption(number, v)
    }
    Frame(code, token, opts, java.util.Arrays.copyOfRange(bytes, pos, bytes.length))
  }

  /** THE CoAP content-format table (`prov.re:30-36`) — one copy, used by
    * frame parsing and both wire servers.
    */
  def formatName(code: Int): String = code match {
    case 0 => "text"; case 50 => "json"; case 42 => "binary"
    case _ => "unknown"
  }
  def formatCode(name: String): Int = name match {
    case "text" => 0; case "json" => 50; case "binary" => 42
    case _ => -1
  }

  // ---- builders ------------------------------------------------------------

  def strOption(number: Int, value: String): ZOption =
    ZOption(number, value.getBytes(UTF_8))
  def u16Option(number: Int, value: Int): ZOption =
    ZOption(number, Array[Byte]((value >> 8).toByte, value.toByte))
  def u32Option(number: Int, value: Long): ZOption =
    ZOption(number, Array[Byte]((value >> 24).toByte, (value >> 16).toByte,
      (value >> 8).toByte, value.toByte))

  /** A client request: GET/POST/DELETE with path, host, format and the
    * observe/max-age options where given.
    */
  def request(code: Int, path: String, format: Int = 50, token: String = "",
              host: String = "client.local", payload: String = "",
              observe: scala.Option[String] = None,
              maxAgeSec: scala.Option[Long] = None): Frame =
    Frame(code, token,
      Seq(strOption(11, path), strOption(3, host), u16Option(12, format)) ++
        observe.map(strOption(6, _)) ++ maxAgeSec.map(u32Option(14, _)),
      payload.getBytes(UTF_8))

  /** `create_ack` — a bare response code. */
  def ack(code: Int): Frame = Frame(code, "", Seq.empty, Array.emptyByteArray)

  /** `create_ack_payload` — 69 Content + format + body. */
  def ackPayload(format: Int, payload: String): Frame =
    Frame(69, "", Seq(u16Option(12, format)), payload.getBytes(UTF_8))

  /** `create_ack_observe` — 69 + format 0 + router key + uuid payload. */
  def ackObserve(publicKey: String, uuid: String): Frame =
    Frame(69, "", Seq(u16Option(12, 0), strOption(2048, publicKey)),
      uuid.getBytes(UTF_8))

  /** `create_ack_notification` — 65 + router key. */
  def ackNotification(publicKey: String): Frame =
    Frame(65, "", Seq(strOption(2048, publicKey)), Array.emptyByteArray)
}

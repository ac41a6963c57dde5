package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Container-header metadata extraction for multimodal binary columns
  * (SURVEY.md §2.4 #40) — the REAL (non-stub) half of the multimodal
  * pipeline: at 100 TB you read width/height/sample-rate from the first
  * bytes of every payload to route/filter/deduplicate BEFORE paying for
  * any codec decode. Pure JVM byte parsing from public container specs
  * (PNG, JPEG/JFIF, GIF, BMP, WAV/RIFF) — no codec libraries, no
  * allocation beyond the output row, one pass over at most the header
  * region.
  *
  * Reference behavior: NiFi pairs IdentifyMimeType (magic sniffing,
  * `Records.identifyMime`) with metadata extraction before routing
  * media flows; this expression is the metadata half.
  */
object MediaExpressions {

  val headerType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bit_depth", IntegerType)))

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  @inline private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  @inline private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  @inline private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  @inline private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  @inline private def ascii(b: Array[Byte], i: Int, s: String): Boolean = {
    var j = 0
    while (j < s.length) { if (b(i + j) != s.charAt(j).toByte) return false; j += 1 }
    true
  }

  private val NullInt: Any = null

  private def row(fmt: String, w: Any = NullInt, h: Any = NullInt, rate: Any = NullInt,
                  ch: Any = NullInt, depth: Any = NullInt): InternalRow =
    InternalRow(UTF8String.fromString(fmt), w, h, rate, ch, depth)

  private def clampInt(v: Long): Any = if (v >= 0 && v <= Int.MaxValue) v.toInt else NullInt

  /** PNG: 8-byte magic, then the IHDR chunk (mandatory first chunk):
    * width/height as big-endian u32 at 16/20, bit depth + color type at
    * 24/25. Channels derived from the color type per the PNG spec. */
  private def png(b: Array[Byte]): InternalRow = {
    if (b.length < 26 || !ascii(b, 12, "IHDR")) return row("png")
    val channels = u8(b, 25) match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette index
      case 4 => 2 // grey + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return row("png", clampInt(be32(b, 16)), clampInt(be32(b, 20)),
        NullInt, NullInt, u8(b, 24))
    }
    row("png", clampInt(be32(b, 16)), clampInt(be32(b, 20)), NullInt, channels, u8(b, 24))
  }

  /** GIF87a/89a: logical screen width/height as little-endian u16 at
    * 6/8. Pixel depth lives in a packed field — not reported here. */
  private def gif(b: Array[Byte]): InternalRow =
    if (b.length < 10) row("gif") else row("gif", le16(b, 6), le16(b, 8))

  /** BMP: BITMAPINFOHEADER width (signed LE32) at 18, height at 22
    * (negative = top-down; reported as magnitude), bpp (LE16) at 28.
    * Channels = bpp/8 for the byte-aligned depths. */
  private def bmp(b: Array[Byte]): InternalRow = {
    if (b.length < 30) return row("bmp")
    val w = le32(b, 18).toInt
    val h = math.abs(le32(b, 22).toInt)
    val bpp = le16(b, 28)
    val ch = if (bpp >= 8 && bpp % 8 == 0 && bpp <= 32) bpp / 8 else NullInt
    row("bmp", clampInt(w.toLong), clampInt(h.toLong), NullInt, ch, bpp)
  }

  /** JPEG: walk the marker segments until a start-of-frame (SOF0/1/2/…,
    * excluding DHT/JPG/DAC): precision u8, height/width BE16, component
    * count u8 follow the segment length. Standalone markers (RSTn, TEM,
    * SOI/EOI) carry no length field. */
  private def jpeg(b: Array[Byte]): InternalRow = {
    var i = 2
    val n = b.length
    while (i + 3 < n) {
      if (u8(b, i) != 0xFF) return row("jpeg") // desynced: not a marker
      var m = u8(b, i + 1)
      while (m == 0xFF && i + 2 < n) { i += 1; m = u8(b, i + 1) } // fill bytes
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) { i += 2 } // standalone
      else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > n) return row("jpeg")
        val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
        if (isSof) {
          if (len < 8) return row("jpeg")
          return row("jpeg", be16(b, i + 7), be16(b, i + 5), NullInt, u8(b, i + 9), u8(b, i + 4))
        }
        i += 2 + len
      }
    }
    row("jpeg")
  }

  /** WAV: RIFF chunk walk to "fmt " — channels LE16 at data+2, sample
    * rate LE32 at data+4, bits per sample LE16 at data+14. Chunks are
    * word-aligned (odd sizes padded). */
  private def wav(b: Array[Byte]): InternalRow = {
    var i = 12
    val n = b.length
    while (i + 8 <= n) {
      val size = le32(b, i + 4)
      if (ascii(b, i, "fmt ") && size >= 16 && i + 8 + 16 <= n) {
        val d = i + 8
        return row("wav", NullInt, NullInt, clampInt(le32(b, d + 4)), le16(b, d + 2),
          le16(b, d + 14))
      }
      if (size < 0 || size > n) return row("wav")
      i += 8 + size.toInt + (size.toInt & 1)
    }
    row("wav")
  }

  /** Dispatch on magic bytes; unrecognized/truncated → ("unknown", nulls). */
  def parse(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n >= 8 && be32(b, 0) == 0x89504E47L && be32(b, 4) == 0x0D0A1A0AL) png(b)
    else if (n >= 6 && ascii(b, 0, "GIF8") && (b(4) == '7' || b(4) == '9') && b(5) == 'a') gif(b)
    else if (n >= 2 && u8(b, 0) == 0x42 && u8(b, 1) == 0x4D) bmp(b)
    else if (n >= 3 && u8(b, 0) == 0xFF && u8(b, 1) == 0xD8 && u8(b, 2) == 0xFF) jpeg(b)
    else if (n >= 12 && ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) wav(b)
    else row("unknown")
  }

  def mediaHeader(c: Column): Column = ColumnBridge.column(
    MediaHeader(ColumnBridge.expression(c)))
}

/** `graft_media_header(binary)` → struct(format, width, height,
  * sample_rate, channels, bit_depth). Null-safe; never throws on
  * malformed bytes (returns "unknown" / null fields) — a corrupt payload
  * among billions must not fail the job. */
case class MediaHeader(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = MediaExpressions.headerType
  override def prettyName: String = "graft_media_header"
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MediaExpressions.parse(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

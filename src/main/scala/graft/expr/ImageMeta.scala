package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native image-header decode: PNG / JPEG / GIF container metadata
  * (format, width, height, channels, bit_depth) parsed straight from a
  * `binary` column's bytes — the real half of the multimodal decode
  * story (reference: the pipeline treats media as opaque blobs; here
  * the container STRUCTURE is decoded for real, only pixel decode
  * stays behind the pluggable `Multimodal.MediaDecoder`).
  *
  * Zero dependencies, header-only: no pixel data is touched, so the
  * cost per row is a bounded marker scan (JPEG) or two fixed-offset
  * reads (PNG/GIF) — safe inside whole-stage codegen on a 100 TB blob
  * column, and the blob itself is projected away right after. Formats:
  *  - PNG: 8-byte signature + IHDR chunk (width/height 32-bit BE, bit
  *    depth, color type → channels 1/3 for gray/RGB, 2/4 with alpha,
  *    1 for palette)
  *  - JPEG: SOI then marker scan skipping segments by length to the
  *    first SOF0–SOF15 frame header (except DHT/JPG/DAC), reading
  *    precision, height, width, component count. Fill bytes and
  *    standalone markers (RST, TEM) are skipped per the spec
  *  - GIF: GIF87a/GIF89a signature + logical-screen width/height
  *    (16-bit LE), palette-indexed → 1 channel, 8-bit
  *  - WEBP: RIFF/WEBP container — VP8 lossy key-frame header (14-bit
  *    dims behind the 9D 01 2A start code), VP8L lossless (packed
  *    14-bit dims + alpha hint), VP8X extended (24-bit canvas dims,
  *    alpha flag)
  *
  * Anything else — truncated headers, zero dimensions, non-image bytes
  * — yields NULL, never an error: at corpus scale a media column always
  * carries undecodable rows and a filter on `meta IS NULL` is the
  * triage query.
  */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageMeta.Schema

  // parse returns null for undecodable bytes even when input is non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"${ImageMeta.FunctionName} expects binary, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    ImageMeta.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.ImageMeta.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

object ImageMeta {
  val FunctionName = "graft_image_meta"

  val Schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false)))

  private def row(fmt: String, w: Int, h: Int, ch: Int, depth: Int): InternalRow =
    if (w <= 0 || h <= 0) null
    else InternalRow(UTF8String.fromString(fmt), w, h, ch, depth)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  /** bytes → metadata InternalRow, or null if not a parseable image
    * header. Static so generated code calls it directly.
    */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 10) return null
    // ---- PNG: \x89PNG\r\n\x1a\n + IHDR as the first chunk
    if ((b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A && b(7) == 0x0A) {
      if (b.length < 26) return null
      if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
        return null
      val w = be32(b, 16); val h = be32(b, 20)
      val depth = b(24) & 0xFF
      val channels = (b(25) & 0xFF) match {
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette-indexed
        case 4 => 2 // gray + alpha
        case 6 => 4 // truecolor + alpha
        case _ => return null
      }
      return row("png", w, h, channels, depth)
    }
    // ---- JPEG: SOI, then segments to the first frame header (SOFn)
    if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xFF) != 0xFF) return null // desynced — not a JPEG
        // fill bytes: consecutive FFs pad before a marker
        var j = i
        while (j + 1 < b.length && (b(j + 1) & 0xFF) == 0xFF) j += 1
        if (j + 1 >= b.length) return null
        val marker = b(j + 1) & 0xFF
        if (marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          // SOFn: len(2) precision(1) height(2) width(2) ncomp(1)
          if (j + 9 >= b.length) return null
          val depth = b(j + 4) & 0xFF
          val h = be16(b, j + 5); val w = be16(b, j + 7)
          val ncomp = b(j + 9) & 0xFF
          return row("jpeg", w, h, ncomp, depth)
        } else if (marker == 0xD9 || marker == 0xDA) {
          return null // EOI / scan start without a frame header
        } else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
          i = j + 2 // standalone marker, no length field
        } else {
          if (j + 3 >= b.length) return null
          val len = be16(b, j + 2)
          if (len < 2) return null
          i = j + 2 + len
        }
      }
      return null
    }
    // ---- GIF: GIF87a / GIF89a + logical screen descriptor
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      return row("gif", le16(b, 6), le16(b, 8), 1, 8)
    }
    // ---- WEBP: RIFF container, first chunk VP8 (lossy) / VP8L
    // (lossless) / VP8X (extended)
    if (b.length >= 16 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') {
      val fourcc = new String(Array(b(12), b(13), b(14), b(15)),
        java.nio.charset.StandardCharsets.US_ASCII)
      fourcc match {
        case "VP8 " if b.length >= 30 =>
          // key-frame header: 3-byte frame tag, start code 9D 01 2A,
          // then 14-bit LE width/height
          if ((b(23) & 0xFF) != 0x9D || (b(24) & 0xFF) != 0x01 ||
              (b(25) & 0xFF) != 0x2A) return null
          return row("webp", le16(b, 26) & 0x3FFF, le16(b, 28) & 0x3FFF, 3, 8)
        case "VP8L" if b.length >= 25 =>
          // signature 2F, then width-1 in bits 0..13, height-1 in
          // 14..27, alpha hint in bit 28
          if ((b(20) & 0xFF) != 0x2F) return null
          val bits = (b(21) & 0xFFL) | ((b(22) & 0xFFL) << 8) |
            ((b(23) & 0xFFL) << 16) | ((b(24) & 0xFFL) << 24)
          val ch = if (((bits >> 28) & 1L) == 1L) 4 else 3
          return row("webp", (bits & 0x3FFF).toInt + 1,
            ((bits >> 14) & 0x3FFF).toInt + 1, ch, 8)
        case "VP8X" if b.length >= 30 =>
          // payload: 1 flag byte (bit 4 = alpha), 3 reserved, then
          // 24-bit LE canvas width-1 / height-1
          val ch = if ((b(20) & 0x10) != 0) 4 else 3
          def le24(i: Int): Int =
            (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16)
          return row("webp", le24(24) + 1, le24(27) + 1, ch, 8)
        case _ => return null
      }
    }
    null
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, exprs => ImageMeta(exprs.head), "built-in")
}

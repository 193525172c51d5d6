package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native video-container decode — completes the [[ImageMeta]] /
  * [[AudioMeta]] triad: (format, width, height, duration_ms,
  * timescale) from an MP4/MOV (ISO BMFF) `binary` column. Header-only
  * box walk: top level to `moov`, then `mvhd` (timescale + duration)
  * and each `trak`'s `tkhd` (16.16 fixed-point canvas dims; the first
  * track with nonzero dims wins — audio tracks carry 0×0). Version-1
  * (64-bit) mvhd/tkhd variants are handled; `mdat` payloads are never
  * touched, so per-row cost is bounded by the moov size.
  *
  * duration_ms = duration·1000 / timescale in integer (long)
  * arithmetic — deterministic, oracle-mirrorable. Truncated/garbage/
  * non-video bytes → NULL (the `meta IS NULL` triage contract).
  */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = VideoMeta.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"${VideoMeta.FunctionName} expects binary, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    VideoMeta.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.VideoMeta.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)
}

object VideoMeta {
  val FunctionName = "graft_video_meta"

  val Schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("timescale", IntegerType, nullable = false)))

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def u64(b: Array[Byte], o: Int): Long = (u32(b, o) << 32) | u32(b, o + 4)

  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Walk sibling boxes in [from, to); return (payloadStart,
    * payloadEnd) of the first box named `name`, or null.
    */
  private def findBox(b: Array[Byte], from: Int, to: Int,
      name: String): Array[Int] = {
    var o = from
    while (o + 8 <= to) {
      var size = u32(b, o)
      var hdr = 8
      if (size == 1 && o + 16 <= to) { size = u64(b, o + 8); hdr = 16 }
      else if (size == 0) size = (to - o).toLong
      if (size < hdr || size > to - o) return null
      if (tag(b, o + 4) == name) return Array(o + hdr, o + size.toInt)
      o += size.toInt
    }
    null
  }

  /** Header parse; null for anything undecodable. Public + static so
    * generated code can call it (the ImageMeta pattern).
    */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return null
    // an ISO BMFF file leads with ftyp (mp4/mov brands); require it so
    // arbitrary binaries with a lucky moov string don't parse
    if (tag(b, 4) != "ftyp") return null
    val moov = findBox(b, 0, b.length, "moov")
    if (moov == null) return null
    val mvhd = findBox(b, moov(0), moov(1), "mvhd")
    if (mvhd == null || mvhd(1) - mvhd(0) < 20) return null
    val mv = mvhd(0)
    val ver = b(mv) & 0xff
    val (timescale, duration) =
      if (ver == 1) {
        if (mvhd(1) - mv < 32) return null
        (u32(b, mv + 20), u64(b, mv + 24))
      } else (u32(b, mv + 12), u32(b, mv + 16))
    if (timescale <= 0 || timescale > Int.MaxValue || duration < 0) return null
    // first trak whose tkhd carries nonzero 16.16 dims
    var w = 0; var h = 0
    var o = moov(0)
    while (o < moov(1) && (w == 0 || h == 0)) {
      val trak = findBox(b, o, moov(1), "trak")
      if (trak == null) o = moov(1)
      else {
        val tk = findBox(b, trak(0), trak(1), "tkhd")
        if (tk != null) {
          val base = tk(0)
          val tver = b(base) & 0xff
          // v0: width at +76, height at +80; v1 adds 12 bytes of
          // 64-bit times/duration before the layer block
          val wOff = if (tver == 1) 88 else 76
          if (tk(1) - base >= wOff + 8) {
            val tw = (u32(b, base + wOff) >> 16).toInt
            val th = (u32(b, base + wOff + 4) >> 16).toInt
            if (tw > 0 && th > 0) { w = tw; h = th }
          }
        }
        o = trak(1)
      }
    }
    if (w <= 0 || h <= 0) return null
    InternalRow(UTF8String.fromString("mp4"), w, h,
      duration * 1000L / timescale, timescale.toInt)
  }

  /** Register in the session registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, exprs => VideoMeta(exprs(0)), "built-in")
}

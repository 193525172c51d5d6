package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native audio-header decode — the audio sibling of [[ImageMeta]]:
  * (format, channels, sample_rate, bit_depth, n_frames) parsed
  * straight from a `binary` column's bytes. Same multimodal contract:
  * container STRUCTURE decodes for real, sample decode stays behind
  * the pluggable `Multimodal.MediaDecoder`; cost per row is a bounded
  * chunk scan that never touches the audio payload, so the blob
  * projects away right after. Formats:
  *  - WAV: RIFF/WAVE container; chunk walk (sizes u32 LE, odd sizes
  *    padded per spec) to `fmt ` (channels, sample rate, block align,
  *    bits per sample) and `data` (n_frames = data size / block
  *    align). `fmt ` is required; a missing `data` chunk yields
  *    n_frames 0 (streaming-style headers).
  *  - FLAC: `fLaC` magic + STREAMINFO metadata block (bit-packed:
  *    20-bit sample rate, 3-bit channels−1, 5-bit bits−1, 36-bit
  *    total samples — n_frames = total inter-channel samples).
  *
  * Truncated/garbage/non-audio bytes → NULL, never an error (the
  * `meta IS NULL` triage contract).
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioMeta.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"${AudioMeta.FunctionName} expects binary, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    AudioMeta.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.AudioMeta.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

object AudioMeta {
  val FunctionName = "graft_audio_meta"

  val Schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  private def row(fmt: String, ch: Int, rate: Int, bits: Int,
      frames: Long): InternalRow =
    if (ch <= 0 || rate <= 0 || bits <= 0 || frames < 0) null
    else InternalRow(UTF8String.fromString(fmt), ch, rate, bits, frames)

  /** Header parse; null for anything undecodable. Public + static so
    * generated code can call it (the ImageMeta pattern).
    */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE") return parseWav(b)
    if (b.length >= 42 && tag(b, 0) == "fLaC") return parseFlac(b)
    null
  }

  private def parseWav(b: Array[Byte]): InternalRow = {
    var o = 12
    var ch = 0; var rate = 0L; var blockAlign = 0; var bits = 0
    var haveFmt = false; var dataSize = -1L
    while (o + 8 <= b.length && (!haveFmt || dataSize < 0)) {
      val id = tag(b, o)
      val size = u32le(b, o + 4)
      if (id == "fmt " && size >= 16 && o + 8 + 16 <= b.length) {
        ch = u16le(b, o + 10)
        rate = u32le(b, o + 12)
        blockAlign = u16le(b, o + 20)
        bits = u16le(b, o + 22)
        haveFmt = true
      } else if (id == "data") {
        dataSize = size
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      val step = size + (size & 1L)
      if (step < 0 || step > Int.MaxValue) return null
      o += 8 + step.toInt
    }
    if (!haveFmt || rate > Int.MaxValue) return null
    val frames =
      if (dataSize >= 0 && blockAlign > 0) dataSize / blockAlign else 0L
    row("wav", ch, rate.toInt, bits, frames)
  }

  private def parseFlac(b: Array[Byte]): InternalRow = {
    // metadata block header at 4: 1 byte (last-flag | type), 3-byte BE
    // length; STREAMINFO is type 0 with a 34-byte body
    if ((b(4) & 0x7f) != 0) return null
    val len = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
    if (len < 34 || b.length < 8 + 34) return null
    val o = 8 + 10 // skip min/max blocksize (2+2) and min/max framesize (3+3)
    val rate = ((b(o) & 0xff) << 12) | ((b(o + 1) & 0xff) << 4) |
      ((b(o + 2) & 0xff) >> 4)
    val ch = ((b(o + 2) >> 1) & 0x7) + 1
    val bits = (((b(o + 2) & 0x1) << 4) | ((b(o + 3) & 0xff) >> 4)) + 1
    val frames = ((b(o + 3) & 0xfL) << 32) | ((b(o + 4) & 0xffL) << 24) |
      ((b(o + 5) & 0xffL) << 16) | ((b(o + 6) & 0xffL) << 8) | (b(o + 7) & 0xffL)
    row("flac", ch, rate, bits, frames)
  }

  /** Register in the session registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, exprs => AudioMeta(exprs(0)), "built-in")
}

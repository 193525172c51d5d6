package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL audio sample decode — [[PixelStats]]'s audio sibling, closing
  * the content-tier asymmetry where images had pixel stats (q150) but
  * audio stopped at container headers ([[AudioMeta]]): WAV PCM sample
  * access is zero-dependency (offset + width come straight from the
  * fmt chunk), so the per-clip content signals a curation pipeline
  * filters on — loudness, clipping, silence — decode natively with no
  * external codec. Formats that genuinely need one (FLAC/MP3 payload,
  * non-PCM WAV) stay behind the `Multimodal.MediaDecoder` seam and
  * yield NULL here.
  *
  * Supported: RIFF/WAVE, `fmt ` audio format 1 (integer PCM), bit
  * depth 16 (signed little-endian) or 8 (unsigned, recentered by
  * −128 per the WAV convention so silence is 0 in both depths). The
  * data chunk must be fully present — a declared size running past
  * the buffer is a truncated file → NULL (the PNG truncated-IDAT
  * trade); a trailing partial frame (data size not a multiple of
  * block align) is floored to whole frames, matching how players
  * treat ragged tails. A `fmt ` whose block align disagrees with
  * channels·depth is malformed → NULL.
  *
  * Output struct (all EXACT integers, so a relational oracle replays
  * them from construction arithmetic): format, channels, sample_rate,
  * bit_depth, n_frames (decoded), n_samples (frames·channels), sum,
  * sumsq, peak (max |sample|), n_clipped (samples at full scale:
  * ±32767/−32768 at 16-bit, 0/255 raw at 8-bit), silent (1 iff every
  * sample is 0), plus PER-CHANNEL sumsq and peak arrays (channel
  * index = interleave position) — the per-channel RMS/peak a stereo
  * imbalance or dead-channel filter needs. Derived doubles (RMS,
  * clipping rate) belong downstream in ONE documented formula
  * ([[graft.operators.Multimodal.audioStats]]).
  *
  * Anything undecodable → NULL, never an error (the triage
  * contract). Scale shape: pure per-row projection, one pass over
  * the sample bytes, accumulator state = 2 longs + 2 small arrays of
  * `channels` entries; the blob projects away immediately after.
  */
case class AudioStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioStats.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"${AudioStats.FunctionName} expects binary, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    AudioStats.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.AudioStats.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AudioStats =
    copy(child = newChild)
}

object AudioStats {
  val FunctionName = "graft_audio_stats"

  /** Sanity bound on the channel count: WAV stores channels as u16,
    * so a crafted header can claim 65535 — the per-channel
    * accumulators would still be tiny, but no real PCM file exceeds
    * this, and bounding it keeps the output arrays triage-sized.
    */
  val MaxChannels = 64

  val Schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sum", LongType, nullable = false),
    StructField("sumsq", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("n_clipped", LongType, nullable = false),
    StructField("silent", IntegerType, nullable = false),
    StructField("ch_sumsq", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("ch_peak", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** bytes → sample-stats InternalRow, or null. Static for codegen. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (!(tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE")) return null
    // chunk walk (the AudioMeta shape) tracking the data chunk's
    // OFFSET, not just its size — the sample pass needs the bytes
    var o = 12
    var fmtCode = 0; var ch = 0; var rate = 0L; var blockAlign = 0
    var bits = 0; var haveFmt = false
    var dataOff = -1; var dataSize = -1L
    while (o + 8 <= b.length && (!haveFmt || dataOff < 0)) {
      val id = tag(b, o)
      val size = u32le(b, o + 4)
      if (id == "fmt " && size >= 16 && o + 8 + 16 <= b.length) {
        fmtCode = u16le(b, o + 8)
        ch = u16le(b, o + 10)
        rate = u32le(b, o + 12)
        blockAlign = u16le(b, o + 20)
        bits = u16le(b, o + 22)
        haveFmt = true
      } else if (id == "data") {
        dataOff = o + 8
        dataSize = size
      }
      val step = size + (size & 1L) // word alignment pad
      if (step < 0 || step > Int.MaxValue) return null
      o += 8 + step.toInt
    }
    if (!haveFmt || dataOff < 0 || rate <= 0 || rate > Int.MaxValue) return null
    if (fmtCode != 1) return null // only integer PCM decodes here
    if (ch <= 0 || ch > MaxChannels) return null
    if (bits != 8 && bits != 16) return null
    val bytesPer = bits / 8
    if (blockAlign != ch * bytesPer) return null // malformed fmt
    // truncated data chunk (declared size past the buffer) → NULL;
    // a ragged tail WITHIN the declared size floors to whole frames
    if (dataOff.toLong + dataSize > b.length) return null
    val frames = dataSize / blockAlign
    val nSamples = frames * ch
    var sum = 0L; var sumsq = 0L; var peak = 0; var clipped = 0L
    val chSumsq = new Array[Long](ch)
    val chPeak = new Array[Int](ch)
    var f = 0L
    var p = dataOff
    while (f < frames) {
      var c = 0
      while (c < ch) {
        val v =
          if (bits == 16) {
            val raw = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
            if (raw >= 32768) raw - 65536 else raw
          } else (b(p) & 0xFF) - 128
        sum += v
        val sq = v.toLong * v
        sumsq += sq
        chSumsq(c) += sq
        val a = if (v < 0) -v else v
        if (a > peak) peak = a
        if (a > chPeak(c)) chPeak(c) = a
        if ((bits == 16 && (v >= 32767 || v <= -32768)) ||
            (bits == 8 && (v >= 127 || v <= -128))) clipped += 1
        p += bytesPer
        c += 1
      }
      f += 1
    }
    InternalRow(UTF8String.fromString("wav"), ch, rate.toInt, bits,
      frames, nSamples, sum, sumsq, peak, clipped,
      if (peak == 0) 1 else 0,
      new GenericArrayData(chSumsq), new GenericArrayData(chPeak))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, exprs => AudioStats(exprs.head), "built-in")
}

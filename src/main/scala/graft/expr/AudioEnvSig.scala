package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Energy-envelope fingerprint over REAL decoded PCM —
  * [[PixelGridSig]]'s audio sibling, the map-side half of perceptual
  * AUDIO near-dup ([[graft.operators.Multimodal.audioNearDup]]): two
  * encodes of one clip that differ by gain, container padding, or a
  * ragged tail land on the same fingerprint even when their bytes
  * differ entirely.
  *
  * Recipe (the amplitude-envelope variant of the band-energy-sign
  * fingerprint family — Haitsma & Kalker's classic uses a filterbank;
  * with no FFT in a zero-dependency engine the time-domain envelope
  * is the honest equivalent, and its limits are documented: robust to
  * uniform gain and re-encoding, NOT to time shifts or speed change):
  *
  *  1. decode WAV integer PCM exactly as [[AudioStats]] (16-bit
  *     signed LE / 8-bit unsigned recentered; same chunk walk, same
  *     NULL triage for non-PCM/truncated/malformed);
  *  2. split the frame axis into `nFrames` equal windows with the
  *     SAME integer boundary rule as the pixel grid
  *     (lo = w·frames / nFrames) so the oracle replays it with
  *     integer division; env[w] = Σ |sample| over ALL channels in
  *     the window — an exact integer;
  *  3. ehash bit w (w < nFrames−1) = 1 iff env[w+1] > env[w] — the
  *     gradient-sign rule of the image dHash. A uniform integer gain
  *     scales every env[w] together, so strict > is preserved and
  *     the hash is gain-invariant (absent clipping), the same
  *     argument as dhash's brightness invariance.
  *
  * Fewer than nFrames decoded frames → NULL (a window would be
  * empty; too short to fingerprint at this resolution). An ALL-ZERO
  * envelope → NULL: digital silence has no content to fingerprint,
  * and at corpus scale every silent clip would otherwise collide on
  * ehash 0 in every band — the mass-bucket pathology is cut at the
  * source instead of left to the downstream bucket cap (silence is
  * better handled by [[AudioStats]]'s `silent` flag + exact dedup).
  *
  * Returns struct(n_frames, env array<long>, ehash long); NULL for
  * anything undecodable — never an error. Scale shape: pure per-row
  * projection, one pass over the samples, `nFrames` longs of state;
  * the blob projects away immediately after.
  */
case class AudioEnvSig(child: Expression, nFrames: Int)
    extends UnaryExpression {

  override def dataType: DataType = AudioEnvSig.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"${AudioEnvSig.FunctionName} expects binary, got " +
          child.dataType.catalogString)
    else if (nFrames < 2 || nFrames > 64)
      TypeCheckResult.TypeCheckFailure(
        s"${AudioEnvSig.FunctionName} nFrames must be in [2, 64] " +
          s"(ehash holds nFrames-1 gradient bits): $nFrames")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    AudioEnvSig.sig(v.asInstanceOf[Array[Byte]], nFrames)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.AudioEnvSig.sig($c, $nFrames);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AudioEnvSig =
    copy(child = newChild)
}

object AudioEnvSig {
  val FunctionName = "graft_audio_env_sig"

  val Schema: StructType = StructType(Seq(
    StructField("n_frames", LongType, nullable = false),
    StructField("env", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("ehash", LongType, nullable = false)))

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** bytes → (n_frames, env, ehash) InternalRow, or null. Static for
    * codegen (named `sig`, not `eval` — see [[LangIdWide.evalLang]]'s
    * static-forwarder note).
    */
  def sig(b: Array[Byte], nFrames: Int): InternalRow = {
    // chunk walk identical to AudioStats.parse — same accept/reject
    // set so a clip decodable there is fingerprintable here
    if (b == null || b.length < 12) return null
    if (!(tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE")) return null
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
      val step = size + (size & 1L)
      if (step < 0 || step > Int.MaxValue) return null
      o += 8 + step.toInt
    }
    if (!haveFmt || dataOff < 0 || rate <= 0 || rate > Int.MaxValue) return null
    if (fmtCode != 1) return null
    if (ch <= 0 || ch > AudioStats.MaxChannels) return null
    if (bits != 8 && bits != 16) return null
    val bytesPer = bits / 8
    if (blockAlign != ch * bytesPer) return null
    if (dataOff.toLong + dataSize > b.length) return null
    val frames = dataSize / blockAlign
    if (frames < nFrames) return null // a window would be empty
    val env = new Array[Long](nFrames)
    var w = 0
    while (w < nFrames) {
      // integer window boundaries — the pixel-grid block rule, so
      // the oracle replays them with plain integer division
      val lo = w * frames / nFrames
      val hi = (w + 1) * frames / nFrames
      var acc = 0L
      var f = lo
      while (f < hi) {
        var p = dataOff + (f * blockAlign).toInt
        var c = 0
        while (c < ch) {
          val v =
            if (bits == 16) {
              val raw = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
              if (raw >= 32768) raw - 65536 else raw
            } else (b(p) & 0xFF) - 128
          acc += (if (v < 0) -v else v)
          p += bytesPer
          c += 1
        }
        f += 1
      }
      env(w) = acc
      w += 1
    }
    var ehash = 0L
    var allZero = true
    w = 0
    while (w < nFrames - 1) {
      if (env(w) != 0L) allZero = false
      if (env(w + 1) > env(w)) ehash |= (1L << w)
      w += 1
    }
    if (env(nFrames - 1) != 0L) allZero = false
    if (allZero) return null // digital silence: no content to fingerprint
    new GenericInternalRow(Array[Any](nFrames.toLong,
      new GenericArrayData(env), ehash))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, exprs => AudioEnvSig(exprs.head,
        if (exprs.length > 1)
          ExprArgs.intLit(FunctionName, "nFrames", exprs(1))
        else 64),
      "built-in")
}

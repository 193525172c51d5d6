package graft.expr

/** Clean-room FLAC (Free Lossless Audio Codec) decoder — the LOSSLESS
  * arm of the [[graft.operators.Multimodal.AudioDecoder]] seam,
  * [[Mp3Decode]]'s sibling for the archival/music tier of a crawl
  * corpus. Implemented from the public format specification (the
  * xiph.org format document, now RFC 9639); no reference decoder
  * code consulted. Reference behavior cited: the reference pipeline
  * (joselrnz/rss-feed-etl) has no audio tier at all — this extends
  * the engine's training-data surface the way `docs/` extraction
  * extends its text surface.
  *
  * Unlike the MP3 decoder, NOTHING here is tabulated spec data: every
  * piece of FLAC is algorithmic (Rice codes are self-describing, LPC
  * coefficients travel in the stream, fixed predictors are the four
  * binomial difference filters), so a clean-room build decodes the
  * FULL format bit-exactly — no conformance tiers, no triage subset.
  * Supported end-to-end:
  *
  *  - the `fLaC` marker + metadata-block walk (STREAMINFO required
  *    first per spec; all other block types skipped structurally);
  *  - frame headers: both blocking strategies, all block-size codes
  *    (192 / 576·2^n / 256·2^n / 8- and 16-bit explicit), all sample
  *    -rate codes (STREAMINFO-inherited, the 11 fixed rates, 8-bit
  *    kHz / 16-bit Hz / 16-bit daHz explicit), the UTF-8-style coded
  *    frame/sample number (1–7 bytes), and the CRC-8 header check
  *    (poly 0x07);
  *  - subframes: CONSTANT, VERBATIM, FIXED orders 0–4 (the binomial
  *    predictors), LPC orders 1–32 (4-bit precision, 5-bit
  *    non-negative shift, in-stream signed coefficients), the
  *    wasted-bits (trailing-zero) unary flag, and the +1-bit side
  *    channel width;
  *  - residuals: both Rice methods (4- and 5-bit parameters),
  *    partition orders 0–15, zigzag sign mapping, and the escape
  *    code (5-bit raw width, width 0 = all-zero partition);
  *  - stereo decorrelation: left/side, right/side, and mid/side with
  *    the spec's lost-LSB reconstruction ((mid<<1 | side&1) ± side
  *    >> 1);
  *  - the frame CRC-16 (poly 0x8005) over header + aligned subframe
  *    bytes.
  *
  * Stored sample depths 8/16/24 decode (the real-world FLAC depths;
  * 12/20/32 triage to NULL — the WAV output contract downstream
  * ([[AudioStats]]) reads 8/16/24/32 and the odd widths have no WAV
  * form). Channel counts 1–8 (all assignments).
  *
  * Triage contract (the [[Mp3Decode]] shape): not-FLAC / malformed
  * header / unsupported depth → null; a corrupt or truncated FRAME
  * stops the walk and returns the frames already decoded (the ragged
  * -tail convention the WAV path floors with), null only when no
  * frame decoded. A failed CRC — header or frame — stops the walk
  * the same way: bits after a checksum mismatch are noise, never
  * "probably fine" samples. Output: standard 44-byte-header
  * little-endian PCM WAV at the stream's depth (8-bit recentered
  * unsigned per the WAV convention), interleaved.
  *
  * Bomb guards: decoded output capped at [[MaxPcmBytes]] (the walk
  * stops cleanly before exceeding it — a crafted STREAMINFO cannot
  * force an allocation), per-frame buffers bounded by the format's
  * own 65535-sample block ceiling × 8 channels, and Rice quotients
  * bounded so a crafted unary run cannot widen a residual past 32
  * bits (spec residuals are int32 by construction).
  *
  * Scale shape: pure per-row projection behind the seam — one pass,
  * no shuffle, state = one block's channel buffers; the blob projects
  * away immediately downstream.
  */
object FlacDecode {

  /** Decoded-output cap: 64 MiB PCM ≈ 6.3 min of 44.1 kHz stereo
    * 16-bit — far above any test payload, far below heap.
    */
  val MaxPcmBytes: Int = 1 << 26

  // ------------------------------------------------------------------
  // Bit reader (MSB-first — FLAC's packing order), bounds-checked:
  // any overrun throws and the frame walk stops at the prior frame.
  // ------------------------------------------------------------------

  private final class BitReader(b: Array[Byte], startByte: Int) {
    private var pos: Long = startByte.toLong * 8
    private val end: Long = b.length.toLong * 8
    def bit(): Int = {
      if (pos >= end) throw FlacEof
      val v = (b((pos >> 3).toInt) >> (7 - (pos & 7).toInt)) & 1
      pos += 1
      v
    }
    /** n ≤ 31 bits, MSB-first. */
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Unary: zeros until the terminating 1 (FLAC's convention). */
    def unary(): Int = {
      var q = 0
      while (bit() == 0) q += 1
      q
    }
    def align(): Unit = { pos = (pos + 7) & ~7L }
    def bytePos: Int = {
      require((pos & 7) == 0, "bytePos on unaligned reader")
      (pos >> 3).toInt
    }
  }

  private object FlacEof extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def fail(): Nothing = throw FlacEof

  // ------------------------------------------------------------------
  // CRCs — bitwise forms here; the independent fixture encoder
  // (FlacBuild) uses table-driven forms, so a shared-bug tautology
  // between the two is not possible.
  // ------------------------------------------------------------------

  /** CRC-8, poly 0x07, init 0, MSB-first (the frame-header check). */
  private[graft] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
              else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0, MSB-first (the whole-frame check). */
  private[graft] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------------
  // Public entry
  // ------------------------------------------------------------------

  /** payload → 44-byte-header PCM WAV at the stream's depth, or null
    * (not FLAC / malformed / unsupported depth / zero frames decoded).
    * Never throws.
    */
  def decode(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 42) return null
    try decodeChecked(b)
    catch { case _: Exception => null }
  }

  private val FixedRates = Array(
    0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
    32000, 44100, 48000, 96000)

  private def decodeChecked(b: Array[Byte]): Array[Byte] = {
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'))
      return null

    // ---- metadata-block walk: STREAMINFO first (spec mandate),
    // every other type skipped structurally ----
    var o = 4
    var siRate = 0; var siBps = 0
    var haveSI = false
    var lastBlock = false
    while (!lastBlock) {
      if (o + 4 > b.length) return null
      val h = b(o) & 0xff
      lastBlock = (h & 0x80) != 0
      val typ = h & 0x7f
      val len = ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) |
        (b(o + 3) & 0xff)
      if (typ == 127) return null // invalid block type per spec
      if (o.toLong + 4 + len > b.length) return null
      if (!haveSI) {
        if (typ != 0 || len < 34) return null // STREAMINFO must lead
        val p = o + 4
        // 20-bit rate, 3-bit channels−1, 5-bit bps−1 packed at +10
        siRate = ((b(p + 10) & 0xff) << 12) | ((b(p + 11) & 0xff) << 4) |
          ((b(p + 12) & 0xff) >> 4)
        siBps = (((b(p + 12) & 1) << 4) | ((b(p + 13) & 0xff) >> 4)) + 1
        haveSI = true
      } else if (typ == 0) return null // duplicate STREAMINFO
      o += 4 + len
    }
    if (!haveSI || siRate <= 0) return null

    // ---- frame walk ----
    val pcm = new java.io.ByteArrayOutputStream()
    var channels = 0; var rate = 0; var bps = 0
    var frames = 0L // decoded inter-channel samples
    var stop = false
    while (!stop && o + 5 <= b.length) {
      try {
        val r = decodeFrame(b, o, siRate, siBps, channels, rate, bps, pcm)
        if (r == null) stop = true
        else {
          o = r._1
          if (frames == 0) { channels = r._2; rate = r._3; bps = r._4 }
          frames += r._5
        }
      } catch { case _: Exception => stop = true }
    }
    if (frames == 0 || channels == 0) null
    else wav(pcm.toByteArray, channels, rate, bps)
  }

  /** One frame: header (CRC-8-checked) + subframes + CRC-16. Returns
    * (next offset, channels, rate, bps, blockSize) or null to stop
    * the walk (bad sync / reserved field / CRC mismatch / stream
    * -property switch / output cap).
    */
  private def decodeFrame(b: Array[Byte], o: Int, siRate: Int, siBps: Int,
      gotCh: Int, gotRate: Int, gotBps: Int,
      pcm: java.io.ByteArrayOutputStream):
      (Int, Int, Int, Int, Int) = {
    if ((b(o) & 0xff) != 0xff || (b(o + 1) & 0xfe) != 0xf8) return null
    val bsCode = (b(o + 2) & 0xff) >> 4
    val srCode = b(o + 2) & 0xf
    val asgn = (b(o + 3) & 0xff) >> 4
    val ssCode = (b(o + 3) >> 1) & 7
    if ((b(o + 3) & 1) != 0) return null // reserved bit
    if (bsCode == 0 || srCode == 15 || asgn > 10 || ssCode == 3) return null

    var p = o + 4
    // UTF-8-style coded frame/sample number: value unused, but the
    // bytes are header (CRC-8-covered) and malformed coding is a
    // corrupt frame
    val first = b(p) & 0xff
    val nCont =
      if (first < 0x80) 0
      else if (first >= 0xc0 && first <= 0xdf) 1
      else if (first <= 0xef) 2
      else if (first <= 0xf7) 3
      else if (first <= 0xfb) 4
      else if (first <= 0xfd) 5
      else if (first == 0xfe) 6
      else return null // 0xFF can't lead; 10xxxxxx can't lead
    if (p + 1 + nCont > b.length) return null
    var i = 1
    while (i <= nCont) {
      if ((b(p + i) & 0xc0) != 0x80) return null
      i += 1
    }
    p += 1 + nCont

    var blockSize = bsCode match {
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => -1 // 8-bit explicit below
      case 7 => -2 // 16-bit explicit below
      case c => 256 << (c - 8)
    }
    if (blockSize == -1) {
      if (p + 1 > b.length) return null
      blockSize = (b(p) & 0xff) + 1; p += 1
    } else if (blockSize == -2) {
      if (p + 2 > b.length) return null
      blockSize = (((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)) + 1; p += 2
    }

    var sampleRate = srCode match {
      case 0 => siRate
      case c if c <= 11 => FixedRates(c)
      case _ => -1 // explicit below
    }
    if (sampleRate == -1) {
      srCode match {
        case 12 =>
          if (p + 1 > b.length) return null
          sampleRate = (b(p) & 0xff) * 1000; p += 1
        case 13 =>
          if (p + 2 > b.length) return null
          sampleRate = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff); p += 2
        case _ =>
          if (p + 2 > b.length) return null
          sampleRate = (((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)) * 10
          p += 2
      }
    }
    if (sampleRate <= 0) return null

    if (p + 1 > b.length) return null
    if (crc8(b, o, p) != (b(p) & 0xff)) return null // corrupt header
    p += 1

    val bps = ssCode match {
      case 0 => siBps
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case _ => 32
    }
    if (bps != 8 && bps != 16 && bps != 24) return null // WAV contract
    val nch = if (asgn <= 7) asgn + 1 else 2
    if (gotCh != 0 && (nch != gotCh || sampleRate != gotRate ||
      bps != gotBps)) return null // property switch: stop like Mp3

    val bytesPer = bps / 8
    val frameBytes = blockSize.toLong * nch * bytesPer
    if (pcm.size + frameBytes > MaxPcmBytes) return null // output cap

    // ---- subframes ----
    val chans = Array.ofDim[Int](nch, blockSize)
    val br = new BitReader(b, p)
    var c = 0
    while (c < nch) {
      val sideBit = asgn match {
        case 8 => if (c == 1) 1 else 0 // left/side: side is ch 1
        case 9 => if (c == 0) 1 else 0 // right/side: side is ch 0
        case 10 => if (c == 1) 1 else 0 // mid/side: side is ch 1
        case _ => 0
      }
      decodeSubframe(br, blockSize, bps + sideBit, chans(c))
      c += 1
    }
    br.align()
    val fEnd = br.bytePos
    if (fEnd + 2 > b.length) return null
    val want = ((b(fEnd) & 0xff) << 8) | (b(fEnd + 1) & 0xff)
    if (crc16(b, o, fEnd) != want) return null // corrupt frame

    // ---- stereo reconstruction (in place) ----
    asgn match {
      case 8 => // left/side → right = left − side
        val l = chans(0); val s = chans(1)
        var t = 0
        while (t < blockSize) { s(t) = l(t) - s(t); t += 1 }
      case 9 => // side/right → left = right + side
        val s = chans(0); val r = chans(1)
        var t = 0
        while (t < blockSize) { s(t) = r(t) + s(t); t += 1 }
      case 10 => // mid/side with the lost-LSB reconstruction
        val m = chans(0); val s = chans(1)
        var t = 0
        while (t < blockSize) {
          val m2 = (m(t) << 1) | (s(t) & 1)
          m(t) = (m2 + s(t)) >> 1
          s(t) = (m2 - s(t)) >> 1
          t += 1
        }
      case _ => ()
    }

    // ---- emit interleaved little-endian PCM ----
    val out = new Array[Byte](frameBytes.toInt)
    var w = 0
    var t = 0
    while (t < blockSize) {
      c = 0
      while (c < nch) {
        val v = chans(c)(t)
        if (bps == 8) { out(w) = ((v + 128) & 0xff).toByte; w += 1 }
        else if (bps == 16) {
          out(w) = (v & 0xff).toByte
          out(w + 1) = ((v >> 8) & 0xff).toByte
          w += 2
        } else {
          out(w) = (v & 0xff).toByte
          out(w + 1) = ((v >> 8) & 0xff).toByte
          out(w + 2) = ((v >> 16) & 0xff).toByte
          w += 3
        }
        c += 1
      }
      t += 1
    }
    pcm.write(out, 0, out.length)
    (fEnd + 2, nch, sampleRate, bps, blockSize)
  }

  /** One subframe into `out` (length = block size). Throws on any
    * reserved/corrupt structure (the walk stops at the prior frame).
    */
  private def decodeSubframe(br: BitReader, blockSize: Int, sbps: Int,
      out: Array[Int]): Unit = {
    if (br.bit() != 0) fail() // zero pad bit
    val typ = br.bits(6)
    var wasted = 0
    if (br.bit() == 1) wasted = br.unary() + 1
    val ebps = sbps - wasted
    if (ebps <= 0 || ebps > 26) fail() // 24 + side + margin

    if (typ == 0) { // CONSTANT
      val v = signed(br, ebps)
      java.util.Arrays.fill(out, v)
    } else if (typ == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { out(i) = signed(br, ebps); i += 1 }
    } else if (typ >= 8 && typ <= 12) { // FIXED, order 0–4
      val order = typ - 8
      if (order > blockSize) fail()
      var i = 0
      while (i < order) { out(i) = signed(br, ebps); i += 1 }
      residual(br, blockSize, order, out)
      // the four binomial predictors, Long-accumulated; a value
      // outside int32 is an invalid stream, not a wrap
      i = order
      while (i < blockSize) {
        val pred: Long = order match {
          case 0 => 0L
          case 1 => out(i - 1).toLong
          case 2 => 2L * out(i - 1) - out(i - 2)
          case 3 => 3L * out(i - 1) - 3L * out(i - 2) + out(i - 3)
          case _ => 4L * out(i - 1) - 6L * out(i - 2) +
            4L * out(i - 3) - out(i - 4)
        }
        val v = pred + out(i)
        if (v < Int.MinValue || v > Int.MaxValue) fail()
        out(i) = v.toInt
        i += 1
      }
    } else if (typ >= 32) { // LPC, order 1–32
      val order = (typ & 31) + 1
      if (order > blockSize) fail()
      var i = 0
      while (i < order) { out(i) = signed(br, ebps); i += 1 }
      val precRaw = br.bits(4)
      if (precRaw == 15) fail() // invalid per spec
      val prec = precRaw + 1
      val shift = br.bits(5) // signed in spec; negative is invalid
      if (shift > 15) fail()
      val coef = new Array[Int](order)
      i = 0
      while (i < order) { coef(i) = signed(br, prec); i += 1 }
      residual(br, blockSize, order, out)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coef(j).toLong * out(i - 1 - j); j += 1 }
        val v = (acc >> shift) + out(i)
        if (v < Int.MinValue || v > Int.MaxValue) fail()
        out(i) = v.toInt
        i += 1
      }
    } else fail() // reserved type

    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) = out(i) << wasted; i += 1 }
    }
  }

  /** Signed two's-complement n-bit read, n ≤ 26 here. n = 0 → 0. */
  private def signed(br: BitReader, n: Int): Int = {
    if (n == 0) return 0
    val u = br.bits(n)
    if (u >= (1 << (n - 1))) u - (1 << n) else u
  }

  /** Rice-partitioned residual into out[order, blockSize). */
  private def residual(br: BitReader, blockSize: Int, order: Int,
      out: Array[Int]): Unit = {
    val method = br.bits(2)
    if (method > 1) fail()
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = br.bits(4)
    val nPart = 1 << po
    if (blockSize % nPart != 0) fail()
    val base = blockSize / nPart
    if (base - order < 0) fail() // first partition would be negative
    var idx = order
    var part = 0
    while (part < nPart) {
      val cnt = if (part == 0) base - order else base
      val prm = br.bits(pBits)
      if (prm == escape) {
        val nb = br.bits(5)
        var i = 0
        while (i < cnt) { out(idx) = signed(br, nb); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < cnt) {
          val q = br.unary()
          // spec residuals fit int32; a quotient that can't is a
          // crafted unary run — reject before it reads the payload
          if (q.toLong > (0x7fffffffL >> prm)) fail()
          val u = (q.toLong << prm) | br.bits(prm).toLong
          if (u > 0xffffffffL) fail()
          out(idx) = ((u >>> 1) ^ -(u & 1L)).toInt
          idx += 1
          i += 1
        }
      }
      part += 1
    }
  }

  /** Standard 44-byte little-endian WAV header around interleaved
    * PCM (8-bit stored unsigned per the WAV convention — recentering
    * happened at emit).
    */
  private def wav(data: Array[Byte], channels: Int, rate: Int,
      bps: Int): Array[Byte] = {
    val bytesPer = bps / 8
    val out = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ISO-8859-1")).putInt(36 + data.length)
      .put("WAVE".getBytes("ISO-8859-1"))
      .put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * bytesPer)
      .putShort((channels * bytesPer).toShort)
      .putShort(bps.toShort)
      .put("data".getBytes("ISO-8859-1")).putInt(data.length)
      .put(data)
    out.array()
  }
}

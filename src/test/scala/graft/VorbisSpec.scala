package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential suite for the clean-room Vorbis decoder
  * ([[graft.expr.VorbisDecode]]) against the INDEPENDENT fixture
  * encoder ([[graft.expr.VorbisBuild]] — own LSB bit writer, bitwise
  * OGG CRC vs the decoder's table form, literal header writes vs the
  * parser).
  *
  * Gate structure:
  *  - SILENCE fixtures pin EXACT zeros plus the full lap-geometry
  *    sample-count arithmetic (short, mixed long/short, mono/stereo,
  *    coupling present) — spec-forced regardless of any decoder
  *    constant, the property the q200 oracle replays.
  *  - The LOUD differential re-implements the ENTIRE synthesis
  *    chain test-side from the spec text (floor post reconstruction,
  *    the integer line renderer, the inverse-dB map, residue VQ
  *    accumulation, a direct no-table IMDCT, the sin(π/2·sin²)
  *    window, the overlap return region) and pins the decoder's
  *    int16 output to within 1 LSB of the independent rendering —
  *    two separately-written implementations of the same public
  *    spec agreeing numerically.
  *  - Robustness rows: page CRC rejection, mid-stream foreign
  *    serial (ragged tail), EOP truncation (valid zeros, not an
  *    error), packet spanning a page boundary, granule truncation,
  *    and the loud-support lemma the q201 construction leans on
  *    (a loud packet's output confined to its two segments).
  */
class VorbisSpec extends AnyFunSuite {

  import graft.expr.{VorbisBuild, VorbisDecode}

  private def wavSamples(wav: Array[Byte]):
      (Int, Int, Array[Array[Int]]) = {
    assert(wav != null, "decode returned null")
    assert(new String(wav, 0, 4, "ISO-8859-1") == "RIFF")
    def u16(o: Int) = (wav(o) & 0xff) | ((wav(o + 1) & 0xff) << 8)
    def u32(o: Int) = (wav(o) & 0xff) | ((wav(o + 1) & 0xff) << 8) |
      ((wav(o + 2) & 0xff) << 16) | ((wav(o + 3) & 0xff) << 24)
    val ch = u16(22)
    val rate = u32(24)
    assert(u16(34) == 16, "output depth is 16")
    val frames = u32(40) / (ch * 2)
    val out = Array.ofDim[Int](ch, frames)
    var p = 44
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < ch) {
        val raw = (wav(p) & 0xff) | ((wav(p + 1) & 0xff) << 8)
        out(c)(f) = if (raw >= 32768) raw - 65536 else raw
        p += 2
        c += 1
      }
      f += 1
    }
    (ch, rate, out)
  }

  // ------------------------------------------------------------------
  // silence: exact zeros + lap-count arithmetic
  // ------------------------------------------------------------------

  test("silence short blocks, mono: exact zeros, (K-1)*128 samples") {
    val k = 7
    val wav = VorbisDecode.decode(VorbisBuild.silence(1, 8000, k,
      mixedBlocks = false))
    val (ch, rate, s) = wavSamples(wav)
    assert(ch == 1 && rate == 8000)
    assert(s(0).length == (k - 1) * 128)
    assert(s(0).forall(_ == 0))
  }

  test("silence mixed long/short, mono: geometry count 192/transition") {
    val k = 6
    val wav = VorbisDecode.decode(VorbisBuild.silence(1, 44100, k,
      mixedBlocks = true))
    val (_, _, s) = wavSamples(wav)
    assert(s(0).length == (k - 1) * 192)
    assert(s(0).length == VorbisBuild.silenceSamples(k, mixedBlocks = true))
    assert(s(0).forall(_ == 0))
  }

  test("silence stereo (coupling configured): zeros on both channels") {
    val k = 5
    val wav = VorbisDecode.decode(VorbisBuild.silence(2, 12000, k,
      mixedBlocks = true))
    val (ch, rate, s) = wavSamples(wav)
    assert(ch == 2 && rate == 12000)
    assert(s(0).length == (k - 1) * 192)
    assert(s(0).forall(_ == 0) && s(1).forall(_ == 0))
  }

  test("single audio packet primes the lap but yields no PCM → null") {
    assert(VorbisDecode.decode(
      VorbisBuild.silence(1, 8000, 1, mixedBlocks = false)) == null)
  }

  // ------------------------------------------------------------------
  // the independent loud-path synthesis (spec re-implementation)
  // ------------------------------------------------------------------

  /** Test-side LCG identical to the builder's packet entropy. */
  private final class Lcg(seed: Long) {
    private var s = seed
    def next2(): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) & 3).toInt
    }
  }

  /** Floor post value for a raw decoded v against a flat 127 line
    * (predicted = 127, highroom 1, lowroom 127, room 2) — worked
    * from the spec's amplitude rules; -1 marks "unflagged"
    * (prediction stands, point skipped by the renderer).
    */
  private def postY(v: Int): Int = v match {
    case 0 => -1
    case 1 => 126 // odd, below room: predicted - (v+1)/2
    case 2 => 125 // >= room, lowroom wins: predicted - (v-highroom) - 1
    case 3 => 124
  }

  /** Spec §9.2.7 line renderer, written independently. */
  private def line(x0: Int, y0: Int, x1: Int, y1: Int, buf: Array[Int],
      n: Int): Unit = {
    val dy = y1 - y0
    val adx = x1 - x0
    var ady = math.abs(dy)
    val base = dy / adx
    val sy = if (dy < 0) base - 1 else base + 1
    ady -= math.abs(base) * adx
    if (x0 < n) buf(x0) = y0
    var (x, y, err) = (x0 + 1, y0, 0)
    while (x < math.min(x1, n)) {
      err += ady
      if (err >= adx) { err -= adx; y += sy } else y += base
      buf(x) = y
      x += 1
    }
  }

  private def invDb(i: Int): Double = math.pow(10.0, (i - 255) * 0.02734375)

  /** The independent model of one loud packet's windowed time-domain
    * block (length 256): floor curve × residue → direct IMDCT (no
    * cos table) → window.
    */
  private def loudBlock(seed: Long): Array[Double] = {
    val lcg = new Lcg(seed)
    val p1 = postY(lcg.next2())
    val p2 = postY(lcg.next2())
    // residue: two partitions [0,16) and [16,32), 8 VQ pairs each
    val res = new Array[Double](128)
    var part = 0
    while (part < 2) {
      var pos = part * 16
      var l = 0
      while (l < 8) {
        val e = lcg.next2()
        res(pos) += VorbisBuild.VqMults(2 * e) - 2
        res(pos + 1) += VorbisBuild.VqMults(2 * e + 1) - 2
        pos += 2
        l += 1
      }
      part += 1
    }
    // floor curve over bins [0,128): flat 127-line bent by flagged posts
    val curve = new Array[Int](128)
    var lx = 0
    var ly = 254
    for ((x, py) <- Seq((32, p1), (64, p2)) if py >= 0) {
      line(lx, ly, x, py * 2, curve, 128)
      lx = x
      ly = py * 2
    }
    line(lx, ly, 128, 254, curve, 128)
    // spectrum, direct IMDCT, window
    val spec = Array.tabulate(128)(i =>
      if (res(i) != 0.0) res(i).toFloat * invDb(curve(i)).toFloat else 0f)
    val out = new Array[Double](256)
    var j = 0
    while (j < 256) {
      var acc = 0.0
      var kk = 0
      while (kk < 128) {
        if (spec(kk) != 0f)
          acc += spec(kk) *
            math.cos(math.Pi / 512.0 * ((2L * j + 1 + 128) * (2 * kk + 1) % 1024))
        kk += 1
      }
      val sl = math.sin(math.Pi / 2 * (j + 0.5) / 128)
      val w =
        if (j < 128) math.sin(math.Pi / 2 * sl * sl)
        else {
          val sr = math.sin(math.Pi / 2 * (255 - j + 0.5) / 128)
          math.sin(math.Pi / 2 * sr * sr)
        }
      out(j) = acc * w
      j += 1
    }
    out
  }

  test("loud mono differential: decoder matches the independent synthesis") {
    val windows = 8
    val loud = Set(1, 4, 6)
    val stream = VorbisBuild.pattern(8000, windows, loud.contains, seed = 42L)
    val (ch, _, s) = wavSamples(VorbisDecode.decode(stream))
    assert(ch == 1)
    val k = 2 * windows + 1
    assert(s(0).length == (k - 1) * 128)

    // independent rendering: segment t = tail(packet t) + left(packet t+1)
    val blocks = Array.tabulate(k) { i =>
      if (i % 2 == 1 && loud.contains((i - 1) / 2))
        loudBlock(42L * 131 + i)
      else new Array[Double](256)
    }
    var t = 0
    var mism = 0
    while (t < k - 1) {
      var i = 0
      while (i < 128) {
        val v = blocks(t)(128 + i) + blocks(t + 1)(i)
        var q = math.round(v * 32767.0).toInt
        if (q > 32767) q = 32767
        if (q < -32768) q = -32768
        if (math.abs(q - s(0)(t * 128 + i)) > 1) mism += 1
        i += 1
      }
      t += 1
    }
    assert(mism == 0, s"$mism samples differ by more than 1 LSB")
    // and the rendering is genuinely loud (int16-visible energy)
    assert(s(0).exists(v => math.abs(v) > 100))
  }

  test("mixed-size loud differential: long block with short slopes, lap-aligned") {
    // stream: [short silent][LONG loud][short silent][short silent] —
    // the lap geometry's hardest case with real content. Expected
    // output, derived independently: segment 0 (192 samples) =
    // longBlock[64..256) (the long window is zero before its short
    // left slope at 64, the silent short tail adds nothing),
    // segment 1 (192) = longBlock[256..448) (right slope ends at
    // 448, zero after), segment 2 (128) = zeros.
    val bw = new VorbisBuild.Bw
    bw.put(0, 1).put(1, 1) // audio, mode 1 (long)
    bw.put(0, 1).put(0, 1) // prev short, next short
    bw.put(1, 1).put(127, 7).put(127, 7) // floor nonzero, flat 127
      .putCode(1, 2).putCode(2, 2) // posts: raw 1 → 126, raw 2 → 125
    var part = 0
    while (part < 2) {
      bw.putCode(1, 1)
      var l = 0
      while (l < 8) { bw.putCode((l + part) % 4, 2); l += 1 }
      part += 1
    }
    val longLoud = bw.result()
    val silent = VorbisBuild.silentPacket(1, longBlock = false,
      prevLong = false, nextLong = false)
    val out = new java.io.ByteArrayOutputStream()
    out.write(VorbisBuild.page(21, 0, 0, 0x02,
      Seq(VorbisBuild.idHeader(1, 8000))))
    out.write(VorbisBuild.page(21, 1, 0, 0,
      Seq(VorbisBuild.commentHeader(), VorbisBuild.setupHeader(1))))
    out.write(VorbisBuild.page(21, 2, 512, 0x04,
      Seq(silent, longLoud, silent, silent)))
    val (_, _, s) = wavSamples(VorbisDecode.decode(out.toByteArray))
    assert(s(0).length == 512)

    // independent synthesis of the long block (n = 512, n2 = 256)
    val res = new Array[Double](256)
    part = 0
    while (part < 2) {
      var pos = part * 16
      var l = 0
      while (l < 8) {
        val e = (l + part) % 4
        res(pos) += VorbisBuild.VqMults(2 * e) - 2
        res(pos + 1) += VorbisBuild.VqMults(2 * e + 1) - 2
        pos += 2
        l += 1
      }
      part += 1
    }
    val curve = new Array[Int](256)
    line(0, 254, 32, 252, curve, 256) // post raw 1 → 126·2
    line(32, 252, 64, 250, curve, 256) // post raw 2 → 125·2
    line(64, 250, 128, 254, curve, 256)
    var x = 128
    while (x < 256) { curve(x) = 254; x += 1 }
    val spec = Array.tabulate(256)(i =>
      if (res(i) != 0.0) res(i) * invDb(curve(i)) else 0.0)
    val block = new Array[Double](512)
    var j = 0
    while (j < 512) {
      var acc = 0.0
      var kk = 0
      while (kk < 256) {
        if (spec(kk) != 0.0)
          acc += spec(kk) *
            math.cos(math.Pi / 1024.0 * ((2L * j + 1 + 256) * (2 * kk + 1) % 2048))
        kk += 1
      }
      // long window with SHORT slopes: zero before 64, ascending
      // short slope [64,192), flat [192,320), descending [320,448),
      // zero after
      val w =
        if (j < 64 || j >= 448) 0.0
        else if (j < 192) {
          val sl = math.sin(math.Pi / 2 * (j - 64 + 0.5) / 128)
          math.sin(math.Pi / 2 * sl * sl)
        } else if (j < 320) 1.0
        else {
          val sr = math.sin(math.Pi / 2 * (447 - j + 0.5) / 128)
          math.sin(math.Pi / 2 * sr * sr)
        }
      block(j) = acc * w
      j += 1
    }
    def q16(v: Double): Int = {
      var q = math.round(v * 32767.0).toInt
      if (q > 32767) q = 32767
      if (q < -32768) q = -32768
      q
    }
    var mism = 0
    var i = 0
    while (i < 192) { // segment 0 = block[64..256)
      if (math.abs(q16(block(64 + i)) - s(0)(i)) > 1) mism += 1
      i += 1
    }
    i = 0
    while (i < 192) { // segment 1 = block[256..448) then zeros
      if (math.abs(q16(block(256 + i)) - s(0)(192 + i)) > 1) mism += 1
      i += 1
    }
    i = 384
    while (i < 512) { // segment 2 exact zeros
      if (s(0)(i) != 0) mism += 1
      i += 1
    }
    assert(mism == 0, s"$mism samples diverge from the independent lap")
    assert(s(0).exists(v => math.abs(v) > 100), "long block should be loud")
  }

  test("loud-support lemma: a loud window's output confined to its segments") {
    val windows = 8
    // exactly one loud window, w = 3 → packet 7 → segments 6 and 7
    val stream = VorbisBuild.pattern(8000, windows, _ == 3, seed = 9L)
    val (_, _, s) = wavSamples(VorbisDecode.decode(stream))
    val seg = s(0).grouped(128).toArray
    assert(seg.length == 2 * windows)
    seg.zipWithIndex.foreach { case (g, i) =>
      if (i == 6 || i == 7) assert(g.exists(_ != 0), s"segment $i silent")
      else assert(g.forall(_ == 0), s"segment $i leaked")
    }
  }

  test("stereo coupling: loud packet decodes nonzero on both channels") {
    // hand-built stereo loud packet against the stereo setup
    val bw = new VorbisBuild.Bw
    bw.put(0, 1).put(0, 1) // audio, mode 0 (short)
    bw.put(1, 1).put(127, 7).put(127, 7) // floor ch0
      .putCode(1, 2).putCode(2, 2)
    bw.put(1, 1).put(96, 7).put(96, 7) // floor ch1
      .putCode(3, 2).putCode(1, 2)
    var part = 0
    while (part < 2) {
      bw.putCode(1, 1) // class 1
      var l = 0
      while (l < 8) { bw.putCode((l + part) % 4, 2); l += 1 }
      part += 1
    }
    val loudPkt = bw.result()
    val silent = VorbisBuild.silentPacket(2, longBlock = false,
      prevLong = false, nextLong = false)
    val audio = Seq(silent, loudPkt, silent, silent)
    val out = new java.io.ByteArrayOutputStream()
    out.write(VorbisBuild.page(7, 0, 0, 0x02,
      Seq(VorbisBuild.idHeader(2, 16000))))
    out.write(VorbisBuild.page(7, 1, 0, 0,
      Seq(VorbisBuild.commentHeader(), VorbisBuild.setupHeader(2))))
    out.write(VorbisBuild.page(7, 2, 3 * 128, 0x04, audio))
    val (ch, rate, s) = wavSamples(VorbisDecode.decode(out.toByteArray))
    assert(ch == 2 && rate == 16000)
    assert(s(0).length == 3 * 128)
    assert(s(0).exists(_ != 0), "magnitude channel silent")
    assert(s(1).exists(_ != 0), "angle channel silent")
    // loud packet is index 1 → segments 0 and 1; segment 2 exact zero
    assert(s(0).drop(256).forall(_ == 0) && s(1).drop(256).forall(_ == 0))
    // determinism
    val again = VorbisDecode.decode(out.toByteArray)
    assert(java.util.Arrays.equals(again,
      VorbisDecode.decode(out.toByteArray)))
  }

  // ------------------------------------------------------------------
  // wild-file wire variants: the setup-header paths the standard
  // fixture (unordered/non-sparse books, lookup 2, residue 2, one
  // submap) never touches — each against an independent expectation
  // ------------------------------------------------------------------

  /** A test-side setup writer with the variant knobs: ordered
    * classbook lengths, sparse floor-book lengths (trailing unused
    * entries), lookup-type-1 + sequence_p value book, residue type
    * 0/1/2 with arbitrary begin/end, and a two-submap mapping.
    * Wire-compatible with [[VorbisBuild]]'s packets where the books'
    * used entries coincide (2-bit codes 0–3).
    */
  private def setupVariant(ch: Int, resType: Int, begin: Int, end: Int,
      lookup1: Boolean, orderedClassbook: Boolean,
      sparseFloorBook: Boolean, submaps: Int): Array[Byte] = {
    val bw = new VorbisBuild.Bw
    bw.put(5, 8)
    "vorbis".foreach(c => bw.put(c.toLong, 8))
    bw.put(3 - 1, 8)

    // book 0: classbook dims 1, entries 2, lengths 1/1
    bw.put(0x564342, 24).put(1, 16).put(2, 24)
    if (orderedClassbook) {
      bw.put(1, 1) // ordered
      bw.put(0, 5) // initial length 1
      bw.put(2, 2) // ilog(2) = 2 bits: both entries at length 1
    } else {
      bw.put(0, 1).put(0, 1)
      bw.put(0, 5).put(0, 5)
    }
    bw.put(0, 4)

    // book 1: value book dims 2, entries 4, lengths 2×4
    bw.put(0x564342, 24).put(2, 16).put(4, 24)
    bw.put(0, 1).put(0, 1)
    (0 until 4).foreach(_ => bw.put(1, 5))
    if (lookup1) {
      bw.put(1, 4) // lookup type 1: lookup1_values = 2
      // minimum −1.5 = −3·2^(788−1−788): mantissa 3, exp 787, sign
      bw.put(0x80000000L | (787L << 21) | 3L, 32)
      bw.put((788L << 21) | 1L, 32) // delta 1.0
      bw.put(2 - 1, 4) // value bits 2
      bw.put(1, 1) // sequence_p ON
      bw.put(0, 2).put(3, 2) // multiplicands [0, 3]
    } else {
      bw.put(2, 4)
      bw.put(0x80000000L | (788L << 21) | 2L, 32) // −2.0
      bw.put((788L << 21) | 1L, 32) // 1.0
      bw.put(2 - 1, 4)
      bw.put(0, 1)
      VorbisBuild.VqMults.foreach(m => bw.put(m.toLong, 2))
    }

    // book 2: floor posts — sparse form has 6 entries, last two
    // unused, so the USED entries are 0–3 with the same 2-bit codes
    if (sparseFloorBook) {
      bw.put(0x564342, 24).put(1, 16).put(6, 24)
      bw.put(0, 1) // unordered
      bw.put(1, 1) // sparse
      (0 until 4).foreach { _ => bw.put(1, 1); bw.put(1, 5) } // used, len 2
      bw.put(0, 1).put(0, 1) // two unused entries
      bw.put(0, 4)
    } else {
      bw.put(0x564342, 24).put(1, 16).put(4, 24)
      bw.put(0, 1).put(0, 1)
      (0 until 4).foreach(_ => bw.put(1, 5))
      bw.put(0, 4)
    }

    bw.put(0, 6).put(0, 16) // times

    bw.put(0, 6) // one floor
    bw.put(1, 16).put(1, 5).put(0, 4)
    bw.put(2 - 1, 3).put(0, 2).put(2 + 1, 8)
    bw.put(2 - 1, 2).put(7, 4).put(32, 7).put(64, 7)

    bw.put(0, 6) // one residue
    bw.put(resType, 16)
    bw.put(begin, 24).put(end, 24)
    bw.put(16 - 1, 24).put(2 - 1, 6).put(0, 8)
    bw.put(0, 3).put(0, 1)
    bw.put(1, 3).put(0, 1)
    bw.put(1, 8)

    bw.put(0, 6) // one mapping
    bw.put(0, 16)
    if (submaps > 1) bw.put(1, 1).put(submaps - 1, 4) else bw.put(0, 1)
    bw.put(0, 1) // no coupling (variant tests isolate paths)
    bw.put(0, 2)
    if (submaps > 1) (0 until ch).foreach(c => bw.put(c % submaps, 4))
    (0 until submaps).foreach(_ => bw.put(0, 8).put(0, 8).put(0, 8))

    bw.put(2 - 1, 6) // two modes (short/long), as the standard setup
    bw.put(0, 1).put(0, 16).put(0, 16).put(0, 8)
    bw.put(1, 1).put(0, 16).put(0, 16).put(0, 8)
    bw.put(1, 1)
    bw.result()
  }

  private def streamWith(ch: Int, setup: Array[Byte],
      audio: Seq[Array[Byte]], granule: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(VorbisBuild.page(31, 0, 0, 0x02,
      Seq(VorbisBuild.idHeader(ch, 8000))))
    out.write(VorbisBuild.page(31, 1, 0, 0,
      Seq(VorbisBuild.commentHeader(), setup)))
    out.write(VorbisBuild.page(31, 2, granule, 0x04, audio))
    out.toByteArray
  }

  test("ordered + sparse codebooks and residue 1 ≡ residue 2 for mono") {
    // identical packets under three setups: the standard one
    // (unordered books, residue 2), an ordered-classbook + sparse-
    // floor-book one (residue 2), and a residue-type-1 one. For
    // mono, type 2's interleave is the identity, and the book wire
    // variants must not change a single decoded sample.
    val silent = VorbisBuild.silentPacket(1, longBlock = false,
      prevLong = false, nextLong = false)
    val audio = Seq(silent, VorbisBuild.loudPacket(17L), silent, silent)
    val base = VorbisDecode.decode(
      streamWith(1, VorbisBuild.setupHeader(1), audio, 3 * 128))
    val variant = VorbisDecode.decode(streamWith(1,
      setupVariant(1, resType = 2, begin = 0, end = 32, lookup1 = false,
        orderedClassbook = true, sparseFloorBook = true, submaps = 1),
      audio, 3 * 128))
    val res1 = VorbisDecode.decode(streamWith(1,
      setupVariant(1, resType = 1, begin = 0, end = 32, lookup1 = false,
        orderedClassbook = false, sparseFloorBook = false, submaps = 1),
      audio, 3 * 128))
    assert(base != null && base.exists(_ != 0))
    assert(java.util.Arrays.equals(base, variant),
      "ordered/sparse codebook wire forms changed the decode")
    assert(java.util.Arrays.equals(base, res1),
      "residue type 1 must equal type 2 for mono")
  }

  test("lookup-type-1 VQ with sequence_p decodes to the index-division values") {
    // value book entries under lookup 1 (values [0,3], min −1.5,
    // delta 1, seq_p): e → (v0, v0+v1raw): e0 (−1.5,−3), e1 (1.5,0),
    // e2 (−1.5,0), e3 (1.5,3). Same packet bits as the standard
    // fixture, different VQ semantics — independent synthesis.
    val silent = VorbisBuild.silentPacket(1, longBlock = false,
      prevLong = false, nextLong = false)
    // fixed entries: partition class 1 both, entries (l+part)%4
    val bwp = new VorbisBuild.Bw
    bwp.put(0, 1).put(0, 1)
    bwp.put(1, 1).put(127, 7).put(127, 7).putCode(0, 2).putCode(0, 2)
    var part = 0
    while (part < 2) {
      bwp.putCode(1, 1)
      var l = 0
      while (l < 8) { bwp.putCode((l + part) % 4, 2); l += 1 }
      part += 1
    }
    val loud = bwp.result()
    val audio = Seq(silent, loud, silent)
    val wav = VorbisDecode.decode(streamWith(1,
      setupVariant(1, resType = 2, begin = 0, end = 32, lookup1 = true,
        orderedClassbook = false, sparseFloorBook = false, submaps = 1),
      audio, 2 * 128))
    val (_, _, s) = wavSamples(wav)
    assert(s(0).length == 256)

    val vq1 = Array(
      Array(-1.5, -3.0), Array(1.5, 0.0), Array(-1.5, 0.0), Array(1.5, 3.0))
    val res = new Array[Double](128)
    part = 0
    while (part < 2) {
      var pos = part * 16
      var l = 0
      while (l < 8) {
        val e = (l + part) % 4
        res(pos) += vq1(e)(0)
        res(pos + 1) += vq1(e)(1)
        pos += 2
        l += 1
      }
      part += 1
    }
    // floor: posts raw 0 → prediction stands (flat 127 → curve 254)
    val spec = Array.tabulate(128)(i =>
      if (res(i) != 0.0) res(i) * invDb(254) else 0.0)
    val block = new Array[Double](256)
    var j = 0
    while (j < 256) {
      var acc = 0.0
      var kk = 0
      while (kk < 128) {
        if (spec(kk) != 0.0)
          acc += spec(kk) *
            math.cos(math.Pi / 512.0 * ((2L * j + 1 + 128) * (2 * kk + 1) % 1024))
        kk += 1
      }
      val half = if (j < 128) j else 255 - j
      val sl = math.sin(math.Pi / 2 * (half + 0.5) / 128)
      block(j) = acc * math.sin(math.Pi / 2 * sl * sl)
      j += 1
    }
    var mism = 0
    var i = 0
    while (i < 128) { // segment 0 = tail of silent + left of loud
      val v = block(i)
      var q = math.round(v * 32767.0).toInt
      if (q > 32767) q = 32767
      if (q < -32768) q = -32768
      if (math.abs(q - s(0)(i)) > 1) mism += 1
      i += 1
    }
    i = 0
    while (i < 128) { // segment 1 = tail of loud
      val v = block(128 + i)
      var q = math.round(v * 32767.0).toInt
      if (q > 32767) q = 32767
      if (q < -32768) q = -32768
      if (math.abs(q - s(0)(128 + i)) > 1) mism += 1
      i += 1
    }
    assert(mism == 0, s"$mism samples diverge from lookup-1 synthesis")
    assert(s(0).exists(_ != 0), "lookup-1 stream should be loud")
  }

  test("residue type 0 strides partitions and honors begin > 0") {
    // same packet bits as a type-1/begin-0 stream, but type 0 with
    // begin 16/end 48: partition p covers bins [16+16p, 32+16p) and
    // entry l lands at stride positions (offset+l, offset+l+8)
    val silent = VorbisBuild.silentPacket(1, longBlock = false,
      prevLong = false, nextLong = false)
    val bwp = new VorbisBuild.Bw
    bwp.put(0, 1).put(0, 1)
    bwp.put(1, 1).put(127, 7).put(127, 7).putCode(0, 2).putCode(0, 2)
    var part = 0
    while (part < 2) {
      bwp.putCode(1, 1)
      var l = 0
      while (l < 8) { bwp.putCode((l * 3 + part) % 4, 2); l += 1 }
      part += 1
    }
    val loud = bwp.result()
    val audio = Seq(silent, loud, silent)
    val wav = VorbisDecode.decode(streamWith(1,
      setupVariant(1, resType = 0, begin = 16, end = 48, lookup1 = false,
        orderedClassbook = false, sparseFloorBook = false, submaps = 1),
      audio, 2 * 128))
    val (_, _, s) = wavSamples(wav)
    val res = new Array[Double](128)
    part = 0
    while (part < 2) {
      val off = 16 + part * 16
      var l = 0
      while (l < 8) {
        val e = (l * 3 + part) % 4
        res(off + l) += VorbisBuild.VqMults(2 * e) - 2 // d = 0
        res(off + l + 8) += VorbisBuild.VqMults(2 * e + 1) - 2 // d = 1
        l += 1
      }
      part += 1
    }
    val spec = Array.tabulate(128)(i =>
      if (res(i) != 0.0) res(i) * invDb(254) else 0.0)
    val block = new Array[Double](256)
    var j = 0
    while (j < 256) {
      var acc = 0.0
      var kk = 0
      while (kk < 128) {
        if (spec(kk) != 0.0)
          acc += spec(kk) *
            math.cos(math.Pi / 512.0 * ((2L * j + 1 + 128) * (2 * kk + 1) % 1024))
        kk += 1
      }
      val half = if (j < 128) j else 255 - j
      val sl = math.sin(math.Pi / 2 * (half + 0.5) / 128)
      block(j) = acc * math.sin(math.Pi / 2 * sl * sl)
      j += 1
    }
    var mism = 0
    var i = 0
    while (i < 256) {
      val v = if (i < 128) block(i) else block(i)
      var q = math.round(block(i) * 32767.0).toInt
      if (q > 32767) q = 32767
      if (q < -32768) q = -32768
      if (math.abs(q - s(0)(i)) > 1) mism += 1
      i += 1
    }
    assert(mism == 0, s"$mism samples diverge from type-0 stride synthesis")
    assert(s(0).exists(_ != 0))
  }

  test("two-submap mapping isolates channels like two mono streams") {
    // stereo, submaps = 2, mux = [0, 1], no coupling: the packet is
    // [floor ch0][floor ch1][residue submap 0][residue submap 1] and
    // each channel must decode exactly as the mono stream carrying
    // its floor + residue bits
    val pkt = new VorbisBuild.Bw
    pkt.put(0, 1).put(0, 1)
    pkt.put(1, 1).put(127, 7).put(127, 7).putCode(1, 2).putCode(2, 2)
    pkt.put(1, 1).put(96, 7).put(96, 7).putCode(3, 2).putCode(0, 2)
    // submap 0 residue (ch0): classes 1/0 — only partition 0 loud
    pkt.putCode(1, 1)
    (0 until 8).foreach(l => pkt.putCode(l % 4, 2))
    pkt.putCode(0, 1)
    // submap 1 residue (ch1): classes 0/1
    pkt.putCode(0, 1)
    pkt.putCode(1, 1)
    (0 until 8).foreach(l => pkt.putCode((l + 2) % 4, 2))
    val silent2 = VorbisBuild.silentPacket(2, longBlock = false,
      prevLong = false, nextLong = false)
    val stereo = streamWith(2,
      setupVariant(2, resType = 2, begin = 0, end = 32, lookup1 = false,
        orderedClassbook = false, sparseFloorBook = false, submaps = 2),
      Seq(silent2, pkt.result(), silent2), 2 * 128)
    val (ch, _, s) = wavSamples(VorbisDecode.decode(stereo))
    assert(ch == 2)

    def mono(floorBits: VorbisBuild.Bw => Unit,
        resBits: VorbisBuild.Bw => Unit): Array[Array[Int]] = {
      val b = new VorbisBuild.Bw
      b.put(0, 1).put(0, 1)
      floorBits(b)
      resBits(b)
      val silent1 = VorbisBuild.silentPacket(1, longBlock = false,
        prevLong = false, nextLong = false)
      val w = VorbisDecode.decode(streamWith(1,
        VorbisBuild.setupHeader(1), Seq(silent1, b.result(), silent1),
        2 * 128))
      wavSamples(w)._3
    }
    val m0 = mono(
      b => { b.put(1, 1).put(127, 7).put(127, 7).putCode(1, 2).putCode(2, 2); () },
      b => { b.putCode(1, 1); (0 until 8).foreach(l => b.putCode(l % 4, 2)); b.putCode(0, 1); () })
    val m1 = mono(
      b => { b.put(1, 1).put(96, 7).put(96, 7).putCode(3, 2).putCode(0, 2); () },
      b => { b.putCode(0, 1); b.putCode(1, 1); (0 until 8).foreach(l => b.putCode((l + 2) % 4, 2)); () })
    assert(s(0).sameElements(m0(0)), "submap-0 channel diverges from mono")
    assert(s(1).sameElements(m1(0)), "submap-1 channel diverges from mono")
    assert(s(0).exists(_ != 0) && s(1).exists(_ != 0))
  }

  // ------------------------------------------------------------------
  // robustness rows
  // ------------------------------------------------------------------

  test("page CRC corruption: header page → null; audio page → ragged") {
    val good = VorbisBuild.silence(1, 8000, 5, mixedBlocks = false)
    // corrupt one byte inside the setup page body (page 2 of 3)
    val idPageLen = {
      val id = VorbisBuild.page(0x67726166, 0, 0, 0x02,
        Seq(VorbisBuild.idHeader(1, 8000)))
      id.length
    }
    val bad1 = good.clone()
    bad1(idPageLen + 40) = (bad1(idPageLen + 40) ^ 0x55).toByte
    assert(VorbisDecode.decode(bad1) == null)
    // corrupt the final (audio) page: all audio lost → null
    val bad2 = good.clone()
    bad2(bad2.length - 1) = (bad2(bad2.length - 1) ^ 0x55).toByte
    assert(VorbisDecode.decode(bad2) == null)
  }

  test("mid-stream foreign serial stops the walk: ragged tail kept") {
    val audio1 = Seq(
      VorbisBuild.silentPacket(1, longBlock = false, prevLong = false,
        nextLong = false),
      VorbisBuild.silentPacket(1, longBlock = false, prevLong = false,
        nextLong = false),
      VorbisBuild.silentPacket(1, longBlock = false, prevLong = false,
        nextLong = false))
    val out = new java.io.ByteArrayOutputStream()
    out.write(VorbisBuild.page(5, 0, 0, 0x02,
      Seq(VorbisBuild.idHeader(1, 8000))))
    out.write(VorbisBuild.page(5, 1, 0, 0,
      Seq(VorbisBuild.commentHeader(), VorbisBuild.setupHeader(1))))
    out.write(VorbisBuild.page(5, 2, 2 * 128, 0,
      audio1)) // not EOS
    out.write(VorbisBuild.page(99, 3, 999, 0, audio1)) // foreign serial
    val (_, _, s) = wavSamples(VorbisDecode.decode(out.toByteArray))
    assert(s(0).length == 2 * 128) // only the first page's packets
  }

  test("EOP truncation mid-residue is a valid zero-filled packet") {
    // a loud packet cut inside its residue bits still decodes; the
    // remaining vectors are zero (spec §4.3) — same sample count
    val full = VorbisBuild.loudPacket(7L)
    val cut = java.util.Arrays.copyOf(full, full.length - 2)
    val silent = VorbisBuild.silentPacket(1, longBlock = false,
      prevLong = false, nextLong = false)
    def stream(p: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(VorbisBuild.page(3, 0, 0, 0x02,
        Seq(VorbisBuild.idHeader(1, 8000))))
      out.write(VorbisBuild.page(3, 1, 0, 0,
        Seq(VorbisBuild.commentHeader(), VorbisBuild.setupHeader(1))))
      out.write(VorbisBuild.page(3, 2, 2 * 128, 0x04,
        Seq(silent, p, silent)))
      out.toByteArray
    }
    val (_, _, sFull) = wavSamples(VorbisDecode.decode(stream(full)))
    val (_, _, sCut) = wavSamples(VorbisDecode.decode(stream(cut)))
    assert(sFull(0).length == 256 && sCut(0).length == 256)
    assert(sCut(0).exists(_ != 0) || sFull(0).exists(_ != 0))
  }

  test("packet spanning a page boundary reassembles") {
    // pad a silent packet with ignored trailing bytes to 300 and
    // split it 255/45 across two pages (continuation flag on page 2)
    val base = VorbisBuild.silentPacket(1, longBlock = false,
      prevLong = false, nextLong = false)
    val padded = java.util.Arrays.copyOf(base, 300)
    def rawPage(serial: Int, seq: Int, granule: Long, flags: Int,
        lacing: Array[Int], body: Array[Byte]): Array[Byte] = {
      val page = java.nio.ByteBuffer
        .allocate(27 + lacing.length + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      page.put("OggS".getBytes("ISO-8859-1")).put(0.toByte)
        .put(flags.toByte).putLong(granule).putInt(serial).putInt(seq)
        .putInt(0).put(lacing.length.toByte)
      lacing.foreach(l => page.put(l.toByte))
      page.put(body)
      val arr = page.array()
      // decoder-independent CRC: reuse the builder's page() on a
      // whole-packet twin is impossible here, so fold bitwise inline
      var crc = 0
      var i = 0
      while (i < arr.length) {
        crc ^= (arr(i) & 0xff) << 24
        var k = 0
        while (k < 8) {
          crc = if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04c11db7
            else crc << 1
          k += 1
        }
        i += 1
      }
      arr(22) = crc.toByte
      arr(23) = (crc >> 8).toByte
      arr(24) = (crc >> 16).toByte
      arr(25) = (crc >> 24).toByte
      arr
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(VorbisBuild.page(11, 0, 0, 0x02,
      Seq(VorbisBuild.idHeader(1, 8000))))
    out.write(VorbisBuild.page(11, 1, 0, 0,
      Seq(VorbisBuild.commentHeader(), VorbisBuild.setupHeader(1))))
    out.write(rawPage(11, 2, -1L, 0, Array(255),
      java.util.Arrays.copyOf(padded, 255)))
    out.write(rawPage(11, 3, 2 * 128, 0x05,
      Array(45, base.length, base.length),
      java.util.Arrays.copyOfRange(padded, 255, 300) ++ base ++ base))
    val (_, _, s) = wavSamples(VorbisDecode.decode(out.toByteArray))
    assert(s(0).length == 2 * 128)
    assert(s(0).forall(_ == 0))
  }

  test("final-page granule truncates the tail") {
    val silent = VorbisBuild.silentPacket(1, longBlock = false,
      prevLong = false, nextLong = false)
    val out = new java.io.ByteArrayOutputStream()
    out.write(VorbisBuild.page(13, 0, 0, 0x02,
      Seq(VorbisBuild.idHeader(1, 8000))))
    out.write(VorbisBuild.page(13, 1, 0, 0,
      Seq(VorbisBuild.commentHeader(), VorbisBuild.setupHeader(1))))
    out.write(VorbisBuild.page(13, 2, 3 * 128 - 37, 0x04,
      Seq(silent, silent, silent, silent)))
    val (_, _, s) = wavSamples(VorbisDecode.decode(out.toByteArray))
    assert(s(0).length == 3 * 128 - 37)
  }

  test("FFT IMDCT matches the direct form on every legal block size") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(64, 128, 256, 512, 1024, 2048, 4096, 8192)) {
      val dense = Array.fill(n / 2)((rnd.nextFloat() - 0.5f) * 4f)
      val sparse = Array.tabulate(n / 2)(i =>
        if (i % 37 == 3) (rnd.nextFloat() - 0.5f) * 4f else 0f)
      for (spec <- Seq(dense, sparse)) {
        val tab = VorbisDecode.cosTable(n)
        val a = new Array[Double](n)
        VorbisDecode.imdctDirect(spec, n, tab, a)
        val b = new Array[Double](n)
        new VorbisDecode.FastImdct(n).run(spec, b)
        val scale = math.max(1.0, a.map(math.abs).max)
        val maxDiff = a.zip(b).map { case (x, y) => math.abs(x - y) }.max
        assert(maxDiff <= 1e-9 * scale,
          s"n=$n maxDiff=$maxDiff scale=$scale")
      }
    }
  }

  test("dense long-block stream decodes through the FFT path") {
    // n=2048 all-loud full-spectrum: nnz ≈ n/2 ≫ 4·log2(n), so every
    // block takes the FastImdct path; support/energy sanity plus
    // determinism pin the path end to end
    val clip = graft.expr.VorbisBuild.dense(8000, 6, 11, seed = 3L)
    val (ch, _, s) = wavSamples(VorbisDecode.decode(clip))
    assert(ch == 1)
    assert(s(0).length == 5 * 1024)
    assert(s(0).count(_ != 0) > 1000, "dense stream should be loud")
    assert(java.util.Arrays.equals(VorbisDecode.decode(clip),
      VorbisDecode.decode(clip)))
  }

  test("triage: foreign bytes, truncated headers, wrong magic → null") {
    assert(VorbisDecode.decode(null) == null)
    assert(VorbisDecode.decode(Array.emptyByteArray) == null)
    assert(VorbisDecode.decode("OggS but not really a page at all, needs 58+ bytes to even try".getBytes("ISO-8859-1")) == null)
    assert(VorbisDecode.decode(("x" * 200).getBytes("ISO-8859-1")) == null)
    val good = VorbisBuild.silence(1, 8000, 4, mixedBlocks = false)
    assert(VorbisDecode.decode(
      java.util.Arrays.copyOf(good, 60)) == null)
  }
}

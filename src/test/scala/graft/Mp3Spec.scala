package graft

import org.scalatest.funsuite.AnyFunSuite

/** Crafted-frame bit-exactness + structural validation for the hand
  * MPEG-1 Layer III decoder ([[graft.expr.Mp3Decode]]). No reference
  * MP3 decoder exists in this container (ImageIO has no audio; zero
  * egress), so conformance is pinned the way the decoder's scaladoc
  * documents: everything EXACT by construction is asserted exactly
  * (silence, zero-support bounds, frame geometry, gain linearity,
  * MS-stereo symmetry, determinism), and the spec-data tables are
  * re-validated structurally (prefix-freeness + Kraft completeness —
  * misremembered Annex B.7 data fails both with overwhelming
  * probability; all seven shipped tables pass).
  */
class Mp3Spec extends AnyFunSuite {

  import graft.expr.Mp3Decode

  // ------------------------------------------------------------------
  // Test-side frame builder (independent bit-writer: MSB-first)
  // ------------------------------------------------------------------

  private final class BitWriter {
    private val bytes = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nAcc = 0
    def put(v: Int, n: Int): this.type = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1)
        nAcc += 1
        if (nAcc == 8) { bytes.write(acc); acc = 0; nAcc = 0 }
        i -= 1
      }
      this
    }
    def padToByte(): this.type = { while (nAcc != 0) put(0, 1); this }
    def result(): Array[Byte] = { padToByte(); bytes.toByteArray }
  }

  /** One granule's side-info fields; defaults = digital silence. */
  private case class Gr(part23: Int = 0, bigValues: Int = 0,
      gain: Int = 210, sfCompress: Int = 0, tableSelect: Seq[Int] = Seq(0, 0, 0),
      region0: Int = 0, region1: Int = 0, count1TableB: Boolean = true)

  private def writeGr(w: BitWriter, g: Gr, lsf: Boolean = false): Unit = {
    w.put(g.part23, 12).put(g.bigValues, 9).put(g.gain, 8)
      .put(g.sfCompress, if (lsf) 9 else 4).put(0, 1) // window_switching = 0
    g.tableSelect.foreach(t => w.put(t, 5))
    w.put(g.region0, 4).put(g.region1, 3)
    if (!lsf) w.put(0, 1) // preflag (MPEG-1 only)
    w.put(0, 1) // scalefac_scale
    w.put(if (g.count1TableB) 1 else 0, 1)
  }

  /** Build one Layer III frame (MPEG-1 default; ver 2 / 0 build the
    * LSF layouts): header + side info + main data, zero-filled to
    * the exact spec frame length (144 or 72)·bitrate/rate + padding.
    */
  private def frame(brIdx: Int, srIdx: Int, padding: Int = 0,
      mono: Boolean = true, modeExt: Int = 0,
      grs: Seq[Gr] = Seq(Gr(), Gr(), Gr(), Gr()),
      mainData: Array[Byte] = Array.emptyByteArray,
      ver: Int = 3): Array[Byte] = {
    val mpeg1 = ver == 3
    val kbps =
      (if (mpeg1) Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
        192, 224, 256, 320)
       else Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
        144, 160))(brIdx)
    val rate = (ver match {
      case 3 => Array(44100, 48000, 32000)
      case 2 => Array(22050, 24000, 16000)
      case _ => Array(11025, 12000, 8000)
    })(srIdx)
    val frameLen = (if (mpeg1) 144 else 72) * kbps * 1000 / rate + padding
    val mode = if (mono) 3 else 1 // joint stereo for the stereo arm
    val header = Array[Byte](0xFF.toByte,
      (0xE0 | (ver << 3) | (1 << 1) | 1).toByte, // layer III, no CRC
      ((brIdx << 4) | (srIdx << 2) | (padding << 1)).toByte,
      ((mode << 6) | (modeExt << 4)).toByte)
    val w = new BitWriter
    val nch = if (mono) 1 else 2
    if (mpeg1) {
      w.put(0, 9) // main_data_begin
      w.put(0, if (mono) 5 else 3) // private
      w.put(0, if (mono) 4 else 8) // scfsi
      for (gr <- 0 until 2; ch <- 0 until nch)
        writeGr(w, grs(gr * nch + ch), lsf = false)
    } else {
      w.put(0, 8) // main_data_begin (8 bits in LSF)
      w.put(0, if (mono) 1 else 2) // private; no scfsi
      for (ch <- 0 until nch) writeGr(w, grs(ch), lsf = true)
    }
    val si = w.result()
    assert(si.length == (if (mpeg1) { if (mono) 17 else 32 }
      else { if (mono) 9 else 17 }))
    val out = new Array[Byte](frameLen)
    System.arraycopy(header, 0, out, 0, 4)
    System.arraycopy(si, 0, out, 4, si.length)
    System.arraycopy(mainData, 0, out, 4 + si.length, mainData.length)
    out // rest already zero — which is also valid all-zero main data
  }

  /** A "loud" granule: two count1 quadruples through table B — quad
    * (1,1,1,1) transmits as the complement 0000 plus four positive
    * sign bits, so the main data is two zero BYTES and part2_3 = 16.
    * Spectral lines 0–7 become +1 before requantization.
    */
  private val LoudGr = Gr(part23 = 16, gain = 200)

  /** Independent big-values encoder: SIGNED (x, y) pairs → main-data
    * bits through a table's (x, y, hlen, hcod) entries, with the
    * Annex B.2 escape (|v| ≥ 15 codes 15 + linbits extra bits) when
    * `linbits` > 0. Bit order per §2.4.3.4.6: codeword, x-linbits,
    * x-sign, y-linbits, y-sign.
    */
  private def encodePairs(entries: Array[(Int, Int, Int, Int)],
      linbits: Int, pairs: Seq[(Int, Int)]): (Array[Byte], Int) = {
    val bySym = entries.map(e => ((e._1, e._2), (e._3, e._4))).toMap
    val w = new BitWriter
    var bits = 0
    for ((xv, yv) <- pairs) {
      val ax = math.abs(xv); val ay = math.abs(yv)
      val cx = math.min(ax, 15); val cy = math.min(ay, 15)
      val (l, c) = bySym((cx, cy))
      w.put(c, l); bits += l
      if (linbits > 0 && cx == 15) { w.put(ax - 15, linbits); bits += linbits }
      if (ax != 0) { w.put(if (xv < 0) 1 else 0, 1); bits += 1 }
      if (linbits > 0 && cy == 15) { w.put(ay - 15, linbits); bits += linbits }
      if (ay != 0) { w.put(if (yv < 0) 1 else 0, 1); bits += 1 }
    }
    (w.result(), bits)
  }

  private def wavSamples(wav: Array[Byte]): Array[Int] = {
    assert(wav != null, "decode returned null")
    assert(new String(wav.take(4), "ISO-8859-1") == "RIFF")
    assert(new String(wav.slice(8, 12), "ISO-8859-1") == "WAVE")
    val n = (wav.length - 44) / 2
    Array.tabulate(n)(i =>
      ((wav(44 + 2 * i) & 0xFF) | (wav(45 + 2 * i) << 8)).toShort.toInt)
  }

  private def wavRate(wav: Array[Byte]): Int =
    (wav(24) & 0xFF) | ((wav(25) & 0xFF) << 8) | ((wav(26) & 0xFF) << 16) |
      ((wav(27) & 0xFF) << 24)

  private def wavChannels(wav: Array[Byte]): Int =
    (wav(22) & 0xFF) | ((wav(23) & 0xFF) << 8)

  // ------------------------------------------------------------------
  // Structural table validation (the clean-room conformance evidence)
  // ------------------------------------------------------------------

  test("every shipped Huffman table is prefix-free and Kraft-complete") {
    def check(codes: Seq[(Int, Int)]): Unit = { // (len, code)
      val strs = codes.map { case (l, c) =>
        assert(l >= 1 && l <= 19 && c >= 0 && c < (1 << l))
        ("0" * l + c.toBinaryString).takeRight(l)
      }
      assert(strs.distinct.size == strs.size)
      for (a <- strs; b <- strs if a != b)
        assert(!b.startsWith(a), s"prefix violation: $a of $b")
      val kraft = codes.map { case (l, _) => math.pow(2.0, -l) }.sum
      assert(math.abs(kraft - 1.0) < 1e-12, s"Kraft sum $kraft")
    }
    assert(Mp3Decode.shippedBigTableIds ==
      Set(1, 2, 3, 5, 6, 7, 8, 9, 10, 12))
    for (id <- Mp3Decode.shippedBigTableIds)
      check(Mp3Decode.tableEntries(id).map { case (_, _, l, c) => (l, c) }.toSeq)
    check(Mp3Decode.count1AEntries.map { case (_, l, c) => (l, c) }.toSeq)
    // count1 table B: 16 fixed 4-bit codes, complement coding —
    // complete by construction
    check((0 until 16).map(i => (4, 15 - i)))
    // table dimensions match the spec
    val dims = Map(1 -> 2, 2 -> 3, 3 -> 3, 5 -> 4, 6 -> 4, 7 -> 6,
      8 -> 6, 9 -> 6, 10 -> 8, 12 -> 8)
    for ((id, d) <- dims) {
      assert(Mp3Decode.tableEntries(id).length == d * d, s"table $id")
      // every (x, y) cell present exactly once
      assert(Mp3Decode.tableEntries(id).map(e => (e._1, e._2)).toSet ==
        (for (x <- 0 until d; y <- 0 until d) yield (x, y)).toSet,
        s"table $id cells")
    }
    // registry coverage ledger: every valid Annex B.2 table id is
    // either shipped or documented-triaged — no id is silently
    // mishandled (4 and 14 are invalid per spec; 0 codes no data)
    val valid = (1 to 31).toSet - 4 - 14
    val triaged = valid -- Mp3Decode.shippedBigTableIds
    assert(triaged == Set(11, 13, 15) ++ (16 to 31), s"triage set $triaged")
  }

  test("synthesis stand-in window: DC gain exactly calibrated, symmetric-class") {
    val d = Mp3Decode.SynthD
    assert(d.length == 512)
    // the Kaiser-sinc prototype is even around 255.5 by construction
    for (i <- 0 until 256)
      assert(math.abs(d(i) - d(511 - i)) < 1e-12)
    // DC calibration is asserted end-to-end by the loud-granule and
    // gain-linearity tests below (nonzero output at sane amplitude)
  }

  // ------------------------------------------------------------------
  // Exact-by-construction decode properties
  // ------------------------------------------------------------------

  test("fast DCT-32 matrixing equals the direct cosine table") {
    // V[i] = Σ_k cos((16+i)(2k+1)π/64)·s[k]: the Lee-recursion fast
    // path must agree with the direct 64×32 table to double-precision
    // noise on arbitrary inputs (the transcription-error detector for
    // the antisymmetry mapping and the per-level cosine factors)
    val rnd = new java.util.Random(7)
    for (_ <- 0 until 200) {
      val s = Array.fill(32)(rnd.nextDouble() * 2 - 1)
      val direct = Array.tabulate(64)(i =>
        (0 until 32).map(k => Mp3Decode.SynthN(i)(k) * s(k)).sum)
      val v = new Array[Double](64)
      Mp3Decode.matrixFast(s, new Array[Double](32),
        new Array[Double](32), v, 0)
      for (i <- 0 until 64)
        assert(math.abs(v(i) - direct(i)) < 1e-9,
          s"V[$i]: fast ${v(i)} direct ${direct(i)}")
    }
  }

  test("silence frames decode to exact zeros at exact geometry, all rates/bitrates") {
    for (srIdx <- 0 to 2; brIdx <- Seq(1, 5, 9, 14); pad <- Seq(0, 1)) {
      val f = frame(brIdx, srIdx, padding = pad)
      val wav = Mp3Decode.decode(f ++ f ++ f)
      val s = wavSamples(wav)
      assert(wavRate(wav) == Array(44100, 48000, 32000)(srIdx))
      assert(wavChannels(wav) == 1)
      assert(s.length == 3 * 1152, s"got ${s.length} samples")
      assert(s.forall(_ == 0), "silence must decode to exact zeros")
    }
  }

  test("stereo silence: two channels, interleaved zeros, exact geometry") {
    val f = frame(5, 0, mono = false)
    val wav = Mp3Decode.decode(f ++ f)
    val s = wavSamples(wav)
    assert(wavChannels(wav) == 2)
    assert(s.length == 2 * 1152 * 2)
    assert(s.forall(_ == 0))
  }

  test("decode is deterministic") {
    val f = frame(5, 0, grs = Seq(LoudGr, Gr(), Gr(), Gr()),
      mainData = Array[Byte](0, 0))
    val a = Mp3Decode.decode(f ++ frame(5, 0) ++ frame(5, 0))
    val b = Mp3Decode.decode(f ++ frame(5, 0) ++ frame(5, 0))
    assert(java.util.Arrays.equals(a, b))
  }

  test("loud count1 granule: nonzero output with the spec-exact support bound") {
    // granule 0 loud, everything after silent. Support: IMDCT
    // overlap-add reaches granule 1; the 16-deep synthesis FIFO
    // extends 15 steps = 480 samples into granule 2. Everything from
    // sample 2*576+512 on must be EXACT zero (zero input through
    // zero state is exact in IEEE arithmetic) — this is the lemma the
    // q185 oracle construction rests on.
    val f = frame(5, 0, grs = Seq(LoudGr, Gr(), Gr(), Gr()),
      mainData = Array[Byte](0, 0))
    val s = wavSamples(Mp3Decode.decode(f ++ frame(5, 0) ++ frame(5, 0)))
    assert(s.length == 3 * 1152)
    val head = s.slice(0, 2 * 576 + 512)
    val tail = s.drop(2 * 576 + 512)
    assert(head.exists(_ != 0), "loud granule produced no output")
    assert(tail.forall(_ == 0),
      s"support leaked past the bound: first nonzero at " +
        s"${tail.indexWhere(_ != 0) + 2 * 576 + 512}")
    // and loudness is substantial, not a rounding artifact
    assert(head.map(math.abs).max > 256,
      s"peak ${head.map(math.abs).max} suspiciously small")
  }

  test("global_gain + 4 doubles amplitude exactly (requantization power law)") {
    def decodeAt(gain: Int): Array[Int] = {
      val f = frame(5, 0,
        grs = Seq(LoudGr.copy(gain = gain), Gr(), Gr(), Gr()),
        mainData = Array[Byte](0, 0))
      wavSamples(Mp3Decode.decode(f ++ frame(5, 0)))
    }
    // gains sized so the doubled signal stays clear of PCM16 clip
    // (gain 200 peaks around ±16k; 2× would clip at ±32768)
    val lo = decodeAt(188)
    val hi = decodeAt(192)
    assert(lo.length == hi.length)
    // 2^((200-196)/4) = 2: each sample doubles, up to ±2 counts of
    // independent PCM rounding
    for (i <- lo.indices)
      assert(math.abs(hi(i) - 2 * lo(i)) <= 2,
        s"sample $i: lo=${lo(i)} hi=${hi(i)}")
  }

  test("MS stereo with silent side channel: L == R exactly") {
    // joint stereo, mode_ext = 2 (MS on): mid = loud, side = silent →
    // L = R = M/√2 sample-for-sample
    val f = frame(5, 0, mono = false, modeExt = 2,
      grs = Seq(LoudGr, Gr(), Gr(), Gr()),
      mainData = Array[Byte](0, 0))
    val wav = Mp3Decode.decode(f ++ frame(5, 0, mono = false, modeExt = 2))
    assert(wavChannels(wav) == 2)
    val s = wavSamples(wav)
    assert(s.grouped(2).forall(p => p(0) == p(1)),
      "mid-only MS signal must decode to identical channels")
    assert(s.exists(_ != 0))
  }

  test("LSF (MPEG-2/2.5): exact geometry, silence, loud granule, scope triage") {
    // silence geometry across both LSF versions, rates, bitrates:
    // 576 samples per frame (ONE granule), the 72·bitrate/rate + pad
    // frame step, the no-scfsi/9-bit-scalefac_compress side info
    for (ver <- Seq(2, 0); srIdx <- 0 to 2; brIdx <- Seq(1, 7, 14);
         pad <- Seq(0, 1)) {
      val f = frame(brIdx, srIdx, padding = pad, ver = ver)
      val wav = Mp3Decode.decode(f ++ f ++ f ++ f)
      val s = wavSamples(wav)
      val expRate = (if (ver == 2) Array(22050, 24000, 16000)
        else Array(11025, 12000, 8000))(srIdx)
      assert(wavRate(wav) == expRate, s"ver $ver sr $srIdx")
      assert(s.length == 4 * 576, s"ver $ver: ${s.length} samples")
      assert(s.forall(_ == 0))
    }
    // loud count1 granule decodes with the same bounded support
    // (one granule: output inside 576 + 576 + 480 < 3·576)
    val loud = frame(5, 0, grs = Seq(LoudGr, Gr(), Gr(), Gr()),
      mainData = Array[Byte](0, 0), ver = 2)
    val rest = frame(5, 0, ver = 2)
    val s2 = wavSamples(Mp3Decode.decode(loud ++ rest ++ rest ++ rest))
    assert(s2.length == 4 * 576)
    assert(s2.take(2 * 576 + 480).exists(_ != 0), "LSF loud granule silent")
    assert(s2.drop(2 * 576 + 480).forall(_ == 0), "LSF support leaked")
    // scope triage (the honesty line): LSF frames that would consult
    // the unshipped partition/band tables NULL the payload
    val sfc = frame(5, 0, grs = Seq(LoudGr.copy(sfCompress = 1),
      Gr(), Gr(), Gr()), mainData = Array[Byte](0, 0), ver = 2)
    assert(Mp3Decode.decode(sfc) == null, "LSF scalefac_compress != 0")
    val bigv = frame(5, 0, grs = Seq(Gr(part23 = 30, bigValues = 2,
      tableSelect = Seq(1, 0, 0)), Gr(), Gr(), Gr()),
      mainData = Array[Byte](0, 0, 0, 0), ver = 2)
    assert(Mp3Decode.decode(bigv) == null, "LSF big values")
    // a version switch mid-stream stops cleanly at the boundary
    val mixed = frame(5, 0) ++ frame(5, 0) ++ frame(5, 0, ver = 2)
    val s3 = wavSamples(Mp3Decode.decode(mixed))
    assert(s3.length == 2 * 1152)
  }

  test("intensity stereo conserves energy: L + R equals the mono decode") {
    // joint stereo, mode_ext = 1 (intensity only): the left channel
    // carries count1 content, the right is all-zero above bound 0 →
    // the whole spectrum is an intensity region with is_pos = 0
    // (right scalefactors unread at sfCompress 0 default to the
    // granule-0 state, zeroed per fresh ChannelState). The spec's
    // panning ratio r = tan(pos·π/12) satisfies
    // L + R = l·(r/(1+r)) + l·(1/(1+r)) = l for every pos, so the
    // stereo decode's per-sample channel SUM must equal the mono
    // decode of the same granule data (±2 counts of independent
    // PCM rounding per channel).
    val stereoF = frame(5, 0, mono = false, modeExt = 1,
      grs = Seq(LoudGr, Gr(), Gr(), Gr()),
      mainData = Array[Byte](0, 0))
    val monoF = frame(5, 0,
      grs = Seq(LoudGr, Gr(), Gr(), Gr()),
      mainData = Array[Byte](0, 0))
    val st = wavSamples(Mp3Decode.decode(
      stereoF ++ frame(5, 0, mono = false, modeExt = 1)))
    val mo = wavSamples(Mp3Decode.decode(monoF ++ frame(5, 0)))
    assert(st.length == 2 * mo.length)
    assert(mo.exists(_ != 0))
    for (i <- mo.indices)
      assert(math.abs((st(2 * i) + st(2 * i + 1)) - mo(i)) <= 2,
        s"sample $i: L=${st(2 * i)} R=${st(2 * i + 1)} mono=${mo(i)}")
  }

  test("big-values tables: table-coded +1 spectrum is bit-identical to count1") {
    // lines 0–7 = +1 coded as four (1,1) big-values pairs through
    // EACH shipped 6+-dim table must decode exactly like the count1
    // coding of the same spectrum (same requantization inputs →
    // identical doubles → identical PCM). Gates the whole big-values
    // read path: region walk, tree decode, sign bits, part2_3 stop.
    val count1 = wavSamples(Mp3Decode.decode(
      frame(5, 0, grs = Seq(LoudGr, Gr(), Gr(), Gr()),
        mainData = Array[Byte](0, 0)) ++ frame(5, 0)))
    assert(count1.exists(_ != 0))
    for (id <- Seq(7, 8, 9, 10, 12)) {
      val (md, bits) = encodePairs(Mp3Decode.tableEntries(id), 0,
        Seq((1, 1), (1, 1), (1, 1), (1, 1)))
      val g = Gr(part23 = bits, bigValues = 4, gain = 200,
        tableSelect = Seq(id, id, id))
      val got = wavSamples(Mp3Decode.decode(
        frame(5, 0, grs = Seq(g, Gr(), Gr(), Gr()), mainData = md) ++
          frame(5, 0)))
      assert(got.sameElements(count1), s"table $id")
    }
  }

  test("cross-table equality: one signed spectrum through every 6+-dim table") {
    // values ≤5 with mixed signs are codable by tables 7, 8, 9 (dim
    // 6) and 10, 12 (dim 8); five independently-entered code tables
    // must all decode the identical spectrum to identical PCM
    val pairs = Seq((3, -1), (-2, 2), (0, -5), (4, 0))
    def dec(id: Int): Array[Int] = {
      val (md, bits) = encodePairs(Mp3Decode.tableEntries(id), 0, pairs)
      val g = Gr(part23 = bits, bigValues = 4, gain = 190,
        tableSelect = Seq(id, id, id))
      wavSamples(Mp3Decode.decode(
        frame(5, 0, grs = Seq(g, Gr(), Gr(), Gr()), mainData = md) ++
          frame(5, 0)))
    }
    val ref = dec(7)
    assert(ref.exists(_ != 0))
    for (id <- Seq(8, 9, 10, 12))
      assert(dec(id).sameElements(ref), s"table $id vs 7")
  }

  test("linbits escape mechanism: synthetic complete 16x16 tables (test seam)") {
    // identity table — all 256 length-8 codes, a complete prefix
    // code by construction — registered at two ids with DIFFERENT
    // linbits widths; the same escaped spectrum through both must
    // decode identically, proving the escape walk reads exactly
    // `linbits` bits before the sign in both positions
    val ents = (for (x <- 0 until 16; y <- 0 until 16)
      yield (x, y, 8, x * 16 + y)).toArray
    def fr(id: Int, md: Array[Byte], bits: Int) = frame(5, 0,
      grs = Seq(Gr(part23 = bits, bigValues = 2, gain = 180,
        tableSelect = Seq(id, id, id)), Gr(), Gr(), Gr()),
      mainData = md) ++ frame(5, 0)
    // pairs: x-escape with sign, plain y; then y-escape; values equal
    // across both ids (17 = 15+2, 16 = 15+1)
    val pairs = Seq((-17, 1), (0, 16))
    try {
      // pre-registration: both ids triage to NULL (registry contract)
      val (md0, bits0) = encodePairs(ents, 8, pairs)
      assert(Mp3Decode.decode(fr(21, md0, bits0)) == null)
      Mp3Decode.registerBigTableForTest(21, 16, ents) // linbits 8
      Mp3Decode.registerBigTableForTest(23, 16, ents) // linbits 13
      val (md21, bits21) = encodePairs(ents, 8, pairs)
      val (md23, bits23) = encodePairs(ents, 13, pairs)
      assert(bits23 == bits21 + 2 * 5) // two escapes × 5 wider linbits
      val a = wavSamples(Mp3Decode.decode(fr(21, md21, bits21)))
      val b = wavSamples(Mp3Decode.decode(fr(23, md23, bits23)))
      assert(a.exists(_ != 0))
      assert(a.sameElements(b))
      // the registered table also survives the structural validator
      // used for shipped data (it IS the same validator)
    } finally Mp3Decode.clearTestTables()
    // post-clear: triage again
    val (mdz, bitsz) = encodePairs(ents, 8, pairs)
    assert(Mp3Decode.decode(fr(21, mdz, bitsz)) == null)
  }

  test("intensity bound snaps UP to a scalefactor-band edge (mid-band zero bound)") {
    // left: two count1 quads (lines 0–7 = +1); right: one quad
    // (1,1,1,0) → lines 0–2 = +1, raw zero bound 3 — MID-BAND (band 0
    // is lines 0–3 at 44.1 kHz). The spec's intensity region starts
    // at a BAND EDGE, so panning begins at line 4: line 3 stays
    // L-only passthrough, lines 4–7 pan fully to R (is_pos = 0 →
    // ratio 0). Exact oracles: each output channel must be
    // bit-identical to the mono decode of its expected spectrum
    // (identical granule pipeline, identical doubles in → PCM out).
    val right = Gr(part23 = 7, gain = 200) // quad (1,1,1,0): 0001 000
    val st = frame(5, 0, mono = false, modeExt = 1,
      grs = Seq(LoudGr, right, Gr(), Gr()),
      mainData = Array[Byte](0x00, 0x00, 0x10)) ++
      frame(5, 0, mono = false, modeExt = 1)
    val pcm = wavSamples(Mp3Decode.decode(st))
    // L ≡ mono of lines 0–3 = +1 (one quad (1,1,1,1): 0000 0000)
    val lMono = wavSamples(Mp3Decode.decode(
      frame(5, 0, grs = Seq(Gr(part23 = 8, gain = 200), Gr(), Gr(), Gr()),
        mainData = Array[Byte](0x00)) ++ frame(5, 0)))
    // R ≡ mono of lines 0–2 and 4–7 = +1 (quads (1,1,1,0),(1,1,1,1))
    val rMono = wavSamples(Mp3Decode.decode(
      frame(5, 0, grs = Seq(Gr(part23 = 15, gain = 200), Gr(), Gr(), Gr()),
        mainData = Array[Byte](0x10, 0x00)) ++ frame(5, 0)))
    assert(pcm.length == 2 * lMono.length)
    assert(lMono.exists(_ != 0) && rMono.exists(_ != 0))
    // the two expected spectra differ at line 3 vs 4 → distinct PCM
    assert(!lMono.sameElements(rMono))
    for (i <- lMono.indices) {
      assert(pcm(2 * i) == lMono(i), s"L sample $i")
      assert(pcm(2 * i + 1) == rMono(i), s"R sample $i")
    }
  }

  test("triage: junk, MPEG-2, Layer II, free bitrate, unsupported table id → null") {
    assert(Mp3Decode.decode(null) == null)
    assert(Mp3Decode.decode("not audio".getBytes) == null)
    val good = frame(5, 0)
    // MPEG-2 (version bits 10): FF F3
    val v2 = good.clone(); v2(1) = 0xF3.toByte
    assert(Mp3Decode.decode(v2) == null)
    // Layer II (layer bits 10): FF FD
    val l2 = good.clone(); l2(1) = 0xFD.toByte
    assert(Mp3Decode.decode(l2) == null)
    // free-format bitrate (index 0)
    val free = good.clone(); free(2) = (free(2) & 0x0F).toByte
    assert(Mp3Decode.decode(free) == null)
    // big_values > 0 with table_select = 16 (valid id, data not
    // shipped): the registry contract NULLs the payload
    val unsup = frame(5, 0,
      grs = Seq(Gr(part23 = 40, bigValues = 2,
        tableSelect = Seq(16, 0, 0)), Gr(), Gr(), Gr()),
      mainData = Array.fill[Byte](5)(0x55))
    assert(Mp3Decode.decode(unsup) == null)
    // truncated mid-frame after a valid first frame: keeps frame 1
    val oneAndAHalf = good ++ good.take(good.length / 2)
    val wav = Mp3Decode.decode(oneAndAHalf)
    assert(wav != null && wavSamples(wav).length == 1152)
  }

  test("ID3v2 tag and trailing zero padding are tolerated") {
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10) ++
      new Array[Byte](10)
    val f = frame(5, 0)
    val wav = Mp3Decode.decode(id3 ++ f ++ f)
    assert(wav != null && wavSamples(wav).length == 2 * 1152)
  }

  test("q192's in-plan frame literals match the independent builder byte-for-byte") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val zeroGr = Gr(gain = 0, count1TableB = false)
    def built(id: Int): Array[Byte] = {
      val (md, bits) = encodePairs(Mp3Decode.tableEntries(id), 0,
        Seq.fill(4)((1, 1)))
      frame(1, 0, grs = Seq(Gr(part23 = bits, bigValues = 4, gain = 200,
        tableSelect = Seq(id, id, id)), zeroGr, zeroGr, zeroGr),
        mainData = md)
    }
    def litF(si10: String, md: String, pad: Int) =
      hx("FFFB10C0" + si10 + "00" * 7 + md + "00" * pad)
    val lits = Map(
      7 -> litF("000000600990039CE008", "30C30C", 80),
      8 -> litF("00000040099004210008", "4444", 81),
      9 -> litF("00000050099004A52008", "8421", 81),
      10 -> litF("00000060099005294008", "30C30C", 80),
      12 -> litF("00000050099006318008", "A52940", 80))
    for ((id, l) <- lits)
      assert(java.util.Arrays.equals(built(id), l),
        s"table $id literal drifted from the builder")
  }

  test("q185's in-plan frame literals match the independent builder byte-for-byte") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val loudLit = hx("FFFB10C0" + "00000040019000000008" +
      "00" * 7 + "0000" + "00" * 81)
    val silentLit = hx("FFFB10C0" + "00" * 100)
    // the in-plan literals use ALL-ZERO bits for silent granules
    // (gain 0, count1 table A) — with part2_3 = 0 no main data is
    // read, so they decode identically to any other silent granule
    val zeroGr = Gr(gain = 0, count1TableB = false)
    val loudBuilt = frame(1, 0,
      grs = Seq(LoudGr.copy(gain = 200), zeroGr, zeroGr, zeroGr),
      mainData = Array[Byte](0, 0))
    val silentBuilt = frame(1, 0, grs = Seq(zeroGr, zeroGr, zeroGr, zeroGr))
    assert(java.util.Arrays.equals(loudBuilt, loudLit),
      s"loud frame literal drifted from the builder:\n" +
        s"built=${loudBuilt.take(30).map(b => f"$b%02X").mkString}\n" +
        s"lit  =${loudLit.take(30).map(b => f"$b%02X").mkString}")
    assert(java.util.Arrays.equals(silentBuilt, silentLit),
      "silent frame literal drifted from the builder")
    // and q184's frame-length arithmetic across the geometry space
    for (brIdx <- 1 to 14; srIdx <- 0 to 2; pad <- 0 to 1) {
      val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
        192, 224, 256, 320)(brIdx)
      val rate = Array(44100, 48000, 32000)(srIdx)
      assert(frame(brIdx, srIdx, pad).length ==
        144000 * kbps / rate + pad)
    }
  }

  // ------------------------------------------------------------------
  // Seam + fingerprint integration (the q184/q185 shapes, in-memory)
  // ------------------------------------------------------------------

  test("AudioStats consumes the decoder's WAV; silence flags as silent") {
    val f = frame(5, 0)
    val wav = Mp3Decode.decode(f ++ f)
    val row = graft.expr.AudioStats.parse(wav)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(row != null)
    // schema: format, channels, sample_rate, bit_depth, n_frames, …
    assert(row.getInt(1) == 1) // channels
    assert(row.getInt(2) == 44100)
    assert(row.getLong(4) == 2 * 1152) // n_frames
  }

  test("AudioEnvSig: loud/quiet granule pattern yields the constructed ehash") {
    // the q185 lemma end-to-end: 16 windows of 4 granules (= 2 frames
    // per window, 32 frames total), loud exactly at windows {2, 7,
    // 11} — no two adjacent. ehash bit w = 1 iff window w+1 louder
    // than window w: expected bits from the pattern alone.
    val loudWindows = Set(2, 7, 11)
    val frames = (0 until 16).flatMap { w =>
      val first =
        if (loudWindows(w))
          frame(5, 0, grs = Seq(LoudGr, Gr(), Gr(), Gr()),
            mainData = Array[Byte](0, 0))
        else frame(5, 0)
      Seq(first, frame(5, 0))
    }
    val wav = Mp3Decode.decode(frames.reduce(_ ++ _))
    val sig = graft.expr.AudioEnvSig.sig(wav, 16)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(sig != null, "envelope NULLed — loud windows missing?")
    val ehash = sig.getLong(2)
    var expected = 0L
    for (w <- 0 until 15) {
      val lvl = (x: Int) => if (loudWindows(x)) 1 else 0
      if (lvl(w + 1) > lvl(w)) expected |= (1L << w)
    }
    assert(ehash == expected,
      s"ehash ${ehash.toBinaryString} != expected ${expected.toBinaryString}")
  }
}

package graft.expr

/** Zero-dependency MPEG Audio Layer III (MP3) sample decoder — the
  * audio twin of [[JpegDecode]]: the reference treats compressed
  * media as opaque blobs (rss_feed_etl has no media tier at all), but
  * a training-data crawl's audio is overwhelmingly MP3, and the
  * [[graft.operators.Multimodal.AudioDecoder]] seam (q178) exists
  * precisely so a real codec can slot in without touching any plan
  * shape. One call decodes one payload to a PCM16 WAV blob the
  * native stats/fingerprint tier ([[AudioStats]], [[AudioEnvSig]])
  * already consumes.
  *
  * Built clean-room from the public ISO/IEC 11172-3 specification.
  * Pipeline (§2.4.3.4, all stages implemented):
  *
  *   sync walk → header → side info → (bit reservoir via
  *   main_data_begin) → scalefactors (scfsi) → Huffman (big-values
  *   pairs, count1 quadruples) → requantization (global_gain,
  *   scalefac_scale, preflag/pretab, subblock_gain) → MS stereo →
  *   short-block reorder → alias reduction → IMDCT (block types
  *   0/1/2/3, mixed) → overlap-add → frequency inversion →
  *   polyphase synthesis filterbank → PCM16 WAV.
  *
  * == Conformance status (read this before relying on waveforms) ==
  *
  * Everything defined by FORMULA in the spec is implemented exactly:
  * frame geometry, side-info layout, the requantization power law,
  * the IMDCT/window/overlap algebra, the synthesis matrixing
  * cos((16+i)(2k+1)π/64), alias-reduction butterflies from the eight
  * published ci constants. Two pieces of the spec are TABULATED DATA
  * rather than formulas, and a clean-room build can only ship what it
  * can verify:
  *
  *  - '''Huffman tables''' (Annex B.7): every shipped table is
  *    validated structurally at class init (prefix-free AND
  *    Kraft-complete — a complete prefix code is a FULL binary
  *    tree, so any single wrong length breaks the Kraft sum and any
  *    wrong codeword collides with another leaf; checked again by
  *    Mp3Spec). The registry is tiered by how the clean-room data
  *    entry survived that validation:
  *     - tier A (tables 0,1,2,3,5,6,7,8,9 + both count1 tables):
  *       entered from recall of the public Annex B.7 data and
  *       validated complete UNCHANGED — the probability of
  *       misremembered data forming a full prefix tree by accident
  *       is astronomically small, so these are treated as
  *       conforming;
  *     - tier B (tables 10 and 12): ≥90% of cells validated as
  *       entered; the handful of cells that conflicted (listed at
  *       the table literals below) were RECONSTRUCTED as the
  *       min-deviation completion of the remaining full tree.
  *       Reconstructed cells sit in the rare high-|value| corners;
  *       a wrong reconstruction mis-decodes (or, on a length
  *       mismatch, desyncs) only the granule that uses one, and
  *       granule damage is bounded by part2_3_length. Near-
  *       conforming, flagged honestly.
  *    Table ids 11, 13, 15 and the linbits family 16–31 did NOT
  *    meet the shipping bar (their 8×8/16×16 code matrices could
  *    not be recalled at ≥90% validated cells, and a structurally
  *    valid but invented table would decode wild files to
  *    deterministic garbage — strictly worse than honest triage,
  *    since cross-encoder near-dup and loudness stats need
  *    CONFORMING PCM). Frames selecting them triage the payload to
  *    NULL — never a wrong decode. The full linbits ESCAPE
  *    mechanism (value-15 escape + per-id linbits widths, Annex
  *    B.2) is nonetheless implemented and spec-tested through the
  *    [[registerBigTableForTest]] seam, which is also the drop-in
  *    point for verified table data.
  *
  *    PERMANENT BOUNDARY (recorded round 15): this environment was
  *    searched exhaustively for real MP3 bytes that could
  *    differentially validate the recalled linbits matrices (the
  *    bit-exact part2_3_length consumption of real encoder granules
  *    is a strong per-table gate) — the single MP3 on the box is
  *    digital silence whose 135 granule table_selects are ALL table
  *    0, and no MP3 encoder (lame/ffmpeg/sox) exists offline to
  *    make one. With zero egress this cannot change, so tables
  *    11/13/15/16–31 stay triaged for good; any future environment
  *    with validation bytes can ship them through the registry seam
  *    without touching the decode path.
  *  - '''Synthesis prototype window''' (Table B.3, 512 tabulated
  *    coefficients): stood in by a Kaiser-windowed sinc lowpass at
  *    the spec's π/64 cutoff, DC-gain self-calibrated to 1 at class
  *    init (deterministic closed computation, no spec data). Output
  *    is therefore NEAR-conforming: silence, zero-support and frame
  *    geometry are EXACT (zero input through zero state is exact
  *    0.0 in IEEE arithmetic regardless of window), and nonzero
  *    waveforms are filter-bank-equivalent up to the prototype's
  *    ripple — adequate for the stats/envelope/fingerprint tier,
  *    not for bit-comparison against libmad. Swapping in the Table
  *    B.3 data restores bit-level conformance without touching any
  *    code path.
  *
  * MPEG-2 and MPEG-2.5 (LSF — the podcast/voice tier: 22.05/24/16
  * and 11.025/12/8 kHz) decode through the same pipeline with the
  * LSF frame geometry (72·bitrate/rate + padding, ONE granule per
  * frame, the 8-bit main_data_begin / no-scfsi / 9-bit
  * scalefac_compress / no-preflag side info). The LSF scalefactor
  * PARTITION tables and LSF band tables are spec data this build
  * does not embed, so LSF frames that would consult them (non-zero
  * scalefac_compress, big-values content, LSF intensity) triage to
  * NULL — the Huffman-registry honesty line; scalefac_compress = 0
  * yields zero scalefactor bits under every published decomposition,
  * so the exactly-decodable LSF subset (silence and count1-only
  * frames, the oracle constructions) needs no table data at all.
  * Free-format bitrate and layers I/II triage to NULL (the
  * [[AudioMeta]] walk already types them).
  *
  * Oracle strategy (q184/q185): silence frames — header + all-zero
  * side info + zero fill — decode to exact zeros in every conforming
  * decoder, so frame-walk arithmetic (the 144·bitrate/rate + padding
  * step, sample counts, channel/rate typing) replays relationally.
  * The loud/quiet construction extends this to the FULL pipeline:
  * a count1-coded granule's output support is bounded (IMDCT
  * overlap ≤ 1 granule + synthesis tail < 512 samples), so loudness
  * windowed at 4-granule granularity yields envelope-sign bits that
  * are exact integers even though the loud samples themselves are
  * codec floats — [[AudioEnvSig]]'s gradient rule never compares two
  * float windows when no two loud windows are adjacent.
  *
  * Scale shape: pure per-row projection behind the seam — no
  * shuffle, no blob movement; ~16 KiB of mutable state per decode
  * (reservoir + filterbank FIFOs), no allocation proportional to
  * anything but output length, output capped at [[MaxFrames]].
  */
object Mp3Decode {

  /** Decoded-output bomb guard: 8192 frames ≈ 3.5 min @ 48 kHz ≈
    * 36 MiB stereo PCM — far above any test payload, far below heap.
    */
  val MaxFrames = 8192

  // ------------------------------------------------------------------
  // Spec tables that ARE formulas or small verified data
  // ------------------------------------------------------------------

  // Layer III bitrates (kbps) by header index (0 = free = unsupported):
  // MPEG-1 and the shared MPEG-2/2.5 LSF table
  private val Kbps =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val KbpsLsf =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  // sample rates by version bits (3 = MPEG-1, 2 = MPEG-2, 0 = MPEG-2.5)
  private val Rates = Array(44100, 48000, 32000)
  private val RatesV2 = Array(22050, 24000, 16000)
  private val RatesV25 = Array(11025, 12000, 8000)

  // scalefactor band boundaries per sample-rate index (Table B.8):
  // 23 long-band edges ending at 576, 14 short ending at 192
  private val LongBands: Array[Array[Int]] = Array(
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134,
      162, 196, 238, 288, 342, 418, 576),
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128,
      156, 190, 230, 276, 330, 384, 576),
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156,
      194, 240, 296, 364, 448, 550, 576))
  private val ShortBands: Array[Array[Int]] = Array(
    Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192),
    Array(0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192),
    Array(0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192))

  // scalefac_compress → (slen1, slen2), §2.4.2.7
  private val Slen1 = Array(0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
  private val Slen2 = Array(0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)

  // preflag pretab (21 long bands), §2.4.3.4.5
  private val Pretab =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2)

  // alias-reduction butterflies, §2.4.3.4.10.1 (the eight published ci)
  private val AliasCs = new Array[Double](8)
  private val AliasCa = new Array[Double](8)
  locally {
    val ci = Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142,
      -0.0037)
    var i = 0
    while (i < 8) {
      val d = math.sqrt(1.0 + ci(i) * ci(i))
      AliasCs(i) = 1.0 / d
      AliasCa(i) = ci(i) / d
      i += 1
    }
  }

  // |v|^(4/3) for the Huffman value range the shipped tables emit
  private val Pow43 = Array.tabulate(16)(v => math.pow(v, 4.0 / 3.0))

  // IMDCT cosine banks (pure formulas, §2.4.3.4.10.2)
  private val Imdct36Cos = Array.tabulate(36, 18)((i, k) =>
    math.cos(math.Pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1)))
  private val Imdct12Cos = Array.tabulate(12, 6)((i, k) =>
    math.cos(math.Pi / 24.0 * (2 * i + 1 + 6) * (2 * k + 1)))

  // IMDCT windows by block type (pure formulas)
  private val WinLong = Array.tabulate(36)(i =>
    math.sin(math.Pi / 36.0 * (i + 0.5)))
  private val WinStart = Array.tabulate(36) { i =>
    if (i < 18) math.sin(math.Pi / 36.0 * (i + 0.5))
    else if (i < 24) 1.0
    else if (i < 30) math.sin(math.Pi / 12.0 * (i - 18 + 0.5))
    else 0.0
  }
  private val WinStop = Array.tabulate(36) { i =>
    if (i < 6) 0.0
    else if (i < 12) math.sin(math.Pi / 12.0 * (i - 6 + 0.5))
    else if (i < 18) 1.0
    else math.sin(math.Pi / 36.0 * (i + 0.5))
  }
  private val WinShort = Array.tabulate(12)(i =>
    math.sin(math.Pi / 12.0 * (i + 0.5)))

  // synthesis matrixing N[i][k] = cos((16+i)(2k+1)π/64), §2.4.3.4.10.3.
  // The direct table stays as the REFERENCE the fast path is
  // spec-checked against (Mp3Spec asserts ≤ 1e-9 on random inputs)
  // and feeds the window's DC calibration.
  private[graft] val SynthN = Array.tabulate(64, 32)((i, k) =>
    math.cos((16 + i) * (2 * k + 1) * math.Pi / 64.0))

  // ---- fast matrixing: V is a rearrangement of the 32-point DCT-II
  // D[m] = Σ_k s[k]·cos(π·m·(2k+1)/64):
  //   V[i]      = D[16+i]          (i 0..15)
  //   V[16]     = D[32] = 0
  //   V[i]      = −D[48−i]         (i 17..47, via D[64−m] = −D[m])
  //   V[48+j]   = −D[j]            (j 0..15, via D[64+m] = −D[m])
  // computed with Lee's recursion (~N·log N mults instead of the
  // direct table's 2048 per step). Output is bit-comparable to the
  // direct form at double precision (≤ 1e-9 relative, spec-gated);
  // the zero-support and silence guarantees are unaffected (zero in,
  // zero out exactly along both paths).
  private val DctHalfSec: Array[Array[Double]] = {
    // per level n = 32,16,8,4,2: 0.5 / cos((2k+1)π/(2n)) for k < n/2
    val levels = Seq(32, 16, 8, 4, 2)
    levels.map(n => Array.tabulate(n / 2)(k =>
      0.5 / math.cos((2 * k + 1) * math.Pi / (2.0 * n)))).toArray
  }

  /** In-place 32-point DCT-II over x[off..off+n), Lee's even/odd
    * recursion; `tmp` is per-call scratch (32 doubles), `lvl` indexes
    * [[DctHalfSec]].
    */
  private def dct32(x: Array[Double], off: Int, n: Int,
      tmp: Array[Double], lvl: Int): Unit = {
    if (n == 1) return
    val h = n / 2
    val c = DctHalfSec(lvl)
    var k = 0
    while (k < h) {
      val a = x(off + k)
      val b = x(off + n - 1 - k)
      tmp(k) = a + b
      tmp(h + k) = (a - b) * c(k)
      k += 1
    }
    System.arraycopy(tmp, 0, x, off, n)
    dct32(x, off, h, tmp, lvl + 1)
    dct32(x, off + h, h, tmp, lvl + 1)
    // interleave: even coefficients from the first half, odd from
    // the running-sum of the second
    k = 0
    while (k < h) {
      tmp(2 * k) = x(off + k)
      tmp(2 * k + 1) =
        if (k + 1 < h) x(off + h + k) + x(off + h + k + 1)
        else x(off + h + k)
      k += 1
    }
    System.arraycopy(tmp, 0, x, off, n)
  }

  /** s[32] → V[64] via the fast DCT-32 (see the mapping above).
    * `d` and `tmp` are caller scratch (32 doubles each).
    */
  private[graft] def matrixFast(s: Array[Double], d: Array[Double],
      tmp: Array[Double], v: Array[Double], vOff: Int): Unit = {
    System.arraycopy(s, 0, d, 0, 32)
    dct32(d, 0, 32, tmp, 0)
    var i = 0
    while (i < 16) { v(vOff + i) = d(16 + i); i += 1 }
    v(vOff + 16) = 0.0
    i = 17
    while (i < 48) { v(vOff + i) = -d(48 - i); i += 1 }
    i = 48
    while (i < 64) { v(vOff + i) = -d(i - 48); i += 1 }
  }

  /** Stand-in synthesis prototype (see class scaladoc): 512-tap
    * Kaiser(β=9)-windowed sinc at the π/64 half-subband cutoff,
    * scaled so the filterbank's measured DC gain is exactly 1. The
    * spec's Table B.3 values drop in here verbatim if bit-level
    * conformance is ever required.
    */
  private[graft] val SynthD: Array[Double] = {
    def i0(x: Double): Double = { // modified Bessel I0, series
      var sum = 1.0; var term = 1.0; var k = 1
      while (k < 50) {
        term *= (x / (2.0 * k)) * (x / (2.0 * k)); sum += term; k += 1
      }
      sum
    }
    val beta = 9.0
    val c = 255.5
    val d = Array.tabulate(512) { n =>
      val t = (n - c) / 64.0 // sinc zeros at multiples of 64 samples
      val sinc = if (t == 0.0) 1.0 else math.sin(math.Pi * t) / (math.Pi * t)
      val r = (n - c) / c
      sinc * i0(beta * math.sqrt(math.max(0.0, 1.0 - r * r))) / i0(beta)
    }
    // DC calibration: feed S = (1,0,…,0) until the FIFO fills, read
    // the steady-state mean output, scale to gain 1 (deterministic)
    val v = new Array[Double](1024)
    var off = 0
    var step = 0
    var mean = 0.0
    while (step < 40) {
      off = (off + 1024 - 64) % 1024
      var i = 0
      while (i < 64) { v(off + i) = SynthN(i)(0); i += 1 }
      if (step == 39) {
        var j = 0
        var tot = 0.0
        while (j < 32) {
          var s = 0.0
          var q = 0
          while (q < 16) {
            val uIdx = // U[q*32+j] per the spec's V→U pattern
              if ((q & 1) == 0) (off + (q >> 1) * 128 + j) % 1024
              else (off + (q >> 1) * 128 + 96 + j) % 1024
            s += v(uIdx) * d(q * 32 + j)
            q += 1
          }
          tot += s
          j += 1
        }
        mean = tot / 32.0
      }
      step += 1
    }
    val g = 1.0 / mean
    d.map(_ * g)
  }

  // ------------------------------------------------------------------
  // Huffman registry — Annex B.7 data, structurally validated
  // ------------------------------------------------------------------

  /** One big-values table: dimension and (x, y, hlen, hcod) entries.
    * Shipped ids: 1,2,3,5,6,7,8,9 (tier A — recall validated
    * unchanged) and 10,12 (tier B — reconstructed cells listed at
    * the literals). Ids 4 and 14 are invalid per spec; 11, 13, 15
    * and the linbits ids 16–31 are valid ids below the shipping bar
    * (see the class docstring) — selecting them triages the payload
    * to NULL rather than risking a silently wrong decode.
    */
  private final case class HTable(dim: Int, entries: Array[(Int, Int, Int, Int)])

  private val BigTables: Map[Int, HTable] = Map(
    1 -> HTable(2, Array((0, 0, 1, 1), (0, 1, 3, 1), (1, 0, 2, 1),
      (1, 1, 3, 0))),
    2 -> HTable(3, Array((0, 0, 1, 1), (0, 1, 3, 2), (0, 2, 6, 1),
      (1, 0, 3, 3), (1, 1, 3, 1), (1, 2, 5, 1),
      (2, 0, 5, 3), (2, 1, 5, 2), (2, 2, 6, 0))),
    3 -> HTable(3, Array((0, 0, 2, 3), (0, 1, 2, 2), (0, 2, 6, 1),
      (1, 0, 3, 1), (1, 1, 2, 1), (1, 2, 5, 1),
      (2, 0, 5, 3), (2, 1, 5, 2), (2, 2, 6, 0))),
    5 -> HTable(4, Array((0, 0, 1, 1), (0, 1, 3, 2), (0, 2, 6, 6),
      (0, 3, 7, 5), (1, 0, 3, 3), (1, 1, 3, 1), (1, 2, 6, 4),
      (1, 3, 7, 4), (2, 0, 6, 7), (2, 1, 6, 5), (2, 2, 7, 7),
      (2, 3, 8, 1), (3, 0, 7, 6), (3, 1, 6, 1), (3, 2, 7, 1),
      (3, 3, 8, 0))),
    6 -> HTable(4, Array((0, 0, 3, 7), (0, 1, 3, 3), (0, 2, 5, 5),
      (0, 3, 7, 1), (1, 0, 3, 6), (1, 1, 2, 2), (1, 2, 4, 3),
      (1, 3, 5, 2), (2, 0, 4, 5), (2, 1, 4, 4), (2, 2, 5, 4),
      (2, 3, 6, 1), (3, 0, 6, 3), (3, 1, 5, 3), (3, 2, 6, 2),
      (3, 3, 7, 0))),

    7 -> HTable(6, Array(
      (0, 0, 1, 0x01), (0, 1, 3, 0x02), (0, 2, 6, 0x0a), (0, 3, 8, 0x13),
      (0, 4, 8, 0x10), (0, 5, 9, 0x0a), (1, 0, 3, 0x03), (1, 1, 4, 0x03),
      (1, 2, 6, 0x07), (1, 3, 7, 0x0a), (1, 4, 7, 0x05), (1, 5, 8, 0x03),
      (2, 0, 6, 0x0b), (2, 1, 5, 0x04), (2, 2, 7, 0x0d), (2, 3, 8, 0x11),
      (2, 4, 8, 0x08), (2, 5, 9, 0x04), (3, 0, 7, 0x0c), (3, 1, 7, 0x0b),
      (3, 2, 8, 0x12), (3, 3, 9, 0x0f), (3, 4, 9, 0x0b), (3, 5, 9, 0x02),
      (4, 0, 7, 0x07), (4, 1, 7, 0x06), (4, 2, 8, 0x09), (4, 3, 9, 0x0e),
      (4, 4, 9, 0x03), (4, 5, 10, 0x01), (5, 0, 8, 0x06), (5, 1, 8, 0x04),
      (5, 2, 9, 0x05), (5, 3, 10, 0x03), (5, 4, 10, 0x02), (5, 5, 10, 0x00))),
    8 -> HTable(6, Array(
      (0, 0, 2, 0x03), (0, 1, 3, 0x04), (0, 2, 6, 0x06), (0, 3, 8, 0x12),
      (0, 4, 8, 0x0c), (0, 5, 9, 0x05), (1, 0, 3, 0x05), (1, 1, 2, 0x01),
      (1, 2, 4, 0x02), (1, 3, 8, 0x10), (1, 4, 8, 0x09), (1, 5, 8, 0x03),
      (2, 0, 6, 0x07), (2, 1, 4, 0x03), (2, 2, 6, 0x05), (2, 3, 8, 0x0e),
      (2, 4, 8, 0x07), (2, 5, 9, 0x03), (3, 0, 8, 0x13), (3, 1, 8, 0x11),
      (3, 2, 8, 0x0f), (3, 3, 9, 0x0d), (3, 4, 9, 0x0a), (3, 5, 10, 0x04),
      (4, 0, 8, 0x0d), (4, 1, 7, 0x05), (4, 2, 8, 0x08), (4, 3, 9, 0x0b),
      (4, 4, 10, 0x05), (4, 5, 10, 0x01), (5, 0, 9, 0x0c), (5, 1, 8, 0x04),
      (5, 2, 9, 0x04), (5, 3, 9, 0x01), (5, 4, 11, 0x01), (5, 5, 11, 0x00))),
    9 -> HTable(6, Array(
      (0, 0, 3, 0x07), (0, 1, 3, 0x05), (0, 2, 5, 0x09), (0, 3, 6, 0x0e),
      (0, 4, 8, 0x0f), (0, 5, 9, 0x07), (1, 0, 3, 0x06), (1, 1, 3, 0x04),
      (1, 2, 4, 0x05), (1, 3, 5, 0x05), (1, 4, 6, 0x06), (1, 5, 8, 0x07),
      (2, 0, 4, 0x07), (2, 1, 4, 0x06), (2, 2, 5, 0x08), (2, 3, 6, 0x08),
      (2, 4, 7, 0x08), (2, 5, 8, 0x05), (3, 0, 6, 0x0f), (3, 1, 5, 0x06),
      (3, 2, 6, 0x09), (3, 3, 7, 0x0a), (3, 4, 7, 0x05), (3, 5, 8, 0x01),
      (4, 0, 7, 0x0b), (4, 1, 6, 0x07), (4, 2, 7, 0x09), (4, 3, 7, 0x06),
      (4, 4, 8, 0x04), (4, 5, 9, 0x01), (5, 0, 8, 0x0e), (5, 1, 7, 0x04),
      (5, 2, 8, 0x06), (5, 3, 8, 0x02), (5, 4, 9, 0x06), (5, 5, 9, 0x00))),

    // tier B — reconstructed cells (min-deviation completion of the
    // validated remainder): t10 (5,6)(6,2)(6,7)(7,4)(7,5); see the
    // class docstring's conformance note
    10 -> HTable(8, Array(
      (0, 0, 1, 0x01), (0, 1, 3, 0x02), (0, 2, 6, 0x0a), (0, 3, 8, 0x17),
      (0, 4, 9, 0x23), (0, 5, 9, 0x1e), (0, 6, 9, 0x0c), (0, 7, 10, 0x11),
      (1, 0, 3, 0x03), (1, 1, 4, 0x03), (1, 2, 6, 0x08), (1, 3, 7, 0x0c),
      (1, 4, 8, 0x12), (1, 5, 9, 0x15), (1, 6, 8, 0x0c), (1, 7, 8, 0x07),
      (2, 0, 6, 0x0b), (2, 1, 6, 0x09), (2, 2, 7, 0x0f), (2, 3, 8, 0x15),
      (2, 4, 9, 0x20), (2, 5, 10, 0x28), (2, 6, 9, 0x13), (2, 7, 9, 0x06),
      (3, 0, 7, 0x0e), (3, 1, 7, 0x0d), (3, 2, 8, 0x16), (3, 3, 9, 0x22),
      (3, 4, 10, 0x2e), (3, 5, 10, 0x17), (3, 6, 9, 0x12), (3, 7, 10, 0x07),
      (4, 0, 8, 0x14), (4, 1, 8, 0x13), (4, 2, 9, 0x21), (4, 3, 10, 0x2f),
      (4, 4, 10, 0x1b), (4, 5, 10, 0x16), (4, 6, 10, 0x09), (4, 7, 10, 0x03),
      (5, 0, 9, 0x1f), (5, 1, 9, 0x16), (5, 2, 10, 0x29), (5, 3, 10, 0x1a),
      (5, 4, 10, 0x15), (5, 5, 11, 0x14), (5, 6, 10, 0x02), (5, 7, 11, 0x03),
      (6, 0, 8, 0x0e), (6, 1, 8, 0x0d), (6, 2, 10, 0x04), (6, 3, 10, 0x0b),
      (6, 4, 10, 0x10), (6, 5, 10, 0x06), (6, 6, 10, 0x05), (6, 7, 10, 0x14),
      (7, 0, 9, 0x09), (7, 1, 8, 0x08), (7, 2, 9, 0x07), (7, 3, 10, 0x08),
      (7, 4, 11, 0x01), (7, 5, 11, 0x15), (7, 6, 11, 0x02), (7, 7, 11, 0x00))),

    // tier B — reconstructed cells: t12 (3,0)(5,4)(6,7)
    12 -> HTable(8, Array(
      (0, 0, 4, 0x09), (0, 1, 3, 0x06), (0, 2, 5, 0x10), (0, 3, 7, 0x21),
      (0, 4, 8, 0x29), (0, 5, 9, 0x27), (0, 6, 9, 0x26), (0, 7, 9, 0x1a),
      (1, 0, 3, 0x07), (1, 1, 3, 0x05), (1, 2, 4, 0x06), (1, 3, 5, 0x09),
      (1, 4, 7, 0x17), (1, 5, 7, 0x10), (1, 6, 8, 0x1a), (1, 7, 8, 0x0b),
      (2, 0, 5, 0x11), (2, 1, 4, 0x07), (2, 2, 5, 0x0b), (2, 3, 6, 0x0e),
      (2, 4, 7, 0x15), (2, 5, 8, 0x1e), (2, 6, 7, 0x0a), (2, 7, 8, 0x07),
      (3, 0, 6, 0x11), (3, 1, 5, 0x0a), (3, 2, 6, 0x0f), (3, 3, 6, 0x0c),
      (3, 4, 7, 0x12), (3, 5, 8, 0x1c), (3, 6, 8, 0x0e), (3, 7, 8, 0x05),
      (4, 0, 7, 0x20), (4, 1, 6, 0x0d), (4, 2, 7, 0x16), (4, 3, 7, 0x13),
      (4, 4, 8, 0x12), (4, 5, 8, 0x10), (4, 6, 8, 0x09), (4, 7, 9, 0x05),
      (5, 0, 8, 0x28), (5, 1, 8, 0x11), (5, 2, 8, 0x1f), (5, 3, 8, 0x1d),
      (5, 4, 8, 0x22), (5, 5, 9, 0x0d), (5, 6, 8, 0x04), (5, 7, 9, 0x02),
      (6, 0, 8, 0x1b), (6, 1, 7, 0x0c), (6, 2, 7, 0x0b), (6, 3, 8, 0x0f),
      (6, 4, 8, 0x0a), (6, 5, 9, 0x07), (6, 6, 9, 0x04), (6, 7, 8, 0x23),
      (7, 0, 9, 0x1b), (7, 1, 8, 0x0c), (7, 2, 8, 0x08), (7, 3, 9, 0x0c),
      (7, 4, 9, 0x06), (7, 5, 9, 0x03), (7, 6, 9, 0x01), (7, 7, 9, 0x00))),
  )

  // count1 table A (id 32 in the spec listing): (quad, hlen, hcod)
  private val Count1A: Array[(Int, Int, Int)] = Array(
    (0, 1, 1), (1, 4, 5), (2, 4, 4), (3, 5, 5), (4, 4, 6), (5, 6, 5),
    (6, 5, 4), (7, 6, 4), (8, 4, 7), (9, 5, 3), (10, 5, 6), (11, 6, 0),
    (12, 5, 7), (13, 6, 2), (14, 6, 3), (15, 6, 1))
  // count1 table B: fixed 4-bit codes, hcod = one's complement of quad

  /** Flat binary decode tree: node i holds (zeroChild, oneChild);
    * negative entry = ~leafValue. Built once per table.
    */
  private def buildTree(codes: Array[(Int, Int, Int)]): Array[Int] = {
    val nodes = new java.util.ArrayList[Array[Int]]()
    nodes.add(Array(0, 0))
    for ((value, len, code) <- codes) {
      var at = 0
      var bit = len - 1
      while (bit >= 0) {
        val b = (code >>> bit) & 1
        val n = nodes.get(at)
        if (bit == 0) {
          require(n(b) == 0, s"huffman collision at value $value")
          n(b) = ~value // leaf
        } else {
          if (n(b) == 0) { nodes.add(Array(0, 0)); n(b) = nodes.size - 1 }
          require(n(b) > 0, s"huffman prefix violation at value $value")
          at = n(b)
        }
        bit -= 1
      }
    }
    val flat = new Array[Int](nodes.size * 2)
    var i = 0
    while (i < nodes.size) {
      flat(2 * i) = nodes.get(i)(0); flat(2 * i + 1) = nodes.get(i)(1)
      i += 1
    }
    flat
  }

  /** Structural validation + Kraft completeness for a shipped table —
    * the init-time arm of the Mp3Spec check. Misremembered Annex B.7
    * data fails loudly here, not silently in a decode.
    */
  private def validated(codes: Array[(Int, Int, Int)],
      requireComplete: Boolean): Array[Int] = {
    var kraft = 0.0
    for ((_, len, code) <- codes) {
      require(len >= 1 && len <= 19 && code >= 0 && code < (1 << len),
        "huffman entry out of range")
      kraft += math.pow(2.0, -len)
    }
    require(!requireComplete || math.abs(kraft - 1.0) < 1e-12,
      f"huffman table Kraft sum $kraft%.9f != 1")
    buildTree(codes) // throws on any prefix violation
  }

  private val BigTrees: Map[Int, (Int, Array[Int])] = BigTables.map {
    case (id, t) =>
      val codes = t.entries.map { case (x, y, l, c) => (x * t.dim + y, l, c) }
      id -> (t.dim, validated(codes, requireComplete = true))
  }
  private val Count1TreeA: Array[Int] =
    validated(Count1A, requireComplete = true)

  /** linbits widths for table ids 16–31 (Annex B.2: ids 16–23 share
    * one 16×16 code table, 24–31 another; only the escape width
    * varies). Spec data, validated by use: a value of 15 in either
    * pair member is an ESCAPE — the decoder reads this many extra
    * bits and adds them to 15 before the sign bit.
    */
  private val Linbits: Map[Int, Int] = Map(
    16 -> 1, 17 -> 2, 18 -> 3, 19 -> 4, 20 -> 6, 21 -> 8, 22 -> 10,
    23 -> 13, 24 -> 4, 25 -> 5, 26 -> 6, 27 -> 7, 28 -> 8, 29 -> 9,
    30 -> 11, 31 -> 13)

  /** Test-only registry extension AND the documented drop-in point
    * for verified Annex B.7 data: tables registered here decode
    * exactly as shipped ones (including the linbits escape for ids
    * ≥16), go through the same full-tree validation, and are
    * consulted only after the static registry misses. Mp3Spec uses
    * it to exercise the escape path with a synthetic complete table;
    * production code never touches it.
    */
  @volatile private[graft] var extTrees: Map[Int, (Int, Array[Int])] = Map.empty

  private[graft] def registerBigTableForTest(id: Int, dim: Int,
      entries: Array[(Int, Int, Int, Int)]): Unit = {
    require(id >= 1 && id <= 31 && id != 4 && id != 14, s"invalid id $id")
    val codes = entries.map { case (x, y, l, c) => (x * dim + y, l, c) }
    extTrees += id -> (dim, validated(codes, requireComplete = true))
  }
  private[graft] def clearTestTables(): Unit = extTrees = Map.empty

  @inline private def bigTree(id: Int): Option[(Int, Array[Int])] =
    BigTrees.get(id).orElse(if (extTrees.isEmpty) None else extTrees.get(id))

  // ------------------------------------------------------------------
  // Bit reader (MSB-first)
  // ------------------------------------------------------------------

  private final class BitReader(val buf: Array[Byte], var pos: Int,
      val end: Int) { // pos/end in BITS
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        v = (v << 1) |
          (if (p < end) (buf(p >> 3) >> (7 - (p & 7))) & 1 else 0)
        i += 1
      }
      pos += n
      v
    }
    def bit(): Int = bits(1)
    def tree(flat: Array[Int]): Int = {
      var at = 0
      var guard = 0
      while (guard < 20) {
        val nxt = flat(2 * at + bit())
        if (nxt < 0) return ~nxt
        if (nxt == 0) return -1 // dead branch: invalid code
        at = nxt
        guard += 1
      }
      -1
    }
  }

  // ------------------------------------------------------------------
  // Per-frame structures
  // ------------------------------------------------------------------

  private final class GranuleInfo {
    var part23Length = 0
    var bigValues = 0
    var globalGain = 0
    var scalefacCompress = 0
    var windowSwitching = false
    var blockType = 0
    var mixedBlock = false
    val tableSelect = new Array[Int](3)
    val subblockGain = new Array[Int](3)
    var region0Count = 0
    var region1Count = 0
    var preflag = 0
    var scalefacScale = 0
    var count1Table = 0
  }

  private final class ChannelState {
    val overlap = Array.ofDim[Double](32, 18) // IMDCT overlap store
    val v = new Array[Double](1024) // synthesis FIFO (ring)
    var vOff = 0
    var zeroSteps = 16 // consecutive all-zero synthesis inputs (≥16 ⇒ FIFO all-zero)
    val stepBuf = new Array[Byte](64) // one synthesis step's PCM16 output
    val dctBuf = new Array[Double](32) // fast-matrixing scratch
    val dctTmp = new Array[Double](32)
    val sumBuf = new Array[Double](32) // window-sum accumulators
    val scalefacL = new Array[Int](23)
    val scalefacS = Array.ofDim[Int](13, 3)
  }

  // ------------------------------------------------------------------
  // Public entry
  // ------------------------------------------------------------------

  /** payload → 44-byte-header PCM16 WAV, or null (not MPEG-1 Layer
    * III / unsupported table id / corrupt). Never throws.
    */
  def decode(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 4) return null
    try decodeChecked(b)
    catch { case _: Exception => null }
  }

  private def decodeChecked(b: Array[Byte]): Array[Byte] = {
    var o = 0
    // ID3v2 skip (syncsafe size), then zero-padding tolerance — the
    // same front walk as AudioMeta.parseMp3
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      o = 10 + size
      if (o < 0 || o >= b.length) return null
    }
    while (o < b.length && b(o) == 0) o += 1

    // rolling state
    val reservoir = new java.io.ByteArrayOutputStream()
    val pcm = new java.io.ByteArrayOutputStream()
    var channels = 0
    var sampleRate = 0
    var st: Array[ChannelState] = null
    var frames = 0

    val is = new Array[Int](576)
    val xr = Array.ofDim[Double](2, 576)
    val gi = Array.fill(2, 2)(new GranuleInfo)
    val scfsi = Array.ofDim[Boolean](2, 4)
    val sbSamples = Array.ofDim[Double](32, 18)
    val outStep = new Array[Double](32)

    while (o + 4 <= b.length && frames < MaxFrames) {
      if ((b(o) & 0xff) != 0xff || (b(o + 1) & 0xe0) != 0xe0)
        return finish(pcm, channels, sampleRate, frames)
      val h1 = b(o + 1) & 0xff; val h2 = b(o + 2) & 0xff
      val h3 = b(o + 3) & 0xff
      val verBits = (h1 >> 3) & 0x3
      val layerBits = (h1 >> 1) & 0x3
      // Layer III, MPEG-1 (2 granules/frame) or MPEG-2/2.5 LSF
      // (1 granule/frame); version bits 1 are reserved
      if (verBits == 1 || layerBits != 1)
        return finish(pcm, channels, sampleRate, frames)
      val mpeg1 = verBits == 3
      val nGr = if (mpeg1) 2 else 1
      val protection = h1 & 1 // 0 = CRC present
      val brIdx = (h2 >> 4) & 0xf
      val srIdx = (h2 >> 2) & 0x3
      if (brIdx == 0 || brIdx == 15 || srIdx == 3)
        return finish(pcm, channels, sampleRate, frames)
      val padding = (h2 >> 1) & 0x1
      val mode = (h3 >> 6) & 0x3
      val modeExt = (h3 >> 4) & 0x3
      val nch = if (mode == 3) 1 else 2
      val rate = (if (mpeg1) Rates
        else if (verBits == 2) RatesV2 else RatesV25)(srIdx)
      if (frames == 0) {
        channels = nch; sampleRate = rate
        st = Array.fill(nch)(new ChannelState)
      } else if (nch != channels || rate != sampleRate)
        return finish(pcm, channels, sampleRate, frames) // format switch: stop
      val kbps = (if (mpeg1) Kbps else KbpsLsf)(brIdx)
      // LSF frames carry half the granules, so the slot count halves
      val frameLen = (if (mpeg1) 144 else 72) * kbps * 1000 / rate + padding
      if (frameLen <= 4 || o + frameLen > b.length)
        return finish(pcm, channels, sampleRate, frames)

      // ---- side info (version-dependent layout: MPEG-1 has a
      // 9-bit main_data_begin, scfsi and two granules; LSF an 8-bit
      // main_data_begin, no scfsi, one granule with a 9-bit
      // scalefac_compress and no preflag) ----
      val siStart = o + 4 + (if (protection == 0) 2 else 0)
      val siBytes =
        if (mpeg1) { if (nch == 1) 17 else 32 }
        else { if (nch == 1) 9 else 17 }
      if (siStart + siBytes > o + frameLen)
        return finish(pcm, channels, sampleRate, frames)
      val br = new BitReader(b, siStart * 8, (siStart + siBytes) * 8)
      val mainDataBegin = br.bits(if (mpeg1) 9 else 8)
      br.bits(
        if (mpeg1) { if (nch == 1) 5 else 3 }
        else { if (nch == 1) 1 else 2 }) // private
      var ch = 0
      while (ch < nch) {
        var g = 0
        while (g < 4) {
          scfsi(ch)(g) = mpeg1 && br.bit() == 1 // LSF has no scfsi bits
          g += 1
        }
        ch += 1
      }
      var gr = 0
      while (gr < nGr) {
        ch = 0
        while (ch < nch) {
          val g = gi(gr)(ch)
          g.part23Length = br.bits(12)
          g.bigValues = br.bits(9)
          g.globalGain = br.bits(8)
          g.scalefacCompress = br.bits(if (mpeg1) 4 else 9)
          g.windowSwitching = br.bit() == 1
          if (g.windowSwitching) {
            g.blockType = br.bits(2)
            g.mixedBlock = br.bit() == 1
            g.tableSelect(0) = br.bits(5)
            g.tableSelect(1) = br.bits(5)
            g.tableSelect(2) = 0
            g.subblockGain(0) = br.bits(3)
            g.subblockGain(1) = br.bits(3)
            g.subblockGain(2) = br.bits(3)
            if (g.blockType == 0) return null // forbidden combination
            g.region0Count = if (g.blockType == 2 && !g.mixedBlock) 8 else 7
            g.region1Count = 20 - g.region0Count
          } else {
            g.blockType = 0
            g.mixedBlock = false
            g.tableSelect(0) = br.bits(5)
            g.tableSelect(1) = br.bits(5)
            g.tableSelect(2) = br.bits(5)
            g.subblockGain(0) = 0; g.subblockGain(1) = 0
            g.subblockGain(2) = 0
            g.region0Count = br.bits(4)
            g.region1Count = br.bits(3)
          }
          g.preflag = if (mpeg1) br.bit() else 0 // LSF has no preflag
          g.scalefacScale = br.bit()
          g.count1Table = br.bit()
          // LSF scope (the Huffman-registry honesty line): the LSF
          // scalefactor PARTITION tables and the 22.05/24/16/11.025/
          // 12/8 kHz band tables are spec DATA this clean-room build
          // does not embed — frames that would consult them
          // (non-zero scalefac_compress, big-values content, or LSF
          // intensity stereo) triage the payload to NULL rather than
          // decode wrongly. scalefac_compress = 0 yields zero
          // scalefactor bits under EVERY published decomposition, so
          // the exactly-decodable LSF subset (silence + count1-only
          // frames — the oracle constructions) needs no table data.
          if (!mpeg1 && (g.scalefacCompress != 0 || g.bigValues > 0 ||
              (mode == 1 && (modeExt & 1) != 0)))
            return null
          ch += 1
        }
        gr += 1
      }

      // ---- bit reservoir ----
      val mainLen = o + frameLen - (siStart + siBytes)
      reservoir.write(b, siStart + siBytes, mainLen)
      val res = reservoir.toByteArray
      val thisFrameMainAt = res.length - mainLen
      val mainStart = thisFrameMainAt - mainDataBegin
      if (mainStart < 0) {
        // reservoir underrun (stream started mid-reservoir): the
        // standard recovery is a silent frame
        val n0 = 576 * nGr * nch * 2
        pcm.write(new Array[Byte](n0), 0, n0)
      } else {
        val mbr = new BitReader(res, mainStart * 8, res.length * 8)
        gr = 0
        while (gr < nGr) {
          ch = 0
          while (ch < nch) {
            val g = gi(gr)(ch)
            val part2Start = mbr.pos
            if (!readScalefacs(mbr, g, gr, ch, scfsi, st(ch)))
              return null
            if (!readHuffman(mbr, g, srIdx, part2Start, is))
              return null
            requantize(is, g, srIdx, st(ch), xr(ch))
            ch += 1
          }
          // MS stereo (mode_ext bit 1); intensity (bit 0) on the
          // zero region of the right channel
          if (nch == 2 && mode == 1)
            stereo(xr, gi(gr)(1), st(1), srIdx, modeExt)
          ch = 0
          while (ch < nch) {
            val g = gi(gr)(ch)
            if (g.blockType == 2) reorder(xr(ch), g, srIdx)
            antialias(xr(ch), g)
            hybrid(xr(ch), g, st(ch), sbSamples)
            // frequency inversion + synthesis, 18 steps of 32
            var t = 0
            while (t < 18) {
              var s = 0
              while (s < 32) {
                val x = sbSamples(s)(t)
                outStep(s) = if ((s & 1) == 1 && (t & 1) == 1) -x else x
                s += 1
              }
              synth(st(ch), outStep, pcm)
              t += 1
            }
            ch += 1
          }
          gr += 1
        }
      }

      // trim consumed reservoir front (keep 511 bytes of history —
      // the spec's maximum main_data_begin)
      val keep = 512 // ≥ the spec's 511-byte main_data_begin maximum
      if (reservoir.size() > 2 * keep) {
        val r = reservoir.toByteArray
        reservoir.reset()
        reservoir.write(r, r.length - keep, keep)
      }
      o += frameLen
      frames += 1
    }
    finish(pcm, channels, sampleRate, frames)
  }

  // ------------------------------------------------------------------
  // Stage implementations
  // ------------------------------------------------------------------

  private def readScalefacs(br: BitReader, g: GranuleInfo, gr: Int,
      ch: Int, scfsi: Array[Array[Boolean]], st: ChannelState): Boolean = {
    val s1 = Slen1(g.scalefacCompress)
    val s2 = Slen2(g.scalefacCompress)
    if (g.windowSwitching && g.blockType == 2) {
      if (g.mixedBlock) {
        var b = 0
        while (b < 8) { st.scalefacL(b) = br.bits(s1); b += 1 }
        b = 3
        while (b < 6) {
          var w = 0
          while (w < 3) { st.scalefacS(b)(w) = br.bits(s1); w += 1 }
          b += 1
        }
        b = 6
        while (b < 12) {
          var w = 0
          while (w < 3) { st.scalefacS(b)(w) = br.bits(s2); w += 1 }
          b += 1
        }
      } else {
        var b = 0
        while (b < 6) {
          var w = 0
          while (w < 3) { st.scalefacS(b)(w) = br.bits(s1); w += 1 }
          b += 1
        }
        b = 6
        while (b < 12) {
          var w = 0
          while (w < 3) { st.scalefacS(b)(w) = br.bits(s2); w += 1 }
          b += 1
        }
      }
      st.scalefacS(12)(0) = 0; st.scalefacS(12)(1) = 0
      st.scalefacS(12)(2) = 0
    } else {
      // long blocks; scfsi groups (0-5, 6-10, 11-15, 16-20) shared
      // with granule 0 when the bit is set
      val groups = Array((0, 6), (6, 11), (11, 16), (16, 21))
      var gIdx = 0
      while (gIdx < 4) {
        val (lo, hi) = groups(gIdx)
        val share = gr == 1 && scfsi(ch)(gIdx)
        if (!share) {
          var b = lo
          while (b < hi) {
            st.scalefacL(b) = br.bits(if (b < 11) s1 else s2)
            b += 1
          }
        } // else keep granule 0's values already in st.scalefacL
        gIdx += 1
      }
      st.scalefacL(21) = 0; st.scalefacL(22) = 0
    }
    true
  }

  /** Big-values pairs + count1 quadruples → is[576]. False = corrupt;
    * an UNSUPPORTED (but valid) table id also returns false, which
    * the caller turns into a NULL payload — the registry contract.
    */
  private def readHuffman(br: BitReader, g: GranuleInfo, srIdx: Int,
      part2Start: Int, is: Array[Int]): Boolean = {
    java.util.Arrays.fill(is, 0)
    val limit = part2Start + g.part23Length
    // region boundaries in spectral lines
    val bands = LongBands(srIdx)
    val bigEnd = math.min(g.bigValues * 2, 576)
    val r0End =
      if (g.windowSwitching) math.min(36, bigEnd)
      else math.min(bands(math.min(g.region0Count + 1, 22)), bigEnd)
    val r1End =
      if (g.windowSwitching) bigEnd
      else math.min(
        bands(math.min(g.region0Count + g.region1Count + 2, 22)), bigEnd)
    var i = 0
    while (i < bigEnd) {
      val region = if (i < r0End) 0 else if (i < r1End) 1 else 2
      val tsel = g.tableSelect(region)
      if (tsel != 0) {
        if (tsel == 4 || tsel == 14) return false // invalid ids
        bigTree(tsel) match {
          case None => return false // valid id, data not shipped: NULL
          case Some((dim, tree)) =>
            if (br.pos >= limit) return false
            val leaf = br.tree(tree)
            if (leaf < 0) return false
            val linbits = if (tsel >= 16) Linbits(tsel) else 0
            var x = leaf / dim
            var y = leaf % dim
            // Annex B.2 escape: |value| 15 in a linbits table means
            // "15 + the next linbits bits", read BEFORE the sign bit
            // (order per §2.4.3.4.6: x, x-linbits, x-sign, then y)
            if (linbits > 0 && x == 15) x += br.bits(linbits)
            if (x != 0 && br.bit() == 1) x = -x
            if (linbits > 0 && y == 15) y += br.bits(linbits)
            if (y != 0 && br.bit() == 1) y = -y
            is(i) = x; is(i + 1) = y
        }
      }
      i += 2
    }
    // count1 region
    while (br.pos < limit && i <= 572) {
      val quad =
        if (g.count1Table == 1) ~br.bits(4) & 0xf // table B: inverted bits
        else br.tree(Count1TreeA)
      if (quad < 0) return false
      var k = 0
      var ok = true
      val vals = new Array[Int](4)
      while (k < 4) {
        val bit = (quad >> (3 - k)) & 1
        if (bit == 1) {
          vals(k) = if (br.bit() == 1) -1 else 1
        }
        k += 1
      }
      if (br.pos > limit) {
        // quad straddled the boundary: discard it (spec recovery)
        ok = false
      }
      if (ok) {
        is(i) = vals(0); is(i + 1) = vals(1)
        is(i + 2) = vals(2); is(i + 3) = vals(3)
        i += 4
      } else i = 576
    }
    // position exactly at the end of this granule-channel's data
    br.pos = limit
    true
  }

  private def requantize(is: Array[Int], g: GranuleInfo, srIdx: Int,
      st: ChannelState, xr: Array[Double]): Unit = {
    java.util.Arrays.fill(xr, 0.0)
    val mult = (g.scalefacScale + 1) * 0.5
    val gainBase = 0.25 * (g.globalGain - 210)
    def p43(v: Int): Double = {
      val a = math.abs(v)
      val m = if (a < 16) Pow43(a) else math.pow(a, 4.0 / 3.0)
      if (v < 0) -m else m
    }
    if (g.windowSwitching && g.blockType == 2) {
      val sb = ShortBands(srIdx)
      val lb = LongBands(srIdx)
      val longEnd = if (g.mixedBlock) lb(8) else 0 // 36 lines long
      var i = 0
      while (i < longEnd) {
        // mixed: first 8 long bands
        var b = 0
        while (lb(b + 1) <= i) b += 1
        val sf = st.scalefacL(b) + g.preflag * Pretab(b)
        xr(i) = p43(is(i)) * math.pow(2.0, gainBase - mult * sf)
        i += 1
      }
      // short region: Huffman order is band-major, window-minor —
      // (band b, window w) occupies a run of width(b) lines
      val firstShortBand = if (g.mixedBlock) 3 else 0
      var b = firstShortBand
      var at = longEnd
      while (b < 13 && at < 576) {
        val width = sb(b + 1) - sb(b)
        var w = 0
        while (w < 3) {
          val sf = if (b < 12) st.scalefacS(b)(w) else 0
          val gain = gainBase - 2.0 * g.subblockGain(w) - mult * sf
          val scale = math.pow(2.0, gain)
          var k = 0
          while (k < width && at < 576) {
            xr(at) = p43(is(at)) * scale
            at += 1; k += 1
          }
          w += 1
        }
        b += 1
      }
    } else {
      val lb = LongBands(srIdx)
      var b = 0
      while (b < 22) {
        val sf =
          (if (b < 21) st.scalefacL(b) + g.preflag * Pretab(b) else 0)
        val scale = math.pow(2.0, gainBase - mult * sf)
        var i = lb(b)
        val hi = lb(b + 1)
        while (i < hi) { xr(i) = p43(is(i)) * scale; i += 1 }
        b += 1
      }
    }
  }

  /** MS + intensity stereo, §2.4.3.4.9. MS (mode_ext bit 1) applies
    * everywhere except intensity bands; intensity (bit 0, long-block
    * band walk — the short form applies the same tan(pos·π/12) rule
    * over short bands) processes the right channel's all-zero tail,
    * with is_pos carried by the RIGHT channel's scalefactors and
    * is_pos == 7 meaning "leave this band as MS/LR".
    */
  private def stereo(xr: Array[Array[Double]], gRight: GranuleInfo,
      stRight: ChannelState, srIdx: Int, modeExt: Int): Unit = {
    val ms = (modeExt & 2) != 0
    val intensity = (modeExt & 1) != 0
    val invSqrt2 = 1.0 / math.sqrt(2.0)
    // right channel's zero bound (start of the intensity region),
    // rounded UP to the next scalefactor-band edge: the spec's
    // intensity region starts at a BAND boundary (a conforming
    // encoder zeroes the right channel from an edge; a raw
    // last-nonzero bound can land mid-band and would leave that band
    // part-panned, part-MS — conforming decoders pan whole bands)
    var zeroBound = 576
    if (intensity) {
      var i = 575
      while (i >= 0 && xr(1)(i) == 0.0) i -= 1
      zeroBound = i + 1
      if (zeroBound < 576) {
        val short = gRight.windowSwitching && gRight.blockType == 2
        if (!short || (gRight.mixedBlock && zeroBound <= 36)) {
          val lb = LongBands(srIdx)
          val nEdges = if (!short) 22 else 8
          var b = 0
          while (b < nEdges && lb(b) < zeroBound) b += 1
          zeroBound = lb(b) // first long edge ≥ bound (lb(22) = 576)
        } else {
          // short region: band b starts at base0 + 3·(sb(b)−sb(first))
          // in Huffman order (stereo runs before reorder)
          val sb = ShortBands(srIdx)
          val first = if (gRight.mixedBlock) 3 else 0
          val base0 = if (gRight.mixedBlock) 36 else 0
          var b = first
          while (b < 13 && base0 + 3 * (sb(b) - sb(first)) < zeroBound)
            b += 1
          zeroBound = base0 + 3 * (sb(b) - sb(first)) // b=13 → 576
        }
      }
    }
    if (ms) {
      var i = 0
      val msEnd = if (intensity) zeroBound else 576
      while (i < msEnd) {
        val m = xr(0)(i); val s = xr(1)(i)
        xr(0)(i) = (m + s) * invSqrt2
        xr(1)(i) = (m - s) * invSqrt2
        i += 1
      }
    }
    if (intensity && zeroBound < 576) {
      // one span of the intensity region: pan with is_pos, or keep
      // MS/LR when is_pos == 7 (the spec's "no intensity" marker)
      def span(lo0: Int, hi0: Int, pos: Int): Unit = {
        val lo = math.max(lo0, zeroBound)
        if (lo < hi0) {
          if (pos != 7) {
            val ratio = math.tan(pos * math.Pi / 12.0)
            var k = lo
            while (k < hi0) {
              val l = xr(0)(k)
              xr(0)(k) = l * (ratio / (1.0 + ratio))
              xr(1)(k) = l * (1.0 / (1.0 + ratio))
              k += 1
            }
          } else if (ms) {
            var k = lo
            while (k < hi0) {
              val m = xr(0)(k); val s = xr(1)(k)
              xr(0)(k) = (m + s) * invSqrt2
              xr(1)(k) = (m - s) * invSqrt2
              k += 1
            }
          }
        }
      }
      val short = gRight.windowSwitching && gRight.blockType == 2
      if (!short) {
        // long bands; the LAST band (21, no scalefactor of its own)
        // INHERITS band 20's is_pos per the spec's intensity rule —
        // treating it as 7 left real streams' top band un-panned
        val lb = LongBands(srIdx)
        var b = 0
        while (b < 22) {
          val pos =
            if (b < 21) stRight.scalefacL(b) else stRight.scalefacL(20)
          span(lb(b), lb(b + 1), pos)
          b += 1
        }
      } else {
        // stereo runs BEFORE reorder, so short-block data is still in
        // Huffman order: band b window w occupies the contiguous run
        // [base(b) + w·width, base(b) + (w+1)·width) — is_pos is per
        // (band, WINDOW), not per band (using window 0's value for
        // all three windows mis-panned real streams)
        val sb = ShortBands(srIdx)
        val mixed = gRight.mixedBlock
        if (mixed) {
          // the first 36 lines are LONG bands 0..7 with long is_pos
          val lb = LongBands(srIdx)
          var b = 0
          while (b < 8) {
            span(lb(b), lb(b + 1), stRight.scalefacL(b))
            b += 1
          }
        }
        val firstShortBand = if (mixed) 3 else 0
        val base0 = if (mixed) 36 else 0
        var b = firstShortBand
        while (b < 13) {
          val width = sb(b + 1) - sb(b)
          val base = base0 + 3 * (sb(b) - sb(firstShortBand))
          var w2 = 0
          while (w2 < 3) {
            // band 12 (no scalefactor) inherits band 11's per window
            val pos =
              if (b < 12) stRight.scalefacS(b)(w2)
              else stRight.scalefacS(11)(w2)
            span(base + w2 * width, base + (w2 + 1) * width, pos)
            w2 += 1
          }
          b += 1
        }
      }
    }
  }

  /** Short-block reorder, §2.4.3.4.8: Huffman order is (band, window,
    * line); the hybrid filterbank wants (subband, line-within-18):
    * line k of window w of short band b lands at position
    * sb(b)*3 + w + 3*k′ — the classic window-interleaved layout.
    */
  private def reorder(xr: Array[Double], g: GranuleInfo,
      srIdx: Int): Unit = {
    val sb = ShortBands(srIdx)
    val out = new Array[Double](576)
    val longEnd = if (g.mixedBlock) LongBands(srIdx)(8) else 0
    System.arraycopy(xr, 0, out, 0, longEnd)
    val firstShortBand = if (g.mixedBlock) 3 else 0
    var at = longEnd
    var b = firstShortBand
    while (b < 13 && at < 576) {
      val lo = sb(b); val width = sb(b + 1) - lo
      var w = 0
      while (w < 3) {
        var k = 0
        while (k < width && at < 576) {
          out(3 * lo + k * 3 + w) = xr(at)
          at += 1; k += 1
        }
        w += 1
      }
      b += 1
    }
    System.arraycopy(out, 0, xr, 0, 576)
  }

  /** Alias-reduction butterflies across subband boundaries,
    * §2.4.3.4.10.1 — long blocks over all 31 boundaries, mixed over
    * the single long/long boundary, pure short none.
    */
  private def antialias(xr: Array[Double], g: GranuleInfo): Unit = {
    val nB =
      if (g.windowSwitching && g.blockType == 2)
        (if (g.mixedBlock) 1 else 0)
      else 31
    var sbb = 0
    while (sbb < nB) {
      var i = 0
      while (i < 8) {
        val a = 18 * sbb + 17 - i
        val b2 = 18 * (sbb + 1) + i
        val lo = xr(a); val hi = xr(b2)
        xr(a) = lo * AliasCs(i) - hi * AliasCa(i)
        xr(b2) = hi * AliasCs(i) + lo * AliasCa(i)
        i += 1
      }
      sbb += 1
    }
  }

  /** Hybrid filterbank: per-subband IMDCT + window + overlap-add,
    * §2.4.3.4.10.2. Writes 18 time samples per subband into
    * `sbOut(s)(t)` and refreshes the overlap store.
    */
  private def hybrid(xr: Array[Double], g: GranuleInfo,
      st: ChannelState, sbOut: Array[Array[Double]]): Unit = {
    val raw = new Array[Double](36)
    var s = 0
    while (s < 32) {
      // zero fast path: all-zero spectral lines with an all-zero
      // overlap store pass through exactly (the IMDCT of zero is
      // zero); skip the 36×18 cosine sum
      var zero = true
      var zi = 0
      while (zi < 18 && zero) {
        if (xr(18 * s + zi) != 0.0 || st.overlap(s)(zi) != 0.0) zero = false
        zi += 1
      }
      if (zero) {
        var t = 0
        while (t < 18) { sbOut(s)(t) = 0.0; t += 1 }
        s += 1
      } else {
      val bt =
        if (g.windowSwitching && g.blockType == 2 && g.mixedBlock && s < 2) 0
        else if (g.windowSwitching) g.blockType
        else 0
      java.util.Arrays.fill(raw, 0.0)
      if (bt == 2) {
        // three 12-point IMDCTs, hop 6, window WinShort, offset 6
        var w = 0
        while (w < 3) {
          var i = 0
          while (i < 12) {
            var sum = 0.0
            var k = 0
            while (k < 6) {
              sum += xr(18 * s + k * 3 + w) * Imdct12Cos(i)(k)
              k += 1
            }
            raw(6 + w * 6 + i) += sum * WinShort(i)
            i += 1
          }
          w += 1
        }
      } else {
        val win = bt match {
          case 0 => WinLong
          case 1 => WinStart
          case 3 => WinStop
          case _ => WinLong
        }
        var i = 0
        while (i < 36) {
          var sum = 0.0
          var k = 0
          while (k < 18) {
            sum += xr(18 * s + k) * Imdct36Cos(i)(k)
            k += 1
          }
          raw(i) = sum * win(i)
          i += 1
        }
      }
      // overlap-add: first half + previous second half
      val ov = st.overlap(s)
      var t = 0
      while (t < 18) {
        sbOut(s)(t) = raw(t) + ov(t)
        ov(t) = raw(t + 18)
        t += 1
      }
      s += 1
      }
    }
  }

  /** One synthesis step (32 subband samples → 32 PCM samples),
    * §2.4.3.4.10.3: matrixing into the 1024-slot FIFO, U extraction,
    * windowing by [[SynthD]], 16-fold sum. Appends PCM16 LE to `pcm`.
    * Stereo streams accumulate channel-blocked per granule (the ch
    * loop sits outside the 18-step loop); [[interleave]] fixes the
    * layout once at the end.
    */
  private def synth(st: ChannelState, s: Array[Double],
      pcm: java.io.ByteArrayOutputStream): Unit = {
    // silence fast path: the FIFO holds 16 slots, so after 16
    // consecutive all-zero inputs every tap reads exact 0.0 — skip
    // the matrixing AND the window sum and emit zeros directly.
    // Digital silence (and the quiet spans of sparse content) is the
    // common case in a crawl; this makes it near-free without
    // changing a single output bit (zeros in = zeros out exactly).
    var allZero = true
    var z = 0
    while (z < 32 && allZero) { if (s(z) != 0.0) allZero = false; z += 1 }
    if (allZero && st.zeroSteps >= 16) {
      st.vOff = (st.vOff + 1024 - 64) % 1024
      java.util.Arrays.fill(st.v, st.vOff, st.vOff + 64, 0.0)
      pcm.write(ZeroStep, 0, 64) // 32 zero PCM16 samples, ONE write
      return
    }
    st.zeroSteps = if (allZero) st.zeroSteps + 1 else 0
    st.vOff = (st.vOff + 1024 - 64) % 1024
    val v = st.v
    val off = st.vOff
    matrixFast(s, st.dctBuf, st.dctTmp, v, off)
    // window-and-sum with the wrap hoisted out of the inner loop: V
    // slots are 64-aligned and j < 32 never crosses a slot, so the
    // ring wrap can only happen at a tap's BASE — no per-tap modulo
    val step = st.stepBuf
    val acc = st.sumBuf
    java.util.Arrays.fill(acc, 0.0)
    var q = 0
    while (q < 16) {
      var base = off + (q >> 1) * 128 + (if ((q & 1) == 0) 0 else 96)
      if (base >= 1024) base -= 1024
      val dOff = q * 32
      var j = 0
      while (j < 32) {
        acc(j) += v(base + j) * SynthD(dOff + j)
        j += 1
      }
      q += 1
    }
    var j = 0
    while (j < 32) {
      val x = math.rint(acc(j) * 32768.0)
      val p = if (x > 32767.0) 32767 else if (x < -32768.0) -32768
        else x.toInt
      step(2 * j) = (p & 0xff).toByte
      step(2 * j + 1) = ((p >> 8) & 0xff).toByte
      j += 1
    }
    pcm.write(step, 0, 64) // one synchronized call per step, not 64
  }

  // 32 zero PCM16 samples — the silence fast path's write unit
  private val ZeroStep = new Array[Byte](64)

  /** Wrap accumulated PCM in a 44-byte WAV header. Stereo streams
    * arrive channel-blocked per granule (576 L samples then 576 R);
    * interleave here, once, at the end.
    */
  private def finish(pcm: java.io.ByteArrayOutputStream, channels: Int,
      rate: Int, frames: Int): Array[Byte] = {
    if (frames == 0 || channels == 0) return null
    var data = pcm.toByteArray
    if (channels == 2) data = interleave(data)
    val out = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ISO-8859-1")).putInt(36 + data.length)
      .put("WAVE".getBytes("ISO-8859-1"))
      .put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
      .put("data".getBytes("ISO-8859-1")).putInt(data.length)
      .put(data)
    out.array()
  }

  /** Channel-blocked (576 L then 576 R per granule, 2 bytes/sample)
    * → frame-interleaved L R L R.
    */
  private def interleave(blocked: Array[Byte]): Array[Byte] = {
    val granuleBytes = 576 * 2 * 2 // both channels of one granule
    val out = new Array[Byte](blocked.length)
    var g = 0
    val nG = blocked.length / granuleBytes
    while (g < nG) {
      val base = g * granuleBytes
      var t = 0
      while (t < 576) {
        out(base + 4 * t) = blocked(base + 2 * t)
        out(base + 4 * t + 1) = blocked(base + 2 * t + 1)
        out(base + 4 * t + 2) = blocked(base + 1152 + 2 * t)
        out(base + 4 * t + 3) = blocked(base + 1152 + 2 * t + 1)
        t += 1
      }
      g += 1
    }
    // a trailing partial granule (reservoir-underrun silence path
    // writes raw zeros) copies through unchanged
    if (nG * granuleBytes < blocked.length)
      System.arraycopy(blocked, nG * granuleBytes, out, nG * granuleBytes,
        blocked.length - nG * granuleBytes)
    out
  }

  // exposed for Mp3Spec's structural re-validation
  private[graft] def shippedBigTableIds: Set[Int] = BigTables.keySet
  private[graft] def tableEntries(id: Int): Array[(Int, Int, Int, Int)] =
    BigTables(id).entries
  private[graft] def count1AEntries: Array[(Int, Int, Int)] = Count1A
}

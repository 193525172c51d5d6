package graft.expr

/** Deterministic FLAC fixture encoder for the oracle-gated FLAC
  * queries and FlacSpec — NOT a general encoder ([[Vp8lBuild]]'s
  * audio sibling). Every piece is implemented INDEPENDENTLY of
  * [[FlacDecode]]: its own MSB-first bit writer, TABLE-driven CRCs
  * against the decoder's bitwise forms, its own UTF-8 number writer,
  * zigzag by arithmetic sign-test against the decoder's XOR form,
  * and residuals computed by the forward predictor formulas against
  * the decoder's inverse — so decode(encode(x)) == x is a genuine
  * differential over the whole format, not a shared-helper tautology.
  * FLAC is lossless, so the differential is BIT-EXACT sample
  * equality, the strongest gate any decoder here has.
  *
  * Encode strategies (one per subframe, chosen by the caller so each
  * decoder path is independently exercisable):
  *  - `constant` (requires an all-equal block), `verbatim`,
  *  - `fixed` order 0–4 with Rice residuals (per-partition best
  *    4-bit parameter),
  *  - `lpc` with a caller-fixed coefficient set / precision / shift,
  *  - `escape` — a Rice partition written with the 5-bit-raw escape
  *    code at the tightest width that holds the residuals,
  *  - partition orders 0–15 (block size permitting),
  *  - wasted-bits: blocks whose samples share k trailing zero bits
  *    emit the unary wasted flag and store samples >> k.
  * Stereo: independent, left/side, right/side, mid/side (the
  * encoder-side decorrelation each mode implies).
  */
private[graft] object FlacBuild {

  /** MSB-first bit writer (FLAC's packing order). */
  final class Bw {
    private val bytes = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def put(v: Long, bits: Int): this.type = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1L).toInt
        n += 1
        if (n == 8) { bytes.write(acc); acc = 0; n = 0 }
        i -= 1
      }
      this
    }
    def putUnary(q: Int): this.type = {
      var i = 0
      while (i < q) { put(0, 1); i += 1 }
      put(1, 1)
    }
    def alignZero(): this.type = { if (n > 0) put(0, 8 - n); this }
    def result(): Array[Byte] = { alignZero(); bytes.toByteArray }
  }

  // ---- table-driven CRCs (decoder uses bitwise loops) ----------------

  private val Crc8Tab: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private val Crc16Tab: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var k = 0
      while (k < 8) {
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
            else (c << 1) & 0xffff
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  def crc8(b: Array[Byte]): Int = {
    var crc = 0
    var i = 0
    while (i < b.length) { crc = Crc8Tab(crc ^ (b(i) & 0xff)); i += 1 }
    crc
  }

  def crc16(b: Array[Byte]): Int = {
    var crc = 0
    var i = 0
    while (i < b.length) {
      crc = Crc16Tab(((crc >> 8) ^ (b(i) & 0xff)) & 0xff) ^
        ((crc << 8) & 0xffff)
      i += 1
    }
    crc
  }

  /** FLAC's UTF-8-style coded number (here: frame index, ≤ 31 bits). */
  private def utf8Num(bw: Bw, v0: Long): Unit = {
    if (v0 < 0x80) { bw.put(v0, 8); return }
    // with `cont` continuation bytes the lead byte carries 6−cont
    // payload bits → capacity 6 + 5·cont bits total
    var cont = 1
    while (cont < 6 && v0 >= (1L << (6 + 5 * cont))) cont += 1
    // lead byte: cont+1 ones, a zero, then the top bits
    val leadBits = 6 - cont // payload bits in the lead byte (7-byte: 0)
    val lead = ((0xff << (7 - cont)) & 0xff) |
      ((v0 >> (6 * cont)) & ((1 << leadBits) - 1)).toInt
    bw.put(lead, 8)
    var i = cont - 1
    while (i >= 0) {
      bw.put(0x80 | ((v0 >> (6 * i)) & 0x3f).toInt, 8)
      i -= 1
    }
  }

  /** Zigzag by sign test (decoder unmaps with the XOR form). */
  private def zig(v: Int): Long =
    if (v >= 0) 2L * v else -2L * v - 1

  private def bestRiceParam(res: Array[Int], from: Int, until: Int): Int = {
    var best = 0
    var bestCost = Long.MaxValue
    var p = 0
    while (p < 15) { // 15 is the escape code in method 0
      var cost = 0L
      var i = from
      while (i < until) { cost += (zig(res(i)) >>> p) + 1 + p; i += 1 }
      if (cost < bestCost) { bestCost = cost; best = p }
      p += 1
    }
    best
  }

  /** One subframe. `mode`: constant | verbatim | fixed{0..4} |
    * lpc | escape. `partOrder` applies to the residual-coded modes.
    */
  private def subframe(bw: Bw, block: Array[Int], sbps: Int, mode: String,
      partOrder: Int): Unit = {
    // wasted-bits detection: shared trailing zeros across the block
    var wasted = 0
    if (block.forall(_ == 0)) wasted = 0 // constant-zero: no gain
    else {
      var orAll = 0
      block.foreach(v => orAll |= v)
      while (wasted < sbps - 1 && ((orAll >> wasted) & 1) == 0) wasted += 1
    }
    val ebps = sbps - wasted
    val s = if (wasted == 0) block else block.map(_ >> wasted)

    def header(typ: Int): Unit = {
      bw.put(0, 1).put(typ, 6)
      if (wasted == 0) bw.put(0, 1)
      else { bw.put(1, 1); bw.putUnary(wasted - 1) }
    }
    def sample(v: Int): Unit = bw.put(v.toLong & ((1L << ebps) - 1), ebps)

    def riceResidual(res: Array[Int], order: Int, escapeAll: Boolean): Unit = {
      val nPart = 1 << partOrder
      require(s.length % nPart == 0 && s.length / nPart >= order,
        "partition order incompatible with block")
      bw.put(0, 2) // method 0: 4-bit params
      bw.put(partOrder, 4)
      val base = s.length / nPart
      var part = 0
      var idx = order
      while (part < nPart) {
        val cnt = if (part == 0) base - order else base
        if (escapeAll) {
          // tightest signed width holding every residual (0 ⇒ all-zero)
          var w = 0
          var i = idx
          while (i < idx + cnt) {
            val v = res(i)
            var need = 1
            while (need < 32 && (v < -(1 << (need - 1)) ||
              v >= (1 << (need - 1)))) need += 1
            if (v != 0 && need > w) w = need
            i += 1
          }
          bw.put(15, 4) // escape
          bw.put(w, 5)
          i = idx
          while (i < idx + cnt) {
            bw.put(res(i).toLong & ((1L << w) - 1), if (w == 0) 0 else w)
            i += 1
          }
        } else {
          val prm = bestRiceParam(res, idx, idx + cnt)
          bw.put(prm, 4)
          var i = idx
          while (i < idx + cnt) {
            val u = zig(res(i))
            bw.putUnary((u >>> prm).toInt)
            if (prm > 0) bw.put(u & ((1L << prm) - 1), prm)
            i += 1
          }
        }
        idx += cnt
        part += 1
      }
    }

    mode match {
      case "constant" =>
        require(s.forall(_ == s(0)), "constant mode needs an equal block")
        header(0); sample(s(0))
      case "verbatim" =>
        header(1); s.foreach(sample)
      case m if m.startsWith("fixed") =>
        val order = m.substring(5).toInt
        header(8 + order)
        var i = 0
        while (i < order) { sample(s(i)); i += 1 }
        val res = new Array[Int](s.length)
        i = order
        while (i < s.length) {
          val pred: Long = order match {
            case 0 => 0L
            case 1 => s(i - 1).toLong
            case 2 => 2L * s(i - 1) - s(i - 2)
            case 3 => 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
            case _ => 4L * s(i - 1) - 6L * s(i - 2) +
              4L * s(i - 3) - s(i - 4)
          }
          res(i) = (s(i) - pred).toInt
          i += 1
        }
        riceResidual(res, order, escapeAll = false)
      case "escape" => // fixed order 1 under the raw-width escape
        header(9)
        sample(s(0))
        val res = new Array[Int](s.length)
        var i = 1
        while (i < s.length) { res(i) = s(i) - s(i - 1); i += 1 }
        riceResidual(res, 1, escapeAll = true)
      case "lpc" =>
        // a fixed, exactly-invertible filter: pred = (3·s1 − s2) >> 1
        val coef = Array(3, -1)
        val prec = 3 // holds −4..3
        val shift = 1
        val order = 2
        header(32 + order - 1)
        var i = 0
        while (i < order) { sample(s(i)); i += 1 }
        bw.put(prec - 1, 4)
        bw.put(shift, 5)
        coef.foreach(cf => bw.put(cf.toLong & ((1L << prec) - 1), prec))
        val res = new Array[Int](s.length)
        i = order
        while (i < s.length) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coef(j).toLong * s(i - 1 - j); j += 1 }
          res(i) = (s(i) - (acc >> shift)).toInt
          i += 1
        }
        riceResidual(res, order, escapeAll = false)
      case other => throw new IllegalArgumentException(s"mode $other")
    }
  }

  private val StdBlockCodes: Map[Int, Int] = Map(
    192 -> 1, 576 -> 2, 1152 -> 3, 2304 -> 4, 4608 -> 5,
    256 -> 8, 512 -> 9, 1024 -> 10, 2048 -> 11, 4096 -> 12,
    8192 -> 13, 16384 -> 14, 32768 -> 15)

  /** Full stream: STREAMINFO + frames. `samples` is per-channel
    * (1–8 channels, equal lengths); the last block may be short.
    * `stereo`: indep | left_side | right_side | mid_side (the side
    * modes require exactly 2 channels). `mode`/`partOrder` per
    * [[subframe]]; short tail blocks fall back to partition order 0
    * when the requested order no longer divides.
    */
  def encode(samples: Array[Array[Int]], rate: Int, bps: Int,
      blockSize: Int, stereo: String = "indep", mode: String = "fixed2",
      partOrder: Int = 0): Array[Byte] = {
    val nch = samples.length
    require(nch >= 1 && nch <= 8, "1-8 channels")
    require(samples.forall(_.length == samples(0).length), "equal lengths")
    require(bps == 8 || bps == 16 || bps == 24, "bps 8/16/24")
    val total = samples(0).length
    require(total > 0, "no samples")

    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("ISO-8859-1"))
    // STREAMINFO (type 0, last-block flag set, 34 bytes)
    val si = new Bw
    si.put(blockSize, 16).put(blockSize, 16) // min/max block size
    si.put(0, 24).put(0, 24) // frame sizes unknown
    si.put(rate, 20)
    si.put(nch - 1, 3)
    si.put(bps - 1, 5)
    si.put(total.toLong, 36)
    var i = 0
    while (i < 16) { si.put(0, 8); i += 1 } // MD5 unknown
    val siBytes = si.result()
    out.write(0x80); out.write(0); out.write(0); out.write(siBytes.length)
    out.write(siBytes, 0, siBytes.length)

    val asgn = stereo match {
      case "indep" => nch - 1
      case "left_side" => require(nch == 2, "stereo mode"); 8
      case "right_side" => require(nch == 2, "stereo mode"); 9
      case "mid_side" => require(nch == 2, "stereo mode"); 10
      case other => throw new IllegalArgumentException(s"stereo $other")
    }
    val ssCode = bps match { case 8 => 1; case 16 => 4; case _ => 6 }
    val srCode =
      if (rate == 44100) 9
      else if (rate == 8000) 4
      else if (rate <= 65535) 13
      else 0

    var frameIdx = 0L
    var off = 0
    while (off < total) {
      val bs = math.min(blockSize, total - off)
      val bsCode = StdBlockCodes.getOrElse(bs, 7)
      val hw = new Bw
      hw.put(0xfff8, 16) // sync + reserved 0 + fixed-blocksize strategy
      hw.put(bsCode, 4).put(srCode, 4)
      hw.put(asgn, 4).put(ssCode, 3).put(0, 1)
      utf8Num(hw, frameIdx)
      if (bsCode == 7) hw.put(bs - 1, 16)
      if (srCode == 13) hw.put(rate, 16)
      val head = hw.result()
      val bw = new Bw
      head.foreach(b => bw.put(b & 0xff, 8))
      bw.put(crc8(head), 8)

      // per-channel blocks under the chosen decorrelation
      val blocks: Array[(Array[Int], Int)] = asgn match {
        case a if a <= 7 =>
          samples.map(ch => (ch.slice(off, off + bs), bps))
        case 8 =>
          val l = samples(0).slice(off, off + bs)
          val r = samples(1).slice(off, off + bs)
          Array((l, bps),
            (Array.tabulate(bs)(t => l(t) - r(t)), bps + 1))
        case 9 =>
          val l = samples(0).slice(off, off + bs)
          val r = samples(1).slice(off, off + bs)
          Array((Array.tabulate(bs)(t => l(t) - r(t)), bps + 1),
            (r, bps))
        case _ =>
          val l = samples(0).slice(off, off + bs)
          val r = samples(1).slice(off, off + bs)
          Array((Array.tabulate(bs)(t => (l(t) + r(t)) >> 1), bps),
            (Array.tabulate(bs)(t => l(t) - r(t)), bps + 1))
      }
      blocks.foreach { case (blk, sbps) =>
        val po =
          if ((1 << partOrder) <= bs && bs % (1 << partOrder) == 0 &&
            bs / (1 << partOrder) >= 4) partOrder
          else 0
        val m = mode match {
          case "constant" if !blk.forall(_ == blk(0)) => "verbatim"
          case mm if mm.startsWith("fixed") &&
            mm.substring(5).toInt >= bs => "verbatim"
          case "lpc" if bs < 3 => "verbatim"
          case "escape" if bs < 2 => "verbatim"
          case mm => mm
        }
        subframe(bw, blk, sbps, m, po)
      }
      val body = bw.result() // zero-aligned per spec
      out.write(body, 0, body.length)
      val c16 = crc16(body)
      out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)

      off += bs
      frameIdx += 1
    }
    out.toByteArray
  }
}

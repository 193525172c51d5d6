package graft.expr

/** Hand JPEG decoder — the round-12 answer to the decode cost probe
  * (SCALE.md: ImageIO JPEG costs ~115 µs per 32×24 thumbnail, 12.5×
  * the hand-PPM path, and JPEG is the majority image format of a real
  * crawl; the GIF precedent won 4.1× on the same per-row-setup
  * grounds). Pure JVM, zero dependencies, implementing the PUBLIC
  * ITU-T T.81 Huffman DCT processes:
  *
  *  - BASELINE / extended sequential (SOF0/SOF1): one interleaved
  *    scan, blocks IDCT'd inline as they decode (the hot path — no
  *    coefficient store);
  *  - PROGRESSIVE (SOF2): multi-scan spectral selection + successive
  *    approximation per T.81 Annex G.1.2 — interleaved DC-first scans
  *    and their one-bit refinements, single-component AC band scans
  *    with EOBRUN, and the AC refinement correction-bit procedure;
  *    coefficients accumulate per component and IDCT once at EOI
  *    (progressive is a large share of real web JPEGs — leaving it
  *    on the ImageIO fallback would keep the slow path hot);
  *  - marker walk: DQT (8/16-bit), DHT (tables may be redefined
  *    between scans), DRI (per-scan restart intervals), APP14 (the
  *    Adobe color-transform flag);
  *  - canonical Huffman decode (mincode/maxcode/valptr per T.81
  *    §F.2.2.3) over the entropy stream with FF00 byte unstuffing and
  *    RSTn restart handling (byte-align, DC predictors + EOBRUN
  *    reset);
  *  - double-precision separable IDCT (the spec Annex A.3.3 math
  *    directly; float keeps it within one count of any conforming
  *    integer IDCT — the differential spec bounds it against the JDK
  *    codec);
  *  - generic h×v sampling (4:4:4, 4:2:2, 4:2:0, 4:1:1); ratio-2
  *    axes use TRIANGLE-FILTER chroma upsampling (the 3:1 centered
  *    weights of the classic "fancy" upsampler — the filter the JDK
  *    codec applies, so the differential bound stays tight), other
  *    ratios box-replicate; the public BT.601 integer YCbCr→RGB
  *    constants (identical to the IJG fixed-point form);
  *  - grayscale replicates to the 3-channel RGB shape the ImageIO
  *    branch produces; 3-component Adobe transform=0 is passed
  *    through as RGB;
  *  - CMYK / YCCK (Adobe 4-component, the scanned-document family):
  *    Adobe-inverted samples, optional YCCK YCbCr inversion
  *    (transform=2), then RGB = ⌊(inv·invK + 127)/255⌋ — exact
  *    integer arithmetic a relational oracle replays. NOTE: the JDK
  *    codec cannot `read()` CMYK JPEGs at all (it throws), so this
  *    EXTENDS coverage beyond the fallback tier; the differential
  *    spec pins the entropy/IDCT layers against `readRaster()` (raw
  *    4-band, no color conversion), and the color step against the
  *    documented formula.
  *
  * NOT handled — these return null and [[PixelStats.decode]] falls
  * back to the ImageIO tier, so coverage is unchanged and only the
  * hot path gets faster: arithmetic coding (SOF9-11), lossless,
  * hierarchical, 12-bit precision, non-interleaved multi-scan
  * SEQUENTIAL files (rare; progressive multi-scan is fully handled),
  * DNL height patching. Truncated or corrupt streams also return
  * null (triage, never an error).
  *
  * Bomb guard: the SOF dims are checked against
  * [[PixelStats.MaxRawBytes]] BEFORE any plane or coefficient-store
  * allocation.
  */
object JpegDecode {

  // zigzag order: index in scan order → index in 8×8 row-major block
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // IDCT basis: c(u)/2 · cos((2x+1)uπ/16) for the separable 1-D form
  private val Cos: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = 0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16)
        x += 1
      }
      u += 1
    }
    t
  }

  private final class Huff {
    // canonical tables per T.81 §F.2.2.3
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    var vals: Array[Byte] = null
  }

  private final class Comp {
    var id = 0
    var h = 1
    var v = 1
    var tq = 0
    var dcTab = 0
    var acTab = 0
    var pred = 0 // DC predictor
    var plane: Array[Byte] = null // MCU-padded samples
    var pw = 0 // plane width
    var ph = 0
    // progressive: dequantized-later coefficient store over the
    // PADDED block grid (bwFull × bhFull blocks of 64)
    var coef: Array[Int] = null
    var bwFull = 0 // padded grid width in blocks (mcusX · h)
    var bhFull = 0
    var bw = 0 // REAL block dims (ceil of the component's logical size)
    var bh = 0
  }

  /** Entropy-coded-segment bit reader: MSB-first, FF00 unstuffed; any
    * other FF-marker stops the stream (reads past it count into
    * `overrun` — a complete stream never overruns, so overrun at scan
    * end means truncation).
    */
  private final class Bits(b: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var n = 0
    private var stopped = false
    var overrun = 0

    private def fill(): Unit = {
      while (n <= 48 && !stopped) {
        if (pos >= b.length) { stopped = true; return }
        val v = b(pos) & 0xFF
        if (v == 0xFF) {
          if (pos + 1 >= b.length) { stopped = true; return }
          val m = b(pos + 1) & 0xFF
          if (m == 0x00) { pos += 2; acc = (acc << 8) | 0xFF; n += 8 }
          else { stopped = true; return } // a real marker ends the segment
        } else { pos += 1; acc = (acc << 8) | v; n += 8 }
      }
    }

    def bit(): Int = {
      if (n == 0) fill()
      if (n == 0) { overrun += 1; return 0 } // past the segment
      n -= 1
      ((acc >>> n) & 1L).toInt
    }

    def bits(k: Int): Int = {
      var v = 0
      var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Byte-align and consume an expected RSTn marker. True on
      * success.
      */
    def restart(): Boolean = {
      n = 0 // drop partial bits (byte alignment)
      // the fill loop stopped AT the marker's FF
      if (pos + 1 >= b.length) return false
      if ((b(pos) & 0xFF) != 0xFF) return false
      val m = b(pos + 1) & 0xFF
      if (m < 0xD0 || m > 0xD7) return false
      pos += 2
      stopped = false
      true
    }

    /** Byte-align (end of scan) and report the marker position. */
    def align(): Int = { n = 0; pos }

    def decodeHuff(t: Huff): Int = {
      var len = 1
      var code = bit()
      while (len < 16 && (t.maxCode(len) < 0 || code > t.maxCode(len))) {
        code = (code << 1) | bit()
        len += 1
      }
      if (t.maxCode(len) < 0 || code > t.maxCode(len)) return -1
      t.vals(t.valPtr(len) + code - t.minCode(len)) & 0xFF
    }

    /** RECEIVE+EXTEND (T.81 §F.2.2.1). */
    def extend(s: Int): Int = {
      if (s == 0) return 0
      val v = bits(s)
      if (v < (1 << (s - 1))) v + (-1 << s) + 1 else v
    }
  }

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  /** bytes → decoded 3-channel RGB, or null (caller falls back to
    * ImageIO).
    */
  def decode(b: Array[Byte]): PixelStats.Decoded = {
    try decodeImpl(b)
    catch { case _: Exception => null } // triage, never an error
  }

  private def decodeImpl(b: Array[Byte]): PixelStats.Decoded = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return null
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0
    var h = 0
    var hMax = 1
    var vMax = 1
    var mcusX = 0
    var mcusY = 0
    var restartInterval = 0
    var adobeTransform = -1
    var progressive = false
    var sawScan = false
    var i = 2
    // ---- marker walk (baseline returns from inside its SOS case;
    // progressive accumulates scans until EOI)
    var walking = true
    while (walking) {
      if (i + 2 > b.length) return null
      if ((b(i) & 0xFF) != 0xFF) return null
      var m = b(i + 1) & 0xFF
      while (m == 0xFF && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xFF } // fill bytes
      if (m == 0xD8) { i += 2 } // stray SOI
      else if (m == 0xD9) walking = false // EOI
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { i += 2 } // standalone
      else {
        if (i + 4 > b.length) return null
        val len = u16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return null
        val seg = i + 4
        val segEnd = i + 2 + len
        var next = segEnd
        m match {
          case 0xDB => // DQT
            var p = seg
            while (p < segEnd) {
              val pq = (b(p) & 0xF0) >> 4
              val tq = b(p) & 0x0F
              if (tq > 3 || pq > 1) return null
              val t = new Array[Int](64)
              p += 1
              var k = 0
              if (pq == 0) {
                if (p + 64 > segEnd) return null
                while (k < 64) { t(k) = b(p + k) & 0xFF; k += 1 }
                p += 64
              } else {
                if (p + 128 > segEnd) return null
                while (k < 64) { t(k) = u16(b, p + 2 * k); k += 1 }
                p += 128
              }
              quant(tq) = t
            }
          case 0xC4 => // DHT (may be redefined between scans)
            var p = seg
            while (p < segEnd) {
              val tc = (b(p) & 0xF0) >> 4
              val th = b(p) & 0x0F
              if (tc > 1 || th > 3 || p + 17 > segEnd) return null
              val counts = new Array[Int](17)
              var total = 0
              var k = 1
              while (k <= 16) {
                counts(k) = b(p + k) & 0xFF; total += counts(k); k += 1
              }
              if (p + 17 + total > segEnd || total > 256) return null
              val t = new Huff
              t.vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + total)
              // canonical code assignment (T.81 §C.2 / §F.2.2.3)
              var code = 0
              var ptr = 0
              k = 1
              while (k <= 16) {
                if (counts(k) == 0) { t.maxCode(k) = -1 }
                else {
                  t.valPtr(k) = ptr
                  t.minCode(k) = code
                  code += counts(k); ptr += counts(k)
                  t.maxCode(k) = code - 1
                }
                code <<= 1
                k += 1
              }
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              p += 17 + total
            }
          case 0xC0 | 0xC1 | 0xC2 => // SOF0/1 baseline, SOF2 progressive
            if (comps != null) return null
            progressive = m == 0xC2
            val prec = b(seg) & 0xFF
            if (prec != 8) return null
            h = u16(b, seg + 1)
            w = u16(b, seg + 3)
            val n = b(seg + 5) & 0xFF
            if (w <= 0 || h <= 0 || (n != 1 && n != 3 && n != 4)) return null
            if (w.toLong * h * 3 > PixelStats.MaxRawBytes) return null // bomb
            if (seg + 6 + 3 * n > segEnd) return null
            comps = Array.fill(n)(new Comp)
            var c = 0
            while (c < n) {
              val o = seg + 6 + 3 * c
              comps(c).id = b(o) & 0xFF
              comps(c).h = (b(o + 1) & 0xF0) >> 4
              comps(c).v = b(o + 1) & 0x0F
              comps(c).tq = b(o + 2) & 0xFF
              if (comps(c).h < 1 || comps(c).h > 4 || comps(c).v < 1 ||
                comps(c).v > 4 || comps(c).tq > 3) return null
              c += 1
            }
            hMax = comps.map(_.h).max
            vMax = comps.map(_.v).max
            mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            comps.foreach { comp =>
              comp.pw = mcusX * 8 * comp.h
              comp.ph = mcusY * 8 * comp.v
              if (comp.pw.toLong * comp.ph > PixelStats.MaxRawBytes)
                return null
              comp.bwFull = mcusX * comp.h
              comp.bhFull = mcusY * comp.v
              val cw = (w * comp.h + hMax - 1) / hMax
              val ch = (h * comp.v + vMax - 1) / vMax
              comp.bw = (cw + 7) / 8
              comp.bh = (ch + 7) / 8
              if (progressive)
                comp.coef = new Array[Int](comp.bwFull * comp.bhFull * 64)
              else
                comp.plane = new Array[Byte](comp.pw * comp.ph)
            }
          case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
               0xCD | 0xCE | 0xCF =>
            return null // arithmetic / lossless / hierarchical
          case 0xDD => // DRI
            if (len != 4) return null
            restartInterval = u16(b, seg)
          case 0xEE => // APP14 Adobe
            if (len >= 14 && b(seg) == 'A' && b(seg + 1) == 'd' &&
              b(seg + 2) == 'o' && b(seg + 3) == 'b' && b(seg + 4) == 'e')
              adobeTransform = b(segEnd - 1) & 0xFF
          case 0xDA => // SOS
            if (comps == null) return null
            if (!progressive) {
              // the baseline hot path decodes and RETURNS here
              return baselineScan(b, i, comps, quant, dcTabs, acTabs,
                w, h, hMax, vMax, mcusX, mcusY, restartInterval,
                adobeTransform)
            }
            val after = progressiveScan(b, i, comps, dcTabs, acTabs,
              mcusX, mcusY, restartInterval)
            if (after < 0) return null
            sawScan = true
            next = after
          case _ => // APPn, COM, others: skip
        }
        i = next
      }
    }
    if (!progressive || !sawScan) return null
    // ---- progressive finish: dequantize + IDCT every real block
    val block = new Array[Double](64)
    val tmp = new Array[Double](64)
    val dq = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val comp = comps(ci)
      val q = quant(comp.tq)
      if (q == null) return null
      comp.plane = new Array[Byte](comp.pw * comp.ph)
      var by = 0
      while (by < comp.bh) {
        var bx = 0
        while (bx < comp.bw) {
          val base = (by * comp.bwFull + bx) * 64
          var k = 0
          while (k < 64) {
            dq(Zigzag(k)) = comp.coef(base + k) * q(k)
            k += 1
          }
          idct(dq, tmp, block)
          store(block, comp.plane, comp.pw, bx * 8, by * 8)
          bx += 1
        }
        by += 1
      }
      comp.coef = null
      ci += 1
    }
    emit(comps, w, h, hMax, vMax, adobeTransform)
  }

  /** One interleaved baseline scan: decode + inline IDCT, then emit.
    * Returns the Decoded or null.
    */
  private def baselineScan(b: Array[Byte], sosAt: Int, comps: Array[Comp],
      quant: Array[Array[Int]], dcTabs: Array[Huff], acTabs: Array[Huff],
      w: Int, h: Int, hMax: Int, vMax: Int, mcusX: Int, mcusY: Int,
      restartInterval: Int, adobeTransform: Int): PixelStats.Decoded = {
    val sosLen = u16(b, sosAt + 2)
    val seg = sosAt + 4
    val ns = b(seg) & 0xFF
    if (ns != comps.length) return null // non-interleaved sequential: rare
    var c = 0
    while (c < ns) {
      val cid = b(seg + 1 + 2 * c) & 0xFF
      val tabs = b(seg + 2 + 2 * c) & 0xFF
      val comp = comps.find(_.id == cid).getOrElse(return null)
      comp.dcTab = (tabs & 0xF0) >> 4
      comp.acTab = tabs & 0x0F
      if (comp.dcTab > 3 || comp.acTab > 3) return null
      c += 1
    }
    comps.foreach { comp => if (quant(comp.tq) == null) return null }
    // Ss/Se/Ah/Al must be the baseline 0/63/0/0 — tolerated loosely
    // (some writers emit junk here; baseline decode ignores them)

    val bits = new Bits(b, sosAt + 2 + sosLen)
    val coef = new Array[Int](64)
    val block = new Array[Double](64)
    val tmp = new Array[Double](64)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!bits.restart()) return null
          comps.foreach(_.pred = 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val comp = comps(ci)
          val q = quant(comp.tq)
          val dct = dcTabs(comp.dcTab)
          val act = acTabs(comp.acTab)
          if (dct == null || act == null) return null
          var by = 0
          while (by < comp.v) {
            var bx = 0
            while (bx < comp.h) {
              // -- decode one block
              java.util.Arrays.fill(coef, 0)
              val s = bits.decodeHuff(dct)
              if (s < 0 || s > 15) return null
              comp.pred += bits.extend(s)
              coef(0) = comp.pred * q(0)
              var k = 1
              var run = true
              while (run && k < 64) {
                val rs = bits.decodeHuff(act)
                if (rs < 0) return null
                val r = rs >> 4
                val sz = rs & 0x0F
                if (sz == 0) {
                  if (r == 15) k += 16 // ZRL
                  else run = false // EOB
                } else {
                  k += r
                  if (k > 63) return null
                  coef(Zigzag(k)) = bits.extend(sz) * q(k)
                  k += 1
                }
              }
              idct(coef, tmp, block)
              store(block, comp.plane, comp.pw,
                (mx * comp.h + bx) * 8, (my * comp.v + by) * 8)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    if (bits.overrun > 0) return null // truncated entropy stream
    emit(comps, w, h, hMax, vMax, adobeTransform)
  }

  /** One progressive scan (T.81 Annex G.1.2): updates the coefficient
    * stores and returns the position of the marker after the scan's
    * entropy segment, or -1 on damage.
    */
  private def progressiveScan(b: Array[Byte], sosAt: Int,
      comps: Array[Comp], dcTabs: Array[Huff], acTabs: Array[Huff],
      mcusX: Int, mcusY: Int, restartInterval: Int): Int = {
    val sosLen = u16(b, sosAt + 2)
    val seg = sosAt + 4
    val segEnd = sosAt + 2 + sosLen
    val ns = b(seg) & 0xFF
    if (ns < 1 || ns > comps.length || seg + 1 + 2 * ns + 3 > segEnd)
      return -1
    val scanComps = new Array[Comp](ns)
    var c = 0
    while (c < ns) {
      val cid = b(seg + 1 + 2 * c) & 0xFF
      val tabs = b(seg + 2 + 2 * c) & 0xFF
      var found: Comp = null
      comps.foreach(cc => if (cc.id == cid) found = cc)
      if (found == null) return -1
      found.dcTab = (tabs & 0xF0) >> 4
      found.acTab = tabs & 0x0F
      if (found.dcTab > 3 || found.acTab > 3) return -1
      scanComps(c) = found
      c += 1
    }
    val p0 = seg + 1 + 2 * ns
    val ss = b(p0) & 0xFF
    val se = b(p0 + 1) & 0xFF
    val ah = (b(p0 + 2) & 0xF0) >> 4
    val al = b(p0 + 2) & 0x0F
    if (ss > 63 || se > 63 || se < ss || al > 13 || ah > 13) return -1
    val dcScan = ss == 0
    if (dcScan && se != 0) return -1 // DC scans carry only coef 0
    if (!dcScan && ns != 1) return -1 // AC scans are single-component
    if (ah != 0 && ah != al + 1) return -1 // successive approximation step

    val bits = new Bits(b, segEnd)
    var eobrun = 0
    val p1 = 1 << al
    val m1 = -1 << al

    // AC refinement correction-bit sweep over coef band [k, se] of one
    // block, consuming `r` history zeroes; returns the index where a
    // new nonzero may be placed (or se+1)
    def refineSweep(coefA: Array[Int], base: Int, k0: Int, r0: Int): Int = {
      var k = k0
      var r = r0
      while (k <= se) {
        val zz = base + k
        if (coefA(zz) != 0) {
          if (bits.bit() == 1 && (coefA(zz) & p1) == 0)
            coefA(zz) += (if (coefA(zz) >= 0) p1 else m1)
        } else {
          if (r == 0) return k
          r -= 1
        }
        k += 1
      }
      k
    }

    // decode one block of the single-component AC scan
    def acBlock(comp: Comp, base: Int): Boolean = {
      val act = acTabs(comp.acTab)
      if (act == null) return false
      if (ah == 0) { // first AC scan of this band
        if (eobrun > 0) { eobrun -= 1; return true }
        var k = ss
        while (k <= se) {
          val rs = bits.decodeHuff(act)
          if (rs < 0) return false
          val r = rs >> 4
          val s = rs & 0x0F
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else {
              eobrun = (1 << r) - 1
              if (r > 0) eobrun += bits.bits(r)
              return true // EOB covers this block
            }
          } else {
            k += r
            if (k > se) return false
            comp.coef(base + k) = bits.extend(s) << al
            k += 1
          }
        }
        true
      } else { // AC refinement (G.1.2.3)
        var k = ss
        if (eobrun == 0) {
          var done = false
          while (!done && k <= se) {
            val rs = bits.decodeHuff(act)
            if (rs < 0) return false
            var r = rs >> 4
            val s = rs & 0x0F
            var newVal = 0
            if (s == 0) {
              if (r < 15) {
                eobrun = (1 << r)
                if (r > 0) eobrun += bits.bits(r)
                done = true // correction bits of this block run below
              }
              // r == 15: ZRL — skip 16 zero-history coefficients
            } else {
              if (s != 1) return false // refinement sizes are 1
              newVal = if (bits.bit() == 1) p1 else m1
            }
            if (!done) {
              val stop = refineSweep(comp.coef, base, k, r)
              if (newVal != 0 && stop <= se) comp.coef(base + stop) = newVal
              k = stop + 1
            }
          }
        }
        if (eobrun > 0) {
          refineSweep(comp.coef, base, k, Int.MaxValue) // bits for nonzeros
          eobrun -= 1
        }
        true
      }
    }

    var mcu = 0
    if (dcScan && ns > 1) {
      // interleaved DC scan over the MCU grid
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            if (!bits.restart()) return -1
            comps.foreach(_.pred = 0)
            eobrun = 0
          }
          var ci = 0
          while (ci < ns) {
            val comp = scanComps(ci)
            var by = 0
            while (by < comp.v) {
              var bx = 0
              while (bx < comp.h) {
                val base = ((my * comp.v + by) * comp.bwFull +
                  (mx * comp.h + bx)) * 64
                if (ah == 0) {
                  val dct = dcTabs(comp.dcTab)
                  if (dct == null) return -1
                  val s = bits.decodeHuff(dct)
                  if (s < 0 || s > 15) return -1
                  comp.pred += bits.extend(s)
                  comp.coef(base) = comp.pred << al
                } else {
                  if (bits.bit() == 1) comp.coef(base) |= p1
                }
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // single-component scan (DC or AC) over the REAL block grid
      val comp = scanComps(0)
      var by = 0
      while (by < comp.bh) {
        var bx = 0
        while (bx < comp.bw) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            if (!bits.restart()) return -1
            comp.pred = 0
            eobrun = 0
          }
          val base = (by * comp.bwFull + bx) * 64
          if (dcScan) {
            if (ah == 0) {
              val dct = dcTabs(comp.dcTab)
              if (dct == null) return -1
              val s = bits.decodeHuff(dct)
              if (s < 0 || s > 15) return -1
              comp.pred += bits.extend(s)
              comp.coef(base) = comp.pred << al
            } else {
              if (bits.bit() == 1) comp.coef(base) |= p1
            }
          } else {
            if (!acBlock(comp, base)) return -1
          }
          mcu += 1
          bx += 1
        }
        by += 1
      }
    }
    if (bits.overrun > 0) return -1 // truncated scan
    comps.foreach(_.pred = 0) // predictors never carry across scans
    bits.align()
  }

  /** Separable double IDCT of one row-major dequantized block. */
  private def idct(coef: Array[Int], tmp: Array[Double],
      out: Array[Double]): Unit = {
    var y0 = 0
    while (y0 < 8) {
      var x0 = 0
      while (x0 < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) {
          val cv = coef(y0 * 8 + u)
          if (cv != 0) acc += cv * Cos(u * 8 + x0)
          u += 1
        }
        tmp(y0 * 8 + x0) = acc
        x0 += 1
      }
      y0 += 1
    }
    var x1 = 0
    while (x1 < 8) {
      var y1 = 0
      while (y1 < 8) {
        var acc = 0.0
        var v0 = 0
        while (v0 < 8) {
          acc += tmp(v0 * 8 + x1) * Cos(v0 * 8 + y1)
          v0 += 1
        }
        out(y1 * 8 + x1) = acc
        y1 += 1
      }
      x1 += 1
    }
  }

  /** Level-shift + clamp one IDCT'd block into the padded plane. */
  private def store(block: Array[Double], plane: Array[Byte], pw: Int,
      px0: Int, py0: Int): Unit = {
    var yy = 0
    while (yy < 8) {
      val dst = (py0 + yy) * pw + px0
      var xx = 0
      while (xx < 8) {
        val v1 = math.rint(block(yy * 8 + xx)).toInt + 128
        plane(dst + xx) =
          (if (v1 < 0) 0 else if (v1 > 255) 255 else v1).toByte
        xx += 1
      }
      yy += 1
    }
  }

  /** Upsample + color convert the decoded planes into the shared
    * 3-channel RGB shape.
    */
  private def emit(comps: Array[Comp], w: Int, h: Int, hMax: Int,
      vMax: Int, adobeTransform: Int): PixelStats.Decoded = {
    val out = new Array[Byte](w * h * 3)
    if (comps.length == 1) {
      val cp = comps(0)
      var y = 0
      while (y < h) {
        val src = y * cp.pw
        var x = 0
        while (x < w) {
          val v = cp.plane(src + x)
          val o = (y * w + x) * 3
          out(o) = v; out(o + 1) = v; out(o + 2) = v
          x += 1
        }
        y += 1
      }
    } else if (comps.length == 4) {
      // CMYK / YCCK (the Adobe 4-component family — scanned-document
      // corpora are full of these). Adobe stores the samples INVERTED
      // (a stored byte is 255 − the ink value), and YCCK
      // (transform=2) additionally runs the inverted C/M/Y through
      // the YCbCr transform; K always rides as its own plane. After
      // the optional YCbCr inversion both forms yield
      // (invC, invM, invY, invK), and RGB = ⌊(inv·invK + 127)/255⌋
      // per channel — exact integer arithmetic a relational oracle
      // replays. APP14-absent 4-component files are treated as
      // Adobe-style CMYK (transform 0); the non-inverted non-Adobe
      // variant is vanishingly rare and would need sidecar knowledge
      // no JPEG marker carries.
      val p0 = upsample(comps(0), w, h, hMax, vMax)
      val p1 = upsample(comps(1), w, h, hMax, vMax)
      val p2 = upsample(comps(2), w, h, hMax, vMax)
      val pK = upsample(comps(3), w, h, hMax, vMax)
      val ycck = adobeTransform == 2
      var i2 = 0
      val n2 = w * h
      while (i2 < n2) {
        var invC = p0(i2) & 0xFF
        var invM = p1(i2) & 0xFF
        var invY = p2(i2) & 0xFF
        if (ycck) {
          val sy = invC
          val cbv = invM - 128
          val crv = invY - 128
          invC = sy + ((91881 * crv + 32768) >> 16)
          invM = sy - ((22554 * cbv + 46802 * crv + 32768) >> 16)
          invY = sy + ((116130 * cbv + 32768) >> 16)
          if (invC < 0) invC = 0 else if (invC > 255) invC = 255
          if (invM < 0) invM = 0 else if (invM > 255) invM = 255
          if (invY < 0) invY = 0 else if (invY > 255) invY = 255
        }
        val invK = pK(i2) & 0xFF
        val o = i2 * 3
        out(o) = ((invC * invK + 127) / 255).toByte
        out(o + 1) = ((invM * invK + 127) / 255).toByte
        out(o + 2) = ((invY * invK + 127) / 255).toByte
        i2 += 1
      }
    } else {
      val pY = upsample(comps(0), w, h, hMax, vMax)
      val pB = upsample(comps(1), w, h, hMax, vMax)
      val pR = upsample(comps(2), w, h, hMax, vMax)
      val rgbDirect = adobeTransform == 0 // Adobe transform=0: stored RGB
      var i2 = 0
      val n2 = w * h
      while (i2 < n2) {
        val sy = pY(i2) & 0xFF
        val sb = pB(i2) & 0xFF
        val sr = pR(i2) & 0xFF
        val o = i2 * 3
        if (rgbDirect) {
          out(o) = sy.toByte; out(o + 1) = sb.toByte; out(o + 2) = sr.toByte
        } else {
          // BT.601 integer form (the public IJG fixed-point constants)
          val crv = sr - 128
          val cbv = sb - 128
          var r = sy + ((91881 * crv + 32768) >> 16)
          var g = sy - ((22554 * cbv + 46802 * crv + 32768) >> 16)
          var bl = sy + ((116130 * cbv + 32768) >> 16)
          if (r < 0) r = 0 else if (r > 255) r = 255
          if (g < 0) g = 0 else if (g > 255) g = 255
          if (bl < 0) bl = 0 else if (bl > 255) bl = 255
          out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = bl.toByte
        }
        i2 += 1
      }
    }
    PixelStats.Decoded("jpeg", w, h, 3, out)
  }

  /** Component plane → full-resolution w×h samples. Ratio-2 axes use
    * TRIANGLE-FILTER upsampling (the 3:1 centered weights of the
    * classic "fancy" upsampler — the filter the JDK codec applies, so
    * the differential spec can hold a tight bound); other ratios use
    * box replication (sampling ratios beyond 2 are rare and the
    * filter choice is decoder freedom under T.81).
    */
  private def upsample(c: Comp, w: Int, h: Int,
      hMax: Int, vMax: Int): Array[Byte] = {
    val sw = (w * c.h + hMax - 1) / hMax // logical source dims
    val sh = (h * c.v + vMax - 1) / vMax
    if (sw == w && sh == h && c.pw == w) return c.plane // full res, unpadded
    val out = new Array[Byte](w * h)
    val h2 = hMax == 2 * c.h
    val v2 = vMax == 2 * c.v
    val generic = !(hMax == c.h || h2) || !(vMax == c.v || v2)
    if (generic) {
      var y = 0
      while (y < h) {
        val src = (y * c.v / vMax) * c.pw
        var x = 0
        while (x < w) {
          out(y * w + x) = c.plane(src + x * c.h / hMax)
          x += 1
        }
        y += 1
      }
      return out
    }
    // horizontal pass: sw → w per source row (into a sh×w buffer)
    val hx = new Array[Byte](sh * w)
    var y = 0
    while (y < sh) {
      val src = y * c.pw
      val dst = y * w
      if (!h2) {
        var x = 0
        while (x < w) { hx(dst + x) = c.plane(src + x); x += 1 }
      } else {
        var i = 0
        while (i < sw) {
          val s = c.plane(src + i) & 0xFF
          val l = c.plane(src + (if (i > 0) i - 1 else 0)) & 0xFF
          val r = c.plane(src + (if (i < sw - 1) i + 1 else sw - 1)) & 0xFF
          val x0 = 2 * i
          // libjpeg's fancy rounding: +1 toward the left neighbour,
          // +2 toward the right — matches the JDK codec bit-for-bit
          if (x0 < w) hx(dst + x0) = ((3 * s + l + 1) >> 2).toByte
          if (x0 + 1 < w) hx(dst + x0 + 1) = ((3 * s + r + 2) >> 2).toByte
          i += 1
        }
      }
      y += 1
    }
    if (!v2) return hx // sh == h here
    // vertical pass: sh → h with the same 3:1 weights
    var j = 0
    while (j < sh) {
      val cur = j * w
      val up = (if (j > 0) j - 1 else 0) * w
      val dn = (if (j < sh - 1) j + 1 else sh - 1) * w
      val y0 = 2 * j
      var x = 0
      while (x < w) {
        val s = hx(cur + x) & 0xFF
        if (y0 < h)
          out(y0 * w + x) = ((3 * s + (hx(up + x) & 0xFF) + 1) >> 2).toByte
        if (y0 + 1 < h)
          out((y0 + 1) * w + x) =
            ((3 * s + (hx(dn + x) & 0xFF) + 2) >> 2).toByte
        x += 1
      }
      j += 1
    }
    out
  }
}

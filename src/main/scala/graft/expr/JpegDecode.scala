package graft.expr

/** Hand baseline-DCT JPEG decoder — the round-12 answer to the decode
  * cost probe (SCALE.md: ImageIO JPEG costs ~115 µs per 32×24
  * thumbnail, 12.5× the hand-PPM path, and JPEG is the majority image
  * format of a real crawl; the GIF precedent won 4.1× on the same
  * per-row-setup grounds). Pure JVM, zero dependencies, implementing
  * the PUBLIC ITU-T T.81 baseline process:
  *
  *  - marker walk: DQT (8- and 16-bit tables), SOF0/SOF1 (baseline /
  *    extended sequential, both Huffman 8-bit), DHT, DRI, SOS, APP14
  *    (the Adobe color-transform flag);
  *  - canonical Huffman decode (mincode/maxcode/valptr per T.81
  *    §F.2.2.3) over the entropy stream with FF00 byte unstuffing and
  *    RSTn restart handling (byte-align, DC predictors reset);
  *  - per-block: DC diff + AC run-length/EOB/ZRL decode, dequant,
  *    zigzag, then a double-precision separable IDCT (the spec Annex
  *    A.3.3 math directly; float keeps it within one count of any
  *    conforming integer IDCT — the differential spec bounds it
  *    against the JDK codec);
  *  - generic h×v sampling (4:4:4, 4:2:2, 4:2:0, 4:1:1) with
  *    MCU-padded component planes, box (sample-replication)
  *    upsampling, and the public BT.601 integer YCbCr→RGB formula
  *    (identical constants to the IJG fixed-point form, so color
  *    conversion matches the JDK within rounding);
  *  - grayscale replicates to the 3-channel RGB shape the ImageIO
  *    branch produces; 3-component Adobe transform=0 is passed
  *    through as RGB.
  *
  * NOT handled — these return null and [[PixelStats.decode]] falls
  * back to the ImageIO tier, so coverage is unchanged and only the
  * hot path gets faster: progressive (SOF2), arithmetic coding
  * (SOF9-11), lossless, hierarchical, 12-bit precision, CMYK/YCCK
  * (4-component), non-interleaved multi-scan files (SOS with fewer
  * components than the frame), DNL height patching. Truncated or
  * corrupt streams also return null (triage, never an error).
  *
  * Bomb guard: the SOF dims are checked against
  * [[PixelStats.MaxRawBytes]] BEFORE any plane allocation.
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
  }

  /** Entropy-coded-segment bit reader: MSB-first, FF00 unstuffed; any
    * other FF-marker stops the stream (reads past it return 0 bits —
    * the block decode then fails on an invalid Huffman walk or the
    * caller sees the marker via [[atMarker]]).
    */
  private final class Bits(b: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var n = 0
    private var stopped = false
    // bits read PAST the segment end: a complete stream never overruns
    // (the final byte's padding bits cover the last block before the
    // trailing marker), so any overrun at scan end means truncation
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
    var restartInterval = 0
    var adobeTransform = -1
    var i = 2
    var sosAt = -1
    // ---- marker walk up to SOS
    while (sosAt < 0) {
      if (i + 4 > b.length) return null
      if ((b(i) & 0xFF) != 0xFF) return null
      var m = b(i + 1) & 0xFF
      while (m == 0xFF && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xFF } // fill bytes
      if (m == 0xD8) { i += 2 } // stray SOI
      else if (m == 0xD9) return null // EOI before SOS
      else {
        val len = u16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return null
        val seg = i + 4
        val segEnd = i + 2 + len
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
          case 0xC4 => // DHT
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
          case 0xC0 | 0xC1 => // SOF0 baseline / SOF1 extended sequential
            if (comps != null) return null
            val prec = b(seg) & 0xFF
            if (prec != 8) return null
            h = u16(b, seg + 1)
            w = u16(b, seg + 3)
            val n = b(seg + 5) & 0xFF
            if (w <= 0 || h <= 0 || (n != 1 && n != 3)) return null
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
          case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
               0xCD | 0xCE | 0xCF =>
            return null // progressive / arithmetic / lossless / hierarchical
          case 0xDD => // DRI
            if (len != 4) return null
            restartInterval = u16(b, seg)
          case 0xEE => // APP14 Adobe
            if (len >= 14 && b(seg) == 'A' && b(seg + 1) == 'd' &&
              b(seg + 2) == 'o' && b(seg + 3) == 'b' && b(seg + 4) == 'e')
              adobeTransform = b(segEnd - 1) & 0xFF
          case 0xDA => // SOS
            sosAt = i
          case _ => // APPn, COM, others: skip
        }
        if (sosAt < 0) i = segEnd
      }
    }
    if (comps == null) return null
    // ---- SOS header
    val sosLen = u16(b, sosAt + 2)
    val seg = sosAt + 4
    val ns = b(seg) & 0xFF
    if (ns != comps.length) return null // non-interleaved multi-scan
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
    // Ss/Se/Ah/Al must be the baseline 0/63/0/0 — tolerated loosely
    // (some writers emit junk here; baseline decode ignores them)

    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { comp =>
      comp.pw = mcusX * 8 * comp.h
      comp.ph = mcusY * 8 * comp.v
      if (comp.pw.toLong * comp.ph > PixelStats.MaxRawBytes) return null
      comp.plane = new Array[Byte](comp.pw * comp.ph)
      if (quant(comp.tq) == null) return null
    }

    // ---- entropy-coded scan
    val bits = new Bits(b, sosAt + 2 + sosLen)
    val coef = new Array[Int](64)
    val block = new Array[Double](64)
    val tmp = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
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
              // -- IDCT (separable, double): rows then columns
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
                  block(y1 * 8 + x1) = acc
                  y1 += 1
                }
                x1 += 1
              }
              // -- store (level shift + clamp) into the padded plane
              val px0 = (mx * comp.h + bx) * 8
              val py0 = (my * comp.v + by) * 8
              var yy = 0
              while (yy < 8) {
                val dst = (py0 + yy) * comp.pw + px0
                var xx = 0
                while (xx < 8) {
                  val v1 = math.rint(block(yy * 8 + xx)).toInt + 128
                  comp.plane(dst + xx) =
                    (if (v1 < 0) 0 else if (v1 > 255) 255 else v1).toByte
                  xx += 1
                }
                yy += 1
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
    if (bits.overrun > 0) return null // truncated entropy stream

    // ---- upsample + color convert into the shared RGB shape
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
          if (x0 < w) hx(dst + x0) = ((3 * s + l + 2) >> 2).toByte
          if (x0 + 1 < w) hx(dst + x0 + 1) = ((3 * s + r + 1) >> 2).toByte
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
          out(y0 * w + x) = ((3 * s + (hx(up + x) & 0xFF) + 2) >> 2).toByte
        if (y0 + 1 < h)
          out((y0 + 1) * w + x) =
            ((3 * s + (hx(dn + x) & 0xFF) + 1) >> 2).toByte
        x += 1
      }
      j += 1
    }
    out
  }
}

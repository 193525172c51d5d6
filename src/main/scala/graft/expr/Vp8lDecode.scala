package graft.expr

/** Clean-room WebP-lossless (VP8L) decoder — the modern web's image
  * format joining the hand PNG/JPEG/PPM/BMP tier. Built from the
  * public bitstream specification (RFC 9649 / the WebP Lossless
  * Bitstream Specification); reference: the format the reference
  * pipeline's documents tier ingests as opaque blobs
  * (joselrnz/rss-feed-etl `etl/transform.py:1` treats attachments as
  * bytes — decoding is this engine's extension tier).
  *
  * Everything in VP8L is ALGORITHMIC — canonical prefix codes are
  * built from transmitted code lengths, the four transforms are
  * formulas, and the LZ77 prefix/extra-bit coding is a closed rule —
  * so unlike the MP3 Huffman registry there is no tabulated spec
  * data to recall: conformance rests on the control flow alone. The
  * one generated table, the 120-entry 2D distance map, follows the
  * spec's ordering rule (window dx ∈ [-8,8], dy ∈ [0,7], sorted by
  * squared distance, ties by larger dy then positive-before-negative
  * dx) and its leading entries are pinned in Vp8lSpec against the
  * published listing.
  *
  * Implemented: the full level-0 stream — all four transforms
  * (predictor with all 14 modes, color, subtract-green,
  * color-indexing with sub-byte pixel bundling), meta prefix codes
  * via the recursive entropy image, color cache, LZ77 with both the
  * 2D distance map and direct distances, simple AND
  * code-length-coded prefix codes (incl. the max_symbol early stop
  * and 16/17/18 repeat codes). Pixels emit as ARGB and widen to the
  * shared 3-channel RGB `Decoded` (alpha dropped — the stats tier's
  * convention for every alpha-bearing source).
  *
  * Triage contract: wrong signature/version, truncated stream,
  * overlong/incomplete prefix codes, out-of-range cache bits or
  * palette indexes, LZ77 references before the image start, or a
  * pixel/tile budget over [[PixelStats.MaxRawBytes]] all return
  * null — never an error, never a wrong decode. Lossy `VP8 ` frames
  * triage at the dispatch (no VP8 inter/intra decoder is shipped;
  * the JDK has no WebP reader to fall back to — documented gap).
  *
  * Conformance note (the honesty line every hand decoder here
  * carries): no reference WebP decoder exists in this container, so
  * bit-level conformance cannot be differentially proven offline.
  * The oracle gates pin decode(encode(x)) == x for constructed
  * streams through an INDEPENDENT test-side encoder covering every
  * stream feature, and the control flow follows the public spec
  * step by step.
  */
private[graft] object Vp8lDecode {

  /** LSB-first bit reader (VP8L packs bits little-endian — the
    * OPPOSITE of the JPEG/MP3 readers). Reads past the end return 0
    * bits but latch `overrun`, checked once at decode completion —
    * mid-stream truncation then triages without per-read branching.
    */
  private final class Br(val b: Array[Byte]) {
    var pos = 0
    val end: Int = b.length * 8
    var overrun = false
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        if (p < end) v |= ((b(p >> 3) >> (p & 7)) & 1) << i
        else overrun = true
        i += 1
      }
      pos += n
      v
    }
    def bit(): Int = bits(1)
  }

  /** Canonical prefix tree from code lengths: codes assigned in
    * symbol order per length (the DEFLATE rule), stored as the flat
    * binary tree the MP3 decoder uses (negative = ~leaf). A
    * single-symbol code is the 0-bit special case (`flat` == null,
    * `only` holds the symbol). Incomplete or oversubscribed codes
    * return null (corrupt stream).
    */
  private final class Tree(val flat: Array[Int], val only: Int)

  private def buildTree(lengths: Array[Int]): Tree = {
    var used = 0
    var single = -1
    var maxLen = 0
    var i = 0
    while (i < lengths.length) {
      val l = lengths(i)
      if (l < 0 || l > 15) return null
      if (l > 0) { used += 1; single = i; if (l > maxLen) maxLen = l }
      i += 1
    }
    if (used == 0) return null
    if (used == 1) return new Tree(null, single)
    // canonical assignment
    val blCount = new Array[Int](16)
    i = 0
    while (i < lengths.length) { if (lengths(i) > 0) blCount(lengths(i)) += 1; i += 1 }
    val nextCode = new Array[Int](16)
    var code = 0
    var l = 1
    var kraft = 0L // in units of 2^-15
    while (l <= 15) {
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
      kraft += blCount(l).toLong << (15 - l)
      l += 1
    }
    if (kraft != (1L << 15)) return null // incomplete or oversubscribed
    // flat tree insert, MSB of the code first (bits are read one at a
    // time and descend from the root)
    val nodes = new java.util.ArrayList[Array[Int]]()
    nodes.add(Array(0, 0))
    i = 0
    while (i < lengths.length) {
      val len = lengths(i)
      if (len > 0) {
        val c = nextCode(len); nextCode(len) += 1
        var at = 0
        var bitIdx = len - 1
        while (bitIdx >= 0) {
          val bb = (c >>> bitIdx) & 1
          val n = nodes.get(at)
          if (bitIdx == 0) {
            if (n(bb) != 0) return null
            n(bb) = ~i
          } else {
            if (n(bb) == 0) { nodes.add(Array(0, 0)); n(bb) = nodes.size - 1 }
            if (n(bb) < 0) return null
            at = n(bb)
          }
          bitIdx -= 1
        }
      }
      i += 1
    }
    val flat = new Array[Int](nodes.size * 2)
    i = 0
    while (i < nodes.size) {
      flat(2 * i) = nodes.get(i)(0); flat(2 * i + 1) = nodes.get(i)(1)
      i += 1
    }
    new Tree(flat, -1)
  }

  private def readSym(br: Br, t: Tree): Int = {
    if (t.flat == null) return t.only
    var at = 0
    var guard = 0
    while (guard < 16) {
      val v = t.flat(2 * at + br.bit())
      if (v < 0) return ~v
      if (v == 0) return -1 // hole in an (already-validated) tree: corrupt
      at = v
      guard += 1
    }
    -1
  }

  // order in which code-length-code lengths are transmitted
  private val ClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code: the simple (1–2 symbol) form or the
    * code-length-coded form with 16/17/18 repeats and the optional
    * max_symbol early stop. Null on any structural corruption.
    */
  private def readPrefixCode(br: Br, alphabet: Int): Tree = {
    if (br.bit() == 1) { // simple
      val nSym = br.bit() + 1
      val first8 = br.bit()
      val s0 = br.bits(if (first8 == 1) 8 else 1)
      if (nSym == 1) {
        if (s0 >= alphabet) return null
        return new Tree(null, s0)
      }
      val s1 = br.bits(8)
      if (s0 >= alphabet || s1 >= alphabet || s0 == s1) return null
      val lengths = new Array[Int](alphabet)
      lengths(s0) = 1; lengths(s1) = 1
      return buildTree(lengths)
    }
    val numCl = 4 + br.bits(4)
    if (numCl > 19) return null
    val clLens = new Array[Int](19)
    var i = 0
    while (i < numCl) { clLens(ClOrder(i)) = br.bits(3); i += 1 }
    val clTree = buildTree(clLens)
    if (clTree == null) return null
    var maxSymbol = alphabet
    if (br.bit() == 1) {
      val lengthNBits = 2 + 2 * br.bits(3)
      maxSymbol = 2 + br.bits(lengthNBits)
    }
    val lengths = new Array[Int](alphabet)
    var sym = 0
    var prev = 8
    while (sym < alphabet && maxSymbol > 0) {
      maxSymbol -= 1
      val c = readSym(br, clTree)
      if (c < 0 || c > 18) return null
      if (c < 16) {
        lengths(sym) = c; sym += 1
        if (c != 0) prev = c
      } else {
        var repeat = 0
        var value = 0
        if (c == 16) { repeat = 3 + br.bits(2); value = prev }
        else if (c == 17) repeat = 3 + br.bits(3)
        else repeat = 11 + br.bits(7)
        if (sym + repeat > alphabet) return null
        var k = 0
        while (k < repeat) { lengths(sym) = value; sym += 1; k += 1 }
      }
      if (br.overrun) return null
    }
    buildTree(lengths)
  }

  /** LZ77 prefix-coded value: codes 0–3 are values 1–4; above, the
    * (offset, extra-bits) closed rule.
    */
  private def lz77Value(br: Br, code: Int): Int = {
    if (code < 0 || code >= 40) return -1
    if (code < 4) return code + 1
    val extra = (code - 2) >> 1
    val offset = (2 + (code & 1)) << extra
    offset + br.bits(extra) + 1
  }

  /** The 120-entry 2D distance map, generated by the spec's ordering
    * rule (see the class scaladoc). Entry k (0-based) is (dx, dy).
    */
  private[graft] val DistMap: Array[(Int, Int)] = {
    val cands = (for {
      dy <- 0 to 7
      dx <- -8 to 8
      if dy > 0 || dx > 0
    } yield (dx, dy)).toArray
    cands.sortBy { case (dx, dy) => (dx * dx + dy * dy, -dy, -dx) }.take(120)
  }

  private def mapDistance(distCode: Int, xsize: Int): Int = {
    if (distCode > 120) return distCode - 120
    val (dx, dy) = DistMap(distCode - 1)
    math.max(1, dy * xsize + dx)
  }

  // ---- transforms ------------------------------------------------------

  private final case class Transform(kind: Int, w: Int, h: Int,
      bits: Int, data: Array[Int])

  private def avg2(a: Int, b: Int): Int = {
    // per-channel (a + b) / 2 without unpacking: mask the low bits
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def addFull(a: Int, b: Int, c: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val v = clip255(((a >>> sh) & 0xff) + ((b >>> sh) & 0xff) -
        ((c >>> sh) & 0xff))
      out |= v << sh
      sh += 8
    }
    out
  }

  private def addHalf(ab: Int, c: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val a = (ab >>> sh) & 0xff
      val v = clip255(a + (a - ((c >>> sh) & 0xff)) / 2)
      out |= v << sh
      sh += 8
    }
    out
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    // predict T when the LEFT pixel is closer to TL (gradient rule)
    var pl = 0
    var pt = 0
    var sh = 0
    while (sh < 32) {
      pl += math.abs(((l >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
      pt += math.abs(((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
      sh += 8
    }
    if (pl <= pt) t else l
  }

  private def predict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int =
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => select(l, t, tl)
      case 12 => addFull(l, t, tl)
      case 13 => addHalf(avg2(l, t), tl)
      case _ => 0 // modes > 13 are invalid; caller triages
    }

  private def addPixels(px: Int, pred: Int): Int = {
    // per-channel (px + pred) mod 256
    var out = 0
    var sh = 0
    while (sh < 32) {
      out |= ((((px >>> sh) & 0xff) + ((pred >>> sh) & 0xff)) & 0xff) << sh
      sh += 8
    }
    out
  }

  private def ctDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  // ---- image stream ----------------------------------------------------

  private def subSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  /** Decode one image stream (level 0 = the root: transforms + meta
    * prefix codes allowed). Returns ARGB pixels or null.
    */
  private def decodeStream(br: Br, w0: Int, h0: Int,
      level0: Boolean): Array[Int] = {
    var w = w0
    val h = h0
    if (w <= 0 || h <= 0 || w.toLong * h * 4 > PixelStats.MaxRawBytes)
      return null

    // transforms (level 0 only), each type at most once
    val transforms = new scala.collection.mutable.ArrayBuffer[Transform]()
    if (level0) {
      var seen = 0
      while (br.bit() == 1) {
        if (br.overrun) return null
        val kind = br.bits(2)
        if ((seen & (1 << kind)) != 0) return null
        seen |= 1 << kind
        kind match {
          case 2 => // subtract green: no payload
            transforms += Transform(2, w, h, 0, null)
          case 0 | 1 => // predictor / color: tiled sub-image
            val tb = br.bits(3) + 2
            val tw = subSize(w, tb); val th = subSize(h, tb)
            val sub = decodeStream(br, tw, th, level0 = false)
            if (sub == null) return null
            transforms += Transform(kind, w, h, tb, sub)
          case _ => // 3: color indexing
            val palSize = br.bits(8) + 1
            val palImg = decodeStream(br, palSize, 1, level0 = false)
            if (palImg == null) return null
            // palette entries are stored component-delta-coded
            var i = 1
            while (i < palSize) {
              palImg(i) = addPixels(palImg(i), palImg(i - 1))
              i += 1
            }
            val widthBits =
              if (palSize <= 2) 3
              else if (palSize <= 4) 2
              else if (palSize <= 16) 1
              else 0
            transforms += Transform(3, w, h, widthBits, palImg)
            w = subSize(w, widthBits) // the coded stream narrows
        }
      }
    }

    // color cache
    var cacheBits = 0
    if (br.bit() == 1) {
      cacheBits = br.bits(4)
      if (cacheBits < 1 || cacheBits > 11) return null
    }
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null

    // meta prefix codes (level 0 only)
    var metaBits = 0
    var entropy: Array[Int] = null
    var entropyW = 0
    var numGroups = 1
    if (level0 && br.bit() == 1) {
      metaBits = br.bits(3) + 2
      entropyW = subSize(w, metaBits)
      val eh = subSize(h, metaBits)
      entropy = decodeStream(br, entropyW, eh, level0 = false)
      if (entropy == null) return null
      var i = 0
      var maxIdx = 0
      while (i < entropy.length) {
        val g = (entropy(i) >>> 8) & 0xffff
        if (g > maxIdx) maxIdx = g
        i += 1
      }
      numGroups = maxIdx + 1
      if (numGroups > 4096) return null // crafted-stream group bomb
    }

    val greenAlphabet = 256 + 24 + cacheSize
    val trees = new Array[Tree](numGroups * 5)
    var gi = 0
    while (gi < numGroups) {
      val alpha = Array(greenAlphabet, 256, 256, 256, 40)
      var k = 0
      while (k < 5) {
        val t = readPrefixCode(br, alpha(k))
        if (t == null || br.overrun) return null
        trees(gi * 5 + k) = t
        k += 1
      }
      gi += 1
    }

    // pixel loop
    val n = w * h
    val px = new Array[Int](n)
    var pos = 0
    var x = 0
    var y = 0
    while (pos < n) {
      val group =
        if (entropy == null) 0
        else (entropy((y >> metaBits) * entropyW + (x >> metaBits)) >>> 8) & 0xffff
      val base = group * 5
      val s = readSym(br, trees(base))
      if (s < 0 || br.overrun) return null
      if (s < 256) {
        val r = readSym(br, trees(base + 1))
        val bl = readSym(br, trees(base + 2))
        val a = readSym(br, trees(base + 3))
        if (r < 0 || bl < 0 || a < 0) return null
        val p = (a << 24) | (r << 16) | (s << 8) | bl
        px(pos) = p
        if (cache != null)
          cache((0x1e35a7bd * p) >>> (32 - cacheBits)) = p
        pos += 1; x += 1; if (x == w) { x = 0; y += 1 }
      } else if (s < 256 + 24) {
        val length = lz77Value(br, s - 256)
        val distSym = readSym(br, trees(base + 4))
        if (distSym < 0) return null
        val distCode = lz77Value(br, distSym)
        if (length < 1 || distCode < 1) return null
        val dist = mapDistance(distCode, w)
        if (dist > pos || pos + length > n) return null
        var k = 0
        while (k < length) {
          val p = px(pos - dist)
          px(pos) = p
          if (cache != null)
            cache((0x1e35a7bd * p) >>> (32 - cacheBits)) = p
          pos += 1; x += 1; if (x == w) { x = 0; y += 1 }
          k += 1
        }
      } else {
        val idx = s - 256 - 24
        if (cache == null || idx >= cacheSize) return null
        val p = cache(idx)
        px(pos) = p
        cache((0x1e35a7bd * p) >>> (32 - cacheBits)) = p
        pos += 1; x += 1; if (x == w) { x = 0; y += 1 }
      }
      if (br.overrun) return null
    }

    // inverse transforms, reverse read order
    var out = px
    var curW = w
    var ti = transforms.length - 1
    while (ti >= 0) {
      val t = transforms(ti)
      t.kind match {
        case 2 => // add green back to red and blue
          var i = 0
          while (i < out.length) {
            val p = out(i)
            val g = (p >>> 8) & 0xff
            val r = (((p >>> 16) & 0xff) + g) & 0xff
            val b = ((p & 0xff) + g) & 0xff
            out(i) = (p & 0xff00ff00.toInt) | (r << 16) | b
            i += 1
          }
        case 0 => // predictor
          val tw = subSize(t.w, t.bits)
          var i = 0
          var xx = 0
          var yy = 0
          while (i < out.length) {
            val pred =
              if (i == 0) 0xff000000
              else if (yy == 0) out(i - 1) // top row: L
              else if (xx == 0) out(i - t.w) // first column: T
              else {
                val mode = (t.data((yy >> t.bits) * tw + (xx >> t.bits)) >>> 8) & 0xff
                if (mode > 13) return null
                val l = out(i - 1)
                val tp = out(i - t.w)
                val tl = out(i - t.w - 1)
                // the rightmost column's TR aliases to the current
                // row's first pixel (row-major addressing, per spec)
                val tr = out(i - t.w + 1)
                predict(mode, l, tp, tl, tr)
              }
            out(i) = addPixels(out(i), pred)
            i += 1; xx += 1; if (xx == t.w) { xx = 0; yy += 1 }
          }
          curW = t.w
        case 1 => // color transform inverse
          val tw = subSize(t.w, t.bits)
          var i = 0
          var xx = 0
          var yy = 0
          while (i < out.length) {
            val cte = t.data((yy >> t.bits) * tw + (xx >> t.bits))
            val g2r = cte & 0xff
            val g2b = (cte >>> 8) & 0xff
            val r2b = (cte >>> 16) & 0xff
            val p = out(i)
            val g = (p >>> 8) & 0xff
            var r = (p >>> 16) & 0xff
            var b = p & 0xff
            r = (r + ctDelta(g2r, g)) & 0xff
            b = (b + ctDelta(g2b, g)) & 0xff
            b = (b + ctDelta(r2b, r)) & 0xff
            out(i) = (p & 0xff00ff00.toInt) | (r << 16) | b
            i += 1; xx += 1; if (xx == t.w) { xx = 0; yy += 1 }
          }
          curW = t.w
        case _ => // color indexing: unbundle + palette lookup
          val pal = t.data
          val widthBits = t.bits
          val packedW = subSize(t.w, widthBits)
          val bigger = new Array[Int](t.w * t.h)
          val bitsPer = 8 >> widthBits
          val mask = (1 << bitsPer) - 1
          var yy = 0
          while (yy < t.h) {
            var xx = 0
            while (xx < t.w) {
              val packed = out(yy * packedW + (xx >> widthBits))
              val idx =
                if (widthBits == 0) (packed >>> 8) & 0xff
                else (((packed >>> 8) & 0xff) >>
                  ((xx & ((1 << widthBits) - 1)) * bitsPer)) & mask
              if (idx >= pal.length) return null
              bigger(yy * t.w + xx) = pal(idx)
              xx += 1
            }
            yy += 1
          }
          out = bigger
          curW = t.w
      }
      ti -= 1
    }
    if (curW != w0) return null // transform bookkeeping must restore dims
    out
  }

  /** VP8L chunk payload (starting at the 0x2F signature) → decoded
    * ARGB, plus dims. Null on anything undecodable.
    */
  private[graft] def decodeArgb(b: Array[Byte]): (Array[Int], Int, Int) = {
    if (b == null || b.length < 5 || (b(0) & 0xff) != 0x2f) return null
    val br = new Br(b)
    br.pos = 8
    val w = br.bits(14) + 1
    val h = br.bits(14) + 1
    br.bit() // alpha-is-used hint (informative)
    if (br.bits(3) != 0) return null // version must be 0
    val px = decodeStream(br, w, h, level0 = true)
    if (px == null || br.overrun) return null
    (px, w, h)
  }

  /** WEBP container bytes → the shared 3-channel `Decoded` (alpha
    * dropped, the stats tier's convention). Walks RIFF chunks so
    * both the simple (`VP8L` first) and extended (`VP8X` then
    * `VP8L`) layouts decode; a lossy `VP8 ` payload triages.
    */
  private[graft] def decode(b: Array[Byte]): PixelStats.Decoded = {
    if (b == null || b.length < 20) return null
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P')) return null
    var o = 12
    while (o + 8 <= b.length) {
      val tag = new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      val size = (b(o + 4) & 0xffL) | ((b(o + 5) & 0xffL) << 8) |
        ((b(o + 6) & 0xffL) << 16) | ((b(o + 7) & 0xffL) << 24)
      if (size < 0 || size > Int.MaxValue - 8) return null
      if (tag == "VP8L") {
        val end = math.min(b.length.toLong, o + 8 + size).toInt
        val payload = java.util.Arrays.copyOfRange(b, o + 8, end)
        val res = decodeArgb(payload)
        if (res == null) return null
        val (argb, w, h) = res
        val px = new Array[Byte](w * h * 3)
        var i = 0
        while (i < argb.length) {
          val p = argb(i)
          px(3 * i) = ((p >>> 16) & 0xff).toByte
          px(3 * i + 1) = ((p >>> 8) & 0xff).toByte
          px(3 * i + 2) = (p & 0xff).toByte
          i += 1
        }
        return PixelStats.Decoded("webp", w, h, 3, px)
      }
      if (tag == "VP8 ") return null // lossy: documented triage
      o += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    null
  }
}

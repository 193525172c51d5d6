package graft.expr

/** Deterministic VP8L (WebP-lossless) fixture encoder for the
  * oracle-gated WEBP queries and Vp8lSpec — NOT a general encoder
  * (GifBuild's VP8L sibling). Every piece is implemented
  * INDEPENDENTLY of [[Vp8lDecode]] — its own LSB-first bit writer,
  * its own canonical-code assignment, per-channel unpacked predictor
  * arithmetic against the decoder's packed bit-twiddling, its own
  * color-cache hash — so decode(encode(x)) == x is a genuine
  * differential, not a shared-helper tautology.
  *
  * Trees are written as SIMPLE codes (1–2 symbols) where the symbol
  * set allows and as balanced complete canonical codes through the
  * code-length code otherwise (any complete prefix code is valid
  * VP8L; optimality is not correctness). The code-length stream uses
  * the max_symbol early stop, 17/18 zero runs and literal zeros —
  * exercising the decoder's whole header path.
  */
private[graft] object Vp8lBuild {

  /** LSB-first bit writer (VP8L's packing order). */
  final class Bw {
    private val bytes = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def put(v: Int, bits: Int): this.type = {
      var i = 0
      while (i < bits) {
        acc |= ((v >>> i) & 1) << n
        n += 1
        if (n == 8) { bytes.write(acc); acc = 0; n = 0 }
        i += 1
      }
      this
    }
    /** code bits MSB-first (tree-walk order), still bit-packed LSB-first. */
    def putCode(code: Int, len: Int): this.type = {
      var i = len - 1
      while (i >= 0) { put((code >>> i) & 1, 1); i -= 1 }
      this
    }
    def result(): Array[Byte] = {
      if (n > 0) { bytes.write(acc); acc = 0; n = 0 }
      bytes.toByteArray
    }
  }

  /** RIFF/WEBP container around one VP8L chunk. */
  def container(vp8l: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    val padded = vp8l.length + (vp8l.length & 1)
    out.write("RIFF".getBytes("ISO-8859-1")); u32(4 + 8 + padded)
    out.write("WEBP".getBytes("ISO-8859-1"))
    out.write("VP8L".getBytes("ISO-8859-1")); u32(vp8l.length)
    out.write(vp8l, 0, vp8l.length)
    if ((vp8l.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  // ---- canonical codes (independent of the decoder's builder) ---------

  /** Balanced complete code over a symbol set: with m symbols and
    * L = ceil(log2 m), the first (2^L − m) symbols (ascending) get
    * length L−1, the rest L — Kraft sums to exactly 1. Canonical
    * assignment by (length, symbol) as the spec requires.
    */
  private def balancedLengths(syms: Seq[Int]): Map[Int, Int] = {
    val sorted = syms.distinct.sorted
    val m = sorted.size
    require(m >= 2, "use a simple code for < 2 symbols")
    var l = 1
    while ((1 << l) < m) l += 1
    val shorter = (1 << l) - m
    sorted.zipWithIndex.map { case (s, i) =>
      s -> (if (i < shorter && l > 1) l - 1 else l)
    }.toMap
  }

  private def canonical(lens: Map[Int, Int]): Map[Int, (Int, Int)] = {
    val maxLen = lens.values.max
    val blCount = new Array[Int](maxLen + 1)
    lens.values.foreach(l => blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 2)
    var code = 0
    var l = 1
    while (l <= maxLen) {
      code = (code + (if (l > 0) blCount(l - 1) else 0)) << 1
      nextCode(l) = code
      l += 1
    }
    lens.toSeq.sortBy(_._1).map { case (sym, len) =>
      val c = nextCode(len); nextCode(len) += 1
      sym -> (len, c)
    }.toMap
  }

  /** One prefix code for `syms` (the used symbols of an alphabet):
    * simple form when possible, else balanced lengths through the
    * code-length code. Returns the symbol → (len, code) map for the
    * body writer (simple single-symbol codes map to length 0).
    */
  private def writeTree(w: Bw, syms: Seq[Int],
      alphabet: Int): Map[Int, (Int, Int)] = {
    val ds = syms.distinct.sorted
    require(ds.nonEmpty && ds.last < alphabet, s"symbols $ds vs $alphabet")
    if (ds.size == 1) {
      val s = ds.head
      w.put(1, 1).put(0, 1) // simple, one symbol
      if (s < 2) w.put(0, 1).put(s, 1) else w.put(1, 1).put(s, 8)
      return Map(s -> (0, 0))
    }
    if (ds.size == 2 && ds.last < 256) {
      val Seq(s0, s1) = ds
      w.put(1, 1).put(1, 1) // simple, two symbols
      if (s0 < 2) w.put(0, 1).put(s0, 1) else w.put(1, 1).put(s0, 8)
      w.put(s1, 8)
      // canonical: the smaller symbol gets code 0
      return Map(s0 -> (1, 0), s1 -> (1, 1))
    }
    val lens = balancedLengths(ds)
    w.put(0, 1) // not simple
    // code-length code: the used LENGTH values plus 0/17/18, balanced
    val clSyms = (lens.values.toSeq ++ Seq(0, 17, 18)).distinct.sorted
    val clLens = balancedLengths(clSyms)
    val clCodes = canonical(clLens)
    val order = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11,
      12, 13, 14, 15)
    val numCl = order.indices.filter(i => clLens.contains(order(i))).max + 1
    w.put(numCl - 4, 4)
    var i = 0
    while (i < numCl) {
      w.put(clLens.getOrElse(order(i), 0), 3)
      i += 1
    }
    // emit the length sequence with zero runs, stopped by max_symbol
    val emits = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
    var at = 0
    for (s <- ds) {
      var gap = s - at
      while (gap >= 11) {
        var chunk = math.min(gap, 138)
        if (gap - chunk == 1 || gap - chunk == 2) chunk -= 2
        emits += ((18, chunk - 11, 7)); gap -= chunk
      }
      if (gap >= 3) { emits += ((17, gap - 3, 3)); gap = 0 }
      while (gap > 0) { emits += ((0, -1, 0)); gap -= 1 }
      emits += ((lens(s), -1, 0))
      at = s + 1
    }
    w.put(1, 1) // use max_symbol
    w.put(7, 3) // length_nbits = 2 + 2*7 = 16
    w.put(emits.size - 2, 16) // maxSymbol counts code READS
    for ((sym, extra, extraBits) <- emits) {
      val (l, c) = clCodes(sym)
      w.putCode(c, l)
      if (extra >= 0) w.put(extra, extraBits)
    }
    canonical(lens)
  }

  // ---- stream body tokens ----------------------------------------------

  sealed trait Token
  final case class Lit(argb: Int) extends Token
  /** LZ77 backref: `len` pixels from `dist` pixels back (the encoder
    * maps dist → 2D code 1 when it equals the row above, else the
    * direct form).
    */
  final case class Copy(len: Int, dist: Int) extends Token
  final case class CacheRef(argb: Int) extends Token // encoder re-hashes

  /** LZ77 prefix code for a value: (code, extraBits, extraVal). */
  private[graft] def lzCode(v: Int): (Int, Int, Int) = {
    require(v >= 1, s"lz value $v")
    if (v <= 4) return (v - 1, 0, 0)
    val x = v - 1
    var e = 0
    while ((x >> (e + 1)) >= 2) e += 1 // e = floor(log2 x) - 1
    val base = x >> e // 2 or 3
    (2 * e + base, e, x - (base << e))
  }

  /** The independent color-cache hash (must match the spec's). */
  private def cacheHash(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  /** Encode one image stream body (no transforms — callers write
    * those): cache bit, trees, tokens. Distances must already be
    * valid for width `w`.
    */
  def encodeStream(w: Bw, width: Int, tokens: Seq[Token],
      cacheBits: Int, level0: Boolean = true): Unit = {
    if (cacheBits > 0) w.put(1, 1).put(cacheBits, 4) else w.put(0, 1)
    if (level0) w.put(0, 1) // no meta prefix codes (level-0 only bit)
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    // token → symbols
    def distCodeOf(dist: Int, width: Int): Int =
      if (dist == width) 1 // 2D map entry (0, 1)
      else dist + 120 // direct form
    val greens = tokens.map {
      case Lit(p) => (p >>> 8) & 0xff
      case Copy(len, _) => 256 + lzCode(len)._1
      case CacheRef(p) => 256 + 24 + cacheHash(p, cacheBits)
    }
    val reds = tokens.collect { case Lit(p) => (p >>> 16) & 0xff }
    val blues = tokens.collect { case Lit(p) => p & 0xff }
    val alphas = tokens.collect { case Lit(p) => (p >>> 24) & 0xff }
    val dists = tokens.collect { case Copy(_, d) =>
      lzCode(distCodeOf(d, width))._1 }
    val greenAlphabet = 256 + 24 + cacheSize
    val gT = writeTree(w, greens, greenAlphabet)
    val rT = writeTree(w, if (reds.isEmpty) Seq(0) else reds, 256)
    val bT = writeTree(w, if (blues.isEmpty) Seq(0) else blues, 256)
    val aT = writeTree(w, if (alphas.isEmpty) Seq(0) else alphas, 256)
    val dT = writeTree(w, if (dists.isEmpty) Seq(0) else dists, 40)
    def emit(t: Map[Int, (Int, Int)], s: Int): Unit = {
      val (l, c) = t(s)
      if (l > 0) w.putCode(c, l)
    }
    for (tok <- tokens) tok match {
      case Lit(p) =>
        emit(gT, (p >>> 8) & 0xff)
        emit(rT, (p >>> 16) & 0xff)
        emit(bT, p & 0xff)
        emit(aT, (p >>> 24) & 0xff)
      case Copy(len, dist) =>
        val (lc, le, lv) = lzCode(len)
        emit(gT, 256 + lc); w.put(lv, le)
        val (dc, de, dv) = lzCode(distCodeOf(dist, width))
        emit(dT, dc); w.put(dv, de)
      case CacheRef(p) =>
        emit(gT, 256 + 24 + cacheHash(p, cacheBits))
    }
  }

  private def header(w: Bw, width: Int, height: Int): Unit = {
    w.put(0x2f, 8).put(width - 1, 14).put(height - 1, 14)
      .put(0, 1).put(0, 3) // alpha hint, version 0
  }

  /** Literals-only image (optionally with a color cache: repeated
    * colors after their first literal go through cache refs).
    */
  def literal(width: Int, height: Int, pixels: Array[Int],
      cacheBits: Int = 0): Array[Byte] = {
    require(pixels.length == width * height)
    val w = new Bw
    header(w, width, height)
    w.put(0, 1) // no transforms
    val tokens =
      if (cacheBits == 0) pixels.toSeq.map(Lit(_))
      else {
        val cache = new Array[Int](1 << cacheBits)
        val seen = new Array[Boolean](1 << cacheBits)
        pixels.toSeq.map { p =>
          val h = cacheHash(p, cacheBits)
          val t: Token =
            if (seen(h) && cache(h) == p) CacheRef(p)
            else Lit(p)
          cache(h) = p; seen(h) = true
          t
        }
      }
    encodeStream(w, width, tokens, cacheBits)
    w.result()
  }

  /** First row literal, every following row an LZ77 copy of the row
    * above — one backref of width·(height−1) pixels through the 2D
    * distance map's (0, 1) entry.
    */
  def rowCopy(width: Int, height: Int, row: Array[Int]): Array[Byte] = {
    require(row.length == width && height >= 2)
    val w = new Bw
    header(w, width, height)
    w.put(0, 1)
    val tokens = row.toSeq.map(Lit(_)) :+ Copy(width * (height - 1), width)
    encodeStream(w, width, tokens, cacheBits = 0)
    w.result()
  }

  /** Subtract-green transform around a literals-only stream. */
  def subtractGreen(width: Int, height: Int,
      pixels: Array[Int]): Array[Byte] = {
    val w = new Bw
    header(w, width, height)
    w.put(1, 1).put(2, 2) // one transform: subtract green
    w.put(0, 1) // no more transforms
    val residual = pixels.map { p =>
      val g = (p >>> 8) & 0xff
      val r = (((p >>> 16) & 0xff) - g) & 0xff
      val b = ((p & 0xff) - g) & 0xff
      (p & 0xff00ff00.toInt) | (r << 16) | b
    }
    encodeStream(w, width, residual.toSeq.map(Lit(_)), cacheBits = 0)
    w.result()
  }

  /** Color-indexing transform: palette + packed index stream.
    * Palette size decides the packing (≤2 → 8 px/byte, ≤4 → 4,
    * ≤16 → 2, else 1).
    */
  def palette(width: Int, height: Int, pal: Array[Int],
      indices: Array[Int]): Array[Byte] = {
    require(indices.length == width * height)
    require(indices.forall(i => i >= 0 && i < pal.length))
    val w = new Bw
    header(w, width, height)
    w.put(1, 1).put(3, 2) // one transform: color indexing
    w.put(pal.length - 1, 8)
    // palette stream: component-delta coded literals
    val deltas = pal.indices.map { i =>
      if (i == 0) pal(0)
      else {
        val p = pal(i); val q = pal(i - 1)
        var out = 0
        var sh = 0
        while (sh < 32) {
          out |= ((((p >>> sh) & 0xff) - ((q >>> sh) & 0xff)) & 0xff) << sh
          sh += 8
        }
        out
      }
    }
    encodeStream(w, pal.length, deltas.map(Lit(_)), cacheBits = 0,
      level0 = false)
    w.put(0, 1) // end of transforms
    val widthBits =
      if (pal.length <= 2) 3 else if (pal.length <= 4) 2
      else if (pal.length <= 16) 1 else 0
    val bitsPer = 8 >> widthBits
    val packedW = (width + (1 << widthBits) - 1) >> widthBits
    val packed = new Array[Int](packedW * height)
    for (y <- 0 until height; x <- 0 until width) {
      val slot = y * packedW + (x >> widthBits)
      val sub = x & ((1 << widthBits) - 1)
      packed(slot) |= indices(y * width + x) << (8 + sub * bitsPer)
    }
    encodeStream(w, packedW, packed.toSeq.map(Lit(_)), cacheBits = 0)
    w.result()
  }

  /** Predictor transform with ONE tile (size_bits sized to cover the
    * whole image) in `mode`, residuals computed by an UNPACKED
    * per-channel reference implementation of the 14 predictors —
    * the differential against the decoder's packed arithmetic.
    */
  def predictor(width: Int, height: Int, pixels: Array[Int],
      mode: Int): Array[Byte] = {
    require(pixels.length == width * height && mode >= 0 && mode <= 13)
    var sizeBits = 2
    while ((1 << sizeBits) < math.max(width, height)) sizeBits += 1
    require(sizeBits <= 9, "image too large for one tile")
    val w = new Bw
    header(w, width, height)
    w.put(1, 1).put(0, 2) // one transform: predictor
    w.put(sizeBits - 2, 3)
    // 1×1 predictor image: mode in the green channel
    encodeStream(w, 1, Seq(Lit(0xff000000 | (mode << 8))), cacheBits = 0,
      level0 = false)
    w.put(0, 1) // end of transforms
    val residual = new Array[Int](pixels.length)
    var i = 0
    var x = 0
    var y = 0
    while (i < pixels.length) {
      val pred =
        if (i == 0) 0xff000000
        else if (y == 0) pixels(i - 1)
        else if (x == 0) pixels(i - width)
        else refPredict(mode, pixels(i - 1), pixels(i - width),
          pixels(i - width - 1), pixels(i - width + 1))
      var out = 0
      var sh = 0
      while (sh < 32) {
        out |= ((((pixels(i) >>> sh) & 0xff) - ((pred >>> sh) & 0xff)) & 0xff) << sh
        sh += 8
      }
      residual(i) = out
      i += 1; x += 1; if (x == width) { x = 0; y += 1 }
    }
    encodeStream(w, width, residual.toSeq.map(Lit(_)), cacheBits = 0)
    w.result()
  }

  /** Color transform with ONE tile: forward-transforms red/blue by
    * the signed green/red deltas so the decoder's inverse restores
    * the original pixels.
    */
  def colorTransform(width: Int, height: Int, pixels: Array[Int],
      g2r: Int, g2b: Int, r2b: Int): Array[Byte] = {
    require(pixels.length == width * height)
    var sizeBits = 2
    while ((1 << sizeBits) < math.max(width, height)) sizeBits += 1
    require(sizeBits <= 9, "image too large for one tile")
    val w = new Bw
    header(w, width, height)
    w.put(1, 1).put(1, 2) // one transform: color
    w.put(sizeBits - 2, 3)
    val cte = 0xff000000 | ((r2b & 0xff) << 16) | ((g2b & 0xff) << 8) |
      (g2r & 0xff)
    encodeStream(w, 1, Seq(Lit(cte)), cacheBits = 0, level0 = false)
    w.put(0, 1) // end of transforms
    def delta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5
    val residual = pixels.map { p =>
      val g = (p >>> 8) & 0xff
      val r = (p >>> 16) & 0xff
      val b = p & 0xff
      val r2 = (r - delta(g2r, g)) & 0xff
      val b2 = (b - delta(g2b, g) - delta(r2b, r)) & 0xff
      (p & 0xff00ff00.toInt) | (r2 << 16) | b2
    }
    encodeStream(w, width, residual.toSeq.map(Lit(_)), cacheBits = 0)
    w.result()
  }

  /** Reference (unpacked, per-channel) predictor — deliberately NOT
    * sharing code with [[Vp8lDecode]].
    */
  private def refPredict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int = {
    def ch(p: Int, sh: Int) = (p >>> sh) & 0xff
    def pack(f: Int => Int): Int = {
      var out = 0
      var sh = 0
      while (sh < 32) { out |= (f(sh) & 0xff) << sh; sh += 8 }
      out
    }
    def clamp(v: Int) = if (v < 0) 0 else if (v > 255) 255 else v
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => pack(sh => ((ch(l, sh) + ch(tr, sh)) / 2 + ch(t, sh)) / 2)
      case 6 => pack(sh => (ch(l, sh) + ch(tl, sh)) / 2)
      case 7 => pack(sh => (ch(l, sh) + ch(t, sh)) / 2)
      case 8 => pack(sh => (ch(tl, sh) + ch(t, sh)) / 2)
      case 9 => pack(sh => (ch(t, sh) + ch(tr, sh)) / 2)
      case 10 => pack(sh => ((ch(l, sh) + ch(tl, sh)) / 2 +
        (ch(t, sh) + ch(tr, sh)) / 2) / 2)
      case 11 =>
        var pl = 0; var pt = 0
        var sh = 0
        while (sh < 32) {
          pl += math.abs(ch(l, sh) - ch(tl, sh))
          pt += math.abs(ch(t, sh) - ch(tl, sh))
          sh += 8
        }
        if (pl <= pt) t else l
      case 12 => pack(sh => clamp(ch(l, sh) + ch(t, sh) - ch(tl, sh)))
      case 13 => pack { sh =>
        val a = (ch(l, sh) + ch(t, sh)) / 2
        clamp(a + (a - ch(tl, sh)) / 2)
      }
      case _ => 0
    }
  }
}

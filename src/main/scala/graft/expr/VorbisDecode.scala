package graft.expr

/** Clean-room Vorbis I decoder — the OGG-side lossy arm of the
  * [[graft.operators.Multimodal.AudioDecoder]] seam, completing the
  * audio-codec tier ([[Mp3Decode]] lossy MPEG, [[FlacDecode]]
  * lossless, this file the xiph lossy family). Implemented from the
  * public Vorbis I specification (xiph.org) and the OGG framing spec
  * (RFC 3533); no reference decoder code consulted. Reference
  * behavior cited: the reference pipeline (joselrnz/rss-feed-etl)
  * has no audio tier at all — this extends the engine's
  * training-data surface for OGG-packaged crawl audio.
  *
  * Vorbis is uniquely suited to a zero-egress clean-room build:
  * unlike MP3 (whose Huffman code matrices are tabulated spec data
  * this build refuses to guess — see [[Mp3Decode]]'s conformance
  * notes), EVERY Vorbis codebook, floor configuration and residue
  * configuration travels INSIDE the stream's setup header. The
  * decode machinery is pure algorithm: canonical first-fit codeword
  * assignment over stream-delivered code lengths, the floor1
  * integer line renderer, residue partition accumulation, square
  * polar coupling, IMDCT, and the sin(π/2·sin²) lapped window.
  *
  * Exactly ONE piece of numeric spec data exists in the whole
  * format: the 256-entry floor1 inverse-dB amplitude table. It is
  * generated here from its closed form 10^((i−255)·0.02734375)
  * (a 0.546875 dB geometric step ending at 1.0), which reproduces
  * the published table's endpoints (1.0649863e-07, 1.1341951e-07,
  * …, 1.0) to float precision; byte-identity of every middle entry
  * against the published table is NOT verified offline, so nonzero
  * waveforms are near-conforming up to possible last-ulp rounding
  * of that table (and the IMDCT here is evaluated in double
  * arithmetic, at least as precise as any conforming float
  * pipeline). Exact-zero output is EXACT: a channel whose floor is
  * flagged unused renders IEEE zero through every stage regardless
  * of table rounding — the property the oracle constructions pin.
  *
  * Supported end-to-end: OGG page walk (CRC-32 poly 0x04c11db7,
  * direct form, init/xorout 0, computed with the CRC field zeroed;
  * packet reassembly across lacing runs and page spans;
  * continuation/BOS/EOS flags), the three Vorbis headers, codebooks
  * (ordered and unordered/sparse length lists, lookup types 0/1/2,
  * float32_unpack, sequence_p), floor type 1 in full, residue types
  * 0/1/2, channel coupling, multi-submap mappings, both block sizes
  * with the full long/short window slope geometry, and final-page
  * granule truncation.
  *
  * Triage contract (the [[Mp3Decode]] shape — never a wrong
  * decode):
  *  - not OGG / no Vorbis ID header / malformed or overspecified
  *    setup → null;
  *  - floor type 0 (LSP synthesis — extinct in practice, its cosine
  *    machinery deliberately out of scope) referenced by any
  *    mapping → null, parse-validated but never decoded;
  *  - channels > [[MaxChannels]] → null (the WAV output contract);
  *  - codebooks with exactly one used entry (spec-ambiguous
  *    codeword length; the errata special case) → parse, but any
  *    decode USE triages the stream;
  *  - a page CRC mismatch, an invalid codeword, or any structural
  *    corruption mid-stream stops the walk and returns the audio
  *    already decoded (the ragged-tail convention shared with
  *    [[FlacDecode]]); null only when no audio packet decoded;
  *  - end-of-packet DURING an audio packet is NOT an error (spec
  *    §4.3: the remaining vectors are zero) — handled exactly so.
  *
  * Bomb guards: decoded output capped at [[MaxPcmBytes]] (walk
  * stops cleanly), codebook entries ≤ 65536 and VQ multiplicand
  * arrays ≤ 2^22, block sizes bounded to the spec's [64, 8192],
  * floor1 point lists ≤ 65 (spec mandate), and the classword
  * radix bounded so classification unpacking cannot overflow.
  *
  * Scale shape: pure per-row projection behind the seam — one
  * pass, no shuffle; per-decode state is one block's channel
  * buffers plus the ≤ 8192-sample overlap tail; the blob projects
  * away immediately downstream. The IMDCT is the direct mod-4n
  * cosine-table form, O(n²/4) per block — exact and allocation
  * -light; a split-radix fast path is a documented future
  * optimization, not a correctness gap.
  */
object VorbisDecode {

  /** Decoded-output cap: 64 MiB PCM (matches [[FlacDecode]]). */
  val MaxPcmBytes: Int = 1 << 26

  /** WAV output practicality cap (matches [[FlacDecode]]'s 1–8). */
  val MaxChannels: Int = 8

  private val MaxCodebookEntries = 1 << 16
  private val MaxMultiplicands = 1 << 22

  // ------------------------------------------------------------------
  // Control-flow sentinels (no stack traces — hot path).
  // ------------------------------------------------------------------

  /** End of packet during a read — VALID mid-audio-packet (spec
    * §4.3 truncated-packet rule); fatal in headers.
    */
  private object Eop extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Structural corruption / unsupported construct — stops the walk
    * (header context: whole stream null; audio context: ragged
    * tail).
    */
  private object Bad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bad(): Nothing = throw Bad

  // ------------------------------------------------------------------
  // Vorbis bitpacking: LSB-first within bytes (the OPPOSITE of
  // FLAC/MP3 — the spec's "bitpacking convention").
  // ------------------------------------------------------------------

  private final class Br(b: Array[Byte], val from: Int, val until: Int) {
    private var byteIdx = from
    private var bitIdx = 0 // 0..7, LSB first

    def bit(): Int = {
      if (byteIdx >= until) throw Eop
      val v = (b(byteIdx) >> bitIdx) & 1
      bitIdx += 1
      if (bitIdx == 8) { bitIdx = 0; byteIdx += 1 }
      v
    }

    /** Unsigned n-bit read, n ≤ 32, value in a Long (u32 fields). */
    def bitsL(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v |= bit().toLong << i; i += 1 }
      v
    }

    def bits(n: Int): Int = bitsL(n).toInt
  }

  /** ilog per spec §9.2.1: position of the highest set bit, 1-based;
    * ilog(0) = 0, negative → 0.
    */
  private def ilog(x0: Int): Int = {
    var x = x0
    var r = 0
    while (x > 0) { r += 1; x >>= 1 }
    r
  }

  /** float32_unpack per spec §9.2.2: 21-bit mantissa, sign, 10-bit
    * biased exponent (bias 788).
    */
  private def float32Unpack(x: Long): Float = {
    val mant = (x & 0x1fffffL).toDouble
    val exp = ((x & 0x7fe00000L) >>> 21).toInt
    val m = if ((x & 0x80000000L) != 0) -mant else mant
    (m * math.pow(2.0, exp - 788)).toFloat
  }

  // ------------------------------------------------------------------
  // Codebooks
  // ------------------------------------------------------------------

  private final class Codebook(
      val dims: Int,
      val entries: Int,
      lengths: Array[Int], // 0 = unused
      val lookupType: Int,
      minVal: Float,
      deltaVal: Float,
      seqP: Boolean,
      mults: Array[Int]) {

    // Canonical first-fit codeword assignment (spec §3.2.1's binary
    // tree, built MY way): maintain the set of FREE subtrees as
    // (left-aligned 32-bit prefix, depth), ordered by position. The
    // free set is exactly the right-siblings along the current
    // leftmost path, so it never holds more than 32 nodes — each
    // assignment scans a handful of entries, no quadratic blowup.
    // Codewords are stored MSB(root)-first in `codes`; decode walks
    // the stream one bit at a time accumulating root-first.
    private val codeMap = new java.util.HashMap[Long, Integer]()
    var maxLen = 0
    var usedCount = 0
    var valid = true // overspecified/underspecified → unusable

    {
      val free = new java.util.TreeMap[Long, Integer]()
      free.put(0L, 0) // whole tree, depth 0 at position 0
      var i = 0
      var broken = false
      while (i < entries && !broken) {
        val len = lengths(i)
        if (len > 0) {
          usedCount += 1
          if (len > maxLen) maxLen = len
          // earliest free subtree shallow enough to host depth `len`
          var found = -1L
          var foundDepth = -1
          val it = free.entrySet().iterator()
          var done = false
          while (it.hasNext && !done) {
            val e = it.next()
            if (e.getValue <= len) {
              found = e.getKey; foundDepth = e.getValue; done = true
            }
          }
          if (found < 0) { valid = false; broken = true } // overspecified
          else {
            free.remove(found)
            var d = foundDepth
            var prefix = found
            while (d < len) {
              d += 1
              // take the 0 branch; the 1 branch becomes free
              free.put(prefix | (1L << (32 - d)), d)
            }
            val code = prefix >>> (32 - len)
            codeMap.put((len.toLong << 32) | code, i)
          }
        }
        i += 1
      }
      // underspecified tree: an error per spec unless the errata
      // single-entry case (kept parseable, unusable for decode)
      if (!free.isEmpty && usedCount > 1) valid = false
      if (usedCount <= 1) valid = false
    }

    /** Scalar decode: the entry number. */
    def scalar(br: Br): Int = {
      if (!valid) bad()
      var acc = 0L
      var len = 0
      while (len < maxLen) {
        acc = (acc << 1) | br.bit()
        len += 1
        val e = codeMap.get((len.toLong << 32) | acc)
        if (e != null) return e.intValue()
      }
      bad() // invalid codeword
    }

    private val lookup1Values: Int =
      if (lookupType != 1) 0
      else {
        // largest x with x^dims ≤ entries (overflow-safe)
        var x = 1
        var ok = true
        while (ok) {
          val t = x + 1
          var p = 1L
          var d = 0
          var over = false
          while (d < dims && !over) {
            p *= t
            if (p > entries) over = true
            d += 1
          }
          if (over) ok = false else x = t
        }
        x
      }

    /** VQ decode into `out` (length ≥ dims). */
    def vq(br: Br, out: Array[Float]): Unit = {
      val entry = scalar(br)
      var last = 0f
      if (lookupType == 1) {
        var idxDiv = 1
        var d = 0
        while (d < dims) {
          val off = (entry / idxDiv) % lookup1Values
          out(d) = minVal + deltaVal * mults(off) + last
          if (seqP) last = out(d)
          idxDiv *= lookup1Values
          d += 1
        }
      } else if (lookupType == 2) {
        val base = entry * dims
        var d = 0
        while (d < dims) {
          out(d) = minVal + deltaVal * mults(base + d) + last
          if (seqP) last = out(d)
          d += 1
        }
      } else bad() // lookup 0 books are scalar-context only
    }
  }

  private def readCodebook(br: Br): Codebook = {
    if (br.bits(24) != 0x564342) bad() // sync "BCV"
    val dims = br.bits(16)
    val entries = br.bits(24)
    if (dims < 1 || entries < 1 || entries > MaxCodebookEntries) bad()
    val lengths = new Array[Int](entries)
    val ordered = br.bit() == 1
    if (!ordered) {
      val sparse = br.bit() == 1
      var i = 0
      while (i < entries) {
        if (!sparse || br.bit() == 1) lengths(i) = br.bits(5) + 1
        i += 1
      }
    } else {
      var cur = br.bits(5) + 1
      var i = 0
      while (i < entries) {
        val num = br.bits(ilog(entries - i))
        if (num < 0 || i + num > entries) bad()
        var k = 0
        while (k < num) { lengths(i + k) = cur; k += 1 }
        i += num
        cur += 1
        if (cur > 32 && i < entries) bad()
      }
    }
    val lookupType = br.bits(4)
    if (lookupType > 2) bad()
    var minV = 0f; var delV = 0f; var seqP = false
    var mults: Array[Int] = null
    if (lookupType != 0) {
      minV = float32Unpack(br.bitsL(32))
      delV = float32Unpack(br.bitsL(32))
      val valueBits = br.bits(4) + 1
      seqP = br.bit() == 1
      val lookupValues =
        if (lookupType == 1) {
          var x = 1
          var ok = true
          while (ok) {
            val t = x + 1
            var p = 1L; var d = 0; var over = false
            while (d < dims && !over) { p *= t; if (p > entries) over = true; d += 1 }
            if (over) ok = false else x = t
          }
          x
        } else {
          val lv = entries.toLong * dims
          if (lv > MaxMultiplicands) bad()
          lv.toInt
        }
      if (lookupValues > MaxMultiplicands) bad()
      mults = new Array[Int](lookupValues)
      var i = 0
      while (i < lookupValues) { mults(i) = br.bits(valueBits); i += 1 }
    }
    new Codebook(dims, entries, lengths, lookupType, minV, delV, seqP, mults)
  }

  // ------------------------------------------------------------------
  // Floor 1 (floor 0 is parse-validated, decode-triaged — scaladoc)
  // ------------------------------------------------------------------

  private final class Floor1(
      val partitionClasses: Array[Int],
      val classDims: Array[Int],
      val classSubclasses: Array[Int],
      val classMasterbooks: Array[Int],
      val subclassBooks: Array[Array[Int]],
      val multiplier: Int,
      val xList: Array[Int],
      val sortOrder: Array[Int]) // indices of xList ascending by X

  private def readFloor1(br: Br, nBooks: Int): Floor1 = {
    val partitions = br.bits(5)
    val partClass = new Array[Int](partitions)
    var maxClass = -1
    var i = 0
    while (i < partitions) {
      partClass(i) = br.bits(4)
      if (partClass(i) > maxClass) maxClass = partClass(i)
      i += 1
    }
    val nCls = maxClass + 1
    val clsDim = new Array[Int](nCls)
    val clsSub = new Array[Int](nCls)
    val clsMaster = new Array[Int](nCls)
    val subBooks = new Array[Array[Int]](nCls)
    i = 0
    while (i < nCls) {
      clsDim(i) = br.bits(3) + 1
      clsSub(i) = br.bits(2)
      if (clsSub(i) != 0) {
        clsMaster(i) = br.bits(8)
        if (clsMaster(i) >= nBooks) bad()
      } else clsMaster(i) = -1
      val nSub = 1 << clsSub(i)
      subBooks(i) = new Array[Int](nSub)
      var j = 0
      while (j < nSub) {
        subBooks(i)(j) = br.bits(8) - 1
        if (subBooks(i)(j) >= nBooks) bad()
        j += 1
      }
      i += 1
    }
    val multiplier = br.bits(2) + 1
    val rangeBits = br.bits(4)
    var values = 2
    i = 0
    while (i < partitions) { values += clsDim(partClass(i)); i += 1 }
    if (values > 65) bad() // spec: floor1 point lists are ≤ 65 values
    val xs = new Array[Int](values)
    xs(0) = 0
    xs(1) = 1 << rangeBits
    var k = 2
    i = 0
    while (i < partitions) {
      var j = 0
      while (j < clsDim(partClass(i))) {
        xs(k) = br.bits(rangeBits)
        k += 1
        j += 1
      }
      i += 1
    }
    // X values must be unique (spec validation)
    val sorted = xs.zipWithIndex.sortBy(_._1)
    i = 1
    while (i < values) {
      if (sorted(i)._1 == sorted(i - 1)._1) bad()
      i += 1
    }
    new Floor1(partClass, clsDim, clsSub, clsMaster, subBooks, multiplier,
      xs, sorted.map(_._2))
  }

  /** Skips a floor0 config, validating structure (order/rate/bark
    * fields, book list in range). Streams that USE it are triaged at
    * header time by the mapping check.
    */
  private def skipFloor0(br: Br, nBooks: Int): Unit = {
    val order = br.bits(8)
    val rate = br.bits(16)
    val bark = br.bits(16)
    val ampBits = br.bits(6)
    br.bits(8) // amplitude offset
    if (order < 1 || rate < 1 || bark < 1) bad()
    if (ampBits > 64) bad()
    val nB = br.bits(4) + 1
    var i = 0
    while (i < nB) { if (br.bits(8) >= nBooks) bad(); i += 1 }
  }

  /** The floor1 amplitude table, generated from its closed form:
    * a 0.546875 dB (= 35/64 dB) geometric step, entry 255 = 1.0.
    * Reproduces the published endpoints to float precision; see the
    * class scaladoc for the conformance caveat.
    */
  private val InverseDb: Array[Float] =
    Array.tabulate(256)(i => math.pow(10.0, (i - 255) * 0.02734375).toFloat)

  private val FloorRanges = Array(256, 128, 86, 64)

  /** render_point per spec §9.2.6 — pure integer. */
  private def renderPoint(x0: Int, y0: Int, x1: Int, y1: Int, x: Int): Int = {
    val dy = y1 - y0
    val adx = x1 - x0
    val ady = math.abs(dy)
    val err = ady * (x - x0)
    val off = err / adx
    if (dy < 0) y0 - off else y0 + off
  }

  /** render_line per spec §9.2.7 — pure integer Bresenham variant,
    * writing into buf[x0, min(x1, n)).
    */
  private def renderLine(x0: Int, y0: Int, x1: Int, y1: Int,
      buf: Array[Int], n: Int): Unit = {
    val dy = y1 - y0
    val adx = x1 - x0
    var ady = math.abs(dy)
    val base = dy / adx // truncation toward zero, C semantics
    val sy = if (dy < 0) base - 1 else base + 1
    ady -= math.abs(base) * adx
    if (x0 < n) buf(x0) = y0
    var x = x0 + 1
    var y = y0
    var err = 0
    val lim = math.min(x1, n)
    while (x < lim) {
      err += ady
      if (err >= adx) { err -= adx; y += sy } else y += base
      buf(x) = y
      x += 1
    }
  }

  /** Decodes one channel's floor1 data from the packet. Returns the
    * final Y vector (post amplitude reconstruction, range-clamped)
    * or null when the channel is flagged unused.
    */
  private def floor1Decode(br: Br, f: Floor1, books: Array[Codebook]):
      Array[Int] = {
    if (br.bit() == 0) return null // unused channel
    val range = FloorRanges(f.multiplier - 1)
    val values = f.xList.length
    val y = new Array[Int](values)
    val rb = ilog(range - 1)
    y(0) = br.bits(rb)
    y(1) = br.bits(rb)
    var offset = 2
    var p = 0
    while (p < f.partitionClasses.length) {
      val cls = f.partitionClasses(p)
      val cdim = f.classDims(cls)
      val cbits = f.classSubclasses(cls)
      val csub = (1 << cbits) - 1
      var cval = 0
      if (cbits > 0) cval = books(f.classMasterbooks(cls)).scalar(br)
      var j = 0
      while (j < cdim) {
        val book = f.subclassBooks(cls)(cval & csub)
        cval >>>= cbits
        y(offset + j) = if (book >= 0) books(book).scalar(br) else 0
        j += 1
      }
      offset += cdim
      p += 1
    }

    // amplitude reconstruction (spec §7.2.3 step 2) — pure integer
    val finalY = new Array[Int](values)
    val step2 = new Array[Boolean](values)
    finalY(0) = math.max(0, math.min(range - 1, y(0)))
    finalY(1) = math.max(0, math.min(range - 1, y(1)))
    step2(0) = true
    step2(1) = true
    var i = 2
    while (i < values) {
      // low/high neighbors: among indices < i, the closest X below /
      // above X(i); indices 0 and 1 (X = 0 and the range top) bound
      // every interior point, so both always exist
      var lo = 0
      var hi = 1
      var j = 0
      while (j < i) {
        val xj = f.xList(j)
        if (xj < f.xList(i) && xj >= f.xList(lo)) lo = j
        if (xj > f.xList(i) && xj <= f.xList(hi)) hi = j
        j += 1
      }
      val predicted = renderPoint(f.xList(lo), finalY(lo),
        f.xList(hi), finalY(hi), f.xList(i))
      val v = y(i)
      val highroom = range - predicted
      val lowroom = predicted
      val room = 2 * math.min(highroom, lowroom)
      if (v != 0) {
        step2(lo) = true
        step2(hi) = true
        step2(i) = true
        finalY(i) =
          if (v >= room) {
            if (highroom > lowroom) v - lowroom + predicted
            else predicted - (v - highroom) - 1
          } else if ((v & 1) == 1) predicted - ((v + 1) >> 1)
          else predicted + (v >> 1)
      } else {
        step2(i) = false
        finalY(i) = predicted
      }
      if (finalY(i) < 0) finalY(i) = 0
      if (finalY(i) >= range) finalY(i) = range - 1
      i += 1
    }
    // mark unflagged points by sign (curve synthesis skips them);
    // encode as -(y+1) so 0 stays representable
    i = 0
    while (i < values) {
      if (!step2(i)) finalY(i) = -(finalY(i) + 1)
      i += 1
    }
    finalY
  }

  /** Renders the final floor curve (multiplier applied) into an
    * integer Y-per-bin vector of length n2, then maps through the
    * amplitude table on the fly during the dot product.
    */
  private def floor1Curve(f: Floor1, finalY: Array[Int], n2: Int):
      Array[Int] = {
    val out = new Array[Int](n2)
    var lx = 0
    var ly = math.max(finalY(f.sortOrder(0)), 0) * f.multiplier
    var s = 1
    while (s < f.sortOrder.length) {
      val idx = f.sortOrder(s)
      if (finalY(idx) >= 0) { // step2-flagged point
        val hx = f.xList(idx)
        val hy = finalY(idx) * f.multiplier
        if (lx < n2) renderLine(lx, ly, hx, hy, out, n2)
        lx = hx
        ly = hy
      }
      s += 1
    }
    if (lx < n2) {
      var x = lx
      while (x < n2) { out(x) = ly; x += 1 }
    }
    out
  }

  // ------------------------------------------------------------------
  // Residues
  // ------------------------------------------------------------------

  private final class Residue(
      val tpe: Int,
      val begin: Int,
      val end: Int,
      val partitionSize: Int,
      val nClass: Int,
      val classbook: Int,
      val books: Array[Array[Int]]) // (class)(pass) → book or -1

  private def readResidue(br: Br, tpe: Int, nBooks: Int,
      booksArr: Array[Codebook]): Residue = {
    val begin = br.bits(24)
    val end = br.bits(24)
    val psize = br.bits(24) + 1
    val nClass = br.bits(6) + 1
    val classbook = br.bits(8)
    if (classbook >= nBooks) bad()
    val cascade = new Array[Int](nClass)
    var i = 0
    while (i < nClass) {
      val low = br.bits(3)
      val hi = if (br.bit() == 1) br.bits(5) else 0
      cascade(i) = (hi << 3) | low
      i += 1
    }
    val books = Array.fill(nClass)(Array.fill(8)(-1))
    i = 0
    while (i < nClass) {
      var p = 0
      while (p < 8) {
        if ((cascade(i) & (1 << p)) != 0) {
          val b = br.bits(8)
          if (b >= nBooks) bad()
          // value books must be VQ-capable and divide the partition
          if (booksArr(b).lookupType == 0) bad()
          if (psize % booksArr(b).dims != 0) bad()
          books(i)(p) = b
        }
        p += 1
      }
      i += 1
    }
    // classification radix must fit the classbook's codeword group
    val cb = booksArr(classbook)
    var pow = 1L
    i = 0
    while (i < cb.dims) {
      pow *= nClass
      if (pow > Int.MaxValue) bad()
      i += 1
    }
    if (begin > end) bad()
    new Residue(tpe, begin, end, psize, nClass, classbook, books)
  }

  /** Core residue decode (types 0/1 semantics) over `vecs`, each of
    * length `size`; `doNot(j)` skips vector j. Accumulates (+=).
    */
  private def residueCore(res: Residue, books: Array[Codebook],
      vecs: Array[Array[Float]], doNot: Array[Boolean], size: Int,
      br: Br): Unit = {
    val begin = math.min(res.begin, size)
    val end = math.min(res.end, size)
    if (end <= begin) return
    val psize = res.partitionSize
    val partCount = (end - begin) / psize
    if (partCount == 0) return
    val cb = books(res.classbook)
    val cwPer = cb.dims
    val nVec = vecs.length
    val classif = Array.ofDim[Int](nVec, partCount + cwPer)
    // widest VQ vector any of this residue's books can emit (book
    // dims divide psize by header validation, but psize itself
    // bounds nothing — a crafted book may be psize-wide)
    var maxDims = 1
    locally {
      var ci = 0
      while (ci < res.books.length) {
        var p = 0
        while (p < 8) {
          val b = res.books(ci)(p)
          if (b >= 0 && books(b).dims > maxDims) maxDims = books(b).dims
          p += 1
        }
        ci += 1
      }
    }
    val tmp = new Array[Float](maxDims)
    var pass = 0
    while (pass < 8) {
      var part = 0
      while (part < partCount) {
        if (pass == 0) {
          var j = 0
          while (j < nVec) {
            if (!doNot(j)) {
              var temp = cb.scalar(br)
              var k = cwPer - 1
              while (k >= 0) {
                if (part + k < partCount + cwPer)
                  classif(j)(part + k) = temp % res.nClass
                temp /= res.nClass
                k -= 1
              }
            }
            j += 1
          }
        }
        var k = 0
        while (k < cwPer && part < partCount) {
          var j = 0
          while (j < nVec) {
            if (!doNot(j)) {
              val cls = classif(j)(part)
              val bk = res.books(cls)(pass)
              if (bk >= 0) {
                val book = books(bk)
                val off = begin + part * psize
                if (res.tpe == 0) {
                  val step = psize / book.dims
                  var l = 0
                  while (l < step) {
                    book.vq(br, tmp)
                    var d = 0
                    while (d < book.dims) {
                      vecs(j)(off + l + d * step) += tmp(d)
                      d += 1
                    }
                    l += 1
                  }
                } else {
                  var pos = 0
                  while (pos < psize) {
                    book.vq(br, tmp)
                    var d = 0
                    while (d < book.dims) {
                      vecs(j)(off + pos) += tmp(d)
                      pos += 1
                      d += 1
                    }
                  }
                }
              }
            }
            j += 1
          }
          k += 1
          part += 1
        }
      }
      pass += 1
    }
  }

  // ------------------------------------------------------------------
  // Mappings & modes
  // ------------------------------------------------------------------

  private final class Mapping(
      val submaps: Int,
      val couplingMag: Array[Int],
      val couplingAng: Array[Int],
      val mux: Array[Int],
      val submapFloor: Array[Int],
      val submapResidue: Array[Int])

  private final class Mode(
      val blockFlag: Boolean,
      val mapping: Int)

  // ------------------------------------------------------------------
  // OGG page walk
  // ------------------------------------------------------------------

  private val OggCrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        k += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  /** Reassembled logical packets plus the end-of-stream granule (for
    * final truncation) and a flag marking whether the walk ended
    * cleanly. Stops at the first CRC mismatch, foreign serial, or
    * structural break — packets before the break survive (ragged
    * tail).
    */
  private def oggPackets(b: Array[Byte]):
      (java.util.ArrayList[Array[Byte]], Long) = {
    val packets = new java.util.ArrayList[Array[Byte]]()
    var eosGranule = -1L
    var o = 0
    var serial = 0L
    var haveSerial = false
    val pending = new java.io.ByteArrayOutputStream()
    var pendingOpen = false
    var done = false
    while (!done && o + 27 <= b.length) {
      if (!(b(o) == 'O' && b(o + 1) == 'g' && b(o + 2) == 'g' &&
            b(o + 3) == 'S' && b(o + 4) == 0)) done = true
      else {
        val hdrType = b(o + 5) & 0xff
        var granule = 0L
        var i = 0
        while (i < 8) {
          granule |= (b(o + 6 + i) & 0xffL) << (8 * i)
          i += 1
        }
        var ser = 0L
        i = 0
        while (i < 4) { ser |= (b(o + 14 + i) & 0xffL) << (8 * i); i += 1 }
        val nSeg = b(o + 26) & 0xff
        if (o + 27 + nSeg > b.length) done = true
        else {
          var bodyLen = 0
          i = 0
          while (i < nSeg) { bodyLen += b(o + 27 + i) & 0xff; i += 1 }
          val pageEnd = o + 27 + nSeg + bodyLen
          if (pageEnd > b.length) done = true
          else if (haveSerial && ser != serial) done = true
          else {
            // CRC over the page with the CRC field zeroed
            var crc = 0
            i = o
            while (i < pageEnd) {
              val byt =
                if (i >= o + 22 && i < o + 26) 0 else b(i) & 0xff
              crc = (crc << 8) ^ OggCrcTable(((crc >>> 24) ^ byt) & 0xff)
              i += 1
            }
            val stored = ((b(o + 22) & 0xff)) | ((b(o + 23) & 0xff) << 8) |
              ((b(o + 24) & 0xff) << 16) | ((b(o + 25) & 0xff) << 24)
            if (crc != stored) done = true
            else {
              if (!haveSerial) { serial = ser; haveSerial = true }
              // continuation flag must match pending state; a
              // mismatch is a lost page — stop (never misalign)
              val contFlag = (hdrType & 0x01) != 0
              if (contFlag != pendingOpen) done = true
              else {
                var bo = o + 27 + nSeg
                i = 0
                while (i < nSeg && !done) {
                  val lace = b(o + 27 + i) & 0xff
                  pending.write(b, bo, lace)
                  pendingOpen = true
                  bo += lace
                  if (lace < 255) {
                    packets.add(pending.toByteArray)
                    pending.reset()
                    pendingOpen = false
                  }
                  i += 1
                }
                if ((hdrType & 0x04) != 0) {
                  eosGranule = granule
                  done = true
                }
                o = pageEnd
              }
            }
          }
        }
      }
    }
    (packets, eosGranule)
  }

  // ------------------------------------------------------------------
  // Headers
  // ------------------------------------------------------------------

  private def checkVorbisHeader(br: Br, tpe: Int): Unit = {
    if (br.bits(8) != tpe) bad()
    // "vorbis"
    val sig = "vorbis"
    var i = 0
    while (i < 6) {
      if (br.bits(8) != sig.charAt(i).toInt) bad()
      i += 1
    }
  }

  private final class Setup(
      val channels: Int,
      val rate: Int,
      val blockSizes: Array[Int], // bs0, bs1
      val books: Array[Codebook],
      val floors: Array[AnyRef], // Floor1 or null (floor0 placeholder)
      val residues: Array[Residue],
      val mappings: Array[Mapping],
      val modes: Array[Mode])

  private def readHeaders(packets: java.util.ArrayList[Array[Byte]]):
      Setup = {
    if (packets.size() < 3) bad()
    // --- identification ---
    val id = new Br(packets.get(0), 0, packets.get(0).length)
    checkVorbisHeader(id, 1)
    if (id.bitsL(32) != 0L) bad() // vorbis_version
    val channels = id.bits(8)
    val rate = id.bitsL(32)
    if (channels < 1 || channels > MaxChannels) bad()
    if (rate <= 0 || rate > Int.MaxValue) bad()
    id.bitsL(32); id.bitsL(32); id.bitsL(32) // bitrate max/nominal/min
    val bs0Exp = id.bits(4)
    val bs1Exp = id.bits(4)
    if (bs0Exp < 6 || bs0Exp > 13 || bs1Exp < bs0Exp || bs1Exp > 13) bad()
    if (id.bit() != 1) bad() // framing

    // --- comment header: type + magic only; contents skipped ---
    val cm = new Br(packets.get(1), 0, packets.get(1).length)
    checkVorbisHeader(cm, 3)

    // --- setup ---
    val st = new Br(packets.get(2), 0, packets.get(2).length)
    checkVorbisHeader(st, 5)
    val nBooks = st.bits(8) + 1
    val books = new Array[Codebook](nBooks)
    var i = 0
    while (i < nBooks) { books(i) = readCodebook(st); i += 1 }

    val timeCount = st.bits(6) + 1
    i = 0
    while (i < timeCount) { if (st.bits(16) != 0) bad(); i += 1 }

    val floorCount = st.bits(6) + 1
    val floors = new Array[AnyRef](floorCount)
    i = 0
    while (i < floorCount) {
      st.bits(16) match {
        case 0 => skipFloor0(st, nBooks); floors(i) = null
        case 1 => floors(i) = readFloor1(st, nBooks)
        case _ => bad()
      }
      i += 1
    }

    val residueCount = st.bits(6) + 1
    val residues = new Array[Residue](residueCount)
    i = 0
    while (i < residueCount) {
      val tpe = st.bits(16)
      if (tpe > 2) bad()
      residues(i) = readResidue(st, tpe, nBooks, books)
      i += 1
    }

    val mappingCount = st.bits(6) + 1
    val mappings = new Array[Mapping](mappingCount)
    i = 0
    while (i < mappingCount) {
      if (st.bits(16) != 0) bad() // mapping type 0 only
      val submaps = if (st.bit() == 1) st.bits(4) + 1 else 1
      var magArr = new Array[Int](0)
      var angArr = new Array[Int](0)
      if (st.bit() == 1) {
        val steps = st.bits(8) + 1
        magArr = new Array[Int](steps)
        angArr = new Array[Int](steps)
        var s = 0
        val chBits = ilog(channels - 1)
        while (s < steps) {
          magArr(s) = st.bits(chBits)
          angArr(s) = st.bits(chBits)
          if (magArr(s) == angArr(s) || magArr(s) >= channels ||
              angArr(s) >= channels) bad()
          s += 1
        }
      }
      if (st.bits(2) != 0) bad() // reserved
      val mux = new Array[Int](channels)
      if (submaps > 1) {
        var c = 0
        while (c < channels) {
          mux(c) = st.bits(4)
          if (mux(c) >= submaps) bad()
          c += 1
        }
      }
      val smFloor = new Array[Int](submaps)
      val smRes = new Array[Int](submaps)
      var s = 0
      while (s < submaps) {
        st.bits(8) // unused time config
        smFloor(s) = st.bits(8)
        smRes(s) = st.bits(8)
        if (smFloor(s) >= floorCount || smRes(s) >= residueCount) bad()
        // floor0-referencing streams triage whole (scaladoc)
        if (floors(smFloor(s)) == null) bad()
        s += 1
      }
      mappings(i) = new Mapping(submaps, magArr, angArr, mux, smFloor, smRes)
      i += 1
    }

    val modeCount = st.bits(6) + 1
    val modes = new Array[Mode](modeCount)
    i = 0
    while (i < modeCount) {
      val blockFlag = st.bit() == 1
      if (st.bits(16) != 0) bad() // window type
      if (st.bits(16) != 0) bad() // transform type
      val mapping = st.bits(8)
      if (mapping >= mappingCount) bad()
      modes(i) = new Mode(blockFlag, mapping)
      i += 1
    }
    if (st.bit() != 1) bad() // framing

    new Setup(channels, rate.toInt, Array(1 << bs0Exp, 1 << bs1Exp),
      books, floors, residues, mappings, modes)
  }

  // ------------------------------------------------------------------
  // Synthesis: IMDCT, window, overlap-add
  // ------------------------------------------------------------------

  /** cos(π/(2n)·m) for m in [0, 4n) — the IMDCT kernel's full
    * period, exact table lookups instead of 33M cos() calls on long
    * blocks. Cached per block size within one decode call.
    */
  private[graft] def cosTable(n: Int): Array[Double] = {
    val t = new Array[Double](4 * n)
    val step = math.Pi / (2.0 * n)
    var m = 0
    while (m < 4 * n) { t(m) = math.cos(step * m); m += 1 }
    t
  }

  /** Direct IMDCT per spec §4.3.7: out[j] = Σ_k X[k]·cos(π/(2n)·
    * (2j+1+n/2)(2k+1)), j in [0,n), k in [0,n/2). Skips zero
    * coefficients — O(nnz·n), the winning shape for the sparse
    * fixtures and real low-bitrate streams; dense spectra dispatch
    * to [[FastImdct]] instead.
    */
  private[graft] def imdctDirect(spec: Array[Float], n: Int,
      tab: Array[Double], out: Array[Double]): Unit = {
    val n2 = n / 2
    val period = 4 * n
    java.util.Arrays.fill(out, 0.0)
    var k = 0
    while (k < n2) {
      val x = spec(k)
      if (x != 0f) {
        val kk = 2 * k + 1
        var j = 0
        while (j < n) {
          val m = ((2L * j + 1 + n2) * kk) % period
          out(j) += x * tab(m.toInt)
          j += 1
        }
      }
      k += 1
    }
  }

  /** O(n log n) IMDCT for dense spectra (wild long-block Vorbis —
    * 2048/8192 windows with most bins live, where the direct form's
    * O(nnz·n) is the decoder's bottleneck). Derivation from the
    * spec formula, all steps elementary:
    *
    *   y[j] = Re Σ_k X[k]·e^{-iα(2k+1)(2j+1+n/2)},  α = π/(2n)
    *        = Re( W^{u_j} · Σ_k X[k]·e^{-iπ·k·u_j/n} ),
    *          W = e^{-iα}, u_j = 2j+1+n/2  (odd, since n/2 is even)
    *   with u_j = 2·m_j+1, m_j = j + n/4:
    *   Σ_k X[k]·e^{-iπk(2m_j+1)/n}
    *        = Σ_k (X[k]·e^{-iπk/n})·e^{-2πi·k·m_j/n}
    *        = F[m_j mod n],   F = n-point DFT of the modulated input
    *
    * so one radix-2 FFT of size n plus O(n) twiddles replaces the
    * O(n²/2) cosine accumulation. Exactness is pinned by VorbisSpec's
    * differential against the direct form across every legal block
    * size. State (twiddles, bit-reversal) is cached per block size
    * within one decode call — same lifecycle as the cosine table.
    */
  private[graft] final class FastImdct(n: Int) {
    private val n2 = n / 2
    private val log2n = 31 - Integer.numberOfLeadingZeros(n)
    // bit-reversal permutation
    private val rev: Array[Int] = {
      val r = new Array[Int](n)
      var i = 0
      while (i < n) {
        r(i) = Integer.reverse(i) >>> (32 - log2n)
        i += 1
      }
      r
    }
    // per-stage twiddles e^{-2πi·t/len} flattened: stage s has len=2^s
    private val twRe = new Array[Double](n)
    private val twIm = new Array[Double](n)
    locally {
      var half = 1
      var base = 0
      while (half < n) {
        var t = 0
        while (t < half) {
          val a = -math.Pi * t / half
          twRe(base + t) = math.cos(a)
          twIm(base + t) = math.sin(a)
          t += 1
        }
        base += half
        half <<= 1
      }
    }
    // input modulation e^{-iπk/n} and output twiddle
    // W^{2j+1+n/2} = e^{-iπ(2j+1+n/2)/(2n)}
    private val modRe = Array.tabulate(n2)(k => math.cos(-math.Pi * k / n))
    private val modIm = Array.tabulate(n2)(k => math.sin(-math.Pi * k / n))
    private val outRe = Array.tabulate(n)(j =>
      math.cos(-math.Pi * (2.0 * j + 1 + n2) / (2.0 * n)))
    private val outIm = Array.tabulate(n)(j =>
      math.sin(-math.Pi * (2.0 * j + 1 + n2) / (2.0 * n)))
    private val re = new Array[Double](n)
    private val im = new Array[Double](n)

    def run(spec: Array[Float], out: Array[Double]): Unit = {
      // modulate + bit-reverse load (upper half is zero padding)
      java.util.Arrays.fill(re, 0.0)
      java.util.Arrays.fill(im, 0.0)
      var k = 0
      while (k < n2) {
        val x = spec(k)
        if (x != 0f) {
          val p = rev(k)
          re(p) = x * modRe(k)
          im(p) = x * modIm(k)
        }
        k += 1
      }
      // iterative radix-2 DIT FFT, e^{-2πi/n} kernel
      var half = 1
      var base = 0
      while (half < n) {
        val step = half << 1
        var start = 0
        while (start < n) {
          var t = 0
          while (t < half) {
            val i0 = start + t
            val i1 = i0 + half
            val wr = twRe(base + t)
            val wi = twIm(base + t)
            val xr = re(i1) * wr - im(i1) * wi
            val xi = re(i1) * wi + im(i1) * wr
            re(i1) = re(i0) - xr
            im(i1) = im(i0) - xi
            re(i0) += xr
            im(i0) += xi
            t += 1
          }
          start += step
        }
        base += half
        half = step
      }
      // y[j] = Re( W^{u_j} · F[(j + n/4) mod n] )
      val q = n / 4
      var j = 0
      while (j < n) {
        val mj = (j + q) & (n - 1)
        out(j) = outRe(j) * re(mj) - outIm(j) * im(mj)
        j += 1
      }
    }
  }

  /** Path dispatch: the direct form wins only while the live-bin
    * count is tiny. Probe-measured (VorbisProbe, SCALE.md round 14):
    * the crossover sits at ≈ 4–5 live bins at EVERY block size —
    * direct's per-bin cost grows with n (the 4n-entry table and the
    * output buffer fall out of cache), which cancels the naive
    * nnz·n vs n·log2 n scaling argument — so the threshold is a
    * flat constant, not log-scaled. Below it, the all-zero /
    * near-silent fast path also avoids ever allocating FFT state.
    */
  private[graft] val FastImdctNnzThreshold = 4

  /** The Vorbis window slope value: sin(π/2 · sin²(π/2·(i+0.5)/n)). */
  private def slope(i: Int, n: Int): Double = {
    val s = math.sin(math.Pi / 2.0 * (i + 0.5) / n)
    math.sin(math.Pi / 2.0 * s * s)
  }

  /** Applies the lapped window in place. Long blocks with short
    * neighbors get the short slope centered at n/4 (left) / 3n/4
    * (right) and zero fill outside — spec §4.3.1 window geometry.
    */
  private def applyWindow(buf: Array[Double], n: Int, shortN: Int,
      leftShort: Boolean, rightShort: Boolean): Unit = {
    val leftN = if (leftShort) shortN / 2 else n / 2
    val leftStart = if (leftShort) n / 4 - shortN / 4 else 0
    val rightN = if (rightShort) shortN / 2 else n / 2
    val rightStart = if (rightShort) 3 * n / 4 - shortN / 4 else n / 2
    val rightEnd = rightStart + rightN
    var i = 0
    while (i < leftStart) { buf(i) = 0.0; i += 1 }
    while (i < leftStart + leftN) {
      buf(i) *= slope(i - leftStart, leftN)
      i += 1
    }
    i = rightStart
    while (i < rightEnd) {
      // descending slope: ascending slope mirrored
      buf(i) *= slope(rightEnd - 1 - i, rightN)
      i += 1
    }
    i = rightEnd
    while (i < n) { buf(i) = 0.0; i += 1 }
  }

  // ------------------------------------------------------------------
  // Top-level decode
  // ------------------------------------------------------------------

  def decode(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 58) return null
    try decodeChecked(b)
    catch { case _: Exception => null }
  }

  private def decodeChecked(b: Array[Byte]): Array[Byte] = {
    if (!(b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S'))
      return null
    val (packets, eosGranule) = oggPackets(b)
    val setup =
      try readHeaders(packets)
      catch { case _: Exception => return null }

    val ch = setup.channels
    val n2max = setup.blockSizes(1) / 2
    val pcm = new java.io.ByteArrayOutputStream()
    // per-channel overlap tail from the previous block's windowed
    // right half (length prevN/2)
    var prevTail: Array[Array[Double]] = null
    var prevN = 0
    var total = 0L
    var decodedAny = false
    val modeBits = ilog(setup.modes.length - 1)
    val tabCache = new java.util.HashMap[Integer, Array[Double]]()
    val fastCache = new java.util.HashMap[Integer, FastImdct]()
    val residueVec = Array.ofDim[Float](ch, n2max)
    val imdctBuf = new Array[Double](setup.blockSizes(1))

    var pi = 3
    var stop = false
    while (pi < packets.size() && !stop) {
      val pkt = packets.get(pi)
      try {
        val br = new Br(pkt, 0, pkt.length)
        if (br.bit() != 0) { stop = true } // non-audio packet: stop walk
        else {
          val modeIdx = if (modeBits > 0) br.bits(modeBits) else 0
          if (modeIdx >= setup.modes.length) bad()
          val mode = setup.modes(modeIdx)
          val mapping = setup.mappings(mode.mapping)
          val n = if (mode.blockFlag) setup.blockSizes(1)
            else setup.blockSizes(0)
          var leftShort = false
          var rightShort = false
          if (mode.blockFlag) {
            leftShort = br.bit() == 0
            rightShort = br.bit() == 0
          }
          val n2 = n / 2

          // window geometry is known from here on: EOP past this
          // point is a VALID truncated packet (zeros fill) — the
          // flag routes the catch below
          val floorY = new Array[Array[Int]](ch)
          var c = 0
          while (c < ch) {
            java.util.Arrays.fill(residueVec(c), 0, n2, 0f)
            c += 1
          }
          var truncated = false
          try {
            // ---- floors ----
            c = 0
            while (c < ch) {
              val f = setup.floors(mapping.submapFloor(mapping.mux(c)))
                .asInstanceOf[Floor1]
              floorY(c) = floor1Decode(br, f, setup.books)
              c += 1
            }
            // ---- coupling forces partners on ----
            val decodeFlag = new Array[Boolean](ch)
            c = 0
            while (c < ch) { decodeFlag(c) = floorY(c) != null; c += 1 }
            var s = 0
            while (s < mapping.couplingMag.length) {
              if (decodeFlag(mapping.couplingMag(s)) ||
                  decodeFlag(mapping.couplingAng(s))) {
                decodeFlag(mapping.couplingMag(s)) = true
                decodeFlag(mapping.couplingAng(s)) = true
              }
              s += 1
            }
            // ---- residues per submap ----
            s = 0
            while (s < mapping.submaps) {
              val chIdx = (0 until ch).filter(mapping.mux(_) == s).toArray
              val res = setup.residues(mapping.submapResidue(s))
              if (res.tpe == 2) {
                var any = false
                var j = 0
                while (j < chIdx.length) {
                  if (decodeFlag(chIdx(j))) any = true
                  j += 1
                }
                if (any && chIdx.length > 0) {
                  val inter = new Array[Float](n2 * chIdx.length)
                  residueCore(res, setup.books, Array(inter),
                    Array(false), n2 * chIdx.length, br)
                  var k = 0
                  while (k < n2 * chIdx.length) {
                    residueVec(chIdx(k % chIdx.length))(k / chIdx.length) =
                      inter(k)
                    k += 1
                  }
                }
              } else {
                val vecs = chIdx.map(residueVec(_))
                val doNot = chIdx.map(!decodeFlag(_))
                residueCore(res, setup.books, vecs, doNot, n2, br)
              }
              s += 1
            }
          } catch {
            case Eop => truncated = true // zeros remain — spec §4.3
          }

          // ---- inverse coupling (square polar), reverse order ----
          var s = mapping.couplingMag.length - 1
          while (s >= 0) {
            val mV = residueVec(mapping.couplingMag(s))
            val aV = residueVec(mapping.couplingAng(s))
            var i = 0
            while (i < n2) {
              val m = mV(i)
              val a = aV(i)
              if (m > 0) {
                if (a > 0) { aV(i) = m - a }
                else { aV(i) = m; mV(i) = m + a }
              } else {
                if (a > 0) { aV(i) = m + a }
                else { aV(i) = m; mV(i) = m - a }
              }
              i += 1
            }
            s -= 1
          }

          // ---- dot product, IMDCT, window ----
          val windowed = new Array[Array[Double]](ch)
          c = 0
          while (c < ch) {
            val spec = new Array[Float](n2)
            var nnz = 0
            if (floorY(c) != null) {
              val f = setup.floors(mapping.submapFloor(mapping.mux(c)))
                .asInstanceOf[Floor1]
              val curve = floor1Curve(f, floorY(c), n2)
              var i = 0
              while (i < n2) {
                val r = residueVec(c)(i)
                if (r != 0f) {
                  spec(i) = r * InverseDb(math.min(curve(i), 255))
                  if (spec(i) != 0f) nnz += 1
                }
                i += 1
              }
            }
            val buf = if (n == setup.blockSizes(1)) imdctBuf
              else new Array[Double](n)
            if (nnz > FastImdctNnzThreshold) {
              var fi = fastCache.get(Integer.valueOf(n))
              if (fi == null) {
                fi = new FastImdct(n)
                fastCache.put(n, fi)
              }
              fi.run(spec, buf)
            } else {
              var tab = tabCache.get(Integer.valueOf(n))
              if (tab == null) { tab = cosTable(n); tabCache.put(n, tab) }
              imdctDirect(spec, n, tab, buf)
            }
            applyWindow(buf, n, setup.blockSizes(0), leftShort, rightShort)
            windowed(c) = java.util.Arrays.copyOf(buf, n)
            c += 1
          }

          // ---- overlap-add: return [prev center, cur center) ----
          if (prevTail != null) {
            val outLen = prevN / 4 + n / 4
            val curStartOut = outLen - n2 // may be negative
            if (total * 2 * ch + outLen.toLong * 2 * ch > MaxPcmBytes)
              stop = true
            else {
              val frame = new Array[Byte](outLen * 2 * ch)
              var i = 0
              while (i < outLen) {
                c = 0
                while (c < ch) {
                  var v = 0.0
                  if (i < prevTail(c).length) v += prevTail(c)(i)
                  val ci = i - curStartOut
                  if (ci >= 0 && ci < n) v += windowed(c)(ci)
                  var q = math.round(v * 32767.0).toInt
                  if (q > 32767) q = 32767
                  if (q < -32768) q = -32768
                  val base = (i * ch + c) * 2
                  frame(base) = q.toByte
                  frame(base + 1) = (q >> 8).toByte
                  c += 1
                }
                i += 1
              }
              pcm.write(frame, 0, frame.length)
              total += outLen
              decodedAny = true
            }
          } else decodedAny = true // first packet: primes the lap
          if (!stop) {
            prevTail = new Array[Array[Double]](ch)
            c = 0
            while (c < ch) {
              prevTail(c) = java.util.Arrays.copyOfRange(windowed(c), n2, n)
              c += 1
            }
            prevN = n
          }
          if (truncated) { /* packet consumed; walk continues */ }
        }
      } catch {
        case Eop => () // EOP before geometry known: drop packet
        case _: Exception => stop = true // corrupt: ragged tail
      }
      pi += 1
    }

    if (!decodedAny || total == 0) {
      // headers-only or zero-output streams carry no PCM to stat
      return null
    }

    var data = pcm.toByteArray
    // final-page granule truncation (spec: the last page's granule
    // position is the stream's true sample length)
    if (eosGranule >= 0 && eosGranule < total) {
      val keep = (eosGranule * 2 * ch).toInt
      if (keep >= 0 && keep < data.length)
        data = java.util.Arrays.copyOf(data, keep)
    }

    val out = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ISO-8859-1")).putInt(36 + data.length)
      .put("WAVE".getBytes("ISO-8859-1"))
      .put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(1).putShort(ch.toShort).putInt(setup.rate)
      .putInt(setup.rate * ch * 2)
      .putShort((ch * 2).toShort).putShort(16)
      .put("data".getBytes("ISO-8859-1")).putInt(data.length)
      .put(data)
    out.array()
  }
}

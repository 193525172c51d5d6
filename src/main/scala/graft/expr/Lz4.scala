package graft.expr

/** Clean-room LZ4 decoder — the frame format (magic 0x184D2204,
  * descriptor with version/flag bits, per-block sizes, optional
  * xxHash32 block checksums, content size, content checksum), the
  * legacy frame (0x184C2102, the `.lz4 -l` / early-Hadoop shape),
  * skippable frames, and the raw block format (token nibbles,
  * 255-extension lengths, 16-bit offsets, overlap-copying matches).
  * LZ4 is the dominant light-compression packaging of columnar and
  * log shards (parquet/avro/kafka ecosystems), so a mixed dataset
  * drop needs it next to gzip/bzip2/xz/zstd in [[Decompress]].
  *
  * Integrity: the frame's own xxHash32 self-checks gate every layer —
  * the header-checksum byte validates the descriptor parse, block
  * checksums (when present) the stored bytes, the content checksum
  * the decoded output — and all are VERIFIED (a mismatch fails
  * closed). The xxh32 implementation is additionally pinned in tests
  * against real `lz4`-1.9.4 streams (whose checksums an independent
  * implementation computed), the same differential discipline as the
  * zstd/xz decoders.
  *
  * Structural strictness: version bits must be 01 and reserved bits
  * zero; block sizes respect the descriptor's maximum; sequences must
  * end exactly at the block boundary; match offsets stay inside the
  * frame (linked blocks reach across block boundaries, independent
  * blocks do not — per the B.Indep flag); a declared content size
  * must match the decoded length. Dictionary-referencing frames
  * (DictID flag) triage to NULL — a dictionary is external state,
  * the zstd precedent. Concatenated frames decode in sequence;
  * output capped at [[MaxOutBytes]]; null, never an error.
  */
private[graft] object Lz4 {

  val MaxOutBytes: Int = 64 << 20

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def le32i(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def le64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (b(o + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  def isLz4Frame(b: Array[Byte], o: Int): Boolean =
    o + 4 <= b.length &&
      (b(o) & 0xff) == 0x04 && (b(o + 1) & 0xff) == 0x22 &&
      (b(o + 2) & 0xff) == 0x4d && (b(o + 3) & 0xff) == 0x18

  def isLegacy(b: Array[Byte], o: Int): Boolean =
    o + 4 <= b.length &&
      (b(o) & 0xff) == 0x02 && (b(o + 1) & 0xff) == 0x21 &&
      (b(o + 2) & 0xff) == 0x4c && (b(o + 3) & 0xff) == 0x18

  private def isSkippable(b: Array[Byte], o: Int): Boolean =
    o + 4 <= b.length &&
      (b(o) & 0xf0) == 0x50 && (b(o + 1) & 0xff) == 0x2a &&
      (b(o + 2) & 0xff) == 0x4d && (b(o + 3) & 0xff) == 0x18

  def isLz4(b: Array[Byte]): Boolean =
    b != null && (isLz4Frame(b, 0) || isLegacy(b, 0))

  /** zstd and lz4 SHARE the skippable-frame magic family
    * (0x184D2A50–5F) — a file leading with skippables needs a peek
    * past them to pick the decoder. True when the first real frame
    * is lz4.
    */
  def leadsToLz4(b: Array[Byte]): Boolean = {
    if (b == null) return false
    var o = 0L
    while (o + 8 <= b.length && isSkippable(b, o.toInt)) {
      val next = o + 8 + le32(b, o.toInt + 4)
      if (next <= o || next > b.length) return false
      o = next
    }
    o + 4 <= b.length &&
      (isLz4Frame(b, o.toInt) || isLegacy(b, o.toInt))
  }

  // ---- xxHash32 ([XXH32], the frame format's integrity primitive)
  private val P1 = -1640531535 // 2654435761
  private val P2 = -2048144777 // 2246822519
  private val P3 = -1028477379 // 3266489917
  private val P4 = 668265263
  private val P5 = 374761393

  private[graft] def xxh32(b: Array[Byte], from: Int, len: Int,
      seed: Int): Int = {
    var i = from
    val end = from + len
    var h = 0
    if (len >= 16) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      val limit = end - 16
      while (i <= limit) {
        v1 = Integer.rotateLeft(v1 + le32i(b, i) * P2, 13) * P1
        v2 = Integer.rotateLeft(v2 + le32i(b, i + 4) * P2, 13) * P1
        v3 = Integer.rotateLeft(v3 + le32i(b, i + 8) * P2, 13) * P1
        v4 = Integer.rotateLeft(v4 + le32i(b, i + 12) * P2, 13) * P1
        i += 16
      }
      h = Integer.rotateLeft(v1, 1) + Integer.rotateLeft(v2, 7) +
        Integer.rotateLeft(v3, 12) + Integer.rotateLeft(v4, 18)
    } else h = seed + P5
    h += len
    while (i + 4 <= end) {
      h = Integer.rotateLeft(h + le32i(b, i) * P3, 17) * P4
      i += 4
    }
    while (i < end) {
      h = Integer.rotateLeft(h + (b(i) & 0xff) * P5, 11) * P1
      i += 1
    }
    h ^= h >>> 15
    h *= P2
    h ^= h >>> 13
    h *= P3
    h ^= h >>> 16
    h
  }

  /** Growing output with the bomb cap. */
  private final class Out {
    var buf = new Array[Byte](64 << 10)
    var pos = 0
    /** room for n more bytes, or false past the cap */
    def ensure(n: Int): Boolean = {
      if (n < 0 || pos.toLong + n > MaxOutBytes) return false
      if (pos + n > buf.length) {
        var cap = buf.length
        while (cap < pos + n) cap <<= 1
        buf = java.util.Arrays.copyOf(buf, math.min(cap, MaxOutBytes))
      }
      true
    }
  }

  /** One raw LZ4 block [from, until) into `out`; matches may reach
    * back to `windowStart` (the current block's start for
    * independent blocks, the frame's for linked). False on any
    * structural violation.
    */
  private def block(b: Array[Byte], from: Int, until: Int, out: Out,
      windowStart: Int): Boolean = {
    var s = from
    while (s < until) {
      val token = b(s) & 0xff
      s += 1
      // literals
      var litLen = token >>> 4
      if (litLen == 15) {
        var x = 255
        while (x == 255) {
          if (s >= until) return false
          x = b(s) & 0xff
          s += 1
          litLen += x
          if (litLen > MaxOutBytes) return false
        }
      }
      if (s + litLen > until || !out.ensure(litLen)) return false
      System.arraycopy(b, s, out.buf, out.pos, litLen)
      s += litLen
      out.pos += litLen
      if (s == until) return true // the last sequence is literal-only
      // match
      if (s + 2 > until) return false
      val offset = le16(b, s)
      s += 2
      if (offset == 0 || out.pos - offset < windowStart) return false
      var matchLen = token & 0x0f
      if (matchLen == 15) {
        var x = 255
        while (x == 255) {
          if (s >= until) return false
          x = b(s) & 0xff
          s += 1
          matchLen += x
          if (matchLen > MaxOutBytes) return false
        }
      }
      matchLen += 4
      if (!out.ensure(matchLen)) return false
      var m = out.pos - offset
      var k = 0
      while (k < matchLen) { // overlap-correct byte copy
        out.buf(out.pos) = out.buf(m)
        out.pos += 1
        m += 1
        k += 1
      }
    }
    false // ran out without a literal-only final sequence
  }

  /** Decode all concatenated frames; null unless at least one real
    * frame decoded and every byte belonged to a well-formed frame.
    */
  def decode(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 7 || b.length > MaxOutBytes) return null
    try {
      val out = new Out
      var o = 0L
      var realFrames = 0
      while (o < b.length) {
        val oi = o.toInt
        if (isSkippable(b, oi)) {
          if (oi + 8 > b.length) return null
          val next = o + 8 + le32(b, oi + 4)
          if (next <= o || next > b.length) return null
          o = next
        } else if (isLegacy(b, oi)) {
          o = legacyFrame(b, oi + 4, out)
          if (o < 0) return null
          realFrames += 1
        } else if (isLz4Frame(b, oi)) {
          o = frame(b, oi + 4, out)
          if (o < 0) return null
          realFrames += 1
        } else return null
      }
      if (realFrames == 0) return null
      java.util.Arrays.copyOf(out.buf, out.pos)
    } catch {
      case _: ArrayIndexOutOfBoundsException |
          _: NegativeArraySizeException => null
    }
  }

  /** Standard frame body after the magic; returns the next offset or
    * -1 on violation.
    */
  private def frame(b: Array[Byte], start: Int, out: Out): Long = {
    var o = start
    if (o + 3 > b.length) return -1
    val flg = b(o) & 0xff
    if ((flg >>> 6) != 1) return -1 // version must be 01
    if ((flg & 0x02) != 0) return -1 // reserved
    val indep = (flg & 0x20) != 0
    val blockCk = (flg & 0x10) != 0
    val hasSize = (flg & 0x08) != 0
    val contentCk = (flg & 0x04) != 0
    if ((flg & 0x01) != 0) return -1 // DictID: external state, triage
    val bd = b(o + 1) & 0xff
    if ((bd & 0x8f) != 0) return -1 // reserved bits
    val bmax = (bd >>> 4) & 0x07
    if (bmax < 4 || bmax > 7) return -1
    val blockMax = 1 << (8 + 2 * bmax) // 4→64KB … 7→4MB
    var descLen = 2
    var contentSize = -1L
    if (hasSize) {
      if (o + 2 + 8 > b.length) return -1
      contentSize = le64(b, o + 2)
      if (contentSize < 0 || contentSize > MaxOutBytes) return -1
      descLen += 8
    }
    if (o + descLen + 1 > b.length) return -1
    val hc = b(o + descLen) & 0xff
    if (((xxh32(b, o, descLen, 0) >>> 8) & 0xff) != hc) return -1
    o += descLen + 1
    val frameStart = out.pos
    var done = false
    while (!done) {
      if (o + 4 > b.length) return -1
      val sz = le32(b, o)
      o += 4
      if (sz == 0L) done = true
      else {
        val uncompressed = (sz & 0x80000000L) != 0
        val n = (sz & 0x7fffffffL).toInt
        if (n < 0 || n > blockMax || o + n > b.length) return -1
        if (blockCk) {
          if (o + n + 4 > b.length) return -1
          if (le32(b, o + n) != (xxh32(b, o, n, 0) & 0xffffffffL))
            return -1
        }
        val blockStart = out.pos
        if (uncompressed) {
          if (!out.ensure(n)) return -1
          System.arraycopy(b, o, out.buf, out.pos, n)
          out.pos += n
        } else if (!block(b, o, o + n, out,
            if (indep) blockStart else frameStart)) return -1
        if (out.pos - blockStart > blockMax) return -1
        o += n + (if (blockCk) 4 else 0)
      }
    }
    if (contentSize >= 0 && out.pos - frameStart != contentSize) return -1
    if (contentCk) {
      if (o + 4 > b.length) return -1
      if (le32(b, o) !=
          (xxh32(out.buf, frameStart, out.pos - frameStart, 0) &
            0xffffffffL)) return -1
      o += 4
    }
    o.toLong
  }

  /** Legacy frame: 8 MiB-window blocks, no checksums; ends at EOF or
    * the next magic.
    */
  private def legacyFrame(b: Array[Byte], start: Int, out: Out): Long = {
    var o = start
    var blocks = 0
    var done = false
    while (!done) {
      if (o + 4 > b.length) {
        if (o == b.length && blocks > 0) done = true
        else return -1
      } else if (isLz4Frame(b, o) || isLegacy(b, o) || isSkippable(b, o)) {
        if (blocks == 0) return -1
        done = true
      } else {
        val n = le32(b, o)
        if (n <= 0 || n > (8 << 20) || o + 4 + n > b.length) return -1
        val blockStart = out.pos
        if (!block(b, o + 4, o + 4 + n.toInt, out, blockStart)) return -1
        if (out.pos - blockStart > (8 << 20)) return -1
        o += 4 + n.toInt
        blocks += 1
      }
    }
    o.toLong
  }
}

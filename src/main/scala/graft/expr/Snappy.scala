package graft.expr

/** Clean-room Snappy decoder — the raw block format (varint
  * uncompressed length, 2-bit tag elements: literals with extended
  * lengths, copies with 1/2/4-byte offsets) and the framing format
  * (stream-identifier chunk, compressed/uncompressed data chunks
  * with MASKED CRC32C over the uncompressed bytes, padding and
  * skippable-reserved chunks). Snappy is the hadoop/parquet-
  * ecosystem sibling of [[Lz4]] — `.snappy` shard files and
  * hadoop-codec payloads ride the framing format, parquet pages the
  * raw one.
  *
  * Integrity: every data chunk's CRC32C is VERIFIED (JDK
  * `java.util.zip.CRC32C`, a trusted reference of the castagnoli
  * polynomial — not a recollection), the spec's mask
  * `rotr15(crc) + 0xa282ead8` applied; the raw format's declared
  * length must match the decoded output EXACTLY. The decoder is
  * additionally pinned in tests against snappy-java (the reference
  * implementation Spark itself ships for parquet), both directions.
  *
  * Structural strictness: copy offsets must be nonzero and inside
  * the produced output; literal/copy reads stay in bounds; framed
  * streams must LEAD with the identifier chunk; reserved unskippable
  * chunk types fail closed, skippable ones skip; 64 MiB caps.
  * Null, never an error.
  */
private[graft] object Snappy {

  val MaxOutBytes: Int = 64 << 20

  /** framing-format magic: the mandatory stream-identifier chunk */
  def isFramed(b: Array[Byte]): Boolean =
    b != null && b.length >= 10 &&
      (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 6 && b(2) == 0 &&
      b(3) == 0 && b(4) == 's' && b(5) == 'N' && b(6) == 'a' &&
      b(7) == 'P' && b(8) == 'p' && b(9) == 'Y'

  /** masked CRC32C per the framing spec */
  private[graft] def maskedCrc(b: Array[Byte], from: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C
    c.update(b, from, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  /** Raw snappy [from, until) → bytes, or null. */
  private[graft] def raw(b: Array[Byte], from: Int, until: Int):
      Array[Byte] = {
    if (b == null || from >= until) return null
    try {
      // varint uncompressed length
      var s = from
      var declared = 0L
      var shift = 0
      var more = true
      while (more) {
        if (s >= until || shift > 28) return null
        val x = b(s) & 0xff
        declared |= (x & 0x7fL) << shift
        shift += 7
        s += 1
        more = (x & 0x80) != 0
      }
      if (declared > MaxOutBytes) return null
      val n = declared.toInt
      val out = new Array[Byte](n)
      var pos = 0
      while (s < until) {
        val tag = b(s) & 0xff
        s += 1
        (tag & 0x03) match {
          case 0 => // literal
            var len = (tag >>> 2) + 1
            if (len > 60) {
              val extra = len - 60 // 1..4 length bytes
              if (s + extra > until) return null
              len = 0
              var i = 0
              while (i < extra) {
                len |= (b(s + i) & 0xff) << (8 * i)
                i += 1
              }
              len += 1
              s += extra
              if (len < 0) return null
            }
            if (s + len > until || pos + len > n) return null
            System.arraycopy(b, s, out, pos, len)
            s += len
            pos += len
          case tagBits =>
            var len = 0
            var offset = 0
            if (tagBits == 1) { // 1-byte offset, len 4..11
              if (s + 1 > until) return null
              len = ((tag >>> 2) & 0x07) + 4
              offset = ((tag >>> 5) << 8) | (b(s) & 0xff)
              s += 1
            } else if (tagBits == 2) { // 2-byte LE offset
              if (s + 2 > until) return null
              len = (tag >>> 2) + 1
              offset = (b(s) & 0xff) | ((b(s + 1) & 0xff) << 8)
              s += 2
            } else { // 4-byte LE offset
              if (s + 4 > until) return null
              len = (tag >>> 2) + 1
              val off = (b(s) & 0xffL) | ((b(s + 1) & 0xffL) << 8) |
                ((b(s + 2) & 0xffL) << 16) | ((b(s + 3) & 0xffL) << 24)
              if (off > Int.MaxValue) return null
              offset = off.toInt
              s += 4
            }
            if (offset <= 0 || offset > pos || pos + len > n) return null
            var m = pos - offset
            var k = 0
            while (k < len) { // overlap-correct
              out(pos) = out(m)
              pos += 1
              m += 1
              k += 1
            }
        }
      }
      if (pos != n) return null // declared length is a contract
      out
    } catch {
      case _: ArrayIndexOutOfBoundsException |
          _: NegativeArraySizeException => null
    }
  }

  /** Framing-format stream → concatenated chunk contents, or null. */
  private def framed(b: Array[Byte]): Array[Byte] = {
    if (!isFramed(b)) return null
    val out = new java.io.ByteArrayOutputStream()
    var o = 10
    while (o < b.length) {
      if (o + 4 > b.length) return null
      val kind = b(o) & 0xff
      val len = (b(o + 1) & 0xff) | ((b(o + 2) & 0xff) << 8) |
        ((b(o + 3) & 0xff) << 16)
      o += 4
      if (o + len > b.length) return null
      kind match {
        case 0x00 => // compressed data: masked crc + snappy payload
          if (len < 4) return null
          val crc = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
            ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
          val d = raw(b, o + 4, o + len)
          if (d == null || d.length > 65536) return null
          if (maskedCrc(d, 0, d.length) != crc) return null
          if (out.size() + d.length > MaxOutBytes) return null
          out.write(d)
        case 0x01 => // uncompressed data: masked crc + raw bytes
          if (len < 4) return null
          val crc = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
            ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
          if (len - 4 > 65536) return null
          if (maskedCrc(b, o + 4, len - 4) != crc) return null
          if (out.size() + (len - 4) > MaxOutBytes) return null
          out.write(b, o + 4, len - 4)
        case 0xff => // repeated stream identifier: validated
          if (len != 6 || b(o) != 's' || b(o + 1) != 'N' ||
              b(o + 2) != 'a' || b(o + 3) != 'P' || b(o + 4) != 'p' ||
              b(o + 5) != 'Y') return null
        case k if k >= 0x80 => () // skippable reserved / padding
        case _ => return null // reserved UNSKIPPABLE
      }
      o += len
    }
    out.toByteArray
  }

  /** Auto: framed streams by magic, else the raw block format. */
  def decode(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 1 || b.length > MaxOutBytes) return null
    if (isFramed(b)) framed(b) else raw(b, 0, b.length)
  }
}

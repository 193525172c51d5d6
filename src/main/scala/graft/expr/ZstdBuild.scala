package graft.expr

/** Independent store-mode Zstandard WRITER for fixture construction —
  * implemented from the frame spec alone, sharing nothing with
  * [[Zstd]] (the checksum here is Spark's own XXH64, a third-party
  * implementation of the public spec, so decode(store(·)) really is
  * a differential and not a shared-helper tautology). Raw and RLE
  * block modes only: enough to wrap any payload as a spec-valid
  * single-segment frame with a declared content size and an xxh64
  * content checksum, both of which [[Zstd]] verifies.
  */
private[graft] object ZstdBuild {

  private def xxh64(b: Array[Byte]): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 0L)

  private def blockHeader(out: java.io.ByteArrayOutputStream, last: Boolean,
      blockType: Int, size: Int): Unit = {
    val hdr = (if (last) 1 else 0) | (blockType << 1) | (size << 3)
    out.write(hdr & 0xff)
    out.write((hdr >> 8) & 0xff)
    out.write((hdr >> 16) & 0xff)
  }

  /** `data` as one single-segment frame of raw blocks: FHD declares
    * an 8-byte content size and a checksum.
    */
  def store(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte))
    out.write(0xe4) // FCS code 3 | single-segment | content checksum
    var i = 0
    while (i < 8) { out.write(((data.length.toLong >> (8 * i)) & 0xff).toInt); i += 1 }
    if (data.isEmpty) blockHeader(out, last = true, 0, 0)
    else {
      var off = 0
      while (off < data.length) {
        val n = math.min(128 << 10, data.length - off)
        blockHeader(out, last = off + n == data.length, 0, n)
        out.write(data, off, n)
        off += n
      }
    }
    val h = xxh64(data)
    i = 0
    while (i < 4) { out.write(((h >> (8 * i)) & 0xff).toInt); i += 1 }
    out.toByteArray
  }

  /** A run of `n` copies of one byte as a single RLE-block frame. */
  def rle(b: Byte, n: Int): Array[Byte] = {
    require(n > 0 && n <= (128 << 10), "one RLE block caps at 128 KiB")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte))
    out.write(0xe4)
    var i = 0
    while (i < 8) { out.write(((n.toLong >> (8 * i)) & 0xff).toInt); i += 1 }
    blockHeader(out, last = true, 1, n)
    out.write(b)
    val data = new Array[Byte](n)
    java.util.Arrays.fill(data, b)
    val h = xxh64(data)
    i = 0
    while (i < 4) { out.write(((h >> (8 * i)) & 0xff).toInt); i += 1 }
    out.toByteArray
  }
}

package graft.expr

/** Minimal deterministic bzip2 ENCODER for the oracle-gated bz2
  * queries and Bzip2Spec's roundtrips — NOT a general compressor
  * ([[FlacBuild]]/[[VorbisBuild]]'s sibling; valid output, no
  * optimality: two identical near-balanced Huffman groups, plain
  * rotation-sort BWT). Wire-validated two ways: [[Bzip2]] decodes it
  * (whose own conventions are pinned by REAL `bzip2` streams in
  * Bzip2Spec), and a development-time check ran the reference
  * `bunzip2` over this encoder's output byte-for-byte.
  *
  * `forceBlock` splits the input into multiple blocks to exercise
  * the multi-block walk + combined CRC without 100 kB fixtures.
  */
private[graft] object Bzip2Build {

  private final class Bw {
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
    def result(): Array[Byte] = {
      if (n > 0) { bytes.write(acc << (8 - n)); acc = 0; n = 0 }
      bytes.toByteArray
    }
  }

  /** RLE1: runs of 4–259 equal bytes → 4 bytes + count (mandatory —
    * a literal 4-run would decode as run+count).
    */
  private def rle1(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 8)
    var i = 0
    while (i < data.length) {
      val b = data(i)
      var run = 1
      while (i + run < data.length && data(i + run) == b && run < 259)
        run += 1
      if (run >= 4) {
        out.write(b); out.write(b); out.write(b); out.write(b)
        out.write(run - 4)
      } else {
        var r = 0
        while (r < run) { out.write(b); r += 1 }
      }
      i += run
    }
    out.toByteArray
  }

  def encode(data: Array[Byte], level: Int = 1,
      forceBlock: Int = 0): Array[Byte] = {
    require(level >= 1 && level <= 9)
    // RLE1 can expand 4-runs to 5 bytes (1.25×); the decoder bounds
    // the POST-RLE1 length at level·100000, so cap pre-RLE1 at 80%
    val blockCap =
      if (forceBlock > 0) forceBlock else level * 80000
    val bw = new Bw
    bw.put('B', 8).put('Z', 8).put('h', 8).put('0' + level, 8)
    var combined = 0
    var off = 0
    while (off < data.length) {
      val len = math.min(blockCap, data.length - off)
      val block = java.util.Arrays.copyOfRange(data, off, off + len)
      combined = encodeBlock(bw, block, combined)
      off += len
    }
    bw.put(0x177245385090L, 48)
    bw.put(combined.toLong & 0xffffffffL, 32)
    bw.result()
  }

  private def encodeBlock(bw: Bw, block: Array[Byte],
      combinedIn: Int): Int = {
    val crc = Bzip2.crcOf(block, 0, block.length)
    val s = rle1(block)
    val n = s.length

    // ---- BWT: rotation sort (fixture-sized inputs) ----
    val idx = (0 until n).toArray.map(Integer.valueOf)
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      def compare(a: Integer, b: Integer): Int = {
        var i = 0
        val ai = a.intValue()
        val bi = b.intValue()
        while (i < n) {
          val ca = s((ai + i) % n) & 0xff
          val cb = s((bi + i) % n) & 0xff
          if (ca != cb) return ca - cb
          i += 1
        }
        0
      }
    })
    var origPtr = 0
    val bwt = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val r = idx(i).intValue()
      if (r == 0) origPtr = i
      bwt(i) = s((r + n - 1) % n)
      i += 1
    }

    // ---- symbol map + MTF/RLE2 ----
    val used = new Array[Boolean](256)
    i = 0
    while (i < n) { used(bwt(i) & 0xff) = true; i += 1 }
    val seq = (0 until 256).filter(used).toArray
    val alpha = seq.length + 2
    val mtf = seq.clone()
    val syms = new java.util.ArrayList[Integer]()
    var zrun = 0L
    def flushZrun(): Unit = {
      var z = zrun
      while (z > 0) {
        if (z % 2 == 1) { syms.add(0); z = (z - 1) / 2 } // RUNA
        else { syms.add(1); z = (z - 2) / 2 } // RUNB
      }
      zrun = 0
    }
    i = 0
    while (i < n) {
      val v = bwt(i) & 0xff
      if (v == mtf(0)) zrun += 1
      else {
        flushZrun()
        var j = 1
        while (mtf(j) != v) j += 1
        syms.add(j + 1)
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = v
      }
      i += 1
    }
    flushZrun()
    syms.add(alpha - 1) // EOB

    // ---- near-balanced complete code ----
    var bl = 1
    while ((1 << bl) < alpha) bl += 1
    val nShort = (1 << bl) - alpha // symbols at length bl-1
    val lens = Array.tabulate(alpha)(k =>
      if (bl > 1 && k < nShort) bl - 1 else bl)
    // canonical codes, stable by symbol within length
    val codes = new Array[Int](alpha)
    var code = 0
    var len = lens.min
    while (len <= lens.max) {
      var k = 0
      while (k < alpha) {
        if (lens(k) == len) { codes(k) = code; code += 1 }
        k += 1
      }
      code <<= 1
      len += 1
    }

    // ---- block header ----
    bw.put(0x314159265359L, 48)
    bw.put(crc.toLong & 0xffffffffL, 32)
    bw.put(0, 1) // not randomized
    bw.put(origPtr, 24)
    var g16 = 0
    var g = 0
    while (g < 16) {
      var any = false
      var k = 0
      while (k < 16) { if (used(g * 16 + k)) any = true; k += 1 }
      if (any) g16 |= 0x8000 >>> g
      g += 1
    }
    bw.put(g16, 16)
    g = 0
    while (g < 16) {
      if ((g16 & (0x8000 >>> g)) != 0) {
        var v = 0
        var k = 0
        while (k < 16) {
          if (used(g * 16 + k)) v |= 0x8000 >>> k
          k += 1
        }
        bw.put(v, 16)
      }
      g += 1
    }
    bw.put(2, 3) // two (identical) groups
    val nSel = (syms.size + 49) / 50
    bw.put(nSel, 15)
    i = 0
    while (i < nSel) { bw.put(0, 1); i += 1 } // group 0 every time
    g = 0
    while (g < 2) {
      var cur = lens(0)
      bw.put(cur, 5)
      var k = 0
      while (k < alpha) {
        while (cur < lens(k)) { bw.put(2, 2); cur += 1 } // 1,0 = inc
        while (cur > lens(k)) { bw.put(3, 2); cur -= 1 } // 1,1 = dec
        bw.put(0, 1)
        k += 1
      }
      g += 1
    }
    i = 0
    while (i < syms.size) {
      val sy = syms.get(i).intValue()
      bw.put(codes(sy).toLong, lens(sy))
      i += 1
    }
    ((combinedIn << 1) | (combinedIn >>> 31)) ^ crc
  }
}

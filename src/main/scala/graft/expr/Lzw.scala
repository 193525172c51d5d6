package graft.expr

/** Clean-room LZW decoder for Unix `compress` (.Z) streams — magic
  * `1F 9D`, a flags byte carrying max code width (9–16) and the
  * block-mode bit (code 256 = dictionary CLEAR), then LSB-first
  * variable-width codes. Old source-dump corpora still carry
  * `.tar.Z` / `.Z` files, and this closes the last classic member of
  * the [[Decompress]] magic dispatch.
  *
  * The historically load-bearing quirk: `compress` buffers its
  * output eight codes at a time (a `width`-byte block), so on every
  * width increase AND on every CLEAR the reader must discard the
  * remainder of the current code block — the
  * `((pos-1)/(w·8)+1)·(w·8)` realign. Both real producers on this
  * box (libarchive's writer, decoded by this reader; this repo's
  * [[CompressBuild]], decoded by the real `uncompress`/gzip) pin the
  * quirk from both directions in LzwSpec.
  *
  * Structural strictness: a code beyond the next free entry, a
  * non-literal first code, or a width outside 9..16 fails closed;
  * output capped at [[Decompress.MaxOutBytes]]. Null, never an
  * error.
  */
private[graft] object Lzw {

  def isLzw(b: Array[Byte]): Boolean =
    b != null && b.length >= 3 &&
      (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x9d

  def decode(b: Array[Byte]): Array[Byte] = {
    if (!isLzw(b) || b.length > Decompress.MaxOutBytes) return null
    try {
      val maxbits = b(2) & 0x1f
      if (maxbits < 9 || maxbits > 16) return null
      if ((b(2) & 0x60) != 0) return null // reserved flag bits
      val block = (b(2) & 0x80) != 0
      val maxEntries = 1 << maxbits
      val prefix = new Array[Int](maxEntries)
      val suffix = new Array[Byte](maxEntries)
      val stack = new Array[Byte](maxEntries)
      val out = new java.io.ByteArrayOutputStream(b.length * 3)
      val totalBits = (b.length - 3).toLong * 8
      var posbits = 0L
      var runStart = 0L // where the current width run began: the
      // eight-code output groups restart at every width change/CLEAR
      var width = 9
      def maxcode(w: Int): Int =
        if (w == maxbits) 1 << w else (1 << w) - 1
      var free = if (block) 257 else 256
      var oldcode = -1
      var finchar = 0
      def realign(): Unit = {
        val blockBits = width << 3
        val rel = posbits - runStart
        if (rel % blockBits != 0)
          posbits = runStart + ((rel - 1) / blockBits + 1) * blockBits
        runStart = posbits
      }
      var done = false
      while (!done) {
        if (free > maxcode(width) && width < maxbits) {
          realign()
          width += 1
        }
        if (posbits + width > totalBits) done = true
        else {
          // LSB-first read of `width` bits at posbits
          val byteOff = 3 + (posbits >> 3).toInt
          val bitOff = (posbits & 7).toInt
          var v = (b(byteOff) & 0xff) >>> bitOff
          var got = 8 - bitOff
          var k = 1
          while (got < width) {
            v |= (b(byteOff + k) & 0xff) << got
            got += 8
            k += 1
          }
          val code = v & ((1 << width) - 1)
          posbits += width
          if (block && code == 256) {
            realign()
            width = 9
            free = 257
            oldcode = -1
          } else if (oldcode == -1) {
            if (code >= 256) return null // first code must be a literal
            out.write(code)
            finchar = code
            oldcode = code
          } else {
            val incode = code
            var c = code
            var sp = 0
            if (c >= free) {
              if (c != free) return null // beyond the dictionary
              stack(sp) = finchar.toByte
              sp += 1
              c = oldcode
            }
            while (c >= 256) {
              stack(sp) = suffix(c)
              sp += 1
              c = prefix(c)
            }
            finchar = c
            stack(sp) = c.toByte
            sp += 1
            if (out.size() + sp > Decompress.MaxOutBytes) return null
            while (sp > 0) { sp -= 1; out.write(stack(sp)) }
            if (free < maxEntries) {
              prefix(free) = oldcode
              suffix(free) = finchar.toByte
              free += 1
            }
            oldcode = incode
          }
        }
      }
      if (out.size() == 0) null else out.toByteArray
    } catch {
      case _: ArrayIndexOutOfBoundsException |
          _: NegativeArraySizeException => null
    }
  }
}

/** Independent `compress` WRITER for fixture construction — its own
  * LZW dictionary, LSB-first bit packer and the eight-code block
  * padding quirk (realign on width growth and CLEAR); nothing shared
  * with [[Lzw]]'s reading direction, and its output is ALSO decoded
  * by the real `uncompress` in LzwSpec.
  */
private[graft] object CompressBuild {

  /** `clearEvery` > 0 force-emits periodic CLEAR codes to exercise
    * the reset path (real compress emits them on ratio decay).
    */
  def compress(data: Array[Byte], maxbits: Int = 16,
      clearEvery: Int = 0): Array[Byte] = {
    require(maxbits >= 9 && maxbits <= 16)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x1f); out.write(0x9d)
    out.write(0x80 | maxbits) // block mode
    var bitBuf = 0L
    var bitCnt = 0
    var posbits = 0L
    var runStart = 0L
    var width = 9
    def maxcode(w: Int): Int =
      if (w == maxbits) 1 << w else (1 << w) - 1
    def flushBits(): Unit =
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      posbits += width
      flushBits()
    }
    // pad to the current run's eight-code boundary; groups restart
    // at every width change / CLEAR (the compress output-buffer quirk)
    def realign(): Unit = {
      val blockBits = width << 3
      val rel = posbits - runStart
      val target =
        if (rel % blockBits == 0) posbits
        else runStart + ((rel - 1) / blockBits + 1) * blockBits
      while (posbits < target) {
        bitCnt += 1 // zero padding
        posbits += 1
      }
      flushBits()
      runStart = posbits
    }
    val dict = new java.util.HashMap[Long, Integer]()
    var free = 257
    var cur = -1
    var emitted = 0
    def key(p: Int, c: Int): Long = (p.toLong << 8) | c
    // write at the CURRENT width, then grow — the late-change rule:
    // the first wider code is the one after free crosses maxcode,
    // matching the decoder's check-before-read with its one-entry lag
    def emit(code: Int): Unit = {
      put(code)
      if (free > maxcode(width) && width < maxbits) {
        realign()
        width += 1
      }
    }
    var i = 0
    while (i < data.length) {
      val c = data(i) & 0xff
      if (cur < 0) cur = c
      else {
        val k = key(cur, c)
        val hit = dict.get(k)
        if (hit != null) cur = hit.intValue()
        else {
          emit(cur)
          emitted += 1
          if (free < (1 << maxbits)) {
            dict.put(k, Integer.valueOf(free))
            free += 1
          }
          cur = c
          if (clearEvery > 0 && emitted % clearEvery == 0) {
            emit(cur) // close the open run
            emit(256) // CLEAR
            realign()
            width = 9
            free = 257
            dict.clear()
            cur = -1
          }
        }
      }
      i += 1
    }
    if (cur >= 0) emit(cur)
    if (bitCnt > 0) { out.write((bitBuf & 0xff).toInt) }
    out.toByteArray
  }
}

package graft.expr

/** Deterministic animated-GIF fixture encoder for the oracle-gated
  * GIF queries and specs — NOT a general encoder. Global palette is
  * the 256-entry GRAY ramp (entry i = (i,i,i)), frames are
  * full-canvas index rasters, and the LZW stream uses the public
  * "uncompressed GIF" technique: minimum code size 8, an explicit
  * CLEAR re-emitted every 128 literal root codes so the decoder's
  * table never reaches 512 entries and every code stays 9 bits.
  * Planted index k therefore decodes to EXACT gray value (k,k,k)
  * through any conforming LZW decoder — which is what lets a DuckDB
  * oracle replay per-frame pixel statistics from the construction
  * formula, and what makes the round trip through the JDK's
  * independent ImageIO reader a real cross-implementation check.
  */
private[graft] object GifBuild {

  /** One frame: an index raster of `fw`×`fh` drawn at (x, y);
    * `disposal` per GIF89a (1 doNotDispose, 2 restoreToBackground,
    * 3 restoreToPrevious); `transparent` ≥ 0 marks that index
    * transparent (those pixels leave the canvas untouched).
    */
  final case class Frame(x: Int, y: Int, fw: Int, fh: Int,
      indices: Array[Byte], disposal: Int = 1, transparent: Int = -1,
      interlaced: Boolean = false)

  /** Full-canvas animated GIF: one byte per pixel per frame, indices
    * into the gray ramp. Disposal = doNotDispose (frames accumulate;
    * full-canvas frames therefore each replace the composite).
    */
  def animated(w: Int, h: Int, frames: Seq[Array[Byte]],
      delayCs: Int = 4): Array[Byte] =
    animatedEx(w, h, frames.map(f => Frame(0, 0, w, h, f)), delayCs)

  /** General form: partial frames at offsets with explicit disposal
    * and transparency — the inter-frame shapes the compositing spec
    * exercises.
    */
  def animatedEx(w: Int, h: Int, frames: Seq[Frame],
      delayCs: Int = 4): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    out.write("GIF89a".getBytes("ISO-8859-1"))
    u16(w); u16(h)
    u8(0xF7) // global color table, 8-bit resolution, 256 entries
    u8(0)    // background color index
    u8(0)    // pixel aspect ratio
    var i = 0
    while (i < 256) { u8(i); u8(i); u8(i); i += 1 }
    frames.foreach { f =>
      require(f.indices.length == f.fw * f.fh,
        s"frame must be ${f.fw} x ${f.fh} indices")
      u8(0x21); u8(0xF9); u8(4) // graphic control extension
      u8(((f.disposal & 0x7) << 2) | (if (f.transparent >= 0) 1 else 0))
      u16(delayCs)
      u8(if (f.transparent >= 0) f.transparent else 0)
      u8(0)
      u8(0x2C) // image descriptor
      u16(f.x); u16(f.y); u16(f.fw); u16(f.fh)
      u8(if (f.interlaced) 0x40 else 0)
      u8(8)    // LZW minimum code size
      writeLzw(out,
        if (f.interlaced) interlaceRows(f.indices, f.fw, f.fh)
        else f.indices)
      u8(0)    // data sub-block terminator
    }
    u8(0x3B) // trailer
    out.toByteArray
  }

  /** Source rows reordered into GIF interlace pass order (starts
    * 0/4/2/1, steps 8/8/4/2) — what an interlaced image's data
    * stream carries.
    */
  private def interlaceRows(d: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](d.length)
    val starts = Array(0, 4, 2, 1); val steps = Array(8, 8, 4, 2)
    var dst = 0
    for (p <- 0 until 4) {
      var y = starts(p)
      while (y < h) {
        System.arraycopy(d, y * w, out, dst * w, w)
        dst += 1
        y += steps(p)
      }
    }
    out
  }

  /** All-literal LZW: CLEAR, root codes with CLEAR every 128, EOI;
    * 9-bit codes packed LSB-first, framed into ≤255-byte sub-blocks.
    */
  private def writeLzw(out: java.io.ByteArrayOutputStream,
      data: Array[Byte]): Unit = {
    val bytes = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var bits = 0
    def code(c: Int): Unit = {
      acc |= (c.toLong << bits); bits += 9
      while (bits >= 8) {
        bytes.write((acc & 0xFF).toInt); acc >>= 8; bits -= 8
      }
    }
    code(256) // initial CLEAR
    var n = 0
    var i = 0
    while (i < data.length) {
      if (n == 128) { code(256); n = 0 }
      code(data(i) & 0xFF)
      n += 1
      i += 1
    }
    code(257) // end of information
    if (bits > 0) bytes.write((acc & 0xFF).toInt)
    val arr = bytes.toByteArray
    var off = 0
    while (off < arr.length) {
      val len = math.min(255, arr.length - off)
      out.write(len)
      out.write(arr, off, len)
      off += len
    }
  }
}

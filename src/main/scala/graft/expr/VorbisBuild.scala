package graft.expr

/** Deterministic OGG/Vorbis fixture encoder for the oracle-gated
  * Vorbis queries and VorbisSpec — NOT a general encoder
  * ([[FlacBuild]]'s OGG sibling). Every piece is implemented
  * INDEPENDENTLY of [[VorbisDecode]]: its own LSB-first bit writer
  * against the decoder's reader, a BITWISE OGG CRC against the
  * decoder's table-driven form, and literal field-by-field header
  * writes against the decoder's parser — so decode(encode(...)) is
  * a genuine differential over the container + header + packet
  * machinery, not a shared-helper tautology.
  *
  * The embedded setup is the MINIMAL complete Vorbis setup that
  * exercises the full audio path: three codebooks (a 1-bit scalar
  * classbook, a 2-dim lookup-type-2 VQ book for residue values, a
  * scalar book for floor1 posts), one floor1 (one partition, one
  * class of two posts at X = 32/64, multiplier 2, rangebits 7), one
  * type-2 residue (begin 0, end 32, partition size 16, two
  * classifications — class 0 silent, class 1 carrying the VQ book
  * on pass 0), one mapping (single submap; coupling step 0↔1 when
  * stereo), and two modes (0 short, 1 long) over block sizes
  * 256/512. Every field is written from the spec's wire layout.
  *
  * Two fixture families:
  *  - [[silence]] — K audio packets, every channel's floor flagged
  *    unused. A conforming decoder MUST render exact IEEE zeros
  *    (floor-unused channels render zero regardless of any decoder
  *    table), so the PCM, the sample-count arithmetic
  *    ((prevN + curN)/4 per transition, nothing from the first
  *    packet), channel count and rate all replay relationally in
  *    the oracle. `mixedBlocks` alternates short/long modes to pin
  *    the long/short window GEOMETRY (counts change to 192 per
  *    transition) without touching float arithmetic.
  *  - [[pattern]] — mono, short blocks only; packet 2w+1 carries a
  *    nonzero floor + class-1 residue partitions when window w is
  *    "loud". A loud packet's output support is confined to output
  *    segments 2w and 2w+1 (its own return region plus its overlap
  *    tail — one packet each way), i.e. entirely inside envelope
  *    window w, so [[AudioEnvSig]]'s gradient signs replay exactly
  *    (the q185 lemma shape, here with the lap algebra in place of
  *    the synthesis-FIFO bound).
  */
private[graft] object VorbisBuild {

  /** LSB-first bit writer (Vorbis's packing order — the opposite of
    * [[FlacBuild]]'s MSB-first writer).
    */
  final class Bw {
    private val bytes = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def put(v: Long, bits: Int): this.type = {
      var i = 0
      while (i < bits) {
        acc |= (((v >>> i) & 1L).toInt) << n
        n += 1
        if (n == 8) { bytes.write(acc); acc = 0; n = 0 }
        i += 1
      }
      this
    }
    /** A Huffman codeword: root bit first (the tree-walk order). */
    def putCode(code: Int, len: Int): this.type = {
      var j = len - 1
      while (j >= 0) { put((code >>> j) & 1L, 1); j -= 1 }
      this
    }
    def result(): Array[Byte] = {
      if (n > 0) { bytes.write(acc); acc = 0; n = 0 }
      bytes.toByteArray
    }
  }

  /** OGG CRC-32 (poly 0x04c11db7, direct, init/xorout 0) — bitwise
    * form, independent of the decoder's table.
    */
  private def oggCrc(b: Array[Byte]): Int = {
    var crc = 0
    var i = 0
    while (i < b.length) {
      crc ^= (b(i) & 0xff) << 24
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04c11db7
          else crc << 1
        k += 1
      }
      i += 1
    }
    crc
  }

  /** One OGG page around whole packets (no cross-page spans — the
    * fixtures keep packets small; [[VorbisDecode]]'s span handling
    * is exercised separately in VorbisSpec with a hand-split page
    * pair).
    */
  def page(serial: Int, seq: Int, granule: Long, flags: Int,
      packets: Seq[Array[Byte]]): Array[Byte] = {
    val lacing = new java.io.ByteArrayOutputStream()
    val body = new java.io.ByteArrayOutputStream()
    packets.foreach { p =>
      var rem = p.length
      while (rem >= 255) { lacing.write(255); rem -= 255 }
      lacing.write(rem) // includes the 0 terminator for 255-multiples
      body.write(p, 0, p.length)
    }
    val lace = lacing.toByteArray
    require(lace.length <= 255, "fixture page overflow")
    val page = java.nio.ByteBuffer
      .allocate(27 + lace.length + body.size())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    page.put("OggS".getBytes("ISO-8859-1")).put(0.toByte)
      .put(flags.toByte).putLong(granule).putInt(serial).putInt(seq)
      .putInt(0) // CRC backfilled below
      .put(lace.length.toByte).put(lace).put(body.toByteArray)
    val arr = page.array()
    val crc = oggCrc(arr)
    arr(22) = crc.toByte
    arr(23) = (crc >> 8).toByte
    arr(24) = (crc >> 16).toByte
    arr(25) = (crc >> 24).toByte
    arr
  }

  private def vorbisMagic(bw: Bw, tpe: Int): Unit = {
    bw.put(tpe, 8)
    "vorbis".foreach(c => bw.put(c.toLong, 8))
  }

  /** Block-size exponents: 8 (256) and 9 (512). */
  val Bs0Exp = 8
  val Bs1Exp = 9
  val ShortN: Int = 1 << Bs0Exp
  val LongN: Int = 1 << Bs1Exp

  def idHeader(ch: Int, rate: Int, bs0Exp: Int = Bs0Exp,
      bs1Exp: Int = Bs1Exp): Array[Byte] = {
    val bw = new Bw
    vorbisMagic(bw, 1)
    bw.put(0, 32) // version
    bw.put(ch, 8)
    bw.put(rate.toLong, 32)
    bw.put(0, 32).put(0, 32).put(0, 32) // bitrates
    bw.put(bs0Exp, 4).put(bs1Exp, 4)
    bw.put(1, 1) // framing
    bw.result()
  }

  def commentHeader(): Array[Byte] = {
    val bw = new Bw
    vorbisMagic(bw, 3)
    val vendor = "graft-fixture"
    bw.put(vendor.length, 32)
    vendor.foreach(c => bw.put(c.toLong, 8))
    bw.put(0, 32) // user comments
    bw.put(1, 1) // framing
    bw.result()
  }

  /** float32_pack for the two VQ constants (sign | exp+788 | mant). */
  private def f32(sign: Boolean, mant: Int, exp: Int): Long = {
    var v = (mant.toLong & 0x1fffffL) | ((exp + 788).toLong << 21)
    if (sign) v |= 0x80000000L
    v
  }

  /** The VQ book's decoded vectors, for spec-side expectations:
    * entry e → (Mult(2e)−2, Mult(2e+1)−2).
    */
  val VqMults: Array[Int] = Array(0, 3, 3, 0, 1, 2, 3, 3)

  def setupHeader(ch: Int, resEnd: Int = 32): Array[Byte] = {
    val bw = new Bw
    vorbisMagic(bw, 5)
    bw.put(3 - 1, 8) // three codebooks

    // book 0: classbook — dims 1, entries 2, lengths 1/1, no lookup
    bw.put(0x564342, 24).put(1, 16).put(2, 24)
    bw.put(0, 1) // unordered
    bw.put(0, 1) // not sparse
    bw.put(0, 5).put(0, 5) // lengths 1, 1 (written as len-1)
    bw.put(0, 4) // lookup 0

    // book 1: residue VQ — dims 2, entries 4, lengths 2×4, lookup 2
    bw.put(0x564342, 24).put(2, 16).put(4, 24)
    bw.put(0, 1).put(0, 1)
    var i = 0
    while (i < 4) { bw.put(1, 5); i += 1 } // lengths 2 (len-1 = 1)
    bw.put(2, 4) // lookup type 2
    bw.put(f32(sign = true, mant = 2, exp = 0), 32) // minimum −2.0
    bw.put(f32(sign = false, mant = 1, exp = 0), 32) // delta 1.0
    bw.put(2 - 1, 4) // value bits 2
    bw.put(0, 1) // sequence_p
    VqMults.foreach(m => bw.put(m.toLong, 2))

    // book 2: floor posts — dims 1, entries 4, lengths 2×4, lookup 0
    bw.put(0x564342, 24).put(1, 16).put(4, 24)
    bw.put(0, 1).put(0, 1)
    i = 0
    while (i < 4) { bw.put(1, 5); i += 1 }
    bw.put(0, 4)

    // times
    bw.put(0, 6) // count − 1
    bw.put(0, 16)

    // one floor1: 1 partition, class 0 (2 posts), mult 2, range 7 bits
    bw.put(0, 6) // floor count − 1
    bw.put(1, 16) // type 1
    bw.put(1, 5) // partitions
    bw.put(0, 4) // partition 0 → class 0
    bw.put(2 - 1, 3) // class dims 2
    bw.put(0, 2) // subclass bits 0
    bw.put(2 + 1, 8) // subclass book: book 2 (stored +1)
    bw.put(2 - 1, 2) // multiplier 2
    bw.put(7, 4) // rangebits
    bw.put(32, 7).put(64, 7) // the two posts

    // one residue: type 2, [0,resEnd), psize 16, 2 classes, classbook 0
    bw.put(0, 6) // residue count − 1
    bw.put(2, 16) // type
    bw.put(0, 24) // begin
    bw.put(resEnd, 24) // end
    bw.put(16 - 1, 24) // partition size
    bw.put(2 - 1, 6) // classifications
    bw.put(0, 8) // classbook
    bw.put(0, 3).put(0, 1) // class 0 cascade: nothing
    bw.put(1, 3).put(0, 1) // class 1 cascade: pass 0 only
    bw.put(1, 8) // class 1 pass-0 book: book 1

    // one mapping: single submap; couple 0↔1 when stereo
    bw.put(0, 6) // mapping count − 1
    bw.put(0, 16) // type 0
    bw.put(0, 1) // submaps flag (1 submap)
    if (ch == 2) {
      bw.put(1, 1) // coupling flag
      bw.put(0, 8) // steps − 1
      bw.put(0, 1).put(1, 1) // magnitude 0, angle 1 (ilog(1) = 1 bit)
    } else bw.put(0, 1)
    bw.put(0, 2) // reserved
    bw.put(0, 8) // time config (unused)
    bw.put(0, 8) // floor 0
    bw.put(0, 8) // residue 0

    // two modes: 0 short, 1 long (same mapping)
    bw.put(2 - 1, 6)
    bw.put(0, 1).put(0, 16).put(0, 16).put(0, 8)
    bw.put(1, 1).put(0, 16).put(0, 16).put(0, 8)

    bw.put(1, 1) // framing
    bw.result()
  }

  /** One silent audio packet: floor flagged unused on every channel
    * (the residue is then skipped entirely per spec — no more bits).
    */
  def silentPacket(ch: Int, longBlock: Boolean,
      prevLong: Boolean, nextLong: Boolean): Array[Byte] = {
    val bw = new Bw
    bw.put(0, 1) // audio packet
    bw.put(if (longBlock) 1 else 0, 1) // mode (2 modes → 1 bit)
    if (longBlock) {
      bw.put(if (prevLong) 1 else 0, 1)
      bw.put(if (nextLong) 1 else 0, 1)
    }
    var c = 0
    while (c < ch) { bw.put(0, 1); c += 1 } // floor unused
    bw.result()
  }

  /** One loud mono short-block packet: floor at posts y0/y1 (raw
    * 7-bit, near the top of range 128 so the rendered curve is loud
    * enough to survive int16 quantization), both residue partitions
    * class 1, VQ entries from a deterministic LCG over `seed`.
    */
  def loudPacket(seed: Long, y0: Int = 127, y1: Int = 127): Array[Byte] = {
    val bw = new Bw
    bw.put(0, 1) // audio
    bw.put(0, 1) // mode 0 (short)
    bw.put(1, 1) // floor nonzero
    bw.put(y0, 7).put(y1, 7)
    // two posts via book 2 (2-bit codes, entry == code)
    var s = seed * 6364136223846793005L + 1442695040888963407L
    bw.putCode(((s >>> 33) & 3).toInt, 2)
    s = s * 6364136223846793005L + 1442695040888963407L
    bw.putCode(((s >>> 33) & 3).toInt, 2)
    // residue: 2 partitions, both class 1, 8 VQ entries each
    var part = 0
    while (part < 2) {
      bw.putCode(1, 1) // classword: class 1
      var l = 0
      while (l < 8) {
        s = s * 6364136223846793005L + 1442695040888963407L
        bw.putCode(((s >>> 33) & 3).toInt, 2)
        l += 1
      }
      part += 1
    }
    bw.result()
  }

  /** One loud packet with an arbitrary partition count — the dense
    * arm for the wild-file IMDCT shape (every residue partition
    * class 1). `nParts`·16 must equal the setup's `resEnd`.
    */
  def loudPacketWide(nParts: Int, seed: Long): Array[Byte] = {
    val bw = new Bw
    bw.put(0, 1).put(0, 1) // audio, mode 0
    bw.put(1, 1).put(127, 7).put(127, 7)
    var s = seed * 6364136223846793005L + 1442695040888963407L
    bw.putCode(((s >>> 33) & 3).toInt, 2)
    s = s * 6364136223846793005L + 1442695040888963407L
    bw.putCode(((s >>> 33) & 3).toInt, 2)
    var part = 0
    while (part < nParts) {
      bw.putCode(1, 1)
      var l = 0
      while (l < 8) {
        s = s * 6364136223846793005L + 1442695040888963407L
        bw.putCode(((s >>> 33) & 3).toInt, 2)
        l += 1
      }
      part += 1
    }
    bw.result()
  }

  /** K all-loud packets at one block size 2^bsExp with the residue
    * covering the whole spectrum — the dense wild-file shape the
    * IMDCT dispatch probe measures. Mono.
    */
  def dense(rate: Int, k: Int, bsExp: Int, seed: Long): Array[Byte] = {
    val n2 = 1 << (bsExp - 1)
    val audio = (0 until k).map(i => loudPacketWide(n2 / 16, seed + i))
    val out = new java.io.ByteArrayOutputStream()
    out.write(page(0x67726166, 0, 0, 0x02,
      Seq(idHeader(1, rate, bsExp, bsExp))))
    out.write(page(0x67726166, 1, 0, 0,
      Seq(commentHeader(), setupHeader(1, resEnd = n2))))
    // each transition returns (n+n)/4 = n2 samples
    out.write(page(0x67726166, 2, (k - 1).toLong * n2, 0x04, audio))
    out.toByteArray
  }

  private def assemble(ch: Int, rate: Int, audio: Seq[Array[Byte]],
      granule: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(page(0x67726166, 0, 0, 0x02, Seq(idHeader(ch, rate))))
    out.write(page(0x67726166, 1, 0, 0,
      Seq(commentHeader(), setupHeader(ch))))
    out.write(page(0x67726166, 2, granule, 0x04, audio))
    out.toByteArray
  }

  /** K silent packets; `mixedBlocks` alternates short/long starting
    * short. Decoded output: exact zeros,
    * Σ_{i≥1} (n(i−1)+n(i))/4 samples per channel.
    */
  def silence(ch: Int, rate: Int, k: Int,
      mixedBlocks: Boolean): Array[Byte] = {
    require(k >= 1 && k <= 250, "fixture packet count")
    def isLong(i: Int) = mixedBlocks && i % 2 == 1
    val audio = (0 until k).map { i =>
      silentPacket(ch, isLong(i),
        prevLong = i > 0 && isLong(i - 1),
        nextLong = i + 1 < k && isLong(i + 1))
    }
    var total = 0L
    var i = 1
    while (i < k) {
      val p = if (isLong(i - 1)) LongN else ShortN
      val n = if (isLong(i)) LongN else ShortN
      total += (p + n) / 4
      i += 1
    }
    assemble(ch, rate, audio, total)
  }

  /** Samples per channel [[silence]] produces — the oracle's count
    * arithmetic, kept next to the construction.
    */
  def silenceSamples(k: Int, mixedBlocks: Boolean): Long = {
    var total = 0L
    var i = 1
    while (i < k) {
      val p = if (mixedBlocks && (i - 1) % 2 == 1) LongN else ShortN
      val n = if (mixedBlocks && i % 2 == 1) LongN else ShortN
      total += (p + n) / 4
      i += 1
    }
    total
  }

  /** Mono short-block stream: `loudWindow(w)` makes packet 2w+1
    * loud; all other packets silent. Packet count = 2·windows + 1 so
    * every window w owns output segments 2w and 2w+1 exactly.
    */
  def pattern(rate: Int, windows: Int, loudWindow: Int => Boolean,
      seed: Long): Array[Byte] = {
    val k = 2 * windows + 1
    require(k <= 250, "fixture packet count")
    val audio = (0 until k).map { i =>
      if (i % 2 == 1 && loudWindow((i - 1) / 2))
        loudPacket(seed * 131 + i)
      else silentPacket(1, longBlock = false, prevLong = false,
        nextLong = false)
    }
    assemble(1, rate, audio, (k - 1).toLong * (ShortN / 2))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential suite for the clean-room Zstandard decoder: every
  * fixture is REAL `zstd`-tool output embedded as hex — the
  * strongest wire pin available (FSE spread/state conventions,
  * predefined distributions, Huffman weight coding, sequence
  * bitstream order, repcode rules, block framing, xxh64 checksum
  * were all produced by the reference encoder, none by this repo's
  * code). Contents span levels 1–19, compressible/incompressible,
  * multi-block >128 KiB, checksum on/off.
  */
class ZstdSpec extends AnyFunSuite {

  import graft.expr.Zstd
  import ZstdSpecFixtures._

  /** Mirrors the fixture-generation script's LCG. */
  private def lcgBytes(n: Int, seed: Long): Array[Byte] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) & 0xff).toByte
    }
  }

  /** Mirrors the fixture-generation script's word picker. */
  private def words(n: Int, seed: Long): Array[Byte] = {
    val vocab = Array("the", "of", "data", "stream", "zstd", "frame",
      "block", "entropy", "code", "huffman", "sequence", "offset",
      "match", "literal", "table", "state")
    var s = seed
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      if (i > 0) sb.append(' ')
      sb.append(vocab(((s >>> 33) & 15).toInt))
      i += 1
    }
    sb.toString.getBytes("UTF-8")
  }

  private def rep(s: String, n: Int): Array[Byte] = {
    val u = s.getBytes("UTF-8")
    val out = new Array[Byte](u.length * n)
    var i = 0
    while (i < n) { System.arraycopy(u, 0, out, i * u.length, u.length); i += 1 }
    out
  }

  test("text at -9, no checksum") {
    assert(new String(Zstd.decode(Z1), "UTF-8") ==
      "hello zstd world, hello again and again")
  }

  test("text at -9 with xxh64 content checksum") {
    assert(new String(Zstd.decode(Z2), "UTF-8") ==
      "hello zstd world, hello again and again")
  }

  test("60 kB five-byte period at -19 (long matches, repcodes)") {
    assert(java.util.Arrays.equals(Zstd.decode(Z3), rep("abcde", 12000)))
  }

  test("4 kB incompressible (raw literals path)") {
    assert(java.util.Arrays.equals(Zstd.decode(Z4), lcgBytes(4096, 42)))
  }

  test("18 kB repeated sentence at -1") {
    assert(java.util.Arrays.equals(Zstd.decode(Z5),
      rep("The quick brown fox jumps over the lazy dog. ", 400)))
  }

  test("empty input") {
    val d = Zstd.decode(Z6)
    assert(d != null && d.length == 0)
  }

  test("5000 zero bytes (RLE shapes)") {
    assert(java.util.Arrays.equals(Zstd.decode(Z7), new Array[Byte](5000)))
  }

  test("63 kB three-word period at -19") {
    val expect = ("word " + "tokenize this corpus " * 3000).getBytes("UTF-8")
    assert(java.util.Arrays.equals(Zstd.decode(Z8), expect))
  }

  test("76.8 kB full byte ramp at -12") {
    val unit = Array.tabulate[Byte](256)(_.toByte)
    val expect = new Array[Byte](256 * 300)
    (0 until 300).foreach(i => System.arraycopy(unit, 0, expect, i * 256, 256))
    assert(java.util.Arrays.equals(Zstd.decode(Z9), expect))
  }

  test("342 kB lorem at -6 (multi-block, window across blocks)") {
    assert(java.util.Arrays.equals(Zstd.decode(ZA),
      rep("Lorem ipsum dolor sit amet, consectetur adipiscing elit. ", 6000)))
  }

  test("140 kB incompressible at -3 (multi-block raw)") {
    assert(java.util.Arrays.equals(Zstd.decode(ZB), lcgBytes(140000, 7)))
  }

  test("25 kB word soup at -9 (4-stream Huffman + in-stream FSE tables)") {
    assert(java.util.Arrays.equals(Zstd.decode(ZC), words(4000, 5)))
  }

  test("371 kB word soup at -17 (multi-block compressed, repeat modes)") {
    assert(java.util.Arrays.equals(Zstd.decode(ZD), words(60000, 11)))
  }

  test("ZstdBuild store-mode writer round-trips (content size + checksum gates)") {
    import graft.expr.ZstdBuild
    for (data <- Seq(Array.emptyByteArray, "tiny".getBytes,
        lcgBytes(300000, 13), words(2000, 3))) {
      assert(java.util.Arrays.equals(Zstd.decode(ZstdBuild.store(data)), data))
    }
    assert(java.util.Arrays.equals(Zstd.decode(ZstdBuild.rle(0x41, 7000)),
      Array.fill[Byte](7000)(0x41)))
    // the real tool decodes the independent writer's frames too:
    // (differential closed in the other direction by the pinned fixtures)
    val c = ZstdBuild.store("abc".getBytes).clone()
    c(c.length - 1) = (c(c.length - 1) ^ 1).toByte // break the checksum
    assert(Zstd.decode(c) == null)
  }

  test("concatenated frames decode in order") {
    val cat = Z1 ++ Z2
    assert(new String(Zstd.decode(cat), "UTF-8") ==
      "hello zstd world, hello again and again" * 2)
  }

  test("skippable frames are skipped") {
    val skip = Array[Byte](0x50, 0x2a, 0x4d, 0x18, 3, 0, 0, 0, 9, 9, 9)
    assert(new String(Zstd.decode(skip ++ Z1 ++ skip), "UTF-8") ==
      "hello zstd world, hello again and again")
  }

  test("crafted skippable frame with wrap-around size cannot hang") {
    // sz = 0xFFFFFFF8: Int arithmetic adds 0 (8 + sz.toInt wraps) and
    // the frame walk would re-read the same magic forever; the Long
    // advance must fail it closed instead
    val evil = Array[Byte](0x50, 0x2a, 0x4d, 0x18,
      0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 1, 2, 3, 4)
    assert(Zstd.decode(evil) == null)
    // and one whose declared size overruns the buffer by a byte
    val over = Array[Byte](0x50, 0x2a, 0x4d, 0x18, 2, 0, 0, 0, 9)
    assert(Zstd.decode(over) == null)
  }

  test("file leading with a skippable frame dispatches (decompress + tar.zst)") {
    val skip = Array[Byte](0x50, 0x2a, 0x4d, 0x18, 3, 0, 0, 0, 9, 9, 9)
    assert(new String(graft.expr.Decompress.decode(skip ++ Z1), "UTF-8") ==
      "hello zstd world, hello again and again")
  }

  test("long-form sequence count: real stream, 36701 sequences in one block") {
    // zstd-1.5.7 at --zstd=strat=9,mml=3 over a 4096-token stream: one
    // 128 KiB block carries 36701 sequences, so the 3-byte count form
    // (0xFF b1 b2 → b1+(b2<<8)+0x7F00) exercises the ADDITION carry —
    // an OR would read 32605 and desync. The frame's own xxh64 gates
    // the output; the sha-256 pins it to the original input bytes.
    val in = getClass.getResourceAsStream("/graft/zstd_longform_nbseq.zst")
    val z = in.readAllBytes(); in.close()
    val out = Zstd.decode(z)
    assert(out != null && out.length == 132288)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    assert(md.digest(out).map("%02x".format(_)).mkString ==
      "4ed0e18888fcab72e42b7dd061a312c658f072abfea0ad275d89edf3b8060b0f")
  }

  test("corruption: flipped payload byte fails closed → null") {
    val c = Z2.clone()
    c(20) = (c(20) ^ 0x41).toByte
    assert(Zstd.decode(c) == null)
  }

  test("corruption: flipped checksum byte → null") {
    val c = Z2.clone()
    c(c.length - 1) = (c(c.length - 1) ^ 1).toByte
    assert(Zstd.decode(c) == null)
  }

  test("triage: wrong magic / truncation / garbage / torn tail → null") {
    assert(Zstd.decode(null) == null)
    assert(Zstd.decode("definitely not a zstd frame".getBytes) == null)
    assert(Zstd.decode(java.util.Arrays.copyOf(Z2, 20)) == null)
    assert(Zstd.decode(java.util.Arrays.copyOf(Z2, 4)) == null)
    assert(Zstd.decode(Z1 ++ "torn tail".getBytes) == null)
  }

  test("xxh64 matches reference vectors") {
    // xxhsum's published test values: empty and "Hello World" at seed 0
    assert(Zstd.xxh64(Array.emptyByteArray, 0, 0) == 0xef46db3751d8e999L)
    val hw = "Hello World".getBytes("UTF-8")
    // cross-checked against Spark's own XXH64 (same public spec)
    val spark = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(hw, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        hw.length, 0L)
    assert(Zstd.xxh64(hw, 0, hw.length) == spark)
    val big = lcgBytes(1 << 16, 3)
    val sparkBig = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(big, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        big.length, 0L)
    assert(Zstd.xxh64(big, 0, big.length) == sparkBig)
  }
}

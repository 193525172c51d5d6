package graft

import org.scalatest.funsuite.AnyFunSuite

/** Container-walk tests for [[graft.expr.SevenZip]] against the
  * independent [[graft.expr.SevenZipBuild]] writer (numbers, bit
  * vectors, header tree all re-derived on the write side), plus the
  * compressed coder paths pinned by REAL liblzma raw streams
  * (FORMAT_RAW / FILTER_LZMA1 and FILTER_LZMA2 — the exact payload
  * shapes 7z folders carry) embedded as hex.
  */
class SevenZipSpec extends AnyFunSuite {

  import graft.expr.{SevenZip, SevenZipBuild}
  import SevenZipBuild.Entry

  private def ascii(s: String) = s.getBytes("ISO-8859-1")

  private def hx(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def entryList(b: Array[Byte]): Seq[(String, Long, String)] = {
    val arr = SevenZip.entries(b, 4096)
    assert(arr != null, "entries returned null")
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getLong(1),
        new String(r.getBinary(2), "UTF-8"))
    }
  }

  test("copy-coded solid folder: files, dirs, empty files") {
    val z = SevenZipBuild.build(Seq(
      Entry("src/a.rs", ascii("fn a() {}")),
      Entry("docs", null, dir = true),
      Entry("docs/readme.md", ascii("# title\nbody")),
      Entry("empty.txt", Array.emptyByteArray)))
    assert(entryList(z) == Seq(
      ("src/a.rs", 9L, "fn a() {}"),
      ("docs/readme.md", 12L, "# title\nbody"),
      ("empty.txt", 0L, "")))
  }

  test("store-mode LZMA2 folder (uncompressed chunks)") {
    val big = ("x" * 70000) + "tail" // spans two LZMA2 chunks
    val z = SevenZipBuild.build(Seq(
      Entry("one.bin", ascii(big)),
      Entry("two.txt", ascii("second"))), lzma2 = true)
    assert(entryList(z) == Seq(
      ("one.bin", 70004L, big),
      ("two.txt", 6L, "second")))
  }

  test("encoded (compressed) header decodes through the folder path") {
    val z = SevenZipBuild.build(Seq(
      Entry("a.txt", ascii("alpha")),
      Entry("b.txt", ascii("beta"))), encodedHeader = true)
    assert(entryList(z) == Seq(("a.txt", 5L, "alpha"),
      ("b.txt", 4L, "beta")))
  }

  // the two-file corpus both real streams compress (mirrors the
  // fixture-generation script)
  private val corpusA = "fn main() { println!(\"seven zip\"); }\n" * 40
  private val corpusB = "# readme\nseven zip container walk test corpus\n" * 30

  private val L2 = hx(
    "e00b2b005f5d00331b8005d19678e951c0d091d9d9181150eaf73fc010feb1ef2c63760796294965f592c40e021d402764891d33e6de93f980a437d71751455c9a16dc5e04c2a131e999a101d5b55ab7a2e9d9d1582733259c8127ba7b9990cf0b91dbd5c3e100")
  private val L1 = hx(
    "00331b8005d19678e951c0d091d9d9181150eaf73fc010feb1ef2c63760796294965f592c40e021d402764891d33e6de93f980a437d71751455c9a16dc5e04c2a131e999a101d5b55ab7a2e9d9d1582733259c8127ba7b9990cf0b91dc7f7712ffffb893e000")

  test("real liblzma LZMA2 raw stream in a solid two-file folder") {
    val z = SevenZipBuild.withPackedFolder(
      Seq("main.rs", "README.md"),
      Seq(ascii(corpusA), ascii(corpusB)),
      L2, 0x21L, Array[Byte](40))
    assert(entryList(z) == Seq(
      ("main.rs", corpusA.length.toLong, corpusA),
      ("README.md", corpusB.length.toLong, corpusB)))
  }

  test("real liblzma LZMA1 raw stream with the 5-byte props") {
    val z = SevenZipBuild.withPackedFolder(
      Seq("main.rs", "README.md"),
      Seq(ascii(corpusA), ascii(corpusB)),
      L1, 0x030101L, hx("5d00000001"))
    assert(entryList(z) == Seq(
      ("main.rs", corpusA.length.toLong, corpusA),
      ("README.md", corpusB.length.toLong, corpusB)))
  }

  test("chained folder: real liblzma [delta dist=1, LZMA2] stream") {
    // raw stream produced by liblzma with the delta pre-filter; the
    // 7z chain is packed → LZMA2 → bind → delta(0x03) → files
    val data = Array.tabulate[Byte](2000)(i => ((i * 7) % 251).toByte)
    val packed = hx(
      "e007cf00225d0000024b02ff31db2e412a5c143093451def1a4685e1d7a079cabfe07faa932d2ae20000")
    val z = SevenZipBuild.withChainedFolder(
      Seq("ramp.bin"), Seq(data), packed,
      0x21L, Array[Byte](40), 0x03L, Array[Byte](0), data.length.toLong)
    val es = entryList(z)
    assert(es.map(e => (e._1, e._2)) == Seq(("ramp.bin", 2000L)))
    assert(es.head._3 == new String(data, "UTF-8"))
  }

  test("chained folder: real liblzma [BCJ x86, LZMA2] stream") {
    val code = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < 300) {
      code.write(Array[Byte](0x55, 0x89.toByte, 0xe5.toByte))
      val rel = (i * 24) % 4096 - 2048
      code.write(0xe8)
      code.write(rel & 0xff); code.write((rel >> 8) & 0xff)
      code.write((rel >> 16) & 0xff); code.write((rel >> 24) & 0xff)
      code.write(Array[Byte](0x5d, 0xc3.toByte))
      i += 1
    }
    val data = code.toByteArray
    val packed = hx(
      "e00bb701a35d002aa258ae8043f11676ad95f9a01fe31ff7acfd654b3cbef7528bafe626d81c765748f81d1d872f2d1f7e84babb9d7bf6cd4f13db4122a062156ec688fc7b0fed8b1c50981e9af6bab8525dd91682dc22eeca8850a6f3fd1db592036d5355666dabe3000dd9920570cb8331c96d76e30d2649a3a5e3897161573421a0d316e0b1453ca5f3635ca4d4fc0d7beb7498fdbbd7c514cfb77da6c7c5f040488ee301f7d0fc4b2b331465771f6834271a14a502a623c7782cec259e0a11b2abc4e8dfaa867c597b43d62ff51f335fb691e4ffcf528218c7a97ae2ac0f997e741a82fd7040aead78d43d2ef8ecd14e4af066175d16c16d09fb75468bc20f0287b0e5fc117cb9c89b5ecdfdc43fcb127d8995dfa1f898e3755645be461487a24ed68cfdbce302c34fda3e7a53bba6ce0b2aac04fcfc5cf68b06d7c8b6bcbc7ce4f99afc7445e58ea6647a6cee4ba058d07a07f9205bb80d0324a7e005584e98778cfb39b8033f1d46928d7461fba200e86420610696fa16b45484e518c77c72398b4028075847083d094b03ba79356b6ae9a6da45dea08fe51bf1cd0de08ab12569682bb769a20000")
    val z = SevenZipBuild.withChainedFolder(
      Seq("prog.o"), Seq(data), packed,
      0x21L, Array[Byte](40), 0x03030103L, Array.emptyByteArray,
      data.length.toLong)
    // byte-exact comparison (machine code is not UTF-8 text)
    val arr = graft.expr.SevenZip.entries(z, 16)
    assert(arr != null && arr.numElements() == 1)
    val row = arr.getStruct(0, 3)
    assert(row.getUTF8String(0).toString == "prog.o")
    assert(row.getLong(1) == data.length.toLong)
    assert(java.util.Arrays.equals(row.getBinary(2), data))
  }

  /** x86-looking payload: E8/E9 calls whose rel32 high byte is 00/FF
    * (converted, control bit 1), branch opcodes mid-data that are NOT
    * addresses (bit 0), a 0F 8x jcc, and E8 bytes with every
    * preceding-byte context to move the adaptive probabilities.
    */
  private def x86ish(seed: Int, n: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var s = seed.toLong
    while (out.size < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val r = ((s >>> 33) & 0xff).toInt
      (r % 7) match {
        case 0 => // converted call: rel32 with high byte 00
          out.write(r); out.write(0xe8)
          out.write(r ^ 0x55); out.write(r ^ 0x2a); out.write(r % 31)
          out.write(0x00)
        case 1 => // converted jump: rel32 with high byte FF (negative)
          out.write(0xe9)
          out.write(r); out.write(0xd0 | (r & 0x0f)); out.write(0xff)
          out.write(0xff)
        case 2 => // jcc (0F 8x) converted
          out.write(0x0f); out.write(0x80 | (r & 0x0f))
          out.write(r); out.write(0); out.write(0); out.write(0x00)
        case 3 => // E8 that is NOT an address (bit 0)
          out.write(r); out.write(0xe8)
          out.write(0x11); out.write(0x22); out.write(0x33); out.write(0x44)
        case _ => // plain bytes (including stray 0F without 8x)
          out.write(r); out.write(0x0f); out.write(r ^ 0xa5)
      }
    }
    out.toByteArray.take(n)
  }

  test("BCJ2 branching folder (copy carriers) round-trips") {
    val a = x86ish(7, 3000)
    val b = ascii("plain second member")
    val z = SevenZipBuild.buildBcj2(Seq(
      Entry("bin/app.exe", a), Entry("notes.txt", b)))
    val got = SevenZip.entries(z, 16)
    assert(got != null && got.numElements() == 2)
    val r0 = got.getStruct(0, 3)
    assert(r0.getUTF8String(0).toString == "bin/app.exe")
    assert(java.util.Arrays.equals(r0.getBinary(2), a))
    val r1 = got.getStruct(1, 3)
    assert(new String(r1.getBinary(2), "UTF-8") == "plain second member")
  }

  test("BCJ2 folder with LZMA2 carriers round-trips") {
    val a = x86ish(11, 9000)
    val z = SevenZipBuild.buildBcj2(Seq(Entry("x.so", a)), lzma2 = true)
    val got = SevenZip.entries(z, 16)
    assert(got != null && got.numElements() == 1)
    assert(java.util.Arrays.equals(got.getStruct(0, 3).getBinary(2), a))
  }

  test("BCJ2: opcode-dense edge shapes round-trip") {
    // trailing E8 with no room, consecutive E8s, E9 at position 0,
    // an 0F at the very end
    for (payload <- Seq(
      Array[Byte](0xe9.toByte, 1, 2, 3, 0),
      ascii("AB") ++ Array[Byte](0xe8.toByte, 0xe8.toByte, 0xe8.toByte,
        5, 6, 0) ++ ascii("tail") ++ Array[Byte](0xe8.toByte),
      x86ish(3, 64) ++ Array[Byte](0x0f.toByte),
      Array[Byte](0x0f, 0x88.toByte, 9, 9, 9, 0xff.toByte, 0x0f))) {
      val z = SevenZipBuild.buildBcj2(Seq(Entry("edge.bin", payload)))
      val got = SevenZip.entries(z, 4)
      assert(got != null && got.numElements() == 1)
      assert(java.util.Arrays.equals(got.getStruct(0, 3).getBinary(2),
        payload))
    }
  }

  test("BCJ2: corrupt control stream triages the folder, not the walk") {
    val a = x86ish(5, 2000)
    val z = SevenZipBuild.buildBcj2(Seq(Entry("app.bin", a)))
    // flip a byte inside the packed main stream (starts at offset 32
    // with copy carriers): the rc bits desync or the substream CRC
    // mismatches — both must triage, never throw or emit wrong bytes
    val c = z.clone()
    val probe = 32 + 10
    c(probe) = (c(probe) ^ 0x40).toByte
    val got = SevenZip.entries(c, 16)
    // either the CRC kills the substream (empty walk survives) or the
    // header CRC catches it first (null); both fail closed
    assert(got == null || got.numElements() == 0)
  }

  test("corrupt folder payload fails closed via substream CRC") {
    val z = SevenZipBuild.build(Seq(Entry("a.txt", ascii("alpha"))))
    // flip a byte inside the packed (copy) region, just after the
    // 32-byte signature header
    z(34) = (z(34) ^ 0x40).toByte
    val arr = SevenZip.entries(z, 64)
    assert(arr != null && arr.numElements() == 0)
  }

  test("out-of-subset coder triages its folder, archive still walks") {
    val z = SevenZipBuild.withPackedFolder(Seq("enc.bin"),
      Seq(ascii("xxxx")), ascii("junk"), 0x06f10701L, // AES-256
      Array.emptyByteArray)
    val arr = SevenZip.entries(z, 64)
    assert(arr != null && arr.numElements() == 0)
  }

  test("triage: wrong magic / truncation / corrupt header CRC → null") {
    assert(SevenZip.entries(null, 64) == null)
    assert(SevenZip.entries(ascii("not a seven zip archive!!"), 64) == null)
    val ok = SevenZipBuild.build(Seq(Entry("a.txt", ascii("alpha"))))
    assert(SevenZip.entries(java.util.Arrays.copyOf(ok, 40), 64) == null)
    val bad = ok.clone()
    bad(bad.length - 3) = (bad(bad.length - 3) ^ 1).toByte // header bytes
    assert(SevenZip.entries(bad, 64) == null)
  }
}

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

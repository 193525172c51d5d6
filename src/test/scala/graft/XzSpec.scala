package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential suite for the clean-room XZ/LZMA2 decoder: every
  * fixture is REAL `xz`-tool output embedded as hex — the strongest
  * wire pin available (range-coder conventions, adaptive-model
  * update shifts, position-slot geometry, all four check types,
  * multi-block framing were all produced by the reference encoder,
  * none by this repo's code).
  */
class XzSpec extends AnyFunSuite {

  import graft.expr.Xz
  import XzSpecFixtures._

  /** The generator X3/X9's payloads derive from (mirrors the
    * fixture-generation script).
    */
  private def lcgBytes(n: Int, seed: Long): Array[Byte] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) & 0xff).toByte
    }
  }

  test("text at -9 (CRC64 default check)") {
    assert(new String(Xz.decode(X1), "UTF-8") ==
      "hello xz world, hello again and again")
  }

  test("match/rep-heavy payload") {
    assert(new String(Xz.decode(X2), "UTF-8") ==
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaabbbbccddddddddddddd" * 20)
  }

  test("4 kB incompressible literals (uncompressed LZMA2 chunks)") {
    assert(java.util.Arrays.equals(Xz.decode(X3), lcgBytes(4000, 99L)))
  }

  test("empty stream") {
    val d = Xz.decode(X4)
    assert(d != null && d.length == 0)
  }

  test("check types: CRC32, none, SHA-256 all verify") {
    assert(new String(Xz.decode(X5), "UTF-8") == "check32 content here")
    assert(new String(Xz.decode(X6), "UTF-8") == "checknone content")
    assert(new String(Xz.decode(X7), "UTF-8") == "sha content here today")
  }

  test("multi-block stream (--block-size) concatenates in order") {
    assert(new String(Xz.decode(X8), "UTF-8") ==
      "The quick brown fox jumps over the lazy dog. " * 400)
  }

  test("150 kB five-symbol stream at -0") {
    val expect = lcgBytes(150000, 7L).map(b => (65 + ((b & 0xff) % 5)).toByte)
    assert(java.util.Arrays.equals(Xz.decode(X9), expect))
  }

  test("XzBuild store-mode writer round-trips (reference-validated form)") {
    // the writer's output was additionally accepted by `xz -t` and
    // decoded byte-exact by `unxz` during development
    val rnd = new scala.util.Random(5)
    for (len <- Seq(0, 1, 100, 70000, 200000)) {
      val data = new Array[Byte](len)
      rnd.nextBytes(data)
      val dec = Xz.decode(graft.expr.XzBuild.store(data))
      assert(dec != null && java.util.Arrays.equals(dec, data),
        s"store roundtrip failed at len=$len")
    }
  }

  test("corruption: flipped payload byte fails the block check → null") {
    val bad = X1.clone()
    bad(30) = (bad(30) ^ 0x20).toByte
    assert(Xz.decode(bad) == null)
    val badHdr = X1.clone()
    badHdr(13) = (badHdr(13) ^ 1).toByte // inside the block header
    assert(Xz.decode(badHdr) == null)
  }

  test("delta filter chains (dist=1 and dist=4) decode and pass checks") {
    val ramp = Array.tabulate[Byte](3000)(i => ((i * 7) % 251).toByte)
    assert(java.util.Arrays.equals(Xz.decode(XD1), ramp))
    val quad = new Array[Byte](3200)
    var i = 0
    while (i < 800) {
      quad(4 * i) = ((i % 200) + 10).toByte
      quad(4 * i + 1) = 0
      quad(4 * i + 2) = (i % 100).toByte
      quad(4 * i + 3) = 1
      i += 1
    }
    assert(java.util.Arrays.equals(Xz.decode(XD4), quad))
  }

  test("BCJ x86 filter chain decodes real `xz --x86` output") {
    // 400 units of push ebp / mov ebp,esp / call rel32 / pop ebp / ret
    val code = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < 400) {
      code.write(Array[Byte](0x55, 0x89.toByte, 0xe5.toByte))
      val rel = (i * 16) % 4096 - 2048
      code.write(0xe8)
      code.write(rel & 0xff); code.write((rel >> 8) & 0xff)
      code.write((rel >> 16) & 0xff); code.write((rel >> 24) & 0xff)
      code.write(Array[Byte](0x5d, 0xc3.toByte))
      i += 1
    }
    assert(java.util.Arrays.equals(Xz.decode(XB1), code.toByteArray))
  }

  test(".lzma alone format: end-marker mode, size-known mode, triage") {
    val text = ("alone format lzma payload, repeated payload payload " * 40)
      .getBytes("ISO-8859-1")
    // real `xz --format=lzma -9` output (size field all-FF = unknown)
    val a1 = ("5d00000004ffffffffffffffff00309b0a4324c8b6080a49bf62d8fda43f" +
      "dc10a4adc6708ed81ebb54c62b27c0dfb7c2938f25c6f346aeedc8d6b5c30d94f1" +
      "3cb334c38cdffffffaa42000").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    assert(java.util.Arrays.equals(graft.expr.Xz.decodeAlone(a1), text))
    // the same real body behind a KNOWN-size header
    val a2 = a1.clone()
    var i = 0
    while (i < 8) {
      a2(5 + i) = ((text.length.toLong >> (8 * i)) & 0xff).toByte
      i += 1
    }
    assert(java.util.Arrays.equals(graft.expr.Xz.decodeAlone(a2), text))
    // graft_decompress dispatches it despite the missing magic
    assert(java.util.Arrays.equals(graft.expr.Decompress.decode(a1), text))
    // truncation in end-marker mode: no marker → null, never partial
    assert(graft.expr.Xz.decodeAlone(
      java.util.Arrays.copyOf(a1, a1.length - 6)) == null)
    assert(graft.expr.Xz.decodeAlone("definitely not lzma".getBytes) == null)
  }

  test("first LZMA chunk without a state reset (mode 0) → null") {
    // The LZMA2 spec requires the first chunk after a dict reset to
    // carry reset mode 3; a mode-0 control (0x80) with no prior state
    // must triage, not NPE on the never-allocated probability arrays.
    val raw = Array[Byte](0x80.toByte, 0, 0, // unpacked = 1
      0, 4, // packed = 5
      1, 2, 3, 4, 5, // "range-coded" payload, never reached
      0) // end marker
    assert(Xz.decode(graft.expr.XzBuild.storeRaw(Array[Byte](9), raw))
      == null)
  }

  test("first LZMA chunk with state reset but no props (mode 1) → null") {
    val raw = Array[Byte](0xa0.toByte, 0, 0, 0, 4, 1, 2, 3, 4, 5, 0)
    assert(Xz.decode(graft.expr.XzBuild.storeRaw(Array[Byte](9), raw))
      == null)
  }

  test("triage: wrong magic / truncation / garbage → null") {
    assert(Xz.decode(null) == null)
    assert(Xz.decode("not xz data at all, not even close!!".getBytes) == null)
    assert(Xz.decode(java.util.Arrays.copyOf(X1, 40)) == null)
    assert(Xz.decode(java.util.Arrays.copyOf(X1, 13)) == null)
  }
}

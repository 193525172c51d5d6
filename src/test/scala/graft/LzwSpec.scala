package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unix compress (.Z) decode — REAL libarchive-written `.tar.Z`
  * fixtures pin the reading direction (including the eight-code
  * block realign on width growth), and the real `uncompress`/gzip
  * decoder validates [[CompressBuild]]'s writing direction, so the
  * historically load-bearing padding quirk is pinned from both
  * sides.
  */
class LzwSpec extends AnyFunSuite {

  import graft.expr.{CompressBuild, Lzw}

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    val b = in.readAllBytes(); in.close(); b
  }

  private def sha(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(b).map("%02x".format(_)).mkString

  test("real .tar.Z (small): decode matches the reference decoder's bytes") {
    val out = Lzw.decode(res("lzw_small.tar.Z"))
    assert(out != null && out.length == 2048 && sha(out) ==
      "64d5911f810defbb3a986a663811982db50cc730293f8753f4be52ed4fb550ee")
  }

  test("real .tar.Z (200KB): width growth through 9..16 with realigns") {
    val out = Lzw.decode(res("lzw_big.tar.Z"))
    assert(out != null && out.length == 202752 && sha(out) ==
      "3447a78054281ca5cb87903dcb5724e5568e82ef5a936c50f91e968ee1fcc0ce")
  }

  test("tar.Z routes through the tar walk and graft_decompress") {
    val rows = graft.expr.TarEntries.entries(res("lzw_big.tar.Z"), 8)
    assert(rows != null && rows.numElements() == 1)
    assert(rows.getStruct(0, 3).getUTF8String(0).toString ==
      "lzw_big.txt")
    assert(rows.getStruct(0, 3).getBinary(2).length == 201147)
    val d = graft.expr.Decompress.decode(res("lzw_small.tar.Z"))
    assert(d != null && d.length == 2048)
  }

  test("independent writer round-trips: growth, clears, small maxbits") {
    val rnd = new scala.util.Random(5)
    val corpora = Seq(
      ("alpha beta gamma " * 9000).getBytes("UTF-8"), // widths 9..14+
      Array.fill[Byte](4000)(rnd.nextInt().toByte),
      "abababababababab".getBytes("UTF-8"), // KwKwK shapes
      "x".getBytes("UTF-8"))
    for (d <- corpora; mb <- Seq(12, 16); ce <- Seq(0, 700)) {
      val z = CompressBuild.compress(d, maxbits = mb, clearEvery = ce)
      val back = Lzw.decode(z)
      assert(back != null && java.util.Arrays.equals(back, d),
        s"len=${d.length} maxbits=$mb clearEvery=$ce")
    }
  }

  test("writer output is accepted by the reference decoder (when present)") {
    assume(new java.io.File("/bin/gzip").exists ||
      new java.io.File("/usr/bin/gzip").exists, "no gzip on this box")
    val d = ("reference decoder differential " * 4000).getBytes("UTF-8")
    for (ce <- Seq(0, 500)) {
      val z = CompressBuild.compress(d, clearEvery = ce)
      val f = java.io.File.createTempFile("graftlzw", ".Z")
      try {
        val fos = new java.io.FileOutputStream(f)
        fos.write(z); fos.close()
        val p = new ProcessBuilder("gzip", "-dc", f.getAbsolutePath)
          .start()
        val back = p.getInputStream.readAllBytes()
        assert(p.waitFor() == 0, s"reference decoder rejected (ce=$ce)")
        assert(java.util.Arrays.equals(back, d), s"ce=$ce")
      } finally f.delete()
    }
  }

  test("triage: bad magic, bad maxbits, truncations, hostile codes") {
    assert(Lzw.decode(null) == null)
    assert(Lzw.decode("plain".getBytes) == null)
    assert(Lzw.decode(Array[Byte](0x1f, 0x9d.toByte, 0x88.toByte)) == null)
    assert(Lzw.decode(Array[Byte](0x1f, 0x9d.toByte, 0x91.toByte, 1))
      == null) // maxbits 17
    val whole = res("lzw_small.tar.Z")
    (0 until whole.length).foreach { cut =>
      Lzw.decode(java.util.Arrays.copyOf(whole, cut))
    }
    // a first code that is not a literal fails closed
    val evil = Array[Byte](0x1f, 0x9d.toByte, 0x90.toByte,
      0xff.toByte, 0x01) // code 511 as the first code
    assert(Lzw.decode(evil) == null)
  }
}

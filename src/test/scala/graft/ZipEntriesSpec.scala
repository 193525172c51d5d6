package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.expr.ZipEntries]] against the JDK's INDEPENDENT zip
  * writer — a genuine differential over the hand local-header walk
  * (the walk itself is further exercised by EpubText/DocxText's
  * suites; this pins the generic exposure).
  */
class ZipEntriesSpec extends AnyFunSuite {

  import graft.expr.ZipEntries

  private def jdkZip(entries: Seq[(String, Array[Byte])],
      stored: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    if (stored) z.setMethod(java.util.zip.ZipOutputStream.STORED)
    entries.foreach { case (name, content) =>
      val e = new java.util.zip.ZipEntry(name)
      if (stored) {
        e.setSize(content.length)
        val crc = new java.util.zip.CRC32()
        crc.update(content)
        e.setCrc(crc.getValue)
      }
      z.putNextEntry(e)
      z.write(content)
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private def entryList(b: Array[Byte]): Seq[(String, Long, String)] = {
    val arr = ZipEntries.entries(b)
    assert(arr != null, "entries returned null")
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getLong(1),
        new String(r.getBinary(2), "UTF-8"))
    }
  }

  test("JDK deflated zip round-trips; directories skipped") {
    val zip = jdkZip(Seq(
      "a.txt" -> "alpha content".getBytes("UTF-8"),
      "dir/" -> Array.emptyByteArray,
      "dir/b.py" -> "print('b')\n".getBytes("UTF-8")))
    assert(entryList(zip) == Seq(
      ("a.txt", 13L, "alpha content"),
      ("dir/b.py", 11L, "print('b')\n")))
  }

  test("JDK stored (uncompressed) zip round-trips") {
    val zip = jdkZip(Seq("s.bin" -> "stored!".getBytes("UTF-8")),
      stored = true)
    assert(entryList(zip) == Seq(("s.bin", 7L, "stored!")))
  }

  test("triage: not a zip / empty / tar bytes → null") {
    assert(ZipEntries.entries(null) == null)
    assert(ZipEntries.entries("PK but not really".getBytes) == null)
    assert(ZipEntries.entries(new Array[Byte](600)) == null)
  }
}

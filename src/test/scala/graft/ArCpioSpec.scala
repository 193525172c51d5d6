package graft

import org.scalatest.funsuite.AnyFunSuite

/** ar / cpio walks — every container fixture is REAL tool output
  * (GNU binutils `ar` 2.40, `bsdtar` newc/odc, `dpkg-deb`), so the
  * header layouts, GNU long-name table, 4-byte padding and crc-form
  * byte sums are pinned against reference producers; [[ArBuild]]
  * adds the independent-writer round-trip direction.
  */
class ArCpioSpec extends AnyFunSuite {

  import graft.expr.{ArBuild, ArEntries, CpioEntries}

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    val b = in.readAllBytes(); in.close(); b
  }

  private def names(rows: org.apache.spark.sql.catalyst.util.GenericArrayData):
      Seq[String] =
    (0 until rows.numElements()).map(i =>
      rows.getStruct(i, 3).getUTF8String(0).toString)

  private def content(rows: org.apache.spark.sql.catalyst.util.GenericArrayData,
      i: Int): String =
    new String(rows.getStruct(i, 3).getBinary(2), "UTF-8")

  test("real GNU ar: short names") {
    val rows = ArEntries.entries(res("arfix_plain.ar"), 16)
    assert(rows != null && names(rows) == Seq("a.txt", "c.txt"))
    assert(content(rows, 0) == "first member text\n")
    assert(content(rows, 1) == "third\n")
  }

  test("real GNU ar: long-name table resolves") {
    val rows = ArEntries.entries(res("arfix_longnames.ar"), 16)
    assert(rows != null && names(rows) == Seq("a.txt",
      "b_with_a_deliberately_long_filename.txt", "c.txt"))
    assert(content(rows, 1) == "second member with more text inside\n")
  }

  test("real dpkg-deb package: ar -> data.tar.xz -> tar -> document") {
    val rows = ArEntries.entries(res("arfix_fixture.deb"), 16)
    assert(rows != null && names(rows) ==
      Seq("debian-binary", "control.tar.xz", "data.tar.xz"))
    assert(content(rows, 0) == "2.0\n")
    // the data member is a REAL xz'd tar — the shared tar walk's
    // front decompression reads it
    val dataTar = rows.getStruct(2, 3).getBinary(2)
    val tarRows = graft.expr.TarEntries.entries(dataTar, 16)
    assert(tarRows != null)
    val paths = (0 until tarRows.numElements()).map(i =>
      tarRows.getStruct(i, 3).getUTF8String(0).toString)
    val at = paths.indexWhere(_.endsWith("readme.txt"))
    assert(at >= 0)
    assert(new String(tarRows.getStruct(at, 3).getBinary(2), "UTF-8") ==
      "deb payload document text\n")
  }

  test("real bsdtar cpio: newc, odc, and gzipped newc") {
    for (f <- Seq("arfix_newc.cpio", "arfix_odc.cpio",
        "arfix_newc.cpio.gz")) {
      val rows = CpioEntries.entries(res(f), 16)
      assert(rows != null && names(rows).toSet == Set("n.txt", "m.txt"),
        f)
      val at = names(rows).indexOf("n.txt")
      assert(content(rows, at) == "cpio newc member\n", f)
    }
  }

  test("independent writers round-trip; crc form verifies and fails closed") {
    val entries = Seq(
      "short.txt" -> "alpha".getBytes("UTF-8"),
      "a_name_longer_than_fifteen_chars.txt" -> "beta".getBytes("UTF-8"))
    val ar = ArEntries.entries(ArBuild.ar(entries), 16)
    assert(ar != null && names(ar) == entries.map(_._1))
    assert(content(ar, 1) == "beta")
    for (crc <- Seq(false, true)) {
      val c = CpioEntries.entries(ArBuild.cpio(entries, crcForm = crc), 16)
      assert(c != null && names(c) == entries.map(_._1), s"crc=$crc")
    }
    // flip a data byte in the crc form: the sum catches it and the
    // walk stops (entries before the damage survive)
    val crcArc = ArBuild.cpio(entries, crcForm = true)
    val pat = "alpha".getBytes("ISO-8859-1")
    val at = (0 until crcArc.length - 5).find(i =>
      crcArc.slice(i, i + 5).sameElements(pat)).get
    crcArc(at) = 'X'.toByte
    assert(CpioEntries.entries(crcArc, 16) == null)
  }

  test("triage: not an archive, truncations, hostile sizes") {
    assert(ArEntries.entries("plain text".getBytes, 16) == null)
    assert(CpioEntries.entries("plain text".getBytes, 16) == null)
    assert(ArEntries.entries(null, 16) == null)
    val whole = res("arfix_longnames.ar")
    (0 until whole.length).foreach { cut =>
      ArEntries.entries(java.util.Arrays.copyOf(whole, cut), 16)
    }
    val wholeC = res("arfix_newc.cpio")
    (0 until wholeC.length).foreach { cut =>
      CpioEntries.entries(java.util.Arrays.copyOf(wholeC, cut), 16)
    }
    // an ar header whose size overruns: entries before it survive
    val evil = ArBuild.ar(Seq("ok.txt" -> "fine".getBytes("UTF-8")))
    val more = evil ++ "bad.txt/        0           0     0     100644  99999999  `\n".getBytes("ISO-8859-1")
    val rows = ArEntries.entries(more, 16)
    assert(rows != null && names(rows) == Seq("ok.txt"))
  }

  test("graft_ar_entries / graft_cpio_entries evaluate through SQL") {
    val spark = SparkSpec.session
    Graft.tune(spark)
    import spark.implicits._
    val deb = res("arfix_fixture.deb")
    val cp = res("arfix_newc.cpio.gz")
    Seq((deb, cp)).toDF("d", "c").createOrReplaceTempView("pkg_docs")
    val row = spark.sql(
      """SELECT size(graft_ar_entries(d)),
                filter(graft_ar_entries(d), e -> e.path = 'debian-binary')[0].path,
                size(graft_cpio_entries(c)) FROM pkg_docs""").collect()(0)
    assert(row.getInt(0) == 3)
    assert(row.getString(1) == "debian-binary")
    assert(row.getInt(2) == 2)
  }
}

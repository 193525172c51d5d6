package graft

import org.scalatest.funsuite.AnyFunSuite

/** BIFF8 `.xls` / PowerPoint-97 `.ppt` extraction — differential
  * against the INDEPENDENT writer [[graft.expr.LegacyOfficeBuild]]
  * (its own record emission, SST CONTINUE splitter and RK packer;
  * nothing shared with the readers), plus twin-identity gates: the
  * same logical content written as .xls/.xlsx and .ppt/.pptx must
  * extract IDENTICAL text through `graft_document_text`.
  */
class LegacyOfficeSpec extends AnyFunSuite {

  import graft.expr.{DocumentText, LegacyOffice, OfficeText}
  import graft.expr.LegacyOfficeBuild._

  private def zipOf(entries: (String, String)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (n, c) =>
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(c.getBytes("UTF-8")); z.closeEntry()
    }
    z.close(); bos.toByteArray
  }

  // ------------------------------------------------------------ xls

  test("xls: strings, numbers, RK, MULRK, booleans — tab rows") {
    val b = xls(Seq(Seq(
      Seq(S("alpha"), N(42.5), I(7)),
      Seq(S("beta"), I(1), I(2), I(3)), // MULRK run
      Seq(SInline("inline"), X100(3.25), B(true), B(false)))))
    assert(LegacyOffice.xls(b).toString ==
      "alpha\t42.5\t7\nbeta\t1\t2\t3\ninline\t3.25\t1\t0\n")
    assert(DocumentText.parse(b).toString ==
      "alpha\t42.5\t7\nbeta\t1\t2\t3\ninline\t3.25\t1\t0\n")
  }

  test("xls: integral doubles render as integers (the xlsx literal)") {
    val b = xls(Seq(Seq(Seq(N(42.0), N(-3.0), N(0.5), I(-12)))))
    assert(LegacyOffice.xls(b).toString == "42\t-3\t0.5\t-12\n")
  }

  test("xls: RK x100 and negative / large RK integers") {
    // 12345678.91 cannot pack losslessly → NUMBER fallback;
    // 10737418.24 ×100 = 2^30 → the truncated-double RK form
    val b = xls(Seq(Seq(
      Seq(I(-1), I((1 << 29) - 1), I(-(1 << 29))),
      Seq(X100(1.27), X100(-0.03), X100(12345678.91), X100(10737418.24)))))
    assert(LegacyOffice.xls(b).toString ==
      s"-1\t${(1 << 29) - 1}\t${-(1 << 29)}\n" +
        "1.27\t-0.03\t1.234567891E7\t1.073741824E7\n")
  }

  test("xls: SST spills into CONTINUE at character boundaries") {
    // tiny record budget forces many splits, including a split where
    // the string HEADER ends a record and its chars start in the
    // continue (fresh grbit), and an ascii→unicode width switch at a
    // boundary (the remaining-chars rule)
    val long = ("lorem ipsum dolor " * 12) + "café then 中文 tail"
    val more = (0 until 40).map(i => s"str$i value")
    val rows = (long +: more).map(s => Seq(S(s): Cell))
    val b = xls(Seq(rows), maxSstData = 32)
    val expect = (long +: more).mkString("", "\n", "\n")
    assert(LegacyOffice.xls(b).toString == expect)
  }

  test("xls: multiple sheets concatenate in stream order") {
    val b = xls(Seq(
      Seq(Seq(S("sheet one"))),
      Seq(Seq(S("sheet two"), I(9)))))
    assert(LegacyOffice.xls(b).toString == "sheet one\nsheet two\t9\n")
  }

  test("xls/xlsx twin identity: same content, identical extraction") {
    val sx = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val legacy = xls(Seq(Seq(
      Seq(S("quarterly report"), N(1250.5)),
      Seq(S("total"), I(87)))))
    val modern = zipOf("xl/worksheets/sheet1.xml" ->
      (s"""<worksheet xmlns="$sx"><sheetData>""" +
        """<row><c t="inlineStr"><is><t>quarterly report</t></is></c>""" +
        """<c><v>1250.5</v></c></row>""" +
        """<row><c t="inlineStr"><is><t>total</t></is></c>""" +
        """<c><v>87</v></c></row>""" +
        "</sheetData></worksheet>"))
    val a = DocumentText.parse(legacy)
    val m = DocumentText.parse(modern)
    assert(a != null && m != null && a.toString == m.toString)
  }

  test("BIFF5 (Excel 5.0/95) Book stream: inline byte strings decode") {
    val b = xls5(Seq(Seq(
      Seq(S("ninety five"), I(42), N(3.5)),
      Seq(SInline("café bytes"), X100(1.27)))))
    assert(LegacyOffice.xls(b).toString ==
      "ninety five\t42\t3.5\ncafé bytes\t1.27\n")
    assert(DocumentText.parse(b).toString ==
      "ninety five\t42\t3.5\ncafé bytes\t1.27\n")
    // characters outside CP1252 had no representation in Excel 95:
    // the independent writer substitutes '?' exactly like Excel did
    val u = xls5(Seq(Seq(Seq(S("has 中文 here")))))
    assert(LegacyOffice.xls(u).toString == "has ?? here\n")
    // BIFF5 FORMULA cached results (byte-string STRING record)
    val f = xls5(Seq(Seq(Seq(FNum(6.0), FStr("cached"), FBool(false)))))
    assert(LegacyOffice.xls(f).toString == "6\tcached\t0\n")
  }

  test("xls: FORMULA cached results are the visible text") {
    // numeric, string (via the following STRING record), boolean and
    // a plain cell after the formula pair (the pending-string state
    // must not leak)
    val b = xls(Seq(Seq(
      Seq(FNum(12.0), FStr("concatenated"), FBool(true), S("after")),
      Seq(FNum(0.125), FStr("café 中文")))))
    assert(LegacyOffice.xls(b).toString ==
      "12\tconcatenated\t1\tafter\n0.125\tcafé 中文\n")
    assert(DocumentText.parse(b).toString ==
      "12\tconcatenated\t1\tafter\n0.125\tcafé 中文\n")
  }

  test("BIFF8 RSTRING: formatting runs past the chars are skipped") {
    val b = rstringSheet(0, 0, "rich string cell")
    assert(LegacyOffice.xls(b).toString == "rich string cell\n")
  }

  test("xls: a wrapped LABELSST index fails closed, never emits 'null'") {
    // craft a workbook whose LABELSST carries isst = 0xFFFFFFFF: the
    // wrapped Int collides with the inline-text sentinel and would
    // have emitted the literal string "null"
    val b = xls(Seq(Seq(Seq(S("anchor")))))
    val cfb = {
      // rebuild the same workbook stream with a poisoned LABELSST
      val w = new java.io.ByteArrayOutputStream()
      def rec(id: Int, p: Array[Byte]): Unit = {
        w.write(id & 0xff); w.write(id >> 8)
        w.write(p.length & 0xff); w.write(p.length >> 8)
        w.write(p)
      }
      rec(0x0809, Array[Byte](0, 6, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
      rec(0x000a, Array.emptyByteArray)
      rec(0x0809, Array[Byte](0, 6, 0x10, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
      rec(0x00fd, Array[Byte](0, 0, 0, 0, 0x0f, 0,
        0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte))
      rec(0x000a, Array.emptyByteArray)
      graft.expr.DocBuild.cfb(Seq("Workbook" -> w.toByteArray))
    }
    assert(LegacyOffice.xls(b) != null) // the sane twin still decodes
    assert(LegacyOffice.xls(cfb) == null)
  }

  test("xls triage: FILEPASS, torn records, junk Book stream, non-CFB") {
    assert(LegacyOffice.xls(xlsEncrypted()) == null)
    assert(LegacyOffice.xls(null) == null)
    assert(LegacyOffice.xls("not a cfb".getBytes) == null)
    // a Book stream that is not BIFF at all: no BOF → null
    val book = graft.expr.DocBuild.cfb(Seq("Book" -> Array[Byte](9, 8)))
    assert(LegacyOffice.xls(book) == null)
    assert(DocumentText.parse(book) == null)
    // torn record: declared length overruns the stream
    val torn = graft.expr.DocBuild.cfb(Seq("Workbook" ->
      Array[Byte](0x09, 0x08, 0x10, 0)))
    assert(LegacyOffice.xls(torn) == null)
  }

  // ------------------------------------------------------------ ppt

  test("ppt: paragraphs across atoms and slides, one line each") {
    val b = ppt(Seq(
      Seq("opening title", "first bullet", "second bullet"),
      Seq("slide two")))
    assert(LegacyOffice.ppt(b).toString ==
      "opening title\nfirst bullet\nsecond bullet\nslide two\n")
    assert(DocumentText.parse(b).toString ==
      "opening title\nfirst bullet\nsecond bullet\nslide two\n")
  }

  test("ppt: unicode paragraphs take the UTF-16 atom") {
    val b = ppt(Seq(Seq("café résumé", "中文 slide")))
    assert(LegacyOffice.ppt(b).toString ==
      "café résumé\n中文 slide\n")
  }

  test("ppt/pptx twin identity: same deck, identical extraction") {
    val A = "http://schemas.openxmlformats.org/drawingml/2006/main"
    def slideXml(paras: String*): String =
      s"""<p:sld xmlns:p="x:p" xmlns:a="$A"><p:txBody>""" +
        paras.map(t => s"<a:p><a:r><a:t>$t</a:t></a:r></a:p>").mkString +
        "</p:txBody></p:sld>"
    val legacy = ppt(Seq(Seq("deck title", "point one"), Seq("closing")))
    val modern = zipOf(
      "ppt/slides/slide1.xml" -> slideXml("deck title", "point one"),
      "ppt/slides/slide2.xml" -> slideXml("closing"))
    val a = DocumentText.parse(legacy)
    val m = DocumentText.parse(modern)
    assert(a != null && m != null && a.toString == m.toString)
  }

  test("ppt incremental save: only LIVE persist objects emit text") {
    // edit 1 creates slides 2 and 3; edit 2 REPLACES slide 2 and adds
    // slide 4. The stale "original title" bytes remain in the stream
    // (a linear walk would emit them) but the persist walk must not.
    val deck = pptIncremental(Seq(
      Seq(2 -> Seq("original title", "old bullet"), 3 -> Seq("slide two")),
      Seq(2 -> Seq("revised title"), 4 -> Seq("slide three"))))
    assert(LegacyOffice.ppt(deck).toString ==
      "revised title\nslide two\nslide three\n")
    assert(DocumentText.parse(deck).toString ==
      "revised title\nslide two\nslide three\n")
    // a single-edit incremental deck equals its linear twin
    val one = pptIncremental(Seq(Seq(2 -> Seq("only slide", "bullet"))))
    val linear = ppt(Seq(Seq("only slide", "bullet")))
    assert(LegacyOffice.ppt(one).toString ==
      LegacyOffice.ppt(linear).toString)
  }

  test("ppt encrypted deck triages to null, never a ciphertext walk") {
    assert(LegacyOffice.ppt(pptEncrypted()) == null)
    assert(DocumentText.parse(pptEncrypted()) == null)
  }

  test("ppt triage: no text atoms, torn record, wrong stream") {
    // containers but no text: null, not empty string
    val empty = graft.expr.DocBuild.cfb(Seq(
      "PowerPoint Document" -> Array[Byte](0x0f, 0, 0xee.toByte, 3,
        0, 0, 0, 0)))
    assert(LegacyOffice.ppt(empty) == null)
    // record length overruns: the walk stops, no throw
    val torn = graft.expr.DocBuild.cfb(Seq(
      "PowerPoint Document" -> Array[Byte](0, 0, 0xa0.toByte, 0x0f,
        1, 0, 0, 0)))
    assert(LegacyOffice.ppt(torn) == null)
    assert(LegacyOffice.ppt(graft.expr.DocBuild.cfb(
      Seq("SomethingElse" -> Array[Byte](1)))) == null)
  }

  // --------------------------------------------- SQL registration

  test("both functions evaluate through SQL and codegen") {
    val spark = SparkSpec.session
    Graft.tune(spark)
    import spark.implicits._
    val xlsB = xls(Seq(Seq(Seq(S("sql cell"), I(5)))))
    val pptB = ppt(Seq(Seq("sql slide")))
    val df = Seq((xlsB, pptB)).toDF("x", "p")
    df.createOrReplaceTempView("legacy_docs")
    val row = spark.sql(
      """SELECT graft_xls_text(x) AS xt, graft_ppt_text(p) AS pt,
               graft_document_text(x) AS dx, graft_document_text(p) AS dp
         FROM legacy_docs""").head()
    assert(row.getString(0) == "sql cell\t5\n")
    assert(row.getString(1) == "sql slide\n")
    assert(row.getString(2) == "sql cell\t5\n")
    assert(row.getString(3) == "sql slide\n")
  }
}

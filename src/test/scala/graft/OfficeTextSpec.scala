package graft

import org.scalatest.funsuite.AnyFunSuite

/** PPTX/XLSX extraction tests — OPC zips built with the JDK writer
  * (an independent zip producer for the hand walk), OOXML bodies per
  * the published schemas.
  */
class OfficeTextSpec extends AnyFunSuite {

  import graft.expr.{DocumentText, OfficeText}

  private def zipOf(entries: (String, String)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (n, c) =>
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(c.getBytes("UTF-8")); z.closeEntry()
    }
    z.close(); bos.toByteArray
  }

  private val A = "http://schemas.openxmlformats.org/drawingml/2006/main"
  private val S =
    "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

  private def slide(paras: String*): String =
    s"""<p:sld xmlns:p="x:p" xmlns:a="$A"><p:txBody>""" +
      paras.map(t => s"<a:p><a:r><a:t>$t</a:t></a:r></a:p>").mkString +
      "</p:txBody></p:sld>"

  test("pptx: slides in numeric order, one line per paragraph") {
    val b = zipOf(
      "ppt/slides/slide10.xml" -> slide("tenth slide"),
      "ppt/slides/slide2.xml" -> slide("title two", "bullet two"),
      "ppt/slides/slide1.xml" -> slide("opening"))
    assert(OfficeText.pptx(b).toString ==
      "opening\ntitle two\nbullet two\ntenth slide\n")
    assert(DocumentText.parse(b).toString ==
      "opening\ntitle two\nbullet two\ntenth slide\n")
  }

  test("pptx: split runs concatenate within a paragraph") {
    val body = s"""<p:sld xmlns:p="x:p" xmlns:a="$A">""" +
      "<a:p><a:r><a:t>Hel</a:t></a:r>" +
      "<a:r><a:t>lo runs</a:t></a:r></a:p></p:sld>"
    val b = zipOf("ppt/slides/slide1.xml" -> body)
    assert(OfficeText.pptx(b).toString == "Hello runs\n")
  }

  test("xlsx: shared strings, inline strings and numbers, tab rows") {
    val shared = s"""<sst xmlns="$S"><si><t>alpha</t></si>""" +
      "<si><r><t>ri</t></r><r><t>ch</t></r></si></sst>"
    val sheet = s"""<worksheet xmlns="$S"><sheetData>""" +
      """<row r="1"><c r="A1" t="s"><v>0</v></c>""" +
      """<c r="B1"><v>42.5</v></c></row>""" +
      """<row r="2"><c r="A2" t="s"><v>1</v></c>""" +
      """<c r="B2" t="inlineStr"><is><t>inline</t></is></c></row>""" +
      """<row r="3"><c r="A3"/></row>""" + // all-empty row: no line
      "</sheetData></worksheet>"
    val b = zipOf(
      "xl/sharedStrings.xml" -> shared,
      "xl/worksheets/sheet1.xml" -> sheet)
    assert(OfficeText.xlsx(b).toString ==
      "alpha\t42.5\nrich\tinline\n")
    assert(DocumentText.parse(b).toString == "alpha\t42.5\nrich\tinline\n")
  }

  test("xlsx: multiple sheets in numeric order; no shared table needed") {
    def sheet(v: String) = s"""<worksheet xmlns="$S"><sheetData>""" +
      s"""<row><c t="inlineStr"><is><t>$v</t></is></c></row>""" +
      "</sheetData></worksheet>"
    val b = zipOf(
      "xl/worksheets/sheet2.xml" -> sheet("second"),
      "xl/worksheets/sheet1.xml" -> sheet("first"))
    assert(OfficeText.xlsx(b).toString == "first\nsecond\n")
  }

  test("triage: wrong container, malformed xml, bad shared index") {
    assert(OfficeText.pptx(null) == null)
    assert(OfficeText.pptx("not a zip".getBytes) == null)
    assert(OfficeText.xlsx(zipOf("other.txt" -> "x")) == null)
    // malformed slide xml: that slide contributes nothing
    val b = zipOf(
      "ppt/slides/slide1.xml" -> "<broken",
      "ppt/slides/slide2.xml" -> slide("still here"))
    assert(OfficeText.pptx(b).toString == "still here\n")
    // out-of-range shared index → empty cell, not a crash
    val sheet = s"""<worksheet xmlns="$S"><sheetData>""" +
      """<row><c t="s"><v>99</v></c>""" +
      """<c t="inlineStr"><is><t>ok</t></is></c></row>""" +
      "</sheetData></worksheet>"
    assert(OfficeText.xlsx(zipOf("xl/worksheets/sheet1.xml" -> sheet))
      .toString == "\tok\n")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** ODF (odt/ods/odp) extraction — OPC-style zips with the
  * spec-mandated STORED `mimetype` first entry, content.xml per the
  * OASIS schemas; the JDK zip writer is the independent producer for
  * the hand zip walk.
  */
class OdfTextSpec extends AnyFunSuite {

  import graft.expr.{DocumentText, OdfText}

  private val O =
    "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
  private val T = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
  private val Tb = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
  private val D = "urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"

  private def odfZip(mime: String, contentXml: String,
      withContent: Boolean = true): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    val mb = mime.getBytes("UTF-8")
    val e = new java.util.zip.ZipEntry("mimetype")
    e.setMethod(java.util.zip.ZipEntry.STORED)
    e.setSize(mb.length); e.setCompressedSize(mb.length)
    val crc = new java.util.zip.CRC32(); crc.update(mb)
    e.setCrc(crc.getValue)
    z.putNextEntry(e); z.write(mb); z.closeEntry()
    if (withContent) {
      z.putNextEntry(new java.util.zip.ZipEntry("content.xml"))
      z.write(contentXml.getBytes("UTF-8")); z.closeEntry()
    }
    z.close(); bos.toByteArray
  }

  private def odt(body: String): Array[Byte] =
    odfZip("application/vnd.oasis.opendocument.text",
      s"""<office:document-content xmlns:office="$O" xmlns:text="$T">""" +
        s"<office:body><office:text>$body</office:text></office:body>" +
        "</office:document-content>")

  private def ods(body: String): Array[Byte] =
    odfZip("application/vnd.oasis.opendocument.spreadsheet",
      s"""<office:document-content xmlns:office="$O" xmlns:text="$T"""" +
        s""" xmlns:table="$Tb"><office:body><office:spreadsheet>""" +
        s"$body</office:spreadsheet></office:body>" +
        "</office:document-content>")

  private def odp(body: String): Array[Byte] =
    odfZip("application/vnd.oasis.opendocument.presentation",
      s"""<office:document-content xmlns:office="$O" xmlns:text="$T"""" +
        s""" xmlns:draw="$D"><office:body><office:presentation>""" +
        s"$body</office:presentation></office:body>" +
        "</office:document-content>")

  test("odt: paragraphs, headings, spans, ODF whitespace elements") {
    val b = odt(
      "<text:h>Title</text:h>" +
        "<text:p>first <text:span>spanned</text:span> para</text:p>" +
        "<text:p>a<text:tab/>b<text:s text:c=\"3\"/>c" +
        "<text:line-break/>d</text:p>" +
        "<text:p></text:p>") // empty paragraph: no line
    assert(OdfText.parse(b).toString ==
      "Title\nfirst spanned para\na\tb   c\nd\n")
    assert(DocumentText.parse(b).toString ==
      "Title\nfirst spanned para\na\tb   c\nd\n")
  }

  test("ods: rows tab-joined, repeats expand non-empty and collapse empty") {
    val b = ods(
      "<table:table><table:table-row>" +
        "<table:table-cell><text:p>alpha</text:p></table:table-cell>" +
        "<table:table-cell><text:p>42.5</text:p></table:table-cell>" +
        "</table:table-row><table:table-row>" +
        "<table:table-cell table:number-columns-repeated=\"3\">" +
        "<text:p>x</text:p></table:table-cell>" +
        "<table:table-cell table:number-columns-repeated=\"900\"/>" +
        "</table:table-row><table:table-row>" +
        "<table:table-cell/><table:table-cell>" +
        "<text:p>mid</text:p><text:p>second para</text:p>" +
        "</table:table-cell><table:table-cell/>" +
        "</table:table-row><table:table-row>" +
        "<table:table-cell table:number-columns-repeated=\"500\"/>" +
        "</table:table-row></table:table>")
    assert(OdfText.parse(b).toString ==
      "alpha\t42.5\nx\tx\tx\n\tmid second para\n")
    assert(DocumentText.parse(b).toString ==
      "alpha\t42.5\nx\tx\tx\n\tmid second para\n")
    // number-rows-repeated re-emits non-empty rows; a million-row
    // empty filler block (the LibreOffice tail) emits nothing
    val r = ods(
      "<table:table><table:table-row table:number-rows-repeated=\"3\">" +
        "<table:table-cell><text:p>thrice</text:p></table:table-cell>" +
        "</table:table-row>" +
        "<table:table-row table:number-rows-repeated=\"1048576\"/>" +
        "</table:table>")
    assert(OdfText.parse(r).toString == "thrice\nthrice\nthrice\n")
  }

  test("odp: pages' frame paragraphs in document order") {
    val b = odp(
      "<draw:page><draw:frame><draw:text-box>" +
        "<text:p>deck title</text:p><text:p>point one</text:p>" +
        "</draw:text-box></draw:frame></draw:page>" +
        "<draw:page><draw:frame><draw:text-box>" +
        "<text:p>closing</text:p></draw:text-box></draw:frame>" +
        "</draw:page>")
    assert(OdfText.parse(b).toString == "deck title\npoint one\nclosing\n")
    assert(DocumentText.parse(b).toString ==
      "deck title\npoint one\nclosing\n")
  }

  test("annotations (reviewer comments) do not extract as body text") {
    // office:annotation carries its own text:p paragraphs — both as a
    // paragraph SIBLING and anchored INSIDE a paragraph they must not
    // leak into the extracted form (the DOCX comment convention)
    val b = odt(
      "<text:p>before</text:p>" +
      s"""<office:annotation><text:p>sibling comment</text:p>""" +
      "</office:annotation>" +
      "<text:p>mid<office:annotation><text:p>inline comment</text:p>" +
      "</office:annotation>dle</text:p>" +
      "<text:p>after</text:p>")
    assert(OdfText.parse(b).toString == "before\nmiddle\nafter\n")
    // ods: a cell's annotation paragraph is not cell content
    val sheet = ods(
      "<table:table><table:table-row>" +
        "<table:table-cell><office:annotation><text:p>note</text:p>" +
        "</office:annotation><text:p>v1</text:p></table:table-cell>" +
        "<table:table-cell><text:p>v2</text:p></table:table-cell>" +
        "</table:table-row></table:table>")
    assert(OdfText.parse(sheet).toString == "v1\tv2\n")
  }

  test("odt/docx twin identity: same paragraphs, identical extraction") {
    val w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write((s"""<w:document xmlns:w="$w"><w:body>""" +
      "<w:p><w:r><w:t>shared body</w:t></w:r></w:p>" +
      "<w:p><w:r><w:t>second line</w:t></w:r></w:p>" +
      "</w:body></w:document>").getBytes("UTF-8"))
    z.closeEntry(); z.close()
    val legacy = odt("<text:p>shared body</text:p>" +
      "<text:p>second line</text:p>")
    val a = DocumentText.parse(legacy)
    val m = DocumentText.parse(bos.toByteArray)
    assert(a != null && m != null && a.toString == m.toString)
  }

  test("triage: graphics mimetype, missing content.xml, malformed xml, not a zip") {
    assert(OdfText.parse(null) == null)
    assert(OdfText.parse("not a zip".getBytes) == null)
    assert(OdfText.parse(odfZip(
      "application/vnd.oasis.opendocument.graphics",
      "<x/>")) == null)
    assert(OdfText.parse(odfZip(
      "application/vnd.oasis.opendocument.text", "", withContent = false))
      == null)
    assert(OdfText.parse(odfZip(
      "application/vnd.oasis.opendocument.text", "<unclosed")) == null)
    // an EPUB is NOT misrouted: no ODF mimetype → the EPUB arm
    assert(OdfText.parse(odfZip("application/epub+zip", "<x/>")) == null)
  }

  test("graft_odf_text evaluates through SQL and codegen") {
    val spark = SparkSpec.session
    Graft.tune(spark)
    import spark.implicits._
    val df = Seq(Tuple1(odt("<text:p>sql para</text:p>"))).toDF("b")
    df.createOrReplaceTempView("odf_docs")
    val row = spark.sql(
      """SELECT graft_odf_text(b) AS t, graft_document_text(b) AS d
         FROM odf_docs""").head()
    assert(row.getString(0) == "sql para\n")
    assert(row.getString(1) == "sql para\n")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** vCard / iCalendar extraction — content-line unfolding, vCard-2.1
  * quoted-printable, structured-value joins, per-component emission;
  * fixtures are hand-authored per the RFCs (the mbox/eml precedent
  * for text wire formats).
  */
class VcardTextSpec extends AnyFunSuite {

  import graft.expr.{DocumentText, VcardText}

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("vcard 3.0: FN/ORG/EMAIL in document order, folded lines unfold") {
    val v = "BEGIN:VCARD\r\nVERSION:3.0\r\n" +
      "FN:Ada Love\r\n lace\r\n" + // folded continuation
      "ORG:Analytical Engines;R&D\r\n" +
      "EMAIL;TYPE=work:ada@engines.example\r\n" +
      "PHOTO;ENCODING=b;TYPE=JPEG:AAAA\r\n" + // binary: skipped
      "END:VCARD\r\n"
    assert(VcardText.vcard(b(v)).toString ==
      "Ada Lovelace\nAnalytical Engines R&D\nada@engines.example\n")
  }

  test("multiple cards: blank line between, N components join, escapes") {
    val v = "BEGIN:VCARD\nFN:First Person\nEND:VCARD\n" +
      "BEGIN:VCARD\nN:Doe;Jane;;Dr.;\n" +
      "NOTE:line one\\nline two\\, with comma\nEND:VCARD\n"
    assert(VcardText.vcard(b(v)).toString ==
      "First Person\n\nDoe Jane Dr.\nline one\nline two, with comma\n")
  }

  test("vcard 2.1 quoted-printable with soft break decodes") {
    val v = "BEGIN:VCARD\r\n" +
      "NOTE;ENCODING=QUOTED-PRINTABLE;CHARSET=UTF-8:caf=C3=A9 r=\r\n" +
      "eport\r\n" +
      "END:VCARD\r\n"
    assert(VcardText.vcard(b(v)).toString == "café report\n")
  }

  test("ics: SUMMARY/DESCRIPTION/LOCATION per component, shell skipped") {
    val v = "BEGIN:VCALENDAR\r\nVERSION:2.0\r\nPRODID:-//x//y//EN\r\n" +
      "BEGIN:VEVENT\r\nUID:1@x\r\nDTSTART:20260817T090000Z\r\n" +
      "SUMMARY:Quarterly review\r\n" +
      "DESCRIPTION:Agenda\\nfollows\r\n" +
      "LOCATION:Room 4\r\n" +
      "END:VEVENT\r\n" +
      "BEGIN:VTODO\r\nSUMMARY:Ship round 16\r\nEND:VTODO\r\n" +
      "END:VCALENDAR\r\n"
    assert(VcardText.ics(b(v)).toString ==
      "Quarterly review\nAgenda\nfollows\nRoom 4\n\nShip round 16\n")
  }

  test("a param value carrying a colon does not split the line early") {
    val v = "BEGIN:VCARD\nFN:X\n" +
      "URL;LABEL=\"see: here\":https://example.org/a\nEND:VCARD\n"
    assert(VcardText.vcard(b(v)).toString ==
      "X\nhttps://example.org/a\n")
  }

  test("graft_document_text routes both; BOM tolerated") {
    val card = "BEGIN:VCARD\nFN:Routed Person\nEND:VCARD\n"
    assert(DocumentText.parse(b(card)).toString == "Routed Person\n")
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      b("begin:vcalendar\nBEGIN:VEVENT\nSUMMARY:s1\nEND:VEVENT\n" +
        "END:VCALENDAR\n")
    assert(DocumentText.parse(bom).toString == "s1\n")
  }

  test("triage: not a card, empty card, plain text, mail not misrouted") {
    assert(VcardText.vcard(null) == null)
    assert(VcardText.vcard(b("FN:no begin\n")) == null)
    assert(VcardText.vcard(b("BEGIN:VCARD\nVERSION:4.0\nEND:VCARD\n"))
      == null)
    assert(VcardText.ics(b("BEGIN:VCALENDAR\nEND:VCALENDAR\n")) == null)
    // a message whose body MENTIONS BEGIN:VCARD still routes as mail
    val mail = "Subject: cards\n\nBEGIN:VCARD text in a body\n"
    assert(DocumentText.parse(b(mail)) != null &&
      DocumentText.parse(b(mail)).toString.startsWith("Subject: cards"))
  }

  test("graft_vcard_text / graft_ics_text evaluate through SQL") {
    val spark = SparkSpec.session
    Graft.tune(spark)
    import spark.implicits._
    val card = b("BEGIN:VCARD\nFN:Sql Person\nTEL:+1 555 0100\nEND:VCARD\n")
    val cal = b("BEGIN:VCALENDAR\nBEGIN:VEVENT\nSUMMARY:standup\n" +
      "END:VEVENT\nEND:VCALENDAR\n")
    Seq((card, cal)).toDF("c", "k").createOrReplaceTempView("vc_docs")
    val row = spark.sql(
      """SELECT graft_vcard_text(c), graft_ics_text(k),
                graft_document_text(c) FROM vc_docs""").collect()(0)
    assert(row.getString(0) == "Sql Person\n+1 555 0100\n")
    assert(row.getString(1) == "standup\n")
    assert(row.getString(2) == row.getString(0))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** TNEF (winmail.dat) extraction — attribute stream with verified
  * byte-sum checksums, MAPI property lists; [[TnefBuild]] (its own
  * emitter + checksum + MAPI encoder) is the independent producer.
  */
class TnefSpec extends AnyFunSuite {

  import graft.expr.{DocumentText, Tnef, TnefBuild}
  import graft.expr.TnefBuild.Attach

  test("plain attributes: subject + body in the eml convention") {
    val b = TnefBuild.tnef("status update", "line one\r\nline two")
    assert(Tnef.parse(b).toString ==
      "Subject: status update\n\nline one\nline two\n")
  }

  test("MAPI-props message: named + fixed props skip, unicode body decodes") {
    val b = TnefBuild.tnef("über réport", "unicode λ body", viaMapi = true)
    assert(Tnef.parse(b).toString ==
      "Subject: über réport\n\nunicode λ body\n")
  }

  test("attachments: title, long-name preference, mime, by-value and MAPI binary") {
    val b = TnefBuild.tnef("s", "b", atts = Seq(
      Attach("SHORT~1.PDF", longName = "quarterly report.pdf",
        mime = "Application/PDF", content = "pdf!".getBytes("UTF-8")),
      Attach("plain.txt", content = "by title".getBytes("UTF-8")),
      Attach("viamapi.bin", content = Array[Byte](5, 4, 3),
        byValue = false)))
    val rows = Tnef.attachments(b, 16)
    assert(rows != null && rows.numElements() == 3)
    val r0 = rows.getStruct(0, 3)
    assert(r0.getUTF8String(0).toString == "quarterly report.pdf")
    assert(r0.getUTF8String(1).toString == "application/pdf")
    assert(new String(r0.getBinary(2), "UTF-8") == "pdf!")
    val r1 = rows.getStruct(1, 3)
    assert(r1.getUTF8String(0).toString == "plain.txt")
    assert(r1.getUTF8String(1).toString == "application/octet-stream")
    assert(new String(r1.getBinary(2), "UTF-8") == "by title")
    val r2 = rows.getStruct(2, 3)
    assert(r2.getUTF8String(0).toString == "viamapi.bin")
    assert(r2.getBinary(2).toSeq == Seq[Byte](5, 4, 3))
  }

  test("a corrupted attribute checksum fails the whole parse closed") {
    val b = TnefBuild.tnef("subject", "payload body text")
    // flip one byte inside the body attribute's payload — the
    // attribute's own checksum must catch it
    val at = {
      val pat = "payload".getBytes("ISO-8859-1")
      (0 until b.length - pat.length).find(i =>
        b.slice(i, i + pat.length).sameElements(pat)).get
    }
    b(at) = (b(at) ^ 0x20).toByte
    assert(Tnef.parse(b) == null)
  }

  test("triage: not tnef, truncations, hostile declared length") {
    assert(Tnef.parse(null) == null)
    assert(Tnef.parse("plain".getBytes) == null)
    val whole = TnefBuild.tnef("s", "body", atts = Seq(
      Attach("a.txt", content = "x".getBytes)))
    (0 until whole.length).foreach { cut =>
      Tnef.parse(java.util.Arrays.copyOf(whole, cut))
      Tnef.attachments(java.util.Arrays.copyOf(whole, cut), 4)
    }
    // a declared length past the end must not wrap or scan past
    val bomb = java.util.Arrays.copyOf(whole, whole.length)
    bomb(11) = 0xff.toByte; bomb(12) = 0xff.toByte
    bomb(13) = 0xff.toByte; bomb(14) = 0x7f.toByte
    assert(Tnef.parse(bomb) == null)
    // no attachments → null, not empty
    assert(Tnef.attachments(TnefBuild.tnef("s", "b"), 4) == null)
  }

  test("graft_document_text routes the tnef arm") {
    val b = TnefBuild.tnef("routed", "winmail body")
    assert(DocumentText.parse(b).toString ==
      "Subject: routed\n\nwinmail body\n")
  }

  test("graft_tnef_text / graft_tnef_attachments evaluate through SQL") {
    val spark = SparkSpec.session
    Graft.tune(spark)
    import spark.implicits._
    val b = TnefBuild.tnef("sql subj", "sql body", atts = Seq(
      Attach("x.txt", mime = "text/plain",
        content = "payload".getBytes("UTF-8"))))
    Seq(Tuple1(b)).toDF("b").createOrReplaceTempView("tnef_docs")
    val row = spark.sql(
      """SELECT graft_tnef_text(b) AS t,
                graft_tnef_attachments(b)[0].name AS n,
                graft_tnef_attachments(b)[0].mime AS m
           FROM tnef_docs""").collect()(0)
    assert(row.getString(0) == "Subject: sql subj\n\nsql body\n")
    assert(row.getString(1) == "x.txt")
    assert(row.getString(2) == "text/plain")
  }
}

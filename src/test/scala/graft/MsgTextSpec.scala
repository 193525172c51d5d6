package graft

import org.scalatest.funsuite.AnyFunSuite

/** Outlook `.msg` extraction — [MS-OXMSG] property substreams and
  * attachment storages over the compound-file shell; [[MsgBuild]]
  * (its own tree-capable CFB writer) is the independent producer for
  * the [[Cfb]] directory-tree walk + [[MsgText]] reading direction.
  */
class MsgTextSpec extends AnyFunSuite {

  import graft.expr.{DocBuild, DocumentText, MsgBuild, MsgText}

  test("unicode subject + body extract in the eml output convention") {
    val b = MsgBuild.msg("quarterly results",
      "line one\r\nline two\r\n")
    assert(MsgText.parse(b).toString ==
      "Subject: quarterly results\n\nline one\nline two\n")
  }

  test("ansi (001E) property streams decode as cp1252") {
    val b = MsgBuild.msg("café notes", "résumé body",
      unicode = false)
    assert(MsgText.parse(b).toString ==
      "Subject: café notes\n\nrésumé body\n")
  }

  test("subject-only and body-only messages still extract; empty is null") {
    assert(MsgText.parse(MsgBuild.msg("just subject", null)).toString ==
      "Subject: just subject\n\n")
    assert(MsgText.parse(MsgBuild.msg(null, "just body")).toString ==
      "just body\n")
    assert(MsgText.parse(MsgBuild.msg(null, null)) == null)
  }

  test("attachments: long-name preference, mime, content, #index order") {
    val b = MsgBuild.msg("s", "b", atts = Seq(
      ("report.pdf", "Application/PDF", "pdf bytes".getBytes("UTF-8")),
      ("memo.txt", "text/plain", "memo bytes".getBytes("UTF-8"))))
    val rows = MsgText.attachments(b, 16)
    assert(rows != null && rows.numElements() == 2)
    val r0 = rows.getStruct(0, 3)
    assert(r0.getUTF8String(0).toString == "report.pdf")
    assert(r0.getUTF8String(1).toString == "application/pdf")
    assert(new String(r0.getBinary(2), "UTF-8") == "pdf bytes")
    val r1 = rows.getStruct(1, 3)
    assert(r1.getUTF8String(0).toString == "memo.txt")
    assert(new String(r1.getBinary(2), "UTF-8") == "memo bytes")
  }

  test("repeating substream names across attachment storages do not collide") {
    // both attachments carry __substg1.0_37010102 — only the
    // path-qualified directory tree keeps them apart
    val b = MsgBuild.msg("s", "b", atts = Seq(
      ("a.bin", "application/octet-stream", Array[Byte](1, 2, 3)),
      ("b.bin", "application/octet-stream", Array[Byte](9, 8, 7, 6))))
    val rows = MsgText.attachments(b, 16)
    assert(rows != null && rows.numElements() == 2)
    assert(rows.getStruct(0, 3).getBinary(2).toSeq == Seq[Byte](1, 2, 3))
    assert(rows.getStruct(1, 3).getBinary(2).toSeq == Seq[Byte](9, 8, 7, 6))
  }

  test("embedded message: text appends its subject/body, attachments recurse") {
    val inner = MsgBuild.msgEntries("fwd: inner", "inner body",
      atts = Seq(("deep.txt", "text/plain", "deep bytes".getBytes("UTF-8"))))
    val b = MsgBuild.msg("outer", "outer body",
      atts = Seq(("top.txt", "text/plain", "top bytes".getBytes("UTF-8"))),
      embedded = Seq(inner))
    assert(MsgText.parse(b).toString ==
      "Subject: outer\n\nouter body\n" +
        "Subject: fwd: inner\n\ninner body\n")
    val rows = MsgText.attachments(b, 16)
    assert(rows != null && rows.numElements() == 2)
    assert(rows.getStruct(0, 3).getUTF8String(0).toString == "top.txt")
    assert(rows.getStruct(1, 3).getUTF8String(0).toString == "deep.txt")
    assert(new String(rows.getStruct(1, 3).getBinary(2), "UTF-8") ==
      "deep bytes")
  }

  test("graft_document_text routes the CFB msg arm") {
    val b = MsgBuild.msg("routed", "via dispatch")
    assert(DocumentText.parse(b).toString ==
      "Subject: routed\n\nvia dispatch\n")
  }

  test("triage: .doc CFBs, non-CFB bytes, truncated containers") {
    // a Word CFB is not a message
    val doc = DocBuild.doc(Seq(("word text", true)))
    assert(MsgText.parse(doc) == null)
    assert(MsgText.parse(null) == null)
    assert(MsgText.parse("plain text".getBytes("UTF-8")) == null)
    assert(MsgText.attachments("plain".getBytes("UTF-8"), 4) == null)
    val whole = MsgBuild.msg("s", "b")
    val torn = java.util.Arrays.copyOf(whole, whole.length / 3)
    assert(MsgText.parse(torn) == null) // torn mid-container
    // attachments absent → null, not empty array
    assert(MsgText.attachments(MsgBuild.msg("s", "b"), 4) == null)
  }

  test("hostile sibling cycle in the directory tree cannot hang") {
    val b = MsgBuild.msg("cycle", "body")
    // locate the subject entry by its UTF-16LE directory name and
    // point its right-sibling at ITSELF; the walk's visited set must
    // terminate and the rest of the tree still reads
    // directory entries land 128-aligned in the file (512-byte
    // header + 512-byte sectors); entry 1 — the subject stream in
    // MsgBuild's layout — gets right-sibling = 1, a self-loop
    val name = "__substg1.0_0037001F".flatMap(c =>
      Seq(c.toByte, 0.toByte)).toArray
    var at = -1
    var i = 0
    while (at < 0 && i + name.length <= b.length) {
      if (b.slice(i, i + name.length).sameElements(name)) at = i
      i += 128
    }
    assert(at >= 0)
    b(at + 72) = 1; b(at + 73) = 0; b(at + 74) = 0; b(at + 75) = 0
    val out = MsgText.parse(b)
    assert(out != null && out.toString.contains("body"))
  }

  test("graft_msg_text and graft_msg_attachments evaluate through SQL") {
    val spark = SparkSpec.session
    Graft.tune(spark)
    import spark.implicits._
    val b = MsgBuild.msg("sql subject", "sql body",
      atts = Seq(("x.txt", "text/plain", "payload".getBytes("UTF-8"))))
    Seq(Tuple1(b)).toDF("b").createOrReplaceTempView("msg_docs")
    val row = spark.sql(
      """SELECT graft_msg_text(b) AS t,
                graft_msg_attachments(b)[0].name AS n,
                graft_document_text(graft_msg_attachments(b)[0].content)
           FROM msg_docs""").collect()(0)
    assert(row.getString(0) == "Subject: sql subject\n\nsql body\n")
    assert(row.getString(1) == "x.txt")
  }
}

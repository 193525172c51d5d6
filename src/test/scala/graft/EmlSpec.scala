package graft

import org.scalatest.funsuite.AnyFunSuite

/** Email / mbox extraction — fixtures constructed textually per
  * RFC 5322/2045/2047 with the JDK Base64 ENCODER and a hand QP
  * encoder (the decode direction shares nothing with the writer
  * side, so decode(construct(·)) is a genuine differential).
  */
class EmlSpec extends AnyFunSuite {

  import graft.expr.EmlText

  private def iso(s: String) = s.getBytes("ISO-8859-1")

  private def b64(s: String, cs: String = "UTF-8"): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes(cs))

  /** Independent QP encoder: escapes every non-printable + '='. */
  private def qp(s: String, cs: String = "UTF-8"): String = {
    val bytes = s.getBytes(cs)
    val sb = new StringBuilder
    bytes.foreach { b =>
      val c = b & 0xff
      if (c == '=' || c < 32 || c > 126)
        sb.append(f"=${c}%02X")
      else sb.append(c.toChar)
    }
    sb.toString
  }

  test("plain text message: subject + body, CRLF and LF forms") {
    val crlf = iso("From: a@example.com\r\nSubject: Hello there\r\n" +
      "Date: Mon, 1 Jan 2026 00:00:00 +0000\r\n\r\n" +
      "line one\r\nline two\r\n")
    assert(EmlText.parse(crlf).toString ==
      "Subject: Hello there\n\nline one\nline two\n")
    val lf = iso("From: a@example.com\nSubject: Hello there\n\n" +
      "line one\nline two\n")
    assert(EmlText.parse(lf).toString ==
      "Subject: Hello there\n\nline one\nline two\n")
  }

  test("folded headers and RFC 2047 encoded words (B and Q)") {
    val subj = s"=?UTF-8?B?${b64("café réunion")}?="
    val m = iso("From: x@y.z\n" +
      s"Subject: $subj\n" +
      " =?ISO-8859-1?Q?suite_d=E9cod=E9e?=\n\n" + // folded + Q-word
      "body\n")
    assert(EmlText.parse(m).toString ==
      "Subject: café réunionsuite décodée\n\nbody\n")
  }

  test("quoted-printable body with soft line breaks") {
    val body = "é gets escaped and this line is soft=\nbroken =3D kept"
    val m = iso("From: q@example.com\nSubject: QP\n" +
      "Content-Type: text/plain; charset=utf-8\n" +
      "Content-Transfer-Encoding: quoted-printable\n\n" +
      qp("é gets escaped ", "UTF-8") + "and this line is soft=\n" +
      "broken =3D kept\n")
    assert(EmlText.parse(m).toString ==
      "Subject: QP\n\né gets escaped and this line is soft" +
        "broken = kept\n")
  }

  test("base64 body decodes with its declared charset") {
    val m = iso("From: b@example.com\nSubject: B64\n" +
      "Content-Type: text/plain; charset=iso-8859-1\n" +
      "Content-Transfer-Encoding: base64\n\n" +
      b64("déjà vu encoded", "ISO-8859-1") + "\n")
    assert(EmlText.parse(m).toString ==
      "Subject: B64\n\ndéjà vu encoded\n")
  }

  test("multipart/alternative picks text/plain over text/html") {
    val m = iso("From: m@example.com\nSubject: Alt\n" +
      "MIME-Version: 1.0\n" +
      "Content-Type: multipart/alternative; boundary=\"XX\"\n\n" +
      "preamble is ignored\n" +
      "--XX\nContent-Type: text/html\n\n<p>html <b>form</b></p>\n" +
      "--XX\nContent-Type: text/plain\n\nplain form\n" +
      "--XX--\nepilogue\n")
    assert(EmlText.parse(m).toString == "Subject: Alt\n\nplain form\n")
  }

  test("multipart/mixed walks text parts in order, skips attachments") {
    val m = iso("From: m@example.com\nSubject: Mixed\n" +
      "Content-Type: multipart/mixed; boundary=outer\n\n" +
      "--outer\nContent-Type: text/plain\n\nintro text\n" +
      "--outer\nContent-Type: application/pdf\n" +
      "Content-Transfer-Encoding: base64\n\n" + b64("%PDF-fake") + "\n" +
      "--outer\nContent-Type: multipart/alternative; boundary=inner\n\n" +
      "--inner\nContent-Type: text/plain\n\nnested alt\n" +
      "--inner--\n" +
      "--outer\nContent-Type: text/html\n\n<p>closing <i>html</i></p>\n" +
      "--outer--\n")
    assert(EmlText.parse(m).toString ==
      "Subject: Mixed\n\nintro text\nnested alt\nclosing html\n")
  }

  test("uuencoded blocks strip from plain bodies (pre-MIME lists)") {
    val m = iso("From: u@example.com\nSubject: Uu\n\n" +
      "the patch follows\n" +
      "begin 644 patch.bin\n" +
      "M4$L#!!0````(`*5C:5,`````\n" +
      "`\n" +
      "end\n" +
      "thanks for reviewing\n")
    assert(EmlText.parse(m).toString ==
      "Subject: Uu\n\nthe patch follows\nthanks for reviewing\n")
    // a body merely MENTIONING 'begin' mid-line is untouched
    val n = iso("From: u@example.com\nSubject: Uu2\n\n" +
      "we begin 644 times a day\n")
    assert(EmlText.parse(n).toString ==
      "Subject: Uu2\n\nwe begin 644 times a day\n")
  }

  test("a boundary that PREFIXES another string does not false-match") {
    // body lines starting with --XXY must not terminate parts of
    // boundary XX (RFC 2046: the delimiter is a full line)
    val m = iso("From: p@example.com\nSubject: Pfx\n" +
      "Content-Type: multipart/mixed; boundary=XX\n\n" +
      "--XX\nContent-Type: text/plain\n\nkeep this\n--XXY not a delim\n" +
      "and this\n" +
      "--XX--\n")
    assert(EmlText.parse(m).toString ==
      "Subject: Pfx\n\nkeep this\n--XXY not a delim\nand this\n")
  }

  test("mbox splits messages and unescapes >From quoting") {
    val mbox = iso("From alice Mon Jan  1 00:00:00 2026\n" +
      "From: alice@example.com\nSubject: One\n\n" +
      "first body\n>From here it continues\n" +
      "\nFrom bob Mon Jan  1 00:01:00 2026\n" +
      "From: bob@example.com\nSubject: Two\n\nsecond body\n")
    val arr = EmlText.mbox(mbox, 16)
    assert(arr != null && arr.numElements() == 2)
    val m1 = EmlText.parse(arr.getBinary(0))
    val m2 = EmlText.parse(arr.getBinary(1))
    assert(m1.toString ==
      "Subject: One\n\nfirst body\nFrom here it continues\n")
    assert(m2.toString == "Subject: Two\n\nsecond body\n")
  }

  test("a single message tolerates a stray mbox envelope line") {
    val m = iso("From alice Mon Jan 1 00:00:00 2026\n" +
      "From: alice@example.com\nSubject: Stray\n\nbody\n")
    assert(EmlText.parse(m).toString == "Subject: Stray\n\nbody\n")
  }

  test("triage: not a message, no headers, torn base64, junk") {
    assert(EmlText.parse(null) == null)
    assert(EmlText.parse(iso("just some text, no headers")) == null)
    assert(EmlText.parse(iso("Key: value\n\nno mail headers\n")) == null)
    assert(EmlText.mbox(iso("not an mbox"), 4) == null)
    val torn = iso("From: t@example.com\nSubject: T\n" +
      "Content-Transfer-Encoding: base64\n\n!!!not base64!!!\n")
    // torn leaf contributes nothing; the subject alone survives
    assert(EmlText.parse(torn).toString == "Subject: T\n\n")
  }

  test("graft_document_text dispatches mail, plain text still NULL") {
    import graft.expr.DocumentText
    val m = iso("From: d@example.com\nSubject: Via dispatch\n\nbody\n")
    assert(DocumentText.parse(m).toString ==
      "Subject: Via dispatch\n\nbody\n")
    // ordinary prose — even colon-bearing — stays NULL
    assert(DocumentText.parse(iso("plain text, not a document")) == null)
    assert(DocumentText.parse(iso("note: this has a colon\nbut no mail"))
      == null)
    // a From:-leading line WITHOUT a header block stays NULL too
    assert(DocumentText.parse(iso("From: the start of a novel")) == null)
  }

  test("both functions evaluate through SQL and codegen") {
    val spark = SparkSpec.session
    Graft.tune(spark)
    import spark.implicits._
    val eml = iso("From: s@example.com\nSubject: Sql\n\nsql body\n")
    val mbox = iso("From s\nFrom: s@example.com\nSubject: M\n\nmb\n")
    val df = Seq((eml, mbox)).toDF("e", "m")
    df.createOrReplaceTempView("mail_docs")
    val row = spark.sql(
      """SELECT graft_eml_text(e) AS t,
               size(graft_mbox_messages(m, 8)) AS n,
               graft_eml_text(graft_mbox_messages(m, 8)[0]) AS t0
         FROM mail_docs""").head()
    assert(row.getString(0) == "Subject: Sql\n\nsql body\n")
    assert(row.getInt(1) == 1)
    assert(row.getString(2) == "Subject: M\n\nmb\n")
  }
}

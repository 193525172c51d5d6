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

  test("mboxcl: Content-Length splits verbatim across hostile bodies") {
    // the body carries an UNESCAPED "From " line after a blank line —
    // exactly what breaks delimiter scanning and what mboxcl exists
    // for; the counted split must win and keep the body verbatim
    val body1 = "quote follows\n\nFrom the archive it reads\nend quote\n"
    val mbox = iso("From a Mon Jan  1 00:00:00 2026\n" +
      "From: a@example.com\nSubject: CL\n" +
      s"Content-Length: ${body1.length}\n\n" + body1 +
      "From b Mon Jan  1 00:01:00 2026\n" +
      "From: b@example.com\nSubject: Two\n\nsecond body\n")
    val arr = EmlText.mbox(mbox, 16)
    assert(arr != null && arr.numElements() == 2)
    assert(EmlText.parse(arr.getBinary(0)).toString ==
      "Subject: CL\n\n" +
        "quote follows\n\nFrom the archive it reads\nend quote\n")
    assert(EmlText.parse(arr.getBinary(1)).toString ==
      "Subject: Two\n\nsecond body\n")
    // mboxcl bodies do NOT unquote >From (the variant never escapes)
    val body2 = ">From stays literal\n"
    val mb2 = iso("From a Mon Jan  1 00:00:00 2026\n" +
      "From: a@example.com\nSubject: V\n" +
      s"Content-Length: ${body2.length}\n\n" + body2)
    val a2 = EmlText.mbox(mb2, 4)
    assert(a2 != null && a2.numElements() == 1)
    assert(EmlText.parse(a2.getBinary(0)).toString ==
      "Subject: V\n\n>From stays literal\n")
  }

  test("mboxcl: a lying Content-Length falls back to delimiter scan") {
    // the declared length lands mid-body (no From line there), so the
    // scan rules apply and the blank-line+From split happens
    val mbox = iso("From a Mon Jan  1 00:00:00 2026\n" +
      "From: a@example.com\nSubject: Lie\n" +
      "Content-Length: 3\n\n" +
      "first body\n" +
      "\nFrom b Mon Jan  1 00:01:00 2026\n" +
      "From: b@example.com\nSubject: Two\n\nsecond body\n")
    val arr = EmlText.mbox(mbox, 16)
    assert(arr != null && arr.numElements() == 2)
    assert(EmlText.parse(arr.getBinary(0)).toString ==
      "Subject: Lie\n\nfirst body\n")
    assert(EmlText.parse(arr.getBinary(1)).toString ==
      "Subject: Two\n\nsecond body\n")
    // an over-long Content-Length (past EOF) also falls back
    val over = iso("From a Mon Jan  1 00:00:00 2026\n" +
      "From: a@example.com\nSubject: O\nContent-Length: 99999\n\nbody\n")
    val a2 = EmlText.mbox(over, 4)
    assert(a2 != null && a2.numElements() == 1)
    assert(EmlText.parse(a2.getBinary(0)).toString ==
      "Subject: O\n\nbody\n")
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

  test("attachments: disposition, filename fallback, non-text media") {
    val pdf = "%PDF-1.4 fake body"
    val m = iso("From: a@example.com\nSubject: Att\n" +
      "Content-Type: multipart/mixed; boundary=bb\n\n" +
      "--bb\nContent-Type: text/plain\n\ncover note\n" +
      "--bb\nContent-Type: application/pdf\n" +
      "Content-Disposition: attachment; filename=\"report.pdf\"\n" +
      "Content-Transfer-Encoding: base64\n\n" + b64(pdf) + "\n" +
      // filename only via Content-Type name= (no disposition)
      "--bb\nContent-Type: text/csv; name=data.csv\n\na,b\n1,2\n" +
      // non-text media type with no name at all
      "--bb\nContent-Type: image/png\n" +
      "Content-Transfer-Encoding: base64\n\n" + b64("PNGBYTES") + "\n" +
      "--bb--\n")
    val arr = EmlText.attachments(m, 16)
    assert(arr != null && arr.numElements() == 3)
    val r0 = arr.getStruct(0, 3)
    assert(r0.getUTF8String(0).toString == "report.pdf")
    assert(r0.getUTF8String(1).toString == "application/pdf")
    assert(new String(r0.getBinary(2), "ISO-8859-1") == pdf)
    val r1 = arr.getStruct(1, 3)
    assert(r1.getUTF8String(0).toString == "data.csv")
    assert(r1.getUTF8String(1).toString == "text/csv")
    assert(new String(r1.getBinary(2), "ISO-8859-1") == "a,b\n1,2")
    val r2 = arr.getStruct(2, 3)
    assert(r2.getUTF8String(0).toString == "part2") // no name anywhere
    assert(r2.getUTF8String(1).toString == "image/png")
    assert(new String(r2.getBinary(2), "ISO-8859-1") == "PNGBYTES")
    // inline text leaves are NOT attachments; no attachments → NULL
    val plain = iso("From: a@example.com\nSubject: P\n\njust text\n")
    assert(EmlText.attachments(plain, 16) == null)
  }

  test("attachments: nested message/rfc822 contributes its own") {
    val inner = "From: i@example.com\nSubject: Inner\n" +
      "Content-Type: multipart/mixed; boundary=ii\n\n" +
      "--ii\nContent-Type: text/plain\n\ninner body\n" +
      "--ii\nContent-Type: application/zip\n" +
      "Content-Disposition: attachment; filename=inner.zip\n\nZIPDATA\n" +
      "--ii--\n"
    val m = iso("From: o@example.com\nSubject: Fwd\n" +
      "Content-Type: multipart/mixed; boundary=oo\n\n" +
      "--oo\nContent-Type: text/plain\n\nsee attached mail\n" +
      "--oo\nContent-Type: message/rfc822\n\n" + inner +
      "--oo--\n")
    val arr = EmlText.attachments(m, 16)
    assert(arr != null && arr.numElements() == 1)
    val r0 = arr.getStruct(0, 3)
    assert(r0.getUTF8String(0).toString == "inner.zip")
    assert(new String(r0.getBinary(2), "ISO-8859-1") == "ZIPDATA")
  }

  test("uudecode pinned against Python binascii.b2a_uu (space pad)") {
    // enc is the verbatim output of CPython binascii.b2a_uu over
    // bytes(range(100)) + b'tail-bytes!' in 45-byte lines — a fully
    // external producer (the decoder shares nothing with it)
    val enc =
      "M  $\" P0%!@<(\"0H+# T.#Q 1$A,4%187&!D:&QP='A\\@(2(C)\"4F)R@I*BLL\n" +
      "M+2XO,#$R,S0U-C<X.3H[/#T^/T!!0D-$149'2$E*2TQ-3D]045)35%565UA9\n" +
      "56EM<75Y?8&%B8W1A:6PM8GET97,A\n"
    val expected = (0 until 100).map(_.toByte).toArray ++
      "tail-bytes!".getBytes("ISO-8859-1")
    val m = iso("From: u@example.com\nSubject: UuPin\n\n" +
      "data follows\n" +
      "begin 644 blob.bin\n" + enc + "`\nend\n" +
      "regards\n")
    val arr = EmlText.attachments(m, 16)
    assert(arr != null && arr.numElements() == 1)
    val r0 = arr.getStruct(0, 3)
    assert(r0.getUTF8String(0).toString == "blob.bin")
    assert(r0.getUTF8String(1).toString == "application/octet-stream")
    assert(java.util.Arrays.equals(r0.getBinary(2), expected))
    // the text side still strips the block
    assert(EmlText.parse(m).toString ==
      "Subject: UuPin\n\ndata follows\nregards\n")
  }

  test("uudecode pinned against binascii backtick variant") {
    // binascii.b2a_uu(..., backtick=True) over an RTF payload
    val enc = ">>UQR=&8Q('5U96YC;V1E9\"!R=&8@8F]D>5QP87)]\n"
    val expected = "{\\rtf1 uuencoded rtf body\\par}"
    val m = iso("From: u@example.com\nSubject: Bt\n\n" +
      "begin 644 note.rtf\n" + enc + "`\nend\n")
    val arr = EmlText.attachments(m, 16)
    assert(arr != null && arr.numElements() == 1)
    assert(new String(arr.getStruct(0, 3).getBinary(2), "ISO-8859-1")
      == expected)
  }

  test("uudecode: stripped trailing pad, malformed blocks fail closed") {
    // a transport that strips trailing spaces must not break decode:
    // 'ab' encodes to '\"86(  ' (two pad spaces) — strip them
    val m = iso("From: u@example.com\nSubject: S\n\n" +
      "begin 644 t.bin\n\"86(\n`\nend\n")
    val arr = EmlText.attachments(m, 16)
    assert(arr != null && arr.numElements() == 1)
    assert(new String(arr.getStruct(0, 3).getBinary(2), "ISO-8859-1")
      == "ab")
    // out-of-range char in a data line: whole block invalid
    val bad = iso("From: u@example.com\nSubject: B\n\n" +
      "begin 644 x.bin\n\"8~(\n`\nend\n")
    assert(EmlText.attachments(bad, 16) == null)
    // a data line LONGER than its length char allows: invalid
    val long = iso("From: u@example.com\nSubject: L\n\n" +
      "begin 644 y.bin\n\"86(86(86(\n`\nend\n")
    assert(EmlText.attachments(long, 16) == null)
    // an unterminated block (no end): invalid
    val open = iso("From: u@example.com\nSubject: O\n\n" +
      "begin 644 z.bin\n\"86(\n")
    assert(EmlText.attachments(open, 16) == null)
  }

  test("attachments: torn base64 part skipped, siblings survive") {
    val m = iso("From: a@example.com\nSubject: Torn\n" +
      "Content-Type: multipart/mixed; boundary=bb\n\n" +
      "--bb\nContent-Type: application/pdf\n" +
      "Content-Disposition: attachment; filename=bad.pdf\n" +
      "Content-Transfer-Encoding: base64\n\n!!!not base64!!!\n" +
      "--bb\nContent-Type: application/rtf\n" +
      "Content-Disposition: attachment; filename=ok.rtf\n\n" +
      "{\\rtf1 fine\\par}\n" +
      "--bb--\n")
    val arr = EmlText.attachments(m, 16)
    assert(arr != null && arr.numElements() == 1)
    assert(arr.getStruct(0, 3).getUTF8String(0).toString == "ok.rtf")
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

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Encrypted-PDF tests: the INDEPENDENT write-side encryptor
  * [[graft.sources.PdfCryptBuild]] (its own RC4 and Algorithm
  * 2/3/4/5 implementations, streams encrypted as the file is built —
  * no parsing shared with [[graft.sources.PdfCrypt]]'s decrypt side)
  * produces RC4-40 (R2), RC4-128 (R3 and V4 /CFM /V2) and AES-128
  * (R4/AESV2) documents whose extracted text must equal their
  * plaintext twin's; a non-empty user password and a corrupted /U
  * must fail closed.
  */
class PdfCryptSpec extends AnyFunSuite {

  import graft.sources.{Documents, PdfCryptBuild}

  private def iso(s: String) = s.getBytes("ISO-8859-1")

  private val Lines = Seq("Encrypted body text", "second line")
  private val ExpectText = "Encrypted body text\nsecond line\nflate secret\n"

  private def buildPdf(r: Int, v: Int, nBits: Int, aes: Boolean,
      userPw: Array[Byte] = Array.emptyByteArray): Array[Byte] =
    PdfCryptBuild.build(r, v, nBits, aes, userPw, Lines, "flate secret")

  test("RC4-40 (V1/R2) extracts like its plaintext twin") {
    assert(Documents.pdfToText(buildPdf(2, 1, 40, aes = false)) == ExpectText)
  }

  test("RC4-128 (V2/R3) extracts like its plaintext twin") {
    assert(Documents.pdfToText(buildPdf(3, 2, 128, aes = false)) == ExpectText)
  }

  test("RC4-128 via V4 crypt filters (/CFM /V2)") {
    assert(Documents.pdfToText(buildPdf(4, 4, 128, aes = false)) == ExpectText)
  }

  test("AES-128-CBC (V4/R4 /AESV2) extracts like its plaintext twin") {
    assert(Documents.pdfToText(buildPdf(4, 4, 128, aes = true)) == ExpectText)
  }

  test("a real (non-empty) user password fails closed to null") {
    assert(Documents.pdfToText(
      buildPdf(3, 2, 128, aes = false, userPw = iso("secret"))) == null)
  }

  test("V4/AESV2 with an off-spec short /Length fails closed, not thrown") {
    // /Length 40 under /AESV2 derives a 10-byte object key — AES
    // rejects it with a CHECKED InvalidKeyException, which must not
    // escape decrypt() and fail the Spark task on one poisoned row.
    // The /U gate passes (it is RC4-based and accepts the 5-byte
    // file key), so decryption genuinely reaches the AES path.
    val n = 5
    val id0 = (1 to 16).map(_.toByte).toArray
    val pw = Array.emptyByteArray
    val o = PdfCryptBuild.computeO(pw, pw, 4, n)
    val p = -44
    val key = PdfCryptBuild.fileKey(pw, o, p, id0, 4, n)
    val u = PdfCryptBuild.computeU(key, id0, 4)
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    val garbage = Array.tabulate(32)(i => (i * 37 + 5).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(iso(s))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${garbage.length} >> stream\n")
    bos.write(garbage); w("\nendstream endobj\n")
    w("6 0 obj << /Filter /Standard /V 4 /R 4 /Length 40 " +
      "/CF << /StdCF << /CFM /AESV2 /Length 5 >> >> " +
      "/StmF /StdCF /StrF /StdCF " +
      s"/P $p /O <${hex(o)}> /U <${hex(u)}> >> endobj\n")
    w(s"trailer << /Root 1 0 R /Encrypt 6 0 R /ID [<${hex(id0)}> " +
      s"<${hex(id0)}>] >>\n%%EOF\n")
    val doc = bos.toByteArray
    // must not throw; the undecryptable stream is left as-is and the
    // extractor triages downstream (null or degraded text, never error)
    val out = graft.sources.PdfCrypt.decrypt(doc)
    assert(out == null || !java.util.Arrays.equals(out, garbage))
    Documents.pdfToText(doc) // NULL-never-error contract end-to-end
  }

  test("corrupted /U fails the gate before any decryption") {
    val b = buildPdf(3, 2, 128, aes = false)
    val s = new String(b, "ISO-8859-1")
    val uAt = s.indexOf("/U <")
    b(uAt + 4) = (if (b(uAt + 4) == '0') '1' else '0').toByte
    assert(Documents.pdfToText(b) == null)
  }

  test("AES-256 (V5/R6) extracts like its plaintext twin") {
    val b = PdfCryptBuild.buildV5(6, Array.emptyByteArray, Lines,
      "flate secret")
    assert(Documents.pdfToText(b) == ExpectText)
  }

  test("AES-256 (V5/R5, the deprecated plain-SHA256 variant)") {
    val b = PdfCryptBuild.buildV5(5, Array.emptyByteArray, Lines,
      "flate secret")
    assert(Documents.pdfToText(b) == ExpectText)
  }

  test("V5 with a real user password fails the /U hash gate → null") {
    val b = PdfCryptBuild.buildV5(6, iso("secret"), Lines, "flate secret")
    assert(Documents.pdfToText(b) == null)
  }

  test("V5 corrupted /U hash fails closed → null") {
    val b = PdfCryptBuild.buildV5(6, Array.emptyByteArray, Lines,
      "flate secret")
    val s = new String(b, "ISO-8859-1")
    val uAt = s.indexOf("/U <")
    b(uAt + 4) = (if (b(uAt + 4) == '0') '1' else '0').toByte
    assert(Documents.pdfToText(b) == null)
  }

  test("unknown revisions stay out of subset → null, not garbage") {
    val b = buildPdf(3, 2, 128, aes = false)
    val s = new String(b, "ISO-8859-1")
    val patched = s.replace("/V 2 /R 3", "/V 6 /R 7")
    assert(Documents.pdfToText(iso(patched)) == null)
  }

  test("plaintext documents pass through the crypt layer unchanged") {
    val content =
      "BT /F1 12 Tf 72 720 Td (Encrypted body text) Tj T* (second line) Tj T* ET"
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(iso(s))
    w("%PDF-1.4\n")
    w(s"4 0 obj << /Length ${content.length} >> stream\n")
    w(content); w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    assert(Documents.pdfToText(bos.toByteArray) ==
      "Encrypted body text\nsecond line\n")
  }
}

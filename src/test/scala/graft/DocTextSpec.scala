package graft

import org.scalatest.funsuite.AnyFunSuite

/** Legacy `.doc` tests: the independent [[graft.expr.DocBuild]]
  * writer (its own CFB sector allocator, FIB and piece-table
  * emission) against [[graft.expr.DocText]]'s reader — mini-stream
  * and regular-FAT layouts, CP1252/UTF-16 mixed pieces, control-char
  * mapping, triage contracts.
  */
class DocTextSpec extends AnyFunSuite {

  import graft.expr.{DocBuild, DocText}

  private def text(b: Array[Byte]): String = {
    val u = DocText.parse(b)
    if (u == null) null else u.toString
  }

  test("CP1252 single piece through the mini-stream path") {
    val b = DocBuild.doc(Seq(("Hello legacy Word.\rSecond para.\r", true)))
    assert(text(b) == "Hello legacy Word.\nSecond para.\n")
  }

  test("mixed CP1252 and UTF-16 pieces reassemble in CP order") {
    val b = DocBuild.doc(Seq(
      ("ascii start ’curly’ ", true), // CP1252 has curly quotes
      ("unicode 中文 middle ", false),
      ("ascii end\r", true)))
    assert(text(b) ==
      "ascii start ’curly’ unicode 中文 middle ascii end\n")
  }

  test("WordDocument past the 4096 cutoff uses regular FAT chains") {
    val long = ("lorem ipsum " * 300) + "\r" // ~3.6k chars
    val b = DocBuild.doc(Seq((long, true)), padTo4k = true)
    assert(text(b) == long.replace('\r', '\n'))
  }

  test("control characters: cell marks, breaks, field chars") {
    val b = DocBuild.doc(Seq(
      ("cell\u0007row\u0007\u000bline\u000cpage\u0013 FIELD \u0015kept\r",
        true)))
    assert(text(b) == "cell\trow\t\nline\npage FIELD kept\n")
  }

  test("fEncrypted triages to null") {
    val b = DocBuild.doc(Seq(("secret\r", true)))
    // flip the fEncrypted bit inside the FIB: WordDocument is the
    // first mini stream; find the 0xA5EC magic and patch flags+1
    val s = b.indexWhere(_ == 0xec.toByte)
    assert(s > 0 && (b(s + 1) & 0xff) == 0xa5)
    b(s + 0x0b) = (b(s + 0x0b) | 0x01).toByte // 0x0100 of flags@0x0A
    assert(text(b) == null)
  }

  test("a CFB that is not Word (no WordDocument stream) → null") {
    val b = DocBuild.cfb(Seq("Workbook" -> Array.fill[Byte](100)(7)))
    assert(text(b) == null)
  }

  test("triage: not CFB / truncation / garbage → null") {
    assert(text(null) == null)
    assert(text("plain text, no compound file here".getBytes) == null)
    val ok = DocBuild.doc(Seq(("abc\r", true)))
    assert(text(java.util.Arrays.copyOf(ok, 300)) == null)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** LaTeX prose extraction — deterministic conventions over
  * hand-authored sources (the text-wire-format precedent: mbox, eml,
  * vCard). Fixtures avoid triple-quoted strings: Scala processes
  * \u even there, and \usepackage would parse as a unicode escape.
  */
class LatexTextSpec extends AnyFunSuite {

  import graft.expr.{DocumentText, LatexText}

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("preamble drops, sections line, paragraphs join, comments strip") {
    val tex = "\\documentclass{article}\n" +
      "\\usepackage{amsmath}\n" +
      "\\title{A Study of Things}\n" +
      "\\begin{document}\n" +
      "\\maketitle\n" +
      "\\section{Introduction}\n" +
      "This is the % trailing comment\n" +
      "first paragraph\n" +
      "spread over lines.\n" +
      "\n" +
      "Second paragraph with 100\\% escaped and a~tie.\n" +
      "\\end{document}\n" +
      "trailing garbage"
    assert(LatexText.parse(b(tex)).toString ==
      "Introduction\n" +
        "This is the first paragraph spread over lines.\n" +
        "Second paragraph with 100% escaped and a tie.\n")
  }

  test("math drops in all four delimiters and environments") {
    val tex = "\\begin{document}\n" +
      "Energy $E = mc^2$ is inline, \\(a+b\\) too, and\n" +
      "\\[ \\int_0^1 x\\,dx \\]\n" +
      "display math, plus\n" +
      "\\begin{equation}\n" +
      "y = f(x)\n" +
      "\\end{equation}\n" +
      "all vanish.\n" +
      "\\end{document}"
    assert(LatexText.parse(b(tex)).toString ==
      "Energy is inline, too, and display math, plus all vanish.\n")
  }

  test("wrappers unwrap, references drop, href keeps its text") {
    val tex = "\\begin{document}\n" +
      "We \\emph{strongly} agree with \\cite{knuth84} that\n" +
      "\\textbf{bold claims} need \\href{https://x.example}{evidence} and\n" +
      "a label\\label{sec:x} leaves nothing.\n" +
      "\\end{document}"
    assert(LatexText.parse(b(tex)).toString ==
      "We strongly agree with that bold claims need evidence and " +
        "a label leaves nothing.\n")
  }

  test("itemize lines, figure drops whole, verbatim keeps raw") {
    val tex = "\\begin{document}\n" +
      "Points:\n" +
      "\\begin{itemize}\n" +
      "\\item first point\n" +
      "\\item second $x$ point\n" +
      "\\end{itemize}\n" +
      "\\begin{figure}\n" +
      "\\includegraphics{plot.png}\n" +
      "\\caption{A dropped caption}\n" +
      "\\end{figure}\n" +
      "\\begin{verbatim}\n" +
      "code %stays \\raw\n" +
      "\\end{verbatim}\n" +
      "after.\n" +
      "\\end{document}"
    assert(LatexText.parse(b(tex)).toString ==
      "Points:\nfirst point\nsecond point\n" +
        "code %stays \\raw\nafter.\n")
  }

  test("accents keep letters, double backslash breaks, nested braces transparent") {
    val tex = "\\begin{document}\n" +
      "caf\\'e and Schr\\\"{o}dinger share {a {nested} group} line\\\\\n" +
      "next line here.\n" +
      "\\end{document}"
    // accents keep the BASE letter (the documented convention: no
    // combining-character table below the clean-room bar is needed)
    assert(LatexText.parse(b(tex)).toString ==
      "cafe and Schrodinger share a nested group line\n" +
        "next line here.\n")
  }

  test("no \\begin{document}: a fragment still extracts") {
    val tex = "\\section{Standalone}\nJust a fragment with $math$ gone.\n"
    assert(LatexText.parse(b(tex)).toString ==
      "Standalone\nJust a fragment with gone.\n")
  }

  test("graft_document_text routes the tex sniff; plain text does not") {
    val tex = "% comment first\n\\documentclass{article}\n" +
      "\\begin{document}\nrouted body\n\\end{document}\n"
    assert(DocumentText.parse(b(tex)).toString == "routed body\n")
    assert(DocumentText.parse(b("no tex here at all")) == null)
    // a mail that MENTIONS \documentclass in the body still routes mail
    val mail = "Subject: tex\n\nsee \\documentclass docs\n"
    assert(DocumentText.parse(b(mail)).toString
      .startsWith("Subject: tex"))
  }

  test("triage: null, binary, empty result") {
    assert(LatexText.parse(null) == null)
    assert(LatexText.parse(b("plain prose, no backslash")) == null)
    assert(LatexText.parse(
      b("\\begin{document}\\end{document}")) == null)
    assert(LatexText.parse(
      b("\\begin{equation} only math \\end{equation}")) == null)
  }

  test("graft_latex_text evaluates through SQL and codegen") {
    val spark = SparkSpec.session
    Graft.tune(spark)
    import spark.implicits._
    val tex = b("\\begin{document}\\section{S}sql body\\end{document}")
    Seq(Tuple1(tex)).toDF("t").createOrReplaceTempView("tex_docs")
    val row = spark.sql(
      "SELECT graft_latex_text(t) FROM tex_docs").collect()(0)
    assert(row.getString(0) == "S\nsql body\n")
  }
}

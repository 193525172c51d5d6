package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** S7: the document-scan side input — reading the resume file whose
  * text parameterizes the enrichment stage (reference:
  * src/utils/file_utils.py:48-59 `read_resume`, dispatching on
  * extension and raising on missing files / unsupported formats).
  *
  * Formats: plain text / markdown (read verbatim) and DOCX. A .docx is
  * a zip archive whose body lives in `word/document.xml`, so the JDK's
  * `java.util.zip` + DOM parser extract it with no dependency —
  * mirroring the reference's extractor (file_utils.py:30-46), which
  * walks paragraphs and appends each paragraph's text plus "\n". PDF
  * needs a binary content-stream parser that is unavailable offline;
  * it remains the one unsupported branch. The dispatch shape and error
  * contract (FileNotFound for a missing path, IllegalArgument naming
  * the supported formats otherwise) are the reference's.
  */
object Documents {

  private val TextExtensions = Seq(".txt", ".md", ".markdown", ".text")

  def readResume(resumePath: String): String = {
    val p = Paths.get(resumePath)
    if (!Files.exists(p))
      throw new java.io.FileNotFoundException(s"Resume file not found: $resumePath")
    val lower = resumePath.toLowerCase
    if (TextExtensions.exists(lower.endsWith))
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    else if (lower.endsWith(".docx"))
      extractTextFromDocx(resumePath)
    else
      throw new IllegalArgumentException(
        "Unsupported resume format. Please provide a TXT, Markdown or DOCX file.")
  }

  /** WordprocessingML text extraction: one output line per `w:p`
    * paragraph (in document order), each the concatenation of its
    * descendant `w:t` text runs, with `w:tab` as "\t" and `w:br` /
    * `w:cr` as "\n" — the same paragraph contract as the reference's
    * python-docx loop (file_utils.py:36-38: `text += para.text + "\n"`).
    * Matching is on XML LOCAL names so any prefix bound to the
    * wordprocessingml namespace (or the strict-OOXML variant) works.
    */
  private[sources] def extractTextFromDocx(docxPath: String): String = {
    val zip = new java.util.zip.ZipFile(docxPath)
    try {
      val entry = zip.getEntry("word/document.xml")
      if (entry == null)
        throw new IllegalArgumentException(
          s"Not a DOCX package (no word/document.xml): $docxPath")
      val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(true) // getLocalName is null without this
      dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      val doc = dbf.newDocumentBuilder().parse(zip.getInputStream(entry))
      doc.getDocumentElement.normalize()
      val sb = new StringBuilder
      def localName(n: org.w3c.dom.Node): String =
        Option(n.getLocalName).getOrElse(n.getNodeName.split(':').last)
      def paragraphText(node: org.w3c.dom.Node, out: StringBuilder): Unit = {
        var child = node.getFirstChild
        while (child != null) {
          if (child.getNodeType == org.w3c.dom.Node.ELEMENT_NODE) {
            localName(child) match {
              case "t"          => out.append(child.getTextContent)
              case "tab"        => out.append('\t')
              case "br" | "cr"  => out.append('\n')
              // floating text boxes live under a run's drawing —
              // python-docx's para.text does not surface them
              case "txbxContent" | "drawing" | "pict" => ()
              case _            => paragraphText(child, out)
            }
          }
          child = child.getNextSibling
        }
      }
      def walk(node: org.w3c.dom.Node): Unit = {
        var child = node.getFirstChild
        while (child != null) {
          if (child.getNodeType == org.w3c.dom.Node.ELEMENT_NODE) {
            val local = localName(child)
            if (local == "p") {
              paragraphText(child, sb)
              sb.append('\n')
            // the reference iterates python-docx doc.paragraphs =
            // TOP-LEVEL body paragraphs only; paragraphs inside w:tbl
            // table cells are not part of that contract
            } else if (local != "tbl") walk(child)
          }
          child = child.getNextSibling
        }
      }
      walk(doc.getDocumentElement)
      sb.toString
    } finally zip.close()
  }
}

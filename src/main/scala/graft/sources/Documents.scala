package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** S7: the document-scan side input — reading the resume file whose
  * text parameterizes the enrichment stage (reference:
  * src/utils/file_utils.py:48-59 `read_resume`, dispatching on
  * extension and raising on missing files / unsupported formats).
  *
  * The reference dispatches to PDF and DOCX extractors; those need
  * binary parsers that are unavailable offline, so the supported
  * offline-parseable formats here are plain text and markdown. The
  * dispatch shape and the error contract (FileNotFound for a missing
  * path, IllegalArgument naming the supported formats otherwise) are
  * the reference's; a PDF/DOCX extractor slots in as another branch.
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
    else
      throw new IllegalArgumentException(
        "Unsupported resume format. Please provide a TXT or Markdown file.")
  }
}

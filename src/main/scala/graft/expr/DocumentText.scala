package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_document_text(content)` → string — ONE magic-dispatched
  * text-extraction surface over the document tier
  * ([[Decompress]]'s document sibling): a mixed dump of
  * PDF / DOCX / PPTX / XLSX / EPUB / RTF / legacy .doc/.xls/.ppt blobs
  * extracts through one expression with no per-format branching in
  * the pipeline.
  *
  * Dispatch: `%PDF-` → the PDF extractor (incl. the encrypted-PDF
  * handler); `PK\3\4` zips discriminate DOCX vs EPUB by their
  * defining entry names in the LOCAL headers (stored uncompressed,
  * so a byte scan is exact); `{\rtf` → RTF; the CFB signature parses
  * the container once and routes by directory-entry name —
  * `WordDocument` → .doc, `Workbook` → BIFF8 .xls,
  * `PowerPoint Document` → .ppt. Unrecognized magic → NULL — plain text/markdown
  * columns should not round-trip through a document parser, and a
  * binary blob that merely decodes as UTF-8 is not a document.
  * Each arm inherits its extractor's triage contract (NULL, never
  * an error). Pure per-row projection.
  */
case class DocumentTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"${DocumentText.FunctionName} expects binary, got ${t.catalogString}")
    }

  override def nullSafeEval(b: Any): Any =
    DocumentText.parse(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.expr.DocumentText.parse($b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression):
      DocumentTextExpr = copy(child = newChild)
}

object DocumentText {
  val FunctionName = "graft_document_text"

  /** ASCII needle scan over raw bytes — zip entry NAMES sit
    * uncompressed in local headers, so presence is exact.
    */
  private def containsAscii(b: Array[Byte], needle: String): Boolean = {
    val n = needle.getBytes("ISO-8859-1")
    var i = 0
    while (i + n.length <= b.length) {
      var k = 0
      while (k < n.length && b(i + k) == n(k)) k += 1
      if (k == n.length) return true
      i += 1
    }
    false
  }

  def parse(b: Array[Byte]): UTF8String = {
    if (b == null || b.length < 5) return null
    if (b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F' &&
        b(4) == '-')
      PdfText.parse(b)
    else if (b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4) {
      if (containsAscii(b, "word/document.xml"))
        DocxText.parse(b, includeTables = false)
      else if (containsAscii(b, "ppt/slides/slide"))
        OfficeText.pptx(b)
      else if (containsAscii(b, "xl/worksheets/sheet"))
        OfficeText.xlsx(b)
      else if (containsAscii(b, "application/vnd.oasis.opendocument"))
        // the ODF mimetype entry is stored uncompressed by spec, so
        // the literal string is visible to the byte scan
        OdfText.parse(b)
      else if (containsAscii(b, "application/epub+zip") ||
          containsAscii(b, "META-INF/container.xml"))
        EpubText.parse(b)
      else null // a plain zip is an archive, not a document
    } else if (b(0) == '{' && b(1) == '\\' && b(2) == 'r' && b(3) == 't' &&
        b(4) == 'f')
      RtfToText.extract(UTF8String.fromBytes(b))
    else if (Cfb.isCfb(b)) {
      // one container parse, routed by directory-entry name: Word,
      // Excel 97 (BIFF8) and PowerPoint 97 share the CFB shell
      val cfb = Cfb.parse(b)
      if (cfb == null) null
      else if (cfb.streams.contains("WordDocument")) DocText.fromCfb(cfb)
      else if (cfb.streams.contains("Workbook"))
        LegacyOffice.xlsFromCfb(cfb)
      else if (cfb.streams.contains("PowerPoint Document"))
        LegacyOffice.pptFromCfb(cfb)
      else null // .msi / BIFF5 "Book" / unknown CFB: out of subset
    } else null
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, exprs => DocumentTextExpr(exprs(0)), "built-in")
}

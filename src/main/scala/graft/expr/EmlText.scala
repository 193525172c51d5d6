package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Email text extraction — `graft_eml_text(content)` over RFC-5322
  * messages and `graft_mbox_messages(content[, max])` over mbox
  * archives, the mail tier next to the document extractors (mailing
  * lists and mail dumps are a standing training-data source):
  *
  *  - headers unfold (continuation lines), RFC 2047 encoded-words
  *    decode in Subject/From (B = base64, Q = quoted-printable with
  *    `_` as space; utf-8 / iso-8859-1 / windows-1252 / us-ascii);
  *  - the MIME tree walks recursively (multipart/mixed, nested
  *    multiparts; multipart/alternative takes the best single
  *    alternative — text/plain preferred over text/html);
  *  - leaf parts decode their Content-Transfer-Encoding
  *    (quoted-printable with soft line breaks, base64 via the MIME
  *    decoder, 7bit/8bit identity) then their charset; text/html
  *    flattens through the shared HTML→text chain; non-text leaves
  *    (attachments) contribute nothing;
  *  - output: the decoded Subject line, a blank line, then the text
  *    parts in document order — one deterministic form for oracles.
  *
  * mbox splits on the `From ` envelope line at message boundaries
  * (preceded by a blank line or file start) and un-escapes the
  * classic `>From ` body quoting. Not a message / no headers →
  * NULL, never an error; both are pure per-row projections.
  */
case class EmlTextExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"${EmlText.FunctionName} expects binary, got ${t.catalogString}")
    }
  override def nullSafeEval(v: Any): Any =
    EmlText.parse(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.EmlText.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression):
      EmlTextExpr = copy(child = newChild)
}

case class MboxMessages(child: Expression, maxMessages: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"${EmlText.MboxName} expects binary, got " +
          child.dataType.catalogString)
    else if (maxMessages < 1 || maxMessages > 65536)
      TypeCheckResult.TypeCheckFailure(
        s"${EmlText.MboxName} max must be in [1, 65536]: $maxMessages")
    else TypeCheckResult.TypeCheckSuccess
  override def nullSafeEval(v: Any): Any =
    EmlText.mbox(v.asInstanceOf[Array[Byte]], maxMessages)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.EmlText.mbox($c, $maxMessages);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression):
      MboxMessages = copy(child = newChild)
}

object EmlText {
  val FunctionName = "graft_eml_text"
  val MboxName = "graft_mbox_messages"

  val MaxTextChars: Int = 16 << 20
  private val MaxDepth = 8

  private def charsetOf(name: String): java.nio.charset.Charset = {
    val n = name.trim.toLowerCase(java.util.Locale.ROOT)
    try n match {
      case "utf-8" | "utf8" => java.nio.charset.StandardCharsets.UTF_8
      case "us-ascii" | "ascii" => java.nio.charset.StandardCharsets.US_ASCII
      case "iso-8859-1" | "latin1" =>
        java.nio.charset.StandardCharsets.ISO_8859_1
      case "" => java.nio.charset.StandardCharsets.ISO_8859_1
      case other => java.nio.charset.Charset.forName(other)
    } catch {
      case _: Exception => java.nio.charset.StandardCharsets.ISO_8859_1
    }
  }

  /** Header block split + unfold: returns (lowername → value) in
    * first-wins order plus the body offset, or null when no header
    * terminator exists (not a message).
    */
  private def headers(b: Array[Byte], from: Int):
      (java.util.LinkedHashMap[String, String], Int) = {
    var end = -1
    var i = from
    while (end < 0 && i + 1 < b.length) {
      if (b(i) == '\n' &&
          (i + 1 < b.length && b(i + 1) == '\n')) end = i + 2
      else if (b(i) == '\n' && i + 2 < b.length && b(i + 1) == '\r' &&
          b(i + 2) == '\n') end = i + 3
      i += 1
    }
    if (end < 0) return null
    val block = new String(b, from, end - from,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val unfolded = block.replace("\r\n", "\n")
      .replaceAll("\n[ \t]+", " ")
    val out = new java.util.LinkedHashMap[String, String]()
    unfolded.split('\n').foreach { line =>
      val c = line.indexOf(':')
      if (c > 0) {
        val k = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        if (!out.containsKey(k)) out.put(k, line.substring(c + 1).trim)
      }
    }
    (out, end)
  }

  /** RFC 2047 encoded-words in a header value; whitespace BETWEEN
    * adjacent encoded words is transparent per the RFC.
    */
  private[graft] def decodeHeader(v0: String): String = {
    val v = v0.replaceAll("(\\?=)[ \\t]+(=\\?)", "$1$2")
    val m = java.util.regex.Pattern.compile(
      "=\\?([^?]+)\\?([bBqQ])\\?([^?]*)\\?=").matcher(v)
    val sb = new StringBuffer
    while (m.find()) {
      val cs = charsetOf(m.group(1))
      val decoded =
        try {
          if (m.group(2).equalsIgnoreCase("b"))
            new String(java.util.Base64.getMimeDecoder.decode(m.group(3)),
              cs)
          else { // Q: like quoted-printable, underscore = space
            val raw = m.group(3).replace('_', ' ')
            new String(qpDecode(raw.getBytes(
              java.nio.charset.StandardCharsets.ISO_8859_1), soft = false),
              cs)
          }
        } catch { case _: Exception => m.group(0) }
      m.appendReplacement(sb,
        java.util.regex.Matcher.quoteReplacement(decoded))
    }
    m.appendTail(sb)
    sb.toString
  }

  /** Quoted-printable: =XX hex escapes; `soft` also removes =\n soft
    * line breaks (body form — header Q-encoding has none).
    */
  private def qpDecode(b: Array[Byte], soft: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    def hexAt(k: Int): Int = {
      val c = b(k) & 0xff
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else -1
    }
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c == '=' && soft && i + 1 < b.length &&
          (b(i + 1) == '\n' ||
            (b(i + 1) == '\r' && i + 2 < b.length && b(i + 2) == '\n'))) {
        i += (if (b(i + 1) == '\n') 2 else 3) // soft break vanishes
      } else if (c == '=' && i + 2 < b.length && hexAt(i + 1) >= 0 &&
          hexAt(i + 2) >= 0) {
        out.write((hexAt(i + 1) << 4) | hexAt(i + 2))
        i += 3
      } else { out.write(c); i += 1 }
    }
    out.toByteArray
  }

  private def param(headerValue: String, name: String): String = {
    val m = java.util.regex.Pattern.compile(
      "(?i)" + name + "\\s*=\\s*(\"([^\"]*)\"|[^;\\s]+)")
      .matcher(headerValue)
    if (!m.find()) return ""
    if (m.group(2) != null) m.group(2) else m.group(1)
  }

  private def mimeType(ct: String): String = {
    val semi = ct.indexOf(';')
    (if (semi >= 0) ct.substring(0, semi) else ct)
      .trim.toLowerCase(java.util.Locale.ROOT)
  }

  /** One MIME entity (headers already parsed): append its text. */
  private def entity(b: Array[Byte], bodyFrom: Int, bodyUntil: Int,
      hs: java.util.LinkedHashMap[String, String], depth: Int,
      out: java.lang.StringBuilder): Unit = {
    if (depth > MaxDepth || out.length > MaxTextChars) return
    val ct = Option(hs.get("content-type")).getOrElse("text/plain")
    val mt = mimeType(ct)
    if (mt.startsWith("multipart/")) {
      val boundary = param(ct, "boundary")
      if (boundary.isEmpty) return
      val parts = splitMultipart(b, bodyFrom, bodyUntil, boundary)
      if (mt == "multipart/alternative" && parts.nonEmpty) {
        // best single alternative: text/plain wins, else text/html,
        // else the first part
        def typeOf(p: (Int, Int)): String = {
          val h = headers(b, p._1)
          if (h == null) ""
          else mimeType(Option(h._1.get("content-type"))
            .getOrElse("text/plain"))
        }
        val pick = parts.find(typeOf(_) == "text/plain")
          .orElse(parts.find(typeOf(_) == "text/html"))
          .getOrElse(parts.head)
        subEntity(b, pick, depth, out)
      } else parts.foreach(subEntity(b, _, depth, out))
    } else if (mt == "text/plain" || mt == "text/html" ||
        mt == "message/rfc822") {
      if (mt == "message/rfc822") {
        val h = headers(b, bodyFrom)
        if (h != null) {
          emitSubject(h._1, out)
          entity(b, h._2, bodyUntil, h._1, depth + 1, out)
        }
        return
      }
      val cte = Option(hs.get("content-transfer-encoding")).getOrElse("")
        .trim.toLowerCase(java.util.Locale.ROOT)
      val raw = java.util.Arrays.copyOfRange(b, bodyFrom, bodyUntil)
      val decoded = cte match {
        case "base64" =>
          try java.util.Base64.getMimeDecoder.decode(raw)
          catch { case _: Exception => return } // torn part: nothing
        case "quoted-printable" => qpDecode(raw, soft = true)
        case _ => raw
      }
      val text = new String(decoded, charsetOf(param(ct, "charset")))
      val flat =
        if (mt == "text/html")
          graft.sources.Documents.htmlToTextString(text)
        else stripUuencode(text.replace("\r\n", "\n"))
      val trimmed = flat.trim
      if (trimmed.nonEmpty) {
        out.append(trimmed)
        out.append('\n')
      }
    } // other leaves (attachments, images): contribute nothing
  }

  private def subEntity(b: Array[Byte], span: (Int, Int), depth: Int,
      out: java.lang.StringBuilder): Unit = {
    val h = headers(b, span._1)
    if (h != null) entity(b, h._2, span._2, h._1, depth + 1, out)
  }

  /** Body spans between --boundary delimiter lines. */
  private def splitMultipart(b: Array[Byte], from: Int, until: Int,
      boundary: String): Seq[(Int, Int)] = {
    val text = new String(b, from, until - from,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val delim = "--" + boundary
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var pos = 0
    var start = -1
    while (pos >= 0 && pos <= text.length) {
      val at = text.indexOf(delim, pos)
      // a delimiter LINE: line start, and after the boundary only
      // "--" (closing), whitespace, or the line end — "--XX" must
      // not match inside "--XXY"
      def tailOk: Boolean = {
        val t = at + delim.length
        t >= text.length || text.charAt(t) == '\r' ||
          text.charAt(t) == '\n' || text.charAt(t) == ' ' ||
          text.charAt(t) == '\t' ||
          text.regionMatches(t, "--", 0, 2)
      }
      if (at < 0) {
        if (start >= 0) out += ((from + start, until))
        pos = -1
      } else if ((at == 0 || text.charAt(at - 1) == '\n') && tailOk) {
        if (start >= 0) {
          var e = at
          // the CRLF before the delimiter belongs to it
          if (e > 0 && text.charAt(e - 1) == '\n') e -= 1
          if (e > 0 && text.charAt(e - 1) == '\r') e -= 1
          out += ((from + start, from + e))
        }
        val lineEnd = text.indexOf('\n', at)
        val closing = text.regionMatches(at + delim.length, "--", 0, 2)
        if (closing || lineEnd < 0) { start = -1; pos = -1 }
        else { start = lineEnd + 1; pos = lineEnd + 1 }
      } else pos = at + delim.length
    }
    out.toSeq
  }

  /** Pre-MIME mailing-list bodies inline uuencoded attachments
    * (`begin 644 name` … `end`); they are binary payload, not text —
    * the block strips from the extracted form.
    */
  private def stripUuencode(s: String): String = {
    if (!s.contains("\nbegin ") && !s.startsWith("begin ")) return s
    val out = new java.lang.StringBuilder
    var inBlock = false
    s.split('\n').foreach { line =>
      if (!inBlock &&
          line.matches("begin [0-7]{3,4} .*")) inBlock = true
      else if (inBlock && line == "end") inBlock = false
      else if (!inBlock) { out.append(line); out.append('\n') }
    }
    // split() drops the trailing empty segment; normalize the tail
    val r = out.toString
    if (s.endsWith("\n") || r.isEmpty) r else r.stripSuffix("\n")
  }

  private def emitSubject(hs: java.util.LinkedHashMap[String, String],
      out: java.lang.StringBuilder): Unit = {
    val subj = hs.get("subject")
    if (subj != null && subj.nonEmpty) {
      out.append("Subject: ").append(decodeHeader(subj)).append('\n')
      out.append('\n')
    }
  }

  /** Input cap shared with the archive tier's bomb guards. */
  val MaxInputBytes: Long = TarEntries.MaxTotalBytes

  def parse(b: Array[Byte]): UTF8String = {
    if (b == null || b.length < 8 || b.length > MaxInputBytes) return null
    try {
      var from = 0
      // a stray mbox envelope line on a single message is tolerated
      if (b(0) == 'F' && b(1) == 'r' && b(2) == 'o' && b(3) == 'm' &&
          b(4) == ' ') {
        while (from < b.length && b(from) != '\n') from += 1
        from += 1
      }
      val h = headers(b, from)
      if (h == null) return null
      // a mail message has at least one of the defining headers
      if (!(h._1.containsKey("from") || h._1.containsKey("subject") ||
          h._1.containsKey("received") || h._1.containsKey("date") ||
          h._1.containsKey("mime-version"))) return null
      val out = new java.lang.StringBuilder
      emitSubject(h._1, out)
      entity(b, h._2, b.length, h._1, 0, out)
      if (out.length == 0) null
      else UTF8String.fromString(out.toString)
    } catch {
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  /** mbox → messages (envelope lines stripped, `>From ` unescaped). */
  def mbox(b: Array[Byte], max: Int): GenericArrayData = {
    if (b == null || b.length < 6 || b.length > MaxInputBytes) return null
    if (!(b(0) == 'F' && b(1) == 'r' && b(2) == 'o' && b(3) == 'm' &&
        b(4) == ' ')) return null
    val text = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new java.util.ArrayList[Array[Byte]]()
    var pos = 0
    while (pos >= 0 && pos < text.length && out.size < max) {
      val lineEnd = text.indexOf('\n', pos)
      if (lineEnd < 0) pos = -1
      else {
        val bodyStart = lineEnd + 1
        // next envelope: "\nFrom " after a blank line, or EOF
        var next = text.indexOf("\n\nFrom ", bodyStart)
        var msgEnd = if (next < 0) text.length else next + 1
        if (next < 0) {
          next = text.indexOf("\n\r\nFrom ", bodyStart)
          if (next >= 0) msgEnd = next + 2
        }
        val body = text.substring(bodyStart, msgEnd)
          .replace("\n>From ", "\nFrom ")
        out.add(body.getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1))
        pos = if (next < 0) -1 else msgEnd + 1
      }
    }
    if (out.isEmpty) return null
    val arr = new Array[Any](out.size)
    var i = 0
    while (i < out.size) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, exprs => EmlTextExpr(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      MboxName, exprs => MboxMessages(exprs(0),
        if (exprs.length > 1)
          ExprArgs.intLit(MboxName, "max", exprs(1))
        else 4096), "built-in")
  }
}

package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** S7: the document-scan side input — reading the resume file whose
  * text parameterizes the enrichment stage (reference:
  * src/utils/file_utils.py:48-59 `read_resume`, dispatching on
  * extension and raising on missing files / unsupported formats).
  *
  * Formats: plain text / markdown (read verbatim), DOCX, and PDF
  * (best-effort). A .docx is a zip archive whose body lives in
  * `word/document.xml`, so the JDK's `java.util.zip` + DOM parser
  * extract it with no dependency — mirroring the reference's extractor
  * (file_utils.py:30-46), which walks paragraphs and appends each
  * paragraph's text plus "\n". PDF mirrors file_utils.py:9-28
  * (PyPDF2 page.extract_text() + "\n" per page) with a minimal
  * dependency-free content-stream parser — see [[extractTextFromPdf]]
  * for its deliberate scope. The dispatch shape and error contract
  * (FileNotFound for a missing path, IllegalArgument naming the
  * supported formats otherwise) are the reference's.
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
    else if (lower.endsWith(".pdf"))
      extractTextFromPdf(resumePath)
    else if (lower.endsWith(".epub"))
      extractTextFromEpub(resumePath)
    else if (lower.endsWith(".rtf")) {
      // the shared RTF state machine (graft.expr.RtfToText); RTF is
      // nominally 7-bit ASCII with \'hh escapes, so a Latin-1 read
      // preserves every byte for the escape decoder
      val raw = new String(Files.readAllBytes(p), StandardCharsets.ISO_8859_1)
      val out = graft.expr.RtfToText.extract(
        org.apache.spark.unsafe.types.UTF8String.fromString(raw))
      if (out == null)
        throw new IllegalArgumentException(
          s"Not an RTF document: $resumePath")
      out.toString
    } else
      throw new IllegalArgumentException(
        "Unsupported resume format. Please provide a TXT, Markdown, DOCX, PDF, RTF or EPUB file.")
  }

  /** EPUB (OCF zip) text extraction — books are core corpus material.
    * Chapter ORDER comes from the package spine: META-INF/container
    * .xml names the OPF, whose manifest maps ids to hrefs and whose
    * spine lists reading order (both plain XML — DOM-parsed with
    * doctypes refused, safe because neither carries entities). The
    * XHTML chapters themselves are NOT DOM-parsed: real book markup
    * leans on `&nbsp;`-class entities whose definitions live in
    * external DTDs a hardened parser must not fetch, so chapters go
    * through the same regexp strip chain as the engine's HTML column
    * path ([[htmlToTextString]]). A package whose container/OPF is
    * missing or damaged falls back to every `.xhtml/.html` entry in
    * zip order (triage: a damaged book still yields its text); a zip
    * with neither marker is a typed error like the other formats.
    * Bomb guards: 1000 chapters, 8 MiB per entry, 64 MiB total.
    */
  private[sources] def extractTextFromEpub(epubPath: String): String = {
    val zip = new java.util.zip.ZipFile(epubPath)
    try {
      import scala.jdk.CollectionConverters._
      def read(name: String, cap: Int = 8 << 20): Option[String] =
        Option(zip.getEntry(name)).filter(_.getSize <= cap).map { e =>
          new String(zip.getInputStream(e).readAllBytes(),
            StandardCharsets.UTF_8)
        }
      val hrefs: Seq[String] = epubChapterNames(n => read(n),
        zip.entries().asScala.map(_.getName).toSeq)
      if (hrefs.isEmpty) {
        val isEpub = read("mimetype").exists(_.trim == "application/epub+zip")
        throw new IllegalArgumentException(
          if (isEpub) s"EPUB package has no readable chapters: $epubPath"
          else s"Not an EPUB package: $epubPath")
      }
      val sb = new StringBuilder
      var total = 0L
      hrefs.take(1000).foreach { h =>
        read(h).foreach { xhtml =>
          if (total < (64L << 20)) {
            total += xhtml.length
            val t = htmlToTextString(xhtml)
            if (t.nonEmpty) { sb.append(t); sb.append('\n') }
          }
        }
      }
      sb.toString
    } finally zip.close()
  }

  /** The EPUB package walk shared by the file reader and the
    * distributed binary-column expression
    * ([[graft.expr.EpubText]]): container.xml → OPF → spine-ordered
    * chapter names (both plain XML, DOM-parsed with doctypes
    * refused); damaged or missing package metadata falls back to
    * every markup entry in archive order.
    */
  private[graft] def epubChapterNames(read: String => Option[String],
      allNames: => Seq[String]): Seq[String] = {
    def dom(xml: String): Option[org.w3c.dom.Document] = try {
      val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      dbf.setNamespaceAware(true)
      dbf.setFeature(
        "http://apache.org/xml/features/disallow-doctype-decl", true)
      Some(dbf.newDocumentBuilder().parse(
        new java.io.ByteArrayInputStream(
          xml.getBytes(StandardCharsets.UTF_8))))
    } catch { case _: Exception => None }
    val spineHrefs: Option[Seq[String]] = for {
      containerXml <- read("META-INF/container.xml")
      container <- dom(containerXml)
      opfPath <- {
        val nl = container.getElementsByTagNameNS("*", "rootfile")
        if (nl.getLength > 0)
          Option(nl.item(0).getAttributes.getNamedItem("full-path"))
            .map(_.getNodeValue)
        else None
      }
      opfXml <- read(opfPath)
      opf <- dom(opfXml)
    } yield {
      val opfDir = opfPath.lastIndexOf('/') match {
        case -1 => ""
        case i => opfPath.substring(0, i + 1)
      }
      val items = opf.getElementsByTagNameNS("*", "item")
      val byId = (0 until items.getLength).flatMap { i =>
        val a = items.item(i).getAttributes
        for {
          id <- Option(a.getNamedItem("id"))
          href <- Option(a.getNamedItem("href"))
        } yield id.getNodeValue -> (opfDir + href.getNodeValue)
      }.toMap
      val refs = opf.getElementsByTagNameNS("*", "itemref")
      (0 until refs.getLength).flatMap { i =>
        Option(refs.item(i).getAttributes.getNamedItem("idref"))
          .map(_.getNodeValue).flatMap(byId.get)
      }
    }
    spineHrefs.filter(_.nonEmpty).getOrElse {
      // damaged/missing package metadata: every markup entry in
      // archive order still yields the book's text
      allNames.filter(_.toLowerCase.matches(".*\\.(xhtml|html|htm)$"))
    }
  }

  /** Driver-side mirror of the HTML column chain
    * ([[graft.functions.HtmlToText]]): same steps, same order, plain
    * java.util.regex — kept in lockstep so an EPUB chapter and the
    * same markup in a text column extract identically.
    */
  private[graft] def htmlToTextString(html: String): String = {
    val noScript = html.replaceAll(
      "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", " ")
    val noComment = noScript.replaceAll("(?s)<!--.*?-->", " ")
    val noTags = noComment.replaceAll("<[^>]+>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'")
      .foldLeft(noTags) { case (acc, (e, r)) => acc.replace(e, r) }
    decoded.replaceAll("&#\\d+;", " ").replaceAll("\\s+", " ").trim
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
      val out = docxXmlToText(zip.getInputStream(entry))
      if (out == null)
        throw new IllegalArgumentException(
          s"Malformed DOCX document XML: $docxPath")
      out
    } finally zip.close()
  }

  /** The WordprocessingML walk over a `word/document.xml` stream,
    * shared by the file reader above and the distributed
    * binary-column expression ([[graft.expr.DocxText]]). Null (never
    * an error) on malformed XML; the file reader converts null back
    * to its typed error.
    */
  // one hardened builder per executor thread: factory + builder
  // construction costs more than small-document parses themselves
  // (measured: the per-row form put docxText at ~72 µs/doc at the 50×
  // decade; reset() reuse is the JAXP-sanctioned pattern)
  private val docxBuilder =
    new ThreadLocal[javax.xml.parsers.DocumentBuilder] {
      override def initialValue(): javax.xml.parsers.DocumentBuilder = {
        val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        dbf.setNamespaceAware(true) // getLocalName is null without this
        dbf.setFeature(
          "http://apache.org/xml/features/disallow-doctype-decl", true)
        dbf.newDocumentBuilder()
      }
    }

  private[graft] def docxXmlToText(in: java.io.InputStream,
      includeTables: Boolean = false): String = {
    val doc = try {
      val builder = docxBuilder.get()
      builder.reset()
      builder.parse(in)
    } catch { case _: Exception => return null }
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
          // table cells are not part of that contract. A training
          // corpus usually WANTS table text, so `includeTables`
          // opts in: the walk descends into w:tbl and every cell
          // paragraph emits as its own line, in document order
          } else if (includeTables || local != "tbl") walk(child)
        }
        child = child.getNextSibling
      }
    }
    walk(doc.getDocumentElement)
    sb.toString
  }

  /** Best-effort PDF text extraction with zero dependencies — the
    * common-case coverage of the reference's PyPDF2 loop
    * (file_utils.py:9-28: per page, `extract_text()` + "\n").
    *
    * Deliberate scope (a full PDF text stack needs font/CMap tables
    * that aren't reproducible offline):
    *  - content streams stored raw or behind /FlateDecode
    *    (java.util.zip Inflater, zlib then raw fallback), /LZWDecode
    *    (the PDF 9→12-bit variable-width variant, EarlyChange=1),
    *    /ASCIIHexDecode, /ASCII85Decode, /RunLengthDecode, or chains
    *    of those (`/Filter [/ASCII85Decode /FlateDecode]`); other
    *    filters (image codecs, /Crypt) are skipped, not errors
    *  - text operators Tj, ', ", TJ; literal `(…)` strings with the
    *    full escape table + octal codes, and `<…>` hex strings
    *  - Td, TD, T*, Tm line moves emit "\n" (the PyPDF2-ish layout
    *    heuristic, minus its vertical-position arithmetic)
    *  - text decoded through the document's ToUnicode CMaps when
    *    present (bfchar/bfrange entries — subset-embedded fonts that
    *    remap codes extract correctly). When resource /Font objects
    *    resolve, each font keeps its OWN CMap and byte width and the
    *    Tf operator switches decoding per run — so documents mixing
    *    1-byte and 2-byte (CID/Identity-H) fonts extract correctly.
    *    Writers without resolvable font objects fall back to the
    *    merged-CMap policy: per-byte decode with WinAnsi (Latin-1 plus
    *    the 0x80–0x9F Windows-1252 block) for unmapped codes, or
    *    big-endian two-byte decode when every parsed CMap source is
    *    two-byte (unmapped codes emit nothing, like PyPDF2 missing a
    *    CID)
    *
    * A file without the %PDF- header, or one yielding no parseable
    * text stream at all, raises — the reference logs and re-raises on
    * any extraction failure rather than returning silently empty
    * (file_utils.py:24-27).
    */
  private[sources] def extractTextFromPdf(pdfPath: String): String = {
    val bytes = Files.readAllBytes(Paths.get(pdfPath))
    if (bytes.length < 5 ||
        new String(bytes, 0, 5, StandardCharsets.ISO_8859_1) != "%PDF-")
      throw new IllegalArgumentException(
        s"Error extracting text from PDF (missing %PDF- header): $pdfPath")
    val out = pdfToText(bytes)
    if (out == null)
      throw new IllegalArgumentException(
        s"Error extracting text from PDF (no parseable text content): $pdfPath")
    out
  }

  /** The PDF extraction core over raw bytes, shared by the file reader
    * above and the distributed binary-column expression
    * ([[graft.expr.PdfText]]) — the same lift [[graft.expr.EpubText]]
    * gave the EPUB walk. Null (never an error) when the bytes aren't a
    * PDF or no text stream parses; the file reader converts null back
    * to its typed error.
    */
  private[graft] def pdfToText(rawBytes: Array[Byte]): String = {
    if (rawBytes == null || rawBytes.length < 5 ||
        rawBytes.length > MaxPdfBytes ||
        new String(rawBytes, 0, 5, StandardCharsets.ISO_8859_1) != "%PDF-")
      return null
    // standard-security-handler pass: encrypted-with-empty-user-
    // password documents decrypt in structure; real passwords /
    // unsupported handlers triage to null (PdfCrypt verifies /U
    // before trusting any key)
    val bytes = PdfCrypt.decrypt(rawBytes)
    if (bytes == null) return null
    // ISO-8859-1 maps bytes 1:1 to chars: string search over binary is safe
    val raw = new String(bytes, StandardCharsets.ISO_8859_1)
    // the keyword "stream", not the tail of "endstream"
    def nextStream(from: Int): Int = {
      var i = raw.indexOf("stream", from)
      while (i >= 3 && raw.regionMatches(i - 3, "end", 0, 3))
        i = raw.indexOf("stream", i + 6)
      i
    }
    // pass 1 — decode every stream; ToUnicode CMap streams (which may
    // appear after the content streams that need them) merge into one
    // single-byte code→text map, content streams queue up in order
    val contentStreams = scala.collection.mutable.ArrayBuffer.empty[String]
    val cmap = scala.collection.mutable.Map.empty[Int, String]
    val cmapWidths = scala.collection.mutable.Set.empty[Int]
    var idx = nextStream(0)
    while (idx >= 0) {
      // the stream's dict sits between its "N G obj" and "stream"
      val objIdx = raw.lastIndexOf("obj", idx)
      val dict = raw.substring(math.max(objIdx, 0), idx)
      var s = idx + 6
      if (s < raw.length && raw.charAt(s) == '\r') s += 1
      if (s < raw.length && raw.charAt(s) == '\n') s += 1
      val end = raw.indexOf("endstream", s)
      if (end < 0) idx = -1
      else {
        var e = end
        if (e > s && raw.charAt(e - 1) == '\n') e -= 1
        if (e > s && raw.charAt(e - 1) == '\r') e -= 1
        val data = java.util.Arrays.copyOfRange(bytes, s, math.max(e, s))
        val decoded = decodeFiltered(dict, data)
        decoded
          .map(b => new String(b, StandardCharsets.ISO_8859_1))
          .foreach { cs =>
            if (cs.contains("beginbfchar") || cs.contains("beginbfrange"))
              parseToUnicodeCMap(cs, cmap, cmapWidths)
            else if (cs.contains("BT")) // only content streams with text blocks
              contentStreams += cs
          }
        idx = nextStream(end + 9)
      }
    }
    // pass 1.5 — structured per-font encodings: resolve resource
    // /Font name → font object → its own /ToUnicode CMap, so documents
    // MIXING 1- and 2-byte fonts decode each text run under the font
    // the Tf operator selects
    val fonts = resolveFonts(raw, bytes)
    // pass 2 — run the text operators. Runs under a resolved font use
    // its own CMap and byte width; runs under unresolvable fonts (or
    // writers without font objects) fall back to the merged CMap with
    // the uniform-width heuristic: a document whose CMaps are all
    // two-byte is a CID/Identity-H document, its strings big-endian
    // two-byte code sequences.
    val out = new StringBuilder
    var sawText = false
    val codeMap = cmap.toMap
    val twoByte = cmapWidths == scala.collection.Set(2)
    contentStreams.foreach { cs =>
      val t = extractTextOps(cs, codeMap, twoByte, fonts)
      if (t.nonEmpty) {
        out.append(t)
        if (!t.endsWith("\n")) out.append('\n') // reference: page + "\n"
        sawText = true
      }
    }
    if (!sawText) null else out.toString
  }

  /** Width tag for two-byte CMap source codes: a two-byte <0041> keys
    * as `0x10000 | 0x41`, distinct from a one-byte <41>'s `0x41`.
    */
  private[sources] final val TwoByteTag = 0x10000

  /** Input cap for the binary-column path: the ISO-8859-1 view doubles
    * the allocation (bytes → chars), so a crawl row past this is
    * triaged to NULL rather than decoded.
    */
  private[graft] final val MaxPdfBytes: Int = 64 << 20

  /** Decode-bomb cap for any single filtered stream (Flate/LZW/RLE can
    * amplify; hex/85 cannot): exceeding it fails THAT stream, same as
    * an unsupported filter.
    */
  private[graft] final val MaxStreamBytes: Int = 32 << 20

  /** One font's decoding contract: its ToUnicode map and whether its
    * string bytes group into big-endian two-byte codes (CID/Identity-H).
    */
  private[sources] final case class FontDecode(
      cmap: Map[Int, String], twoByte: Boolean)

  /** Resolve each resource `/Font` entry (`/F1 5 0 R` pairs, inline
    * `<<…>>` or via an indirect `/Font N 0 R` resources object) to its
    * font object's `/ToUnicode` CMap, parsed per font so each keeps its
    * own byte width. Fonts without a ToUnicode ref resolve to nothing
    * and fall back to the caller's merged-CMap policy. First binding
    * wins when pages reuse a name with different fonts — the same
    * first-mapping-wins trade [[parseToUnicodeCMap]] documents.
    *
    * Matches that fall INSIDE a stream's byte payload are skipped:
    * compressed (Flate) data can contain byte runs spelling "N G obj"
    * or "/Font", and indexing those would shadow the real object N and
    * decode text under the wrong CMap. Stream payload spans are known
    * from the same stream/endstream scan pass 1 uses.
    */
  private[sources] def resolveFonts(raw: String,
      bytes: Array[Byte]): Map[String, FontDecode] = {
    // stream payload spans (data between "stream"+EOL and "endstream"):
    // anything the object/font regexes match inside these is payload
    // bytes, not document structure
    val streamSpans = {
      val sp = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      def nextStream(from: Int): Int = {
        var i = raw.indexOf("stream", from)
        while (i >= 3 && raw.regionMatches(i - 3, "end", 0, 3))
          i = raw.indexOf("stream", i + 6)
        i
      }
      var i = nextStream(0)
      while (i >= 0) {
        var s = i + 6
        if (s < raw.length && raw.charAt(s) == '\r') s += 1
        if (s < raw.length && raw.charAt(s) == '\n') s += 1
        val end = raw.indexOf("endstream", s)
        if (end < 0) i = -1
        else { sp += ((s, end)); i = nextStream(end + 9) }
      }
      sp.toVector
    }
    def inStream(pos: Int): Boolean =
      streamSpans.exists { case (s, e) => pos >= s && pos < e }
    // object index: "N G obj" → body span
    val spans = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    val om = java.util.regex.Pattern.compile("(\\d+)\\s+\\d+\\s+obj\\b")
      .matcher(raw)
    while (om.find()) {
      if (!inStream(om.start())) {
        val end = raw.indexOf("endobj", om.end())
        if (!spans.contains(om.group(1).toInt))
          spans(om.group(1).toInt) = (om.end(), if (end < 0) raw.length else end)
      }
    }
    def body(n: Int): Option[String] =
      spans.get(n).map { case (s, e) => raw.substring(s, e) }
    // decode object n's stream with the same filter policy as pass 1
    def streamOf(n: Int): Option[String] = spans.get(n).flatMap { case (s, e) =>
      val si = raw.indexOf("stream", s)
      if (si < 0 || si >= e) None
      else {
        val dict = raw.substring(s, si)
        var ds = si + 6
        if (ds < raw.length && raw.charAt(ds) == '\r') ds += 1
        if (ds < raw.length && raw.charAt(ds) == '\n') ds += 1
        val de0 = raw.indexOf("endstream", ds)
        if (de0 < 0) None
        else {
          var de = de0
          if (de > ds && raw.charAt(de - 1) == '\n') de -= 1
          if (de > ds && raw.charAt(de - 1) == '\r') de -= 1
          val data = java.util.Arrays.copyOfRange(bytes, ds, math.max(de, ds))
          decodeFiltered(dict, data)
            .map(b => new String(b, StandardCharsets.ISO_8859_1))
        }
      }
    }
    val assoc = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def pairsFrom(dict: String): Unit = {
      val pm = java.util.regex.Pattern.compile("/(\\w+)\\s+(\\d+)\\s+\\d+\\s+R")
        .matcher(dict)
      while (pm.find())
        if (!assoc.contains(pm.group(1))) assoc(pm.group(1)) = pm.group(2).toInt
    }
    val fm = java.util.regex.Pattern.compile("/Font\\s*").matcher(raw)
    while (fm.find()) {
      val after = fm.end()
      if (inStream(fm.start())) ()
      else if (raw.startsWith("<<", after)) {
        // balanced << >> scan: resource font dicts can nest
        var depth = 0; var j = after; var stop = -1
        while (j < raw.length - 1 && stop < 0) {
          if (raw.startsWith("<<", j)) { depth += 1; j += 2 }
          else if (raw.startsWith(">>", j)) {
            depth -= 1; j += 2; if (depth == 0) stop = j
          } else j += 1
        }
        if (stop > 0) pairsFrom(raw.substring(after, stop))
      } else {
        // indirect resources: /Font N 0 R
        val im = java.util.regex.Pattern.compile("^(\\d+)\\s+\\d+\\s+R")
          .matcher(raw.substring(after, math.min(after + 32, raw.length)))
        if (im.find()) body(im.group(1).toInt).foreach(pairsFrom)
      }
    }
    assoc.iterator.flatMap { case (name, fontObj) =>
      body(fontObj).flatMap { fdict =>
        val tu = java.util.regex.Pattern
          .compile("/ToUnicode\\s+(\\d+)\\s+\\d+\\s+R").matcher(fdict)
        if (!tu.find()) {
          // no ToUnicode: a simple font may still carry an /Encoding
          // dict with /Differences — glyph-name remappings over the
          // base encoding (PDF spec §9.6.6). Resolve those through the
          // glyph-name table; unmapped codes keep falling through to
          // the WinAnsi default per code, so a sparse Differences
          // overlay composes with the existing fallback.
          val encDict = {
            val ind = java.util.regex.Pattern
              .compile("/Encoding\\s+(\\d+)\\s+\\d+\\s+R").matcher(fdict)
            if (ind.find()) body(ind.group(1).toInt) else Some(fdict)
          }
          val diff = encDict.map(parseDifferences).getOrElse(Map.empty)
          if (diff.isEmpty) None
          else Some(name -> FontDecode(diff, twoByte = false))
        } else streamOf(tu.group(1).toInt).map { cs =>
          val map = scala.collection.mutable.Map.empty[Int, String]
          val widths = scala.collection.mutable.Set.empty[Int]
          parseToUnicodeCMap(cs, map, widths)
          name -> FontDecode(map.toMap, widths == scala.collection.Set(2))
        }
      }
    }.toMap
  }

  /** Parse a `/Differences [ code /name /name code /name … ]` array
    * into code → text via [[glyphToText]]; names outside the glyph
    * table are skipped (their codes keep the WinAnsi fallback, the
    * same practical behavior PyPDF2-era extractors have for exotic
    * glyph names).
    */
  private[sources] def parseDifferences(dict: String): Map[Int, String] = {
    val dm = java.util.regex.Pattern
      .compile("/Differences\\s*\\[([^\\]]*)\\]").matcher(dict)
    if (!dm.find()) return Map.empty
    val toks = java.util.regex.Pattern
      .compile("(\\d+)|/([A-Za-z0-9._]+)").matcher(dm.group(1))
    val out = scala.collection.mutable.Map.empty[Int, String]
    var code = 0
    while (toks.find()) {
      if (toks.group(1) != null) code = toks.group(1).toInt
      else {
        glyphToText(toks.group(2)).foreach(t => out(code) = t)
        code += 1
      }
    }
    out.toMap
  }

  /** Glyph name → text: the `uniXXXX`/`uXXXX[XX]` hex conventions plus
    * the common-subset Adobe Glyph List (letters and digits are their
    * own names; ASCII punctuation, typographic marks, the frequent
    * accented Latin set, fi/fl ligatures). Unknown names → None.
    */
  private[graft] def glyphToText(g: String): Option[String] = {
    if (g.length == 1 && g.head.isLetter) return Some(g)
    if (g.startsWith("uni") && g.length >= 7 &&
        g.drop(3).forall(c => Character.digit(c, 16) >= 0))
      // uniXXXX[XXXX…]: each 4-hex group is one UTF-16 code unit
      return Some(g.drop(3).grouped(4).filter(_.length == 4)
        .map(h => Integer.parseInt(h, 16).toChar).mkString)
    if (g.startsWith("u") && g.length >= 5 && g.length <= 7 &&
        g.drop(1).forall(c => Character.digit(c, 16) >= 0))
      return Some(new String(Character.toChars(Integer.parseInt(g.drop(1), 16))))
    AglCommon.get(g)
  }

  private val AglCommon: Map[String, String] = {
    val digits = Seq("zero", "one", "two", "three", "four", "five", "six",
      "seven", "eight", "nine").zipWithIndex.map { case (n, i) =>
      n -> i.toString }
    val punct = Map(
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
      "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
      "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
      "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
      "greater" -> ">", "question" -> "?", "at" -> "@",
      "bracketleft" -> "[", "backslash" -> "\\", "bracketright" -> "]",
      "asciicircum" -> "^", "underscore" -> "_", "grave" -> "`",
      "braceleft" -> "{", "bar" -> "|", "braceright" -> "}",
      "asciitilde" -> "~")
    val typo = Map(
      "bullet" -> "•", "emdash" -> "—", "endash" -> "–",
      "quoteleft" -> "‘", "quoteright" -> "’", "quotedblleft" -> "“",
      "quotedblright" -> "”", "ellipsis" -> "…", "Euro" -> "€",
      "dagger" -> "†", "daggerdbl" -> "‡", "trademark" -> "™",
      "copyright" -> "©", "registered" -> "®", "degree" -> "°",
      "plusminus" -> "±", "multiply" -> "×", "divide" -> "÷",
      "fi" -> "fi", "fl" -> "fl", "germandbls" -> "ß",
      "exclamdown" -> "¡", "questiondown" -> "¿", "sterling" -> "£",
      "yen" -> "¥", "cent" -> "¢", "section" -> "§", "paragraph" -> "¶")
    val accents = Map(
      "agrave" -> "à", "aacute" -> "á", "acircumflex" -> "â",
      "atilde" -> "ã", "adieresis" -> "ä", "aring" -> "å", "ae" -> "æ",
      "ccedilla" -> "ç", "egrave" -> "è", "eacute" -> "é",
      "ecircumflex" -> "ê", "edieresis" -> "ë", "igrave" -> "ì",
      "iacute" -> "í", "icircumflex" -> "î", "idieresis" -> "ï",
      "ntilde" -> "ñ", "ograve" -> "ò", "oacute" -> "ó",
      "ocircumflex" -> "ô", "otilde" -> "õ", "odieresis" -> "ö",
      "oslash" -> "ø", "ugrave" -> "ù", "uacute" -> "ú",
      "ucircumflex" -> "û", "udieresis" -> "ü", "yacute" -> "ý",
      "ydieresis" -> "ÿ", "eth" -> "ð", "thorn" -> "þ")
    val upperAccents = accents.map { case (k, v) =>
      k.capitalize -> v.toUpperCase }
    val ligUpper = Map("AE" -> "Æ", "OE" -> "Œ", "oe" -> "œ")
    (digits ++ punct ++ typo ++ accents ++ upperAccents ++ ligUpper).toMap
  }

  /** Merge one ToUnicode CMap stream's mappings into `into`. Handles
    * `beginbfchar` pairs (`<src> <dst>`) and `beginbfrange` entries in
    * both forms (`<lo> <hi> <dstStart>` with the last UTF-16 code unit
    * incrementing, and `<lo> <hi> [<d0> <d1> …]`), for one-byte (2 hex
    * digit) AND two-byte (4 hex digit — CID/Identity-H fonts) source
    * codes; each parsed source's byte width is recorded in `widths` so
    * the caller can pick the string-decoding mode. Destination hex is
    * UTF-16BE (multi-char destinations — ligatures — are kept whole).
    * Map keys are WIDTH-TAGGED (two-byte sources store as
    * `0x10000 | code`) so a one-byte <41> and a two-byte <0041> source
    * never collide in the merged map — a mixed-width document falling
    * back to the merged policy resolves each code under its own width.
    * Maps from several fonts merge; on a same-width code collision the
    * first mapping wins, which is only ambiguous for multi-font
    * documents whose subset encoders disagree — the per-font path
    * ([[resolveFonts]]) handles those.
    */
  private[sources] def parseToUnicodeCMap(cs: String,
      into: scala.collection.mutable.Map[Int, String],
      widths: scala.collection.mutable.Set[Int]): Unit = {
    def utf16(hex: String): String = {
      val h = if (hex.length % 2 == 1) hex + "0" else hex
      if (h.length >= 4 && h.length % 4 == 0)
        new String(h.grouped(4).map(g => Integer.parseInt(g, 16).toChar).toArray)
      else new String(h.grouped(2).map(g => Integer.parseInt(g, 16).toChar).toArray)
    }
    def addIfAbsent(code: Int, srcWidth: Int, dst: String): Unit =
      if (dst.nonEmpty) {
        widths += srcWidth
        val key = if (srcWidth == 2) TwoByteTag | code else code
        if (!into.contains(key)) into(key) = dst
      }
    // a source token is usable when its hex spells exactly 1 or 2 bytes
    def srcWidth(hex: String): Int =
      if (hex.length == 2) 1 else if (hex.length == 4) 2 else 0
    def tokens(body: String): Array[String] =
      body.replace("[", " [ ").replace("]", " ] ").split("\\s+").filter(_.nonEmpty)
    def hexTok(t: String): Option[String] =
      if (t.length >= 2 && t.head == '<' && t.last == '>') {
        val h = t.substring(1, t.length - 1)
        if (h.nonEmpty && h.forall(c => Character.digit(c, 16) >= 0)) Some(h)
        else None
      } else None
    def sections(begin: String, end: String): Iterator[String] = {
      val b = java.util.regex.Pattern.quote(begin)
      val e = java.util.regex.Pattern.quote(end)
      s"$b([\\s\\S]*?)$e".r.findAllMatchIn(cs).map(_.group(1))
    }
    for (body <- sections("beginbfchar", "endbfchar")) {
      val ts = tokens(body)
      var i = 0
      while (i + 1 < ts.length) {
        (hexTok(ts(i)), hexTok(ts(i + 1))) match {
          case (Some(src), Some(dst)) =>
            val w = srcWidth(src)
            if (w > 0) addIfAbsent(Integer.parseInt(src, 16), w, utf16(dst))
            i += 2
          case _ => i += 1 // malformed token: resync on the next one
        }
      }
    }
    for (body <- sections("beginbfrange", "endbfrange")) {
      val ts = tokens(body)
      var i = 0
      while (i + 2 < ts.length) {
        (hexTok(ts(i)), hexTok(ts(i + 1))) match {
          case (Some(lo), Some(hi)) if ts(i + 2) == "[" =>
            // array form: one destination per consecutive code
            var j = i + 3
            val w = if (lo.length == hi.length) srcWidth(lo) else 0
            var code = if (w > 0) Integer.parseInt(lo, 16) else -1
            val hiCode = if (w > 0) Integer.parseInt(hi, 16) else -1
            while (j < ts.length && ts(j) != "]") {
              hexTok(ts(j)).foreach { dst =>
                if (code >= 0 && code <= hiCode) addIfAbsent(code, w, utf16(dst))
                code += 1
              }
              j += 1
            }
            i = j + 1
          case (Some(lo), Some(hi)) if hexTok(ts(i + 2)).isDefined =>
            val w = if (lo.length == hi.length) srcWidth(lo) else 0
            if (w > 0) {
              val loC = Integer.parseInt(lo, 16)
              val hiC = Integer.parseInt(hi, 16)
              val dst = utf16(hexTok(ts(i + 2)).get)
              // the LAST UTF-16 code unit increments across the range
              var c = loC
              while (c <= hiC) {
                val d = dst.toCharArray
                d(d.length - 1) = (d(d.length - 1) + (c - loC)).toChar
                addIfAbsent(c, w, new String(d))
                c += 1
              }
            }
            i += 3
          case _ => i += 1
        }
      }
    }
  }

  /** PDF/TIFF-variant LZW decode (ISO 32000 §7.4.4): 9→12-bit
    * variable-width codes, 256 = clear-table, 257 = end-of-data,
    * EarlyChange = 1 (the spec default — the code width bumps one
    * entry early, when the dictionary reaches 2^w − 1). Predictors
    * (/DecodeParms /Predictor > 1) are not applied — text content
    * streams don't use them; a predicted stream decodes to bytes that
    * simply yield no text operators. None on malformed data.
    */
  private[graft] def lzwDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    val dict = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def reset(): Unit = {
      dict.clear()
      var i = 0
      while (i < 256) { dict += Array(i.toByte); i += 1 }
      dict += null; dict += null // 256 clear / 257 EOD placeholders
    }
    reset()
    var width = 9
    var prev: Array[Byte] = null
    var bitBuf = 0L
    var bits = 0
    var i = 0
    var done = false
    while (i < data.length && !done) {
      bitBuf = (bitBuf << 8) | (data(i) & 0xFF)
      bits += 8
      i += 1
      while (bits >= width && !done) {
        val code = ((bitBuf >>> (bits - width)) & ((1L << width) - 1)).toInt
        bits -= width
        if (code == 256) { reset(); width = 9; prev = null }
        else if (code == 257) done = true
        else {
          val entry: Array[Byte] =
            if (code < dict.size && dict(code) != null) dict(code)
            else if (code == dict.size && prev != null) prev :+ prev(0)
            else return None // code ahead of the dictionary: corrupt
          if (out.size + entry.length > MaxStreamBytes) return None // bomb
          out.write(entry, 0, entry.length)
          if (prev != null) dict += (prev :+ entry(0))
          prev = entry
          // EarlyChange: the decoder runs one entry behind the
          // encoder, so it widens at 2^w − 1 (510 added → next code
          // reads as 10-bit)
          if (dict.size >= (1 << width) - 1 && width < 12) width += 1
        }
      }
    }
    Some(out.toByteArray)
  }

  /** /ASCIIHexDecode (ISO 32000 §7.4.2): hex pairs, whitespace
    * ignored, `>` terminates, odd trailing digit pads with 0. None on
    * a non-hex byte before the terminator.
    */
  private[graft] def asciiHexDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    var i = 0
    while (i < data.length) {
      val c = data(i).toChar
      if (c == '>') {
        if (hi >= 0) out.write(hi << 4)
        return Some(out.toByteArray)
      } else if (!c.isWhitespace) {
        val d = Character.digit(c, 16)
        if (d < 0) return None
        if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // EOD omitted by sloppy writers
    Some(out.toByteArray)
  }

  /** /ASCII85Decode (ISO 32000 §7.4.3): 5 chars `!`..`u` → 4 bytes
    * base 85, `z` = four zero bytes (only between groups), `~>`
    * terminates, partial final group of n chars yields n−1 bytes.
    * None on out-of-range characters or a 1-char final group.
    */
  private[graft] def ascii85Decode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    val group = new Array[Int](5)
    var gn = 0
    def flush(n: Int): Boolean = {
      if (n < 2) return n == 0
      var v = 0L
      var i = 0
      while (i < 5) { v = v * 85 + (if (i < n) group(i) else 84); i += 1 }
      if (v > 0xFFFFFFFFL) return false // group encodes > 2^32 - 1
      var shift = 24
      var k = 0
      while (k < n - 1) {
        out.write(((v >>> shift) & 0xFF).toInt); shift -= 8; k += 1
      }
      true
    }
    var i = 0
    while (i < data.length) {
      val c = data(i).toChar
      if (c == '~') { // ~> EOD
        return if (flush(gn)) Some(out.toByteArray) else None
      } else if (c == 'z' && gn == 0) {
        out.write(0); out.write(0); out.write(0); out.write(0)
      } else if (c >= '!' && c <= 'u') {
        group(gn) = c - '!'; gn += 1
        if (gn == 5) { if (!flush(5)) return None; gn = 0 }
      } else if (!c.isWhitespace) return None
      i += 1
    }
    if (flush(gn)) Some(out.toByteArray) else None // EOD omitted
  }

  /** /RunLengthDecode (ISO 32000 §7.4.5): length byte L — 0..127 copy
    * the next L+1 bytes verbatim, 129..255 repeat the next byte
    * 257−L times, 128 = EOD. None on a truncated run.
    */
  private[graft] def runLengthDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      val l = data(i) & 0xFF
      if (l == 128) return Some(out.toByteArray)
      else if (l < 128) {
        if (i + 1 + l + 1 > data.length) return None
        out.write(data, i + 1, l + 1)
        i += l + 2
      } else {
        if (i + 1 >= data.length) return None
        if (out.size + (257 - l) > MaxStreamBytes) return None // bomb
        var k = 257 - l
        while (k > 0) { out.write(data(i + 1)); k -= 1 }
        i += 2
      }
    }
    Some(out.toByteArray) // EOD omitted by sloppy writers
  }

  /** Apply a stream dict's filter (or filter CHAIN — `/Filter
    * [/ASCII85Decode /FlateDecode]` applies left to right) to raw
    * stream bytes. Supported: Flate, LZW, ASCIIHex, ASCII85,
    * RunLength; an unsupported filter anywhere in the chain yields
    * None (image codecs, /Crypt — skipped, not errors).
    */
  private[sources] def decodeFiltered(dict: String,
      data: Array[Byte]): Option[Array[Byte]] = {
    if (!dict.contains("/Filter")) return Some(data)
    // every standard filter name ends in "Decode" except /Crypt;
    // /DecodeParms cannot match (nothing precedes its "Decode")
    val names = java.util.regex.Pattern.compile("/(\\w+Decode|Crypt)")
      .matcher(dict.substring(dict.indexOf("/Filter")))
    var out: Option[Array[Byte]] = Some(data)
    var any = false
    while (names.find() && out.isDefined) {
      any = true
      out = names.group(1) match {
        case "FlateDecode"    => out.flatMap(inflate)
        case "LZWDecode"      => out.flatMap(lzwDecode)
        case "ASCIIHexDecode" => out.flatMap(asciiHexDecode)
        case "ASCII85Decode"  => out.flatMap(ascii85Decode)
        case "RunLengthDecode" => out.flatMap(runLengthDecode)
        case _                => None
      }
    }
    if (any) out else None // /Filter present but no name parsed: skip
  }

  /** zlib inflate with raw-deflate fallback (some writers omit the
    * zlib wrapper); None on truncated or undecodable data.
    */
  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    def run(rawMode: Boolean): Option[Array[Byte]] = {
      val inf = new java.util.zip.Inflater(rawMode)
      try {
        inf.setInput(data)
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var stuck = false
        while (!inf.finished() && !stuck) {
          val n = inf.inflate(buf)
          if (n > 0) {
            if (bos.size + n > MaxStreamBytes) stuck = true // inflate bomb
            else bos.write(buf, 0, n)
          } else if (inf.needsInput() || inf.needsDictionary()) stuck = true
        }
        if (inf.finished()) Some(bos.toByteArray) else None
      } catch {
        case _: java.util.zip.DataFormatException => None
      } finally inf.end()
    }
    run(false).orElse(run(true))
  }

  /** Windows-1252 decode of one byte: Latin-1 identity except the
    * 0x80–0x9F block (smart quotes, dashes, euro — what word
    * processors actually emit into WinAnsiEncoding strings).
    */
  private val winAnsiHigh: Map[Int, Char] = Map(
    0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
    0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
    0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
    0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
    0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
    0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
    0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')
  private def winAnsi(code: Int): Char =
    winAnsiHigh.getOrElse(code & 0xFF, (code & 0xFF).toChar)

  /** Run the text operators of one decoded content stream. Strings
    * accumulate as operands; Tj, ', ", TJ emit them; Td, TD, T*, Tm
    * emit a line break between text positions. `cmap` carries the
    * document's merged ToUnicode mappings; with `twoByte` the string
    * bytes decode as big-endian two-byte codes (CID/Identity-H fonts —
    * unmapped codes emit nothing, like PyPDF2 missing a CID), otherwise
    * per byte with WinAnsi for unmapped codes. When `fonts` resolves
    * the name a `Tf` operator selects, that font's own CMap and byte
    * width override the merged policy for the following runs — the
    * mixed 1-/2-byte-font case. Escape sequences and nested parens
    * produce string BYTES first and decode through the font mapping
    * like any other byte (PDF string semantics).
    */
  private[sources] def extractTextOps(content: String,
      cmap: Map[Int, String] = Map.empty, twoByte: Boolean = false,
      fonts: Map[String, FontDecode] = Map.empty): String = {
    val out = new StringBuilder
    val operands = scala.collection.mutable.ArrayBuffer.empty[String]
    var inText = false
    val n = content.length
    var i = 0
    var lastName: String = "" // most recent /Name operand (Tf's font)
    var curFont: Option[FontDecode] = None
    def decodeByte(code: Int): String = {
      val m = curFont.map(_.cmap).getOrElse(cmap)
      m.getOrElse(code & 0xFF, winAnsi(code).toString)
    }
    def decodeCodes(bs: scala.collection.Seq[Int]): String = {
      val (m, two) = curFont match {
        case Some(f) => (f.cmap, f.twoByte)
        case None => (cmap, twoByte)
      }
      if (two)
        // odd trailing byte: ignored (a malformed CID string)
        bs.grouped(2).collect { case scala.collection.Seq(a, b) =>
          m.getOrElse(TwoByteTag | ((a & 0xFF) << 8) | (b & 0xFF), "")
        }.mkString
      else bs.iterator.map(decodeByte).mkString
    }

    def newline(): Unit =
      if (out.nonEmpty && out.last != '\n') out.append('\n')
    def emit(prefixNewline: Boolean): Unit = {
      if (prefixNewline) newline()
      operands.foreach(out.append)
      operands.clear()
    }
    def parseLiteral(start: Int): Int = {
      val bs = scala.collection.mutable.ArrayBuffer.empty[Int]
      var depth = 1
      var j = start + 1
      while (j < n && depth > 0) {
        val ch = content.charAt(j)
        if (ch == '\\' && j + 1 < n) {
          content.charAt(j + 1) match {
            case 'n' => bs += '\n'.toInt; j += 2
            case 'r' => bs += '\r'.toInt; j += 2
            case 't' => bs += '\t'.toInt; j += 2
            case 'b' => bs += '\b'.toInt; j += 2
            case 'f' => bs += '\f'.toInt; j += 2
            case '\r' => // line continuation
              j += 2; if (j < n && content.charAt(j) == '\n') j += 1
            case '\n' => j += 2
            case d if d >= '0' && d <= '7' =>
              var k = j + 1; var v = 0; var cnt = 0
              while (k < n && cnt < 3 && content.charAt(k) >= '0' &&
                  content.charAt(k) <= '7') {
                v = v * 8 + (content.charAt(k) - '0'); k += 1; cnt += 1
              }
              bs += v; j = k
            case other => bs += other.toInt; j += 2 // covers \( \) \\
          }
        } else if (ch == '(') { depth += 1; bs += '('.toInt; j += 1 }
        else if (ch == ')') { depth -= 1; if (depth > 0) bs += ')'.toInt; j += 1 }
        else { bs += ch.toInt; j += 1 }
      }
      operands += decodeCodes(bs)
      j
    }
    def parseHex(start: Int): Int = {
      val bs = scala.collection.mutable.ArrayBuffer.empty[Int]
      var j = start + 1
      var hi = -1
      while (j < n && content.charAt(j) != '>') {
        val ch = content.charAt(j)
        val d = Character.digit(ch, 16)
        if (d >= 0) {
          if (hi < 0) hi = d
          else { bs += hi * 16 + d; hi = -1 }
        }
        j += 1
      }
      if (hi >= 0) bs += hi * 16 // odd digit count: pad 0
      operands += decodeCodes(bs)
      if (j < n) j + 1 else j
    }

    while (i < n) {
      val c = content.charAt(i)
      if (c == '(') i = parseLiteral(i)
      else if (c == '<' && i + 1 < n && content.charAt(i + 1) == '<') i += 2
      else if (c == '<') i = parseHex(i)
      else if (c == '>' ) i += 1 // tail of '>>'
      else if (c == '%') { while (i < n && content.charAt(i) != '\n') i += 1 }
      else if (c == '/') {
        i += 1
        val nameStart = i
        while (i < n && !" \t\r\n()<>[]{}/%".contains(content.charAt(i))) i += 1
        lastName = content.substring(nameStart, i)
      } else if (c.isLetter || c == '\'' || c == '"' || c == '*') {
        val start = i
        while (i < n && (content.charAt(i).isLetterOrDigit ||
            "'\"*".contains(content.charAt(i)))) i += 1
        content.substring(start, i) match {
          case "BT" => inText = true; operands.clear()
          case "ET" => inText = false; operands.clear()
          case "Tj" => if (inText) emit(prefixNewline = false) else operands.clear()
          case "TJ" => if (inText) emit(prefixNewline = false) else operands.clear()
          case "'" | "\"" => if (inText) emit(prefixNewline = true) else operands.clear()
          case "Td" | "TD" | "Tm" | "T*" => newline(); operands.clear()
          case "Tf" => // font select: /Name size Tf — switch decoding;
            // an unresolved name reverts to the merged-CMap policy
            curFont = fonts.get(lastName)
            operands.clear()
          case _ => operands.clear() // any other operator consumes its operands
        }
      } else i += 1 // digits, signs, whitespace, [ ] { }
    }
    out.toString
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Markdown → plain text — the third member of the text-extraction
  * family (HTML regexp chain, RTF state machine, and this): crawl and
  * code-hosting corpora carry large volumes of markdown whose syntax
  * characters would otherwise pollute token statistics, language ID
  * and shingle fingerprints.
  *
  * A pure regexp_replace chain like [[HtmlToText]] — codegen'd,
  * UDF-free, safe in the ingest hot path — built CAPTURELESS so the
  * DuckDB oracle replays the identical steps (replacement-group
  * syntax differs between engines; literal replacements don't).
  * Fidelity choices, documented:
  *  - fenced code blocks drop entirely (like HTML script tags: code
  *    is not prose); inline code keeps its content, backticks strip;
  *  - links/images keep the TEXT and drop the URL: `](…)` and
  *    `][…]` erase, then stray brackets erase, so `[text](url)` →
  *    `text` without needing a capture group;
  *  - heading/blockquote/list-item/hr markers strip at line starts;
  *  - emphasis: `*` runs and `__` strip; SINGLE underscores are left
  *    alone on purpose — snake_case identifiers in technical prose
  *    would otherwise fuse.
  * The steps are public constants: the Column form folds them and the
  * correctness oracle generates from the same list, so the two
  * surfaces cannot drift.
  */
object MarkdownToText {

  /** (pattern, literal replacement) — applied in order. */
  val Steps: Seq[(String, String)] = Seq(
    "(?s)```.*?```" -> " ",           // fenced code blocks drop
    "`" -> "",                         // inline-code backticks strip
    "!\\[" -> "[",                    // image marker → plain link
    "\\]\\([^)]*\\)" -> "",          // inline link target drops
    "\\]\\[[^\\]]*\\]" -> "",       // reference link id drops
    "[\\[\\]]" -> "",                 // stray brackets
    "(?m)^#{1,6}[ \\t]*" -> "",       // headings
    "(?m)^>[ \\t]?" -> "",            // blockquotes
    "(?m)^[ \\t]*([-*+]|\\d+\\.)[ \\t]+" -> "", // list markers
    "(?m)^(-{3,}|\\*{3,}|_{3,})[ \\t]*$" -> " ", // horizontal rules
    "\\*{1,3}" -> "",                 // emphasis asterisks
    "__" -> "",                        // double-underscore emphasis
    "~~" -> "")                        // strikethrough

  /** Strip markdown syntax, collapse whitespace. */
  def markdownToText(c: Column): Column =
    Normalize.collapseWs(Steps.foldLeft(c) { case (acc, (pat, rep)) =>
      regexp_replace(acc, pat, rep)
    })
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C5: HTML → plain text (reference: src/rss_feed_etl/utils/html_utils.py:7-22
  * wraps html2text with images/emphasis dropped, links kept as text,
  * no line wrapping; applied at core/etl.py:142-143).
  *
  * Implemented as a pure regexp_replace chain over built-in functions —
  * stays inside WholeStageCodegen (no UDF), and is therefore safe in
  * the 100 TB ingest hot path. Fidelity target is the reference's
  * observable behavior: tags stripped, entities decoded, whitespace
  * collapsed.
  */
object HtmlToText {

  private val entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ",
    "&amp;" -> "&",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&apos;" -> "'"
  )

  /** Strip tags/scripts/styles/comments, decode common entities,
    * collapse whitespace.
    */
  def htmlToText(c: Column): Column = {
    // script/style blocks go first (content dropped entirely), then
    // comments, then any remaining tag becomes a space so adjacent
    // words don't fuse. No backreferences — the chain stays portable to
    // RE2-based engines (the correctness oracle re-runs it in SQL).
    val noScript = regexp_replace(c,
      "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    // <br> and block-closers become spaces via the generic tag rule.
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = entities.foldLeft(noTags) { case (acc, (ent, rep)) =>
      regexp_replace(acc, ent, rep)
    }
    // numeric entities: &#NNN; → best effort drop (rare in feeds)
    val noNumEnt = regexp_replace(decoded, "&#\\d+;", " ")
    Normalize.collapseWs(noNumEnt)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation: the dedup key a crawl
  * pipeline computes BEFORE any content hashing (tracking-param
  * variants of one page outnumber true near-dups in feed/crawl data).
  *
  * Everything is a chain of `regexp_extract`/`regexp_replace` builtins
  * — codegen'd, no UDFs — and every pattern is RE2-safe (no backrefs,
  * no lookaround) so an external engine reproduces the exact output.
  * Contract: absolute `scheme://…` URLs are canonicalized; anything
  * else passes through trimmed (a crawl frontier treats relative URLs
  * as join-time errors, not data).
  *
  * Canonical form: lowercased scheme and host, `www.` prefix dropped,
  * default port dropped (`:80` http, `:443` https), fragment dropped,
  * tracking parameters dropped (`utm_*`, `fbclid`, `gclid`, `msclkid`,
  * `ref` — matched lowercase, the convention they are emitted in),
  * empty query string dropped, empty path normalized to `/`.
  */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val RestRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$"
  private val TrackNames = "(?:utm_[a-zA-Z0-9]+|fbclid|gclid|msclkid|ref)"

  /** Lowercased scheme of an absolute URL ('' when not absolute). */
  def scheme(url: Column): Column =
    lower(regexp_extract(trim(url), SchemeRe, 1))

  /** Lowercased host (with any explicit port) of an absolute URL. */
  private def rawHost(url: Column): Column =
    lower(regexp_extract(trim(url), HostRe, 1))

  /** Canonical host: lowercased, `www.` and default port dropped. */
  def host(url: Column): Column = {
    val h = regexp_replace(rawHost(url), "^www\\.", "")
    when(scheme(url) === "http", regexp_replace(h, ":80$", ""))
      .when(scheme(url) === "https", regexp_replace(h, ":443$", ""))
      .otherwise(h)
  }

  /** Registrable domain (heuristic eTLD+1): the last label pair, or
    * the last THREE labels under the common two-part public suffixes
    * (`co.uk`-style). A full public-suffix-list lookup is a broadcast
    * join against the published list; this column form covers the
    * dominant suffixes without a side table.
    */
  def registrableDomain(url: Column): Column = {
    val suffix2 = "(?:co|com|org|net|ac|gov|edu)\\.(?:uk|jp|au|br|in|cn|mx|nz|za|kr)"
    val h = regexp_replace(host(url), ":[0-9]+$", "")
    // the suffix group is optional so a single-label host (localhost,
    // intranet names) returns itself instead of ''
    regexp_extract(h, s"([^.]+(?:\\.(?:$suffix2|[^.]+))?)$$", 1)
  }

  /** The path?query part, canonicalized: fragment dropped, tracking
    * params dropped, empty query dropped, empty path → `/`. The query
    * string is split on `&` and FILTERED (not regex-surgered: a
    * sequential replace mishandles consecutive tracking params because
    * adjacent matches share their separator) — params keep their
    * original order; a full canonicalizer that also SORTS params is a
    * `array_sort` away, deliberately not done here (param order can be
    * semantic).
    */
  private def canonicalRest(url: Column): Column = {
    val rest0 = regexp_extract(trim(url), RestRe, 1)
    val noFrag = regexp_replace(rest0, "#.*$", "")
    val path = regexp_extract(noFrag, "^([^?]*)", 1)
    val qs = regexp_extract(noFrag, "\\?(.*)$", 1)
    val kept = filter(split(qs, "&"),
      x => x =!= "" && !x.rlike(s"^$TrackNames="))
    val path2 = when(path === "", lit("/")).otherwise(path)
    when(size(kept) === 0, path2)
      .otherwise(concat(path2, lit("?"), array_join(kept, "&")))
  }

  /** Full canonical URL (see object doc for the form). */
  def normalizeUrl(url: Column): Column =
    when(trim(url).rlike(SchemeRe),
      concat(scheme(url), lit("://"), host(url), canonicalRest(url)))
      .otherwise(trim(url))
}

package graft

import graft.functions.Urls
import org.apache.spark.sql.functions._

/** URL canonicalization: the crawl-pipeline dedup key. */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.normalizeUrl(col("u"))).as[String].collect().toSeq

  private def dom(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.registrableDomain(col("u"))).as[String].collect().toSeq

  test("tracking-param variants collapse to one canonical URL") {
    val variants = Seq(
      "HTTPS://WWW.Example.COM:443/page/7?utm_source=feed&utm_campaign=w&id=7#frag",
      "https://example.com/page/7?id=7",
      "https://www.example.com/page/7?utm_medium=rss&id=7&ref=home")
    assert(norm(variants: _*).distinct == Seq("https://example.com/page/7?id=7"))
  }

  test("scheme and explicit non-default port stay distinct") {
    assert(norm("http://EXAMPLE.com:80/a?id=1&gclid=xyz").head ==
      "http://example.com/a?id=1")
    assert(norm("https://example.com:8080/a?fbclid=abc").head ==
      "https://example.com:8080/a")
    // :80 is only default for http, :443 only for https
    assert(norm("https://example.com:80/a").head == "https://example.com:80/a")
  }

  test("consecutive tracking params are all dropped (split, not regex surgery)") {
    assert(norm("https://a.com/p?utm_a=1&utm_b=2&utm_c=3&x=9").head ==
      "https://a.com/p?x=9")
    // tracking-only query: the '?' goes too
    assert(norm("https://a.com/p?utm_a=1&fbclid=2").head == "https://a.com/p")
    // kept params preserve their original order
    assert(norm("https://a.com/p?b=2&utm_x=0&a=1").head == "https://a.com/p?b=2&a=1")
  }

  test("edges: empty path, fragments, pass-through, path is untouched") {
    assert(norm("https://Example.com").head == "https://example.com/")
    assert(norm("https://a.com/p#section-2").head == "https://a.com/p")
    // not an absolute URL → trimmed pass-through, never mangled
    assert(norm("  not a url  ").head == "not a url")
    assert(norm("/relative/path?utm_a=1").head == "/relative/path?utm_a=1")
    // 'ref=' in the PATH is not a query param — survives
    assert(norm("https://a.com/ref=xy/item").head == "https://a.com/ref=xy/item")
  }

  test("registrableDomain handles eTLD+1, two-part suffixes, ports") {
    assert(dom(
      "https://news.sub.example.com/x",
      "https://www.shop.example.co.uk/x",
      "https://example.com:8080/x",
      "https://localhost/x") ==
      Seq("example.com", "example.co.uk", "example.com", "localhost"))
  }
}

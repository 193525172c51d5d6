package graft

import graft.functions.{HtmlToText, Normalize}
import graft.operators.Filters
import org.apache.spark.sql.functions._

/** Filter + scalar-function semantics from SURVEY §2.2/§2.8 and
  * FIXTURES.md §5 — cases the reference leaves untested.
  */
class FiltersSpec extends SparkSpec {
  import spark.implicits._

  private val asOf = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")

  test("dateRange drops old, unparseable and null dates; <=0 disables") {
    val df = Seq(
      ("in", "2024-01-25 00:00:00"),
      ("old", "2023-11-01 00:00:00"),
      ("junk", "not a date"),
      ("null", null)
    ).toDF("id", "published")
    val kept = df.filter(Filters.dateRange(Normalize.tsParse($"published"), 30, asOf))
      .select("id").as[String].collect().toSet
    assert(kept == Set("in"))
    assert(df.filter(Filters.dateRange(Normalize.tsParse($"published"), 0, asOf))
      .count() == 4)
  }

  test("nonEmptyContent drops null / blank / whitespace / 'nan'") {
    val df = Seq(
      ("ok", "content"),
      ("empty", ""),
      ("ws", "   "),
      ("nan", "nan"),
      ("null", null)
    ).toDF("id", "summary")
    val kept = df.filter(Filters.nonEmptyContent(Seq("summary")))
      .select("id").as[String].collect().toSet
    assert(kept == Set("ok"))
  }

  test("keywordExclusion is case-insensitive by default and null-safe") {
    val df = Seq(
      ("1", "Senior Data Engineer"),
      ("2", "sales INTERN position"),
      ("3", null),
      ("4", "Manager of sales")
    ).toDF("id", "title")
    val kept = df.filter(Filters.keywordExclusion(
        Map("title" -> Seq("intern", "Sales"))))
      .select("id").as[String].collect().toSet
    assert(kept == Set("1", "3")) // null column is a non-match (na=False)
    val cs = df.filter(Filters.keywordExclusion(
        Map("title" -> Seq("SALES")), caseSensitive = true))
      .select("id").as[String].collect().toSet
    assert(cs == Set("1", "2", "3", "4")) // no literal 'SALES' anywhere
  }

  test("validatePk counts invalid and duplicate keys without collecting") {
    val df = Seq("a", "a", "b", "", null).toDF("link")
    val (valid, invalid, dups) = Filters.validatePk(df, "link")
    assert(invalid == 2)
    assert(dups == 1)
    assert(valid.count() == 3)
  }

  test("htmlToText strips tags/scripts, decodes entities, collapses ws") {
    val df = Seq(
      "<p>Hello <b>world</b></p>",
      "<script>var x = 1;</script>text &amp; more&nbsp;here",
      "a\n\n  b"
    ).toDF("html")
    val out = df.select(HtmlToText.htmlToText($"html").as("t"))
      .as[String].collect()
    assert(out(0) == "Hello world")
    assert(out(1) == "text & more here")
    assert(out(2) == "a b")
  }

  test("markdownToText strips syntax, keeps link text, drops fenced code") {
    import graft.functions.MarkdownToText
    val df = Seq(
      "# Head\n\nbody *em* **strong** __u__ ~~gone~~",
      "- item one\n1. item two\n> quoted",
      "See [docs](http://x) and ![alt](img.png) or [ref][1]",
      "`inline code` stays\n\n```\nfenced code goes\n```\nafter",
      "keep snake_case words_like_this intact",
      "---\nbetween rules\n***"
    ).toDF("md")
    val out = df.select(MarkdownToText.markdownToText($"md").as("t"))
      .as[String].collect()
    assert(out(0) == "Head body em strong u gone")
    assert(out(1) == "item one item two quoted")
    assert(out(2) == "See docs and alt or ref")
    assert(out(3) == "inline code stays after")
    assert(out(4) == "keep snake_case words_like_this intact")
    assert(out(5) == "between rules")
  }

  test("preferNonBlank keeps history notes when new notes blank") {
    val df = Seq(
      ("", "old"), ("  ", "old2"), ("new", "old3"), (null, "old4")
    ).toDF("n", "h")
    val out = df.select(Normalize.preferNonBlank($"n", $"h").as("v"))
      .as[String].collect().toSeq
    assert(out == Seq("old", "old2", "new", "old4"))
  }

  test("tsParse coerces bad input to null across formats") {
    val df = Seq(
      "2024-01-10 12:00:00", "2024-01-10", "Wed, 10 Jan 2024 12:00:00 +0000",
      "garbage"
    ).toDF("s")
    val out = df.select(Normalize.tsParse($"s").as("ts")).collect().map(_.get(0))
    assert(out(0) != null && out(1) != null && out(2) != null)
    assert(out(3) == null)
  }

  test("hash sampling is deterministic, salted, and near the fraction") {
    import graft.operators.Filters
    val ids = (1L to 2000L).toDF("id")
    def sample(salt: String) = ids.filter(Filters.hashSample($"id", 0.2, salt))
      .as[Long].collect().toSet
    val a = sample("")
    assert(a == sample("")) // reproducible
    assert(math.abs(a.size - 400) < 80) // ~20%
    val b = sample("v2")
    assert(b != a) // independent sample per salt
    assert(math.abs(b.size - 400) < 80)
  }

  test("sessionize splits on gap and numbers sessions in order") {
    import graft.operators.Sessions
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 101L, t("2024-01-01 10:00:00")),
      (1L, 102L, t("2024-01-01 10:10:00")), // same session (10 min)
      (1L, 103L, t("2024-01-01 11:00:00")), // gap 50 min → new session
      (2L, 201L, t("2024-01-01 09:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val stats = Sessions.sessionStats(ev, "user_id", "ts", "event_id",
        gapSeconds = 1800, tsFormat = Normalize.tsFormat)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getAs[String]("session_start"), r.getLong(5))).toMap
    assert(stats((1L, 1L)) == ((2L, "2024-01-01 10:00:00", 600L)))
    assert(stats((1L, 2L)) == ((1L, "2024-01-01 11:00:00", 0L)))
    assert(stats((2L, 1L)) == ((1L, "2024-01-01 09:00:00", 0L)))
  }

  test("sortPublished falls back to raw-string order when no date parses") {
    import graft.operators.Filters
    val parseable = Seq(
      ("a", "2024-01-02 00:00:00"), ("b", "2024-01-03 00:00:00"),
      ("c", "2024-01-01 00:00:00")
    ).toDF("link", "published")
    assert(Filters.sortPublishedWithFallback(parseable, "published", "link")
      .select("link").as[String].collect().toSeq == Seq("b", "a", "c"))
    // every date garbage → the reference's raw-string fallback ordering
    val garbage = Seq(
      ("a", "zz-later"), ("b", "aa-earlier"), ("c", "mm-middle")
    ).toDF("link", "published")
    assert(Filters.sortPublishedWithFallback(garbage, "published", "link")
      .select("link").as[String].collect().toSeq == Seq("a", "c", "b"))
  }

  test("perKeyCap keeps at most n per key, deterministically, map-side pruned") {
    val df = (1L to 100L).map(i => (i, if (i % 3 == 0) "big" else "small"))
      .toDF("id", "domain")
    val capped = Filters.perKeyCap(df, "domain", "id", n = 5)
    val byKey = capped.groupBy("domain").count()
      .as[(String, Long)].collect().toMap
    assert(byKey == Map("big" -> 5L, "small" -> 5L))
    // deterministic: same pick set on a differently-partitioned input
    val again = Filters.perKeyCap(df.repartition(7), "domain", "id", n = 5)
      .select("id").as[Long].collect().toSet
    assert(again == capped.select("id").as[Long].collect().toSet)
    // pick_order is 1..n within each key
    assert(capped.filter(col("pick_order") < 1 || col("pick_order") > 5)
      .count() == 0)
    // the rank filter must rewrite to WindowGroupLimit so each map task
    // pre-prunes to n rows per key before the exchange
    assert(capped.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"))
  }

  test("splitAssign: disjoint, exhaustive, and stable under corpus growth") {
    import graft.operators.Filters
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val small = (1L to 200L).toDF("id")
      .select(col("id"), Filters.splitAssign(col("id"), splits).as("split"))
      .as[(Long, String)].collect().toMap
    // exhaustive: every row labeled with one of the three names
    assert(small.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(small.size == 200)
    // proportions land near the weights (md5-uniform draw)
    val counts = small.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 120 && counts("val") < 50 && counts("test") < 50)
    // growth-stable: the same key keeps its split in a 5x larger corpus
    val big = (1L to 1000L).toDF("id")
      .select(col("id"), Filters.splitAssign(col("id"), splits).as("split"))
      .as[(Long, String)].collect().toMap
    small.foreach { case (k, v) => assert(big(k) == v, s"id $k migrated") }
    // different salts give independent assignments (some keys move)
    val salted = (1L to 200L).toDF("id")
      .select(col("id"), Filters.splitAssign(col("id"), splits, "s2").as("split"))
      .as[(Long, String)].collect().toMap
    assert(small.exists { case (k, v) => salted(k) != v })
    // validation: weights must be positive and sum to 1
    intercept[IllegalArgumentException] {
      Filters.splitAssign(col("id"), Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Filters.splitAssign(col("id"), Seq("a" -> 1.5, "b" -> -0.5))
    }
    intercept[IllegalArgumentException] {
      Filters.splitAssign(col("id"), Seq.empty)
    }
    // single split: everything lands in it
    val one = (1L to 10L).toDF("id")
      .select(Filters.splitAssign(col("id"), Seq("all" -> 1.0)).as("split"))
      .as[String].collect()
    assert(one.forall(_ == "all"))
  }
}

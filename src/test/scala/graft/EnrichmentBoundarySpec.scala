package graft

import graft.operators.{Enrichment, TfIdf}
import graft.sources.ConfigSource
import org.apache.spark.sql.functions._

/** Config-sheet source (S3), TF-IDF similarity (C20) and the JSON sink
  * / LLM-response boundaries (C16/C17).
  */
class EnrichmentBoundarySpec extends SparkSpec {
  import spark.implicits._

  test("config source validates, drops blank keys, defaults job_title") {
    val raw = Seq(
      ("Feed A", "rss.app", "15min", "http://a", "SheetA", "Engineer"),
      ("Feed B", "rss.app", "15min", "", "SheetB", ""),     // blank url → drop
      ("Feed C", "rss.app", "15min", "http://c", "  ", ""), // blank ws → drop
      ("Feed D", "rss.app", "daily", "http://d", "SheetD", "")
    ).toDF("Title ", "reader", "time", "url", "worksheet_name", "job_title")
    val configs = ConfigSource.readFeedConfigs(raw).collect()
    assert(configs.length == 2)
    val d = configs.find(_.title == "Feed D").get
    assert(d.job_title == "Feed D") // defaulted from title
    assert(d.time_window == "daily")

    val missing = raw.drop("url")
    val e = intercept[IllegalArgumentException](
      ConfigSource.readFeedConfigs(missing))
    assert(e.getMessage.contains("url"))
  }

  test("tf-idf similarity ranks overlapping docs above disjoint ones") {
    val docs = Seq(
      (1L, "spark sql engine tuning and spark joins"),
      (2L, "gardening tips for tomato plants"),
      (3L, "sql query engine internals")
    ).toDF("doc_id", "text")
    val sims = TfIdf.similarity(docs, "doc_id", "text", "spark sql engine")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sims(1L) > sims(2L))
    assert(sims(3L) > sims(2L))
    assert(sims(2L) == 0.0)
    assert(sims.values.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("llm response parsing: json, percent fallback, junk") {
    val df = Seq(
      """{"match_percentage": 72.5, "matched_skills": ["python"], "missing_skills": ["go"]}""",
      "I estimate the match at 45% overall",
      "no signal here",
      """{"match_percentage": 250}"""
    ).toDF("resp")
    val out = df.select(Enrichment.parseLlmResponse($"resp").as("p"))
      .select("p.match_percentage", "p.matched_skills").collect()
    assert(out(0).getDouble(0) == 72.5)
    assert(out(0).getAs[scala.collection.Seq[String]](1).toSeq == Seq("python"))
    assert(out(1).getDouble(0) == 45.0)
    assert(out(2).getDouble(0) == 0.0)
    assert(out(3).getDouble(0) == 0.0) // out of range → clamped to 0
  }

  test("sink projection serializes array columns to JSON strings") {
    val df = Seq((1L, Seq("a", "b"), "keep")).toDF("id", "skills", "s")
    val out = Enrichment.toSinkColumns(df)
    assert(out.schema("skills").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(out.collect()(0).getAs[String]("skills") == """["a","b"]""")
    assert(out.collect()(0).getAs[String]("s") == "keep")
  }
}

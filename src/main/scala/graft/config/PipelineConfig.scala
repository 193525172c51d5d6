package graft.config

import graft.pipeline.JobPipeline
import graft.pipeline.JobPipeline.{FilterConfig, MergeUpsert, Scd1, Scd2, Strategy}
import scala.jdk.CollectionConverters._

/** YAML pipeline config mirroring the reference's config/config.yaml
  * keys (loading strategy at :16-20, expected columns :22-31, filter
  * section :82-183). Parsed with the Jackson YAML module that ships on
  * the Spark classpath — no extra dependency.
  *
  * Shape:
  * {{{
  * loading:
  *   strategy: scd1 | scd2 | merge_upsert
  * columns: [job_title, link, ...]
  * filter:
  *   days_back: 30
  *   required_columns: [entry_title, summary]
  *   case_sensitive: false
  *   loading_mode: append
  *   exclude_keywords:
  *     entry_title: [intern, staffing]
  *     summary: [clearance]
  * }}}
  */
object PipelineConfig {

  final case class Parsed(
      strategy: Strategy,
      columns: Seq[String],
      filter: FilterConfig)

  def parse(yaml: String): Parsed = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper(
      new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
    val root = mapper.readValue(yaml, classOf[java.util.Map[String, Object]])
      .asScala

    def section(name: String): Map[String, Object] =
      root.get(name) match {
        case Some(m: java.util.Map[_, _]) =>
          m.asInstanceOf[java.util.Map[String, Object]].asScala.toMap
        case _ => Map.empty
      }
    def strList(v: Object): Seq[String] = v match {
      case l: java.util.List[_] => l.asScala.map(_.toString).toSeq
      case null                 => Nil
      case other                => Seq(other.toString)
    }

    val strategy = section("loading").get("strategy").map(_.toString.toLowerCase)
      .getOrElse("scd1") match {
      case "scd2"          => Scd2
      case "merge_upsert"  => MergeUpsert
      case _               => Scd1
    }
    val columns = root.get("columns").map(strList).getOrElse(Nil)

    val f = section("filter")
    val exclusions: Map[String, Seq[String]] = f.get("exclude_keywords") match {
      case Some(m: java.util.Map[_, _]) =>
        m.asInstanceOf[java.util.Map[String, Object]].asScala.toMap
          .map { case (k, v) => k -> strList(v) }
      case _ => Map.empty
    }
    val filter = FilterConfig(
      daysBack = f.get("days_back").map(_.toString.toInt).getOrElse(30),
      requiredCols = f.get("required_columns").map(strList)
        .getOrElse(Seq("entry_title", "summary")),
      keywordExclusions = exclusions,
      caseSensitive = f.get("case_sensitive").exists(_.toString.toBoolean),
      loadingMode = f.get("loading_mode").map(_.toString).getOrElse("append"))

    Parsed(strategy, columns, filter)
  }
}

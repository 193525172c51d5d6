package graft.sources

import graft.model.FeedConfig
import graft.operators.Filters
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** S3: config-sheet scan → typed feed-config rows
  * (reference: core/etl.py:74-106, src/etl/rss_feed_etl.py:14-75).
  *
  * Headers are normalized (lowercase/trim — the reference lowercases
  * worksheet headers), required columns are validated against the
  * schema, rows with blank url/worksheet are dropped (F5), and
  * job_title defaults to the feed title (core/etl.py:104).
  */
object ConfigSource {

  val RequiredCols = Seq("title", "reader", "time", "url", "worksheet_name")

  def readFeedConfigs(raw: DataFrame): Dataset[FeedConfig] = {
    val spark = raw.sparkSession
    import spark.implicits._
    val normalized = raw.columns.foldLeft(raw)((d, c) =>
      d.withColumnRenamed(c, c.trim.toLowerCase))
    val missing = RequiredCols.filterNot(normalized.columns.contains)
    require(missing.isEmpty,
      s"config sheet is missing required columns: ${missing.mkString(", ")}")
    normalized
      .filter(Filters.requireNonBlank(Seq("url", "worksheet_name")))
      .select(
        trim(col("title")).as("title"),
        trim(col("reader")).as("reader"),
        trim(col("time")).as("time_window"),
        trim(col("url")).as("url"),
        trim(col("worksheet_name")).as("worksheet_name"),
        coalesce(nullif(trim(
          if (normalized.columns.contains("job_title")) col("job_title")
          else lit("")), lit("")), trim(col("title"))).as("job_title"))
      .as[FeedConfig]
  }
}

package graft.model

import org.apache.spark.sql.types._

/** Canonical schemas of the engine (SURVEY.md §1).
  *
  * The reference's central fact record is the 9-column feed-entry row
  * (reference: src/rss_feed_etl/core/data_loader.py:47-57,
  * config/config.yaml:22-31) with primary key `link`. The reference
  * keeps every value as a string; we keep real types internally and
  * stringify only at sink boundaries (SURVEY.md §1.3).
  */
final case class FeedEntry(
    job_title: String,
    link: String,
    entry_title: String,
    published: java.sql.Timestamp,
    feed_title: String,
    reader: String,
    time_window: String,
    summary: String,
    notes: String
)

/** Feed-config row (reference: src/rss_feed_etl/models/feeder.py:8-24). */
final case class FeedConfig(
    title: String,
    reader: String,
    time_window: String,
    url: String,
    worksheet_name: String,
    job_title: String
)

object Schemas {
  /** Primary key of the feed-entry table (reference: src/etl/scd1_manager.py:32). */
  val PrimaryKey = "link"

  /** Canonical feed-entry column order (reference: core/data_loader.py:47-57). */
  val FeedEntryCols: Seq[String] = Seq(
    "job_title", "link", "entry_title", "published", "feed_title",
    "reader", "time_window", "summary", "notes")

  /** Columns compared for change detection in the merges — all
    * non-key, non-notes columns (reference: core/data_loader.py:162-171).
    */
  val CompareCols: Seq[String] =
    FeedEntryCols.filterNot(c => c == PrimaryKey || c == "notes")

  val FeedEntrySchema: StructType = StructType(Seq(
    StructField("job_title", StringType),
    StructField("link", StringType, nullable = false),
    StructField("entry_title", StringType),
    StructField("published", TimestampType),
    StructField("feed_title", StringType),
    StructField("reader", StringType),
    StructField("time_window", StringType),
    StructField("summary", StringType),
    StructField("notes", StringType)
  ))

  /** SCD2 bookkeeping columns (reference: src/etl/scd2_manager.py:42-45). */
  val EffectiveStart = "effective_start"
  val EffectiveEnd = "effective_end"
  val CurrentFlag = "current_flag"

  val Scd2Schema: StructType = StructType(
    FeedEntrySchema.fields ++ Seq(
      StructField(EffectiveStart, TimestampType),
      StructField(EffectiveEnd, TimestampType),
      StructField(CurrentFlag, IntegerType)
    ))

  val FeedConfigSchema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("reader", StringType),
    StructField("time_window", StringType),
    StructField("url", StringType),
    StructField("worksheet_name", StringType),
    StructField("job_title", StringType)
  ))
}

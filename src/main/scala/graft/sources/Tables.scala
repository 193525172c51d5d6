package graft.sources

import graft.functions.Normalize
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File-backed sources/sinks (SURVEY §2.1).
  *
  * The reference's worksheet-as-table storage maps to a parquet
  * directory per table; its truncate+rewrite sink (ws.clear()+update,
  * core/data_loader.py:426-428) is `SaveMode.Overwrite`. CSV covers
  * S4/S5 (src/utils/file_utils.py:62-85, run_ats_enrichment.py:1054-1077).
  */
object Tables {

  /** S2: full-table scan; missing columns self-heal to empty strings
    * (reference: core/data_loader.py:136-141).
    */
  def readTable(spark: SparkSession, path: String, expectedCols: Seq[String]): DataFrame =
    Normalize.canonicalSelect(spark.read.parquet(path), expectedCols)

  /** S8+S6: overwrite sink; creates the table if absent. */
  def writeTable(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** S4: CSV source with the reference's empty-description drop
    * (src/utils/file_utils.py:74-78).
    */
  def readCsv(spark: SparkSession, path: String,
      requireNonBlank: Option[String] = None,
      schema: Option[StructType] = None): DataFrame = {
    val base = schema.fold(
      spark.read.option("header", "true").option("inferSchema", "false"))(
      s => spark.read.option("header", "true").schema(s))
      .csv(path)
    requireNonBlank.fold(base)(c =>
      base.filter(col(c).isNotNull && trim(col(c)) =!= ""))
  }

  /** S5: CSV sink (reference writes a single file; keep one partition
    * only for small exports — large tables write partitioned).
    */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }

  /** JSONL (newline-delimited JSON) source — the de-facto interchange
    * format of LLM training corpora. Always pass the schema: schema
    * inference is a full extra pass over the data (a non-starter at
    * 100 TB) and infers types from whatever happens to be present.
    * Malformed lines follow Spark's PERMISSIVE contract: they land in
    * `_corrupt_record` (when the schema declares it) instead of
    * failing the read — count them, route them, never lose the batch.
    */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSONL sink. Like [[writeCsv]], coalesce only small exports. */
  def writeJsonl(df: DataFrame, path: String,
      singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite).json(path)
  }
}

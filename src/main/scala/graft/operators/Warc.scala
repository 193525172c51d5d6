package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500) ingestion — the Common Crawl shape: whole
  * `.warc` / `.warc.gz` files in as binary blobs (Spark's
  * `binaryFile` source, one row per file — crawl archives gzip each
  * record as its own member, so no splitter can chunk them), records
  * out as rows via the native [[graft.expr.WarcRecords]] walk, HTTP
  * responses split and HTML reduced to text with the existing
  * [[graft.functions.HtmlToText]] chain.
  *
  * Scale shape: the file blob exists only inside the extraction
  * projection (the explode output carries per-record payloads, the
  * 64 MiB-capped file bytes project away immediately); everything
  * downstream is codegen'd relational work, no shuffle until the
  * caller aggregates. Size tasks with one file per task via
  * `spark.sql.files.maxPartitionBytes` (binaryFile never splits a
  * file anyway) — at 100 TB the unit of parallelism is the archive
  * file, exactly how crawl dumps are laid out.
  */
object Warc {

  /** Whole-file read of a crawl-archive directory/glob via Spark's
    * `binaryFile` source: (file_id, path, length, content), one row
    * per `.warc`/`.warc.gz` file. file_id is the stable xxhash64 of
    * the path so downstream record keys survive re-reads; binaryFile
    * never splits a file, which is exactly right here (member-gzipped
    * archives are unsplittable — see [[graft.expr.WarcRecords]]).
    */
  def readArchives(spark: org.apache.spark.sql.SparkSession,
      pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)
      .select(xxhash64(col("path")).as("file_id"), col("path"),
        col("length"), col("content"))

  /** Explode WARC files into records: (id, record_idx, warc_type,
    * target_uri, warc_date, content_type, payload). Files that are
    * not WARC contribute no rows (triage).
    */
  def records(files: DataFrame, idCol: String = "file_id",
      contentCol: String = "content", maxRecords: Int = 4096): DataFrame =
    files
      .select(col(idCol),
        call_function(graft.expr.WarcRecords.FunctionName,
          col(contentCol), lit(maxRecords)).as("_rs"))
      .filter(col("_rs").isNotNull)
      .select(col(idCol), posexplode(col("_rs")).as(Seq("record_idx", "_r")))
      .select(col(idCol), col("record_idx"),
        col("_r.warc_type").as("warc_type"),
        col("_r.target_uri").as("target_uri"),
        col("_r.warc_date").as("warc_date"),
        col("_r.content_type").as("content_type"),
        col("_r.payload").as("payload"))

  /** The crawl→corpus text stage: `response` records only, HTTP
    * payload split at the first blank line (status code from the
    * status line, Content-Type from the response headers), HTML body
    * → plain text through the shared HtmlToText chain. Output:
    * (id, record_idx, url, http_status, http_content_type, text).
    * All pure codegen'd expressions — regexes are RE2-portable so an
    * external engine can replay them.
    */
  def htmlDocuments(files: DataFrame, idCol: String = "file_id",
      contentCol: String = "content", maxRecords: Int = 4096): DataFrame = {
    val recs = records(files, idCol, contentCol, maxRecords)
      .filter(col("warc_type") === "response")
    // byte-level split + charset-aware decode (BOM > Content-Type
    // charset > strict-UTF-8 sniff > windows-1252): the previous
    // binary→string cast assumed UTF-8 and mangled the latin-1 tail
    // a real crawl carries — see graft.expr.HttpText
    val h = call_function(graft.expr.HttpText.FunctionName, col("payload"))
    recs.select(col(idCol), col("record_idx"),
        col("target_uri").as("url"),
        h.getField("http_status").as("http_status"),
        h.getField("content_type").as("http_content_type"),
        h.getField("charset").as("charset"),
        graft.functions.HtmlToText.htmlToText(h.getField("text")).as("text"))
  }

  /** The crawl→corpus BINARY stage — [[htmlDocuments]]'s sibling for
    * the records whose bodies aren't text: `response` records routed
    * by HTTP Content-Type to raw body BYTES via
    * [[graft.expr.HttpBody]] (no charset machinery; invalid-UTF-8
    * sequences survive intact). Output: (id, record_idx, url,
    * http_status, http_content_type, body) — feed `body` to the
    * extraction tier ([[graft.expr.PdfText]], [[graft.expr.DocxText]],
    * the image/audio decoders). `contentTypes` empty keeps every
    * response. Same scale shape as the text stage: the file blob
    * projects away at the explode, the per-record body at the next
    * projection; q180 is this composed with PdfText under the oracle
    * gate.
    */
  def binaryDocuments(files: DataFrame,
      contentTypes: Seq[String] = Seq("application/pdf"),
      idCol: String = "file_id", contentCol: String = "content",
      maxRecords: Int = 4096): DataFrame = {
    val recs = records(files, idCol, contentCol, maxRecords)
      .filter(col("warc_type") === "response")
    val h = call_function(graft.expr.HttpBody.FunctionName, col("payload"))
    val out = recs.select(col(idCol), col("record_idx"),
      col("target_uri").as("url"),
      h.getField("http_status").as("http_status"),
      h.getField("content_type").as("http_content_type"),
      h.getField("body").as("body"))
    if (contentTypes.isEmpty) out
    else out.filter(col("http_content_type").isin(contentTypes: _*))
  }
}

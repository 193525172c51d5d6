package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** C21/A4: phrase-match skills extraction + per-row skills set algebra
  * (reference: src/rss_feed_etl/utils/skills_extractor.py:18-190 — a
  * spaCy PhraseMatcher over a ~130-term dictionary, then
  * matched = resume ∩ job, missing = job − resume,
  * pct = |matched| / |job| × 100).
  *
  * Spark-first: the dictionary is a literal array folded into codegen
  * (`filter(lit(dict), t → contains(text, t))`) — no UDF, no broadcast
  * variable needed at this dictionary size; array set algebra via
  * `array_intersect` / `array_except`. Matching is lowercase substring
  * containment, the observable behavior of the reference's
  * `attr="LOWER"` matcher.
  */
object Skills {

  /** Default dictionary (subset of the reference's built-in list,
    * skills_extractor.py:92-111, lowercased).
    */
  val DefaultSkills: Seq[String] = Seq(
    "python", "java", "scala", "sql", "spark", "hadoop", "kafka", "aws",
    "azure", "gcp", "docker", "kubernetes", "airflow", "dbt", "snowflake",
    "tableau", "power bi", "machine learning", "deep learning", "nlp",
    "etl", "data warehouse", "data lake", "streaming", "rest api",
    "git", "linux", "terraform", "ci/cd", "agile")

  /** Skills found in a text: dictionary terms contained (lowercased) in
    * the text, sorted for determinism.
    */
  def extractSkills(text: Column, dict: Seq[String] = DefaultSkills): Column =
    array_sort(filter(
      array(dict.map(s => lit(s.toLowerCase)): _*),
      s => contains(lower(coalesce(text, lit(""))), s)))

  /** matched = resumeSkills ∩ jobSkills (sorted). */
  def matchedSkills(jobSkills: Column, resumeSkills: Column): Column =
    array_sort(array_intersect(jobSkills, resumeSkills))

  /** missing = jobSkills − resumeSkills (sorted). */
  def missingSkills(jobSkills: Column, resumeSkills: Column): Column =
    array_sort(array_except(jobSkills, resumeSkills))

  /** pct = |matched| / |job| × 100, 2dp; 0 when the job lists no
    * dictionary skills (reference: skills_extractor.py:172-190).
    */
  def matchPercentage(jobSkills: Column, resumeSkills: Column): Column =
    when(size(jobSkills) > 0,
      round(size(matchedSkills(jobSkills, resumeSkills)).cast(DoubleType) /
        size(jobSkills) * 100, 2))
      .otherwise(lit(0.0))
}

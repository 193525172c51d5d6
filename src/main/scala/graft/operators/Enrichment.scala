package graft.operators

import graft.functions.{Normalize, Skills}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The enrichment stage (reference: run_ats_enrichment.py:543-1023):
  * per-row skills extraction, match scoring against a resume side-input,
  * and an LLM scorer boundary.
  *
  * The LLM call is the one non-relational, side-effecting operator in
  * the reference (OpenRouter chat API with batching / recursive token
  * splitting / retry, run_ats_enrichment.py:219-496). It is isolated
  * behind the `Scorer` trait and executed with `mapPartitions`, so:
  *  - tests and the correctness oracle use `DeterministicScorer`
  *    (pure function of the row — stable output, no network);
  *  - a production HTTP scorer would batch `grouped(batchSize)` inside
  *    each partition, halving batches that exceed the token budget
  *    (the reference's 60k-token recursive split) — per-partition, so
  *    1000 executors each run their own rate-limited client.
  */
object Enrichment {

  /** Pluggable match scorer: (jobText, resumeText) → 0-100 score. */
  trait Scorer extends Serializable {
    def score(jobText: String, resumeText: String): Double
    /** token-budget estimate, chars/4 (run_ats_enrichment.py:674-676). */
    def tokenEstimate(s: String): Long = (s.length.toLong + 3) / 4
  }

  /** Deterministic stub: dictionary-skills overlap percentage — exactly
    * the reference's spaCy fallback formula (skills_extractor.py:172-190).
    */
  final class DeterministicScorer(dict: Seq[String] = Skills.DefaultSkills)
      extends Scorer {
    def score(jobText: String, resumeText: String): Double = {
      val job = dict.filter(jobText.toLowerCase.contains(_)).toSet
      if (job.isEmpty) 0.0
      else {
        val res = dict.filter(resumeText.toLowerCase.contains(_)).toSet
        val pct = (job & res).size.toDouble / job.size * 100
        math.round(pct * 100).toDouble / 100
      }
    }
  }

  /** Declarative part of the enrichment: skills columns + match pct via
    * pure expressions (no UDF). `resumeText` is a scalar side input —
    * folded in as a literal (the Spark analogue of the reference reading
    * one resume file, S7).
    */
  def withSkillsColumns(df: DataFrame, textCol: String, resumeText: String,
      dict: Seq[String] = Skills.DefaultSkills,
      asOf: Option[java.sql.Timestamp] = None): DataFrame = {
    val resumeSkills = Skills.extractSkills(lit(resumeText), dict)
    val jobSkills = Skills.extractSkills(col(textCol), dict)
    val base = df
      .withColumn("job_skills", jobSkills)
      .withColumn("matched_skills", Skills.matchedSkills(col("job_skills"), resumeSkills))
      .withColumn("missing_skills", Skills.missingSkills(col("job_skills"), resumeSkills))
      .withColumn("match_percentage",
        Skills.matchPercentage(col("job_skills"), resumeSkills))
    asOf.fold(base)(ts =>
      base.withColumn("as_of_dt", Normalize.tsFormat(lit(ts))))
  }

  /** C16: sink-boundary projection — skills arrays become JSON strings,
    * exactly the reference's `json.dumps(skills)` at write time
    * (run_ats_enrichment.py:905-906). Arrays stay native until here.
    */
  def toSinkColumns(df: DataFrame): DataFrame = {
    val arrayCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] => f.name
    }
    arrayCols.foldLeft(df)((d, c) => d.withColumn(c, to_json(col(c))))
  }

  /** C17: parse an LLM response into a (match_percentage, matched,
    * missing) struct — `from_json` against the expected schema with a
    * regexp_extract fallback for percent-only free text, clamped to
    * [0,100] (reference: run_ats_enrichment.py:360-393,784-876).
    */
  def parseLlmResponse(response: Column): Column = {
    val schema = StructType(Seq(
      StructField("match_percentage", DoubleType),
      StructField("matched_skills", ArrayType(StringType)),
      StructField("missing_skills", ArrayType(StringType))))
    val parsed = from_json(response, schema)
    val pctFallback = regexp_extract(response, "(\\d{1,3}(?:\\.\\d+)?)\\s*%", 1)
      .cast(DoubleType)
    val pct = graft.functions.Normalize.clampPct(
      coalesce(parsed.getField("match_percentage"), pctFallback))
    struct(
      pct.as("match_percentage"),
      coalesce(parsed.getField("matched_skills"),
        array().cast(ArrayType(StringType))).as("matched_skills"),
      coalesce(parsed.getField("missing_skills"),
        array().cast(ArrayType(StringType))).as("missing_skills"))
  }

  /** The imperative scorer boundary: adds `llm_score` by calling the
    * scorer per row, batched per partition. Kept off the declarative
    * path; everything before/after remains Catalyst-optimizable.
    */
  def withLlmScore(df: DataFrame, textCol: String, resumeText: String,
      scorer: Scorer, batchSize: Int = 5): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("llm_score", DoubleType, nullable = false))
    val textIdx = df.schema.fieldIndex(textCol)
    val scored = df.rdd.mapPartitions { it =>
      // grouped(batchSize) is where a production scorer would issue one
      // API call per batch (with recursive halving on token overflow).
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val text = Option(row.get(textIdx)).fold("")(_.toString)
          Row.fromSeq(row.toSeq :+ scorer.score(text, resumeText))
        }
      }
    }
    spark.createDataFrame(scored, outSchema)
  }
}

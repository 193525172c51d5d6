package graft

import graft.config.PipelineConfig
import graft.operators.Similarity
import graft.pipeline.JobPipeline.{FilterConfig, Scd2}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Native cosine expression, CSV source/sink, YAML config loader. */
class ExprConfigSpec extends SparkSpec {
  import spark.implicits._

  test("graft_nfc composes decomposed marks, passes ASCII through, null-safe") {
    val decomposed = "cafe\u0301"   // e + U+0301 combining acute (5 chars)
    val precomposed = "caf\u00e9"   // precomposed U+00E9 (4 chars)
    val df = Seq(
      (1L, decomposed),
      (2L, "plain ascii"),          // already NFC -> unchanged
      (3L, null.asInstanceOf[String])
    ).toDF("id", "s")
    df.createOrReplaceTempView("nfc_in")
    val got = spark.sql("SELECT id, graft_nfc(s) AS n FROM nfc_in")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).contains(precomposed))
    assert(got(1L).get.length == 4)
    assert(got(2L).contains("plain ascii"))
    assert(got(3L).isEmpty)
    // the whole point: decomposed and precomposed forms of the same
    // text fingerprint identically after normalization
    val hashes = Seq(decomposed, precomposed).toDF("s")
      .selectExpr("md5(graft_nfc(s)) AS h")
      .collect().map(_.getString(0)).toSet
    assert(hashes.size == 1)
  }

  test("native cosine_sim is bit-identical to the composed-builtin form") {
    val vecs = Seq(
      (0L, Array(0.1f, -0.2f, 0.93f, 0.4f)),
      (1L, Array(0.5f, 0.5f, 0.0f, -0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero norm → 0.0
      (3L, Array(1.0f, 2.0f, 3.0f, 4.0f))
    ).toDF("id", "v")
    val pairs = vecs.as("a").join(vecs.as("b"), col("a.id") < col("b.id"))
      .select(
        Similarity.cosine(col("a.v"), col("b.v")).as("native"),
        Similarity.cosineComposed(col("a.v"), col("b.v")).as("composed"))
      .collect()
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // SQL name resolves too
    vecs.createOrReplaceTempView("v_t")
    val viaSql = spark.sql(
      """SELECT graft_cosine_sim(a.v, b.v) FROM v_t a JOIN v_t b
         ON a.id = 0 AND b.id = 3""").collect()(0).getDouble(0)
    assert(math.abs(viaSql) <= 1.0)
  }

  test("session extension injects native functions into fresh session states") {
    // newSession() builds a NEW SessionState: Graft.tune's temp-function
    // registrations don't carry over, so resolution here proves the
    // spark.sql.extensions path (plans.GraftExtensions) injected the
    // functions into the base registry.
    val fresh = spark.newSession()
    val sim = fresh.sql(
      "SELECT graft_cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D))")
      .collect()(0).getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
    val sh = fresh.sql("SELECT graft_shingles('a b c d', 3)")
      .collect()(0).getAs[scala.collection.Seq[String]](0).toSeq
    assert(sh == Seq("a b c", "b c d"))
    assert(fresh.sql("SELECT graft_minhash_sig(array('x','y'), 16)")
      .collect()(0).getAs[scala.collection.Seq[Long]](0).size == 16)
    assert(fresh.sql("SELECT graft_simhash(array('x','y'))")
      .collect()(0).getLong(0) != 0L)
  }

  test("cosine codegen survives duplicated instances in one generated function") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val at = ArrayType(DoubleType, containsNull = false)
    val e = graft.expr.CosineSimilarity(
      BoundReference(0, at, nullable = true), BoundReference(1, at, nullable = true))
    // Two instances in ONE generated function (what a filter + project
    // sharing an alias produces). Before locals went through
    // ctx.freshName this failed to compile ("Redefinition of local
    // variable i") and silently deoptimized the projection to the
    // interpreter; generate() throws on a compile error, so passing
    // here proves the generated code is valid.
    val proj = GenerateUnsafeProjection.generate(
      Seq(e, e), subexpressionEliminationEnabled = false)
    val row = InternalRow(
      ArrayData.toArrayData(Array(0.5, -1.5, 2.0)),
      ArrayData.toArrayData(Array(0.5, -1.5, 2.0)))
    val out = proj(row)
    assert(math.abs(out.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(out.getDouble(1) - 1.0) < 1e-12)
  }

  test("jsonl source: schema-first read, malformed lines quarantined not fatal") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/part.jsonl"),
      """{"doc_id": 1, "text": "line one\nwith \"quotes\""}
        |{"doc_id": 2, "text": "clean"}
        |{not valid json at all
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    val got = Tables.readJsonl(spark, s"$tmp/part.jsonl", schema)
    // cache first: Spark forbids a bare filter on ONLY the corrupt
    // column over a pushed-down json scan (internal raw-record rule)
    got.cache()
    val good = got.filter(col("_corrupt_record").isNull)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(good == Map(1L -> "line one\nwith \"quotes\"", 2L -> "clean"))
    val bad = got.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() == 1)
    assert(bad.select("_corrupt_record").as[String].head().startsWith("{not"))
    got.unpersist()
  }

  test("csv round-trip with empty-description drop") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val df = Seq(("1", "desc one"), ("2", ""), ("3", "   "), ("4", "keep"))
      .toDF("id", "description")
    Tables.writeCsv(df, s"$tmp/out", singleFile = true)
    val back = Tables.readCsv(spark, s"$tmp/out",
      requireNonBlank = Some("description"))
    assert(back.select("id").as[String].collect().toSet == Set("1", "4"))
  }

  test("yaml config parses strategy, columns and filter rules") {
    val yaml =
      """loading:
        |  strategy: scd2
        |columns: [job_title, link, entry_title]
        |filter:
        |  days_back: 14
        |  required_columns: [entry_title]
        |  case_sensitive: false
        |  loading_mode: overwrite
        |  exclude_keywords:
        |    entry_title: [intern, staffing]
        |    summary: [clearance]
        |""".stripMargin
    val p = PipelineConfig.parse(yaml)
    assert(p.strategy == Scd2)
    assert(p.columns == Seq("job_title", "link", "entry_title"))
    assert(p.filter.daysBack == 14)
    assert(p.filter.loadingMode == "overwrite")
    assert(p.filter.keywordExclusions("entry_title") == Seq("intern", "staffing"))

    val defaults = PipelineConfig.parse("{}")
    assert(defaults.filter == FilterConfig(
      keywordExclusions = Map.empty))
  }
}

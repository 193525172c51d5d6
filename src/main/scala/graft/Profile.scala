package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the hot bench paths (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.tune(spark)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Graft.table(spark, dir, "documents")
    val docsPar = Graft.tableParallel(spark, dir, "documents")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    time("warmup count")(docs.count())
    time("warmup tokens")(docs.select(explode(
      graft.functions.TextAnalysis.tokens(col("text"))).as("_t")).count())

    // volume check: postings in, pairs out of the capped aggregate
    {
      val sets = Dedup.shingleSets(docsPar, "doc_id", "text", 3)
      val postings = sets
        .select(col("_id"), size(col("_sh")).as("_n"), explode(col("_sh")).as("_s0"))
        .select(col("_id"), col("_n"), xxhash64(col("_s0")).as("_s"))
      println(s"[vol] postings = ${postings.count()}")
      println(s"[vol] shingle groups = ${postings.select("_s").distinct().count()}")
      val exploded = postings.groupBy("_s")
        .agg(call_function(graft.expr.PostingPairsAgg.FunctionName,
          col("_id"), col("_n"), lit(100L)).as("_ps"))
        .filter(col("_ps").isNotNull)
        .select(explode(col("_ps")).as("_p"))
      println(s"[vol] exploded pairs = ${exploded.count()}")
      println(s"[vol] distinct id pairs = ${exploded
        .filter(col("_p.id1") =!= col("_p.id2"))
        .select(col("_p.id1"), col("_p.id2")).distinct().count()}")
    }

    // ---- jaccard family (q23/q103/q41/q93/q89 kernel) ----
    for (round <- 1 to 2) {
      val sets = Dedup.shingleSets(docsPar, "doc_id", "text", 3)
      time(s"r$round shingleSets")(sets.agg(sum(size(col("_sh")))).head())
      val postings = sets
        .select(col("_id"), size(col("_sh")).as("_n"), explode(col("_sh")).as("_s0"))
        .select(col("_id"), col("_n"), xxhash64(col("_s0")).as("_s"))
      time(s"r$round postings count")(postings.count())
      val grouped = postings.groupBy("_s")
        .agg(call_function(graft.expr.PostingPairsAgg.FunctionName,
          col("_id"), col("_n"), lit(100L)).as("_ps"))
      time(s"r$round posting agg")(grouped.count())
      val pairs = grouped
        .filter(col("_ps").isNotNull)
        .select(explode(col("_ps")).as("_p"))
        .filter(col("_p.id1") =!= col("_p.id2"))
        .groupBy(col("_p.id1").as("id1"), col("_p.id2").as("id2"))
        .agg(count(lit(1)).as("_common"),
          min(col("_p.n1")).as("_n1"), min(col("_p.n2")).as("_n2"))
      time(s"r$round pair counts")(pairs.count())
      time(s"r$round jaccardPairs full")(
        Dedup.jaccardPairs(docsPar, "doc_id", "text", 3, 0.5, 100L).count())
    }

    // ---- bigram-lm family (q115/q84/q80) ----
    for (round <- 1 to 2) {
      val toks = docs.select(col("doc_id").as("_id"),
        graft.functions.TextAnalysis.tokens(coalesce(col("text"), lit(""))).as("_tk"))
        .filter(size(col("_tk")) >= 2)
      val uni = docs.select(explode(graft.functions.TextAnalysis.tokens(
          coalesce(col("text"), lit("")))).as("_t"))
        .groupBy("_t").agg(count(lit(1)).as("_ca"))
      time(s"r$round unigram hist")(uni.count())
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_id")).orderBy(col("_p"))
      val bigrams = toks
        .select(col("_id"), posexplode(col("_tk")).as(Seq("_p", "_t")))
        .withColumn("_next", lead(col("_t"), 1).over(w))
        .filter(col("_next").isNotNull)
        .select(col("_id"), col("_t").as("_a"), col("_next").as("_b"))
      time(s"r$round doc bigrams (window)")(bigrams.count())
      val bg = bigrams.groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_cab"))
      time(s"r$round bigram hist")(bg.count())
      time(s"r$round q115 full")(graft.operators.Corpus
        .bigramLmScore(docs, "doc_id", "text").count())
      Caches.release(spark)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}

package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the dedup pipeline (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.tune(spark)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Graft.table(spark, dir, "documents")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    time("warmup count")(docs.count())
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    time("shingleSets count")(sets.count())
    time("shingleSets agg size")(sets.agg(sum(size(col("_sh")))).collect())
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 128)
    time("signatures")(sigs.agg(sum(size(col("_sig")))).collect())
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text", 3, 128, 32)
    time("candidates")(cand.count())
    time("verified")(Dedup.minhashDedupPairs(docs, "doc_id", "text", 3, 0.8).count())
    val postings = sets.select(col("_id"), explode(col("_sh")).as("_s"))
    time("postings")(postings.count())
    time("posting self-join")(
      postings.as("a").join(postings.as("b"),
        col("a._s") === col("b._s") && col("a._id") < col("b._id"))
        .groupBy(col("a._id"), col("b._id")).count().count())
    spark.stop()
  }
}

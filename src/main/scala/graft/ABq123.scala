package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B attribution for q123's repartition drop (round-6 watch
  * item): commit 4977152 removed the `tableParallel` repartition before
  * segment splitting and the full-run time moved 0.80→1.07 s against a
  * −2% suite median. Same protocol as [[ABBench]]: both variants
  * alternate round-robin inside one JVM with rotated order, so every
  * variant sees the same host-drift windows; canaries expose residual
  * drift. Per-variant min/median over rounds isolates the plan effect.
  *
  * Usage: ABq123 <sfDir> [rounds]
  */
object ABq123 {
  /** Hash-all-columns forcing action — the SCALE.md forceAll contract
    * (count() lets Catalyst eliminate the very operators under test).
    * Shared by the AB harnesses; Bench keeps its MapType-aware
    * variant.
    */
  private[graft] def forceAll(df: DataFrame): Long =
    df.agg(count(lit(1)).as("_n"),
        sum(xxhash64(df.columns.map(col).toIndexedSeq: _*)).as("_h"))
      .head().getLong(0)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.tune(spark)

    def q123(read: (SparkSession, String, String) => DataFrame): DataFrame =
      operators.Corpus.removeDuplicatedSegments(
        read(spark, sfDir, "documents"), "doc_id", "text",
        sepRegex = "\\bthe\\b", sepOut = "the", maxDocFreq = 1L)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "plain" -> (() => q123(Graft.table)),
      "repart" -> (() => q123(Graft.tableParallel)))
    val canaries = Seq("q02_filter_project", "q20_ts_bucket", "q39_frame_sample")

    def clear(): Unit = {
      Caches.release(spark)
      spark.sharedState.cacheManager.clearCache()
    }
    def time(name: String, mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = try forceAll(mk())
        catch { case e: Throwable => System.err.println(s"ERR $name: $e"); -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"  $name%-10s $dt%7.2fs rows=$n")
      clear()
      dt
    }

    // JVM warmup: one throwaway pass of each variant
    variants.foreach { case (tag, mk) => time(s"warm:$tag", mk) }

    val results = collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val canaryTimes = collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (r <- 1 to rounds) {
      System.err.println(s"=== round $r/$rounds ===")
      canaries.foreach { q =>
        canaryTimes(q) ::= time(q, () => SparkEntry.queries(q)(spark, sfDir))
      }
      val rotated = variants.drop((r - 1) % variants.size) ++
        variants.take((r - 1) % variants.size)
      rotated.foreach { case (tag, mk) => results(tag) ::= time(tag, mk) }
    }
    def stats(xs: List[Double]): String = {
      val s = xs.sorted
      val med =
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      f"min=${s.head}%6.2f med=$med%6.2f max=${s.last}%6.2f"
    }
    println("\n===== q123 A/B (per variant min/median over rounds) =====")
    variants.foreach { case (tag, _) => println(f"  $tag%-8s ${stats(results(tag))}") }
    println("canaries (drift inside this session)")
    canaries.foreach { q => println(f"  $q%-22s ${stats(canaryTimes(q))}") }
    spark.stop()
  }
}

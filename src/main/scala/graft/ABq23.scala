package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM drift attribution for q23's +28% full-run move in round 7
  * (1.18 → 1.52 s while its file was touched). The touching commits
  * split `pairCounts` into `pairCountsFromPostings` with a byte-equal
  * plan for q23's path, so there is no second CODE variant to race —
  * the question is whether the number moved with the host or with the
  * code. Protocol ([[ABq123]]/ABBench): q23 alternates with an
  * UNTOUCHED same-family control (q61 winnowing — the same
  * shingle-heavy first stage) plus the standard canaries, all inside
  * one JVM with rotated order, 8 rounds; per-query min/median over
  * rounds gives the clean-window number to set against r6/r7
  * artifacts.
  *
  * Usage: ABq23 <sfDir> [rounds]
  */
object ABq23 {
  // shared with ABq123 — the canonical hash-all-columns forcer
  private def forceAll(df: DataFrame): Long = ABq123.forceAll(df)

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

    val subjects = Seq("q23_jaccard_pairs", "q61_winnow_pairs")
    val canaries = Seq("q02_filter_project", "q20_ts_bucket", "q39_frame_sample")

    def clear(): Unit = {
      Caches.release(spark)
      spark.sharedState.cacheManager.clearCache()
    }
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      val n = try forceAll(SparkEntry.queries(name)(spark, sfDir))
        catch { case e: Throwable => System.err.println(s"ERR $name: $e"); -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"  $name%-22s $dt%7.2fs rows=$n")
      clear()
      dt
    }

    subjects.foreach(q => time(q)) // JVM warmup

    val results = collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (r <- 1 to rounds) {
      System.err.println(s"=== round $r/$rounds ===")
      canaries.foreach(q => results(q) ::= time(q))
      val rotated = subjects.drop((r - 1) % subjects.size) ++
        subjects.take((r - 1) % subjects.size)
      rotated.foreach(q => results(q) ::= time(q))
    }
    def stats(xs: List[Double]): String = {
      val s = xs.sorted
      // true median: even-sized lists average the two middle elements
      // (s(n/2) alone is the upper-middle — reads ~half a gap high)
      val med =
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      f"min=${s.head}%6.2f med=$med%6.2f max=${s.last}%6.2f"
    }
    println("\n===== q23 drift attribution (min/median over rounds) =====")
    (subjects ++ canaries).foreach { q =>
      println(f"  $q%-22s ${stats(results(q))}")
    }
    spark.stop()
  }
}

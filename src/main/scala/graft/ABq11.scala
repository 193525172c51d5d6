package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Same-JVM drift attribution for q11's +24% round-8 headline move
  * (0.650 → 0.808 s) on UNTOUCHED code — `Merges.scala` has no
  * round-8 diff and the r8 canaries were clean, so host drift is the
  * expected verdict; this brackets it with the standard protocol
  * ([[ABq23]]): q11 alternates with its same-family untouched
  * controls (q12 SCD2 / q13 upsert — the same merge kernel shapes)
  * plus the canaries, all inside one JVM with rotated order,
  * 8 rounds; per-query min/median over rounds gives the clean-window
  * number to set against the r7/r8 artifacts.
  *
  * Usage: ABq11 <sfDir> [rounds]
  */
object ABq11 {
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

    val subjects = Seq("q11_scd1_merge", "q12_scd2_merge", "q13_merge_upsert")
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
      val med =
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      f"min=${s.head}%6.2f med=$med%6.2f max=${s.last}%6.2f"
    }
    println("\n===== q11 drift attribution (min/median over rounds) =====")
    (subjects ++ canaries).foreach { q =>
      println(f"  $q%-22s ${stats(results(q))}")
    }
    spark.stop()
  }
}

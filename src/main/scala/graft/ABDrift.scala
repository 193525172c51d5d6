package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic same-JVM drift attribution (not part of the library
  * surface) — the parameterized form of the [[ABq11]]/[[ABq23]]
  * protocol, so a new watch item no longer needs a bespoke harness
  * file. Subjects and controls alternate inside ONE JVM with the
  * subject order rotated per round: every query sees the same host
  * drift windows, and per-query min/median over rounds is the clean
  * number to set against the round artifacts (the min is the
  * drift-free floor; a subject whose min matches its prior-round
  * artifact while the median is high is drift, not regression).
  *
  * Usage: ABDrift <sfDir> <rounds> <subject[,subject...]>
  *                [control[,control...]]
  * Controls default to the standard bench canaries (untouched,
  * config-insensitive shapes covering scan/filter, timestamp
  * formatting and binary projection).
  */
object ABDrift {
  private def forceAll(df: DataFrame): Long = ABq123.forceAll(df)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val subjects = args.drop(2).headOption
      .map(_.split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(sys.error("usage: ABDrift <sfDir> <rounds> <subjects> [controls]"))
    val canaries = args.drop(3).headOption
      .map(_.split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(Seq("q02_filter_project", "q20_ts_bucket", "q39_frame_sample"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.tune(spark)

    def clear(): Unit = {
      Caches.release(spark)
      spark.sharedState.cacheManager.clearCache()
    }
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      val n = try forceAll(SparkEntry.queries(name)(spark, sfDir))
        catch { case e: Throwable => System.err.println(s"ERR $name: $e"); -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"  $name%-24s $dt%7.2fs rows=$n")
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
    println("\n===== drift attribution (min/median over rounds) =====")
    (subjects ++ canaries).foreach { q =>
      println(f"  $q%-24s ${stats(results(q))}")
    }
    spark.stop()
  }
}

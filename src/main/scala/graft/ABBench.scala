package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType

/** Same-session A/B attribution harness (not part of the library
  * surface). The host's multi-minute speed drift makes cross-run bench
  * totals incomparable, so config effects are measured by ALTERNATING
  * configurations round-robin inside one JVM: every config sees the
  * same drift windows, and per-config min/median over rounds isolates
  * the config effect from the host.
  *
  * Usage: ABBench <sfDir> [rounds]
  * Knobs swept:
  *  - spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold
  *    (0 = r4 behavior, AQE SMJ→SHJ conversion off; 256m = r5 global)
  *  - spark.graft.tfidf.dfHint (none = r5 plain join; shuffle_hash =
  *    r4 pinned hint in topTerms' tf⋈df weight join)
  * Canary queries (untouched code, config-insensitive) run every round
  * to expose residual drift inside the session.
  */
object ABBench {
  private def forceAll(df: DataFrame): Long = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: MapType => to_json(col(f.name))
        case _ => col(f.name)
      }
    }
    df.agg(count(lit(1)).as("_n"), sum(xxhash64(cols.toIndexedSeq: _*)).as("_h"))
      .head().getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.tune(spark)

    val Thresh = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"
    val Hint = "spark.graft.tfidf.dfHint"
    val configs: Seq[(String, () => Unit)] = Seq(
      "shj256m+plain" -> (() => { spark.conf.set(Thresh, "256m"); spark.conf.set(Hint, "none") }),
      "shj0+hint"     -> (() => { spark.conf.set(Thresh, "0");    spark.conf.set(Hint, "shuffle_hash") }),
      "shj0+plain"    -> (() => { spark.conf.set(Thresh, "0");    spark.conf.set(Hint, "none") }),
      "shj256m+hint"  -> (() => { spark.conf.set(Thresh, "256m"); spark.conf.set(Hint, "shuffle_hash") })
    )
    val targets = Seq("q23_jaccard_pairs", "q41_dedup_clusters",
      "q91_sql_jaccard", "q97_tfidf_terms")
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
      dt
    }

    // warm the JVM so round 1 isn't charged one-time session cost
    Seq("lineitem", "documents", "embeddings").foreach { t =>
      try Graft.table(spark, sfDir, t).limit(1000).count()
      catch { case _: Throwable => () }
    }
    configs.head._2.apply()
    targets.foreach(time); clear()

    val results = collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    val canaryTimes = collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (r <- 1 to rounds) {
      System.err.println(s"=== round $r/$rounds canaries ===")
      canaries.foreach { q => canaryTimes(q) ::= time(q) }
      // ROTATE the config order each round: the first config slot after
      // the canary block measured ~0.3 s slower for identical confs
      // (run 1 of this harness), so a fixed order would alias the
      // position effect onto whichever config ran first
      val rotated = configs.drop((r - 1) % configs.size) ++
        configs.take((r - 1) % configs.size)
      for ((tag, setup) <- rotated) {
        System.err.println(s"=== round $r/$rounds config $tag ===")
        setup()
        for (q <- targets) {
          results((tag, q)) ::= time(q)
          clear()
        }
      }
    }
    // restore session defaults
    spark.conf.set(Thresh, "256m"); spark.conf.unset(Hint)

    def stats(xs: List[Double]): String = {
      val s = xs.sorted
      val med =
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      f"min=${s.head}%6.2f med=$med%6.2f"
    }
    println("\n===== A/B results (per config min/median over rounds) =====")
    for (q <- targets) {
      println(q)
      for ((tag, _) <- configs)
        println(f"  $tag%-16s ${stats(results((tag, q)))}")
    }
    println("canaries (drift inside this session)")
    for (q <- canaries) println(f"  $q%-22s ${stats(canaryTimes(q))}")
    spark.stop()
  }
}

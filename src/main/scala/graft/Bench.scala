package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType
object Bench {

  /** Evaluate EVERY output column of the query, not just its row count:
    * under a bare `count()` Catalyst prunes pure projections, so
    * map-only queries (normalize, html-to-text, simhash, ...) would be
    * measured as parquet scans. Hashing each row across all columns
    * forces the full projection while still reducing to one driver row.
    * Maps aren't hashable (Spark disallows it) — serialize them first.
    */
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
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM (codegen, parquet readers, shuffle machinery) so the
    // first timed query isn't charged ~5s of one-time session cost.
    Graft.tune(spark)
    Seq("lineitem", "orders", "events", "documents", "embeddings").foreach { t =>
      try Graft.table(spark, sfDir, t).limit(1000).count()
      catch { case _: Throwable => () }
    }
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    def onePass(tag: String,
        qs: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)])
        : Map[String, Double] = qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try { forceAll(fn(spark, sfDir)) } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench $tag] $name%-26s $dt%8.2fs rows=$n")
      name -> dt
    }.toMap
    // Per-query min over two full measurements: pass 1 charges every
    // query its one-time codegen compilation (~0.1-0.3 s even for
    // sub-second queries — at 80+ queries that is a double-digit share
    // of the total) plus any transient machine stall; pass 2 is steady
    // state for everything. The cache is cleared between passes so
    // queries that persist intermediates recompute them honestly.
    val p1 = onePass("1/3", named)
    spark.sharedState.cacheManager.clearCache()
    val p2 = onePass("2/3", named)
    val min2 = p1.map { case (k, v) => k -> math.min(v, p2.getOrElse(k, v)) }
    // Third measurement for queries still slow after two: host-level
    // contention on this box runs in multi-minute windows that can
    // cover BOTH earlier passes of one query (observed: 8× on a
    // sub-second query); a later third sample escapes the window.
    spark.sharedState.cacheManager.clearCache()
    val stillSlow = named.filter { case (name, _) => min2.getOrElse(name, 0.0) > 1.2 }
    val p3 = onePass("3/3", stillSlow)
    val results = min2.map { case (k, v) => k -> math.min(v, p3.getOrElse(k, v)) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

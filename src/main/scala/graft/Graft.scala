package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session helpers shared by the engine, Verify, Bench and tests.
  *
  * The reference engine (see /root/reference, SURVEY.md §1.2) has
  * pandas `errors="coerce"` semantics everywhere: bad casts/parses
  * become null, never exceptions. Spark 4 defaults to ANSI mode
  * (throw). `tune` pins the session to coerce semantics + the perf
  * conf we want regardless of who built the session (the driver's
  * Verify/Bench mains build their own).
  */
object Graft {

  /** Idempotent, safe to call at the top of every query. */
  def tune(spark: SparkSession): SparkSession = {
    // Timestamp literals are built with java.sql.Timestamp.valueOf,
    // which reads the JVM default zone — pin it to UTC to match the
    // session timezone and the (naive-timestamp) oracle.
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    spark.conf.set("spark.sql.ansi.enabled", "false")
    // Some testdata generations write events.ts as TIMESTAMP(NANOS)
    // parquet, which Spark has no timestamp type for — read those as
    // longs and convert explicitly (see withTs2). No-op for the
    // TIMESTAMP(MICROS) generations.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // parallelismFirst (default true) only coalesces down to the core
    // count — on a 32-thread local session every tiny shuffle still
    // schedules 32 tasks of milliseconds each, pure dispatch overhead.
    // false = coalesce to the advisory byte size. The advisory is kept
    // SMALL (1m): stages with real shuffle volume (posting tables,
    // pair expansions — compute-heavy per byte) keep their
    // parallelism, while KB-sized reduction stages collapse to a task
    // or two. A 16-64m advisory measurably serialized the dedup
    // family's pair stages (byte-cheap, CPU-expensive).
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // let AQE swap a sort-merge join for a shuffled hash join when the
    // build side's ACTUAL per-partition size fits (default 0 disables
    // the conversion entirely). This is how corpus-sized streams avoid
    // being fully sorted against vocabulary-bounded tables (log-prob,
    // document-frequency, unigram-count joins — SCALE.md measured the
    // SMJ sort as the engine's largest memory reservation) without
    // pinning a join strategy by hint: a hint would also block AQE's
    // runtime broadcast upgrade when the table is actually tiny
    spark.conf.set(
      "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "256m")
    // ObjectHashAggregate (every TypedImperativeAggregate: posting
    // pairs, KMV, CMS — and plain collect_list) falls back to
    // SORT-BASED aggregation once a partition sees more than this many
    // groups — and the default is 128, so the posting-pair kernel
    // (tens of thousands of shingle groups per partition) always ran
    // on the slow sort path. 2^15 is a deliberate middle: the graft
    // aggregates have BOUNDED buffers (posting pairs by the maxDocFreq
    // cap ≈ 1.6 KB worst case, KMV by k, CMS by d·w → ≤ ~50 MB for
    // 2^15 groups), but the conf is session-wide and also governs
    // UNBOUNDED collect_list aggregations (dedup group/band lists,
    // per-session event lists), where the sort fallback's spill path
    // is the only memory-safety valve — so the threshold must stay
    // low enough that a value-heavy partition still falls back well
    // before it buffers everything on-heap.
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      (1 << 15).toString)
    // InferFiltersFromGenerate synthesizes `size(g) > 0 AND isnotnull(g)`
    // below every explode — and because the generator inputs here are
    // EXPENSIVE native expressions (graft_shingles, winnow fingerprints,
    // minhash signatures, container walks), the inferred predicate
    // re-evaluates the full expression once in the pushed Filter and
    // again in the Generate: the r16 baseline plans show
    // `wordshingles(text)` twice in every dedup-family stage (q23/q71/
    // q78/q89 `*_before.txt`). The filter only pre-drops rows explode
    // drops anyway (null/empty arrays), so output is identical — but the
    // duplicate evaluation doubles the corpus-scan stage of every
    // shingle/token pipeline at any scale. Excluded session-wide: every
    // graft generator input is either trivially cheap (sequence) or
    // expensive-and-never-prunable, so the rule can only cost here.
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    graft.expr.CosineSimilarity.register(spark)
    graft.expr.VecDistance.register(spark)
    graft.expr.VecArgmin.register(spark)
    graft.expr.WordGramHashes.register(spark)
    graft.expr.MinHashSignature.register(spark)
    graft.expr.WordShingles.register(spark)
    graft.expr.SimHash60.register(spark)
    graft.expr.WinnowFingerprints.register(spark)
    graft.expr.BloomMightContain.register(spark)
    graft.expr.KmvSketchAgg.register(spark)
    graft.expr.OrderedPairs.register(spark)
    graft.expr.OrderedPairsGen.register(spark)
    graft.expr.PackBytes.register(spark)
    graft.expr.PostingPairsAgg.register(spark)
    graft.expr.NfcNormalize.register(spark)
    graft.expr.ImageMeta.register(spark)
    graft.expr.PixelStats.register(spark)
    graft.expr.PixelGridSig.register(spark)
    graft.expr.LangIdWide.register(spark)
    graft.expr.AudioMeta.register(spark)
    graft.expr.AudioStats.register(spark)
    graft.expr.AudioEnvSig.register(spark)
    graft.expr.SigL1.register(spark)
    graft.expr.AviFrames.register(spark)
    graft.expr.Mp4Frames.register(spark)
    graft.expr.GifFrames.register(spark)
    graft.expr.H264Frames.register(spark)
    graft.expr.VideoMeta.register(spark)
    graft.expr.WarcRecords.register(spark)
    graft.expr.RtfToText.register(spark)
    graft.expr.HttpText.register(spark)
    graft.expr.HttpBody.register(spark)
    graft.expr.EpubText.register(spark)
    graft.expr.PdfText.register(spark)
    graft.expr.DocxText.register(spark)
    graft.expr.DocText.register(spark)
    graft.expr.BpeEncode.register(spark)
    graft.expr.ExifOrientation.register(spark)
    graft.expr.OrientPixels.register(spark)
    graft.expr.ResizePixels.register(spark)
    graft.expr.ResamplePcm.register(spark)
    graft.expr.AudioDecodeExpr.register(spark)
    graft.expr.AudioTags.register(spark)
    graft.expr.ImageTags.register(spark)
    graft.expr.VideoTags.register(spark)
    graft.expr.TarEntries.register(spark)
    graft.expr.ZipEntries.register(spark)
    graft.expr.ArEntries.register(spark)
    graft.expr.CpioEntries.register(spark)
    graft.expr.Bunzip2Expr.register(spark)
    graft.expr.UnxzExpr.register(spark)
    graft.expr.UnzstdExpr.register(spark)
    graft.expr.UnLz4Expr.register(spark)
    graft.expr.UnSnappyExpr.register(spark)
    graft.expr.SevenZip.register(spark)
    graft.expr.Decompress.register(spark)
    graft.expr.DocumentText.register(spark)
    graft.expr.OfficeText.register(spark)
    graft.expr.LegacyOffice.register(spark)
    graft.expr.OdfText.register(spark)
    graft.expr.EmlText.register(spark)
    graft.expr.MsgText.register(spark)
    graft.expr.Tnef.register(spark)
    graft.expr.VcardText.register(spark)
    graft.expr.LatexText.register(spark)
    graft.expr.CmsSketchAgg.register(spark)
    graft.expr.KmvQuantileAgg.register(spark)
    graft.plans.TableFunctions.register(spark)
    // per-session injection of the opt-in AQP rewrite (a no-op unless
    // spark.graft.approxCountDistinct is set) — works on sessions
    // built without spark.sql.extensions, e.g. the driver's own.
    // Append-if-absent: assignment would clobber user-installed rules
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.ApproxCountDistinctRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.ApproxCountDistinctRewrite
    }
    spark
  }

  /** Standard local session for tests / ad-hoc runs. */
  def session(master: String = "local[4]", shufflePartitions: Int = 8): SparkSession = {
    val s = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      // the production install path: native functions injected into the
      // base registry of every session state (see plans.GraftExtensions)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    tune(s)
  }

  /** Table loader for the driver testdata layout (`TESTDATA.md`). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** [[table]] rebalanced to the session's core count. The harness
    * testdata is one single-row-group parquet file per table, so a
    * scan — and everything pipelined onto it up to the first exchange,
    * including expensive per-row work like shingling — runs as ONE
    * task no matter the split size. A production deployment reads
    * thousands of splits and never needs this; here the text-heavy
    * query declarations opt in so their tokenize/shingle stage uses
    * all cores at the price of shuffling the (small) raw rows once.
    * No-op when the scan already has enough parallelism.
    */
  def tableParallel(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = table(spark, sfDir, name)
    val cores = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= cores / 2) df else df.repartition(cores)
  }

  /** Normalize `events.ts` to a session-zone TimestampType `ts2` column.
    *
    * The driver's testdata has shipped `ts` under two physical schemas
    * across generations: parquet TIMESTAMP(NANOS), which Spark can only
    * read as a nanosecond long (`spark.sql.legacy.parquet.nanosAsLong`,
    * set in [[tune]]), and parquet TIMESTAMP(MICROS) without UTC
    * adjustment, which Spark reads as TIMESTAMP_NTZ. Dispatch on the
    * scanned type so queries survive either generation. The nanos path
    * uses integer DIV, not double division: epoch-ns (~1.7e18) exceeds
    * double's 53-bit mantissa. The NTZ cast preserves wall-clock time —
    * the session zone is pinned UTC in [[tune]], matching the DuckDB
    * oracle's naive reading of the same file.
    */
  def withTs2(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.withColumn("ts2", df.schema("ts").dataType match {
      case LongType         => timestamp_micros(call_function("div", col("ts"), lit(1000L)))
      case TimestampNTZType => col("ts").cast(TimestampType)
      case TimestampType    => col("ts")
      case other => throw new IllegalArgumentException(
        s"unsupported events.ts type: $other")
    })
  }
}

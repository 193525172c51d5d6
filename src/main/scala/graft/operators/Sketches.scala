package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable cardinality sketches, kept engine-portable.
  *
  * KMV (k minimum values): hash every element to a uniform 60-bit
  * integer (md5-derived — the same portable derivation the dedup
  * family uses) and keep the k smallest DISTINCT hashes per group. The
  * k-th smallest hash m estimates the cardinality as
  * (k−1) · 2^60 / m — if n uniform points fall in [0, 2^60), the k-th
  * order statistic sits near k/n of the range.
  *
  * Why this sketch and not HLL: the estimate is a pure function of
  * the k smallest hashes, and those are DETERMINISTIC given the hash —
  * so the sketch is reproducible across engines (the DuckDB oracle
  * computes the identical estimate), mergeable (union = k smallest of
  * the combined sets), and still one shuffle. Spark's own
  * `approx_count_distinct` is HLL++ whose registers are
  * implementation-internal; its results can't be cross-checked.
  *
  * Scale shape: groupBy (group, hash) dedup → per-group window row
  * number ≤ k — both shuffles key on the group; the window input is
  * already deduplicated, and k rows per group survive. For very hot
  * groups, the dedup aggregation does map-side combine, so the
  * per-group fan-in is distinct-hashes, never raw rows.
  */
object Sketches {

  /** DECIMAL types for overflow-proof count arithmetic: Long-sized
    * counts as DECIMAL(19,0) so products fit precision 38 exactly.
    */
  private[graft] val cdec = DecimalType(19, 0)
  private[graft] val sdec = DecimalType(38, 0)

  /** Long projection that SATURATES at Long.MaxValue instead of
    * casting: with ANSI off, an out-of-Long-range decimal casts to
    * NULL, silently turning an overflowed pair count into "no answer"
    * (or, post-coalesce, 0 — the opposite of a never-underestimate
    * bound). `least` skips NULLs, so a NULL input (a DECIMAL(38,0)
    * accumulator that itself overflowed) also saturates.
    */
  private[graft] def saturateToLong(c: Column): Column =
    least(c.cast(sdec), lit(Long.MaxValue).cast(sdec)).cast(LongType)

  /** Per-group KMV estimate next to the exact distinct count (callers
    * at 100 TB drop the exact column; it is here so correctness checks
    * can quantify the sketch error). Output: (groupCol, n_exact,
    * kmv_k, kmv_estimate).
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    // null values hash to null, which would sort FIRST and poison the
    // k-th order statistic — exclude them (countDistinct skips nulls
    // too, so the exact column stays consistent)
    val hashed = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol),
        graft.functions.TextAnalysis.md5Long(col(valueCol).cast(StringType))
          .as("_h"))
      .groupBy(col(groupCol), col("_h")).agg(count(lit(1)).as("_cnt"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_h"))
    hashed
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("_nmin"), max(col("_h")).as("_kth"))
      .join(df.groupBy(col(groupCol))
        .agg(countDistinct(col(valueCol)).as("n_exact")), groupCol)
      .select(col(groupCol), col("n_exact"),
        col("_nmin").cast(IntegerType).as("kmv_k"),
        // fewer than k distinct values → the sketch holds them all and
        // is exact by construction
        when(col("_nmin") < k, col("_nmin").cast(DoubleType))
          .otherwise(round(
            lit((k - 1).toDouble) * lit(math.pow(2, 60)) / col("_kth"), 2))
          .as("kmv_estimate"))
  }

  /** The same sketch as a NATIVE mergeable aggregate
    * (graft.expr.KmvSketchAgg, registered by Graft.tune): partial
    * aggregation keeps a bounded k-minima buffer per group per
    * partition, so the exchange carries ≤ k longs per (group ×
    * partition) instead of the full distinct-hash set — the form that
    * survives billions of distinct values per group. Estimates are
    * bit-identical to [[kmvDistinct]] (same hash, same arithmetic,
    * same rounding); JoinsStatsSpec proves equality and partition
    * invariance.
    */
  def kmvDistinctAgg(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame =
    df.groupBy(col(groupCol))
      .agg(call_function(graft.expr.KmvSketchAgg.FunctionName,
        col(valueCol).cast(StringType), lit(k)).as("_kmv"))
      .select(col(groupCol),
        col("_kmv.kmv_k").as("kmv_k"),
        col("_kmv.kmv_estimate").as("kmv_estimate"))

  /** Probe a count-min sketch array (graft.expr.CmsSketchAgg output)
    * for `key`'s estimated frequency: min over the depth rows of the
    * key's bucket counter. Pure builtins (`element_at` + `least`), so
    * the probe stays inside whole-stage codegen.
    */
  def cmsEstimate(sketch: Column, key: Column, depth: Int, width: Int): Column = {
    val probes = (0 until depth).map { j =>
      val bucket = pmod(graft.functions.TextAnalysis.md5Long(
        concat(key.cast(StringType), lit("#" + j))), lit(width.toLong))
      element_at(sketch, (bucket + lit(j * width) + lit(1)).cast(IntegerType))
    }
    if (probes.size == 1) probes.head else least(probes: _*)
  }

  /** Equi-join output-cardinality estimate from two count-min
    * sketches: |A ⋈ B| = Σ_k c_A(k)·c_B(k) is estimated by the sketch
    * INNER PRODUCT min_j Σ_b A[j][b]·B[j][b] (the classic AMS/CM
    * application) — never an underestimate, collisions only inflate.
    * The pre-join planning diagnostic at 100 TB: both sides reduce to
    * d·w counters without shuffling either table by key, then the
    * estimate is one row of array arithmetic; the exact count (for
    * error reporting here) comes from joining the two bounded key
    * histograms, never materializing the join itself.
    *
    * Output one row: (est_pairs, exact_pairs).
    */
  def cmsJoinCardinality(dfA: DataFrame, keyA: String, dfB: DataFrame,
      keyB: String, depth: Int, width: Int): DataFrame = {
    val skA = dfA.filter(col(keyA).isNotNull)
      .agg(call_function(graft.expr.CmsSketchAgg.FunctionName,
        col(keyA).cast(StringType), lit(depth), lit(width)).as("_sa"))
    val skB = dfB.filter(col(keyB).isNotNull)
      .agg(call_function(graft.expr.CmsSketchAgg.FunctionName,
        col(keyB).cast(StringType), lit(depth), lit(width)).as("_sb"))
    // dot products accumulate as DECIMAL(38,0): Long×Long bucket
    // products overflow at ~5e8 counts per bucket (plausible at the
    // advertised scale) and with ANSI off Spark would wrap SILENTLY,
    // breaking the never-underestimate bound. DECIMAL(19,0)² fits
    // precision 38 exactly. The Long outputs SATURATE at
    // Long.MaxValue rather than cast: with ANSI off an
    // out-of-Long-range decimal casts to NULL, which would turn the
    // exact overflow case into "0 pairs" — the opposite of the bound.
    // A NULL rowDot (DECIMAL(38,0) accumulator overflow) is skipped by
    // `least`, which is correct: CMS takes the min over rows and an
    // overflowed row is by definition not the min; all rows NULL
    // saturates to Long.MaxValue.
    val rowDots = (0 until depth).map { j =>
      aggregate(
        zip_with(
          slice(col("_sa"), j * width + 1, width),
          slice(col("_sb"), j * width + 1, width),
          (x, y) => x.cast(cdec) * y.cast(cdec)),
        lit(java.math.BigDecimal.ZERO).cast(sdec),
        (acc, v) => (acc + v).cast(sdec))
    }
    val estDec = if (rowDots.size == 1) rowDots.head else least(rowDots: _*)
    val est = saturateToLong(estDec)
    val ca = dfA.filter(col(keyA).isNotNull)
      .groupBy(col(keyA).as("_k")).agg(count(lit(1)).as("_ca"))
    val cb = dfB.filter(col(keyB).isNotNull)
      .groupBy(col(keyB).as("_k")).agg(count(lit(1)).as("_cb"))
    // count distinguishes the empty join (genuinely 0 pairs) from a
    // decimal-sum overflow (NULL sum over a NON-empty join → saturate).
    val exact = ca.join(cb, "_k")
      .agg(sum(col("_ca").cast(cdec) * col("_cb").cast(cdec)).as("_s"),
        count(lit(1)).as("_c"))
      .select(when(col("_c") === 0, lit(0L))
        .otherwise(saturateToLong(col("_s")))
        .as("exact_pairs"))
    skA.join(skB).select(est.as("est_pairs"))
      .join(exact)
  }

  /** Count-min heavy hitters: build ONE bounded d×w sketch over the
    * whole column (the native mergeable aggregate — the exchange
    * carries d·w longs per partition, never per-key state), broadcast
    * the single sketch row back, probe every candidate key, and keep
    * those whose ESTIMATE clears the threshold. CMS never
    * underestimates, so the output is a superset of the true heavy
    * hitters — the standard two-phase shape (sketch-gate, then exact
    * count only the survivors) at 100 TB, where the candidate set here
    * (`df`'s distinct keys) would come from a sample or a second CMS
    * pass, not a full distinct.
    *
    * Output: (keyCol, n_exact, cms_estimate ≥ threshold). The exact
    * count is included so callers (and the oracle) can see the
    * collision overestimate; production drops it.
    */
  def cmsHeavyHitters(df: DataFrame, keyCol: String, depth: Int, width: Int,
      threshold: Long): DataFrame = {
    val sketch = df.agg(call_function(graft.expr.CmsSketchAgg.FunctionName,
      col(keyCol).cast(StringType), lit(depth), lit(width)).as("_sk"))
    val exact = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n_exact"))
    // one-row build side: the broadcast nested-loop join is a single
    // sketch row fanned to every key — bounded and intentional
    exact.join(broadcast(sketch))
      .select(col(keyCol), col("n_exact"),
        cmsEstimate(col("_sk"), col(keyCol), depth, width).as("cms_estimate"))
      .filter(col("cms_estimate") >= threshold)
  }

  /** Per-key quantile estimates from the deterministic KMV value
    * sample (native mergeable `graft_kmvq` — see
    * [[graft.expr.KmvQuantileAgg]]): one pass, ≤ k values per
    * group × partition across the exchange, no per-key sort of the
    * data. Exact whenever a key has ≤ k rows (the sample is the
    * population); otherwise a uniform-sample estimate whose SELECTION
    * is deterministic (md5 order), so results reproduce bit-for-bit
    * across engines and partitionings — the property histogram passes
    * have and t-digest lacks. Quantile convention: sorted sample s of
    * size m, p-quantile = s[⌊p·(m−1)⌋] (0-based).
    *
    * Emits one `p<NN>` column per requested percentile.
    */
  def sampledQuantiles(df: DataFrame, keyCols: Seq[String], idCol: String,
      valueCol: Column, k: Int, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"percentiles must be in [0, 1]: $ps")
    val agg = df.groupBy(keyCols.map(col): _*)
      .agg(call_function(graft.expr.KmvQuantileAgg.FunctionName,
        col(idCol).cast(StringType), valueCol.cast(DoubleType),
        lit(k)).as("_s"))
    ps.foldLeft(agg) { (d, p) =>
      // guard the all-null group: an empty sample would index
      // element_at at 0 (a runtime error under ANSI-off too) — such
      // groups get NULL quantiles instead of failing the job
      d.withColumn(f"p${math.round(p * 100)}%d",
        when(size(col("_s")) > 0,
          element_at(col("_s"),
            (floor(lit(p) * (size(col("_s")) - 1)) + 1).cast(IntegerType))))
    }.drop("_s")
  }
}

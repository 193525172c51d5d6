package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distribution statistics over corpus columns.
  *
  * Exact interpolated percentiles WITHOUT the built-in `percentile`
  * aggregate: that aggregate buffers every value of a group in one
  * task's memory, which at 100 TB (billions of rows per language
  * group) is an OOM, not a plan. This form is relational:
  *   1. count per (group, value) — one map-side-combined shuffle,
  *      collapsing the data to its VALUE HISTOGRAM (distinct values
  *      per group, e.g. document lengths → at most ~10^5 rows);
  *   2. cumulative position range [_lo, _hi] per value — a window over
  *      the histogram only, partitioned by group;
  *   3. the percentile index h = (n−1)·p falls in exactly one value's
  *      range; linear interpolation between the floor(h) and ceil(h)
  *      values — conditional aggregates over the histogram.
  * Identical semantics to Spark's `percentile` / DuckDB's
  * `quantile_cont` (0-based (n−1)·p rank, linear interpolation).
  */
object Stats {

  /** Exact per-group percentiles of `valueCol`. `ps` maps output
    * column name → fraction in [0, 1]. Nulls are excluded (matching
    * the built-in aggregates). Results rounded to `scale` decimals.
    */
  def percentiles(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(String, Double)], scale: Int = 4): DataFrame = {
    require(ps.nonEmpty, "percentiles needs at least one (name, p)")
    require(ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"fractions must be in [0,1]: $ps")
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast(DoubleType).as("_v"))
      .agg(count(lit(1)).as("_c"))
    val ord = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
    val all = Window.partitionBy(col(groupCol))
    val hist = counts
      .withColumn("_hi",
        sum(col("_c")).over(ord.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .withColumn("_lo", col("_hi") - col("_c") + 1)
      .withColumn("_n", sum(col("_c")).over(all))
    val aggs = ps.flatMap { case (nm, p) =>
      val h = (col("_n") - 1).cast(DoubleType) * lit(p)
      Seq(
        max(when(col("_lo") <= floor(h) && floor(h) <= col("_hi"), col("_v")))
          .as(s"_l_$nm"),
        max(when(col("_lo") <= ceil(h) && ceil(h) <= col("_hi"), col("_v")))
          .as(s"_u_$nm"),
        max(h).as(s"_h_$nm"))
    }
    val outs = ps.map { case (nm, _) =>
      round(col(s"_l_$nm") +
        (col(s"_h_$nm") - floor(col(s"_h_$nm"))) *
          (col(s"_u_$nm") - col(s"_l_$nm")), scale).as(nm)
    }
    hist.groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol) +: outs: _*)
  }

  /** Per-group Pearson correlation (and covariance) of two numeric
    * columns, engine-reproducible: inputs round to 6dp and cast to
    * DECIMAL(18,6), so products are DECIMAL(37,12) — exact in both
    * engines without precision-cap rounding — and the five moment
    * sums accumulate exactly and order-independently (the built-in
    * `corr`'s streaming double accumulation is partition-order
    * dependent), then
    * r = (nΣxy − ΣxΣy) / (√(nΣx² − Σx²) · √(nΣy² − Σy²)) evaluates
    * once in double with a fixed operand order, rounded to 6dp. Rows
    * with a null on either side are excluded (matching `corr`). One
    * map-side-combined aggregation; output bounded by group count.
    */
  def correlation(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val mdec = DecimalType(18, 6)
    def d(c: String): Column = round(col(c).cast(DoubleType), 6).cast(mdec)
    // moment sums round to 4dp BEFORE the double cast: the scale-12
    // product sums otherwise exceed 2^53 scaled-integer range at large
    // group counts, where DuckDB's decimal→double conversion
    // double-rounds one ulp away from Spark's (see q01 / SKILL.md)
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"),
        round(sum(d(xCol)), 4).cast(DoubleType).as("_sx"),
        round(sum(d(yCol)), 4).cast(DoubleType).as("_sy"),
        round(sum(d(xCol) * d(yCol)), 4).cast(DoubleType).as("_sxy"),
        round(sum(d(xCol) * d(xCol)), 4).cast(DoubleType).as("_sxx"),
        round(sum(d(yCol) * d(yCol)), 4).cast(DoubleType).as("_syy"))
    val n = col("_n").cast(DoubleType)
    val varX = n * col("_sxx") - col("_sx") * col("_sx")
    val varY = n * col("_syy") - col("_sy") * col("_sy")
    val cov = n * col("_sxy") - col("_sx") * col("_sy")
    base.select(col(groupCol), col("_n").as("n"),
      round(cov / (n * n), 6).as("covariance"),
      when(varX > 0 && varY > 0,
        round(cov / (sqrt(varX) * sqrt(varY)), 6))
        .otherwise(lit(null).cast(DoubleType)).as("pearson_r"))
  }

  /** Per-group z-score outlier detection with engine-reproducible
    * moments: values round to 6dp and accumulate as DECIMAL(18,6) (the
    * same exact-sum discipline as [[correlation]]), population
    * mean/stddev derive from the sums once in double with a fixed
    * operand order, and rows with |value − mean| / σ > `z` are flagged.
    * Groups with zero variance produce no outliers.
    *
    * Shape: one map-side-combined aggregation (output bounded by group
    * count) + a join of the stats table back onto the stream — no
    * window, no second shuffle of the data in the common case. The
    * broadcast is NOT forced: the stats frame is group-count-sized,
    * and for a high-cardinality group column (per-user, per-domain) a
    * forced broadcast is a driver-memory cliff — AQE sees the actual
    * aggregate size at runtime and broadcasts exactly when it is
    * genuinely small.
    */
  def zscoreOutliers(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, z: Double = 3.0): DataFrame = {
    val mdec = DecimalType(18, 6)
    val v = round(col(valueCol).cast(DoubleType), 6).cast(mdec)
    // sums round to 4dp before the double cast (2^53 hazard — see
    // correlation above)
    val stats = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"),
        round(sum(v), 4).cast(DoubleType).as("_sx"),
        round(sum(v * v), 4).cast(DoubleType).as("_sxx"))
    val n = col("_n").cast(DoubleType)
    val mean = col("_sx") / n
    val std = sqrt(n * col("_sxx") - col("_sx") * col("_sx")) / n
    val zc = (col("_vd") - col("_mean")) / col("_std")
    df.filter(col(valueCol).isNotNull)
      .withColumn("_vd", v.cast(DoubleType))
      .join(stats.select(col(groupCol), mean.as("_mean"), std.as("_std"))
        .filter(col("_std") > 0), Seq(groupCol))
      .filter(abs(zc) > z)
      .select(col(idCol), col(groupCol), col("_vd").as("value"),
        round(zc, 6).as("zscore"))
  }

  /** Robust (median/MAD) per-group outlier detection — the z-score
    * variant's heavy-tail-safe sibling: a handful of extreme values
    * inflate mean AND stddev, masking true outliers, while the median and
    * the median-absolute-deviation ignore them. robust_z =
    * (x − median) / (1.4826 · MAD), the standard normal-consistency
    * scaling; rows with |robust_z| > `z` are flagged.
    *
    * Built on [[percentiles]] (value-histogram form, never buffering a
    * group in memory): one pass for the median, one for the MAD over
    * deviations, both broadcast back — three scans total, each
    * shuffling only histogram-sized data. Zero-MAD groups produce no
    * outliers (degenerate spread).
    */
  def madOutliers(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, z: Double = 3.5): DataFrame = {
    val med = percentiles(df, groupCol, valueCol, Seq(("med", 0.5)))
    val withMed = df.filter(col(valueCol).isNotNull)
      .join(med, Seq(groupCol)) // AQE broadcasts when actually small
      .withColumn("_adev", abs(col(valueCol).cast(DoubleType) - col("med")))
    val mad = percentiles(withMed, groupCol, "_adev", Seq(("mad", 0.5)))
    val rz = (col(valueCol).cast(DoubleType) - col("med")) /
      (lit(1.4826) * col("mad"))
    withMed.join(mad, Seq(groupCol))
      .filter(col("mad") > 0 && abs(rz) > z)
      .select(col(idCol), col(groupCol),
        col(valueCol).cast(DoubleType).as("value"),
        round(rz, 4).as("robust_z"))
  }

  /** Per-group winsorization: clip `valueCol` into its group's
    * [pLo, pHi] percentile band — the standard outlier-taming
    * preprocessing step before averaging/regression on heavy-tailed
    * metrics. Bounds come from [[percentiles]] (histogram form) and
    * broadcast back; the data itself is scanned once and never
    * re-shuffled. Output adds `lo`, `hi` and the clipped value.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(pLo < pHi, s"need pLo < pHi: $pLo, $pHi")
    val bounds = percentiles(df, groupCol, valueCol,
      Seq(("lo", pLo), ("hi", pHi)))
    // null measurements are EXCLUDED, matching percentiles/madOutliers:
    // Spark's least/greatest skip nulls, so a null value would
    // otherwise "clip" to the lower bound — fabricated data
    df.filter(col(valueCol).isNotNull)
      .join(bounds, Seq(groupCol)) // AQE broadcasts when actually small
      .withColumn("clipped",
        least(greatest(col(valueCol).cast(DoubleType), col("lo")), col("hi")))
  }

  /** Per-column null/blank profile in ONE scan: for each string
    * column, how many rows are null and how many are blank-ish (null,
    * whitespace-only, or the 'nan' stringification artifact — the
    * `Normalize.isBlankish` contract the filter stage drops on). The
    * generalized data-profiling sibling of the q69 expectations
    * report; conditional sums all fold into a single aggregation, and
    * `stack` reshapes the one-row result to (column, counts) rows.
    */
  def nullProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "nullProfile needs at least one column")
    // col() PARSES backticks in its argument, so a name containing one
    // must be fully quoted (doubling embedded backticks) to reference
    // the column rather than error; aliases are literal, no quoting
    def qcol(c: String): Column = col("`" + c.replace("`", "``") + "`")
    val aggs = count(lit(1)).as("_n") +: cols.flatMap { c =>
      Seq(
        sum(when(qcol(c).isNull, 1L).otherwise(0L)).as(s"${c}_null"),
        sum(when(graft.functions.Normalize.isBlankish(qcol(c)), 1L)
          .otherwise(0L)).as(s"${c}_blank"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // backtick-quote generated references and escape the name literal:
    // a column like "my-col" must not parse as `my - col_null`, and a
    // backtick IN the name must be doubled inside the quoted identifier
    // (the SQL-identifier escape) or the expr is malformed
    val stackArgs = cols.map { c =>
      val literal = c.replace("\\", "\\\\").replace("'", "\\'")
      val ident = c.replace("`", "``")
      s"'$literal', `${ident}_null`, `${ident}_blank`"
    }.mkString(", ")
    row.select(col("_n"),
        expr(s"stack(${cols.size}, $stackArgs) AS (column_name, n_null, n_blank)"))
      .select(col("column_name"), col("n_null"), col("n_blank"),
        round(col("n_blank").cast(DoubleType) / col("_n"), 6).as("blank_rate"))
  }

  /** Equal-frequency discretization: assign each row the quantile bin
    * of its group's `valueCol` distribution (fractions `ps` ascending
    * → bins 1..ps.size+1; bin b means value ≤ the b-th bound, last bin
    * above all bounds). The feature-engineering binning step — e.g.
    * length quartiles per language for curriculum/stratification —
    * without `ntile`'s full per-group sort: bounds come from the
    * histogram [[percentiles]] and broadcast back, the data is scanned
    * once. Ties at a bound all land in the lower bin (deterministic).
    * Null values are excluded.
    */
  def quantileBins(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p < 1) &&
      (ps.size < 2 || ps.sliding(2).forall(w => w(0) < w(1))),
      s"need STRICTLY ascending fractions in (0,1): $ps")
    val named = ps.zipWithIndex.map { case (p, i) => (s"_b$i", p) }
    val bounds = percentiles(df, groupCol, valueCol, named)
    val v = col(valueCol).cast(DoubleType)
    val bin = named.map { case (nm, _) =>
      when(v > col(nm), 1).otherwise(0)
    }.reduce(_ + _) + lit(1)
    df.filter(col(valueCol).isNotNull)
      .join(bounds, Seq(groupCol)) // AQE broadcasts when actually small
      .withColumn("bin", bin.cast(org.apache.spark.sql.types.IntegerType))
      .drop(named.map(_._1): _*)
  }

  /** Key-distribution skew report — the pre-join diagnostic for
    * `Scale.saltedJoin`: row count, distinct keys, the heaviest key's
    * share of all rows, and the Shannon entropy of the key
    * distribution (ln-based; uniform keys → ln(n_keys), one hot key →
    * → 0). Entropy terms p·ln p round to 12dp and sum as
    * DECIMAL(28,12), so the result is order-independent and
    * engine-reproducible. One map-side-combined count per key; the
    * summary aggregates the bounded key histogram.
    */
  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("_c"))
    val edec = DecimalType(28, 12)
    val totals = counts.agg(sum(col("_c")).as("_n"), count(lit(1)).as("n_keys"),
      max(col("_c")).as("_max"))
    val p = col("_c").cast(DoubleType) / col("_n").cast(DoubleType)
    counts.join(broadcast(totals))
      .select(col("_n"), col("n_keys"), col("_max"),
        round(p * log(p), 12).cast(edec).as("_plp"))
      .groupBy(col("_n"), col("n_keys"), col("_max"))
      .agg(round(-sum(col("_plp")).cast(DoubleType), 6).as("entropy"))
      .select(col("_n").as("n_rows"), col("n_keys"),
        round(col("_max").cast(DoubleType) / col("_n"), 6).as("top_share"),
        col("entropy"))
  }

  /** Fixed-width histogram of a numeric column: bucket k covers
    * [k·width, (k+1)·width). One map-side-combined aggregation whose
    * output is bounded by the value RANGE over width, not the row
    * count — the EDA primitive for distribution eyeballing at any
    * scale. Nulls are excluded; empty buckets are absent (sparse).
    */
  def fixedWidthHistogram(df: DataFrame, valueCol: String,
      width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    df.filter(col(valueCol).isNotNull)
      .groupBy(floor(col(valueCol) / width).cast(LongType).as("_b"))
      .agg(count(lit(1)).as("n"))
      .select((col("_b") * width).as("lo"),
        ((col("_b") + 1) * width).as("hi"), col("n"))
  }
}

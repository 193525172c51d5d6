package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Trainable quality classifier for corpus curation: the
  * fastText-shaped component of a training-data pipeline (label a few
  * thousand docs good/bad, train a linear model over hashed
  * bag-of-words features, score the corpus, keep the top fraction).
  *
  * The model is logistic regression over md5-hashed token-count
  * features, trained with full-batch gradient descent. Everything is
  * engineered for ENGINE-REPRODUCIBLE training — the whole loop
  * hash-matches an external SQL engine:
  *  - features are integer bucket counts (no tf normalization → no
  *    float division),
  *  - weights live on an exact decimal grid (scale 10): the update
  *    `w − lr·Σ e·x` is exact because e is a 6dp decimal, x an
  *    integer, and lr a 4dp literal,
  *  - the ONLY floating-point step is the sigmoid, immediately rounded
  *    to 6dp (the double bits entering `exp` are identical everywhere
  *    because they come from an exact decimal z; a 1-ulp libm
  *    difference survives the 6dp rounding with probability ~1e-10
  *    per evaluation),
  *  - gradient sums accumulate in DECIMAL — order-independent, so
  *    partitioning cannot change the result.
  *
  * Scale shape: the distributed work per iteration is one pass over
  * the (doc, bucket, count) feature table — built once, cached, two
  * consumers per iteration (per-doc margin, per-bucket gradient) —
  * plus a dim-sized collect. The model (dim+1 values) broadcasts as a
  * literal join table. iters × one-corpus-pass is the textbook
  * full-batch GD cost; dim bounds every model-side structure.
  *
  * ==The 100 TB training recipe: sample, then train==
  *
  * Full-batch GD is iters× full corpus passes BY DEFINITION — at
  * 100 TB that is iters×100 TB of scan, which no reformulation of
  * this operator removes. The production recipe is composition, not a
  * new operator: train on a deterministic hash sample and score the
  * full corpus with the resulting model —
  *
  * {{{
  * val sample = docs.filter(Filters.hashSample(col("doc_id"), 0.01))
  * val model  = Classifier.trainLrClassifier(sample, "doc_id", "text", "label")
  * val scored = Classifier.scoreLr(docs, "doc_id", "text", model, dim)
  * }}}
  *
  * [[graft.operators.Filters.hashSample]] is an md5-threshold
  * projection — the sample PUSHES INTO the corpus scan (no shuffle,
  * no materialization), is reproducible across engines and runs, and
  * a quality classifier's signal saturates far below web-corpus size
  * (every published pipeline — GPT-3's LR quality filter, Gopher's —
  * trains on a small labeled set and applies corpus-wide). Scoring
  * stays the one map-only pass it already is. ClassifierSpec locks
  * the composition: sampled training = training on the equal
  * pre-materialized subset, bit for bit.
  */
object Classifier {

  /** (idCol, j, x): hashed bag-of-words features — token md5 bucket
    * counts. One shuffle on (doc, bucket).
    */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame =
    df.select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("_w"))
      .select(col(idCol),
        pmod(TextAnalysis.md5Long(col("_w")), lit(dim.toLong)).as("j"))
      .groupBy(col(idCol), col("j"))
      .agg(count(lit(1)).as("x"))

  // Narrow enough that every product stays inside DECIMAL's 38-digit
  // precision cap in ANY engine — Spark silently REDUCES SCALE
  // (rounds!) when a decimal product overflows 38 digits, which is an
  // exactness bug, not a type nit: w(22,10) × long(20,0) → 43 digits →
  // scale clipped → the training run drifts off the oracle's grid.
  // w(14,10) × x(6,0) → 21 digits, exact everywhere.
  private val WType = DecimalType(14, 10)
  private val XType = DecimalType(6, 0)
  private val EType = DecimalType(8, 6)

  /** Train logistic regression: returns (feature, weight) with
    * `feature` = bucket index 0..dim-1 and −1 for the bias, weights as
    * exact-grid doubles. `labelCol` must be 0/1.
    *
    * One Spark action per iteration: the bias rides along as a
    * synthetic feature row (j = −1, x = 1) per labeled doc, so a
    * single groupBy(j) over the error-joined feature table yields
    * every bucket gradient AND the bias gradient (Σ e·1 = Σ e) in one
    * dim+1-sized collect. The scoring join's weight table only carries
    * j ≥ 0, so the synthetic rows never enter the margin — z stays
    * Σ wⱼ·xⱼ + bias-literal, and docs with no real features stay out
    * of the batch, exactly as the unrolled oracle computes it.
    */
  def trainLrClassifier(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int = 16, iters: Int = 4,
      lr: BigDecimal = BigDecimal("0.0001")): DataFrame = {
    require(dim > 0 && iters > 0, "need dim > 0 and iters > 0")
    require(lr.scale <= 4 && lr > 0, s"lr must be positive with <= 4dp: $lr")
    val spark = df.sparkSession
    val labels = df.select(col(idCol), col(labelCol).cast(LongType).as("_y"))
    val feats = graft.Caches.own(
      hashedFeatures(df, idCol, textCol, dim).unionByName(
        labels.select(col(idCol), lit(-1L).as("j"), lit(1L).as("x"))))
    var w: IndexedSeq[java.math.BigDecimal] = IndexedSeq.fill(dim + 1)(
      java.math.BigDecimal.ZERO.setScale(10))
    val lrJ = lr.underlying
    for (_ <- 1 to iters) {
      val g = gradients(feats, labels, idCol, w, dim)
      val zero = java.math.BigDecimal.ZERO
      w = (0 until dim).map(j =>
        w(j).subtract(lrJ.multiply(g.getOrElse(j, zero))).setScale(10)) :+
        w(dim).subtract(lrJ.multiply(g.getOrElse(-1, zero))).setScale(10)
    }
    import spark.implicits._
    ((0 until dim).map(j => (j.toLong, w(j).doubleValue)) :+
      (-1L, w(dim).doubleValue))
      .toDF("feature", "weight")
  }

  /** Per-doc margin + 6dp sigmoid under the CURRENT weights. */
  private def scored(feats: DataFrame, labels: DataFrame, idCol: String,
      w: IndexedSeq[java.math.BigDecimal], dim: Int): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val wDf = (0 until dim).map(j => (j.toLong, new java.math.BigDecimal(
      w(j).toPlainString))).toDF("j", "_wj")
      .select(col("j"), col("_wj").cast(WType).as("_wj"))
    val bias = lit(w(dim).toPlainString).cast(WType)
    feats.join(broadcast(wDf), "j")
      .groupBy(col(idCol))
      .agg(sum(col("_wj") * col("x").cast(XType)).as("_zs"))
      .select(col(idCol), (col("_zs") + bias).as("_z"))
      .withColumn("_p",
        round(lit(1.0) / (lit(1.0) + exp(-col("_z").cast(DoubleType))), 6)
          .cast(DecimalType(7, 6)))
      .join(labels, idCol)
      .withColumn("_e", (col("_p") - col("_y")).cast(EType))
  }

  /** One full-batch gradient in ONE action: Σ e·x per bucket (exact
    * decimal), with the synthetic j = −1 rows carrying the bias term.
    * The inner join with `e` keeps only docs that entered the batch,
    * so the bias gradient sums exactly the same errors as before.
    * dim+1 values collected.
    */
  private def gradients(feats: DataFrame, labels: DataFrame, idCol: String,
      w: IndexedSeq[java.math.BigDecimal],
      dim: Int): Map[Int, java.math.BigDecimal] = {
    val e = scored(feats, labels, idCol, w, dim).select(col(idCol), col("_e"))
    feats.join(e, idCol)
      .groupBy(col("j"))
      .agg(sum(col("_e") * col("x").cast(XType)).as("_g"))
      .collect().map(r => r.getLong(0).toInt -> r.getDecimal(1)).toMap
  }

  /** Score a corpus with a trained (feature, weight) model: returns
    * (idCol, score) with the same 6dp sigmoid contract as training.
    * The model is dim-sized → broadcast; one feature pass.
    */
  def scoreLr(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // dim+1 rows by contract — collect once so a lazily-computed model
    // plan executes a single time, not once per consumer below
    val rows = model.select(col("feature").cast(LongType),
      col("weight").cast(DoubleType)).as[(Long, Double)].collect()
    // double → 10dp grid the way Spark's cast does (valueOf + HALF_UP):
    // grid values round-trip exactly (1e-10 spacing is far above one
    // double ulp at these magnitudes)
    def grid(v: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(v)
        .setScale(10, java.math.RoundingMode.HALF_UP)
    val wDf = rows.toSeq.filter(_._1 >= 0)
      .map { case (j, v) => (j, grid(v)) }
      .toDF("j", "_wj")
      .select(col("j"), col("_wj").cast(WType).as("_wj"))
    val bias = rows.collectFirst { case (-1L, v) => grid(v) }
      .getOrElse(throw new IllegalArgumentException(
        "model has no bias row (feature = -1)"))
    hashedFeatures(df, idCol, textCol, dim)
      .join(broadcast(wDf), "j")
      .groupBy(col(idCol))
      .agg(sum(col("_wj") * col("x").cast(XType)).as("_zs"))
      .select(col(idCol),
        round(lit(1.0) / (lit(1.0) +
          exp(-(col("_zs") + lit(bias.toPlainString).cast(WType))
            .cast(DoubleType))), 6).as("score"))
  }
}

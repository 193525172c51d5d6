package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale design:
  *  - `bruteForceTopK` broadcasts the (small) query set against the
  *    corpus — a map-side-only broadcast nested loop; no shuffle except
  *    the final per-query top-k aggregation. Correct baseline at any
  *    corpus size as long as the QUERY side is broadcastable.
  *  - `ivf*` is the scale path: k centroid rows partition the corpus
  *    into cells (one broadcast-join assignment pass); a query probes
  *    only its `nProbe` nearest cells, shrinking the scanned fraction
  *    to ~nProbe/k of the corpus. Cell assignment is precomputable and
  *    persistable (partitioned parquet by cell_id → partition pruning
  *    does the probe selection for free).
  *  - All math is pure `Column` expressions (zip_with + aggregate) in
  *    double precision — codegen'd, deterministic element order.
  */
object Similarity {

  private def asDouble(v: Column): Column =
    transform(v, x => x.cast(DoubleType))

  /** Fail ANALYSIS, not results, on non-numeric ids. The map-only
    * codebook kernels ([[graft.expr.VecArgmaxCos]]/[[VecArgminL2]])
    * key candidates by 64-bit id, so codebook/query ids are cast to
    * long on the way in; for a string id that cast yields null and the
    * kernel would read it as 0 — every row silently assigned centroid
    * 0 with no error (the old join+min(struct) form supported any id
    * type, so this is a contract NARROWING that must be loud). String
    * cell names: map them through xxhash64 (or a dictionary join)
    * upstream and join the labels back on the way out.
    */
  private def requireIntegralId(df: DataFrame, colName: String,
      fn: String): Unit =
    df.schema(colName).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"$fn: id column '$colName' must be integral (byte/short/int/" +
          s"long), got ${other.catalogString} — the broadcast-codebook " +
          "argmin kernel carries ids as long; hash or dictionary-encode " +
          "non-numeric ids upstream")
    }

  /** Dot product of two array<numeric> columns (element order fixed). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(asDouble(a), x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity via the native codegen'd expression
    * (graft.expr.CosineSimilarity, registered by Graft.tune); 0 when
    * either vector has zero norm. Bit-identical to `cosineComposed`.
    */
  def cosine(a: Column, b: Column): Column =
    call_function(graft.expr.CosineSimilarity.FunctionName, a, b)

  /** The same computation composed from built-in higher-order
    * functions — reference semantics / sessions without the registered
    * expression. ~250× slower per pair (interpreted).
    */
  def cosineComposed(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** Brute-force cosine top-k: for every row of `queries`, the k nearest
    * rows of `corpus` (self-matches excluded by id). Query side must be
    * small — it is broadcast. Returns (query_id, neighbor_id, sim) with
    * sim rounded to 6dp and ties broken by neighbor id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("_qv"), col("_cv")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select("query_id", "neighbor_id", "sim")
  }

  /** IVF cell assignment: nearest centroid per corpus row (cosine).
    * `centroids` must be small (broadcast). Ties → lowest centroid id.
    * With `keepSim` the winning cosine survives as `centroid_sim`
    * (rounded 6dp — the engine-reproducible precision every similarity
    * here uses).
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, centroidIdCol: String = "centroid_id",
      keepSim: Boolean = false): DataFrame = {
    requireIntegralId(centroids, idCol, "ivfAssign")
    // MAP-ONLY assignment: the centroids collapse to one broadcast row
    // holding the whole codebook array, and a native expression
    // (graft.expr.VecArgmaxCos) scans it per corpus row — no N×k
    // candidate expansion ever exists as rows. The two shapes this
    // replaces both paid for that expansion after materializing it: a
    // row_number window SORTS it with vectors attached (the 31.8 GB
    // spill of the 100× sweep), and the argmin aggregate that fixed
    // the spill still planned as SortAggregate (struct buffers aren't
    // UnsafeRow-mutable) plus a corpus-wide exchange. Now assignment
    // is a projection: zero shuffles, zero sorts, composable with
    // scan pushdown. Arithmetic contract unchanged (6dp-rounded
    // cosine, ties to the lowest centroid id — the expression rounds
    // exactly like round(col, 6)). Centroid ids must be numeric
    // (cast to long); an empty centroid set yields an empty result,
    // matching the old inner-join behavior.
    val cbRow = broadcast(centroids.agg(collect_list(
      struct(col(idCol).cast(LongType).as("_cid"),
        col(vecCol).as("_cv"))).as("_cb")))
    val base = corpus.crossJoin(cbRow)
      .withColumn("_b", call_function(graft.expr.VecArgmin.ArgmaxCosName,
        col(vecCol), col("_cb")))
      .filter(col("_b").isNotNull)
    val out = base.select(
      corpus.columns.map(c => col(s"`$c`")).toSeq :+
        col("_b.id").as(centroidIdCol) :+
        col("_b.score").as("centroid_sim"): _*)
    if (keepSim) out else out.drop("centroid_sim")
  }

  /** IVF top-k search: probe the `nProbe` nearest cells per query, then
    * brute-force only within those cells. `assigned` = ivfAssign output.
    */
  def ivfTopK(queries: DataFrame, assigned: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int,
      centroidIdCol: String = "centroid_id"): DataFrame = {
    val cents = broadcast(centroids.select(
      col(idCol).as(centroidIdCol), col(vecCol).as("_centv")))
    val qProbes = broadcast {
      val scored = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
        .join(cents)
        .withColumn("_sim", round(cosine(col("_qv"), col("_centv")), 6))
      val w = Window.partitionBy("query_id")
        .orderBy(col("_sim").desc, col(centroidIdCol).asc)
      scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= nProbe)
        .select(col("query_id"), col("_qv"), col(centroidIdCol))
    }
    val c = assigned.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      col(centroidIdCol))
    val scored = qProbes.join(c, Seq(centroidIdCol))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("_qv"), col("_cv")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .select("query_id", "neighbor_id", "sim")
  }

  // ------------------------------------------------- k-means refinement

  /** One k-means recompute step over an `ivfAssign` output: each
    * centroid becomes the per-dimension MEAN of its members.
    * Distributed shape: posexplode to (cell, dim, value) rows → one
    * aggregation keyed on (cell, dim) with map-side partial sums →
    * re-assemble the vector. Arithmetic is engine-reproducible: member
    * components round to 6dp and accumulate as DECIMAL(18,6) (exact,
    * order-independent), then one double division and a final 6dp
    * round — so refined centroids, and every cosine computed against
    * them, hash-match the DuckDB oracle.
    */
  def kmeansRecompute(assigned: DataFrame, vecCol: String,
      centroidIdCol: String = "centroid_id"): DataFrame = {
    val dec = DecimalType(18, 6)
    assigned
      .select(col(centroidIdCol), posexplode(col(vecCol)))
      .select(col(centroidIdCol), col("pos"),
        round(col("col").cast(DoubleType), 6).cast(dec).as("_v"))
      .groupBy(col(centroidIdCol), col("pos"))
      .agg(round(sum(col("_v")).cast(DoubleType) / count(lit(1)), 6).as("_m"))
      .groupBy(col(centroidIdCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("_m")))),
        s => s.getField("_m")).as(vecCol))
  }

  /** Train IVF centroids from scratch in the k ≈ √N regime that keeps
    * within-cell pair expansion bounded (the [[semanticDedup]] /
    * [[nearDupPairs]] scale contract — see SCALE.md: a cell's pair
    * count is (N/k)², so k ~ √N holds the per-cell work at ~N and the
    * whale-cell stress case survives). With `k = None` the count is
    * taken once (one scalar job — k parameterizes plan construction)
    * and k = ⌈√N⌉; callers who already know their corpus size pass k
    * explicitly and skip the count. At 100 TB that matters: auto-k
    * costs one extra corpus scan (count) on top of the seed pick and
    * the assignment passes — corpus snapshots carry their row count
    * in metadata, so production callers should pass `k` from there.
    *
    * Seeds are a DETERMINISTIC hash-ordered sample: the k rows with
    * the smallest md5(id ∥ "#seed" ∥ salt) — reproducible across runs,
    * partitionings and engines (the stratifiedSample md5 contract),
    * implemented as a TakeOrdered(k) (no full sort materializes).
    * Centroid ids are 0..k−1 in hash order. Each refinement round is
    * one [[ivfAssign]] + one exact-decimal [[kmeansRecompute]]; cells
    * that lose all members drop out (k can shrink — standard k-means
    * behavior, harmless for bucketing).
    *
    * Returns (idCol, vecCol) — the shape [[semanticDedup]] and the
    * `ivf*` family take as their `centroids` argument.
    */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      k: Option[Int] = None, rounds: Int = 1, salt: String = ""): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0: $rounds")
    val kk = k.getOrElse {
      val n = corpus.count()
      math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
    }
    require(kk >= 1, s"k must be >= 1: $kk")
    val hash = graft.functions.TextAnalysis.md5Long(
      concat(col(idCol).cast(StringType), lit("#seed" + salt)))
    val picked = corpus.select(col(idCol), col(vecCol))
      .withColumn("_h", hash)
      .orderBy(col("_h"), col(idCol))
      .limit(kk)
    // k rows total: the id-assignment window runs on a k-sized frame
    val w = Window.orderBy(col("_h"), col(idCol))
    var cents = picked
      .select((row_number().over(w) - 1).cast(LongType).as(idCol),
        col(vecCol))
    for (_ <- 1 to rounds) {
      val assigned = ivfAssign(corpus, cents, idCol, vecCol)
      cents = kmeansRecompute(assigned, vecCol)
        .withColumnRenamed("centroid_id", idCol)
    }
    cents
  }

  /** [[semanticDedup]] with self-trained centroids in the safe k ≈ √N
    * regime — the default entry point when the caller has no index:
    * one [[trainCentroids]] pass (auto-k unless given), centroids
    * pinned (they broadcast into both the assignment and the scoring
    * join), then the standard dominance dedup.
    */
  def semanticDedupAuto(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, k: Option[Int] = None, rounds: Int = 1): DataFrame = {
    val cents = graft.Caches.own(
      trainCentroids(corpus, idCol, vecCol, k, rounds))
    semanticDedup(corpus, cents, idCol, vecCol, threshold)
  }

  /** IVF with one k-means refinement: assign to the seed centroids,
    * recompute each cell's mean, re-assign against the refined
    * centroids. Returns the final (id, centroid_id) assignment; more
    * iterations = more calls (each is two shuffles + a broadcast).
    */
  def kmeansRefineAssign(corpus: DataFrame, seeds: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val a1 = ivfAssign(corpus, seeds, idCol, vecCol)
    val refined = kmeansRecompute(a1, vecCol)
      .withColumnRenamed("centroid_id", idCol)
    ivfAssign(corpus, refined, idCol, vecCol)
      .select(col(idCol), col("centroid_id"))
  }

  // --------------------------------------- signed random projections (LSH)

  /** Deterministic ±1 hyperplanes for signed-random-projection LSH:
    * component i of hyperplane b is +1 when the top bit of
    * md5("hp:b:i") is 0, else −1 — reproducible in any engine with
    * md5, so the DuckDB oracle embeds the identical constants.
    */
  def srpHyperplanes(bits: Int, dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until bits).map { b =>
      (0 until dim).map { i =>
        md.reset()
        val d = md.digest(s"hp:$b:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if ((d(0) & 0x80) == 0) 1.0 else -1.0
      }
    }
  }

  /** SRP near-dup pairs — the second cosine scale path next to IVF
    * bucketing: `bits` sign-of-projection bits per vector (sign of the
    * dot with a fixed hyperplane ≡ sign of the native cosine — one
    * codegen'd kernel call per bit), banded into `bands` integer keys;
    * only band collisions become candidates (posting-list expansion,
    * no self-join), then candidates verify with exact cosine ≥
    * threshold. Output = verified candidates: deterministic and
    * oracle-checkable; recall rises with `bands` (collision
    * probability per band is (1 − θ/π)^(bits/bands)).
    */
  def srpNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, bits: Int = 16, bands: Int = 4): DataFrame = {
    require(bits % bands == 0, "bits must divide into bands")
    val r = bits / bands
    val hps = srpHyperplanes(bits, dim)
    val bitCols = hps.map(hp =>
      when(cosine(col(vecCol), typedLit(hp)) > 0, 1).otherwise(0))
    val keyCols = (0 until bands).map { k =>
      (0 until r).map(j => bitCols(k * r + j) * (1 << j)).reduce(_ + _)
    }
    val banded = corpus
      .select(col(idCol).as("_id"), array(keyCols: _*).as("_keys"))
      .select(col("_id"), posexplode(col("_keys")))
      .select(col("_id"), col("pos").as("_band"), col("col").as("_key"))
    val cand = Dedup.bucketPairs(banded)
    val vecs = corpus.select(col(idCol).as("_vid"), col(vecCol).as("_v"))
    cand
      .join(vecs.select(col("_vid").as("id1"), col("_v").as("_v1")), "id1")
      .join(vecs.select(col("_vid").as("id2"), col("_v").as("_v2")), "id2")
      .withColumn("sim", round(cosine(col("_v1"), col("_v2")), 6))
      .filter(col("sim") >= threshold)
      .select("id1", "id2", "sim")
  }

  // ------------------------------------------------- recall evaluation

  /** Recall@k of an approximate top-k result against exact ground
    * truth: per query, |approx ∩ truth| / k. Both inputs are
    * (query_id, neighbor_id, ...) top-k frames (e.g. [[ivfTopK]] vs
    * [[bruteForceTopK]] with the same k). The semi-join keys on
    * (query, neighbor) pairs — truth is k rows per query, so both
    * sides are tiny relative to the corpus that produced them.
    */
  def recallAtK(truth: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val hits = truth.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    truth.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall", round(col("n_hits").cast(DoubleType) / k, 6))
  }

  /** Ranking-quality evaluation for the retrieval family — the eval
    * half of the ANN/BM25 story, next to [[recallAtK]]: per query,
    * MRR and NDCG@k of a predicted ranking against graded relevance.
    *
    * `ranked` is a per-query candidate frame (query_id, neighbor_id,
    * `scoreCol`) as produced by [[bruteForceTopK]]/[[ivfTopK]] or a
    * BM25-style scorer — ranks derive from (score desc, neighbor_id
    * asc), truncated at k. `truth` is (query_id, neighbor_id, rel)
    * graded relevance; pairs absent from it count rel 0. Output per
    * query: mrr (1/rank of the first relevant hit, 0 if none), dcg,
    * idcg (the ideal DCG of the query's own truth set truncated at
    * k), ndcg (0 when the query has no relevant docs at all).
    *
    * Engine-reproducible arithmetic (the established oracle
    * contract): per-position discounts 1/log2(rank+1) round to 9dp
    * BEFORE use, contributions round to 9dp and accumulate as
    * DECIMAL(18,9) — exact and order-independent — and the final
    * metrics are one double division + a 6dp round. Scale shape: two
    * windows partitioned by query (both frames are top-k / truth
    * sized, not corpus sized) and one broadcast-friendly join keyed
    * (query, neighbor); nothing corpus-scale moves.
    */
  def rankingMetrics(ranked: DataFrame, truth: DataFrame, scoreCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val dec = DecimalType(18, 9)
    def disc(rank: Column): Column = round(lit(1.0) / log2(rank + 1), 9)
    val wPred = Window.partitionBy("query_id")
      .orderBy(col(scoreCol).desc, col("neighbor_id").asc)
    val rels = truth.select(col("query_id"), col("neighbor_id"),
      col("rel").cast(DoubleType).as("_tr"))
    val pred = ranked
      .withColumn("_rn", row_number().over(wPred)).filter(col("_rn") <= k)
      .join(rels, Seq("query_id", "neighbor_id"), "left")
      .withColumn("_rel", coalesce(col("_tr"), lit(0.0)))
    val perQuery = pred.groupBy("query_id").agg(
      sum(round(col("_rel") * disc(col("_rn")), 9).cast(dec)).as("_dcg"),
      min(when(col("_rel") > 0, col("_rn"))).as("_frank"))
    val wIdeal = Window.partitionBy("query_id")
      .orderBy(col("_tr").desc, col("neighbor_id").asc)
    val ideal = rels.filter(col("_tr") > 0)
      .withColumn("_rn", row_number().over(wIdeal)).filter(col("_rn") <= k)
      .groupBy("query_id")
      .agg(sum(round(col("_tr") * disc(col("_rn")), 9).cast(dec)).as("_idcg"))
    ranked.select("query_id").distinct()
      .join(perQuery, Seq("query_id"), "left_outer")
      .join(ideal, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        round(coalesce(lit(1.0) / col("_frank"), lit(0.0)), 6).as("mrr"),
        round(coalesce(col("_dcg").cast(DoubleType), lit(0.0)), 6).as("dcg"),
        round(coalesce(col("_idcg").cast(DoubleType), lit(0.0)), 6).as("idcg"),
        when(col("_idcg").isNotNull && col("_idcg") > 0,
          round(col("_dcg").cast(DoubleType) / col("_idcg").cast(DoubleType), 6))
          .otherwise(lit(0.0)).as("ndcg"))
  }

  // ------------------------------------------------- int8 quantization

  /** Symmetric per-vector int8 quantization: scale = max |component|,
    * code_i = round(x_i / scale × 127) ∈ [−127, 127] — the 4×-storage
    * compression step before an ANN index build. Long-form output
    * (id, idx, code) so every code is an exact integer the oracle can
    * reproduce; all arithmetic is double with a fixed operand order
    * (cast → divide → scale → round), so codes are engine-identical.
    * Per-row only — no shuffle.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val xs = asDouble(col(vecCol))
    df.select(col(idCol),
        array_max(transform(xs, x => abs(x))).as("_scale"),
        posexplode(xs).as(Seq("_pos", "_x")))
      .select(col(idCol), col("_pos").cast(LongType).as("idx"),
        when(col("_scale") > 0,
          round(col("_x") / col("_scale") * 127, 0)).otherwise(lit(0.0))
          .cast(LongType).as("code"))
  }

  /** Embedding near-duplicate pairs: corpus×corpus cosine ≥ threshold.
    * Bucketed via IVF cells when `centroids` given (pairs only within a
    * cell — the LSH-style scale path); exact all-pairs otherwise (only
    * for small corpora / within-partition use).
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, centroids: Option[DataFrame] = None): DataFrame = {
    val base = centroids match {
      case Some(cents) =>
        // blocked like dominanceKept: a whale cell's pairs would land
        // in one join task otherwise (output-skew AQE can't see)
        val assigned = ivfAssign(corpus, cents, idCol, vecCol)
        val a = assigned.select(col("centroid_id"), col(idCol).as("id1"),
          col(vecCol).as("_v1"))
          .withColumn("_blk", pmod(graft.functions.TextAnalysis.md5Long(
            col("id1").cast(StringType)), lit(DominanceBlocks.toLong)))
        val b = assigned.select(col("centroid_id"), col(idCol).as("id2"),
          col(vecCol).as("_v2"))
          .withColumn("_blk",
            explode(sequence(lit(0L), lit(DominanceBlocks - 1L))))
        a.join(b, Seq("centroid_id", "_blk")).filter(col("id1") < col("id2"))
      case None =>
        val a = corpus.select(col(idCol).as("id1"), col(vecCol).as("_v1"))
        val b = corpus.select(col(idCol).as("id2"), col(vecCol).as("_v2"))
        a.join(b, col("id1") < col("id2"))
    }
    // unrounded prefilter first (superset margin 1e-6 > the exact
    // 5e-7 rounding boundary): only near/above-threshold pairs pay the
    // BigDecimal round — at pair-expansion volumes the exact round
    // per pair is the dominant cost, not the cosine
    val rawCos = cosine(col("_v1"), col("_v2"))
    base.filter(rawCos >= lit(threshold - 1e-6))
      .withColumn("sim", round(cosine(col("_v1"), col("_v2")), 6))
      .filter(col("sim") >= threshold)
      .select("id1", "id2", "sim")
  }

  /** SemDeDup-style semantic deduplication (public method: Abbas et al.
    * 2023, arXiv:2303.09540): IVF-assign every vector, then within each
    * cell drop a vector iff it has a cosine-≥-threshold neighbor of
    * higher keep priority. Keep priority follows the paper — among
    * semantic duplicates the example with the LOWEST similarity to the
    * cluster centroid survives (edge points preserve diversity) — with
    * ids breaking ties, which makes the rule a total order and the
    * verdict single-pass (a dominance check, not connected components:
    * no iteration, no transitive closure).
    *
    * Returns one row per corpus vector: (id, centroid_id, centroid_sim,
    * kept 0/1). Scale shape: centroids broadcast; one shuffle on
    * centroid_id for the within-cell self-join (pair expansion bounded
    * by cell population, the same regime as [[nearDupPairs]]'s bucketed
    * branch); one aggregation keyed on the vector id. The corpus never
    * all-pairs joins.
    */
  def semanticDedup(corpus: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame =
    semanticDedupWithCache(corpus, centroids, idCol, vecCol, threshold)._1

  /** [[semanticDedup]] plus the persisted cell-assignment intermediate
    * it pins, so plan-splicing callers (the SQL TVF) can key their memo
    * on whether that cache is still live instead of re-persisting a
    * fresh copy per analysis.
    */
  private[graft] def semanticDedupWithCache(corpus: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String,
      threshold: Double): (DataFrame, DataFrame) = {
    // both self-join sides reference the assignment — persist it once
    // (Catalyst does not share subplans, so an uncached frame would
    // run the centroid-scoring pass and its window twice)
    val assigned = graft.Caches.own(
      ivfAssign(corpus, centroids, idCol, vecCol, keepSim = true)
        .select(col(idCol), col(vecCol), col("centroid_id"),
          col("centroid_sim")))
    (dominanceKept(assigned, idCol, vecCol, threshold), assigned)
  }

  /** The dominance verdict over an already-assigned frame (columns:
    * idCol, vecCol, centroid_id, centroid_sim) — [[semanticDedup]]'s
    * within-cell keep rule, shared with the streaming ingest sink's
    * within-batch check. Caller is responsible for persisting
    * `assigned` when the scoring pass is expensive (both self-join
    * sides reference it).
    */
  /** Per-(cell, block) parallelism for the within-cell pair scan: a
    * whale cell's pairs otherwise land in ONE join task (the cell id
    * is the only key), and AQE's skew split never fires because the
    * skew is in the OUTPUT pair count, not the input bytes. The a-side
    * hashes into `DominanceBlocks` blocks; the b-side replicates to
    * every block, so each of the cell's blocks scans |cell|/P × |cell|
    * pairs. Replication cost: the b-side exchange grows ×P — corpus
    * rows, not pairs.
    */
  private val DominanceBlocks = 32

  private[graft] def dominanceKept(assigned: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    val a = assigned.select(col("centroid_id"), col(idCol).as("_id"),
      col(vecCol).as("_v"), col("centroid_sim").as("_cs"))
      .withColumn("_blk", pmod(graft.functions.TextAnalysis.md5Long(
        col("_id").cast(StringType)), lit(DominanceBlocks.toLong)))
    val b = assigned.select(col("centroid_id"), col(idCol).as("_nid"),
      col(vecCol).as("_nv"), col("centroid_sim").as("_ncs"))
      .withColumn("_blk",
        explode(sequence(lit(0L), lit(DominanceBlocks - 1L))))
    // inner join: every row's own cell/block contains at least itself
    // (the b-side is unfiltered and replicated to all blocks), so
    // singleton cells still surface and resolve to kept. Predicate
    // order matters at whale-cell pair counts: the id/centroid-sim
    // comparisons prune ~half the pairs for free, the UNROUNDED cosine
    // prefilter (superset margin 1e-6 > the exact 5e-7 boundary) drops
    // the sub-threshold mass, and only the survivors pay the exact
    // BigDecimal `round(..., 6)` contract — measured ~200 ns/pair,
    // which at 3.6B whale-cell pairs was 13 MINUTES single-task before
    // this ordering + blocking.
    val rawCos = cosine(col("_v"), col("_nv"))
    a.join(b, Seq("centroid_id", "_blk"))
      .withColumn("_dominated",
        when(col("_nid") =!= col("_id") &&
          (col("_ncs") < col("_cs") ||
            (col("_ncs") === col("_cs") && col("_nid") < col("_id"))) &&
          rawCos >= lit(threshold - 1e-6) &&
          round(rawCos, 6) >= threshold,
          1).otherwise(0))
      .groupBy(col("_id").as(idCol), col("centroid_id"), col("_cs"))
      .agg((max(col("_dominated")) === 0).cast(IntegerType).as("kept"))
      .withColumnRenamed("_cs", "centroid_sim")
  }

  // ---------------------------------------------- product quantization

  /** Squared L2 via the native codegen'd kernel (graft.expr.L2SqDistance,
    * registered by Graft.tune).
    */
  def l2sq(a: Column, b: Column): Column =
    call_function(graft.expr.VecDistance.L2SqName, a, b)

  /** Dot product via the native codegen'd kernel (vs the composed
    * [[dot]]: same result, stays in WholeStageCodegen).
    */
  def dotNative(a: Column, b: Column): Column =
    call_function(graft.expr.VecDistance.DotName, a, b)

  /** (id, sub, x): the m subvector slices of `vecCol`. `sd` = dim/m;
    * slice keeps the source element type (float subvectors stay float
    * — the native kernels cast per element).
    */
  private def pqSubvecs(df: DataFrame, idCol: String, vecCol: String,
      m: Int, sd: Int): DataFrame =
    df.select(col(idCol), col(vecCol),
        explode(sequence(lit(0L), lit(m - 1L))).as("sub"))
      .select(col(idCol), col("sub"),
        slice(col(vecCol), (col("sub") * sd + 1).cast(IntegerType),
          lit(sd)).as("_x"))

  /** Nearest codeword per (row, subspace): argmin of 6dp-rounded
    * squared L2, ties to the lowest code — MAP-ONLY via the native
    * graft.expr.VecArgminL2 scan over the per-subspace codebook array
    * (broadcast m rows). No N·m·k candidate expansion exists as rows;
    * the earlier aggregate form planned as SortAggregate (struct/array
    * buffers aren't UnsafeRow-mutable) and sorted the expansion —
    * measured 15–67 s per pass at 50×/k=256 vs ~2 s map-only. The
    * subvector rides along in the same row, so the training recompute
    * needs no second pass and no re-join.
    */
  private def pqAssign(sv: DataFrame, codebooks: DataFrame,
      idCol: String): DataFrame = {
    requireIntegralId(codebooks, "code", "pqAssign")
    val cbBySub = broadcast(codebooks.groupBy(col("sub")).agg(collect_list(
      struct(col("code").cast(LongType).as("_cid"),
        col("cw").as("_cv"))).as("_cb")))
    sv.join(cbBySub, Seq("sub"))
      .withColumn("_b", call_function(graft.expr.VecArgmin.ArgminL2Name,
        col("_x"), col("_cb")))
      .filter(col("_b").isNotNull)
      .select(col(idCol), col("sub"), col("_b.id").as("code"), col("_x"))
  }

  /** Train per-subspace PQ codebooks: the vector splits into `m`
    * subvectors of dim/m; each subspace gets `k` codewords via
    * deterministic-seed k-means (hash-ordered seed rows shared across
    * subspaces — the [[trainCentroids]] md5 contract — then `rounds`
    * L2-assignment + exact-decimal-mean refinements).
    *
    * Returns (sub, code, cw: array<double>) — m·k rows, broadcastable
    * by construction. This is the 100 TB ANN memory play: a 64-dim
    * float vector (256 B) compresses to m codes (m bytes at k ≤ 256),
    * and ADC scoring reads codes + a per-query LUT instead of vectors.
    * Arithmetic contract matches the IVF family: distances compare at
    * 6dp with code-ascending ties; means accumulate 6dp components in
    * DECIMAL(18,6) then round to 6dp — engine-reproducible end to end.
    */
  def pqTrainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int, rounds: Int = 1,
      salt: String = ""): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim ($dim) must split evenly into m ($m)")
    require(k >= 1 && rounds >= 0, s"need k >= 1 and rounds >= 0")
    val sd = dim / m
    val hash = graft.functions.TextAnalysis.md5Long(
      concat(col(idCol).cast(StringType), lit("#pqseed" + salt)))
    val picked = corpus.select(col(idCol), col(vecCol))
      .withColumn("_h", hash)
      .orderBy(col("_h"), col(idCol))
      .limit(k)
    // k rows total: the code-assignment window runs on a k-sized frame
    val w = Window.orderBy(col("_h"), col(idCol))
    val seedRows = picked.select(
      (row_number().over(w) - 1).cast(LongType).as("code"), col(vecCol))
    var cb = pqSubvecs(seedRows, "code", vecCol, m, sd)
      .select(col("sub"), col("code"), asDouble(col("_x")).as("cw"))
    val sv = pqSubvecs(corpus, idCol, vecCol, m, sd)
    val dec = DecimalType(18, 6)
    for (_ <- 1 to rounds) {
      cb = pqAssign(sv, cb, idCol)
        .select(col("sub"), col("code"), posexplode(col("_x")))
        .select(col("sub"), col("code"), col("pos"),
          round(col("col").cast(DoubleType), 6).cast(dec).as("_v"))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(round(sum(col("_v")).cast(DoubleType) / count(lit(1)), 6).as("_m"))
        .groupBy(col("sub"), col("code"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("_m")))),
          s => s.getField("_m")).as("cw"))
    }
    cb
  }

  /** PQ-encode a corpus against trained codebooks: (id, sub, code) —
    * m rows per vector, the compressed index representation. One
    * broadcast-join pass, argmin as an aggregate.
    */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame, idCol: String,
      vecCol: String, dim: Int, m: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim ($dim) must split evenly into m ($m)")
    pqAssign(pqSubvecs(corpus, idCol, vecCol, m, dim / m), codebooks, idCol)
      .select(col(idCol), col("sub"), col("code"))
  }

  /** Asymmetric-distance (ADC) top-k over a PQ-encoded corpus: each
    * query builds an m·k lookup table of 6dp-rounded subspace dot
    * products against the codewords (exact query × quantized doc —
    * MIPS-style scoring); a doc's score is the DECIMAL-exact sum of
    * its m LUT entries. The corpus side never touches vectors — only
    * (id, sub, code) rows join the broadcast LUT, so the scan is
    * byte-cheap at any corpus size; per-query top-k with id-ascending
    * ties. Returns (query_id, neighbor_id, score).
    */
  def pqTopK(queries: DataFrame, encoded: DataFrame, codebooks: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int, m: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim ($dim) must split evenly into m ($m)")
    val lut = broadcast(
      pqSubvecs(queries.select(col(idCol).as("query_id"), col(vecCol)),
          "query_id", vecCol, m, dim / m)
        .join(codebooks, Seq("sub"))
        .select(col("query_id"), col("sub"), col("code"),
          round(dotNative(col("_x"), col("cw")), 6)
            .cast(DecimalType(18, 6)).as("_part")))
    val scored = encoded.join(lut, Seq("sub", "code"))
      .filter(col("query_id") =!= col(idCol))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("_part")).as("_s"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col("_s").cast(DoubleType).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .select("query_id", "neighbor_id", "score")
  }

  /** IVF+PQ index — the production ANN layout: each vector gets its
    * cosine cell (partition/cluster key) AND its m PQ codes, in ONE
    * map-only pass (both assignments are broadcast-codebook argmin
    * expressions; no joins between corpus-sized sides). Returns
    * (id, centroid_id, sub, code) — m rows per vector, no vector
    * column: at 100 TB this table is ~1% of the corpus bytes and is
    * what gets partitioned by cell and scanned at query time.
    */
  def pqIndex(corpus: DataFrame, centroids: DataFrame, codebooks: DataFrame,
      idCol: String, vecCol: String, dim: Int, m: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim ($dim) must split evenly into m ($m)")
    requireIntegralId(codebooks, "code", "pqIndex")
    val sd = dim / m
    val cbBySub = broadcast(codebooks.groupBy(col("sub")).agg(collect_list(
      struct(col("code").cast(LongType).as("_cid"),
        col("cw").as("_cv"))).as("_cb")))
    ivfAssign(corpus, centroids, idCol, vecCol)
      .select(col(idCol), col("centroid_id"), col(vecCol),
        explode(sequence(lit(0L), lit(m - 1L))).as("sub"))
      .select(col(idCol), col("centroid_id"), col("sub"),
        slice(col(vecCol), (col("sub") * sd + 1).cast(IntegerType),
          lit(sd)).as("_x"))
      .join(cbBySub, Seq("sub"))
      .withColumn("_b", call_function(graft.expr.VecArgmin.ArgminL2Name,
        col("_x"), col("_cb")))
      .filter(col("_b").isNotNull)
      .select(col(idCol), col("centroid_id"), col("sub"),
        col("_b.id").as("code"))
  }

  /** IVF+PQ (ADC) top-k: probe the `nProbe` nearest cells per query,
    * then ADC-score ONLY the index rows of those cells — the FAISS
    * IVFPQ search shape. The scanned fraction is ~nProbe/k of an
    * already vector-free index; with the index table partitioned by
    * `centroid_id`, partition pruning does the probe selection for
    * free. Same scoring contract as [[pqTopK]] (6dp LUT entries,
    * DECIMAL-exact m-entry sums, ties by neighbor id).
    */
  def ivfPqTopK(queries: DataFrame, index: DataFrame, centroids: DataFrame,
      codebooks: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int, dim: Int, m: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim ($dim) must split evenly into m ($m)")
    requireIntegralId(queries, idCol, "ivfPqTopK")
    requireIntegralId(centroids, idCol, "ivfPqTopK")
    requireIntegralId(codebooks, "code", "ivfPqTopK")
    val spark = index.sparkSession
    val cents = broadcast(centroids.select(
      col(idCol).cast(LongType).as("centroid_id"), col(vecCol).as("_centv")))
    // The probe set is computed EAGERLY (one tiny job: queries ×
    // centroids, both broadcast-small by contract) so the probed cell
    // ids become a STATIC isin filter on the index — guaranteed
    // partition pruning on a cell-partitioned index. The lazy
    // alternative (joining an in-plan probe frame) leaves pruning to
    // dynamic partition pruning, whose cost heuristic silently
    // no-ops without catalog stats (observed: the planned filter
    // degraded to dynamicpruningexpression(true) and the scan read
    // every cell). This is also how IVF serving works operationally:
    // the coordinator resolves probes, then fetches only those cells.
    // Cost: Q·nProbe ids on the driver — bounded by the same
    // "queries are broadcastable" contract the LUT already assumes.
    val probeRows = {
      val scored = queries
        .select(col(idCol).cast(LongType).as("query_id"), col(vecCol).as("_qv"))
        .join(cents)
        .withColumn("_sim", round(cosine(col("_qv"), col("_centv")), 6))
      val w = Window.partitionBy("query_id")
        .orderBy(col("_sim").desc, col("centroid_id").asc)
      scored.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= nProbe)
        .select(col("query_id"), col("centroid_id"))
        .collect()
    }
    val qProbes = broadcast {
      import spark.implicits._
      probeRows.toSeq.map(r => (r.getLong(0), r.getLong(1)))
        .toDF("query_id", "centroid_id")
    }
    val cells = probeRows.map(_.getLong(1)).distinct.toSeq
    val pruned = index.filter(col("centroid_id").isin(cells: _*))
    // query_id is cast to long HERE exactly as in the probe frame
    // above — the join on (query_id, sub, code) must compare the same
    // type on both sides, not lean on implicit coercion (which, for a
    // non-long id, puts the cast on a join side asymmetrically; the
    // requireIntegralId guard plus this symmetric cast make the
    // family consistent: ids are long everywhere downstream).
    val lut = broadcast(
      pqSubvecs(queries.select(col(idCol).cast(LongType).as("query_id"),
          col(vecCol)),
          "query_id", vecCol, m, dim / m)
        .join(codebooks, Seq("sub"))
        .select(col("query_id"), col("sub"), col("code"),
          round(dotNative(col("_x"), col("cw")), 6)
            .cast(DecimalType(18, 6)).as("_part")))
    val scored = pruned.join(qProbes, Seq("centroid_id"))
      .filter(col("query_id") =!= col(idCol))
      .join(lut, Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("_part")).as("_s"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col("_s").cast(DoubleType).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .select("query_id", "neighbor_id", "score")
  }

  /** Train → encode → search in one call, codebooks pinned (they feed
    * both the encode pass and the LUT). The no-index entry point.
    */
  def pqSearch(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, m: Int = 4, codebookSize: Int = 16,
      rounds: Int = 1): DataFrame = {
    val cb = graft.Caches.own(
      pqTrainCodebooks(corpus, idCol, vecCol, dim, m, codebookSize, rounds))
    pqTopK(queries, pqEncode(corpus, cb, idCol, vecCol, dim, m), cb,
      idCol, vecCol, k, dim, m)
  }
}

package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document deduplication for the training-data pipeline surface:
  * exact, n-gram Jaccard (inverted index), MinHash+LSH, SimHash.
  *
  * Scale notes (the 100 TB story):
  *  - Exact dedup is one hash-groupBy — a single shuffle on a 32-char
  *    key, with map-side partial aggregation.
  *  - Jaccard all-pairs is never computed as a cross join: an inverted
  *    index on shingles turns it into a self-equi-join that only pairs
  *    documents sharing at least one shingle. Ultra-frequent shingles
  *    (the skew risk) can be dropped with `maxDocFreq` — standard
  *    posting-list pruning.
  *  - MinHash+LSH bounds candidate generation: b bands of r hashes;
  *    only documents colliding in a band are paired, then candidates
  *    are verified with exact Jaccard. Band buckets shuffle by
  *    (band, key) — uniform by construction.
  *  - SimHash reduces a document to a 60-bit integer; near-dups are
  *    found by banding the bits (pigeonhole: hamming ≤ bands-1 ⟹ some
  *    band equal) and verifying with `bit_count(xor)`.
  *
  * Expression-shape notes (hot-path critical): higher-order functions
  * (transform/filter/aggregate) are NOT whole-stage-codegen'd, and any
  * subexpression referenced inside their lambdas is re-evaluated per
  * element. Tokens, shingle sets, signatures and hash arrays are
  * therefore materialized as their OWN projections (CollapseProject
  * keeps a projection when an expensive alias is referenced more than
  * once) so each derivation is computed once per row, never once per
  * array element. Inlining the tokenizer into the shingle lambda makes
  * the whole stage O(len²) per document — measured 600+ s vs ~10 s on
  * the sf0.1 corpus.
  *
  * Hash choice: `hashFn` defaults to xxhash64 (fastest, fine whenever
  * the hash is internal, e.g. MinHash candidates that get re-verified
  * with exact Jaccard). Use `md5Hash` when the hash VALUE is the
  * observable output that must reproduce outside the JVM (SimHash
  * fingerprints checked by the DuckDB oracle).
  */
object Dedup {

  type HashFn = (Column, Int) => Column

  /** md5-derived 60-bit hash — engine-portable (oracle-checkable). */
  val md5Hash: HashFn = (c, seed) =>
    TextAnalysis.md5Long(concat(c, lit("#" + seed)))

  /** xxhash64-based hash — fastest on-cluster choice. */
  val xxHash: HashFn = (c, seed) => xxhash64(c, lit(seed))

  // ---------------------------------------------------------------- exact

  /** Exact-duplicate groups: fingerprint → (canonical id, dup count).
    * One shuffle; map-side combine.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"), col(idCol))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** Keep one canonical row per exact-duplicate group. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Merges.dedupKeepLatest(
      df.withColumn("_fp", TextAnalysis.fingerprint(col(textCol))),
      "_fp", Seq(-col(idCol))).drop("_fp")

  // --------------------------------------------- shingle-set materialization

  /** (_id, _sh) with the distinct word-n-gram set, via the native
    * one-pass expression (graft.expr.WordShingles, registered by
    * Graft.tune) — identical strings to the composed
    * tokens→transform→distinct form, ~50× cheaper per row.
    */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("_id"),
      call_function(graft.expr.WordShingles.FunctionName,
        col(textCol), lit(n)).as("_sh"))

  // ------------------------------------------------- n-gram Jaccard pairs

  /** Exact all-pairs n-gram Jaccard ≥ threshold via inverted shingle
    * index. Returns (id1, id2, jaccard) with id1 < id2.
    * `maxDocFreq`: drop shingles appearing in more than this many docs
    * (0 = keep all) to kill posting-list skew at scale.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double, maxDocFreq: Long = 0L): DataFrame =
    pairCounts(df, idCol, textCol, n, maxDocFreq)
      .withColumn("jaccard",
        round(col("_common").cast(DoubleType) /
          (col("_n1") + col("_n2") - col("_common")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")

  /** Near-SUBSET detection: pairs whose n-gram CONTAINMENT
    * |A ∩ B| / min(|A|, |B|) clears the threshold — catches a short
    * document quoted/embedded inside a long one, which Jaccard misses
    * (the union term dilutes asymmetric overlap: a 50-shingle doc fully
    * contained in a 5000-shingle doc has jaccard ≈ 0.01 but
    * containment 1.0). The quote/boilerplate-absorption signal of a
    * curation pipeline. Same inverted-index shape and skew cap as
    * [[jaccardPairs]].
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double, maxDocFreq: Long = 0L): DataFrame =
    pairCounts(df, idCol, textCol, n, maxDocFreq)
      .withColumn("containment",
        round(col("_common").cast(DoubleType) / least(col("_n1"), col("_n2")), 6))
      .filter(col("containment") >= threshold)
      .select("id1", "id2", "containment")

  /** Edit-distance VERIFIED near-dup pairs: candidates from the shared
    * inverted-index kernel (n-gram Jaccard ≥ `candThreshold`, the cheap
    * high-recall stage), then verified with character-level Levenshtein
    * similarity `1 − lev(a,b) / max(|a|,|b|) ≥ simThreshold`. Jaccard
    * over shingle SETS is order- and multiplicity-blind — two documents
    * built from the same vocabulary score high even when the actual
    * texts differ substantially; edit similarity is the
    * order-sensitive confirmation (the MinHash→verify pattern, with a
    * stricter verifier). Returns (id1, id2, edit_sim) with id1 < id2.
    *
    * Scale shape: the quadratic Levenshtein DP runs ONLY on candidate
    * pairs — bounded by the capped inverted index, never all-pairs —
    * and each side's text joins in by id (sort-merge or broadcast by
    * AQE's choice), so nothing corpus-sized is replicated. Per-pair
    * verify cost is O(|a|·|b|) chars; `candThreshold` is the knob that
    * bounds how many pairs pay it.
    */
  def editSimilarityPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, candThreshold: Double, simThreshold: Double,
      maxDocFreq: Long = 0L): DataFrame = {
    val cands = jaccardPairs(df, idCol, textCol, n, candThreshold, maxDocFreq)
      .select("id1", "id2")
    val texts = df.select(col(idCol), col(textCol))
    cands
      .join(texts.select(col(idCol).as("id1"), col(textCol).as("_t1")), "id1")
      .join(texts.select(col(idCol).as("id2"), col(textCol).as("_t2")), "id2")
      .withColumn("edit_sim",
        round(lit(1.0) - levenshtein(col("_t1"), col("_t2")).cast(DoubleType) /
          greatest(length(col("_t1")), length(col("_t2"))), 6))
      .filter(col("edit_sim") >= simThreshold)
      .select("id1", "id2", "edit_sim")
  }

  /** (_id, _n, _s): one posting row per (document, distinct shingle),
    * carrying the document's distinct-shingle COUNT alongside the
    * 64-bit shingle hash. Shuffling the hash instead of the 20-40 byte
    * shingle string cuts exchange volume several-fold; carrying `_n`
    * (4 bytes) means downstream pair counts need no separate set-size
    * join — and therefore no shared, persisted `sets` intermediate. A
    * (vanishingly unlikely) intra-document hash collision cannot change
    * `_n` (it counts the original distinct strings); the id1≠id2 guard
    * in [[pairCounts]] drops any self-pair such a collision fabricates.
    */
  private[graft] def postingsWithSize(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    shingleSets(df, idCol, textCol, n)
      .select(col("_id"), size(col("_sh")).as("_n"), explode(col("_sh")).as("_s0"))
      .select(col("_id"), col("_n"), xxhash64(col("_s0")).as("_s"))

  /** Shared inverted-index core of [[jaccardPairs]] /
    * [[containmentPairs]]: (id1, id2, _common, _n1, _n2) — per-pair
    * common-shingle counts with both documents' distinct-shingle sizes.
    *
    * Exactly two shuffles and ONE pass over the corpus: postings group
    * by shingle hash under the capped native pair aggregate
    * (graft_posting_pairs — bounded buffers, overflow = the maxDocFreq
    * prune), pairs group by (id1, id2). No persisted intermediate: the
    * old three-stage form (collect_list → hot-shingle anti-join →
    * pair expansion → two set-size joins) needed the posting table
    * twice and the shingle sets three times, forcing a MEMORY_AND_DISK
    * persist that outlived the query (the round-3 cache-lifecycle
    * leak).
    */
  private def pairCounts(df: DataFrame, idCol: String, textCol: String,
      n: Int, maxDocFreq: Long): DataFrame =
    pairCountsFromPostings(postingsWithSize(df, idCol, textCol, n), maxDocFreq)

  /** Estimated-size partition floor for the pair aggregation's input —
    * the 100× SCALE.md lesson lifted into code: with partitions pinned
    * at the session default (= cores in local mode), doubling the
    * corpus doubles every task's posting volume and the per-task
    * ObjectHashAggregate state leaves its comfortable regime (measured:
    * 3.7× wall for 2× data at 32 partitions; 1.6× at 64). A real
    * cluster keeps partitions-per-byte constant via per-stage sizing;
    * this keeps the invariant when the session conf doesn't. Sizing
    * reads the LEAF scan bytes of the plan (exact file sizes, free, no
    * extra pass): posting volume tracks source text bytes (~one
    * posting per token), while the plan's own top-level sizeInBytes is
    * useless here — the narrow (id, n, hash) projection makes the
    * width-ratio heuristic collapse the explode fan-out (measured:
    * 1.5 GB of actual posting shuffle estimated under 10 MB, so the
    * floor never engaged). Calibration: the 100× corpus is 119 MB of
    * parquet and wants ≥ 60 partitions → ~2 MB of leaf bytes per
    * partition. Never shrinks below the session setting (small inputs
    * keep their exact plans), capped at 4096; AQE can merge small
    * partitions but cannot split a user-pinned repartition, so
    * over-partitioning is the safe direction — the extra tasks on an
    * already-pruned input (e.g. the bloom-pruned ingest arrival) cost
    * dispatch only.
    */
  private val PairAggLeafBytesPerPartition = 2L * 1024 * 1024

  /** PIN the posting exchange even when the leaf-bytes floor doesn't
    * engage (small inputs): the downstream PostingPairsAgg fans out
    * quadratically per group, and an un-pinned ENSURE_REQUIREMENTS
    * exchange gets AQE-coalesced by its INPUT bytes — the expansion
    * then runs on 1-4 tasks regardless of core count (the bandedPairs
    * lesson; measured r16: q61's expansion stage collapsed to ONE
    * 1.4 s task at sf0.1). A pinned repartition at the session default
    * is what a right-sized cluster stage would use anyway.
    */
  private def scaledOnShingle(p: DataFrame): DataFrame =
    p.repartition(
      Scale.fanoutPartitions(p, PairAggLeafBytesPerPartition), col("_s"))

  private def pairCountsFromPostings(p: DataFrame,
      maxDocFreq: Long): DataFrame =
    scaledOnShingle(p).groupBy("_s")
      .agg(call_function(graft.expr.PostingPairsAgg.FunctionName,
        col("_id"), col("_n"), lit(maxDocFreq)).as("_ps"))
      .filter(col("_ps").isNotNull)
      .select(explode(col("_ps")).as("_p"))
      .filter(col("_p.id1") =!= col("_p.id2"))
      .groupBy(col("_p.id1").as("id1"), col("_p.id2").as("id2"))
      .agg(count(lit(1)).as("_common"),
        min(col("_p.n1")).as("_n1"), min(col("_p.n2")).as("_n2"))

  /** [[jaccardPairs]] over an already-reduced postings frame — the
    * within-batch half of the incremental-ingest dedup (the batch's
    * postings are computed once and serve both this and the
    * cross-corpus check).
    */
  private[graft] def jaccardFromPostings(p: DataFrame,
      threshold: Double, maxDocFreq: Long): DataFrame =
    pairCountsFromPostings(p, maxDocFreq)
      .withColumn("jaccard",
        round(col("_common").cast(DoubleType) /
          (col("_n1") + col("_n2") - col("_common")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")

  /** Cross-corpus near-dup pairs: (a, b) with a FROM `corpusA` and
    * b FROM `corpusB` whose n-gram Jaccard ≥ threshold — the
    * incremental-ingest dedup check (new crawl vs existing corpus, or
    * corpus vs another vendor's dataset). Returns (id_a, id_b,
    * jaccard); id spaces need not be disjoint.
    *
    * Both corpora reduce to (id, |set|, shingle-hash) postings in one
    * pass each, no persisted intermediate (set sizes ride the posting
    * rows, sign-tagged by side so one column carries both).
    *  - capped (`maxDocFreq > 0`, the at-scale configuration): the
    *    tagged postings union into ONE capped pair aggregation — the
    *    cap applies to a shingle's COMBINED document frequency (both
    *    corpora), with bounded buffers instead of the old second
    *    df-counting pass + two anti-joins; cross-side pairs are
    *    filtered out of the expansion by sign.
    *  - uncapped: a plain shuffle hash equi-join of the two posting
    *    tables on the shingle hash — no pair expansion and no
    *    per-group buffering at all, so a hot shingle degrades to extra
    *    join rows, never executor memory.
    */
  def crossJaccardPairs(corpusA: DataFrame, corpusB: DataFrame,
      idCol: String, textCol: String, n: Int, threshold: Double,
      maxDocFreq: Long = 0L): DataFrame =
    crossJaccardFromPostings(
      postingsWithSize(corpusA, idCol, textCol, n),
      postingsWithSize(corpusB, idCol, textCol, n),
      threshold, maxDocFreq)

  /** [[crossJaccardPairs]] over ALREADY-REDUCED postings frames
    * (`(_id, _n, _s)` — the [[postings]] shape): the incremental-ingest
    * form, where side B is a MATERIALIZED posting table (bucketed by
    * `_s`) and only side A's text was shingled this batch. The corpus
    * never re-tokenizes and — when the table is `_s`-bucketed — never
    * re-shuffles: the uncapped branch's equi-join reads the bucketed
    * scan's existing hash partitioning and exchanges only the
    * batch-sized side.
    */
  private[graft] def crossJaccardFromPostings(pa: DataFrame, pb: DataFrame,
      threshold: Double, maxDocFreq: Long): DataFrame = {
    val common =
      if (maxDocFreq <= 0) {
        pa.select(col("_s"), col("_id").as("id_a"), col("_n").as("_na"))
          .join(pb.select(col("_s"), col("_id").as("id_b"), col("_n").as("_nb")), "_s")
          .groupBy("id_a", "id_b")
          .agg(count(lit(1)).as("_common"),
            min(col("_na")).as("_na"), min(col("_nb")).as("_nb"))
      } else {
        // side B's sizes ride negated: one (id, n) pair-expansion
        // kernel serves both the self-join and the cross-corpus case,
        // and the sign filter keeps only cross-side pairs
        val tagged = scaledOnShingle(pa.unionAll(
          pb.select(col("_id"), negate(col("_n")).as("_n"), col("_s"))))
        tagged.groupBy("_s")
          .agg(call_function(graft.expr.PostingPairsAgg.FunctionName,
            col("_id"), col("_n"), lit(maxDocFreq)).as("_ps"))
          .filter(col("_ps").isNotNull)
          .select(explode(col("_ps")).as("_p"))
          .filter((col("_p.n1") > 0) =!= (col("_p.n2") > 0))
          .select(
            when(col("_p.n1") > 0, col("_p.id1")).otherwise(col("_p.id2")).as("id_a"),
            when(col("_p.n1") > 0, col("_p.id2")).otherwise(col("_p.id1")).as("id_b"),
            greatest(col("_p.n1"), col("_p.n2")).as("_na"),
            (-least(col("_p.n1"), col("_p.n2"))).as("_nb"))
          .groupBy("id_a", "id_b")
          .agg(count(lit(1)).as("_common"),
            min(col("_na")).as("_na"), min(col("_nb")).as("_nb"))
      }
    common
      .withColumn("jaccard",
        round(col("_common").cast(DoubleType) /
          (col("_na") + col("_nb") - col("_common")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ----------------------------------------------------------- MinHash/LSH

  /** (_id, _sh, _sig): shingle set + MinHash signature via the native
    * one-pass expression (graft.expr.MinHashSignature, registered by
    * Graft.tune).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int): DataFrame =
    shingleSets(df, idCol, textCol, n)
      .select(col("_id"), col("_sh"),
        call_function(graft.expr.MinHashSignature.FunctionName,
          col("_sh"), lit(numHashes)).as("_sig"))

  /** Explode a signature into one (_id, _band, _key) row per band
    * WITHOUT a higher-order lambda: the generator's child projection
    * evaluates `_sig` exactly once per document; the per-band slice
    * happens per exploded row over an already-materialized array. The
    * lambda form (`transform(sequence(...), b => slice(_sig, ...))`)
    * risks CollapseProject re-inlining the signature expression into
    * the lambda — `bands`× recompute per row, the HOF trap again.
    */
  private def bandRows(sig: DataFrame, bands: Int, r: Int): DataFrame =
    sig.select(col("_id"), col("_sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("_band"))
      .select(col("_id"), col("_band"),
        slice(col("_sig"), col("_band") * r + 1, lit(r)).as("_key"))

  /** Ordered same-bucket pairs from (_band, _key, _id) rows by
    * posting-list expansion — ONE shuffle on the bucket key plus one on
    * the pair, instead of a self-join that evaluates the whole upstream
    * signature pipeline twice. Bucket sizes are bounded by the cluster
    * sizes of true near-duplicates (band keys are ~uniform otherwise),
    * so the per-list quadratic expansion is the candidate count itself.
    */
  private[operators] def bucketPairs(banded: DataFrame): DataFrame =
    // same partitions-per-byte floor as the posting kernels: the
    // band-bucket collect_lists are per-task state that grows with
    // corpus size under a pinned partition count (band rows are
    // fewer than postings, so leaf bytes over-provision — the safe
    // direction). ALWAYS pinned (session default floor): the pair
    // expansion downstream fans out quadratically, and an un-pinned
    // exchange gets AQE-coalesced by its input bytes onto 1-4 tasks
    // (see scaledOnShingle).
    banded.repartition(
        Scale.fanoutPartitions(banded, PairAggLeafBytesPerPartition),
        col("_band"), col("_key"))
      .groupBy(col("_band"), col("_key"))
      .agg(sort_array(collect_list(col("_id"))).as("_ids"))
      .filter(size(col("_ids")) > 1)
      // lazy generator, not explode(graft_pairs(...)): no materialized
      // quadratic pair array per bucket (see expr/OrderedPairsGen)
      .select(call_function(graft.expr.OrderedPairsGen.FunctionName,
        col("_ids")))
      .distinct()

  /** LSH candidate pairs: documents colliding in at least one of `bands`
    * bands (each of `numHashes / bands` rows). Returns (id1, id2).
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    bucketPairs(bandRows(minhashSignatures(df, idCol, textCol, n, numHashes),
      bands, r))
  }

  /** MinHash LSH dedup: candidates verified with exact Jaccard.
    * Returns (id1, id2, jaccard) for verified pairs ≥ threshold.
    *
    * The shingle sets feed three consumers (signature derivation + both
    * verify joins), so they are persisted once — without this the
    * scan→shingle subtree re-runs per consumer, and at 100 TB that is
    * two full extra passes over the corpus. Spill-safe
    * (MEMORY_AND_DISK), caller-released via [[graft.Caches]]; at
    * cluster scale a pre-shingled parquet checkpoint serves the same
    * role.
    */
  def minhashDedupPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val sets = graft.Caches.own(shingleSets(df, idCol, textCol, n))
    val sig = sets.select(col("_id"),
      call_function(graft.expr.MinHashSignature.FunctionName,
        col("_sh"), lit(numHashes)).as("_sig"))
    val cand = bucketPairs(bandRows(sig, bands, r))
    cand
      .join(sets.select(col("_id").as("id1"), col("_sh").as("_sh1")), "id1")
      .join(sets.select(col("_id").as("id2"), col("_sh").as("_sh2")), "id2")
      .withColumn("jaccard", round(
        size(array_intersect(col("_sh1"), col("_sh2"))).cast(DoubleType) /
          size(array_union(col("_sh1"), col("_sh2"))), 6))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  // ------------------------------------------------------- winnowing

  /** Winnowing near-dup pairs: documents sharing at least `minShared`
    * winnow fingerprints (char-`k`-gram hashes thinned by window-`w`
    * minima — graft.expr.WinnowFingerprints). Character-level, so it
    * catches near-dups that word-shingle Jaccard misses (insertions
    * inside words, concatenated tokens).
    *
    * Same posting-list shape as [[jaccardPairs]]: one shuffle on the
    * fingerprint, ordered-pair expansion per posting list, one shuffle
    * on the pair. `maxDocFreq > 0` drops fingerprints present in more
    * docs than the cap — the standard skew guard at corpus scale; note
    * it redefines the count to "shared RARE fingerprints", so shared
    * counts are not comparable across cap settings.
    */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Long, maxDocFreq: Long = 0L): DataFrame = {
    val fps = df.select(col(idCol).as("_id"),
      explode(call_function(graft.expr.WinnowFingerprints.FunctionName,
        col(textCol), lit(k), lit(w))).as("_fp"))
    val kept =
      if (maxDocFreq <= 0) fps
      else {
        // the hot set is bounded by total-fps/cap (every hot
        // fingerprint costs > maxDocFreq rows), so BROADCAST the anti
        // join: the default sort-merge anti sorted the ENTIRE
        // fingerprint table by _fp — measured 41 GB of pure sort
        // spill at 100× for a side that fits in a broadcast. Contract
        // note for extreme scale: total/cap is a LOOSE bound — on a
        // boilerplate-dominated multi-TB corpus with a small cap the
        // hot set itself can outgrow a broadcast; there, raise the
        // cap (hot sets shrink ~linearly) or use [[jaccardPairs]],
        // whose PostingPairsAgg applies the cap INSIDE the aggregate
        // with bounded buffers and no hot-set materialization at all.
        val hot = fps.groupBy("_fp").agg(count(lit(1)).as("_df"))
          .filter(col("_df") > maxDocFreq).select("_fp")
        fps.join(broadcast(hot), Seq("_fp"), "left_anti")
      }
    // pinned even when the floor doesn't engage — the fingerprint
    // lists expand quadratically downstream (see scaledOnShingle;
    // measured r16: this exchange AQE-coalesced to ONE task at sf0.1)
    val pairs = kept.repartition(
        Scale.fanoutPartitions(kept, PairAggLeafBytesPerPartition),
        col("_fp"))
      .groupBy("_fp")
      .agg(sort_array(collect_list(col("_id"))).as("_ids"))
      .filter(size(col("_ids")) > 1)
      // lazy generator, not explode(graft_pairs(...)): no materialized
      // quadratic pair array per list (see expr/OrderedPairsGen)
      .select(call_function(graft.expr.OrderedPairsGen.FunctionName,
        col("_ids")))
    // the pair expansion is the VOLUME amplifier (cap² per shared
    // fingerprint: 405.8M pair rows from 44.7M postings at 100×), and
    // map-side partial aggregation barely collapses it — a pair's
    // occurrences live in different fingerprint groups, hence
    // different partitions. So the pair-count exchange gets its own
    // wider floor (half the posting granularity): the 32-task final
    // agg at 100× spilled 41 GB and took 167 s; widened it is
    // spill-free
    pairs.repartition(
        Scale.fanoutPartitions(pairs, PairAggLeafBytesPerPartition / 2),
        col("id1"), col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  // ------------------------------------------------- near-dup clustering

  /** Connected components over an (id1, id2) pair list. Returns
    * (id, canonical_id = component minimum).
    *
    * Two regimes, because the pair list of an LSH dedup is orders of
    * magnitude smaller than the corpus it came from:
    *  - pair graphs up to `driverThreshold` PAIRS (= 2× that many
    *    directed edges) resolve with a driver-side union-find after
    *    one collect — the graph is the OUTPUT of the distributed
    *    similarity pipeline, and a few million pairs resolve in
    *    milliseconds where the iterative plan pays multiple Spark jobs
    *    per round;
    *  - larger graphs run iterative min-label propagation: every node
    *    repeatedly adopts the smallest label among itself and its
    *    neighbors until fixpoint. Rounds are bounded by the component
    *    diameter (near-dup clusters are shallow); a graph deeper than
    *    `maxIter` raises IllegalStateException rather than returning
    *    wrong labels. Each round is one
    *    join + one aggregation, fully distributed. Per-round labels
    *    are checkpointed — RELIABLY when the context has a checkpoint
    *    dir (survives executor loss; set one on a real cluster),
    *    locally otherwise (lineage truncation without HDFS round-trips;
    *    an executor loss mid-loop then fails the job, acceptable in
    *    single-process or ephemeral runs). Either way the returned
    *    frame leaves nothing in the SQL cache manager; the edge list
    *    persists for the duration of the loop and is released before
    *    returning.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
      driverThreshold: Long = 1L << 21): DataFrame = {
    // Regime probe and driver input in ONE bounded action: collect at
    // most threshold+1 raw pairs. A short result is the complete graph
    // (no persist, no count pass, no doubled edge list — union-find
    // reads the pairs directly); an overflow falls through to the
    // distributed path, which re-derives the pairs into the doubled,
    // persisted edge list the propagation loop needs. Trade-off made
    // deliberately: the small-graph path (every interactive dedup, and
    // the common case by construction — the pair list is the pruned
    // output of the similarity pipeline) drops from three actions
    // (persist-materialize + count + collect, over 2× the rows) to one
    // bounded collect; the rare over-threshold path re-runs the pair
    // pipeline once more than before (the probe's limit stops its
    // reduce side early, but the map side runs fully).
    val probeLimit = math.min(driverThreshold, (Int.MaxValue - 1).toLong).toInt
    val probe = pairs.select(col("id1"), col("id2")).limit(probeLimit + 1).collect()
    if (probe.length <= probeLimit)
      return driverComponents(pairs.sparkSession, probe,
        pairs.schema("id1").dataType)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // reliable checkpoints when the caller configured a checkpoint dir
    // (cluster mode: survives executor loss); local otherwise. Spark
    // itself only reclaims reliable checkpoint FILES when
    // spark.cleaner.referenceTracking.cleanCheckpoints=true (default
    // false), so the loop tracks the rdd-* dirs each round creates and
    // deletes round N-1's as soon as round N is materialized AND the
    // convergence check (which still reads round N-1) has run — a
    // long-lived session never accumulates more than two rounds of
    // checkpoint files, and after return only the final round's remain
    // (the returned frame reads them lazily). The diffing assumes this
    // loop is the only writer into the checkpoint dir while it runs;
    // concurrent checkpointers in the SAME dir would have their new
    // dirs mis-attributed — use per-job checkpoint dirs in that case.
    val sc = pairs.sparkSession.sparkContext
    val reliable = sc.getCheckpointDir.isDefined
    val ckptFs = if (reliable) {
      val root = new org.apache.hadoop.fs.Path(sc.getCheckpointDir.get)
      Some((org.apache.hadoop.fs.FileSystem.get(
        root.toUri, sc.hadoopConfiguration), root))
    } else None
    def ckptDirs(): Set[String] = ckptFs.fold(Set.empty[String]) {
      case (fs, root) =>
        if (fs.exists(root)) fs.listStatus(root).map(_.getPath.getName).toSet
        else Set.empty
    }
    def dropCkptDirs(dirs: Set[String]): Unit = ckptFs.foreach {
      case (fs, root) => dirs.foreach(d =>
        fs.delete(new org.apache.hadoop.fs.Path(root, d), true))
    }
    def roundCheckpoint(df: DataFrame): (DataFrame, Set[String]) =
      if (reliable) {
        val before = ckptDirs()
        val out = df.checkpoint(eager = true)
        (out, ckptDirs() -- before)
      } else (df.localCheckpoint(eager = true), Set.empty)
    // both edge directions in ONE pass over the pairs (explode, not a
    // union of two selects that would evaluate the pair pipeline twice)
    val edges = pairs
      .select(explode(array(
        struct(col("id1").as("a"), col("id2").as("b")),
        struct(col("id2").as("a"), col("id1").as("b")))).as("_e"))
      .select(col("_e.a").as("id1"), col("_e.b").as("id2"))
      .persist(lvl)
    // finally-scoped: a propagation round failing (dead executor, bad
    // UDF upstream) must not strand the edge list in the cache manager
    // — this persist is operator-internal, invisible to Caches.release
    try {
      var (labels, labelDirs) = roundCheckpoint(
        edges.select(col("id1").as("id")).distinct()
          .withColumn("label", col("id")))
      var converged = false
      var i = 0
      while (!converged && i < maxIter) {
        val neighborMin = edges
          .join(labels.select(col("id").as("id2"), col("label").as("_nl")), "id2")
          .groupBy(col("id1").as("id")).agg(min(col("_nl")).as("_nmin"))
        val (updated, updatedDirs) = roundCheckpoint(labels
          .join(neighborMin, Seq("id"), "left_outer")
          .select(col("id"),
            least(col("label"), coalesce(col("_nmin"), col("label"))).as("label")))
        converged = updated
          .join(labels.select(col("id"), col("label").as("_old")), "id")
          .filter(col("label") =!= col("_old")).isEmpty
        // the convergence check above was the last read of round N-1 —
        // its checkpoint files can go now
        dropCkptDirs(labelDirs)
        labels = updated
        labelDirs = updatedDirs
        i += 1
      }
      // Min-label propagation moves a label ONE hop per round, so rounds
      // needed = component diameter. Hitting maxIter without a fixpoint
      // means some component is deeper than the budget and the labels
      // are WRONG (two ids in one component would report different
      // canonicals) — that must never be returned silently: a dedup
      // pipeline would quietly keep duplicates.
      if (!converged) throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds: a " +
          "component's diameter exceeds maxIter. Raise maxIter (rounds " +
          "needed = max component diameter + 1).")
      labels.select(col("id"), col("label").as("canonical_id"))
    } finally edges.unpersist()
  }

  /** Union-find over a collected pair list; canonical = component min.
    * Ids stay whatever type the pair columns carry (keys compare by
    * equality; min by the natural encoding of longs/strings).
    */
  private def driverComponents(spark: org.apache.spark.sql.SparkSession,
      pairRows: Array[org.apache.spark.sql.Row],
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairRows.foreach { row =>
      val (a, b) = (row.get(0), row.get(1))
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    val ord: Ordering[Any] = idType match {
      case org.apache.spark.sql.types.LongType =>
        Ordering.by((x: Any) => x.asInstanceOf[Long])
      case org.apache.spark.sql.types.IntegerType =>
        Ordering.by((x: Any) => x.asInstanceOf[Int].toLong)
      case _ => Ordering.by((x: Any) => x.toString)
    }
    val minOfRoot = scala.collection.mutable.HashMap.empty[Any, Any]
    parent.keys.foreach { id =>
      val r = find(id)
      minOfRoot(r) = minOfRoot.get(r).fold(id)(m => ord.min(m, id))
    }
    val rows = parent.keys.toSeq.map { id =>
      org.apache.spark.sql.Row(id, minOfRoot(find(id)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("canonical_id", idType))))
  }

  /** Near-duplicate clusters over a corpus: exact n-gram Jaccard pairs
    * (inverted index + skew cap) → connected components → every
    * document mapped to its cluster canonical (min doc id; singletons
    * map to themselves).
    */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double, maxDocFreq: Long = 0L): DataFrame = {
    // no persist here: connectedComponents consumes the pair list
    // exactly once (single-pass edge explode) into its own bounded,
    // released edge cache
    val pairs = jaccardPairs(df, idCol, textCol, n, threshold, maxDocFreq)
    val cc = connectedComponents(pairs)
    df.select(col(idCol))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("canonical_id"), col(idCol)).as("canonical_id"))
  }

  /** Canonical-document selection per near-dup cluster: given cluster
    * labels (`idCol`, `canonical_id` — the [[nearDupClusters]] output)
    * and a per-document score, emit one row per cluster with the
    * highest-scoring member (ties → lowest id) and the cluster size.
    * This is the step after clustering in every dedup pipeline: KEEP
    * the best copy, drop the rest.
    *
    * Shape: a single map-side-combined aggregation via
    * `max(struct(score, -id))` — no per-cluster sort window, no
    * skew-prone `partitionBy(cluster)` ordering; output is bounded by
    * the number of clusters.
    */
  def clusterRepresentatives(clusters: DataFrame, scores: DataFrame,
      idCol: String, scoreCol: String): DataFrame = {
    clusters.join(scores, idCol)
      .groupBy(col("canonical_id"))
      .agg(count(lit(1)).as("cluster_size"),
        max(struct(col(scoreCol).as("s"), (-col(idCol)).as("negid"))).as("_best"))
      .select(col("canonical_id"),
        (-col("_best.negid")).as("rep_id"),
        col("_best.s").as("rep_score"),
        col("cluster_size"))
  }

  // -------------------------------------------------------------- SimHash

  val SimhashBits = 60 // md5Long yields 60 reproducible bits

  /** (idCol, simhash): 60-bit SimHash over word tokens via the native
    * one-pass expression (graft.expr.SimHash60, registered by
    * Graft.tune; md5-derived, oracle-reproducible).
    */
  def withSimhash(df: DataFrame, idCol: String, textCol: String,
      outCol: String = "simhash"): DataFrame =
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(col(idCol),
        call_function(graft.expr.SimHash60.FunctionName, col("_toks")).as(outCol))

  /** Column-level simhash (test/ad-hoc convenience; prefer `withSimhash`
    * in plans — this form re-derives tokens inside the lambda).
    */
  def simhash(text: Column, hashFn: HashFn = md5Hash): Column = {
    val hvs = transform(TextAnalysis.tokens(text), t => hashFn(t, 0))
    aggregate(
      zip_with(
        aggregate(hvs, array_repeat(lit(0), SimhashBits), (acc, h) =>
          zip_with(acc, sequence(lit(0), lit(SimhashBits - 1)), (a, i) =>
            a + when(call_function("shiftright", h, i)
              .bitwiseAND(lit(1L)) === 1, 1).otherwise(-1))),
        sequence(lit(0), lit(SimhashBits - 1)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, found by
    * banding the fingerprint into `maxHamming + 1` chunks (pigeonhole
    * guarantees no missed pair) and verifying with bit_count(xor).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val bands = maxHamming + 1
    val chunk = SimhashBits / bands + (if (SimhashBits % bands == 0) 0 else 1)
    val fp = withSimhash(df, idCol, textCol, "_fp")
      .withColumnRenamed(idCol, "_id")
    // Band outside any lambda (explode the band index, then shift per
    // row) and pair by posting-list expansion carrying (_id, _fp)
    // structs — the fingerprint pipeline runs once, no self-join.
    val banded = fp.select(col("_id"), col("_fp"),
        explode(sequence(lit(0), lit(bands - 1))).as("_band"))
      .select(col("_id"), col("_fp"), col("_band"),
        call_function("shiftright", col("_fp"), col("_band") * chunk)
          .bitwiseAND(lit((1L << chunk) - 1)).as("_key"))
    banded.repartition(
        Scale.fanoutPartitions(banded, PairAggLeafBytesPerPartition),
        col("_band"), col("_key"))
      .groupBy(col("_band"), col("_key"))
      .agg(sort_array(collect_list(struct(col("_id"), col("_fp")))).as("_xs"))
      .filter(size(col("_xs")) > 1)
      .select(explode(flatten(transform(col("_xs"), (x, i) =>
        transform(slice(col("_xs"), i + 2, size(col("_xs"))),
          y => struct(x.getField("_id").as("id1"), y.getField("_id").as("id2"),
            x.getField("_fp").as("_fp1"), y.getField("_fp").as("_fp2"))))))
        .as("_p"))
      .select(col("_p.id1").as("id1"), col("_p.id2").as("id2"),
        col("_p._fp1").as("_fp1"), col("_p._fp2").as("_fp2"))
      .distinct()
      .withColumn("hamming", bit_count(col("_fp1").bitwiseXOR(col("_fp2"))))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }
}

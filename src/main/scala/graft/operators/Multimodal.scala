package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batched decode/feature-extract
  * operators.
  *
  * Container-header decode is REAL ([[imageMeta]]/[[audioMeta]]/
  * [[videoMeta]] via the native ImageMeta/AudioMeta/VideoMeta
  * expressions), and as of round 8 PIXEL decode is real too:
  * [[pixelStats]] (content stats) and [[imageSignatures]]/
  * [[imageNearDup]] (perceptual grid signatures + thumbnail dedup)
  * fully decode PNG (zlib inflate + unfilter + palette), PPM and BMP
  * through [[graft.expr.PixelStats]] — no external codec, no stub.
  * The pluggable `MediaDecoder` seam remains ONLY for formats that
  * genuinely need an external codec (lossy JPEG pixel data, audio
  * samples, video frames); its `StubDecoder` is a deterministic fake,
  * and the Spark-side contract around it — schema, partition-sized
  * batching, executor-side iteration shape — is real and tested, so a
  * JNI/ffmpeg or Python `mapInPandas` worker plugs into the same seam.
  *
  * Scale notes: media blobs dominate row size, so operators here
  * (a) never shuffle the binary column (feature extraction projects it
  * away before any wide op), and (b) repartition by a size heuristic so
  * one task's batch fits executor memory.
  */
object Multimodal {

  /** Leaf-bytes-per-partition floor for the near-dup pair-expansion
    * exchanges (the Dedup posting-kernel constant: media blobs are the
    * leaf, so the floor widens with the corpus). */
  private val PairLeafBytesPerPartition = 2L * 1024 * 1024

  /** Shared banded-candidate expansion for the perceptual near-dup
    * family: aggregate per-bucket id lists, skip over-`maxBucket`
    * buckets (the mass-bucket guard), expand ordered pairs through
    * the shared posting kernel. The input must carry `_id` plus the
    * bucket `keys`. The exchange is PINNED to the leaf-bytes floor:
    * bucket lists are a few KB post-aggregation, so AQE's
    * post-shuffle-bytes heuristic coalesces them to one partition and
    * the pair fan-out — the volume amplifier — runs serially
    * (measured 45 s of a 49 s videoNearDup run at 50k clips). An
    * exchange whose downstream fans out violently must be sized by
    * its INPUT's leaf bytes, never left to AQE.
    */
  private def bandedPairs(banded: DataFrame, maxBucket: Int,
      keys: Column*): DataFrame = {
    val spread = banded.repartition(
      Scale.fanoutPartitions(banded, PairLeafBytesPerPartition), keys: _*)
    spread.groupBy(keys: _*)
      .agg(sort_array(collect_list(col("_id"))).as("_ids"))
      .filter(size(col("_ids")) > 1 && size(col("_ids")) <= maxBucket)
      // lazy generator, not explode(graft_pairs(...)): no materialized
      // quadratic pair array per bucket (see expr/OrderedPairsGen)
      .select(call_function(graft.expr.OrderedPairsGen.FunctionName,
        col("_ids")))
      .distinct()
  }

  /** Parsed container metadata per media row: (media_id, kind,
    * n_bytes, format, width, height, channels, bit_depth) — format
    * and dimensions NULL for undecodable blobs (triage with
    * `format IS NULL`). Pure codegen'd expressions: one bounded
    * header scan per row, blob projected away immediately.
    */
  def imageMeta(media: DataFrame, contentCol: String = "content"): DataFrame = {
    val meta = call_function(graft.expr.ImageMeta.FunctionName, col(contentCol))
    media.select(col("media_id"), col("kind"),
        coalesce(length(col(contentCol)), lit(0)).cast(LongType).as("n_bytes"),
        meta.as("_m"))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("_m.format").as("format"), col("_m.width").as("width"),
        col("_m.height").as("height"), col("_m.channels").as("channels"),
        col("_m.bit_depth").as("bit_depth"))
  }

  /** REAL pixel decode + per-image content stats: PNG (inflate +
    * unfilter + palette), PPM, BMP via the native codegen'd
    * [[graft.expr.PixelStats]] expression — the content-signal layer a
    * curation pipeline filters on (near-constant frames, blown-out or
    * black images, extreme byte variance). Emits the expression's
    * exact-integer stats plus the derived doubles in ONE documented
    * formula (mean = sum/(n_pixels·channels); var = E[x²] − mean²,
    * both 6dp-rounded) so any engine replays them bit-for-bit from the
    * integer sums. Undecodable rows keep NULL stats — the triage
    * contract. Pure projection; the blob is projected away
    * immediately, so nothing downstream shuffles bytes.
    */
  def pixelStats(media: DataFrame, contentCol: String = "content"): DataFrame = {
    val meta = call_function(graft.expr.PixelStats.FunctionName, col(contentCol))
    val n = col("_m.n_pixels") * col("_m.channels")
    val mean = col("_m.sum").cast(DoubleType) / n
    media.select(col("media_id"), col("kind"),
        coalesce(length(col(contentCol)), lit(0)).cast(LongType).as("n_bytes"),
        meta.as("_m"))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("_m.format").as("format"), col("_m.width").as("width"),
        col("_m.height").as("height"), col("_m.channels").as("channels"),
        col("_m.n_pixels").as("n_pixels"),
        col("_m.sum").as("sum"), col("_m.sumsq").as("sumsq"),
        col("_m.pmin").as("pmin"), col("_m.pmax").as("pmax"),
        col("_m.constant").as("constant"),
        round(mean, 6).as("mean"),
        round(col("_m.sumsq").cast(DoubleType) / n - mean * mean, 6).as("variance"))
  }

  /** Perceptual grid signature per image: gx×gy integer block means
    * over the REAL decoded pixels plus the aHash bit fingerprint (see
    * [[graft.expr.PixelGridSig]]). `sig` is emitted as the canonical
    * comma-joined string so downstream grouping/dedup keys on one
    * scalar; `ahash` is the 63-bit fingerprint [[imageNearDup]] bands.
    * Pure projection, blob projected away.
    */
  def imageSignatures(media: DataFrame, contentCol: String = "content",
      gx: Int = 9, gy: Int = 7): DataFrame = {
    val s = call_function(graft.expr.PixelGridSig.FunctionName,
      col(contentCol), lit(gx), lit(gy))
    media.select(col("media_id"), s.as("_g"))
      .select(col("media_id"),
        col("_g.format").as("format"),
        col("_g.width").as("width"), col("_g.height").as("height"),
        array_join(transform(col("_g.sig"), x => x.cast(StringType)), ",")
          .as("sig"),
        col("_g.ahash").as("ahash"),
        col("_g.dhash").as("dhash"))
  }

  /** Thumbnail / near-duplicate IMAGE pairs over real pixels — the
    * content-level dedup a multimodal training pipeline runs after
    * exact byte-dedup: two re-encodes, resizes or slightly-edited
    * copies of one image land in the same pairs even when their bytes
    * (and formats!) differ entirely. The standard aHash recipe made
    * relational:
    *
    *  1. per-image gx×gy grid signature + 63-bit aHash (map-only
    *     native decode, [[graft.expr.PixelGridSig]]);
    *  2. SimHash-style banding: the hash splits into 4×16-bit bands;
    *     images colliding in ANY band become candidates (pigeonhole:
    *     ≤ 3 flipped bits guarantees a clean band) — same
    *     posting-list expansion as the text LSH kernels, no
    *     self-join;
    *  3. exact verification: total L1 distance between the two grid
    *     signatures ≤ `maxL1` (integer arithmetic end-to-end, so the
    *     oracle replays every pair).
    *
    * Returns (id1, id2, l1) with id1 < id2. Scale shape: candidates
    * are bounded by band-bucket sizes (near-identical images), the
    * signature join is by id — nothing corpus-sized is replicated,
    * and the blob never leaves the first projection.
    */
  def imageNearDup(media: DataFrame, contentCol: String = "content",
      gx: Int = 9, gy: Int = 7, maxL1: Long = 126L,
      maxBucket: Int = 4096): DataFrame = {
    require(gx * gy <= 63, s"gx*gy must fit the 63-bit hash: $gx x $gy")
    require(maxBucket > 1, s"maxBucket must exceed 1: $maxBucket")
    val g = call_function(graft.expr.PixelGridSig.FunctionName,
      col(contentCol), lit(gx), lit(gy))
    // three consumers (banding + both verify joins) — pin so the
    // decode pass runs once, not per consumer. The decode rides
    // through explode(array(...)) — a single-row Generate — because a
    // plain Project alias lets the isNotNull triage filter push BELOW
    // the projection (and below any parallelizing exchange in `media`):
    // the full fixture+decode expression is then evaluated twice per
    // row, once of those on the pre-repartition task layout (measured
    // on q153: the whole corpus decode ran single-task inside the
    // pushed filter). Predicates cannot push through a Generate, so
    // the decode provably runs once, above the exchange.
    val sigs = graft.Caches.own(
      media.select(col("media_id").as("_id"), explode(array(g)).as("_g"))
        .filter(col("_g").isNotNull)
        .select(col("_id"), col("_g.sig").as("_sig"), col("_g.ahash").as("_h")))
    val banded = sigs.select(col("_id"), col("_h"),
        explode(sequence(lit(0), lit(3))).as("_band"))
      .select(col("_id"), col("_band"),
        call_function("shiftright", col("_h"),
          (col("_band") * 16).cast(IntegerType))
          .bitwiseAND(lit(65535L)).as("_key"))
    // ordered same-bucket pairs via the shared posting-list kernel.
    // maxBucket is the image-specific skew guard: unlike text LSH
    // (where band keys are ~uniform), a real image corpus has MASS
    // buckets — every all-black thumbnail and blank frame hashes to
    // aHash 0 — and an uncapped bucket expands quadratically. Over-full
    // buckets are skipped (their members are better handled by exact
    // ahash-equality grouping than by pair expansion), same trade as
    // the text kernels' maxDocFreq.
    val cands = bandedPairs(banded, maxBucket, col("_band"), col("_key"))
    // native kernel, NOT aggregate(zip_with(...)): the HOF pair is
    // excluded from whole-stage codegen and runs interpreted per
    // candidate — see expr/SigL1
    val l1 = call_function(graft.expr.SigL1.FunctionName,
      col("_s1"), col("_s2"))
    cands
      .join(sigs.select(col("_id").as("id1"), col("_sig").as("_s1")), "id1")
      .join(sigs.select(col("_id").as("id2"), col("_sig").as("_s2")), "id2")
      .withColumn("l1", l1)
      .filter(col("l1") <= maxL1)
      .select("id1", "id2", "l1")
  }

  /** [[imageNearDup]]'s brightness-robust sibling: bands the dHash
    * (adjacent-block gradient signs, [[graft.expr.PixelGridSig]])
    * instead of the aHash and verifies by HAMMING distance between
    * the two dhashes rather than sig-L1. A uniform brightness or
    * contrast shift moves every block mean together — aHash's
    * near-mean bits flip as a group and the sig-L1 distance blows
    * past any sane threshold, so the aHash pipeline drops such
    * copies; gradient signs are invariant under monotone uniform
    * shifts (absent saturation clamping), so this pipeline keeps
    * them. Run both and union when a corpus mixes edit types — the
    * two verdicts are complementary, not redundant.
    *
    * Returns (id1, id2, hamming) with id1 < id2; integer arithmetic
    * end-to-end (bit_count of xor), so an oracle replays every pair.
    * Same scale shape as [[imageNearDup]]: one cached decode pass,
    * posting-kernel banding (no self-join), `maxBucket` skew guard.
    *
    * Banding splits the (gx−1)·gy LIVE bits into 4 equal bands of
    * ceil(live/4) bits — NOT fixed 16-bit slices of a 63-bit layout.
    * dhash has only 56 live bits at the default 9×7 grid, so a fixed
    * 4×16 split leaves band 3 with 8 live bits = 256 possible keys:
    * every bucket holds N/256 images on average, each BELOW a
    * per-bucket cap yet collectively quadratic — measured 195 s /
    * 36 GB spill at 250k images vs 7 s spill-free for the live-bit
    * split (ScaleShakeout imageNearDupDhash). The aHash path's 63
    * live bits give ceil(63/4) = 16, so this rule reproduces its
    * 4×16 banding exactly.
    */
  def imageNearDupDhash(media: DataFrame, contentCol: String = "content",
      gx: Int = 9, gy: Int = 7, maxHamming: Int = 6,
      maxBucket: Int = 4096): DataFrame = {
    require(gx * gy <= 63, s"gx*gy must fit the 63-bit hash: $gx x $gy")
    require(maxBucket > 1, s"maxBucket must exceed 1: $maxBucket")
    val g = call_function(graft.expr.PixelGridSig.FunctionName,
      col(contentCol), lit(gx), lit(gy))
    // explode(array(...)) Generate barrier — see imageNearDup: keeps
    // the isNotNull triage from duplicating the decode below the
    // parallelizing exchange.
    val sigs = graft.Caches.own(
      media.select(col("media_id").as("_id"), explode(array(g)).as("_g"))
        .filter(col("_g").isNotNull)
        .select(col("_id"), col("_g.dhash").as("_h")))
    val liveBits = (gx - 1) * gy
    val bandWidth = (liveBits + 3) / 4 // ceil: every live bit lands in a band
    val bandMask = (1L << bandWidth) - 1L
    val banded = sigs.select(col("_id"), col("_h"),
        explode(sequence(lit(0), lit(3))).as("_band"))
      .select(col("_id"), col("_band"),
        call_function("shiftright", col("_h"),
          (col("_band") * bandWidth).cast(IntegerType))
          .bitwiseAND(lit(bandMask)).as("_key"))
    val cands = bandedPairs(banded, maxBucket, col("_band"), col("_key"))
    cands
      .join(sigs.select(col("_id").as("id1"), col("_h").as("_h1")), "id1")
      .join(sigs.select(col("_id").as("id2"), col("_h").as("_h2")), "id2")
      .withColumn("hamming",
        bit_count(col("_h1").bitwiseXOR(col("_h2"))).cast(IntegerType))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  /** [[imageMeta]]'s audio sibling: WAV/FLAC header metadata via the
    * native graft.expr.AudioMeta decode (format, channels, sample
    * rate, bit depth, frame count); undecodable rows keep NULL meta
    * fields — the triage contract. Blob projected away immediately.
    */
  def audioMeta(media: DataFrame, contentCol: String = "content"): DataFrame = {
    val meta = call_function(graft.expr.AudioMeta.FunctionName, col(contentCol))
    media.select(col("media_id"), col("kind"),
        coalesce(length(col(contentCol)), lit(0)).cast(LongType).as("n_bytes"),
        meta.as("_m"))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("_m.format").as("format"), col("_m.channels").as("channels"),
        col("_m.sample_rate").as("sample_rate"),
        col("_m.bit_depth").as("bit_depth"),
        col("_m.n_frames").as("n_frames"))
  }

  /** REAL audio sample decode + per-clip content stats —
    * [[pixelStats]]'s audio sibling: WAV integer PCM (16-bit signed /
    * 8-bit unsigned) decodes natively through
    * [[graft.expr.AudioStats]], emitting the exact-integer sums the
    * loudness/clipping/silence filters need plus the derived doubles
    * in ONE documented formula (rms = √(sumsq/n_samples),
    * clip_rate = n_clipped/n_samples, both 6dp-rounded) so any engine
    * replays them bit-for-bit. Per-channel sumsq/peak arrays emit as
    * canonical comma-joined strings (the q152 `sig` convention) so
    * downstream grouping keys on scalars. Undecodable rows (FLAC/MP3
    * payloads, non-PCM WAV, truncated data) keep NULL stats — the
    * triage contract. Pure projection; blob projected away
    * immediately, nothing downstream shuffles bytes.
    */
  def audioStats(media: DataFrame, contentCol: String = "content"): DataFrame = {
    val meta = call_function(graft.expr.AudioStats.FunctionName, col(contentCol))
    media.select(col("media_id"), col("kind"),
        coalesce(length(col(contentCol)), lit(0)).cast(LongType).as("n_bytes"),
        meta.as("_m"))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("_m.format").as("format"), col("_m.channels").as("channels"),
        col("_m.sample_rate").as("sample_rate"),
        col("_m.bit_depth").as("bit_depth"),
        col("_m.n_frames").as("n_frames"),
        col("_m.n_samples").as("n_samples"),
        col("_m.sum").as("sum"), col("_m.sumsq").as("sumsq"),
        col("_m.peak").as("peak"), col("_m.n_clipped").as("n_clipped"),
        col("_m.silent").as("silent"),
        round(sqrt(col("_m.sumsq").cast(DoubleType) /
          greatest(col("_m.n_samples"), lit(1L))), 6).as("rms"),
        round(col("_m.n_clipped").cast(DoubleType) /
          greatest(col("_m.n_samples"), lit(1L)), 6).as("clip_rate"),
        array_join(transform(col("_m.ch_sumsq"), x => x.cast(StringType)), ",")
          .as("ch_sumsq"),
        array_join(transform(col("_m.ch_peak"), x => x.cast(StringType)), ",")
          .as("ch_peak"))
  }

  /** Perceptual AUDIO near-dup pairs over real PCM —
    * [[imageNearDupDhash]]'s audio sibling, completing the triad
    * (text LSH / image grid-sig / audio envelope-sig): two encodes
    * of one clip differing by gain, container padding or a ragged
    * tail pair up even when their bytes differ entirely. Fingerprint
    * = [[graft.expr.AudioEnvSig]] (nFrames-window |sample| envelope,
    * gradient-sign ehash — gain-invariant by the dhash argument);
    * banding splits the nFrames−1 LIVE bits into 4 equal bands of
    * ceil(live/4) bits (the image family's live-bit rule — the
    * default 64 frames give 63 live bits, aHash's exact shape);
    * candidates go through the shared posting kernel (no self-join)
    * under the same `maxBucket` mass-bucket guard; verification is
    * exact Hamming distance on the full ehash. Silence never enters:
    * the expression NULLs all-zero envelopes at the source (see its
    * scaladoc), so the degenerate ehash-0 clique of silent clips
    * cannot form. Returns (id1, id2, hamming) with id1 < id2 —
    * integer end-to-end, oracle-replayable.
    */
  def audioNearDup(media: DataFrame, contentCol: String = "content",
      nFrames: Int = 64, maxHamming: Int = 6,
      maxBucket: Int = 4096): DataFrame = {
    require(nFrames >= 2 && nFrames <= 64,
      s"nFrames must be in [2, 64]: $nFrames")
    require(maxBucket > 1, s"maxBucket must exceed 1: $maxBucket")
    val g = call_function(graft.expr.AudioEnvSig.FunctionName,
      col(contentCol), lit(nFrames))
    // explode(array(...)) Generate barrier — see imageNearDup: keeps
    // the isNotNull triage from duplicating the PCM decode below the
    // parallelizing exchange.
    val sigs = graft.Caches.own(
      media.select(col("media_id").as("_id"), explode(array(g)).as("_g"))
        .filter(col("_g").isNotNull)
        .select(col("_id"), col("_g.ehash").as("_h")))
    val liveBits = nFrames - 1
    val bandWidth = (liveBits + 3) / 4
    val bandMask = (1L << bandWidth) - 1L
    val banded = sigs.select(col("_id"), col("_h"),
        explode(sequence(lit(0), lit(3))).as("_band"))
      .select(col("_id"), col("_band"),
        call_function("shiftright", col("_h"),
          (col("_band") * bandWidth).cast(IntegerType))
          .bitwiseAND(lit(bandMask)).as("_key"))
    val cands = bandedPairs(banded, maxBucket, col("_band"), col("_key"))
    cands
      .join(sigs.select(col("_id").as("id1"), col("_h").as("_h1")), "id1")
      .join(sigs.select(col("_id").as("id2"), col("_h").as("_h2")), "id2")
      .withColumn("hamming",
        bit_count(col("_h1").bitwiseXOR(col("_h2"))).cast(IntegerType))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  /** Materialized thumbnails — the explicit RESIZE stage of a
    * vision-model curation pipeline (fixed-input preprocessing,
    * dataset preview sheets), over every format the shared decode
    * ingests. Output rows carry the resized P6 PPM blob (which the
    * whole image tier re-ingests: stats, signatures, near-dup,
    * resize again); undecodable rows keep a NULL thumb (triage).
    * Integer box-mean semantics — see [[graft.expr.ResizePixels]].
    * Scale shape: pure per-row projection; the SOURCE blob projects
    * away immediately, so downstream shuffles move thumbnails (3·w·h
    * bytes), never originals.
    */
  def thumbnails(media: DataFrame, width: Int = 64, height: Int = 64,
      contentCol: String = "content"): DataFrame = {
    require(width >= 1 && height >= 1 && width <= 4096 && height <= 4096 &&
      width.toLong * height <= (1L << 22),
      s"thumbnail dims out of range: ${width}x$height (each ≤ 4096 and " +
        "area ≤ 2^22 — the expression's bomb guard; a mismatch here " +
        "would silently NULL every thumb instead of failing fast)")
    media.select(col("media_id"), col("kind"),
      call_function(graft.expr.ResizePixels.FunctionName,
        col(contentCol), lit(width), lit(height)).as("thumb"))
  }

  /** [[imageMeta]]'s video sibling: MP4/MOV (ISO BMFF) metadata via
    * the native graft.expr.VideoMeta box walk (format, dims from the
    * first visual track's tkhd, duration_ms, timescale); undecodable
    * rows keep NULL meta fields. Blob projected away immediately.
    */
  def videoMeta(media: DataFrame, contentCol: String = "content"): DataFrame = {
    val meta = call_function(graft.expr.VideoMeta.FunctionName, col(contentCol))
    media.select(col("media_id"), col("kind"),
        coalesce(length(col(contentCol)), lit(0)).cast(LongType).as("n_bytes"),
        meta.as("_m"))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("_m.format").as("format"), col("_m.width").as("width"),
        col("_m.height").as("height"),
        col("_m.duration_ms").as("duration_ms"),
        col("_m.timescale").as("timescale"))
  }

  /** Video FRAME extraction — one row per (video, frame): the
    * container blob explodes into per-frame blobs, and the container
    * projects away before anything downstream shuffles. Container
    * dispatch is a lazy `coalesce` over the two native walks — each
    * rejects the other's magic in its first bytes, so exactly one
    * runs the full walk per row:
    *  - AVI/RIFF via [[graft.expr.AviFrames]] (LIST movi walk,
    *    stream-0 video chunks);
    *  - MP4/MOV (ISO BMFF) via [[graft.expr.Mp4Frames]]
    *    (stsz/stsc/stco sample-table arithmetic of the first `vide`
    *    track).
    * Both are bomb-guarded (maxFrames, 8 MiB/frame, 64 MiB/container).
    * Motion-JPEG frames are complete JPEGs, so [[pixelStats]] /
    * [[imageSignatures]] decode them as-is; inter-frame codec
    * payloads extract but won't pixel-decode (NULL stats — the triage
    * contract). Undecodable / frameless containers contribute no rows.
    */
  def videoFrames(media: DataFrame, contentCol: String = "content",
      maxFrames: Int = 64): DataFrame = {
    val fs = coalesce(
      call_function(graft.expr.AviFrames.FunctionName,
        col(contentCol), lit(maxFrames)),
      call_function(graft.expr.Mp4Frames.FunctionName,
        col(contentCol), lit(maxFrames)),
      call_function(graft.expr.GifFrames.FunctionName,
        col(contentCol), lit(maxFrames)),
      // raw H.264 Annex B: I_PCM IDR frames decode to PPM blobs,
      // entropy-coded positions stay null (the decoder contract)
      call_function(graft.expr.H264Frames.FunctionName,
        col(contentCol), lit(maxFrames)))
    // no isNotNull pre-filter: posexplode (outer=false) already drops
    // null frame sequences, and the filter's pushdown would duplicate
    // the four container walks below the projection (see imageNearDup)
    media.select(col("media_id"), fs.as("_fs"))
      .select(col("media_id"),
        posexplode(col("_fs")).as(Seq("frame_idx", "frame")))
  }

  /** [[videoFrames]] routed through a pluggable [[VideoDecoder]] —
    * the seam inter-frame codecs (H.264 etc.) plug into. The
    * container walk extracts the encoded frame sequence exactly as
    * [[videoFrames]] does; the decoder then turns it into image
    * blobs the native [[pixelStats]] tier decodes, BEFORE the
    * explode.
    *
    * The seam's scale contract, which [[DeltaStubDecoder]]'s spec
    * pins down so an ffmpeg/JNI implementation inherits it:
    *  - inter-frame decode is sequential WITHIN one video, and the
    *    container row already holds its whole (bomb-capped) frame
    *    sequence — so decode is a per-row `mapPartitions`
    *    projection: no groupBy, no shuffle, no blob movement (size
    *    tasks with [[repartitionBySize]] upstream exactly as for
    *    [[extractFeatures]]);
    *  - typed columns: output is the same (media_id, frame_idx,
    *    frame) shape as [[videoFrames]], so every downstream `Of`
    *    stage ([[videoFrameStatsOf]], [[videoSignaturesOf]],
    *    [[videoNearDupOf]]) is decoder-agnostic;
    *  - NULL propagation: a payload the decoder cannot decode maps
    *    to a null element, which survives the posexplode WITH its
    *    frame_idx (index holes must not shift temporal windows) and
    *    NULL-stats downstream — never an error, never a dropped
    *    index.
    */
  def videoFramesVia(media: DataFrame, decoder: VideoDecoder,
      contentCol: String = "content", maxFrames: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val fs = coalesce(
      call_function(graft.expr.AviFrames.FunctionName,
        col(contentCol), lit(maxFrames)),
      call_function(graft.expr.Mp4Frames.FunctionName,
        col(contentCol), lit(maxFrames)),
      call_function(graft.expr.GifFrames.FunctionName,
        col(contentCol), lit(maxFrames)),
      // raw H.264 Annex B: I_PCM IDR frames decode to PPM blobs,
      // entropy-coded positions stay null (the decoder contract)
      call_function(graft.expr.H264Frames.FunctionName,
        col(contentCol), lit(maxFrames)))
    // typed boundary is Seq[Array[Byte]]: the encoder's nested-array
    // deserializer rejects Array[Array[Byte]] (UnsafeArrayData.array).
    // explode(array(...)) Generate barrier — see imageNearDup: the
    // null guard for the decoder seam must not re-evaluate the four
    // container walks below the projection.
    media.select(col("media_id").cast(LongType),
        explode(array(fs)).as("_fs"))
      .filter(col("_fs").isNotNull)
      .as[(Long, Seq[Array[Byte]])]
      .mapPartitions(it => it.map { case (id, enc) =>
        (id, decoder.decode(enc.toArray).toSeq)
      })
      .toDF("media_id", "_fs")
      .select(col("media_id"),
        posexplode(col("_fs")).as(Seq("frame_idx", "frame")))
  }

  /** Per-FRAME pixel content stats for MJPEG-class AVI videos: the
    * frame-level analog of [[pixelStats]] — [[videoFrames]] composed
    * with the real pixel decode, keyed (media_id, frame_idx). The
    * scene-change / black-frame / constant-frame signals a video
    * curation filter needs, exact-integer like q150.
    */
  def videoFrameStats(media: DataFrame, contentCol: String = "content",
      maxFrames: Int = 64): DataFrame =
    videoFrameStatsOf(videoFrames(media, contentCol, maxFrames))

  /** [[videoFrameStats]] over an already-extracted (media_id,
    * frame_idx, frame) DataFrame — [[videoFrames]]'s shape, or
    * [[videoFramesVia]]'s when an inter-frame codec sits behind the
    * [[VideoDecoder]] seam. Null frames (undecodable payloads) keep
    * their row and NULL their stats, per the triage contract.
    */
  def videoFrameStatsOf(frames: DataFrame): DataFrame = {
    val meta = call_function(graft.expr.PixelStats.FunctionName, col("frame"))
    val n = col("_m.n_pixels") * col("_m.channels")
    val mean = col("_m.sum").cast(DoubleType) / n
    frames
      .select(col("media_id"), col("frame_idx"),
        coalesce(length(col("frame")), lit(0)).cast(LongType).as("n_bytes"),
        meta.as("_m"))
      .select(col("media_id"), col("frame_idx"), col("n_bytes"),
        col("_m.format").as("format"), col("_m.width").as("width"),
        col("_m.height").as("height"), col("_m.channels").as("channels"),
        col("_m.n_pixels").as("n_pixels"),
        col("_m.sum").as("sum"), col("_m.sumsq").as("sumsq"),
        col("_m.pmin").as("pmin"), col("_m.pmax").as("pmax"),
        col("_m.constant").as("constant"),
        round(mean, 6).as("mean"),
        round(col("_m.sumsq").cast(DoubleType) / n - mean * mean, 6)
          .as("variance"))
  }

  /** Temporal signature per video — [[imageSignatures]]'s video
    * sibling and [[videoNearDup]]'s fingerprint stage, exposed for
    * forensics and custom pipelines. Frame means from the real pixel
    * decode ([[videoFrames]] → PixelStats, scaled ×256 as exact
    * integer `div`) resample into `nWin` windows by the audio
    * envelope's integer boundary rule (w = ridx·W div F over the
    * DECODABLE frame rank — undecodable inter-coded frames leave
    * holes in frame_idx and must not shift the windows), and bit w of
    * the thash is set iff window w+1's mean exceeds window w's.
    * Videos with fewer decodable frames than `nWin` get W = F
    * windows. Returns (media_id, n_windows, thash).
    *
    * Degenerate-content rule (the audio silence analog): videos whose
    * window means are ALL EQUAL (black clips, color cards, frozen
    * frames) carry no temporal information — every one would hash to
    * 0 — and emit no row, like AudioEnvSig NULLs digital silence at
    * the source. Videos with < 2 decodable frames have no gradient
    * and emit no row either.
    *
    * Scale shape: blobs live only inside the decode projection (only
    * (id, frame_idx, fmean) reaches the per-video window exchange);
    * per-video state is ≤ maxFrames rows.
    */
  def videoSignatures(media: DataFrame, contentCol: String = "content",
      nWin: Int = 32, maxFrames: Int = 64): DataFrame =
    videoSignaturesOf(videoFrames(media, contentCol, maxFrames), nWin)

  /** [[videoSignatures]] over an already-extracted (media_id,
    * frame_idx, frame) DataFrame — [[videoFrames]]'s shape, or
    * [[videoFramesVia]]'s when an inter-frame codec sits behind the
    * [[VideoDecoder]] seam.
    */
  def videoSignaturesOf(framesDf: DataFrame, nWin: Int = 32): DataFrame = {
    require(nWin >= 2 && nWin <= 64, s"nWin must be in [2, 64]: $nWin")
    import org.apache.spark.sql.expressions.Window
    val meta = call_function(graft.expr.PixelStats.FunctionName, col("frame"))
    // per decodable frame: integer mean scaled by 256 (exact: div of
    // longs; sum <= 255 * 64Mi samples keeps sum*256 < 2^63)
    // explode(array(...)) Generate barrier — see imageNearDup: keeps
    // the decodable-frame triage from duplicating the pixel decode
    // below the projection.
    val frames = framesDf
      .select(col("media_id").as("_id"), col("frame_idx"),
        explode(array(meta)).as("_m"))
      .filter(col("_m").isNotNull)
      .select(col("_id"), col("frame_idx"),
        call_function("div", col("_m.sum") * 256,
          col("_m.n_pixels") * col("_m.channels")).as("_fmean"))
    val perVid = Window.partitionBy(col("_id"))
    val byIdx = perVid.orderBy(col("frame_idx"))
    val windowed = frames
      .withColumn("_ridx", row_number().over(byIdx) - 1)
      .withColumn("_f", count(lit(1)).over(perVid))
      .filter(col("_f") >= 2)
      .withColumn("_w", least(lit(nWin), col("_f")))
      .withColumn("_wv",
        call_function("div", col("_ridx") * col("_w"), col("_f")))
      .groupBy(col("_id"), col("_w"), col("_wv"))
      .agg(call_function("div", sum(col("_fmean")), count(lit(1)))
        .as("_wval"))
    val nxt = lead(col("_wval"), 1).over(
      Window.partitionBy(col("_id")).orderBy(col("_wv")))
    windowed
      .withColumn("_bit", when(nxt > col("_wval"),
        call_function("shiftleft", lit(1L), col("_wv").cast(IntegerType)))
        .otherwise(lit(0L)))
      .groupBy(col("_id"))
      .agg(first(col("_w")).as("_w"), sum(col("_bit")).as("_h"),
        (min(col("_wval")) < max(col("_wval"))).as("_live"))
      .filter(col("_live"))
      .select(col("_id").as("media_id"), col("_w").as("n_windows"),
        col("_h").as("thash"))
  }

  /** Perceptual VIDEO near-dup pairs over real frames — completes the
    * image/audio/video near-dup triad. Fingerprint = the TEMPORAL
    * gradient-sign hash of the per-frame luminance envelope: frame
    * means (from the real pixel decode) resample into `nWin` windows
    * by the same integer boundary rule as the audio envelope, and bit
    * w of the thash is set iff window w+1's mean exceeds window w's —
    * invariant under uniform brightness/gain shifts by the dHash
    * argument, and robust to re-encodes that preserve frame-level
    * luminance (the frame CONTENT never enters the hash, only its
    * mean). Two encodes of one clip — brightness-shifted, containered
    * differently, frame counts differing by resampling — pair up even
    * when no two frames share a byte.
    *
    * Built ENTIRELY from existing relational pieces — no new native
    * kernel: [[videoFrames]] (RIFF walk) → PixelStats (real decode) →
    * integer window means (`div`, exact) → lead()-window gradient →
    * live-bit banding → the shared posting kernel → Hamming verify.
    * All arithmetic is integer end-to-end, so an oracle replays every
    * pair.
    *
    * Degenerate-content rule (the audio silence analog): videos whose
    * window means are ALL EQUAL (black clips, constant color cards,
    * frozen frames) carry no temporal information — every one would
    * hash to 0 and form the mass bucket — so they are dropped before
    * banding, like AudioEnvSig NULLs digital silence at the source.
    *
    * Videos with fewer decodable frames than `nWin` get W = F windows;
    * W joins the band key, so hashes of different live-bit widths
    * never cross-pair (their bit layouts aren't comparable). Banding
    * takes the image family's live-bit rule one step further: BOTH
    * the band count and the band width derive from the live bits
    * (bands = clamp(ceil(live/16), 1, 4)), flooring band keys at ~16
    * bits — see the in-code note for the measured key-space blowup
    * that forces this, and its recall trade.
    *
    * Returns (id1, id2, hamming), id1 < id2. Scale shape: the frame
    * blobs live only inside the first projection (decode happens in
    * the posexplode stage and only (id, frame_idx, two longs)
    * shuffle); per-video state is ≤ nWin rows; banding/verify is the
    * shared capped-bucket kernel — nothing corpus-sized replicates.
    */
  def videoNearDup(media: DataFrame, contentCol: String = "content",
      nWin: Int = 32, maxFrames: Int = 64, maxHamming: Int = 4,
      maxBucket: Int = 4096): DataFrame =
    videoNearDupOf(videoFrames(media, contentCol, maxFrames),
      nWin, maxHamming, maxBucket)

  /** [[videoNearDup]] over an already-extracted (media_id, frame_idx,
    * frame) DataFrame — [[videoFrames]]'s shape, or
    * [[videoFramesVia]]'s when an inter-frame codec sits behind the
    * [[VideoDecoder]] seam: the fingerprint hashes per-frame
    * luminance MEANS, so once the seam decodes frames to image
    * blobs, inter-coded clips near-dup through the identical
    * banding/verify path.
    */
  def videoNearDupOf(frames: DataFrame, nWin: Int = 32,
      maxHamming: Int = 4, maxBucket: Int = 4096): DataFrame = {
    require(maxBucket > 1, s"maxBucket must exceed 1: $maxBucket")
    val sigs = graft.Caches.own(
      videoSignaturesOf(frames, nWin)
        .select(col("media_id").as("_id"), col("n_windows").as("_w"),
          col("thash").as("_h")))
    // live bits = W-1 — SHORT next to the image/audio hashes (31 at
    // the default 32 windows), so the key-space audit lesson applies
    // one step further than the image family's live-bit rule: with 4
    // fixed bands a 31-bit hash gets 8-bit keys = 256 buckets per
    // band, and at 50k+ videos EVERY bucket averages hundreds of
    // members — each below any cap, collectively quadratic (measured:
    // 46M candidate rows from 24k signatures). So the BAND COUNT
    // derives from the live bits too: bands = clamp(ceil(live/16),
    // 1, 4) floors band keys at ~16 bits. The trade is recall: b
    // bands guarantee a clean band only for <= b-1 flipped bits, so a
    // 32-window corpus (2 bands) has guaranteed recall at Hamming 1
    // and probabilistic recall up to maxHamming — the honest price of
    // a short fingerprint; corpora needing guaranteed Hamming-4
    // recall should raise nWin to 64 (63 live bits, 4x16 banding,
    // the audio family's exact shape). All per-row: W varies with
    // short videos, and different-W cohorts never share buckets.
    val live = col("_w") - 1
    val nBands = least(lit(4L), greatest(lit(1L),
      call_function("div", live + 15, lit(16))))
    val bandWidth = call_function("div", live + nBands - 1, nBands)
      .cast(IntegerType)
    val bandMask =
      call_function("shiftleft", lit(1L), bandWidth) - 1
    val banded = sigs.select(col("_id"), col("_w"), col("_h"),
        explode(sequence(lit(0L), nBands - 1)).as("_band"))
      .select(col("_id"), col("_band"), col("_w"),
        call_function("shiftright", col("_h"),
          (col("_band") * bandWidth).cast(IntegerType))
          .bitwiseAND(bandMask).as("_key"))
    // pair expansion is the volume amplifier; pin its exchange to the
    // leaf-bytes floor (an explicit repartition AQE cannot coalesce) —
    // without it AQE sees a few KB of bucket lists, coalesces to ONE
    // task, and the whole candidate explosion runs serially (measured
    // 45 s of a 49 s run at 50k videos)
    val spread = banded.repartition(
      Scale.fanoutPartitions(banded, PairLeafBytesPerPartition),
      col("_band"), col("_w"), col("_key"))
    val cands = spread.groupBy(col("_band"), col("_w"), col("_key"))
      .agg(sort_array(collect_list(col("_id"))).as("_ids"))
      .filter(size(col("_ids")) > 1 && size(col("_ids")) <= maxBucket)
      // lazy generator, not explode(graft_pairs(...)): no materialized
      // quadratic pair array per bucket (see expr/OrderedPairsGen)
      .select(call_function(graft.expr.OrderedPairsGen.FunctionName,
        col("_ids")))
      .distinct()
    cands
      .join(sigs.select(col("_id").as("id1"), col("_h").as("_h1")), "id1")
      .join(sigs.select(col("_id").as("id2"), col("_h").as("_h2")), "id2")
      .withColumn("hamming",
        bit_count(col("_h1").bitwiseXOR(col("_h2"))).cast(IntegerType))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  /** Canonical multimodal record: blob + typed metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),        // image | audio | video
    StructField("content", BinaryType),     // opaque encoded bytes
    StructField("mime", StringType),
    StructField("width", IntegerType),      // images/video
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)    // audio/video
  ))

  /** Decoded-feature row produced by `extractFeatures`. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("n_bytes", LongType),
    // containsNull=false: the decoder contract returns a dense
    // fixed-size vector, never null elements (and the typed-encoder
    // path encodes Array[Float] as exactly this)
    StructField("feature", ArrayType(FloatType, containsNull = false))
  ))

  /** Pluggable decode kernel. A real implementation would wrap an image
    * / audio library; `StubDecoder` is a deterministic fake keyed on the
    * bytes so tests and oracles are stable.
    */
  trait MediaDecoder extends Serializable {
    /** bytes → fixed-size feature vector (e.g. pooled pixels / MFCC). */
    def decodeFeatures(kind: String, bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** Pluggable per-video frame decoder — the seam inter-frame codecs
    * (H.264 etc.) land behind. One call decodes ONE video's whole
    * extracted frame sequence in order (inter-frame decode is
    * stateful across frames of a clip, never across clips), returning
    * a SAME-LENGTH array of image blobs in a format the native
    * [[pixelStats]] tier decodes (PPM/PNG/BMP/…), with null at every
    * position whose payload the decoder cannot decode — positions,
    * not just values, are part of the contract (frame_idx must
    * survive so temporal windows don't shift). Implementations must
    * be pure, deterministic and Serializable; they run executor-side
    * inside [[videoFramesVia]]'s per-row projection.
    */
  trait VideoDecoder extends Serializable {
    def decode(frames: Array[Array[Byte]]): Array[Array[Byte]]
  }

  /** Intra-coded passthrough: MJPEG-class frames are already complete
    * images, so decode is the identity — [[videoFramesVia]] with this
    * decoder is plan-for-plan [[videoFrames]] plus the seam hop.
    */
  final class IntraFrameDecoder extends VideoDecoder {
    def decode(frames: Array[Array[Byte]]): Array[Array[Byte]] = frames
  }

  /** Deterministic stub for a TRIVIAL synthetic inter-frame format,
    * existing to integration-test the [[VideoDecoder]] seam before
    * ffmpeg-class code lands behind it (the image/audio libraries
    * aren't in this environment; the Spark-side plumbing is what the
    * spec proves). The format, `GKEY`/`GDLT`:
    *  - `GKEY` + image bytes — a keyframe carrying a complete image;
    *  - `GDLT` + delta bytes — byte-wise delta (mod 256) applied to
    *    the PREVIOUS decoded frame, same length (the minimal honest
    *    model of inter-frame dependence: undecodable without its
    *    predecessor);
    *  - anything else, a delta before any keyframe, or a
    *    length-mismatched delta → null (and the keyframe state
    *    resets, exactly as a real decoder loses sync until the next
    *    keyframe).
    */
  final class DeltaStubDecoder extends VideoDecoder {
    def decode(frames: Array[Array[Byte]]): Array[Array[Byte]] = {
      val out = new Array[Array[Byte]](frames.length)
      var prev: Array[Byte] = null
      var i = 0
      while (i < frames.length) {
        val f = frames(i)
        out(i) =
          if (f == null || f.length < 4) { prev = null; null }
          else if (f(0) == 'G' && f(1) == 'K' && f(2) == 'E' && f(3) == 'Y') {
            prev = java.util.Arrays.copyOfRange(f, 4, f.length)
            prev
          } else if (f(0) == 'G' && f(1) == 'D' && f(2) == 'L' && f(3) == 'T') {
            if (prev == null || f.length - 4 != prev.length) { prev = null; null }
            else {
              val d = new Array[Byte](prev.length)
              var j = 0
              while (j < d.length) {
                d(j) = (prev(j) + f(j + 4)).toByte
                j += 1
              }
              prev = d
              d
            }
          } else { prev = null; null }
        i += 1
      }
      out
    }
  }

  /** The pluggable boundary LOSSY audio codecs (MP3 / Vorbis / Opus)
    * land behind — [[VideoDecoder]]'s audio sibling. One call decodes
    * ONE clip's compressed payload into a WAV PCM blob the native
    * tier ([[graft.expr.AudioStats]], [[graft.expr.AudioEnvSig]])
    * decodes, or null when the payload isn't this codec's / can't be
    * decoded. Unlike video there is no frame-sequence shape: a clip
    * is one self-contained payload, so the seam is payload → payload.
    * Implementations must be pure, deterministic and Serializable;
    * they run executor-side inside [[audioSamplesVia]]'s per-row
    * projection — no shuffle, no blob movement.
    */
  trait AudioDecoder extends Serializable {
    def decode(payload: Array[Byte]): Array[Byte]
  }

  /** PCM passthrough: WAV-family payloads (incl. the G.711/ADPCM
    * codecs the native tier expands itself) already decode natively —
    * [[audioSamplesVia]] with this decoder is plan-for-plan
    * [[audioStats]]'s input plus the seam hop.
    */
  final class PcmPassthroughDecoder extends AudioDecoder {
    def decode(payload: Array[Byte]): Array[Byte] = payload
  }

  /** Deterministic stub for a TRIVIAL synthetic lossy format,
    * existing to integration-test the [[AudioDecoder]] seam before
    * an MP3/Vorbis implementation lands behind it (those codecs'
    * synthesis filterbanks aren't reproducible offline; the
    * Spark-side plumbing is what the oracle gate proves). The format,
    * `GAUD`:
    *  - bytes 0-3 `GAUD`, bytes 4-7 sample rate (LE32, must be > 0);
    *  - bytes 8+: mono 8-bit SIGNED (two's complement) samples — the
    *    minimal honest model of a lossy codec: 16→8-bit quantization
    *    destroyed information at encode time, decode re-expands each
    *    sample to 16-bit PCM as `s << 8` (exact arithmetic any engine
    *    replays);
    *  - wrong magic, truncated header, or non-positive rate → null
    *    (the triage contract: foreign codecs NULL their stats rows,
    *    never error).
    * Decode output is a standard 44-byte-header mono PCM16 WAV.
    */
  final class LossyStubDecoder extends AudioDecoder {
    def decode(p: Array[Byte]): Array[Byte] = {
      if (p == null || p.length < 8) return null
      if (!(p(0) == 'G' && p(1) == 'A' && p(2) == 'U' && p(3) == 'D'))
        return null
      val rate = (p(4) & 0xFF) | ((p(5) & 0xFF) << 8) |
        ((p(6) & 0xFF) << 16) | ((p(7) & 0xFF) << 24)
      if (rate <= 0) return null
      val n = p.length - 8
      val dataSize = n * 2
      val out = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("ISO-8859-1")).putInt(36 + dataSize)
        .put("WAVE".getBytes("ISO-8859-1"))
        .put("fmt ".getBytes("ISO-8859-1")).putInt(16)
        .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
        .putShort(2).putShort(16)
        .put("data".getBytes("ISO-8859-1")).putInt(dataSize)
      var i = 0
      while (i < n) {
        out.putShort((p(8 + i) << 8).toShort) // signed byte → s << 8
        i += 1
      }
      out.array()
    }
  }

  /** REAL lossy-codec arm of the [[AudioDecoder]] seam: the hand
    * MPEG-1 Layer III decoder ([[graft.expr.Mp3Decode]] — spec-exact
    * pipeline, structurally-validated Huffman registry, documented
    * stand-in synthesis prototype; see its scaladoc for the
    * conformance contract). With `passthroughPcm` (the default) WAV
    * payloads pass through unchanged, so ONE seam hop feeds the
    * cross-codec fingerprint family MP3 and PCM arms together — the
    * q185 route. Anything that is neither → null (triage).
    */
  final class Mp3Decoder(passthroughPcm: Boolean = true) extends AudioDecoder {
    def decode(p: Array[Byte]): Array[Byte] = {
      if (passthroughPcm && p != null && p.length >= 12 &&
          p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
          p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E')
        return p
      graft.expr.Mp3Decode.decode(p)
    }
  }

  /** LOSSLESS-codec arm of the [[AudioDecoder]] seam: the hand FLAC
    * decoder ([[graft.expr.FlacDecode]] — the full format, bit-exact;
    * nothing in FLAC is tabulated spec data, so unlike MP3 there is
    * no conformance subset — see its scaladoc). With `passthroughPcm`
    * (the default) WAV payloads pass through unchanged, so ONE seam
    * hop feeds the cross-codec fingerprint family FLAC and PCM arms
    * together — the q185 route with exact twins instead of
    * envelope-bounded ones. Anything that is neither → null (triage).
    */
  final class FlacDecoder(passthroughPcm: Boolean = true) extends AudioDecoder {
    def decode(p: Array[Byte]): Array[Byte] = {
      if (passthroughPcm && p != null && p.length >= 12 &&
          p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
          p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E')
        return p
      graft.expr.FlacDecode.decode(p)
    }
  }

  /** OGG lossy-codec arm of the [[AudioDecoder]] seam: the
    * clean-room Vorbis I decoder ([[graft.expr.VorbisDecode]] —
    * stream-delivered codebooks make the whole format algorithmic,
    * so unlike MP3 there is no tabulated-data conformance subset;
    * the single spec constant, the floor1 inverse-dB table, is
    * generated from its closed form — see its scaladoc). With
    * `passthroughPcm` (the default) WAV payloads pass through
    * unchanged, so ONE seam hop feeds the cross-codec fingerprint
    * family Vorbis and PCM arms together — the q185 route. Anything
    * that is neither → null (triage).
    */
  final class VorbisDecoder(passthroughPcm: Boolean = true)
      extends AudioDecoder {
    def decode(p: Array[Byte]): Array[Byte] = {
      if (passthroughPcm && p != null && p.length >= 12 &&
          p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
          p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E')
        return p
      graft.expr.VorbisDecode.decode(p)
    }
  }

  /** Audio payloads routed through a pluggable [[AudioDecoder]] —
    * [[videoFramesVia]]'s audio sibling. Returns the same (media_id,
    * kind, content) shape the whole audio tier consumes, with
    * `content` now PCM WAV bytes, so [[audioStats]],
    * [[audioNearDup]] and the cross-codec fingerprint family compose
    * decoder-agnostically on top. NULL propagation: a payload the
    * decoder can't decode maps to a NULL content row (the downstream
    * native walk NULLs its stats) — never an error, never a dropped
    * row. Scale shape: a per-row `mapPartitions` projection — no
    * shuffle, no blob movement.
    */
  def audioSamplesVia(media: DataFrame, decoder: AudioDecoder,
      contentCol: String = "content"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast(LongType), col("kind"),
        col(contentCol))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(it => it.map { case (id, kind, bytes) =>
        (id, kind, decoder.decode(bytes))
      })
      .toDF("media_id", "kind", "content")
  }

  /** [[audioStats]] behind the [[AudioDecoder]] seam: decode, then
    * the EXISTING native stats walk — the q160 pattern for audio.
    */
  def audioStatsVia(media: DataFrame, decoder: AudioDecoder,
      contentCol: String = "content"): DataFrame =
    audioStats(audioSamplesVia(media, decoder, contentCol))

  final class StubDecoder extends MediaDecoder {
    def decodeFeatures(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
      // Deterministic pseudo-features: per-stripe byte checksums.
      // Accumulation is INTEGER (exact, order-independent); floating
      // point enters only in the final two divisions — so the value is
      // reproducible bit-for-bit by any engine (the q34 oracle redoes
      // this arithmetic in SQL from hex(bytes)).
      val out = new Array[Float](dim)
      if (bytes != null && bytes.nonEmpty) {
        val acc = new Array[Long](dim)
        var i = 0
        while (i < bytes.length) {
          acc(i % dim) += (bytes(i) & 0xffL)
          i += 1
        }
        val stripe = math.max(bytes.length / dim, 1)
        var d = 0
        while (d < dim) {
          out(d) = (acc(d) / 255.0 / stripe).toFloat
          d += 1
        }
      }
      out
    }
  }

  /** Batched feature extraction: binary column in, feature vector out.
    * Runs per-partition (the `mapInPandas` batch shape); the blob is
    * projected away immediately so downstream ops never shuffle bytes.
    *
    * A typed `Dataset.mapPartitions` rather than an RDD hop: the
    * planner keeps the operator in the query plan (the select prunes
    * to exactly the three consumed columns BEFORE deserialization,
    * so a wide media table never materializes its other columns),
    * and the tuple encoder serializes straight back to Tungsten rows.
    * Output shape is [[FeatureSchema]].
    */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder = new StubDecoder,
      dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast(LongType),
        col("kind").cast(StringType), col("content").cast(BinaryType))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          val k = if (kind == null) "" else kind
          (id, k, b.length.toLong, decoder.decodeFeatures(k, b, dim))
        }
      }
      .toDF("media_id", "kind", "n_bytes", "feature")
  }

  /** Frame-sampling plan for video blobs: emits (media_id, frame_idx)
    * sample points every `everyMs` without decoding — the schedule a
    * real decoder would consume. Pure expressions.
    */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame =
    media
      .filter(col("kind") === "video" && col("duration_ms").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs)))
          .as("sample_ms"))

  /** Size-aware repartition so each task's media batch is ~`targetMb`.
    * Call before `extractFeatures` on real data.
    */
  def repartitionBySize(media: DataFrame, totalBytes: Long, targetMb: Int = 128): DataFrame = {
    val parts = math.max((totalBytes / (targetMb.toLong * 1024 * 1024)).toInt, 1)
    media.repartition(parts)
  }
}

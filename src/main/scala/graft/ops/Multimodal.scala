package graft.ops

import graft.ops.Materialize.EagerOps
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash

/** Multimodal-column operators: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode/feature-extraction
  * as batched partition-local transforms.
  *
  * The container has no media codecs, so the decode step is a clearly-marked
  * deterministic STUB (byte-statistics pseudo-decoder). Everything around it
  * — schema, partitioning, batch shape, null handling — is the real Spark
  * plumbing a production decoder would drop into: swap `stubDecode` for a
  * JNI/FFI codec and nothing else changes.
  *
  * Scale design: decode is embarrassingly parallel (mapPartitions, no
  * shuffle); batches bound peak memory per task (`batchSize` payloads at a
  * time, analogous to Arrow record batches); feature vectors are fixed-width
  * arrays so downstream similarity ops reuse VectorOps unchanged.
  */
object Multimodal {

  /** Internal decode-row schema (array form); `decodeFeatures` flattens the
    * array into scalar `f0..f7` columns so results stay hashable/sortable by
    * any downstream engine (array columns break generic row comparators).
    */
  val decodeSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = true),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  val FeatureCount = 8

  private val mediaTypes = Seq("image", "audio", "video")

  /** Synthesize a media table from `documents`: payload = UTF-8 text bytes,
    * media_type assigned round-robin by doc_id. Stand-in for a real
    * binary-payload parquet/Lance scan; the column types are the contract.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      mediaTypeCol(col("doc_id")).as("media_type"),
      col("text").cast("binary").as("content"),
      struct(col("lang"), col("source")).as("meta"))

  def mediaTypeCol(id: Column): Column =
    when(id % 3 === 0, mediaTypes(0))
      .when(id % 3 === 1, mediaTypes(1))
      .otherwise(mediaTypes(2))

  /** Typed metadata projection — fully columnar, oracle-checkable:
    * byte length plus pseudo-dimensions derived from the portable hash
    * (stands in for header parsing, which a real decoder would do).
    */
  def mediaMeta(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      mediaTypeCol(col("doc_id")).as("media_type"),
      length(col("text")).as("n_bytes"),
      (PortableHash.h31("w", col("text")) % 1280 + 1).as("width"),
      (PortableHash.h31("h", col("text")) % 720 + 1).as("height"))

  /** Resize planning for "image" media: aspect-preserving fit into a target
    * box — output dims, the scale factor, and the decoded-output byte
    * estimate (out_w × out_h × 3 RGB) a batch scheduler uses to size decode
    * tasks. Pure columnar arithmetic over the typed metadata (the actual
    * pixel resample belongs to the stub-codec boundary, like `stubDecode`);
    * both engines evaluate the identical double expression, so floor/cast
    * agree bit-for-bit. Narrow projection, no shuffle.
    */
  def resizePlan(docs: DataFrame, boxW: Int = 256, boxH: Int = 256): DataFrame = {
    val scale = least(lit(boxW.toDouble) / col("width"), lit(boxH.toDouble) / col("height"))
    mediaMeta(docs).filter(col("media_type") === "image")
      .select(col("media_id"), col("width"), col("height"),
        round(scale, 6).as("scale"),
        greatest(lit(1), floor(col("width") * scale).cast("int")).as("out_w"),
        greatest(lit(1), floor(col("height") * scale).cast("int")).as("out_h"))
      .withColumn("out_bytes", col("out_w").cast("bigint") * col("out_h") * 3)
  }

  /** Frame sampling for "video" payloads: fixed-stride byte windows
    * (stride 64, ≤8 frames), each fingerprinted. A real video path would
    * replace the substring with a keyframe extractor; the explode/filter
    * shape (narrow, no shuffle) is identical.
    */
  def frameSample(docs: DataFrame): DataFrame =
    docs
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id").as("media_id"), col("text"),
        explode(sequence(lit(0), lit(7))).as("frame_idx"))
      // (len-1)/64: divisor is a power of two, so the double quotient is
      // exact and int-cast truncation equals DuckDB's integer `//`.
      .filter(col("frame_idx") <= ((length(col("text")) - 1) / 64).cast("int"))
      .select(col("media_id"), col("frame_idx"),
        PortableHash.h31("fr", col("text").substr(col("frame_idx") * 64 + 1, lit(64)))
          .as("frame_hash"))

  /** Modality-specific typed header fields, the union-schema pattern for
    * mixed media tables: every modality gets its own typed columns, null for
    * other rows (engines with struct-per-type pay a shredding cost; nullable
    * flat columns stay columnar and prune for free). Values are pseudo-header
    * parses derived from the portable hash (a real decoder would read
    * them from the container header — same schema contract).
    */
  def typedMeta(docs: DataFrame): DataFrame = {
    val t = mediaTypeCol(col("doc_id"))
    docs.select(
      col("doc_id").as("media_id"),
      t.as("media_type"),
      length(col("text")).as("n_bytes"),
      when(t === "audio", PortableHash.h31("sr", col("text")) % 4 * 16000 + 8000)
        .as("sample_rate"),
      when(t === "audio", PortableHash.h31("ch", col("text")) % 2 + 1)
        .as("channels"),
      when(t === "video", PortableHash.h31("fps", col("text")) % 3 * 6 + 18)
        .as("fps"),
      when(t === "video", PortableHash.h31("dur", col("text")) % 300 + 1)
        .as("duration_s"),
      when(t === "image", PortableHash.h31("w", col("text")) % 1280 + 1)
        .as("width"),
      when(t === "image", PortableHash.h31("h", col("text")) % 720 + 1)
        .as("height"))
  }

  /** ======= STUB DECODER =======
    * Deterministic fake "decode": 8 byte-statistics moments standing in for
    * a real image/audio decode. Replace this function body with the codec
    * call; signature (one payload in, fixed-width features out) is the
    * production contract.
    */
  def stubDecode(content: Array[Byte]): Array[Double] = {
    if (content == null || content.isEmpty) return Array.fill(8)(0.0)
    val n = content.length
    var sum = 0L; var sumSq = 0L; var mn = 255; var mx = 0
    var i = 0
    while (i < n) {
      val b = content(i) & 0xff
      sum += b; sumSq += b.toLong * b
      if (b < mn) mn = b
      if (b > mx) mx = b
      i += 1
    }
    val mean = sum.toDouble / n
    Array(
      n.toDouble, mean, sumSq.toDouble / n - mean * mean,
      mn.toDouble, mx.toDouble,
      (content(0) & 0xff).toDouble, (content(n - 1) & 0xff).toDouble,
      (content(n / 2) & 0xff).toDouble)
  }

  /** Batched partition-local decode: groups each partition's rows into
    * `batchSize` chunks (bounding per-task memory exactly like an Arrow
    * batch would), decodes, and emits fixed-width feature rows flattened to
    * scalar columns `f0..f7` (rounded to 6 decimals — the engine-stable
    * float convention used by every other query).
    */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "media_type", "content").rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val content = r.getAs[Array[Byte]]("content")
            Row(r.getLong(0), r.getString(1),
              if (content == null) 0 else content.length,
              stubDecode(content))
          }
        }
      }
    val scalars = (0 until FeatureCount)
      .map(i => round(element_at(col("features"), i + 1), 6).as(s"f$i"))
    spark.createDataFrame(rdd, decodeSchema)
      .select(Seq(col("media_id"), col("media_type"), col("n_bytes")) ++ scalars: _*)
  }

  // ======= DECODE-QUALITY GATES (the media retention stage) =======

  /** Gate thresholds over the stub-decoded byte moments: minimum payload
    * size, a ceiling on the mean byte (saturated/clipped payloads), and a
    * floor on byte variance (near-constant payloads a real decoder would
    * flag as degenerate). Chosen to have bite on the planted corpus at
    * every SF; a production deployment tunes them per modality.
    */
  val MinMediaBytes = 64
  val MaxMeanByte = 98.0
  val MinByteVar = 800.0

  /** Decode-quality gate over a `decodeFeatures`/`decodeFeaturesArrow`
    * frame: keeps media whose payload is big enough and whose byte
    * moments (the 6-dp ROUNDED f1/f2, so both engines gate on identical
    * doubles) sit inside the plausible-content envelope. Projection +
    * filter, no shuffle.
    */
  def mediaQualityGate(feats: DataFrame): DataFrame =
    feats.filter(col("n_bytes") >= MinMediaBytes &&
        col("f1") <= MaxMeanByte && col("f2") >= MinByteVar)
      .select(col("media_id"), col("media_type"))

  // ======= PERCEPTUAL MEDIA DEDUP (byte-level blockhash tier) =======
  //
  // The multimodal × dedup composition: a PERCEPTUAL fingerprint over the
  // media BYTES themselves (text dedup covers the text modality, embedding
  // cosine covers the semantic one — nothing previously fingerprinted the
  // payload). Algorithm = blockhash: split the payload into `PhashBlocks`
  // EQUAL-FRACTION blocks (length-normalized, so a trailing edit never
  // shifts earlier block boundaries), bit_b = 1 iff block b's mean byte
  // exceeds the payload's mean byte — compared as the all-integer cross
  // product blocksum·n > total·width, so both engines agree exactly. The
  // 64 bits pack into 4 sixteen-bit band words; near-dup candidates are a
  // banded equi-join (any identical band word), verified by exact Hamming
  // distance over the 4 words. A real image/audio pHash would hash decoded
  // pixels/samples — this runs at the same stub-codec boundary as
  // `stubDecode`, and swapping in a decoder changes only the byte source.
  //
  // Scale: fingerprinting is one partition-local byte pass (no shuffle);
  // candidates are O(band collisions), never all-pairs; 16-bit bands keep
  // the random-pair collision floor at 4/65536 of all-pairs (the SimHash
  // byte-band convention, widened one word — at 100 TB you widen again).
  // Integer bound: blocksum·n ≤ 255·n² stays inside a long for payloads
  // up to ~100 MB; larger media needs the DECIMAL treatment.

  val PhashBlocks = 64
  val PhashBands = 4
  val PhashBandBits = 16
  val PhashMaxHam = 8

  /** ======= STUB PERCEPTUAL HASH =======
    * One byte pass → 4 sixteen-bit band words of the 64-block blockhash.
    * Production replaces the byte source with decoded pixels/samples at
    * this exact signature.
    */
  def stubPerceptual(content: Array[Byte]): Array[Int] = {
    val bands = new Array[Int](PhashBands)
    if (content == null || content.isEmpty) return bands
    val n = content.length
    val sums = new Array[Long](PhashBlocks)
    val widths = new Array[Long](PhashBlocks)
    var total = 0L
    var i = 0
    while (i < n) {
      val blk = (i.toLong * PhashBlocks / n).toInt
      val b = content(i) & 0xff
      sums(blk) += b; widths(blk) += 1; total += b
      i += 1
    }
    var blk = 0
    while (blk < PhashBlocks) {
      if (sums(blk) * n > total * widths(blk))
        bands(blk / PhashBandBits) |= (1 << (blk % PhashBandBits))
      blk += 1
    }
    bands
  }

  private val phashSchema = StructType(
    StructField("media_id", LongType, nullable = false) +:
      StructField("media_type", StringType, nullable = true) +:
      (0 until PhashBands).map(j => StructField(s"pb$j", IntegerType, nullable = false)))

  /** Per-media perceptual fingerprint through the batched mapPartitions
    * plumbing (`decodeFeatures`' shape): (media_id, media_type,
    * pb0..pb3) — the persistable artifact the near-dup tier joins on.
    */
  def perceptualHash(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "media_type", "content").rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val bands = stubPerceptual(r.getAs[Array[Byte]]("content"))
            Row.fromSeq(r.getLong(0) +: r.getString(1) +: bands.toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, phashSchema)
  }

  /** (media_id, pb0..pb3, band, bw) banding of a fingerprint table — the
    * equi-join key frame the batch self-join and the incremental probe
    * share.
    */
  private def bandedPhash(ph: DataFrame): DataFrame = {
    val bandStructs = (0 until PhashBands).map(j =>
      struct(lit(j).as("band"), col(s"pb$j").as("bw")))
    ph.withColumn("b", explode(array(bandStructs: _*)))
      .select(col("media_id") +: (0 until PhashBands).map(i => col(s"pb$i")) :+
        col("b.band").as("band") :+ col("b.bw").as("bw"): _*)
  }

  /** Exact Hamming distance between the two sides of a banded self-join. */
  private def bandedHamming =
    (0 until PhashBands).map(j =>
        bit_count(col(s"a.pb$j").cast("long").bitwiseXOR(col(s"b.pb$j").cast("long"))))
      .reduce(_ + _)

  /** The banded self-join over a PREBUILT fingerprint table — the serving
    * half of the perceptual pipeline (caller owns persistence of `ph`;
    * a parquet-backed index needs none).
    */
  def mediaNearDupPairsFromPhash(ph: DataFrame, maxHam: Int = PhashMaxHam): DataFrame = {
    val banded = bandedPhash(ph)
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bw") === col("b.bw") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        bandedHamming.cast("long").as("hamming"))
      .filter(col("hamming") <= maxHam)
      .distinct()
  }

  /** Incremental banded probe: candidate pairs with AT LEAST one endpoint
    * in `newPh`, canonicalized (media_a < media_b) — the
    * minhashLshPairsIncremental shape for the perceptual tier. When media
    * arrive in batches with unique media_ids, every pair is generated
    * exactly once (in the batch of its later endpoint), so appending each
    * batch's output reconstructs `mediaNearDupPairsFromPhash(allPh)`
    * exactly (StreamingMediaDedupSpec pins the equivalence).
    *
    * Scale: one banded equi-join of |batch|·4 band rows against the
    * accumulated fingerprint index — O(new collisions), never
    * history × history; production buckets the index by (band, bw).
    */
  def mediaNearDupPairsIncremental(
      newPh: DataFrame, allPh: DataFrame, maxHam: Int = PhashMaxHam): DataFrame = {
    val a = bandedPhash(newPh).as("a")
    val b = bandedPhash(allPh).as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bw") === col("b.bw") &&
        col("a.media_id") =!= col("b.media_id"))
      .select(
        least(col("a.media_id"), col("b.media_id")).as("media_a"),
        greatest(col("a.media_id"), col("b.media_id")).as("media_b"),
        bandedHamming.cast("long").as("hamming"))
      .filter(col("hamming") <= maxHam)
      .distinct()
  }

  /** Perceptual RETRIEVAL over a PREBUILT fingerprint table (the
    * StreamingMediaDedup phash index): for every query medium
    * (media_id % 100 = 0 — the deterministic querySet convention), the
    * top-`k` banded candidates ranked by exact 64-bit Hamming distance
    * (ASC, media_id tiebreak). This is media similarity SEARCH — "find
    * the k most visually similar items" — next to the pair/dedup tier's
    * thresholded "find everything within 8 bits": near-dup reposts rank
    * first, looser variants (re-encodes, crops under the stub codec's
    * block granularity) follow without needing a threshold picked in
    * advance.
    *
    * Scale: candidates come ONLY from the banded equi-join (any
    * identical 16-bit band word) — never all-pairs; per query the rank
    * is over its collision set, and on a (band, bw)-bucketed index the
    * probe ships no history-side exchange.
    */
  def mediaPhashTopKFromPhash(ph: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val banded = bandedPhash(ph)
    val a = banded.filter(col("media_id") % 100 === 0).as("a")
    val b = banded.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bw") === col("b.bw") &&
          col("a.media_id") =!= col("b.media_id"))
      .select(col("a.media_id").as("q_id"), col("b.media_id").as("media_id"),
        bandedHamming.cast("long").as("hamming"))
      .distinct()
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("hamming").asc, col("media_id").asc)
    cand.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("media_id"), col("hamming"))
  }

  /** `mediaPhashTopK` end-to-end over media bytes (fingerprint + rank) —
    * the inline twin of the from-index serve.
    */
  def mediaPhashTopK(media: DataFrame, k: Int = 5): DataFrame = {
    val ph = perceptualHash(media).persist()
    try mediaPhashTopKFromPhash(ph, k).eagerCkpt
    finally ph.unpersist()
  }

  /** Perceptual near-dup pairs over the media bytes: banded candidate
    * equi-join on any identical 16-bit fingerprint band, exact-Hamming
    * verify at ≤ `maxHam` of 64 bits (random pairs sit near 32). Output
    * (media_a, media_b, hamming). Owns its fingerprint cache (the
    * minhashLshPairs convention: eager pairs, release before return).
    */
  def mediaNearDupPairs(media: DataFrame, maxHam: Int = PhashMaxHam): DataFrame = {
    val ph = perceptualHash(media).persist()
    try mediaNearDupPairsFromPhash(ph, maxHam).eagerCkpt
    finally ph.unpersist()
  }

  /** Bucket-occupancy cap for the capped perceptual pair variant — the
    * saturation guard SCALING.md §1 prescribes: on low-entropy corpora
    * the 16-bit band words concentrate, buckets grow ∝ corpus, and the
    * banded join's candidate volume goes quadratic.
    */
  val MediaBucketCap = 32

  /** Per-band saturation audit of the perceptual banding: bucket counts,
    * the largest bucket, total candidate volume Σ C(m,2), and — against
    * `cap` — how many buckets and candidates the capped variant would
    * skip. THE report a curator reads before trusting either pair
    * variant at a new corpus: candidate_pairs exploding while
    * max_occupancy grows linearly is the §1 signature, and
    * candidates_over_cap is exactly the work (and recall) the cap
    * trades. Cost: one groupBy over the 4·|media| band rows — linear,
    * safe to run at any scale, unlike the join it audits.
    */
  def mediaBandStats(media: DataFrame, cap: Int = MediaBucketCap): DataFrame = {
    val ph = perceptualHash(media).persist()
    try {
      bandedPhash(ph).groupBy(col("band"), col("bw"))
        .agg(count(lit(1)).as("m"))
        .groupBy(col("band"))
        .agg(
          count(lit(1)).as("n_buckets"),
          max(col("m")).as("max_occupancy"),
          sum(col("m") * (col("m") - 1) / 2).cast("long").as("candidate_pairs"),
          sum(when(col("m") > cap, 1L).otherwise(0L)).as("n_buckets_over_cap"),
          sum(when(col("m") > cap, col("m") * (col("m") - 1) / 2)
            .otherwise(lit(0.0))).cast("long").as("candidates_over_cap"))
        .eagerCkpt
    } finally ph.unpersist()
  }

  /** OCCUPANCY-CAPPED perceptual pairs: the banded join skips buckets
    * above `cap`, bounding candidate volume by |media|·4·cap — linear no
    * matter how the banding saturates (the semanticDedupCapped
    * discipline applied to the media tier). Pairs whose EVERY shared
    * band bucket is oversized are missed — the documented recall trade,
    * quantified bucket-by-bucket by `mediaBandStats`; a pair sharing any
    * small bucket still surfaces, so planted near-identical twins
    * survive unless they sit inside a saturated crowd in all four bands.
    */
  def mediaNearDupPairsCapped(
      media: DataFrame, maxHam: Int = PhashMaxHam,
      cap: Int = MediaBucketCap): DataFrame = {
    val ph = perceptualHash(media).persist()
    try mediaNearDupPairsCappedFromPhash(ph, maxHam, cap).eagerCkpt
    finally ph.unpersist()
  }

  /** The capped banded self-join over a PREBUILT fingerprint table — the
    * serving half of the capped variant (the mediaNearDupPairsFromPhash
    * convention: caller owns persistence of `ph`; a parquet-backed index
    * needs none). This is what the composed media pipeline consumes: the
    * maintained artifact is the FINGERPRINT index, and both pair variants
    * are serve-time derivations of it, so the saturation cap is applied
    * against full-corpus bucket occupancy no matter which subset a
    * downstream gate selects.
    */
  def mediaNearDupPairsCappedFromPhash(
      ph: DataFrame, maxHam: Int = PhashMaxHam,
      cap: Int = MediaBucketCap): DataFrame = {
    val banded = bandedPhash(ph)
    val small = banded.join(
      banded.groupBy(col("band"), col("bw")).agg(count(lit(1)).as("m"))
        .filter(col("m") <= cap).select(col("band"), col("bw")),
      Seq("band", "bw"), "left_semi")
    val a = small.as("a")
    val b = small.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bw") === col("b.bw") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        bandedHamming.cast("long").as("hamming"))
      .filter(col("hamming") <= maxHam)
      .distinct()
  }

  // ======= ENTROPY-AWARE BANDING (SCALING.md §1, mitigation #1) =======
  //
  // The fixed banding slices the 64 blockhash bits into 4 CONSECUTIVE
  // 16-bit words — on low-entropy corpora adjacent blocks correlate and
  // whole band words concentrate on few values, so buckets grow ∝ corpus
  // and the banded join's candidate volume goes quadratic (the measured
  // 98× growth, SCALING.md §1). The OPQ trick applied to banding: MEASURE
  // per-bit balance over a cohort, rank bits by |p(set) − 0.5| (most
  // informative first, index tie-break), and deal them ROUND-ROBIN into
  // the 4 bands — every band mixes high- and low-entropy bits and
  // adjacent (correlated) blocks land in different bands. The assignment
  // is a trained 64-int artifact exactly like a quantizer's centroids:
  // train on a cohort, version it, cut it over with the QuantizerRefresh
  // train/commit discipline (data-dependent, but stable under a version).

  /** Per-bit set fraction over a fingerprint cohort — 64 driver-side
    * doubles (the training statistic; exact integer counts divided once,
    * so both engines derive identical doubles). Empty cohort → 0.5
    * everywhere (identity-equivalent assignment).
    */
  def trainBitFractions(ph: DataFrame): Array[Double] = {
    val aggs = count(lit(1)).cast("long").as("n") +:
      (0 until PhashBlocks).map { b =>
        sum(shiftright(col(s"pb${b / PhashBandBits}"), b % PhashBandBits)
          .bitwiseAND(lit(1))).cast("long").as(s"b$b")
      }
    val row = ph.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0)
    (0 until PhashBlocks).map { b =>
      if (n == 0L) 0.5 else row.getLong(b + 1).toDouble / n
    }.toArray
  }

  /** Deterministic band assignment from trained bit fractions: bits
    * ranked by (|p − 0.5| ASC, bit ASC), rank r → band r mod 4 at word
    * position r div 4. Returns bands(band)(pos) = source bit index — a
    * permutation of 0..63 (spec-pinned).
    */
  def entropyBandAssignment(fracs: Array[Double]): Array[Array[Int]] = {
    require(fracs.length == PhashBlocks, s"expected $PhashBlocks bit fractions")
    val ranked = (0 until PhashBlocks).sortBy(b => (math.abs(fracs(b) - 0.5), b))
    val bands = Array.fill(PhashBands)(new Array[Int](PhashBandBits))
    ranked.zipWithIndex.foreach { case (bit, r) =>
      bands(r % PhashBands)(r / PhashBands) = bit
    }
    bands
  }

  /** The entropy-banded word for one band: gather the band's assigned
    * source bits into a fresh 16-bit word (pure codegen'd integer
    * arithmetic over the stored pb words).
    */
  private def ebwCol(bits: Array[Int]): Column =
    bits.zipWithIndex.map { case (bit, pos) =>
      shiftleft(shiftright(col(s"pb${bit / PhashBandBits}"), bit % PhashBandBits)
        .bitwiseAND(lit(1)), pos)
    }.reduce(_ bitwiseOR _)

  /** (media_id, pb0..pb3, band, bw) banding under a trained assignment —
    * the entropy twin of `bandedPhash` (same downstream join shapes).
    */
  private def entropyBandedPhash(ph: DataFrame, asg: Array[Array[Int]]): DataFrame = {
    val bandStructs = (0 until PhashBands).map(j =>
      struct(lit(j).as("band"), ebwCol(asg(j)).cast("int").as("bw")))
    ph.withColumn("b", explode(array(bandStructs: _*)))
      .select(col("media_id") +: (0 until PhashBands).map(i => col(s"pb$i")) :+
        col("b.band").as("band") :+ col("b.bw").as("bw"): _*)
  }

  /** The §1 saturation audit under ENTROPY-SELECTED bands — same columns
    * as `mediaBandStats`, so a curator reads the two reports side by side
    * and sees exactly what the trained banding buys (candidate_pairs and
    * max_occupancy dropping on a low-entropy corpus; ≈unchanged on a
    * high-entropy one). Training + audit are two linear passes.
    */
  def mediaEntropyBandStats(media: DataFrame, cap: Int = MediaBucketCap): DataFrame = {
    val ph = perceptualHash(media).persist()
    try {
      val asg = entropyBandAssignment(trainBitFractions(ph))
      entropyBandedPhash(ph, asg).groupBy(col("band"), col("bw"))
        .agg(count(lit(1)).as("m"))
        .groupBy(col("band"))
        .agg(
          count(lit(1)).as("n_buckets"),
          max(col("m")).as("max_occupancy"),
          sum(col("m") * (col("m") - 1) / 2).cast("long").as("candidate_pairs"),
          sum(when(col("m") > cap, 1L).otherwise(0L)).as("n_buckets_over_cap"),
          sum(when(col("m") > cap, col("m") * (col("m") - 1) / 2)
            .otherwise(lit(0.0))).cast("long").as("candidates_over_cap"))
        .eagerCkpt
    } finally ph.unpersist()
  }

  /** Perceptual near-dup pairs under the trained entropy banding, with
    * the occupancy cap composed on top (both §1 defenses): candidates
    * from any shared entropy-band bucket at-or-under `cap`, exact-Hamming
    * verify over the ORIGINAL 64-bit fingerprint (banding never changes
    * the distance, only candidate generation). Same output contract as
    * the other pair variants.
    */
  def mediaNearDupPairsEntropy(
      media: DataFrame, maxHam: Int = PhashMaxHam,
      cap: Int = MediaBucketCap): DataFrame = {
    val ph = perceptualHash(media).persist()
    try {
      val asg = entropyBandAssignment(trainBitFractions(ph))
      val banded = entropyBandedPhash(ph, asg)
      val small = banded.join(
        banded.groupBy(col("band"), col("bw")).agg(count(lit(1)).as("m"))
          .filter(col("m") <= cap).select(col("band"), col("bw")),
        Seq("band", "bw"), "left_semi")
      val a = small.as("a")
      val b = small.as("b")
      a.join(b, col("a.band") === col("b.band") && col("a.bw") === col("b.bw") &&
          col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
          bandedHamming.cast("long").as("hamming"))
        .filter(col("hamming") <= maxHam)
        .distinct()
        .eagerCkpt
    } finally ph.unpersist()
  }

  /** Deterministic near-identical media planting (the plantedCorpus /
    * withPlantedBoilerplate convention): every `PlantEvery`-th doc gains a
    * twin whose bytes 10-12 are overwritten — a small LOCAL edit the
    * perceptual tier must still pair. The twin lands in the synthetic
    * `RepostSource` aggregator source (a scraper site reposting content
    * from everywhere), so the planted graph carries CROSS-SOURCE edges the
    * contamination audit must surface. Both engines apply the identical
    * string surgery, so the planted corpus is oracle-replayable.
    */
  val PlantEvery = 97
  val PlantOffset = 9000000L
  val RepostSource = "mirror"

  def withPlantedMediaDups(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
    val twins = base
      .filter(col("doc_id") % PlantEvery === 0 && length(col("text")) >= 64)
      .select((col("doc_id") + PlantOffset).as("doc_id"),
        concat(substring(col("text"), 1, 9), lit("zzz"),
          expr("substring(text, 13)")).as("text"),
        col("lang"), lit(RepostSource).as("source"))
    base.unionByName(twins)
  }

  /** Cross-source media contamination matrix over a PREBUILT perceptual
    * pair graph (the image-reposting twin of `sourceContaminationFrom`):
    * which sources host perceptually near-identical payloads of which —
    * the audit behind per-source mix weights for media corpora. Unordered
    * source pair canonicalized via least/greatest; off-diagonal rows are
    * the reposts. Two media-id equi-joins + one hash agg over the
    * ≤|sources|² matrix — the corpus is only read by the fingerprint
    * build.
    */
  def mediaSourceContaminationFrom(pairs: DataFrame, media: DataFrame): DataFrame = {
    val src = media.select(col("media_id"), col("meta.source").as("source"))
    pairs
      .join(src.select(col("media_id").as("media_a"), col("source").as("sa")), Seq("media_a"))
      .join(src.select(col("media_id").as("media_b"), col("source").as("sb")), Seq("media_b"))
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"), col("hamming"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"), round(avg(col("hamming")), 6).as("mean_hamming"))
  }

  // ======= ARROW-BATCH DECODE (the 100 TB production codec contract) =======

  /** Arrow schema of one decode input batch: exactly the columns a native
    * codec needs, as columnar buffers it can read without JVM round-trips.
    */
  private def arrowInputSchema: org.apache.arrow.vector.types.pojo.Schema = {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field}
    new org.apache.arrow.vector.types.pojo.Schema(java.util.Arrays.asList(
      Field.nullable("media_id", new ArrowType.Int(64, true)),
      Field.nullable("media_type", ArrowType.Utf8.INSTANCE),
      Field.nullable("content", ArrowType.Binary.INSTANCE)))
  }

  /** Arrow schema of one decode output batch: pass-through keys plus
    * fixed-width feature columns (f0..f7 as FLOAT8 vectors — fixed-width
    * stays columnar; a list vector would re-introduce offsets for no gain).
    */
  private def arrowOutputSchema: org.apache.arrow.vector.types.pojo.Schema = {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field}
    import org.apache.arrow.vector.types.FloatingPointPrecision
    val fs = Seq(
      Field.nullable("media_id", new ArrowType.Int(64, true)),
      Field.nullable("media_type", ArrowType.Utf8.INSTANCE),
      Field.nullable("n_bytes", new ArrowType.Int(32, true))) ++
      (0 until FeatureCount).map(i =>
        Field.nullable(s"f$i", new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)))
    new org.apache.arrow.vector.types.pojo.Schema(
      scala.jdk.CollectionConverters.SeqHasAsJava(fs).asJava)
  }

  /** ======= STUB ARROW CODEC =======
    * The production decode boundary: ONE Arrow record batch in, one out.
    * This is the signature a JNI/FFI media codec exports — the input
    * VectorSchemaRoot's validity/offset/data ArrowBufs are off-heap and can
    * cross the native boundary zero-copy (Arrow C Data Interface); the stub
    * reads them through the JVM accessors and computes the same byte
    * moments as `stubDecode`, so the two decode paths are verifiably
    * identical. Caller owns both roots.
    */
  def stubArrowCodec(
      in: org.apache.arrow.vector.VectorSchemaRoot,
      out: org.apache.arrow.vector.VectorSchemaRoot): Unit = {
    import org.apache.arrow.vector.{BigIntVector, Float8Vector, IntVector, VarBinaryVector, VarCharVector}
    val n = in.getRowCount
    val ids = in.getVector("media_id").asInstanceOf[BigIntVector]
    val types = in.getVector("media_type").asInstanceOf[VarCharVector]
    val content = in.getVector("content").asInstanceOf[VarBinaryVector]
    val oIds = out.getVector("media_id").asInstanceOf[BigIntVector]
    val oTypes = out.getVector("media_type").asInstanceOf[VarCharVector]
    val oBytes = out.getVector("n_bytes").asInstanceOf[IntVector]
    val oF = (0 until FeatureCount).map(i => out.getVector(s"f$i").asInstanceOf[Float8Vector])
    out.allocateNew()
    var i = 0
    while (i < n) {
      oIds.setSafe(i, ids.get(i))
      if (types.isNull(i)) oTypes.setNull(i) else oTypes.setSafe(i, types.get(i))
      val bytes = if (content.isNull(i)) null else content.get(i)
      oBytes.setSafe(i, if (bytes == null) 0 else bytes.length)
      val feats = stubDecode(bytes)
      var j = 0
      while (j < FeatureCount) { oF(j).setSafe(i, feats(j)); j += 1 }
      i += 1
    }
    out.setRowCount(n)
  }

  /** `decodeFeatures` through the Arrow record-batch interface: each task
    * slices its partition into `batchSize`-row Arrow batches (peak memory =
    * one batch of payload buffers per task, exactly the mapInArrow batch
    * shape), hands each batch to the codec at the VectorSchemaRoot boundary,
    * and re-emits the output batch as rows. Row-identical to
    * `decodeFeatures` by construction (MultimodalSpec asserts it); swap
    * `stubArrowCodec` for an FFI codec and nothing else changes. Allocation
    * hygiene: one RootAllocator per task, closed (leak-checked by Arrow) on
    * task completion; both roots closed per batch.
    */
  def decodeFeaturesArrow(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val inSchemaJson = arrowInputSchema.toJson
    val outSchemaJson = arrowOutputSchema.toJson
    val rdd = media.select("media_id", "media_type", "content").rdd
      .mapPartitions { it =>
        import org.apache.arrow.vector.{BigIntVector, Float8Vector, IntVector, VarBinaryVector, VarCharVector, VectorSchemaRoot}
        import org.apache.arrow.vector.types.pojo.{Schema => ASchema}
        val allocator = new org.apache.arrow.memory.RootAllocator()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => allocator.close()))
        val inSchema = ASchema.fromJSON(inSchemaJson)
        val outSchema = ASchema.fromJSON(outSchemaJson)
        it.grouped(batchSize).flatMap { batch =>
          val in = VectorSchemaRoot.create(inSchema, allocator)
          val out = VectorSchemaRoot.create(outSchema, allocator)
          try {
            in.allocateNew()
            val ids = in.getVector("media_id").asInstanceOf[BigIntVector]
            val types = in.getVector("media_type").asInstanceOf[VarCharVector]
            val content = in.getVector("content").asInstanceOf[VarBinaryVector]
            batch.zipWithIndex.foreach { case (r, i) =>
              ids.setSafe(i, r.getLong(0))
              if (r.isNullAt(1)) types.setNull(i)
              else types.setSafe(i, r.getString(1).getBytes("UTF-8"))
              val c = r.getAs[Array[Byte]]("content")
              if (c == null) content.setNull(i) else content.setSafe(i, c)
            }
            in.setRowCount(batch.size)
            stubArrowCodec(in, out)
            val oIds = out.getVector("media_id").asInstanceOf[BigIntVector]
            val oTypes = out.getVector("media_type").asInstanceOf[VarCharVector]
            val oBytes = out.getVector("n_bytes").asInstanceOf[IntVector]
            val oF = (0 until FeatureCount).map(i => out.getVector(s"f$i").asInstanceOf[Float8Vector])
            // materialize rows BEFORE closing the roots (their buffers back the accessors)
            (0 until out.getRowCount).map { i =>
              Row(oIds.get(i),
                if (oTypes.isNull(i)) null else new String(oTypes.get(i), "UTF-8"),
                oBytes.get(i),
                (0 until FeatureCount).map(j => oF(j).get(i)).toArray.toSeq)
            }.toList
          } finally { out.close(); in.close() }
        }
      }
    val scalars = (0 until FeatureCount)
      .map(i => round(element_at(col("features"), i + 1), 6).as(s"f$i"))
    spark.createDataFrame(rdd, decodeSchema)
      .select(Seq(col("media_id"), col("media_type"), col("n_bytes")) ++ scalars: _*)
  }
}

package graft.ops

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
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off synthetic-corpus generator for the SCALING.md audit: writes
  * `documents.parquet`, `embeddings.parquet`, and `events.parquet` shaped
  * like the harness testdata (same columns/dtypes, same planted-dup and
  * cluster structure) at an arbitrary row count, so the operator families
  * can be measured at 1x/3x/10x/30x of the bench SF and their wall-time-
  * vs-rows exponents fitted from real runs instead of plan-shape
  * arguments.
  *
  * Generation is fully distributed and deterministic: every cell derives
  * from `xxhash64(seed, id, tag)` — no driver-side row materialization,
  * no RNG state, so the same (n, seed) reproduces bit-identical corpora
  * at any partitioning and the tool itself scales to any size the audit
  * ever needs.
  *
  * Planted structure (mirrors the testdata's, density-preserving):
  *  - documents: every 100th doc is an EXACT dup of its predecessor,
  *    every other 50th a one-word-off NEAR dup — so exact dedup, MinHash
  *    LSH, and the CC fixpoint all see O(n) planted pairs.
  *  - embeddings: 10 label clusters with hash-noise around fixed axis
  *    centers — so IVF/PQ/graph tiers see realistic cell occupancy.
  *  - events: `nUsers` scales with n (user-quadratic shapes must show).
  *
  * Usage: ScaleGen <outDir> <nDocs> <nVecs> <nEvents> <nUsers> [seed]
  */
object ScaleGen {

  private val Vocab: Seq[String] = Seq(
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "line", "sort", "window", "plan",
    "join", "shard", "block", "page", "index", "probe", "build", "spill",
    "cache", "codec", "split", "stage", "task", "query")

  def main(args: Array[String]): Unit = {
    require(args.length >= 5,
      "usage: ScaleGen <outDir> <nDocs> <nVecs> <nEvents> <nUsers> [seed]")
    val Array(outDir, nDocsS, nVecsS, nEventsS, nUsersS) = args.take(5)
    val (nDocs, nVecs, nEvents, nUsers) =
      (nDocsS.toLong, nVecsS.toLong, nEventsS.toLong, nUsersS.toLong)
    val seed = if (args.length > 5) args(5).toLong else 42L

    val spark = SparkSession.builder()
      .appName("graft-scale-gen")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      // h(tag, id) in [0, m): the one deterministic randomness primitive
      def h(tag: String, id: org.apache.spark.sql.Column, m: Long) =
        pmod(xxhash64(lit(seed), lit(tag), id), lit(m))

      // ---- documents ----------------------------------------------------
      val docs = spark.range(nDocs).select(col("id").as("doc_id"))
        .withColumn("base_id", // dup plants copy the PREDECESSOR's text
          when(col("doc_id") % 100 === 99 || col("doc_id") % 50 === 49,
            col("doc_id") - 1).otherwise(col("doc_id")))
        .withColumn("n_words", lit(10) + h("len", col("base_id"), 100))
        .withColumn("words", transform(
          sequence(lit(1), col("n_words")),
          i => element_at(
            array(Vocab.map(lit(_)): _*),
            (pmod(xxhash64(lit(seed), lit("w"), col("base_id"), i),
              lit(Vocab.size.toLong)) + 1).cast("int"))))
        .withColumn("words", // near dup = predecessor with the last word off
          when(col("doc_id") % 50 === 49 && col("doc_id") % 100 =!= 99,
            concat(slice(col("words"), lit(1), col("n_words") - 1),
              array(lit("offword"))))
            .otherwise(col("words")))
        .withColumn("text", array_join(col("words"), " "))
        .withColumn("lang", element_at(
          array(lit("en"), lit("en"), lit("de"), lit("es"), lit("fr"), lit("zh")),
          (h("lang", col("doc_id"), 6) + 1).cast("int")))
        .withColumn("source",
          concat(lit("src"), h("src", col("doc_id"), 20).cast("string")))
        .withColumn("n_chars", length(col("text")))
        .select("doc_id", "text", "lang", "source", "n_chars")
      docs.write.mode("overwrite").parquet(s"$outDir/documents.parquet")

      // ---- embeddings ---------------------------------------------------
      // label cluster c centers on axis pair (c, c+10) of the 64-dim cube;
      // coords = center +- hash noise in [-0.25, 0.25)
      val emb = spark.range(nVecs).select(col("id").as("vec_id"))
        .withColumn("label", h("lbl", col("vec_id"), 10).cast("int"))
        .withColumn("embedding", transform(
          sequence(lit(0), lit(63)),
          i => {
            val noise = (pmod(
              xxhash64(lit(seed), lit("e"), col("vec_id"), i),
              lit(1000L)).cast("double") / 1000.0 - 0.5) * 0.5
            val center = when(i === col("label") || i === col("label") + 10,
              lit(1.0)).otherwise(lit(0.0))
            (center + noise).cast("float")
          }))
        .select("vec_id", "embedding", "label")
      emb.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

      // ---- events -------------------------------------------------------
      val types = array(lit("view"), lit("click"), lit("purchase"),
        lit("error"), lit("login"))
      val events = spark.range(nEvents).select(col("id").as("event_id"))
        // ts advances ~1s per event with hash jitter, like the testdata's
        .withColumn("ts", timestamp_micros(
          lit(1704067200000000L) + col("event_id") * 1000000L +
            h("jit", col("event_id"), 1000000L)))
        .withColumn("user_id", h("usr", col("event_id"), nUsers))
        .withColumn("event_type",
          element_at(types, (h("typ", col("event_id"), 5) + 1).cast("int")))
        .withColumn("value",
          (h("val", col("event_id"), 20000L).cast("double") / 100.0))
        .withColumn("props", concat(lit("{\"k\": "),
          h("prp", col("event_id"), 100).cast("string"), lit("}")))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
      events.write.mode("overwrite").parquet(s"$outDir/events.parquet")

      println(s"""{"outDir":"$outDir","nDocs":$nDocs,"nVecs":$nVecs,""" +
        s""""nEvents":$nEvents,"nUsers":$nUsers,"seed":$seed}""")
    } finally spark.stop()
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Deterministic corpus sampling for training-data pipelines: stratified
  * keep-rates per stratum plus a train/validation split, both driven by the
  * portable document hash — no RNG state, so any subset is reproducible
  * from the doc_id alone, membership is stable under corpus growth
  * (adding documents never flips existing decisions — the property
  * rand()-based sampling lacks), and the DuckDB oracle replays bit-identical
  * decisions.
  *
  * Scale: one narrow projection + filter over the corpus; no shuffle, no
  * driver state. Rates are integer PARTS-PER-MILLION so the keep threshold
  * is exact integer arithmetic in every engine (a double rate like 0.7
  * would make the cutoff depend on float rounding).
  */
object Sampling {

  /** Per-language keep rates (ppm) — an upsample-English / downsample-zh
    * mix of the kind LLM data recipes pin per source or language.
    */
  val DefaultRatesPpm: Seq[(String, Long)] = Seq(
    "en" -> 1000000L, "de" -> 700000L, "fr" -> 700000L, "es" -> 700000L,
    "zh" -> 500000L)
  val DefaultPpm: Long = 300000L

  /** Validation share: 100/1000 hashed docs (an independent hash stream
    * from the sampling decision, so val membership is unbiased within every
    * stratum).
    */
  val ValPerMille: Long = 100L

  /** Sampled corpus with split assignment: keep doc iff
    * hash("samp", doc_id) mod 1e6 < rate_ppm(lang); split = "val" for
    * hash("split", doc_id) mod 1000 < 100 else "train".
    */
  def stratifiedSample(
      docs: DataFrame,
      ratesPpm: Seq[(String, Long)] = DefaultRatesPpm,
      defaultPpm: Long = DefaultPpm,
      hash: (String, Column) => Column = PortableHash.h31): DataFrame = {
    val ppm = ratesPpm.foldRight(lit(defaultPpm)) { case ((l, r), e) =>
      when(col("lang") === l, lit(r)).otherwise(e)
    }
    docs
      .withColumn("u", pmod(hash("samp", col("doc_id").cast("string")), lit(1000000L)))
      .filter(col("u") < ppm)
      .select(col("doc_id"), col("lang"), col("source"),
        when(pmod(hash("split", col("doc_id").cast("string")), lit(1000L)) < ValPerMille,
          lit("val")).otherwise(lit("train")).as("split"))
  }
}

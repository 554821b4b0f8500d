package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector/similarity-search operators over `embeddings`
  * (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT).
  *
  * All arithmetic is done in DOUBLE via codegen'd higher-order functions
  * (`zip_with` product + sequential `aggregate` fold — no UDFs), and every
  * emitted similarity is rounded to 6 decimals so results are bit-stable
  * across engines regardless of accumulation-order ulps.
  *
  * Scale design:
  *  - brute-force top-k broadcasts the (small) query set against the
  *    distributed corpus: one narrow pass + one shuffle for the per-query
  *    top-k — the right baseline up to ~10⁹ corpus rows;
  *  - IVF partitions the corpus by nearest coarse centroid so each query
  *    probes 1/C of the data; the centroid assignment is itself a broadcast
  *    join (centroid table is tiny). At 100 TB the corpus side stays
  *    partitioned/bucketed by centroid id so probe queries touch only the
  *    matching buckets.
  */
object VectorOps {

  /** Elementwise-double cosine similarity between two array columns.
    * Sequential left-fold matches the oracle's accumulation order; any
    * residual ulp drift is removed by the caller's 6-decimal rounding.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0),
        (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Near-duplicate pairs by embedding cosine ≥ threshold.
    * All-pairs at test scale (the correctness baseline); the LSH/IVF
    * variants below are the scale path for candidate generation.
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double = 0.35): DataFrame = {
    val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), round(cosine(col("ea"), col("eb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Deterministic query subset: every 100th vector. */
  def querySet(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  /** Brute-force cosine top-k per query (the exact-ANN baseline):
    * broadcast the query set, rank with a window over rounded similarity
    * with vec_id tie-break (fully deterministic ordering).
    */
  def bruteForceTopK(emb: DataFrame, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = querySet(emb)
    val scored = broadcast(q).join(emb, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Coarse centroids = per-label mean vector, components rounded to 6
    * decimals (stand-in for one k-means iteration; label plays the cluster-id
    * role so the oracle can replay it — a production build would iterate
    * k-means over a sample and broadcast the result identically).
    */
  def centroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v").cast("double")).as("m"))
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        s => round(s.getField("m"), 6)).as("centroid"))

  /** IVF top-k (nprobe=1): assign every corpus vector and every query to its
    * nearest coarse centroid (broadcast join against the tiny centroid
    * table), then search only the query's cell. ~C× less distance work than
    * brute force; recall depends on cell boundaries, measured against
    * `bruteForceTopK` in tests.
    */
  def ivfTopK(emb: DataFrame, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = centroids(emb)

    def assign(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
      val scored = df.join(broadcast(cents))
        .select(col(idCol), col(vecCol),
          col("label").as("cell"),
          round(cosine(col(vecCol), col("centroid")), 6).as("ccos"))
      val w = Window.partitionBy(col(idCol)).orderBy(col("ccos").desc, col("cell").asc)
      scored.withColumn("r", row_number().over(w)).filter(col("r") === 1)
        .select(col(idCol), col(vecCol), col("cell"))
    }

    val corpus = assign(
      emb.select(col("vec_id"), col("embedding")), "embedding", "vec_id")
    val queries = assign(querySet(emb), "q_emb", "q_id")

    val scored = broadcast(queries).join(corpus,
        col("q_id") =!= col("vec_id") && queries("cell") === corpus("cell"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}

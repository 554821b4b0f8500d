package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ArrayDotProduct.dot

/** Vector/similarity-search operators over `embeddings`
  * (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT).
  *
  * All arithmetic runs in DOUBLE through the native codegen'd
  * ArrayDotProduct expression (a tight fused loop — the higher-order
  * `aggregate`/`zip_with` route is a CodegenFallback, ~50× slower on the
  * 2M-pair join at sf0.1). Every emitted similarity is rounded to 6
  * decimals so results are bit-stable across engines regardless of
  * accumulation-order ulps.
  *
  * Scale design:
  *  - per-vector norms are computed ONCE in a narrow projection and carried
  *    through the join (3× fewer inner loops than per-pair norms; at 10⁹
  *    rows that's the difference between one corpus pass and three);
  *  - brute-force top-k broadcasts the (small) query set against the
  *    distributed corpus: one narrow pass + one shuffle for the per-query
  *    top-k — the right baseline up to ~10⁹ corpus rows;
  *  - IVF partitions the corpus by nearest coarse centroid so each query
  *    probes 1/C of the data; the centroid table is broadcast. At 100 TB
  *    the corpus stays bucketed by centroid id so probes touch only
  *    matching buckets.
  */
object VectorOps {

  /** Cosine similarity between two array columns (float arrays are cast to
    * double element-wise). cos = dot/(sqrt(dot_aa)·sqrt(dot_bb)) — the same
    * operation order as the DuckDB oracle's expression.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** (id, vector, precomputed sqrt-norm) projection. */
  private def withNorm(emb: DataFrame, idAlias: String, vecAlias: String, normAlias: String): DataFrame =
    emb.select(
      col("vec_id").as(idAlias),
      col("embedding").cast("array<double>").as(vecAlias),
      sqrt(dot(col("embedding"), col("embedding"))).as(normAlias))

  /** Near-duplicate pairs by embedding cosine ≥ threshold.
    * All-pairs at test scale (the correctness baseline); LSH/IVF candidate
    * generation is the scale path.
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double = 0.35): DataFrame = {
    val a = withNorm(emb, "vec_a", "va", "na")
    val b = withNorm(emb, "vec_b", "vb", "nb")
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos"))
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
    val q = withNorm(emb.filter(col("vec_id") % 100 === 0), "q_id", "qv", "qn")
    val c = withNorm(emb, "neighbor_id", "cv", "cn")
    val scored = broadcast(q).join(c, col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos"))
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
      .select(col("vec_id"), col("cell"),
        col("embedding").cast("array<double>").as("cv"),
        sqrt(dot(col("embedding"), col("embedding"))).as("cn"))
    val queries = assign(querySet(emb), "q_emb", "q_id")
      .select(col("q_id"), col("cell"),
        col("q_emb").cast("array<double>").as("qv"),
        sqrt(dot(col("q_emb"), col("q_emb"))).as("qn"))

    val scored = broadcast(queries).join(corpus,
        col("q_id") =!= col("vec_id") && queries("cell") === corpus("cell"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}

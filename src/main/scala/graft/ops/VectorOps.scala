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

  /** Random-hyperplane LSH geometry (SimHash-for-vectors, Charikar STOC'02):
    * `LshPlanes` = bands × rows signature bits; bit j = sign of the dot
    * product with hyperplane j. Collision probability per bit for vectors at
    * angle θ is 1 − θ/π, so banding (any of `LshBands` whole r-bit bands
    * matching) tunes the recall/candidate tradeoff exactly like MinHash-LSH.
    * 12×3 holds recall ≈0.97 at the loose cos≥0.35 default (P(bit)=0.61 at
    * the boundary); tighter thresholds need fewer bands.
    */
  val LshBands = 12
  val LshRows = 3
  val LshPlanes: Int = LshBands * LshRows
  val LshDim = 64

  /** Deterministic ±1 hyperplane components from a fixed 64-bit LCG (same
    * construction as Dedup.minhashSeeds; bit 40 of the state — low LCG bits
    * alternate). Pure values shared verbatim with the generated oracle SQL,
    * so Spark and DuckDB band identically by construction. Rademacher (±1)
    * entries are a standard substitute for Gaussian hyperplanes and keep the
    * per-plane dot exactly replayable as a SQL literal list.
    */
  val lshSigns: Array[Array[Double]] = {
    var x = 0x51ED2701L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; x }
    Array.fill(LshPlanes, LshDim)(if (((next() >>> 40) & 1L) == 1L) 1.0 else -1.0)
  }

  /** 36-bit signature column: bit j set iff round(v·hⱼ, 6) ≥ 0. The rounding
    * is the repo-wide cross-engine float convention — a raw sign test could
    * flip on accumulation-order ulps between engines when a dot lands on
    * ~±1e-16. Each plane is a constant-folded literal array through the
    * codegen'd ArrayDotProduct: one fused 64-wide loop per plane, no shuffle.
    */
  def hyperplaneSignature(vec: Column): Column =
    lshSigns.zipWithIndex.map { case (plane, j) =>
      val h = array(plane.map(lit(_)): _*)
      when(round(dot(vec, h), 6) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Near-duplicate pairs via random-hyperplane LSH — the bucketed scale
    * path for `cosineNearDupPairs`. One narrow pass computes the signature
    * (at 100 TB you persist this table, bucketed by band value), the banded
    * self-equi-join generates O(collisions) candidates — never the n² cross
    * product — and the exact rounded-cosine filter on candidates keeps
    * precision at 1.0. Recall vs the brute-force pair set is measured in
    * VectorOpsSpec (≥0.9 required at sf0.01; ≈0.97 observed).
    */
  /** Exploded (vec_id, band, bv) band-bucket table for a signature column —
    * at 100 TB this is the table you persist, bucketed by (band, bv), so
    * every later candidate join is exchange-free (proven in VectorOpsSpec's
    * bucketed-layout test).
    */
  def lshBands(sig: DataFrame): DataFrame = {
    val bands = (0 until LshBands).map { j =>
      struct(lit(j).as("band"),
        shiftright(col("sig"), LshRows * j).bitwiseAND(lit((1L << LshRows) - 1)).as("bv"))
    }
    sig.select(col("vec_id"), explode(array(bands: _*)).as("b"))
      .select(col("vec_id"), col("b.band").as("band"), col("b.bv").as("bv"))
  }

  def lshNearDupPairs(emb: DataFrame, threshold: Double = 0.35): DataFrame = {
    // signature table: one row/vec; read 3× (banding + both join sides)
    val sig = emb.select(
        col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("sig", hyperplaneSignature(col("v")))
      .persist()
    val banded = lshBands(sig)
    // distinct BEFORE the cosine: a pair colliding in several bands is
    // scored once, not once per collision
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val va = sig.select(col("vec_id").as("vec_a"), col("v").as("va"),
      sqrt(dot(col("v"), col("v"))).as("na"))
    val vb = sig.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      sqrt(dot(col("v"), col("v"))).as("nb"))
    cand.join(va, "vec_a").join(vb, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Near-duplicate pairs by embedding cosine ≥ threshold.
    * All-pairs at test scale (the exactness baseline for `lshNearDupPairs`,
    * which is the default scale path).
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double = 0.35): DataFrame = {
    val a = withNorm(emb, "vec_a", "va", "na")
    val b = withNorm(emb, "vec_b", "vb", "nb")
    val cos = round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
    // both predicates live in the join condition, id-test FIRST: a
    // post-filter would get pushed in AHEAD of the original condition and
    // the per-pair dot product would run on all n² ordered pairs instead
    // of n²/2 (measured 2× on the nested-loop baseline)
    a.join(b, col("vec_a") < col("vec_b") && cos >= threshold)
      .select(col("vec_a"), col("vec_b"), cos.as("cos"))
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

  /** Lloyd-iterated k-means coarse centroids (the production quantizer; the
    * label-mean `centroids` is the oracle-replayable stand-in). Deterministic
    * end to end: init picks the k vectors with the smallest Fibonacci-hashed
    * ids (a seeded pseudo-random spread), assignment ties break on lowest
    * cell, and every component is rounded to 6 decimals per iteration so
    * partial-sum order cannot leak in. Each iteration aggregates k×dim
    * doubles — that tiny result is collected and re-broadcast as literals
    * (exactly MLlib KMeans' shape: the driver loop is over an aggregate,
    * never the data).
    */
  def kmeansCentroids(emb: DataFrame, k: Int = 16, iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = emb.sparkSession
    val v = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val wInit = Window.orderBy(pmod(col("vec_id") * 2654435761L, lit(2147483647L)), col("vec_id"))
    var cents: Array[(Int, Seq[Double])] = v
      .withColumn("r", row_number().over(wInit)).filter(col("r") <= k)
      .select(col("r") - 1, col("v")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))

    for (_ <- 0 until iters) {
      val centDf = spark.createDataFrame(cents.toSeq.map { case (c, m) => (c, m) })
        .toDF("cell", "centroid")
      val w = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cell").asc)
      val assigned = v.join(broadcast(centDf))
        .select(col("vec_id"), col("v"), col("cell"),
          round(cosine(col("v"), col("centroid")), 6).as("ccos"))
        .withColumn("r", row_number().over(w)).filter(col("r") === 1)
      val means = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => round(s.getField("m"), 6)).as("centroid"))
      // k×dim doubles — empty cells drop out (standard Lloyd behavior)
      cents = means.collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    }
    spark.createDataFrame(cents.toSeq.map { case (c, m) => (c, m) }).toDF("cell", "centroid")
  }

  /** IVF top-k: assign every corpus vector to its nearest coarse centroid
    * (broadcast join against the tiny centroid table); each query probes its
    * `nprobe` nearest cells. ~C/nprobe× less distance work than brute force;
    * recall rises with nprobe (measured against `bruteForceTopK` in
    * VectorOpsSpec — the accuracy/cost knob a production deployment tunes).
    * A corpus vector lives in exactly one cell, so probing several cells
    * never produces duplicate (query, neighbor) candidates.
    */
  def ivfTopK(
      emb: DataFrame,
      k: Int = 10,
      nprobe: Int = 1,
      coarse: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // (cell, centroid) table: label-means by default (oracle-replayable),
    // or a caller-supplied quantizer (e.g. kmeansCentroids)
    val cents = coarse.getOrElse(
      centroids(emb).select(col("label").as("cell"), col("centroid")))

    def assign(df: DataFrame, vecCol: String, idCol: String, probes: Int): DataFrame = {
      val scored = df.join(broadcast(cents))
        .select(col(idCol), col(vecCol), col("cell"),
          round(cosine(col(vecCol), col("centroid")), 6).as("ccos"))
      val w = Window.partitionBy(col(idCol)).orderBy(col("ccos").desc, col("cell").asc)
      scored.withColumn("r", row_number().over(w)).filter(col("r") <= probes)
        .select(col(idCol), col(vecCol), col("cell"))
    }

    val corpus = assign(
      emb.select(col("vec_id"), col("embedding")), "embedding", "vec_id", probes = 1)
      .select(col("vec_id"), col("cell"),
        col("embedding").cast("array<double>").as("cv"),
        sqrt(dot(col("embedding"), col("embedding"))).as("cn"))
    val queries = assign(querySet(emb), "q_emb", "q_id", probes = nprobe)
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

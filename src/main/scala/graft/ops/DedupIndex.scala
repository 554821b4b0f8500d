package graft.ops

import org.apache.spark.sql.{AnalysisException, Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.PortableHash

/** The persisted NEAR-DUP GRAPH artifact — the from-index pattern the ANN
  * family (StreamingAnnIngest → `*FromIndex`) and retrieval family
  * (StreamingTextIngest → `bm25_from_index_topk`) already use, applied to
  * the dedup graph: one build writes the three tables every
  * graph/survivorship report consumes, and the reports serve FROM them
  * instead of re-running the LSH + LPA + CC chain per query.
  *
  *   pairs/       (doc_a, doc_b, est_jaccard)  — the banded LSH candidate
  *                pair graph (Dedup.minhashLshPairs)
  *   labels/      (node, community)            — weighted-LPA communities
  *                over the pair graph (Graph.labelPropagationWeighted)
  *   components/  (doc_id, rep)                — EXACT connected components
  *                (Dedup.nearDupComponentsExact fixpoint)
  *
  * Why an artifact: at 100 TB the pair graph is derived once per corpus
  * version (or maintained incrementally — StreamingComponents already
  * folds the component table per micro-batch; StreamingDedup accumulates
  * the band index), and every downstream report — modularity, k-core,
  * triangles, PageRank, granularity/policy/gated survivorship — is a
  * pair-graph-sized query over the SAME three tables. Recomputing MinHash
  * signatures per report is the design flaw this removes; before this
  * artifact, one identical LSH+LPA+CC chain ran ~8× across the report
  * suite.
  *
  * Production layout notes (beyond this local build): bucket `pairs` by
  * doc_a and `components`/`labels` by their key so report joins co-locate;
  * keep corpus versions in `v=N` subdirs with a commit marker (the
  * QuantizerRefresh cutover pattern) so readers never observe a
  * half-written build.
  *
  * From-artifact ≡ inline is spec-pinned (DedupIndexSpec), and the driver
  * oracle re-proves it per round: the registered queries keep their
  * inline-derived oracle SQL, so a hash-green run certifies the artifact
  * path reproduces the inline build bit-for-bit.
  */
object DedupIndex {

  /** The three artifact frames, as read back from a built index. */
  final case class Frames(pairs: DataFrame, labels: DataFrame, components: DataFrame)

  private val pairsSchema = StructType(Seq(
    StructField("doc_a", LongType),
    StructField("doc_b", LongType),
    StructField("est_jaccard", DoubleType)))

  private val labelsSchema = StructType(Seq(
    StructField("node", LongType),
    StructField("community", LongType)))

  private val componentsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("rep", LongType)))

  /** Build the artifact under `dir`: derive the pair graph once, then the
    * label and component tables FROM it (the signature pipeline runs
    * exactly once — the pair frame is persisted and both iterative
    * algorithms read the cache). Overwrites any prior build.
    */
  def build(
      docs: DataFrame,
      dir: String,
      hash: (String, Column) => Column = PortableHash.h31): Unit = {
    // own the signature cache: minhashLshPairs persists its internal
    // signature table and never releases it — fine for a one-shot query
    // whose session ends, but the artifact build runs inside long-lived
    // bench/driver processes where a corpus-sized cache with zero future
    // readers (every report serves from parquet afterwards) would stay
    // pinned until LRU eviction
    val sig = Dedup.minhashSignatures(docs, hash).persist()
    try {
      val pairs = Dedup.minhashLshPairsFromSignatures(sig, hash).persist()
      try {
        pairs.write.mode("overwrite").parquet(s"$dir/pairs")
        Graph.labelPropagationWeighted(pairs.withColumnRenamed("est_jaccard", "weight"))
          .write.mode("overwrite").parquet(s"$dir/labels")
        Dedup.nearDupComponentsExact(pairs)
          .write.mode("overwrite").parquet(s"$dir/components")
      } finally pairs.unpersist()
    } finally sig.unpersist()
  }

  private def readOr(spark: SparkSession, path: String, schema: StructType): DataFrame =
    try spark.read.schema(schema).parquet(path)
    catch {
      case _: AnalysisException =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    }

  /** Read the three artifact tables (declared schemas — no inference scan;
    * empty frames if the index was never built, so composed reports
    * degrade to the no-duplicates answer instead of failing).
    */
  def read(spark: SparkSession, dir: String): Frames = Frames(
    pairs = readOr(spark, s"$dir/pairs", pairsSchema),
    labels = readOr(spark, s"$dir/labels", labelsSchema),
    components = readOr(spark, s"$dir/components", componentsSchema))

  /** Build then read back — the one-call form local pipelines use. */
  def buildAndRead(
      docs: DataFrame,
      dir: String,
      hash: (String, Column) => Column = PortableHash.h31): Frames = {
    build(docs, dir, hash)
    read(docs.sparkSession, dir)
  }
}

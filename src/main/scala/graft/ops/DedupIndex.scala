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
  *   components3/ (doc_id, rep)                — BOUNDED-HOP components
  *                (Dedup.nearDupComponents, 3 iterations — the documented
  *                approximation contract several reports serve under)
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

  /** The four artifact frames, as read back from a built index.
    * `components3` is the bounded-hop (3-iteration) component table — the
    * serving twin of `components` for every report whose contract is the
    * bounded approximation (dedup_components, dedup_cluster_stats,
    * leakage_safe_split): before it existed those queries re-ran the
    * 3-iteration join chain from `pairs` on every serve, the direct cause
    * of the round-9 dedup-family bench regression.
    */
  final case class Frames(pairs: DataFrame, labels: DataFrame,
      components: DataFrame, components3: DataFrame)

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
        Dedup.nearDupComponents(pairs)
          .write.mode("overwrite").parquet(s"$dir/components3")
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
    components = readOr(spark, s"$dir/components", componentsSchema),
    components3 = readOr(spark, s"$dir/components3", componentsSchema))

  /** Build then read back — the one-call form local pipelines use. */
  def buildAndRead(
      docs: DataFrame,
      dir: String,
      hash: (String, Column) => Column = PortableHash.h31): Frames = {
    build(docs, dir, hash)
    read(docs.sparkSession, dir)
  }

  // ---- versioned production layout --------------------------------------
  //
  // The "Production layout notes" above, implemented: corpus versions live
  // in `root/v=N/{pairs,labels,components}`, each table BUCKETED by its
  // report-join key (pairs by doc_a, components by doc_id, labels by node)
  // through the catalog so report joins co-locate with no artifact-side
  // Exchange, and a rebuild becomes visible to readers through ONE
  // commit-marker row (the QuantizerRefresh cutover pattern): readers
  // resolve max committed v and read exactly one version directory, so a
  // half-written rebuild is invisible until its commit lands and a probe
  // can never mix versions. Exactly-once: a retried build overwrites its
  // own version's tables from identical inputs; a retried commit rewrites
  // the same v partition of the marker log; an uncommitted build has no
  // marker row.

  val VCol = "v"

  /** Bucket count for the versioned tables — small because the artifact is
    * pair-graph-sized; production sizes it to the cluster.
    */
  val Buckets = 8

  def versionDir(root: String, v: Long): String = s"$root/v=$v"
  private def commitsDir(root: String) = s"$root/_commits"

  private val commitSchema = StructType(Seq(
    StructField("n_pairs", LongType),
    StructField("n_components", LongType),
    StructField(VCol, LongType)))

  private def tableName(prefix: String, table: String, v: Long) =
    s"${prefix}_${table}_v$v"

  /** Build the three artifact tables for version `v` under `root` as
    * BUCKETED catalog tables (external, pathed into the version dir).
    * Does NOT publish: the old version keeps serving until `commit(v)`.
    * Idempotent in `v` — a crashed build's retry overwrites its own
    * tables.
    */
  /** Write already-derived artifact frames as version `v`'s BUCKETED
    * catalog tables (external, pathed into the version dir). Does NOT
    * publish — `commit(v)` is the cutover. Idempotent in `v`: a retry
    * overwrites its own tables. This is the write half `buildVersioned`
    * and the STREAMING publisher share: the batch path derives the frames
    * from a corpus scan, the streaming path hands in the incrementally
    * maintained tables — either way the on-disk layout is identical.
    */
  def writeVersionTables(frames: Frames, root: String, v: Long,
      tablePrefix: String = "graft_dedup"): Unit = {
    val spark = frames.pairs.sparkSession
    def writeBucketed(df: DataFrame, table: String, key: String): Unit = {
      val name = tableName(tablePrefix, table, v)
      spark.sql(s"DROP TABLE IF EXISTS $name")
      df.write.mode("overwrite")
        .bucketBy(Buckets, key).sortBy(key)
        .option("path", s"${versionDir(root, v)}/$table")
        .saveAsTable(name)
    }
    writeBucketed(frames.pairs, "pairs", "doc_a")
    writeBucketed(frames.labels, "labels", "node")
    writeBucketed(frames.components, "components", "doc_id")
    writeBucketed(frames.components3, "components3", "doc_id")
  }

  def buildVersioned(
      docs: DataFrame,
      root: String,
      v: Long,
      tablePrefix: String = "graft_dedup",
      hash: (String, Column) => Column = PortableHash.h31): Unit = {
    val sig = Dedup.minhashSignatures(docs, hash).persist()
    try {
      val pairs = Dedup.minhashLshPairsFromSignatures(sig, hash).persist()
      try {
        writeVersionTables(Frames(
          pairs = pairs,
          labels = Graph.labelPropagationWeighted(
            pairs.withColumnRenamed("est_jaccard", "weight")),
          components = Dedup.nearDupComponentsExact(pairs),
          components3 = Dedup.nearDupComponents(pairs)), root, v, tablePrefix)
      } finally pairs.unpersist()
    } finally sig.unpersist()
  }

  /** Publish version `v`: ONE marker row (with build-time audit counts)
    * dynamically overwritten on its own v partition. After this returns,
    * `readActive` serves v; before it, v is invisible.
    */
  def commit(spark: SparkSession, root: String, v: Long,
      tablePrefix: String = "graft_dedup"): Unit = {
    val f = readVersion(spark, root, v, tablePrefix)
    val row = Row(f.pairs.count(), f.components.count(), v)
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(row), 1), commitSchema)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(VCol)
      .parquet(commitsDir(root))
    spark.catalog.refreshByPath(commitsDir(root))
  }

  /** Highest committed version, or None before the first commit — an
    * in-flight build has no marker row, so it cannot be observed.
    */
  def activeVersion(spark: SparkSession, root: String): Option[Long] = {
    val log =
      try spark.read.schema(commitSchema).parquet(commitsDir(root))
      catch { case _: AnalysisException => return None }
    val maxV = log.agg(max(col(VCol))).head()
    if (maxV.isNullAt(0)) None else Some(maxV.getLong(0))
  }

  /** One version's frames — through the catalog when the bucketed tables
    * are registered (report joins then co-locate, no artifact-side
    * Exchange), by path with declared schemas otherwise (a fresh session
    * reading an existing layout: correct, merely unbucketed).
    */
  def readVersion(spark: SparkSession, root: String, v: Long,
      tablePrefix: String = "graft_dedup"): Frames = {
    def tableOr(table: String, schema: StructType): DataFrame = {
      val name = tableName(tablePrefix, table, v)
      if (spark.catalog.tableExists(name)) spark.table(name)
      else readOr(spark, s"${versionDir(root, v)}/$table", schema)
    }
    Frames(
      pairs = tableOr("pairs", pairsSchema),
      labels = tableOr("labels", labelsSchema),
      components = tableOr("components", componentsSchema),
      components3 = tableOr("components3", componentsSchema))
  }

  /** The serving artifact: exactly the latest COMMITTED version's
    * directory (empty frames before the first commit) — readers never see
    * a half-written rebuild, and never mix versions.
    */
  def readActive(spark: SparkSession, root: String,
      tablePrefix: String = "graft_dedup"): Frames =
    activeVersion(spark, root) match {
      case Some(v) => readVersion(spark, root, v, tablePrefix)
      case None => read(spark, versionDir(root, -1L))
    }
}

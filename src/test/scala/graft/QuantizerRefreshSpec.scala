package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.VectorOps
import graft.streaming.{QuantizerRefresh, StreamingAnnIngest, StreamingKmeans}

/** The quantizer-refresh handoff end to end: a planted drifted cluster
  * straddles the fixed quantizer's cell boundary (so nprobe=1 serving
  * loses half the true neighbors), streaming mini-batch k-means migrates
  * a centroid onto the cluster, and the versioned rebuild + commit-log
  * cutover swaps serving to the refreshed cells — old index until the
  * commit row lands, new after, never a mixed-version probe — and recall
  * measurably recovers.
  */
class QuantizerRefreshSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def unit(deg: Double): Seq[Double] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r), math.sin(r), 0.0, 0.0)
  }

  // initial corpus: two axis-aligned clusters (ids chosen so the k-means
  // cold start seeds cells 0/1/2 from vecs 1/2/3)
  private val initial = Seq(
    (1L, Seq(1.0, 0.0, 0.0, 0.0)),
    (2L, Seq(0.0, 1.0, 0.0, 0.0)),
    (3L, Seq(1.0, 0.05, 0.0, 0.0)),
    (4L, Seq(0.05, 1.0, 0.0, 0.0)))

  // the DRIFTED cluster: nothing in training history sits near 45°; four
  // arriving batches of 8 unit vectors straddle the c0/c1 bisector
  private val baseAngles = Seq(41.0, 42.0, 43.0, 44.0, 46.0, 47.0, 48.0, 49.0)
  private def driftBatch(b: Int): Seq[(Long, Seq[Double])] =
    baseAngles.zipWithIndex.map { case (a, i) => ((20 + 10 * b + i).toLong, unit(a + 0.3 * b)) }

  private def embDf(rows: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  // the fixed pre-drift quantizer: the two axis cells
  private def quantizer0 = {
    import spark.implicits._
    Seq((0, Seq(1.0, 0.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("cell", "centroid")
  }

  private val query = Seq((100L, unit(45.5)))
  private def queryDf = {
    import spark.implicits._
    query.toDF("q_id", "q_emb")
  }

  /** Ground truth replicating the serving path's arithmetic exactly:
    * 6dp-rounded cosine, ranked (cos desc, id asc).
    */
  private def bruteTop(corpus: Seq[(Long, Seq[Double])], k: Int): Seq[Long] = {
    val q = query.head._2
    val qn = math.sqrt(q.map(x => x * x).sum)
    corpus.map { case (id, v) =>
      val d = v.zip(q).map { case (a, b) => a * b }.sum
      val vn = math.sqrt(v.map(x => x * x).sum)
      (id, math.rint(d / (vn * qn) * 1e6) / 1e6)
    }.sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
  }

  private def recallAt8(served: DataFrame, corpus: Seq[(Long, Seq[Double])]): Double = {
    val truth = bruteTop(corpus, 8).toSet
    val got = served.filter(col("rank") <= 8)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    truth.intersect(got).size.toDouble / truth.size
  }

  it("drift degrades fixed-quantizer recall; refresh + cutover recovers it exactly-once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-qrefresh").toString
    val (root, kmDir) = (s"$dir/index", s"$dir/kmeans")
    val corpus = initial ++ (0 until 4).flatMap(driftBatch)

    // ingest everything into version 0 against the FIXED quantizer, then
    // publish qv=0 (the bootstrap commit)
    StreamingAnnIngest.processBatch(embDf(initial), 0L, quantizer0, QuantizerRefresh.versionDir(root, 0L))
    (0 until 4).foreach { b =>
      StreamingAnnIngest.processBatch(
        embDf(driftBatch(b)), (b + 1).toLong, quantizer0, QuantizerRefresh.versionDir(root, 0L))
    }
    QuantizerRefresh.commit(spark, root, 0L)
    QuantizerRefresh.activeVersion(spark, root) shouldBe Some(0L)

    val idx0 = QuantizerRefresh.readActiveIndex(spark, root)
    idx0.count() shouldBe corpus.size.toLong
    def cellMap(idx: DataFrame): Map[Long, Int] =
      idx.select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val map0 = cellMap(idx0)
    // the planted pathology: the drifted cluster STRADDLES the cell
    // boundary, so one probed cell can never hold all its members
    map0.filter(_._1 >= 20L).values.toSet.size shouldBe 2

    val recallOld = recallAt8(
      VectorOps.ivfTopKFromIndex(idx0, queryDf, quantizer0, k = 8, nprobe = 1), corpus)
    recallOld should be <= 0.5

    // drift repair: mini-batch k-means over the same arriving stream —
    // the spare third centroid (seeded from the near-duplicate vec 3)
    // migrates onto the drifted cluster batch by batch
    StreamingKmeans.processBatch(embDf(initial), 0L, kmDir, k = 3, dim = 4)
    (0 until 4).foreach { b =>
      StreamingKmeans.processBatch(embDf(driftBatch(b)), (b + 1).toLong, kmDir, k = 3, dim = 4)
    }
    val refreshed = StreamingKmeans.readCentroids(spark, kmDir, 4, Long.MaxValue).get
    import spark.implicits._
    val cents1 = refreshed.map(c => (c._1, c._2)).toSeq.toDF("cell", "centroid")

    // REBUILD under the refreshed quantizer — serving must not move yet:
    // qv=1 files exist on disk but the commit log still says 0, so
    // readers keep the old assignments (and never see a mixed probe)
    QuantizerRefresh.rebuild(spark, root, 1L, cents1)
    QuantizerRefresh.activeVersion(spark, root) shouldBe Some(0L)
    cellMap(QuantizerRefresh.readActiveIndex(spark, root)) shouldBe map0

    // the CUTOVER is one commit-log row
    QuantizerRefresh.commit(spark, root, 1L)
    QuantizerRefresh.activeVersion(spark, root) shouldBe Some(1L)
    val idx1 = QuantizerRefresh.readActiveIndex(spark, root)
    idx1.count() shouldBe corpus.size.toLong
    // every row now carries EXACTLY the refreshed quantizer's assignment —
    // the whole-map equality is the no-mixed-version proof
    val expect1 = VectorOps.assignCells(embDf(corpus), cents1)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    cellMap(idx1) shouldBe expect1
    // the migrated centroid owns the drifted cluster's core (the two
    // farthest-edge points legitimately stay with the axis-1 cell)
    val driftCells = map0.keySet.filter(_ >= 20L).toSeq
      .map(expect1).groupBy(identity).view.mapValues(_.size).toMap
    driftCells.values.max should be >= 30

    val recallNew = recallAt8(
      VectorOps.ivfTopKFromIndex(idx1, queryDf, cents1, k = 8, nprobe = 1), corpus)
    recallNew should be >= 0.875
    recallNew - recallOld should be >= 0.375

    // crash-retry of the whole handoff is exactly-once: the rebuild
    // rewrites identical (cell, batch_id) partitions, the commit rewrites
    // the same qv partition of the log — nothing doubles, serving unmoved
    QuantizerRefresh.rebuild(spark, root, 1L, cents1)
    QuantizerRefresh.commit(spark, root, 1L)
    QuantizerRefresh.activeVersion(spark, root) shouldBe Some(1L)
    val idxRetry = QuantizerRefresh.readActiveIndex(spark, root)
    idxRetry.count() shouldBe corpus.size.toLong
    idxRetry.select("vec_id").distinct().count() shouldBe corpus.size.toLong
    recallAt8(
      VectorOps.ivfTopKFromIndex(idxRetry, queryDf, cents1, k = 8, nprobe = 1),
      corpus) shouldBe recallNew
  }

  it("compaction collapses per-cell batch directories without changing a single served row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-qcompact").toString
    val root = s"$dir/index"
    // three micro-batches → each cell holds three batch_id directories
    StreamingAnnIngest.processBatch(embDf(initial.take(2)), 0L, quantizer0, QuantizerRefresh.versionDir(root, 0L))
    StreamingAnnIngest.processBatch(embDf(initial.drop(2)), 1L, quantizer0, QuantizerRefresh.versionDir(root, 0L))
    StreamingAnnIngest.processBatch(embDf(driftBatch(0)), 2L, quantizer0, QuantizerRefresh.versionDir(root, 0L))
    QuantizerRefresh.commit(spark, root, 0L)

    def rows(qv: Long) = StreamingAnnIngest
      .readIndex(spark, QuantizerRefresh.versionDir(root, qv))
      .select("vec_id", "cell", "cv", "cn", "s", "q", "mp", "mpn")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getSeq[Double](2), r.getDouble(3), r.getDouble(4),
          r.getSeq[Double](5), r.getSeq[Double](6), r.getDouble(7))).toMap
    def batchDirs(qv: Long, cell: Int) =
      new java.io.File(s"${QuantizerRefresh.versionDir(root, qv)}/cell=$cell")
        .listFiles().map(_.getName).count(_.startsWith("batch_id="))

    val before = rows(0L)
    batchDirs(0L, 0) should be >= 2 // multiple micro-batch dirs pre-compaction

    QuantizerRefresh.compact(spark, root, 1L, quantizer0)
    QuantizerRefresh.activeVersion(spark, root) shouldBe Some(1L)
    rows(1L) shouldBe before // every row and payload column identical
    batchDirs(1L, 0) shouldBe 1 // one compacted directory per cell
    batchDirs(1L, 1) shouldBe 1
  }

  it("the graph tier joins the cutover: one commit flips cells AND edges together") {
    import graft.streaming.StreamingGraphAnn
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-qgraph").toString
    val (root, graphRoot) = (s"$dir/index", s"$dir/graph")
    val corpus = initial ++ (0 until 4).flatMap(driftBatch)

    // probe=1 makes candidacy = cell co-membership, so the refreshed
    // quantizer's new cell visibly rewires the drifted cluster's edges
    // (at probe=2 over 2-3 cells every node posts nearly everywhere and
    // the edge set can coincide across quantizers)
    val probe = 1

    // bootstrap: cell index AND graph under qv=0, ONE commit for both
    StreamingAnnIngest.processBatch(
      embDf(corpus), 0L, quantizer0, QuantizerRefresh.versionDir(root, 0L))
    StreamingGraphAnn.processBatch(
      embDf(corpus), 0L, quantizer0, QuantizerRefresh.graphVersionDir(graphRoot, 0L),
      probe = probe)
    QuantizerRefresh.commit(spark, root, 0L)

    def edgeSet(df: DataFrame): Set[(Long, Long, Double)] =
      df.select("src", "dst", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def batchEdges(cents: DataFrame): Set[(Long, Long, Double)] =
      edgeSet(VectorOps.graphEdges(embDf(corpus), probe = probe, coarse = Some(cents)))

    val edges0 = edgeSet(QuantizerRefresh.readActiveGraphEdges(spark, root, graphRoot))
    edges0 shouldBe batchEdges(quantizer0)

    // the refreshed quantizer gains a cell on the drifted cluster —
    // probe postings, hence candidate sets, hence edges, must change
    val cents1 = Seq(
      (0, Seq(1.0, 0.0, 0.0, 0.0)),
      (1, Seq(0.0, 1.0, 0.0, 0.0)),
      (2, unit(45.0))).toDF("cell", "centroid")

    // both tiers rebuilt, NOTHING committed: serving unmoved on both
    QuantizerRefresh.rebuildGraph(spark, root, graphRoot, 1L, cents1, probe = probe)
    QuantizerRefresh.rebuild(spark, root, 1L, cents1)
    QuantizerRefresh.activeVersion(spark, root) shouldBe Some(0L)
    edgeSet(QuantizerRefresh.readActiveGraphEdges(spark, root, graphRoot)) shouldBe edges0

    // ONE commit row flips both tiers at once
    QuantizerRefresh.commit(spark, root, 1L)
    val edges1 = edgeSet(QuantizerRefresh.readActiveGraphEdges(spark, root, graphRoot))
    edges1 shouldBe batchEdges(cents1) // ≡ batch graphEdges over the NEW centroids
    edges1 should not equal edges0 // and the refresh genuinely rerouted
    // cells flipped in the same commit — no reader can mix tiers/versions
    QuantizerRefresh.readActiveIndex(spark, root)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap shouldBe
      VectorOps.assignCells(embDf(corpus), cents1)
        .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    // crash-retry of the whole atomic handoff is exactly-once
    QuantizerRefresh.cutoverWithGraph(spark, root, graphRoot, 1L, cents1, probe = probe)
    edgeSet(QuantizerRefresh.readActiveGraphEdges(spark, root, graphRoot)) shouldBe edges1
  }

  it("a RESIZE is just a cutover whose quantizer has a different k: occupancy growth re-derives k and one commit flips cells AND edges") {
    import graft.streaming.StreamingGraphAnn
    val dir = java.nio.file.Files.createTempDirectory("graft-qresize").toString
    val (root, graphRoot) = (s"$dir/index", s"$dir/graph")
    val probe = 1

    // qv=0: occupancy-sized quantizer over the INITIAL corpus
    val corpus0 = initial ++ (0 until 2).flatMap(driftBatch)
    val occ = 8
    val cents0 = VectorOps.kmeansCentroidsAuto(embDf(corpus0), occ)
    val k0 = cents0.count()
    k0 shouldBe VectorOps.autoCellCount(corpus0.size.toLong, occ).toLong
    StreamingAnnIngest.processBatch(
      embDf(corpus0), 0L, cents0, QuantizerRefresh.versionDir(root, 0L))
    StreamingGraphAnn.processBatch(
      embDf(corpus0), 0L, cents0,
      QuantizerRefresh.graphVersionDir(graphRoot, 0L), probe = probe)
    QuantizerRefresh.commit(spark, root, 0L)

    // the corpus grows past the occupancy budget of k0 cells; retraining
    // under the same occupancy target derives a LARGER k — the resize
    val corpus1 = corpus0 ++ (2 until 4).flatMap(driftBatch) ++
      (0 until 16).map(i => (200L + i, unit(10.0 + i)))
    StreamingAnnIngest.processBatch(
      embDf(corpus1.diff(corpus0)), 1L, cents0, QuantizerRefresh.versionDir(root, 0L))
    val cents1 = VectorOps.kmeansCentroidsAuto(embDf(corpus1), occ)
    val k1 = cents1.count()
    k1 shouldBe VectorOps.autoCellCount(corpus1.size.toLong, occ).toLong
    k1 should be > k0 // the knob actually resized

    // the sanctioned path: both tiers rebuilt against the k1 quantizer,
    // published by ONE commit row
    QuantizerRefresh.cutoverWithGraph(spark, root, graphRoot, 1L, cents1, probe = probe)
    QuantizerRefresh.activeVersion(spark, root) shouldBe Some(1L)
    val idx1 = QuantizerRefresh.readActiveIndex(spark, root)
    idx1.count() shouldBe corpus1.size.toLong
    idx1.select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap shouldBe
      VectorOps.assignCells(embDf(corpus1), cents1)
        .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // served cells now span the RESIZED quantizer's range
    idx1.select("cell").distinct().count() should be > k0
    // and the graph was re-derived under the same k1 cells, atomically
    val edges1 = QuantizerRefresh.readActiveGraphEdges(spark, root, graphRoot)
      .select("src", "dst", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    edges1 shouldBe VectorOps.graphEdges(
        embDf(corpus1), probe = probe, coarse = Some(cents1))
      .select("src", "dst", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  it("serves nothing before the first commit, even if version files exist") {
    val dir = java.nio.file.Files.createTempDirectory("graft-qrefresh-boot").toString
    val root = s"$dir/index"
    StreamingAnnIngest.processBatch(embDf(initial), 0L, quantizer0, QuantizerRefresh.versionDir(root, 0L))
    QuantizerRefresh.activeVersion(spark, root) shouldBe None
    QuantizerRefresh.readActiveIndex(spark, root).count() shouldBe 0L
  }
}

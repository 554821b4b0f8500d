package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.ops.VectorOps

class VectorOpsSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def embDf(rows: Seq[(Long, Seq[Float], Int)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  describe("cosine") {
    it("computes exact values on known vectors") {
      import spark.implicits._
      val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)), (Seq(1.0f, 2.0f), Seq(2.0f, 4.0f)))
        .toDF("a", "b")
        .select(VectorOps.cosine(col("a"), col("b")).as("c"))
      val got = df.as[Double].collect()
      got(0) shouldBe 0.0 +- 1e-12
      got(1) shouldBe 1.0 +- 1e-12
    }
  }

  describe("standardize") {
    it("z-scores each dimension and zeroes constant dimensions") {
      // dim1: values 1,3,5 -> mean 3, var_pop 8/3, std 1.6329932
      // dim2: constant 2 -> guard kicks in, z = 0
      val emb = embDf(Seq(
        (1L, Seq(1.0f, 2.0f), 0), (2L, Seq(3.0f, 2.0f), 0), (3L, Seq(5.0f, 2.0f), 0)))
      val got = VectorOps.standardize(emb, dim = 2).collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
      got((1L, 1)) shouldBe -1.224745
      got((2L, 1)) shouldBe 0.0
      got((3L, 1)) shouldBe 1.224745
      Seq(1L, 2L, 3L).foreach(id => got((id, 2)) shouldBe 0.0) // constant dim
    }
  }

  describe("bruteForceTopK") {
    it("ranks neighbors by cosine with id tie-break") {
      // query = vec 0 (id 0 ≡ 0 mod 100); neighbors along known directions
      val data = Seq(
        0L -> Seq(1.0f, 0.0f), 1L -> Seq(1.0f, 0.1f),
        2L -> Seq(1.0f, 1.0f), 3L -> Seq(-1.0f, 0.0f),
        4L -> Seq(1.0f, 0.1f) // exact tie with 1 → id ascending
      ).map { case (id, v) => (id, v, 0) }
      val got = VectorOps.bruteForceTopK(embDf(data), k = 3)
        .collect().map(r => (r.getInt(1), r.getLong(2))).toList
      got shouldBe List((1, 1L), (2, 4L), (3, 2L))
    }
  }

  describe("ivfTopK") {
    it("searches only the query's cell and agrees with brute force there") {
      // two well-separated clusters; label = cluster id
      val cluster0 = (0 until 6).map(i => (i.toLong * 100, Seq(1.0f, 0.01f * i), 0))
      val cluster1 = (0 until 6).map(i => (1L + i * 7, Seq(-1.0f, -0.01f * i), 1))
      val df = embDf(cluster0 ++ cluster1)
      val ivf = VectorOps.ivfTopK(df, k = 3).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      // every neighbor of a cluster-0 query must be a cluster-0 member
      val c0ids = cluster0.map(_._1).toSet
      ivf.filter(t => c0ids(t._1)).foreach { case (_, _, n) => c0ids should contain(n) }
      ivf.nonEmpty shouldBe true
    }

    it("filtered ANN returns only corpus rows passing the metadata predicate") {
      import org.apache.spark.sql.functions.{col, lit, pmod}
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val out = VectorOps.ivfTopK(emb, k = 5, nprobe = 2,
        corpusPred = Some(pmod(col("label"), lit(2)) === 0))
      val evenIds = emb.filter(pmod(col("label"), lit(2)) === 0)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val rows = out.collect()
      rows.nonEmpty shouldBe true
      rows.foreach(r => evenIds should contain(r.getLong(2)))
      // unfiltered neighbors with odd labels exist, so the filter is load-bearing
      val unfiltered = VectorOps.ivfTopK(emb, k = 5, nprobe = 2).collect()
      unfiltered.exists(r => !evenIds(r.getLong(2))) shouldBe true
    }
  }

  describe("IVF recall vs brute force") {
    it("is perfect when clusters are well separated") {
      val rng = new scala.util.Random(3)
      // 2 tight clusters around orthogonal axes; queries at vec_id % 100 == 0
      val data = (0 until 120).map { i =>
        val c = i % 2
        val base = if (c == 0) Array(1.0f, 0.0f, 0.0f, 0.0f) else Array(0.0f, 0.0f, 1.0f, 0.0f)
        val v = base.map(x => x + (rng.nextFloat() - 0.5f) * 0.02f)
        (i.toLong * 50, v.toSeq, c) // ids 0,50,100,... → 2 queries (0 and 100)
      }
      val df = embDf(data)
      def resultSet(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val brute = resultSet(VectorOps.bruteForceTopK(df, k = 5))
      val ivf = resultSet(VectorOps.ivfTopK(df, k = 5))
      ivf shouldBe brute
    }
  }

  describe("IVF recall vs nprobe on real embeddings") {
    it("measures recall@10 against brute force and improves with more probes") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      def neighbors(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val brute = neighbors(VectorOps.bruteForceTopK(emb))
      val recalls = Seq(1, 2, 3, 5).map { np =>
        val r = (neighbors(VectorOps.ivfTopK(emb, nprobe = np)) & brute).size.toDouble / brute.size
        info(f"nprobe=$np: recall@10 = $r%.3f")
        r
      }
      // measured on this corpus: 0.28 / 0.44 / 0.56 / 0.72 — the synthetic
      // embeddings cluster only weakly by label, so the label-mean centroid
      // stand-in caps absolute recall; the CURVE (monotone in nprobe, i.e.
      // the accuracy/cost knob works) is the operator property under test
      recalls.sliding(2).foreach { case Seq(a, b) => b should be >= a }
      recalls.last should be >= 0.6
    }
  }

  describe("k-means IVF vs label-centroid IVF") {
    it("Lloyd-iterated centroids match or beat the label stand-in at nprobe=1") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      def neighbors(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val brute = neighbors(VectorOps.bruteForceTopK(emb))
      def recall(d: org.apache.spark.sql.DataFrame) =
        (neighbors(d) & brute).size.toDouble / brute.size
      val rLabel = recall(VectorOps.ivfTopK(emb))
      val km = VectorOps.kmeansCentroids(emb, k = 10, iters = 3)
      val rKmeans = recall(VectorOps.ivfTopK(emb, coarse = Some(km)))
      info(f"label-centroid recall=$rLabel%.3f  kmeans recall=$rKmeans%.3f")
      rKmeans should be >= rLabel
    }
  }

  describe("lshNearDupPairs at a real near-dup threshold") {
    it("recovers planted near-dups with recall >= 0.9, precision 1.0, and actually prunes") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      val corpus = VectorOps.plantedCorpus(emb) // 500 vectors + 25 cos~0.99 copies
      def pairSet(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = pairSet(VectorOps.cosineNearDupPairsVec(corpus, 0.85))
      truth.size should be >= 20 // the planting itself worked
      val lsh = pairSet(VectorOps.lshNearDupPairsVec(corpus, 0.85))
      // exact cosine filter on candidates → no false positives by construction
      (lsh -- truth) shouldBe empty
      val recall = lsh.size.toDouble / truth.size
      info(f"recall = ${lsh.size}/${truth.size} = $recall%.3f")
      recall should be >= 0.9
      // THE round-3 property: the banded candidate set must be a small
      // fraction of the n²/2 all-pairs space (round 2's 12×3 geometry at
      // threshold 0.35 generated ~1.5·n² candidates — worse than brute force)
      val n = corpus.count()
      val banded = VectorOps.lshBands(corpus)
      val nCand = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id")).distinct().count()
      val allPairs = n * (n - 1) / 2
      info(f"candidates = $nCand / $allPairs all-pairs = ${nCand.toDouble / allPairs}%.4f")
      nCand.toDouble / allPairs should be <= 0.02
    }
  }

  describe("bucketed LSH signature table") {
    it("generates candidates with zero shuffle when the band table is bucketed") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      val corpus = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val banded = VectorOps.lshBands(corpus)
      spark.sql("DROP TABLE IF EXISTS graft_lsh_sig")
      banded.write.bucketBy(8, "band", "bv").sortBy("band", "bv")
        .saveAsTable("graft_lsh_sig")
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val t = spark.table("graft_lsh_sig")
        val cand = t.as("a").join(t.as("b"),
            col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
          .distinct()
        val plan = cand.queryExecution.executedPlan.toString
        plan should include("SortMergeJoin")
        // the candidate join itself is co-located; the only exchange left
        // is the distinct's aggregation — at scale that's the small output,
        // not the banded corpus
        plan should not include "Exchange hashpartitioning(band"
        // bucketed path produces the same candidate set as the shuffled one
        val inline = VectorOps.lshBands(corpus)
        val expect = inline.as("a").join(inline.as("b"),
            col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
          .distinct()
        def pairs(d: org.apache.spark.sql.DataFrame) =
          d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        pairs(cand) shouldBe pairs(expect)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  describe("bucketed IVF cell layout") {
    it("probe reads only the probed cells' buckets (SelectedBucketsCount)") {
      import org.apache.spark.sql.functions.col
      // the 100 TB serving layout: corpus persisted bucketed by cell id, so
      // a query batch's nprobe cells select a bucket subset at scan time
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      val cents = VectorOps.centroids(emb)
        .select(col("label").as("cell"), col("centroid"))
      val assigned = emb.join(org.apache.spark.sql.functions.broadcast(cents))
        .select(col("vec_id"), col("cell"),
          org.apache.spark.sql.functions.round(
            VectorOps.cosine(col("embedding"), col("centroid")), 6).as("ccos"))
        .groupBy(col("vec_id"))
        .agg(org.apache.spark.sql.functions.max_by(col("cell"), col("ccos")).as("cell"))
      spark.sql("DROP TABLE IF EXISTS graft_ivf_cells")
      assigned.write.bucketBy(8, "cell").saveAsTable("graft_ivf_cells")
      // a probe set of 2 cells: the scan must select a strict bucket subset.
      // autoBucketedScan drops to a plain scan when no join/agg wants the
      // distribution, which also forfeits pruning — pin it on for the probe.
      val prevAuto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      try {
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        val probed = spark.table("graft_ivf_cells").filter(col("cell").isin(1, 3))
        val selected = probed.queryExecution.executedPlan.collectLeaves().collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.metadata.get("SelectedBucketsCount")
        }.flatten
        info(s"scan metadata: $selected")
        selected should be (defined)
        selected.get should include regex "[12] out of 8"
        probed.count() should be > 0L
      } finally spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
    }
  }

  describe("literal-expression plan-size guard") {
    it("a quantizer past MaxLiteralDoubles routes through the broadcast-join assignment instead of throwing") {
      import spark.implicits._
      val emb = embDf(Seq((0L, Seq.fill(64)(0.1f), 0), (100L, Seq.fill(64)(0.2f), 0)))
      // 1025 centroids x 64 dims = 65600 literal doubles > 65536 — the
      // pre-round-13 literal path refused this; the dual-path assignment
      // now serves it via bcastArgmax (nearestCellExpr is never built)
      val huge = Seq.tabulate(1025)(i => (i, Seq.fill(64)(0.001 * (i + 1))))
        .toDF("cell", "centroid")
      val got = VectorOps.ivfTopK(emb, k = 1, nprobe = 1025, coarse = Some(huge))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      // both corpus vectors are queries (id % 100 = 0); with every cell
      // probed each finds the other — parallel vectors, cos = 1
      got shouldBe Set((0L, 100L), (100L, 0L))
    }

    it("ivfTopK output is ranked exactly like the row_number form") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      val rows = VectorOps.ivfTopK(emb, k = 10).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      rows.groupBy(_._1).foreach { case (_, g) =>
        val sorted = g.sortBy(_._2)
        // ranks are consecutive from 1 and order by (cos DESC, neighbor_id ASC)
        sorted.map(_._2).toList shouldBe (1 to g.length).toList
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3),
              s"rank ${a._2}->${b._2} violates (cos DESC, id ASC): $a vs $b")
          case _ => ()
        }
      }
      rows.nonEmpty shouldBe true
    }
  }

  describe("quantizeStats") {
    it("computes int8 scale and summaries on a known vector") {
      // amax = 1.0 → scale 127; q = [127, round(-63.5)=-64 (half away from
      // zero), round(31.75)=32, 0]
      val df = embDf(Seq((1L, Seq(1.0f, -0.5f, 0.25f, 0.0f), 0)))
      val r = VectorOps.quantizeStats(df).collect()(0)
      r.getDouble(1) shouldBe 127.0
      (r.getInt(2), r.getInt(3)) shouldBe ((-64, 127))
      (r.getLong(4), r.getLong(5)) shouldBe ((95L, 223L))
    }
  }

  describe("cosineNearDupPairs") {
    it("finds only pairs above threshold") {
      val data = Seq(
        (1L, Seq(1.0f, 0.0f, 0.0f), 0),
        (2L, Seq(0.999f, 0.04f, 0.0f), 0), // cos ≈ 0.999
        (3L, Seq(0.0f, 1.0f, 0.0f), 0))
      val pairs = VectorOps.cosineNearDupPairs(embDf(data), threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs shouldBe Set((1L, 2L))
    }
  }

  describe("semanticDedup") {
    it("drops exactly the higher ids of within-cluster near-dup pairs") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      val out = VectorOps.semanticDedup(emb).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
      out.length.toLong shouldBe emb.count() // one verdict per corpus vector
      out.count(!_._3) should be > 0         // the pruning actually fires
      // soundness + completeness against an independent recomputation:
      // dropped ⟺ some lower-id member of the SAME cell at rounded cos ≥ τ
      val asg = VectorOps.assignCells(emb, VectorOps.kmeansCentroids(emb, 10, 3))
        .select(col("vec_id"), col("cell"), col("v")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
        while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val expectDropped = (for {
        (ia, ca, va) <- asg; (ib, cb, vb) <- asg
        if ca == cb && ia < ib && cos(va, vb) >= 0.35
      } yield ib).toSet
      out.filter(!_._3).map(_._1).toSet shouldBe expectDropped
      // the operator's cell agrees with the assignment it derives from
      val cellOf = asg.map(t => t._1 -> t._2).toMap
      out.foreach { case (id, cell, _) => cell shouldBe cellOf(id) }
    }
  }

  describe("semanticDedupCapped (occupancy-capped subcells)") {
    it("a cap above every cell's occupancy reproduces the uncapped verdicts exactly") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      val full = VectorOps.semanticDedup(emb).collect()
        .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      val capped = VectorOps.semanticDedupCapped(emb, cap = Int.MaxValue).collect()
        .map(r => (r.getLong(0), r.getInt(2), r.getBoolean(3)))
      capped.foreach { case (_, sub, _) => sub shouldBe 0 } // one subcell/cell
      capped.map(t => t._1 -> t._3).toMap shouldBe full
    }

    it("capped drops are a subset of uncapped drops, every subcell respects the cap, and the report's accounting is exact") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      val cap = 16 // well below the ~50-member sf0.01 cells: the cap bites
      val capped = VectorOps.semanticDedupCapped(emb, cap = cap).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
      // work bound: no (cell, subcell) exceeds the cap
      capped.groupBy(t => (t._2, t._3)).values.foreach(_.size should be <= cap)
      val droppedCapped = capped.filter(!_._4).map(_._1).toSet
      val droppedFull = VectorOps.semanticDedup(emb).collect()
        .filter(!_.getBoolean(2)).map(_.getLong(0)).toSet
      droppedCapped.subsetOf(droppedFull) shouldBe true // only recall traded
      droppedCapped.size should be < droppedFull.size // and the cap DID bite
      val rep = VectorOps.semanticDedupCapReport(emb, cap = cap).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))
      rep.map(_._2).sum shouldBe emb.count() // occupancies partition the corpus
      rep.foreach { case (_, occ, nsub, pc, pu, dc, du) =>
        nsub shouldBe (occ + cap - 1) / cap // ceil(occ / cap) subcells
        pc should be <= pu // the saved pair volume is the cap's point
        dc should be <= du // and so is the explicit recall trade
      }
      rep.map(_._6).sum shouldBe droppedCapped.size.toLong
      rep.map(_._7).sum shouldBe droppedFull.size.toLong
      // linear-work bound the SCALING.md fix claims: Σ pairs ≤ N·cap
      rep.map(_._4).sum should be <= emb.count() * cap
    }

    it("degrades gracefully under a 1-centroid quantizer (greatest needs 2+ args)") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      val out = VectorOps.semanticDedupCapped(emb, k = 1, cap = 16).collect()
      out.length.toLong shouldBe emb.count()
      out.map(_.getInt(1)).toSet shouldBe Set(0) // everything in the one cell
    }
  }

  describe("occupancy-sized quantizer (autoCellCount / kmeansCentroidsAuto / assignCellsBcast)") {
    it("autoCellCount is ceil(n/occ) floored at 1, matching the oracle's ceil(count/occ)") {
      VectorOps.autoCellCount(500, 64) shouldBe 8
      VectorOps.autoCellCount(2000, 64) shouldBe 32
      VectorOps.autoCellCount(512, 64) shouldBe 8
      VectorOps.autoCellCount(513, 64) shouldBe 9
      VectorOps.autoCellCount(1, 64) shouldBe 1
      VectorOps.autoCellCount(0, 64) shouldBe 1
      VectorOps.autoCellCount(60000, 64) shouldBe 938 // the x30 audit corpus
    }

    it("kmeansCentroidsAuto derives k from the corpus and bounds realized occupancy near the target") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      val cents = VectorOps.kmeansCentroidsAuto(emb)
      val k = cents.count()
      k should be <= VectorOps.autoCellCount(emb.count()).toLong
      k should be >= 2L
      val occ = VectorOps.assignCells(emb, cents)
        .groupBy(col("cell")).count().collect().map(_.getLong(1))
      occ.sum shouldBe emb.count()
      // Lloyd balances but does not cap; the discipline's claim is the
      // EXPECTED occupancy ≈ target, with skew bounded well under N
      (occ.sum / occ.length) should be <= VectorOps.QuantizerTargetOccupancy.toLong
    }

    it("past the literal bound, assignment and probe postings switch to the broadcast-join path and stay exact") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      // k=80 × dim 64 = 5120 doubles > LiteralAssignBound → the big-k path
      val cents = VectorOps.kmeansCentroids(emb, k = 80, iters = 2)
      val centArr = cents.collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
      (centArr.length * 64) should be > VectorOps.LiteralAssignBound
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
        while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      // brute (ccos DESC, cell ASC) ranking per vector
      def ranked(v: Array[Double]): Seq[Int] = centArr
        .map { case (c, m) => (c, cos(v, m)) }
        .sortBy { case (c, cc) => (-cc, c) }.map(_._1).toSeq
      val gotAsg = VectorOps.assignCells(emb, cents)
        .select(col("vec_id"), col("cell")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      gotAsg shouldBe vecs.map { case (id, v) => id -> ranked(v).head }
      val gotPost = VectorOps.probePostings(emb,
          centArr.map { case (c, m) => (c, m.toSeq) }.toSeq, probe = 2)
        .select(col("vec_id"), col("pr"), col("cell")).collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
      val expPost = vecs.flatMap { case (id, v) =>
        ranked(v).take(2).zipWithIndex.map { case (c, i) => (id, i + 1) -> c }
      }
      gotPost shouldBe expPost
      // and the QUERY-side probe ranking (scoreProbes' broadcast top-nprobe
      // path, engaged at this k) serves the same top-k as a brute
      // recomputation: probe the 2 nearest cells, score their members,
      // rank (cos DESC, id ASC)
      val gotServe = VectorOps.ivfTopK(emb, nprobe = 2, coarse = Some(cents))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val expServe = vecs.keys.filter(_ % 100 == 0).flatMap { q =>
        val probes = ranked(vecs(q)).take(2).toSet
        vecs.filter { case (id, v) => id != q && probes(ranked(v).head) }
          .map { case (id, v) => (id, cos(vecs(q), v)) }.toSeq
          .sortBy { case (id, c) => (-c, id) }.take(10).zipWithIndex
          .map { case ((id, c), i) => (q, i + 1, id, c) }
      }.toSet
      gotServe shouldBe expServe
      gotServe should not be empty
    }

    it("ivfTopKFromIndex over the pre-assigned corpus is row-identical to the inline auto-IVF serve") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      val cents = VectorOps.kmeansCentroidsAuto(emb)
      val centArr = cents.collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
      // the index shape StreamingAnnIngest maintains / annGraphOf persists
      val index = VectorOps.assignCells(emb, centArr)
        .select(col("vec_id"), col("cell"), col("v").as("cv"),
          sqrt(graft.functions.ArrayDotProduct.dot(col("v"), col("v"))).as("cn"))
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val fromIndex = rows(VectorOps.ivfTopKFromIndex(
        index, VectorOps.querySet(emb), cents, nprobe = 2))
      val inline = rows(VectorOps.ivfTopK(emb, nprobe = 2, coarse = Some(cents)))
      fromIndex shouldBe inline
      fromIndex should not be empty
    }

    it("assignCellsBcast is bit-identical to the literal-folding assignCells") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      val cents = VectorOps.kmeansCentroidsAuto(emb)
      val centArr = cents.collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
      def asMap(df: org.apache.spark.sql.DataFrame) = df
        .select(col("vec_id"), col("cell")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val lit = asMap(VectorOps.assignCells(emb, centArr))
      val bc = asMap(VectorOps.assignCellsBcast(emb, cents))
      bc shouldBe lit
      // and the broadcast form's plan has no window / no corpus-wide sort
      val plan = VectorOps.assignCellsBcast(emb, cents)
        .queryExecution.executedPlan.toString
      plan should not include "Window"
    }
  }

  describe("embeddingCurationPipeline (capped dedup stage is the default)") {
    it("dedupCap = MaxValue recovers the all-pairs baseline; the default cap only grows the survivor set") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      val cents = VectorOps.kmeansCentroids(emb, 10, 3)
      // sample cap maxed out → the output IS the survivor set
      def survivors(dedupCap: Int): Set[Long] =
        VectorOps.embeddingCurationPipeline(emb, cents,
            cap = Int.MaxValue, dedupCap = dedupCap)
          .collect().map(_.getLong(2)).toSet
      val uncapped = survivors(Int.MaxValue)
      val capped = survivors(16) // well below sf0.01's ~50-member cells
      // capped pairs ⊆ uncapped pairs → capped drops ⊆ uncapped drops
      uncapped.subsetOf(capped) shouldBe true
      capped.size should be > uncapped.size // and the cap DID bite
      // the MaxValue form matches an independent uncapped recomputation:
      // gate by winning cosine, drop higher ids of within-cell pairs ≥ τ
      val asg = VectorOps.assignCells(emb, cents)
        .select(col("vec_id"), col("cell"), col("v")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
      val centArr = cents.collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
        while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val gated = asg.filter { case (_, c, v) => cos(v, centArr(c)) >= VectorOps.GateMinCos }
      val dropped = (for {
        (ia, ca, va) <- gated; (ib, cb, vb) <- gated
        if ca == cb && ia < ib && cos(va, vb) >= 0.35
      } yield ib).toSet
      uncapped shouldBe gated.map(_._1).toSet.diff(dropped)
    }
  }

  describe("randomProjection") {
    it("projects a basis vector to exactly its matrix column over sqrt(RpDim)") {
      // v = e_5 → r_j = rpSigns(j)(5) / √8 for every output dim j
      val v = Array.fill(VectorOps.EmbeddingDim)(0.0f); v(5) = 1.0f
      val df = embDf(Seq((1L, v.toSeq, 0)))
      val r = VectorOps.randomProjection(df).collect()(0)
      val s = math.sqrt(VectorOps.RpDim.toDouble)
      (0 until VectorOps.RpDim).foreach { j =>
        r.getDouble(j + 1) shouldBe
          BigDecimal(VectorOps.rpSigns(j)(5) / s)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    it("is a pure narrow projection — no exchange in the plan") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      val plan = VectorOps.randomProjection(emb).queryExecution.executedPlan.toString
      plan should not include "Exchange"
    }
  }

  describe("ivfRerankTopK") {
    it("int8 first stage + exact re-rank nearly matches the full-precision IVF path") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      val reranked = asMap(VectorOps.ivfRerankTopK(emb, k = 10, nprobe = 2))
      val exact = asMap(VectorOps.ivfTopK(emb, k = 10, nprobe = 2))
      // same candidate cells, same final metric — the only divergence is a
      // true top-10 neighbor falling outside the 30-row quantized shortlist
      val agree = exact.count { case (key, nb) => reranked.get(key).contains(nb) }
      agree.toDouble / exact.size.toDouble should be >= 0.9
    }
  }

  describe("ivfPqRefineTopK") {
    it("degenerates to exact brute force when every cell is probed and the shortlist covers the corpus") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val nCells = emb.select("label").distinct().count().toInt
      val n = emb.count().toInt
      // nprobe = C ⇒ stage 1 scores every non-self pair; rerankK ≥ n ⇒ the
      // shortlist is the whole candidate set; the exact re-rank is then
      // brute force — the quantization loss must cancel out entirely
      val refined = VectorOps.ivfPqRefineTopK(emb, k = 10, rerankK = n, nprobe = nCells)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val brute = VectorOps.bruteForceTopK(emb, k = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      refined shouldBe brute
    }
    it("exact refine never loses recall vs serving straight from reconstructions") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      def meanRecall(df: org.apache.spark.sql.DataFrame) = {
        val rows = df.collect(); rows.map(_.getAs[Double]("recall_at_k")).sum / rows.length
      }
      // same nprobe, same codes — the refine stage can only promote true
      // neighbors ADC ranked 11..rerankK, never demote ones it ranked 1..k
      // into oblivion (they stay in the shortlist and re-rank exactly)
      meanRecall(VectorOps.ivfPqRefineRecallReport(emb)) should be >=
        meanRecall(VectorOps.ivfPqRecallReport(emb))
    }
    it("final ranking is a reordering of the ADC shortlist") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val shortlist = VectorOps.ivfPqTopK(emb, k = VectorOps.RerankShortlist, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val refined = VectorOps.ivfPqRefineTopK(emb, k = 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      refined.subsetOf(shortlist) shouldBe true
    }
  }

  describe("mrlTopK") {
    it("degenerates to exact brute force when the prefix is the full dim") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val brute = VectorOps.bruteForceTopK(emb, k = 10).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val full = VectorOps.mrlTopK(emb, k = 10, prefixDim = 64).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      full shouldBe brute
    }
    it("mrlIvfTopK degenerates to mrlTopK when every cell is probed") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val nCells = emb.select("label").distinct().count().toInt
      val funnel = VectorOps.mrlTopK(emb, k = 10).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      // nprobe = C → stage-1 candidates are every non-self pair, exactly
      // the all-pairs funnel; shortlists and re-ranks must coincide
      val composed = VectorOps.mrlIvfTopK(emb, k = 10, nprobe = nCells).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      composed shouldBe funnel
    }
    it("ivfPqTopK degenerates to pqAdcTopK when every cell is probed") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val nCells = emb.select("label").distinct().count().toInt
      val adc = VectorOps.pqAdcTopK(emb, k = 10).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      // nprobe = C → the candidate set is every non-self pair, so the
      // cell pruning vanishes and only the shared quantization remains
      val all = VectorOps.ivfPqTopK(emb, k = 10, nprobe = nCells).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      all shouldBe adc
    }
    it("a 16-dim prefix funnel beats the random-shortlist baseline") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      val n = emb.count().toDouble
      val report = VectorOps.mrlRecallReport(emb, k = 10).collect()
      val meanRecall = report.map(_.getAs[Double]("recall_at_k")).sum / report.length
      // a random 30-row shortlist holds each true top-10 neighbor with
      // p ≈ 30/n, so expected random recall@10 ≈ 30/n ≈ 0.06 here;
      // measured ≈ 0.44 on the isotropic corpus (the method's worst case)
      meanRecall should be > (3.0 * VectorOps.RerankShortlist / n)
      // re-ranked hits are scored with the EXACT cosine, so a hit at rank 1
      // in truth that survives the shortlist gets rr = 1.0
      report.map(_.getAs[Double]("rr")).max shouldBe 1.0
    }
  }

  describe("clusterCohesion") {
    it("matches an independent driver-side recomputation per cell") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val out = VectorOps.clusterCohesion(emb).collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

      // recompute from raw rows: label-mean centroids (6dp), nearest by
      // rounded cosine with cell tie-break, per-cell rollup
      val rows = emb.select("vec_id", "label", "embedding").collect()
        .map(r => (r.getLong(0), r.getInt(1),
          r.getSeq[Float](2).map(_.toDouble).toArray))
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      def dot(a: Array[Double], b: Array[Double]) =
        a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
      val cents = rows.groupBy(_._2).map { case (l, xs) =>
        val dim = xs.head._3.length
        l -> Array.tabulate(dim)(i => r6(xs.map(_._3(i)).sum / xs.size))
      }
      val assigned = rows.map { case (_, label, v) =>
        val vn = math.sqrt(dot(v, v))
        val cell = cents.toSeq.map { case (c, m) =>
          (r6(dot(v, m) / (vn * math.sqrt(dot(m, m)))), c)
        }.maxBy { case (cos, c) => (cos, -c) }._2
        val cos = r6(dot(v, cents(cell)) / (vn * math.sqrt(dot(cents(cell), cents(cell)))))
        (cell, label, cos)
      }
      val expected = assigned.groupBy(_._1).map { case (cell, xs) =>
        cell -> ((xs.length.toLong,
          xs.count { case (c, l, _) => l == c }.toLong,
          r6(xs.map(_._3).sum / xs.length)))
      }
      out.keySet shouldBe expected.keySet
      out.foreach { case (cell, (n, m, cos)) =>
        val (en, em, ecos) = expected(cell)
        n shouldBe en
        m shouldBe em
        cos shouldBe ecos +- 1e-6
      }
    }
  }

  describe("hardNegatives") {
    it("drops near-positive candidates above the ceiling and keeps the hardest below it") {
      import spark.implicits._
      // fan of unit vectors at 10-degree steps from the query (vec 0),
      // plus a near-identical twin (999): cos spans ~0.98..0.17, so the
      // 0.5 ceiling genuinely splits the candidate set.
      val fan = (0 to 8).map { i =>
        val th = math.toRadians(10.0 * i)
        (i.toLong, Array(math.cos(th).toFloat, math.sin(th).toFloat, 0f, 0f), 0)
      }
      val other = (10 to 14).map { i =>
        val th = math.toRadians(10.0 * (i - 10))
        (i.toLong, Array(0f, 0f, math.cos(th).toFloat, math.sin(th).toFloat), 1)
      }
      val twin = Seq((999L, Array(1.0f, 0.001f, 0f, 0f), 0))
      val emb = (fan ++ other ++ twin).toDF("vec_id", "embedding", "label")
      val plain = VectorOps.ivfTopK(emb, k = 20, nprobe = 2)
        .filter(col("q_id") === 0L).collect()
      plain.map(_.getAs[Long]("neighbor_id")) should contain(999L)
      val hn = VectorOps.hardNegatives(emb, k = 20, nprobe = 2)
        .filter(col("q_id") === 0L).collect()
      val hnIds = hn.map(_.getAs[Long]("neighbor_id")).toSet
      hnIds should not contain 999L
      all(hn.map(_.getAs[Double]("cos"))) should be < VectorOps.HardNegCeiling
      // identical to filtering the plain candidate list below the ceiling
      val expected = plain.filter(_.getAs[Double]("cos") < VectorOps.HardNegCeiling)
        .map(_.getAs[Long]("neighbor_id")).toSet
      hnIds shouldBe expected
    }
  }

  describe("clusterBalancedSample") {
    it("caps every cell and matches the ranking-window reference over the same priority") {
      import org.apache.spark.sql.expressions.Window
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val cap = 5
      val out = VectorOps.clusterBalancedSample(emb, cap = cap).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      out.groupBy(_._1).foreach { case (_, rows) => rows.size should be <= cap }
      out.size should be > cap // more than one cell contributes
      // reference: same cell assignment via clusterCohesion's quantizer
      // shape is implicit — recompute ranks with a window over the
      // aggregator's own (hash, vec_id) priority and identical cells
      val full = VectorOps.clusterBalancedSample(emb, cap = 1000000).collect()
        .map(r => (r.getInt(0), r.getLong(2)))
      import spark.implicits._
      val h = graft.functions.PortableHash.h31("cbs", col("vec_id").cast("string"))
      val w = Window.partitionBy(col("cell")).orderBy(h.asc, col("vec_id").asc)
      val ref = full.toSeq.toDF("cell", "vec_id")
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= cap)
        .collect().map(r => (r.getInt(0), r.getInt(2), r.getLong(1))).toSet
      out shouldBe ref
    }
  }

  describe("product quantization") {
    it("codebooks are deterministic with the declared m x k x subdim geometry") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      val a = VectorOps.pqCodebooksDf(emb).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      a.size shouldBe VectorOps.PqM * VectorOps.PqK * VectorOps.PqSubDim
      a.map(_._1) shouldBe (0 until VectorOps.PqM).toSet
      VectorOps.pqCodebooksDf(emb).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet shouldBe a
    }

    it("encodes every vector with in-range codes and the true 6dp norm") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.001")
      val cbs = VectorOps.pqCodebooks(emb)
      val codes = VectorOps.pqEncode(emb, cbs).collect()
      codes.length shouldBe emb.count()
      codes.foreach { r =>
        (2 to 5).foreach(i => r.getInt(i) should (be >= 0 and be < VectorOps.PqK))
        r.getDouble(1) should be > 0.0
      }
    }

    it("ADC top-10 recovers a useful fraction of the brute-force truth") {
      val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      def neighbors(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val brute = neighbors(VectorOps.bruteForceTopK(emb))
      val adc = neighbors(VectorOps.pqAdcTopK(emb))
      val recall = (adc & brute).size.toDouble / brute.size
      info(f"PQ-ADC recall@10 = $recall%.3f (16x compression)")
      // the oracle-checked report aggregates to the same number
      val report = VectorOps.pqRecallReport(emb).collect()
      report.map(_.getAs[Long]("n_hit")).sum.toDouble / brute.size shouldBe recall
      report.foreach { r =>
        val rr = r.getAs[Double]("rr")
        rr should (be >= 0.0 and be <= 1.0)
      }
      // 8x16 codes compress 64 dims ~16x. These synthetic embeddings are
      // near-isotropic (no cluster structure for the codebooks to exploit
      // — measured 0.30 at m=8, 0.18 at m=4, flat in k), so the bar is
      // "strong signal over the ~0.02 random baseline", not production
      // recall; with margin for future geometry tweaks:
      recall should be >= 0.25
    }
  }

  describe("binaryHammingTopK") {
    it("ranks by sign-pattern agreement, re-ranks the shortlist by exact cosine") {
      // query 100 = (1,1,1,1); the SCALED copy shares every sign bit
      // (hamming 0) and reranks to cosine 1; one flipped sign = hamming 1;
      // the antipode disagrees on every bit and must rank behind both
      val emb = embDf(Seq(
        (100L, Seq(1.0f, 1.0f, 1.0f, 1.0f), 0),
        (1L, Seq(2.0f, 2.0f, 2.0f, 2.0f), 0),   // same signs, scaled
        (2L, Seq(1.0f, 1.0f, 1.0f, -1.0f), 0),  // one sign flip
        (3L, Seq(-1.0f, -1.0f, -1.0f, -1.0f), 0))) // antipode: hamming 4
      val got = VectorOps.binaryHammingTopK(emb, k = 2, shortlist = 2, dim = 4)
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
      got shouldBe Array((1, 1L, 1.0), (2, 2L, 0.5))
    }

    it("a Hamming near-tie is settled by the exact re-rank, not bit counts") {
      // neighbors 1 and 2 both differ from the query in ONE sign bit, but
      // 2's disagreeing component is tiny — exact cosine must put 2 first
      // even though stage 1 cannot distinguish them
      val emb = embDf(Seq(
        (100L, Seq(1.0f, 1.0f, 1.0f, 1.0f), 0),
        (1L, Seq(1.0f, 1.0f, 1.0f, -1.0f), 0),
        (2L, Seq(1.0f, 1.0f, 1.0f, -0.01f), 0)))
      val got = VectorOps.binaryHammingTopK(emb, k = 2, shortlist = 2, dim = 4)
        .collect().map(r => (r.getInt(1), r.getLong(2)))
      got shouldBe Array((1, 2L), (2, 1L))
    }
  }
}

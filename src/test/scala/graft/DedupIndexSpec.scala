package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.DataFrame

import graft.ops.{Dedup, DedupIndex, Graph}

/** The persisted near-dup graph artifact: one build writes pairs + labels +
  * components; every report served FROM the artifact must equal its inline
  * derivation row-for-row (the from-index ≡ inline contract
  * StreamingTextIngestSpec pins for retrieval, applied to the dedup graph).
  */
class DedupIndexSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // the gated-report corpus: a genuine clique {1,2,3}, an isolated pair
  // {4,5} (the LPA 2-cycle), and a singleton — exercises every grouping
  // kind the survivorship family distinguishes
  private val aTok = (1 to 60).map(i => s"qa$i")
  private def tweak(ts: Seq[String], i: Int) = ts.updated(i, ts(i) + "x")
  private val base = (1 to 60).map(i => s"tok$i").mkString(" ")
  private val nearDup = ((1 to 59).map(i => s"tok$i") :+ "changed").mkString(" ")
  private val unrelated = (1 to 60).map(i => s"other$i").mkString(" ")
  private val docs = docsDf(Seq(
    1L -> aTok.mkString(" "),
    2L -> tweak(aTok, 5).mkString(" "),
    3L -> tweak(aTok, 20).mkString(" "),
    4L -> base, 5L -> nearDup,
    9L -> unrelated))

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  describe("DedupIndex") {
    it("serves pairs, labels, components, and every survivorship report identically to the inline build") {
      val dir = java.nio.file.Files.createTempDirectory("graft-dedup-idx").toString
      val f = DedupIndex.buildAndRead(docs, dir)

      // the three artifact tables ≡ their inline derivations
      val inlinePairs = Dedup.minhashLshPairs(docs).persist()
      rowsOf(f.pairs) shouldBe rowsOf(inlinePairs)
      rowsOf(f.labels) shouldBe rowsOf(
        Graph.labelPropagationWeighted(
          inlinePairs.withColumnRenamed("est_jaccard", "weight")))
      rowsOf(f.components) shouldBe rowsOf(Dedup.nearDupComponentsExact(inlinePairs))
      rowsOf(f.components3) shouldBe rowsOf(Dedup.nearDupComponents(inlinePairs))
      f.pairs.count() should be > 0L

      // reports served FROM the artifact ≡ inline reports
      rowsOf(Graph.modularityReportFrom(
        f.pairs.withColumnRenamed("est_jaccard", "weight"), f.labels)) shouldBe
        rowsOf(Graph.modularityReport(
          inlinePairs.withColumnRenamed("est_jaccard", "weight")))
      rowsOf(Dedup.dedupGranularityReportFrom(docs, f.labels, f.components)) shouldBe
        rowsOf(Dedup.dedupGranularityReport(docs))
      rowsOf(Dedup.dedupPolicyReportFrom(docs, f.components)) shouldBe
        rowsOf(Dedup.dedupPolicyReport(docs))
      rowsOf(Dedup.modularityGatedReportFrom(docs, f.pairs, f.labels, f.components)) shouldBe
        rowsOf(Dedup.modularityGatedReport(docs))
      rowsOf(Dedup.modularityGatedSurvivorsFrom(docs, f.pairs, f.labels, f.components)) shouldBe
        rowsOf(Dedup.modularityGatedSurvivors(docs))
      rowsOf(Dedup.bestQualitySurvivorsCommunitiesFrom(docs, f.labels)) shouldBe
        rowsOf(Dedup.bestQualitySurvivorsCommunities(docs))
      rowsOf(Dedup.bestQualitySurvivorsFrom(docs, f.components)) shouldBe
        rowsOf(Dedup.bestQualitySurvivors(docs))
      rowsOf(Dedup.sourceContaminationFrom(f.pairs,
        docs.withColumn("source",
          org.apache.spark.sql.functions.lit("web")))) shouldBe
        rowsOf(Dedup.sourceContamination(
          docs.withColumn("source",
            org.apache.spark.sql.functions.lit("web"))))
      inlinePairs.unpersist()
    }

    it("a rebuild overwrites the prior artifact rather than accumulating") {
      val dir = java.nio.file.Files.createTempDirectory("graft-dedup-idx2").toString
      DedupIndex.build(docs, dir)
      val first = DedupIndex.read(spark, dir).pairs.count()
      DedupIndex.build(docs, dir) // second build over the same corpus
      DedupIndex.read(spark, dir).pairs.count() shouldBe first
    }

    it("an unbuilt index reads as empty frames, not an error") {
      val dir = java.nio.file.Files.createTempDirectory("graft-dedup-idx3").toString
      val f = DedupIndex.read(spark, s"$dir/never_built")
      f.pairs.count() shouldBe 0L
      f.labels.count() shouldBe 0L
      f.components.count() shouldBe 0L
      f.components3.count() shouldBe 0L
    }
  }

  describe("DedupIndex versioned layout") {
    // a second corpus version: doc 3 re-crawled out of the clique
    val docsV2 = docsDf(Seq(
      1L -> aTok.mkString(" "),
      2L -> tweak(aTok, 5).mkString(" "),
      3L -> unrelated,
      4L -> base, 5L -> nearDup))

    it("readers never observe a half-built version: the commit row IS the cutover") {
      val root = java.nio.file.Files.createTempDirectory("graft-dedup-v").toString
      // before any commit: empty frames, no error
      DedupIndex.readActive(spark, root, "graft_tvix").pairs.count() shouldBe 0L

      DedupIndex.buildVersioned(docs, root, 1L, "graft_tvix")
      // BUILT but UNCOMMITTED: still invisible
      DedupIndex.readActive(spark, root, "graft_tvix").pairs.count() shouldBe 0L
      DedupIndex.commit(spark, root, 1L, "graft_tvix")
      val v1 = DedupIndex.readActive(spark, root, "graft_tvix")
      rowsOf(v1.pairs) shouldBe rowsOf(Dedup.minhashLshPairs(docs))
      rowsOf(v1.components) shouldBe
        rowsOf(Dedup.nearDupComponentsExact(Dedup.minhashLshPairs(docs)))
      rowsOf(v1.components3) shouldBe
        rowsOf(Dedup.nearDupComponents(Dedup.minhashLshPairs(docs)))

      // v2 builds while v1 keeps serving — the reader sees entirely-old
      // until the one-row commit lands, entirely-new after
      DedupIndex.buildVersioned(docsV2, root, 2L, "graft_tvix")
      rowsOf(DedupIndex.readActive(spark, root, "graft_tvix").pairs) shouldBe
        rowsOf(v1.pairs)
      DedupIndex.commit(spark, root, 2L, "graft_tvix")
      rowsOf(DedupIndex.readActive(spark, root, "graft_tvix").pairs) shouldBe
        rowsOf(Dedup.minhashLshPairs(docsV2))
      DedupIndex.activeVersion(spark, root) shouldBe Some(2L)

      // a retried build + commit of the same version is exactly-once
      DedupIndex.buildVersioned(docsV2, root, 2L, "graft_tvix")
      DedupIndex.commit(spark, root, 2L, "graft_tvix")
      rowsOf(DedupIndex.readActive(spark, root, "graft_tvix").pairs) shouldBe
        rowsOf(Dedup.minhashLshPairs(docsV2))
    }

    it("report joins over the bucketed artifact ship no artifact-side Exchange") {
      val root = java.nio.file.Files.createTempDirectory("graft-dedup-vb").toString
      DedupIndex.buildVersioned(docs, root, 1L, "graft_tvbx")
      DedupIndex.commit(spark, root, 1L, "graft_tvbx")
      val f = DedupIndex.readActive(spark, root, "graft_tvbx")
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        // the survivorship-report shape: pairs ⋈ components on the bucket
        // keys (pairs.doc_a = components.doc_id), both sides bucketed 8 —
        // co-located SortMergeJoin, zero Exchange anywhere in the plan
        val joined = f.pairs.join(
          f.components.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
        val plan = joined.queryExecution.executedPlan.toString
        plan should include("SortMergeJoin")
        plan should not include "Exchange"
        joined.count() should be > 0L
        // and the values are exactly the unbucketed join's
        val plainIdx = java.nio.file.Files.createTempDirectory("graft-dedup-vbp").toString
        val plain = DedupIndex.buildAndRead(docs, plainIdx)
        rowsOf(joined) shouldBe rowsOf(plain.pairs.join(
          plain.components.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a")))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}

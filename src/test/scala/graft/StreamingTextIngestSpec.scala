package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.TextOps
import graft.streaming.StreamingTextIngest

/** The streamed inverted index end to end: BM25 served from the
  * accumulated postings/doclen tables equals the inline batch build over
  * everything ingested, crash-retries are exactly-once, and cold start
  * needs no seed.
  */
class StreamingTextIngestSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  private val queries = Seq(1 -> Seq("hash", "join"), 2 -> Seq("scan"))

  private def docsDf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  private def ranked(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  private val b0 = Seq(1L -> "hash join scan table", 2L -> "join join filter")
  private val b1 = Seq(3L -> "scan scan hash", 4L -> "window agg")
  private val b2 = Seq(5L -> "hash hash join scan scan scan")

  it("from-index serving equals the inline batch build over the full stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sti").toString
    val (idxDir, ckpt) = (s"$dir/index", s"$dir/ckpt")
    val mem = MemoryStream[(Long, String)]
    val q = StreamingTextIngest.start(mem.toDS().toDF("doc_id", "text"), idxDir, ckpt)
    try {
      Seq(b0, b1, b2).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val p = StreamingTextIngest.readPostings(spark, idxDir)
    val d = StreamingTextIngest.readDoclens(spark, idxDir)
    val all = docsDf(b0 ++ b1 ++ b2)
    // the one streamed index serves the whole hybrid stack
    ranked(TextOps.bm25TopKFromIndex(p, d, queries)) shouldBe
      ranked(TextOps.bm25TopK(all, queries))
    ranked(TextOps.qlTopKFromIndex(p, d, queries)) shouldBe
      ranked(TextOps.qlTopK(all, queries))
    ranked(TextOps.rrfFusionFromIndex(p, d, queries)) shouldBe
      ranked(TextOps.rrfFusion(all, queries))
    ranked(TextOps.bm25TopKFromIndex(p, d, queries)).nonEmpty shouldBe true

    // phrase queries answer from the streamed positional table too
    val phrases = Seq(1 -> "hash join")
    val fromStream = TextOps.phraseSearch(
        StreamingTextIngest.readPositions(spark, idxDir), phrases)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toSet
    val inlinePhrase = TextOps.phraseSearch(
        TextOps.positionalIndexOf(all), phrases)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toSet
    fromStream shouldBe inlinePhrase
    fromStream.nonEmpty shouldBe true
  }

  it("a tok-bucketed postings layout prunes term lookups to their buckets") {
    // the 100 TB layout the scaladoc promises: postings bucketed by tok
    // mean each query term reads ONLY its own buckets — pruning visible
    // in the scan node — and term-keyed joins read postings pre-shuffled
    val p = {
      val dir = java.nio.file.Files.createTempDirectory("graft-sti-bkt").toString
      StreamingTextIngest.processBatch(docsDf(b0 ++ b1 ++ b2), 0L, dir)
      StreamingTextIngest.readPostings(spark, dir)
    }
    spark.sql("DROP TABLE IF EXISTS graft_postings_b")
    p.write.bucketBy(8, "tok").sortBy("tok").saveAsTable("graft_postings_b")
    // autoBucketedScan drops the bucketed layout for filter-only scans
    // (no join wants the partitioning); disable it to exercise pruning
    val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val plan = spark.table("graft_postings_b")
        .filter(org.apache.spark.sql.functions.col("tok") === "hash")
        .queryExecution.executedPlan.toString
      plan should include regex "SelectedBucketsCount: [1-7] out of 8"
    } finally spark.conf.set(conf, prev)
  }

  it("multi-term phrase search reads only the phrase words' buckets, every arm") {
    // the scale path for phraseSearch: the POSITIONAL table bucketed by
    // tok means each arm of the n-way consecutive-position self-join
    // scans only its own word's bucket files — the n scans in the plan
    // must each carry a proper SelectedBucketsCount subset, and results
    // must equal the unbucketed path bit for bit
    val docs = docsDf(Seq(
      6L -> "customer order merge runs the customer order merge path",
      7L -> "customer count order by merge", 8L -> "unrelated text entirely"))
    val pos = TextOps.positionalIndexOf(docs)
    spark.sql("DROP TABLE IF EXISTS graft_positions_b")
    pos.write.bucketBy(8, "tok").sortBy("tok").saveAsTable("graft_positions_b")
    val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val phrases = Seq(3 -> "customer order merge")
      val served = TextOps.phraseSearch(spark.table("graft_positions_b"), phrases)
      val plan = served.queryExecution.executedPlan.toString
      // one pruned scan per phrase word: every bucketed scan in the plan
      // selects a strict subset, and there are exactly 3 of them
      val pruned = "SelectedBucketsCount: ([0-9]+) out of 8".r
        .findAllMatchIn(plan).map(_.group(1).toInt).toSeq
      pruned.length shouldBe 3
      all(pruned) should be <= 7
      served.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet shouldBe
        TextOps.phraseSearch(pos, phrases)
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      // overlapping-adjacent repeats counted exactly (the LIKE-can't class)
      TextOps.phraseSearch(pos, phrases).filter("doc_id = 6").collect()
        .head.getLong(2) shouldBe 2L
    } finally {
      spark.conf.set(conf, prev)
      spark.sql("DROP TABLE IF EXISTS graft_positions_b")
    }
  }

  it("a replayed batch is exactly-once: postings are not duplicated") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sti-retry").toString
    StreamingTextIngest.processBatch(docsDf(b0), 0L, dir)
    StreamingTextIngest.processBatch(docsDf(b1), 1L, dir)
    val once = ranked(TextOps.bm25TopKFromIndex(
      StreamingTextIngest.readPostings(spark, dir),
      StreamingTextIngest.readDoclens(spark, dir), queries))
    StreamingTextIngest.processBatch(docsDf(b1), 1L, dir) // crash-retry
    ranked(TextOps.bm25TopKFromIndex(
      StreamingTextIngest.readPostings(spark, dir),
      StreamingTextIngest.readDoclens(spark, dir), queries)) shouldBe once
    StreamingTextIngest.readDoclens(spark, dir).count() shouldBe 4L // not 6
  }

  it("cold start serves empty without a seeded index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sti-cold").toString
    TextOps.bm25TopKFromIndex(
      StreamingTextIngest.readPostings(spark, dir),
      StreamingTextIngest.readDoclens(spark, dir), queries).count() shouldBe 0L
  }
}

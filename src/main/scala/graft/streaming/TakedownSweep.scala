package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Materialize.EagerOps

/** RIGHT-TO-BE-FORGOTTEN sweep: one takedown request fanned across EVERY
  * maintained serving artifact, plus the absence audit that proves it
  * landed.
  *
  * Each streaming maintainer already owns an idempotent, crash-retry-safe
  * forget path for its own artifact (the per-family specs pin
  * post-forget ≡ batch-rebuild-over-survivors). What a 100 TB platform
  * additionally needs is the COMPOSITION: a data subject's takedown names
  * ids in several modalities at once (their documents, media payloads,
  * embedding vectors, customer record), and compliance is a property of
  * the whole serving surface — forgetting the ANN index while the
  * near-dup pair graph still names the vector is a violation. `sweep`
  * fans one request across every registered artifact in one call;
  * `absenceAudit` then scans every LIVE reader of every registered
  * artifact for the tombstoned ids and returns the rows that still name
  * one — an empty result IS the compliance proof, and the audit a real
  * pipeline would persist next to the takedown ticket.
  *
  * Scale: each forget is the maintainer's own touched-partition
  * copy-on-write (never a full rewrite); the audit is one broadcast
  * semi-join per (artifact table, key column) — a handful of corpus
  * scans, embarrassingly parallel across tables, no shuffle beyond the
  * tombstone broadcast. Replaying `sweep` with the same request is
  * exactly-once because every underlying forget is idempotent.
  */
object TakedownSweep {

  /** Corpus caps for the oracle-checked `takedown_batch_report` query —
    * the fan-out exercises eight REAL artifact builds + the sweep per
    * invocation (it must: the sweep mutates what it audits, so nothing is
    * memoizable), and the point of the query is the mechanism, not the
    * corpus size. Fixed caps keep the build cost SF-independent; both the
    * Spark side and the DuckDB oracle slice through these constants.
    */
  val ReportDocCap = 600L
  val ReportVecCap = 600L
  val ReportCustCap = 300L

  /** The graph-ANN artifact needs its coarse quantizer to rebuild touched
    * neighbor-list partitions.
    */
  final case class GraphAnnHandle(graphDir: String, cents: DataFrame)

  /** Which maintained artifacts participate — `None` entries are skipped
    * (not every deployment runs every tier).
    */
  final case class Artifacts(
      dedupIndexDir: Option[String] = None,
      textIndexDir: Option[String] = None,
      chunkIndexDir: Option[String] = None,
      annIndexDir: Option[String] = None,
      spannIndexDir: Option[String] = None,
      graphAnn: Option[GraphAnnHandle] = None,
      mediaIndexDir: Option[String] = None,
      entityIndexDir: Option[String] = None)

  /** The subject's ids per modality: single-column frames (`doc_id`,
    * `media_id`, `vec_id`, `c_custkey`). `None` = nothing to forget in
    * that modality.
    */
  final case class Request(
      docIds: Option[DataFrame] = None,
      mediaIds: Option[DataFrame] = None,
      vecIds: Option[DataFrame] = None,
      custIds: Option[DataFrame] = None)

  /** Fan the takedown across every registered artifact. Idempotent —
    * a crash-retry of the whole sweep re-runs only idempotent forgets.
    *
    * `batchId` scopes the dedup-index CDC delete record (its forget path
    * is itself a logged CDC event); `excludeBatch` is the
    * combined-upsert+delete determinism knob threaded to EVERY maintainer
    * that supports batch-scoped merge-on-read (a sweep running inside the
    * same micro-batch as an upsert passes its own batch id so a crash
    * between the two replays deterministically). StreamingGraphAnn is the
    * one maintainer without the knob by design: its forget is a
    * scrub-then-rebuild that re-derives touched neighbor lists from
    * surviving postings, so there is no partial batch-scoped write for a
    * retry to observe.
    */
  def sweep(
      req: Request, arts: Artifacts, batchId: Long,
      excludeBatch: Option[Long] = None): Unit = {
    // Each forget targets its OWN artifact directory and none reads
    // another's — eight independent job pipelines. Running them from a
    // small thread pool (guide §2.6: overlap independent jobs) lets the
    // scheduler back-fill cores that any single forget's driver-side
    // orchestration (collects, commit renames) would leave idle; FIFO
    // scheduling keeps per-forget behavior unchanged. Semantics are
    // untouched: same per-artifact forgets, same idempotence, and the
    // batched ≡ sequential spec pins still hold because the final state
    // per artifact is identical regardless of interleaving.
    val forgets = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
    req.docIds.foreach { ids =>
      arts.dedupIndexDir.foreach(d => forgets +=
        (() => StreamingDedupIndex.processDeletes(ids, batchId, d)))
      arts.textIndexDir.foreach(d => forgets +=
        (() => StreamingTextIngest.processDeletes(ids, d, excludeBatch)))
      arts.chunkIndexDir.foreach(d => forgets +=
        (() => StreamingChunkDedup.processDeletes(ids, d, excludeBatch)))
    }
    req.vecIds.foreach { ids =>
      arts.annIndexDir.foreach(d => forgets +=
        (() => StreamingAnnIngest.processDeletes(ids, d, excludeBatch)))
      arts.spannIndexDir.foreach(d => forgets +=
        (() => StreamingSpannIngest.processDeletes(ids, d, excludeBatch)))
      arts.graphAnn.foreach(g => forgets +=
        (() => StreamingGraphAnn.processDeletes(ids, g.cents, g.graphDir)))
    }
    req.mediaIds.foreach { ids =>
      arts.mediaIndexDir.foreach(d => forgets +=
        (() => StreamingMediaDedup.processDeletes(ids, d, excludeBatch)))
    }
    req.custIds.foreach { ids =>
      arts.entityIndexDir.foreach(d => forgets +=
        (() => StreamingEntityRes.processDeletes(ids, d, excludeBatch)))
    }
    runConcurrently(forgets.toSeq)
  }

  /** Run independent driver-side pipelines concurrently (bounded pool),
    * propagating the first failure after all complete or fail.
    */
  private[graft] def runConcurrently(thunks: Seq[() => Unit]): Unit =
    if (thunks.size <= 1) thunks.foreach(_.apply())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(thunks.size, 8))
      try {
        import scala.jdk.CollectionConverters._
        val futures = pool.invokeAll(
          thunks.map(t => new java.util.concurrent.Callable[Unit] {
            override def call(): Unit = t()
          }).asJava)
        // rethrow the first failure UNWRAPPED: get() wraps it in
        // ExecutionException, which would change the exception type the
        // sequential path threw (callers/specs match on the original type)
        futures.asScala.foreach { f =>
          try f.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw Option(e.getCause).getOrElse(e)
          }
        }
      } finally pool.shutdown()
    }

  /** N takedown requests folded into ONE sweep: per modality, the union
    * of every request's ids scrubs each artifact in a single
    * touched-partition pass instead of N passes — at production takedown
    * volumes the per-request fixed cost (a read + copy-on-write rewrite
    * of touched partitions per artifact) dominates, and the fold pays it
    * once per artifact per batch. Semantically ≡ the N sequential sweeps
    * (every forget is a set-difference, and set-difference folds over
    * union), spec-pinned; idempotent for the same reason the single
    * sweep is.
    */
  def sweepBatch(
      reqs: Seq[Request], arts: Artifacts, batchId: Long,
      excludeBatch: Option[Long] = None): Unit =
    if (reqs.nonEmpty) sweep(combine(reqs), arts, batchId, excludeBatch)

  /** The modality-wise union of N requests — one Request whose id frames
    * are the distinct unions of the inputs'.
    */
  def combine(reqs: Seq[Request]): Request = {
    def merged(frames: Seq[DataFrame]): Option[DataFrame] =
      frames match {
        case Seq() => None
        case fs => Some(fs.reduce(_ unionByName _).distinct())
      }
    Request(
      docIds = merged(reqs.flatMap(_.docIds)),
      mediaIds = merged(reqs.flatMap(_.mediaIds)),
      vecIds = merged(reqs.flatMap(_.vecIds)),
      custIds = merged(reqs.flatMap(_.custIds)))
  }

  /** Per-request × per-artifact scrub accounting for a BATCHED sweep: for
    * each request, the absence audit's hit counts BEFORE the sweep (= the
    * rows the sweep will scrub on behalf of that request) and AFTER (the
    * compliance residue — all zeros on success). The frame a platform
    * persists next to the takedown tickets: every ticket gets its own
    * per-surface proof even though the scrub itself ran once for the
    * whole batch. Runs the audits, then ONE folded sweep, then the
    * post-audits.
    */
  def sweepBatchReport(
      spark: SparkSession, reqs: Seq[Request], arts: Artifacts,
      batchId: Long, excludeBatch: Option[Long] = None): DataFrame = {
    require(reqs.nonEmpty, "sweepBatchReport: empty request batch")
    def auditAll(suffix: String): DataFrame =
      reqs.zipWithIndex.map { case (r, i) =>
        absenceAudit(spark, r, arts, keepZeros = true)
          .select(lit(i).as("request_id"), col("artifact_table"),
            col("n_hits").as(s"n_hits_$suffix"))
      }.reduce(_ unionByName _)
    // the before-audit must be FORCED before the sweep mutates the very
    // artifacts it reads — a lazy plan evaluated after sweepBatch would
    // read post-scrub state and report zero rows scrubbed
    val before = auditAll("before").eagerCkpt
    sweepBatch(reqs, arts, batchId, excludeBatch)
    val after = auditAll("after")
    before.join(after, Seq("request_id", "artifact_table"))
      .select(col("request_id"), col("artifact_table"),
        col("n_hits_before").as("rows_scrubbed"),
        col("n_hits_after").as("rows_remaining"))
  }

  /** Rows still naming a tombstoned id, per (artifact table, key
    * column): EMPTY means the subject is gone from every registered
    * serving surface. Reads go through each maintainer's LIVE reader
    * (deletion-vector tiers audit what serving would actually see, not
    * raw storage).
    */
  def absenceAudit(
      spark: SparkSession, req: Request, arts: Artifacts,
      keepZeros: Boolean = false): DataFrame = {
    // Round 14: each check used to end in its own single-row `agg(count)` —
    // one exchange + one AQE stage materialization PER (artifact table,
    // key column), ~17 barriers per audit. Checks now contribute matching
    // rows (name only) to ONE union counted by ONE aggregation; zero-hit
    // tables are restored by a left join against the static check-name
    // list (the names are driver-side constants). Same (artifact_table,
    // n_hits) rows, one exchange.
    val checkNames = scala.collection.mutable.ArrayBuffer.empty[String]
    def hits(name: String, table: DataFrame, keyCol: String,
        ids: DataFrame, idCol: String): DataFrame = {
      checkNames += name
      table.join(
          broadcast(ids.select(col(idCol).as("graft_tomb_id")).distinct()),
          col(keyCol) === col("graft_tomb_id"), "left_semi")
        .select(lit(name).as("artifact_table"))
    }

    val checks = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    req.docIds.foreach { ids =>
      arts.dedupIndexDir.foreach { d =>
        checks += hits("dedup_index.signatures",
          StreamingDedupIndex.readSignatures(spark, d, Long.MaxValue),
          "doc_id", ids, "doc_id")
        val pairs = StreamingDedupIndex.readPairs(spark, d, Long.MaxValue)
        checks += hits("dedup_index.pairs.a", pairs, "doc_a", ids, "doc_id")
        checks += hits("dedup_index.pairs.b", pairs, "doc_b", ids, "doc_id")
      }
      arts.textIndexDir.foreach { d =>
        checks += hits("text_index.postings",
          StreamingTextIngest.readPostings(spark, d), "doc_id", ids, "doc_id")
        checks += hits("text_index.doclens",
          StreamingTextIngest.readDoclens(spark, d), "doc_id", ids, "doc_id")
        checks += hits("text_index.positions",
          StreamingTextIngest.readPositions(spark, d), "doc_id", ids, "doc_id")
      }
      arts.chunkIndexDir.foreach { d =>
        checks += hits("chunk_index.signatures",
          StreamingChunkDedup.readSignatures(spark, d)
            .withColumn("graft_parent",
              expr(s"doc_id DIV ${StreamingChunkDedup.ChunkIdFactor}")),
          "graft_parent", ids, "doc_id")
      }
    }
    req.vecIds.foreach { ids =>
      arts.annIndexDir.foreach { d =>
        checks += hits("ann_index.live",
          StreamingAnnIngest.readIndexLive(spark, d), "vec_id", ids, "vec_id")
      }
      arts.spannIndexDir.foreach { d =>
        // closure replication means one vector owns postings in several
        // cells — the live reader sees them all, so zero hits proves the
        // multi-cell scrub landed everywhere
        checks += hits("spann_index.postings",
          StreamingSpannIngest.readIndex(spark, d), "vec_id", ids, "vec_id")
      }
      arts.graphAnn.foreach { g =>
        checks += hits("graph_ann.postings",
          StreamingGraphAnn.readPostings(spark, g.graphDir), "vec_id", ids, "vec_id")
        val edges = StreamingGraphAnn.readEdges(spark, g.graphDir)
        checks += hits("graph_ann.edges.src", edges, "src", ids, "vec_id")
        checks += hits("graph_ann.edges.dst", edges, "dst", ids, "vec_id")
      }
    }
    req.mediaIds.foreach { ids =>
      arts.mediaIndexDir.foreach { d =>
        checks += hits("media_index.phash",
          StreamingMediaDedup.readPhash(spark, d, Long.MaxValue),
          "media_id", ids, "media_id")
        val pairs = StreamingMediaDedup.readPairs(spark, d)
        checks += hits("media_index.pairs.a", pairs, "media_a", ids, "media_id")
        checks += hits("media_index.pairs.b", pairs, "media_b", ids, "media_id")
      }
    }
    req.custIds.foreach { ids =>
      arts.entityIndexDir.foreach { d =>
        checks += hits("entity_index.records",
          StreamingEntityRes.readRecords(spark, d), "c_custkey", ids, "c_custkey")
        val pairs = StreamingEntityRes.readPairs(spark, d)
        checks += hits("entity_index.pairs.a", pairs, "id_a", ids, "c_custkey")
        checks += hits("entity_index.pairs.b", pairs, "id_b", ids, "c_custkey")
      }
    }
    require(checks.nonEmpty,
      "absenceAudit: no registered artifact matches any requested modality")
    import spark.implicits._
    val counts = checks.reduce(_ unionByName _)
      .groupBy(col("artifact_table")).agg(count(lit(1)).as("n_hits"))
    val all = checkNames.toSeq.toDF("artifact_table")
      .join(counts, Seq("artifact_table"), "left")
      .select(col("artifact_table"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
    if (keepZeros) all else all.filter(col("n_hits") > 0)
  }
}

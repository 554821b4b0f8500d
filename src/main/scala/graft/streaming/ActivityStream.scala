package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery}
import org.apache.spark.sql.Row

import graft.ops.ActivityOps

/** Streaming assembly of the reference pipeline
  * (reference: spark/spark_streaming.py:40-92 and its Flink twins
  * UserActivityFilterAgg.java / UserActivityInsert.java): source → parse →
  * clean → filter → watermark+window+count → foreachBatch JDBC append.
  *
  * The transforms are the SAME batch-verified functions from
  * graft.ops.ActivityOps — the batch/streaming sharing the reference's own
  * test architecture implies (spark-test.py runs the production chain on a
  * batch frame). Only the source/sink endpoints differ.
  *
  * Scale: the stateful agg keys on (id, event_type, window) — state is
  * bounded by watermark expiry (append mode purges closed windows); at
  * 100 TB/day the state store should be RocksDB
  * (`spark.sql.streaming.stateStore.providerClass`) and shuffle partitions
  * sized to executor count; both are plain session confs, nothing here
  * changes.
  */
object ActivityStream {

  /** Default config mirroring the reference's constants
    * (spark_streaming.py:18-25,45,60-65,89-90; UserActivityFilterAgg.java:86,105,131).
    */
  case class Config(
      topic: String = "user_activity",
      bootstrapServers: String = "localhost:9092",
      startingOffsets: String = "latest",
      groupId: Option[String] = None,
      keepEvents: Seq[String] = Seq("liked", "commented"),
      watermark: String = "10 seconds",
      windowDuration: String = "1 minute",
      checkpointLocation: String = "/tmp/spark-checkpoints/user_activity")

  /** The exact spark-sql-kafka option spellings, exposed as a plain Map so
    * the spelling contract is unit-testable without a broker (the one part
    * of the Kafka path this image cannot execute): consumer configs pass
    * through with the `kafka.` prefix, source-level options
    * (subscribe/startingOffsets) without it.
    */
  def kafkaOptions(cfg: Config): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "subscribe" -> cfg.topic,
      "startingOffsets" -> cfg.startingOffsets) ++
      cfg.groupId.map("kafka.group.id" -> _)

  /** S1/S2: Kafka streaming source, value-only (column pruning to `value`
    * happens in the plan; Kafka's other 6 columns are never materialized).
    */
  def kafkaSource(spark: SparkSession, cfg: Config): DataFrame =
    spark.readStream.format("kafka").options(kafkaOptions(cfg)).load()

  /** Raw `value: binary` stream → flattened clean activity rows
    * (id, date timestamp, event_type lowercase, url). Works identically on
    * batch frames (the oracle path) and streams.
    */
  def parseAndClean(raw: DataFrame): DataFrame =
    ActivityOps.cleanActivity(ActivityOps.parseActivityJson(raw))

  /** The aggregate pipeline (3.1): filtered 1-minute windowed counts.
    * Emits (id, event_type, window_start, window_end, count).
    */
  def aggPipeline(clean: DataFrame, cfg: Config = Config()): DataFrame =
    ActivityOps.windowedCount(
      ActivityOps.filterEvents(clean, cfg.keepEvents),
      tsCol = "date",
      keyCols = Seq("id", "event_type"),
      windowDuration = cfg.windowDuration,
      watermark = Some(cfg.watermark))

  /** The raw-insert pipeline (UserActivityInsert twin): filtered
    * pass-through (id, date, event_type, url).
    */
  def rawInsertPipeline(clean: DataFrame, keep: Seq[String] = Seq("liked", "bookmarked", "commented")): DataFrame =
    ActivityOps.rawInsertProjection(clean, keep)

  /** K1-K6: foreachBatch JDBC-append writer. The batch is persisted before
    * the count+write pair — the reference's `df.count()` log line
    * (spark_streaming.py:85-87) silently re-executes the whole batch plan;
    * persisting fixes that while keeping the logged metric (SURVEY §7.4.3).
    */
  def jdbcForeachBatch(
      url: String,
      table: String,
      user: String,
      password: String,
      batchSize: Int = 1000,
      driver: String = "org.postgresql.Driver",
      log: String => Unit = _ => ()): (DataFrame, Long) => Unit = { (batch, batchId) =>
    batch.persist()
    try {
      log(s"Processing batch $batchId with ${batch.count()} rows")
      batch.write
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("batchsize", batchSize)
        .mode("append")
        .save()
    } finally batch.unpersist()
  }

  /** EXACTLY-ONCE JDBC writer: the reference's append sink (above) is
    * at-least-once — a crash between the JDBC insert and the checkpoint
    * commit replays the batch and doubles its rows. This variant stamps
    * every row with its micro-batch id and starts each batch by DELETING
    * any earlier attempt of the SAME batch id, so the replay scrubs the
    * half-written (or fully-written-but-uncommitted) first attempt before
    * re-inserting: delivery is idempotent per batch, which together with
    * Structured Streaming's pinned batch contents makes the sink
    * end-to-end exactly-once. The same mechanism as the parquet sinks'
    * batch_id partition overwrite, expressed in the transactional store's
    * own terms (the DELETE and the inserts need not even share a
    * transaction — a crash between them just re-runs both).
    *
    * The target table needs a `graft_batch_id BIGINT` column; the DELETE
    * is an indexed single-key statement, so at scale it prunes to the
    * replayed batch's rows, never a table scan of history.
    *
    * CAVEAT — the guarantee is per-BATCH, and it requires that no writer
    * task commits twice WITHIN a successful batch: the scrub runs once on
    * the driver before the distributed append, so a task re-execution
    * after its partition already committed (speculative execution, or a
    * retry after a post-commit failure) duplicates rows that no later
    * scrub removes, because a successful batch id never replays. This
    * writer therefore REFUSES to run with `spark.speculation=true`; for
    * task-retry safety beyond that, give the table a unique key over
    * (graft_batch_id, row id) so the store itself rejects the second
    * commit, or stage into a per-attempt table and swap transactionally.
    */
  def jdbcIdempotentForeachBatch(
      url: String,
      table: String,
      user: String,
      password: String,
      batchSize: Int = 1000,
      driver: String = "org.postgresql.Driver",
      log: String => Unit = _ => ()): (DataFrame, Long) => Unit = { (batch, batchId) =>
    import org.apache.spark.sql.functions.lit
    require(!batch.sparkSession.conf.get("spark.speculation", "false").toBoolean,
      "jdbcIdempotentForeachBatch: spark.speculation must be false — a " +
        "speculative duplicate of an already-committed partition would " +
        "double rows inside a successful batch, and that batch id never " +
        "replays, so nothing scrubs them (see the scaladoc caveat)")
    batch.persist()
    try {
      log(s"Processing batch $batchId with ${batch.count()} rows")
      if (driver.nonEmpty) Class.forName(driver)
      val conn = java.sql.DriverManager.getConnection(url, user, password)
      try {
        val st = conn.prepareStatement(s"""DELETE FROM $table WHERE "graft_batch_id" = ?""")
        st.setLong(1, batchId)
        val scrubbed = st.executeUpdate()
        st.close()
        if (scrubbed > 0) log(s"Scrubbed $scrubbed rows from a replayed attempt of batch $batchId")
      } finally conn.close()
      batch.withColumn("graft_batch_id", lit(batchId)).write
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("batchsize", batchSize)
        .mode("append")
        .save()
    } finally batch.unpersist()
  }

  /** A8/K5/K8: assemble a writeStream in append mode with checkpointing.
    * Call `.start()` on the result; `awaitTermination` is the caller's.
    */
  def writer(
      agg: DataFrame,
      cfg: Config,
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    agg.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", cfg.checkpointLocation)
      .foreachBatch(sink)

  /** Full production job twin (3.1): Kafka → agg → JDBC. Returns the started
    * query; `query.awaitTermination()` to block (K8).
    */
  def startAggJob(
      spark: SparkSession,
      cfg: Config,
      jdbcUrl: String,
      table: String,
      user: String,
      password: String): StreamingQuery = {
    val agg = aggPipeline(parseAndClean(kafkaSource(spark, cfg)), cfg)
    writer(agg, cfg, jdbcForeachBatch(jdbcUrl, table, user, password)).start()
  }
}

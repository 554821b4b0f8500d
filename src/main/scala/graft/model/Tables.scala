package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness's parquet tables (TESTDATA.md). Column pruning and
  * filter pushdown happen automatically because these return lazy DataFrames —
  * callers select/filter and Catalyst pushes into the parquet scan.
  */
object Tables {

  /** Parquet footer schema memoized per path — METADATA only, never data.
    * `spark.read.parquet` with no schema runs a footer-inference Spark job
    * on every call; with 280 registered queries × reps × several tables
    * each, those one-task driver-side jobs are a measurable slice of the
    * per-query floor (StageProbe: 40-60 ms of a trivial query's ~250 ms).
    * In production the schema lives in the catalog and this job never
    * runs — the memo reproduces that contract for the path-based tables.
    * Keyed by CANONICALIZED absolute path (two spellings of one location
    * share an entry; relative paths resolve against the JVM's cwd once,
    * not per call). In-process schema REWRITES of a memoized path are
    * unsupported by design — the memo would serve the stale schema;
    * testdata files never change schema within a process
    * (TablesContractSpec pins them), and specs that write their own temp
    * tables get distinct paths.
    */
  private val schemaMemo =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val key = new java.io.File(path).getCanonicalPath
    val sch = schemaMemo.getOrElseUpdate(key, spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  /** `events.parquet`'s `ts` physical type has drifted across testdata
    * generations: TIMESTAMP(NANOS) (which Spark reads only as long via the
    * `nanosAsLong` legacy conf) and timestamp[us] (which Spark reads as
    * TIMESTAMP_NTZ when the file is not UTC-adjusted). Normalize both to
    * session-TZ TimestampType (sessions here run UTC, so NTZ→TZ is
    * value-identical) so every downstream operator and oracle sees one stable
    * type. Any other dtype fails loudly with the table/column named, instead
    * of 50+ cryptic analysis errors downstream.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    // Set once; repeated conf.set calls invalidate session-level caches.
    // Harmless for non-nanos files; required to even infer a nanos schema.
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long: floor-divide to micros (matches DuckDB's scan conversion)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts: unexpected parquet dtype $other in $dir/events.parquet — " +
            "expected TIMESTAMP(NANOS)-as-long, timestamp, or timestamp_ntz; " +
            "testdata schema drifted again?")
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.VectorOps

/** Throwaway A/B harness: where does ann_ivf_topk's residual time go?
  * Compares the registered query (TopKAggregator final stage) against the
  * row_number-window variant and against the scored join alone (no final
  * top-k at all), each best-of-N in one JVM.
  */
object AbIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime(); val n = f; val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"$label%-22s min ${ts.map(_._1).min}%6.2f  reps ${ts.map(t => f"${t._1}%.2f").mkString(" ")}  rows ${ts.head._2}")
    }

    val emb = Tables.embeddings(spark, sfDir)

    // full registered shape (UDAF top-k)
    time("udaf-topk") { VectorOps.ivfTopK(emb, 10, 1).count() }

    // window variant: identical scored join, row_number final stage
    time("window-topk") {
      import org.apache.spark.sql.expressions.Window
      val scored = VectorOps.ivfScored(emb, 1)
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 10).count()
    }

    // scored join alone — the floor every final stage pays
    time("scored-only") { VectorOps.ivfScored(emb, 1).count() }

    // phase floors inside the scored join
    time("cents-agg-collect") {
      VectorOps.centroids(emb).collect().length.toLong
    }
    val centsDf = VectorOps.centroids(emb).select(col("label").as("cell"), col("centroid"))
    time("assign-only") {
      VectorOps.assignCells(emb, centsDf).count()
    }
    time("raw-scan") { emb.count() }

    // planning alone: analyze+optimize+physical-plan the scored join,
    // execute nothing — how much of the floor is O(plan size), constant in
    // data volume?
    time("plan-only") {
      VectorOps.ivfScored(emb, 1).queryExecution.executedPlan
      0L
    }

    println("fallbacks: " +
      graft.plans.PlanAudit.audit(VectorOps.ivfScored(emb, 1))
        .filter(_.kind == "codegen-fallback").mkString("; "))

    // same logical query, ONE DataFrame reused across reps: separates
    // re-derivation cost (analysis/codegen per fresh build) from execution
    val reused = VectorOps.ivfScored(emb, 1)
    time("scored-reused-df") { reused.count() }

    spark.stop()
  }
}

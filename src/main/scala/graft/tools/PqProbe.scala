package graft.tools

import org.apache.spark.sql.{functions => F, SparkSession}
import graft.functions.ArrayDotProduct.dot
import graft.model.Tables
import graft.ops.VectorOps

/** Scratch phase profiler for the PQ ADC path (dev tool, not a query). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import F._

    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        stageLog.add(f"stage ${si.stageId}%4d ${ms.getOrElse(-1L)}%6d ms  " +
          f"tasks=${si.numTasks}%3d  ${si.name.take(60)}")
      }
    })

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val emb = Tables.embeddings(spark, sfDir)
    emb.count() // warm scan

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val cbs = t("codebooks (driver)") { VectorOps.pqCodebooks(emb) }
      val book = graft.functions.PqBook(cbs, VectorOps.PqSubDim)
      val enc = t("encode.count") { VectorOps.pqEncode(emb, cbs).count() }
      val rec = emb
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .select(col("vec_id").as("neighbor_id"),
          round(sqrt(dot(col("v"), col("v"))), 6).as("vnorm"),
          graft.functions.PqReconstruct.reconstruct(
            graft.functions.PqEncodeCodes.encode(col("v"), book), book).as("rv"))
      t("rec.count") { rec.count() }
      val q = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").cast("array<double>").as("qv"))
        .select(col("q_id"), col("qv"), sqrt(dot(col("qv"), col("qv"))).as("qn"))
      val scored = broadcast(q).join(rec, col("q_id") =!= col("neighbor_id"))
        .select(col("q_id"), col("neighbor_id"),
          round(dot(col("qv"), col("rv")) / (col("qn") * col("vnorm")), 6).as("cos"))
      t("scored.count") { scored.count() }
      val topk = udaf(new graft.functions.TopKAggregator(10),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong))
      val agged = scored.groupBy(col("q_id"))
        .agg(topk(col("cos"), col("neighbor_id")).as("topk"))
      t("udaf agg.count") { agged.count() }
      t("udaf+posexplode.count") {
        agged.select(col("q_id"), posexplode(col("topk")).as(Seq("i", "t")))
          .select(col("q_id"), (col("i") + 1).cast("int").as("rank"),
            col("t._2").as("neighbor_id"), col("t._1").as("cos")).count()
      }
      t("window topk.count") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("neighbor_id").asc)
        scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
          .select(col("q_id"), col("rank"), col("neighbor_id"), col("cos")).count()
      }
      stageLog.clear()
      t("full pqAdcTopK.count") { VectorOps.pqAdcTopK(emb).count() }
      Thread.sleep(300)
      stageLog.forEach(s => println(s"  adc| $s"))
      stageLog.clear()
      t("full pqRecallReport.count") { VectorOps.pqRecallReport(emb).count() }
      Thread.sleep(300)
      stageLog.forEach(s => println(s"  rec| $s"))
      spark.catalog.clearCache()
      println(s"enc=$enc")
    }
    spark.stop()
  }
}

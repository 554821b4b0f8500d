package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for all specs (getOrCreate → one JVM-wide session;
  * UTC pinned exactly like the reference test does, spark-test.py:12).
  */
trait SparkSessionTestWrapper {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .getOrCreate()
}

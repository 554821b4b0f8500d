package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

/** Accuracy contract for the sketch-based operators (rows-only at the
  * oracle): HLL++ cardinality must land within its error bound.
  */
class SketchSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  describe("approx_count_distinct") {
    it("estimates cardinality within bound on 100k keys (rsd=2%)") {
      import spark.implicits._
      val df = (1 to 200000).map(i => i % 100000).toDF("k").repartition(8)
      // default rsd is 5% at ONE sigma — observed 5.05% on this data; ask
      // for a 2% sketch and assert the 3-sigma envelope
      val approx = df.agg(approx_count_distinct(col("k"), 0.02).as("a"))
        .collect()(0).getLong(0).toDouble
      math.abs(approx - 100000.0) / 100000.0 should be < 0.06
    }

    it("is deterministic across partitionings (sketch merge is commutative)") {
      import spark.implicits._
      val df = (1 to 50000).map(i => i % 9999).toDF("k")
      def est(parts: Int) =
        df.repartition(parts).agg(approx_count_distinct(col("k"))).collect()(0).getLong(0)
      est(2) shouldBe est(13)
    }
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.GraftExtensions

/** The builder registration path: a session created with
  * `.withExtensions(new GraftExtensions)` (equivalently
  * `spark.sql.extensions=graft.plans.GraftExtensions` in production) gets
  * the strategy/rules/function WITHOUT any runtime install call. The test
  * builds a genuinely new SparkSession over the shared SparkContext by
  * clearing the active/default handles first (getOrCreate would otherwise
  * return the suite session, silently skipping the extensions).
  */
class GraftExtensionsSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  describe("builder .withExtensions registration") {
    it("plans the as-of join and resolves array_dot with no runtime install") {
      spark.sparkContext // ensure the shared context exists
      val prevDefault = SparkSession.getDefaultSession
      val prevActive = SparkSession.getActiveSession
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try {
        s2 should not be theSameInstanceAs(spark)

        // injectFunction path
        s2.sql("SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
          .collect()(0).getDouble(0) shouldBe 11.0

        // injectPlannerStrategy path: build the logical node directly —
        // only a registered strategy can plan it
        import org.apache.spark.sql.graftbridge.{analyzedPlan, ofRows}
        import s2.implicits._
        val left = Seq((1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
          .toDF("event_id", "key", "ts")
        val right = Seq((10L, 7L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00")))
          .toDF("rkey", "rid", "rts")
        val (lp, rp) = (analyzedPlan(left), analyzedPlan(right))
        def a(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
          p.output.find(_.name == n).get
        val node = graft.plans.AsofJoinPlan(
          Seq(a(lp, "key")), Seq(a(rp, "rkey")), a(lp, "ts"), a(rp, "rts"),
          a(rp, "rid"), outer = false, lp, rp)
        val out = ofRows(s2, node).select(col("event_id"), col("rid")).collect()
        out.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq((1L, 7L))
      } finally {
        // never stop s2 — it shares the suite's SparkContext
        SparkSession.setDefaultSession(prevDefault.orNull)
        SparkSession.setActiveSession(prevActive.orNull)
      }
    }
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.ops.Joins

class JoinsSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  describe("asofJoin") {
    it("attaches the latest at-or-before right row per key with tie-break") {
      import spark.implicits._
      val left = Seq(
        (1L, 10L, ts("2024-01-01 10:00:00")), // matches r2 (09:00)
        (2L, 10L, ts("2024-01-01 08:00:00")), // exact tie with r1 ts → inclusive
        (3L, 10L, ts("2024-01-01 07:00:00")), // before all rights → dropped
        (4L, 20L, ts("2024-01-01 10:00:00")), // key 20: two rights at same ts → max tiebreak
        (5L, 30L, ts("2024-01-01 10:00:00"))  // key with no rights → dropped
      ).toDF("event_id", "key", "ts")
      val right = Seq(
        (10L, 101L, ts("2024-01-01 08:00:00")), // r1
        (10L, 102L, ts("2024-01-01 09:00:00")), // r2
        (10L, 103L, ts("2024-01-01 11:00:00")), // r3: after all lefts
        (20L, 201L, ts("2024-01-01 09:30:00")),
        (20L, 202L, ts("2024-01-01 09:30:00"))  // same ts as 201 → higher key wins
      ).toDF("rkey", "rid", "rts")

      val out = Joins.asofJoin(left, right,
          leftKey = "key", rightKey = "rkey", leftTs = "ts", rightTs = "rts",
          rightVals = Seq("rid"), rightTieBreak = "rid")
        .select("event_id", "rid").as[(Long, Long)].collect().toMap

      out shouldBe Map(1L -> 102L, 2L -> 101L, 4L -> 202L)
    }
  }
}

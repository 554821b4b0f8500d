package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.ops.TimeSeries

/** Dyadic EWMA over the gap-filled hourly grid: head normalization makes
  * a constant series map to itself from row 0, an impulse decays by the
  * exact closed-form dyadic ratios, and missing hours smooth as zeros.
  */
class EwmaSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  import spark.implicits._

  /** events with exactly `counts(k)` rows in hour k (hours are
    * contiguous from a fixed epoch so the gap-fill grid is the index).
    */
  private def eventsFor(counts: Seq[Int]) = {
    val base = 1700000000000L // fixed ms epoch, hour-aligned enough
    counts.zipWithIndex.flatMap { case (c, k) =>
      (1 to c).map(_ => ("click", new java.sql.Timestamp(base + k * 3600000L)))
    }.toDF("event_type", "ts")
  }

  private def ewmaSeries(counts: Seq[Int]): Seq[Double] =
    TimeSeries.ewmaHourly(eventsFor(counts))
      .orderBy(col("h")).select(col("ewma")).collect().map(_.getDouble(0)).toSeq

  describe("ewmaHourly") {
    it("maps a constant series to itself (head normalization is unbiased)") {
      ewmaSeries(Seq.fill(10)(5)) shouldBe Seq.fill(10)(5.0)
    }

    it("decays an impulse by the exact dyadic ratios") {
      // the final 1-count hour anchors the grid (a trailing all-zero
      // hour has no rows, so the gap-fill bounds would stop at hour 0)
      val got = ewmaSeries(Seq(64, 0, 0, 1))
      got.head shouldBe 64.0 // row 0 is exactly its own value
      // impulse at t=0: ewma_t = 64·2^-(t+1) / (1 − 2^-(t+1)) = 64/(2^(t+1)−1)
      got(1) shouldBe (64.0 / 3) +- 1e-6
      got(2) shouldBe (64.0 / 7) +- 1e-6
      // t=3 adds its own count: (1/2 + 64/16) / (15/16) = 4.8
      got(3) shouldBe 4.8 +- 1e-6
    }

    it("grid-fills hours absent from the data as zeros before smoothing") {
      // hour 0 has 8 events, hours 1-2 are ABSENT (no rows at all), hour
      // 3 has 8 — the output must still carry all four grid hours, with
      // the absent hours decaying the baseline like explicit zeros
      val got = ewmaSeries(Seq(8, 0, 0, 8))
      got should have length 4
      got(1) shouldBe (8.0 / 3) +- 1e-6
      got(2) shouldBe (8.0 / 7) +- 1e-6
    }
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def docsDf(rows: Seq[(Long, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
  }

  private val docs = docsDf(Seq(
    (0L, "alpha beta gamma", "en", "s1"),
    (1L, "delta epsilon", "en", "s2"),
    (2L, "zeta eta theta iota", "de", "s1"),
    (3L, "kappa", "fr", "s3"),
    (4L, "lambda mu", "en", "s1")))

  describe("mediaTable") {
    it("carries binary payload + typed metadata with round-robin types") {
      val rows = Multimodal.mediaTable(docs).collect()
      rows.map(_.getString(1)).toSeq.sorted shouldBe Seq("audio", "audio", "image", "image", "video")
      val r0 = rows.find(_.getLong(0) == 0L).get
      new String(r0.getAs[Array[Byte]]("content"), "UTF-8") shouldBe "alpha beta gamma"
      r0.getAs[org.apache.spark.sql.Row]("meta").getAs[String]("lang") shouldBe "en"
    }
  }

  describe("stubDecode") {
    it("produces deterministic byte-statistics features") {
      val f = Multimodal.stubDecode(Array[Byte](0, -1)) // bytes 0 and 255
      f.length shouldBe 8
      f(0) shouldBe 2.0 // n
      f(1) shouldBe 127.5 // mean
      f(3) shouldBe 0.0 // min
      f(4) shouldBe 255.0 // max
      Multimodal.stubDecode(Array.emptyByteArray) shouldBe Array.fill(8)(0.0)
      Multimodal.stubDecode(null) shouldBe Array.fill(8)(0.0)
    }
  }

  describe("decodeFeatures") {
    it("emits one fixed-width feature row per payload through batched mapPartitions") {
      val out = Multimodal.decodeFeatures(Multimodal.mediaTable(docs), batchSize = 2)
      out.columns.toSeq shouldBe
        Seq("media_id", "media_type", "n_bytes") ++ (0 until 8).map(i => s"f$i")
      val rows = out.collect()
      rows.length shouldBe 5
      rows.foreach(_.getInt(2) should be > 0)
      // scalar features equal the direct stub call rounded to 6dp
      // (plumbing adds nothing)
      val viaDf = rows.find(_.getLong(0) == 3L).get
      val expected = Multimodal.stubDecode("kappa".getBytes("UTF-8"))
        .map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (0 until 8).map(i => viaDf.getDouble(3 + i)).toArray shouldBe expected
    }
  }

  describe("decodeFeaturesArrow") {
    it("is row-identical to the mapPartitions path through real Arrow batches") {
      val media = Multimodal.mediaTable(docs)
      // batchSize 2 forces multiple Arrow record batches per partition
      val arrow = Multimodal.decodeFeaturesArrow(media, batchSize = 2)
      val rows = Multimodal.decodeFeatures(media, batchSize = 2)
      arrow.columns.toSeq shouldBe rows.columns.toSeq
      val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
      val a = arrow.collect().sortBy(key).map(_.toSeq)
      val b = rows.collect().sortBy(key).map(_.toSeq)
      a shouldBe b
    }

    it("round-trips null and empty payloads through the Arrow batch") {
      import spark.implicits._
      val media = Seq(
        (0L, Option("image"), Option("abc".getBytes("UTF-8"))),
        (1L, None: Option[String], Option(Array.emptyByteArray)),
        (2L, Option("audio"), None: Option[Array[Byte]]))
        .toDF("media_id", "media_type", "content")
      val out = Multimodal.decodeFeaturesArrow(media, batchSize = 2)
        .collect().sortBy(_.getLong(0))
      out.map(_.getInt(2)).toSeq shouldBe Seq(3, 0, 0) // n_bytes
      out(1).isNullAt(1) shouldBe true // media_type null survives
      out(2).getDouble(3) shouldBe 0.0 // null payload → zero features
    }
  }
}

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

  describe("perceptual media dedup") {
    // block-structured payloads: 64 blocks × 8 chars, alternating low '!'
    // (33) and high '~' (126) blocks — every block mean sits FAR from the
    // payload mean, so the fingerprint is exactly the alternation pattern
    // and single-byte edits can never flip an unrelated bit
    val lowBlk = "!" * 8
    val highBlk = "~" * 8
    val structured =
      (0 until 64).map(b => if (b % 2 == 0) lowBlk else highBlk).mkString
    // twin: the first (low) block inverted to high — exactly one bit flips
    val oneBlockOff = highBlk + structured.substring(8)
    // anti-doc: the inverted alternation — Hamming 64, shares no band
    val inverted =
      (0 until 64).map(b => if (b % 2 == 0) highBlk else lowBlk).mkString
    def hashChars(n: Int, seed: Long): String =
      (0 until n).map { p =>
        (33 + (((p * 2654435761L + seed * 40503L) >>> 7) % 94).toInt).toChar
      }.mkString

    it("stubPerceptual packs the blockwise sign pattern into 4 band words") {
      val bands = Multimodal.stubPerceptual(structured.getBytes("UTF-8"))
      // odd blocks high → bits 1,3,5,... set in every 16-bit word = 0xAAAA
      bands.toSeq shouldBe Seq.fill(4)(0xAAAA)
      Multimodal.stubPerceptual(inverted.getBytes("UTF-8")).toSeq shouldBe
        Seq.fill(4)(0x5555)
      Multimodal.stubPerceptual(Array.emptyByteArray).toSeq shouldBe Seq.fill(4)(0)
      Multimodal.stubPerceptual(null).toSeq shouldBe Seq.fill(4)(0)
    }

    it("pairs the local-edit twins, rejects the structural opposite, candidates ≪ all-pairs") {
      // 40 unrelated fillers with DISTINCT random-ish band patterns (hash
      // chars) so the candidate-ratio pin is meaningful
      val fillers = (100L until 140L).map(i => (i, hashChars(512, i), "en", "s1"))
      val docs = docsDf(Seq(
        (1L, structured, "en", "s1"),
        (2L, oneBlockOff, "en", "s1"),
        (3L, inverted, "en", "s1")) ++ fillers)
      val pairs = Multimodal.mediaNearDupPairs(Multimodal.mediaTable(docs))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // the one-block twin pairs at Hamming exactly 1; the structural
      // opposite must NOT appear in any pair with doc 1
      pairs should contain((1L, 2L, 1L))
      pairs.filter(p => Set(p._1, p._2) == Set(1L, 3L)) shouldBe empty

      // candidate-ratio pin: banded collisions ≪ all-pairs
      val ph = Multimodal.perceptualHash(Multimodal.mediaTable(docs))
      import org.apache.spark.sql.functions._
      val banded = ph.select(col("media_id"),
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("band"), col(s"pb$j").as("bw"))): _*)).as("b"))
        .select(col("media_id"), col("b.band"), col("b.bw"))
      val a = banded.as("a"); val b = banded.as("b")
      val nCand = a.join(b, col("a.band") === col("b.band") &&
          col("a.bw") === col("b.bw") && col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id"), col("b.media_id")).distinct().count()
      val n = docs.count()
      nCand.toDouble should be < (n * (n - 1) / 2).toDouble * 0.05
    }

    it("the occupancy cap skips saturated buckets, keeps everything else, and the band stats account for exactly what it skipped") {
      // a SATURATED crowd: 40 byte-identical payloads share one bucket in
      // every band (occupancy 40+), while the structured twins (1, 2) and
      // ten distinct fillers stay in small buckets
      val crowd = (200L until 240L).map(i => (i, structured, "en", "s2"))
      val fillers = (100L until 110L).map(i => (i, hashChars(512, i), "en", "s1"))
      val docs = docsDf(Seq(
        (1L, inverted, "en", "s1"),
        (2L, highBlk + inverted.substring(8), "en", "s1")) ++ fillers ++ crowd)
      val media = Multimodal.mediaTable(docs)
      def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val full = pairSet(Multimodal.mediaNearDupPairs(media))
      // cap above every occupancy: identical output (42 is the crowd+2)
      pairSet(Multimodal.mediaNearDupPairsCapped(media, cap = 100)) shouldBe full
      // cap below the crowd: its quadratic pair core vanishes, the
      // small-bucket twin pair survives, and nothing new appears
      val capped = pairSet(Multimodal.mediaNearDupPairsCapped(media, cap = 16))
      capped should contain((1L, 2L))
      capped.subsetOf(full) shouldBe true
      full.count { case (a, b) => a >= 200 && b >= 200 } shouldBe (40 * 39) / 2
      capped.count { case (a, b) => a >= 200 && b >= 200 } shouldBe 0
      // the audit accounts for exactly the skipped volume, band by band
      val stats = Multimodal.mediaBandStats(media, cap = 16).collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toMap
      stats.keySet shouldBe Set(0, 1, 2, 3)
      stats.values.foreach { case (_, maxOcc, candAll, nOver, candOver) =>
        maxOcc should be >= 40L // the crowd saturates every band
        nOver should be >= 1L
        candOver should be >= (40L * 39) / 2
        candAll should be >= candOver
      }
    }

    it("entropy-selected bands spread a low-entropy corpus and still pair the planted twin") {
      // LOW-ENTROPY corpus: blocks 0-47 are a constant alternation shared
      // by every payload (48 dead bits), blocks 48-63 vary per doc — the
      // FIXED banding puts the 48 dead bits in bands 0-2 (three
      // corpus-sized buckets, quadratic candidates); the trained banding
      // deals the 16 live bits across all four bands
      def payload(seed: Long): String =
        (0 until 48).map(b => if (b % 2 == 0) lowBlk else highBlk).mkString +
          hashChars(128, seed)
      val twinA = payload(7)
      val twinB = highBlk + twinA.substring(8) // one-block local edit
      val fillers = (100L until 140L).map(i => (i, payload(i), "en", "s1"))
      val docs = docsDf(Seq((1L, twinA, "en", "s1"), (2L, twinB, "en", "s1")) ++ fillers)
      val media = Multimodal.mediaTable(docs)

      // the trained assignment is a permutation of the 64 bits, 4 x 16,
      // and training is deterministic
      val ph = Multimodal.perceptualHash(media)
      val fr = Multimodal.trainBitFractions(ph)
      val asg = Multimodal.entropyBandAssignment(fr)
      asg.length shouldBe 4
      asg.foreach(_.length shouldBe 16)
      asg.flatten.sorted.toSeq shouldBe (0 until 64)
      Multimodal.entropyBandAssignment(Multimodal.trainBitFractions(ph))
        .map(_.toSeq).toSeq shouldBe asg.map(_.toSeq).toSeq

      def totals(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val rows = df.collect().map(r => (r.getLong(2), r.getLong(3)))
        (rows.map(_._1).max, rows.map(_._2).sum) // (max occupancy, Σ candidates)
      }
      val (fixedMax, fixedCand) = totals(Multimodal.mediaBandStats(media))
      val (entMax, entCand) = totals(Multimodal.mediaEntropyBandStats(media))
      fixedMax shouldBe 42L // the dead bands hold the whole corpus
      entMax should be < fixedMax
      entCand should be < fixedCand / 4 // the spread has real bite
      // and the serving twin still surfaces the planted local-edit pair
      val pairs = Multimodal.mediaNearDupPairsEntropy(media).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs should contain((1L, 2L))
    }

    it("capped-pair survivorship refines the uncapped survivorship: capped CC drops ⊆ uncapped CC drops") {
      // the media_curation_pipeline monotonicity argument: capped pairs
      // are a subgraph, so capped components refine uncapped ones, and a
      // node that was min of its uncapped component is min of its capped
      // sub-component too — survivors can only GROW under the cap
      val crowd = (200L until 240L).map(i => (i, structured, "en", "s2"))
      val fillers = (100L until 110L).map(i => (i, hashChars(512, i), "en", "s1"))
      val docs = docsDf(Seq(
        (1L, inverted, "en", "s1"),
        (2L, highBlk + inverted.substring(8), "en", "s1")) ++ fillers ++ crowd)
      val media = Multimodal.mediaTable(docs)
      import org.apache.spark.sql.functions.col
      def droppedOf(pairs: org.apache.spark.sql.DataFrame): Set[Long] =
        graft.ops.Dedup.nearDupComponentsExact(
            pairs.withColumnRenamed("media_a", "doc_a")
              .withColumnRenamed("media_b", "doc_b"))
          .filter(col("doc_id") =!= col("rep"))
          .collect().map(_.getLong(0)).toSet
      val dFull = droppedOf(Multimodal.mediaNearDupPairs(media))
      val dCap = droppedOf(Multimodal.mediaNearDupPairsCapped(media, cap = 16))
      dCap.subsetOf(dFull) shouldBe true
      dCap.size should be < dFull.size // the cap DID bite on the crowd
    }

    it("phash top-k ranks the close twin first, the looser edit second, and never surfaces a non-colliding item") {
      // query id ≡ 0 (mod 100) per the querySet convention; twins at
      // Hamming 1 and 2 share 3 of 4 bands with it, the inverted payload
      // shares none (0xAAAA vs 0x5555 per word) so it can never be a
      // banded candidate however small k makes the beam
      val twoBlocksOff =
        highBlk + structured.substring(8, 16) + highBlk + structured.substring(24)
      val fillers = (300L until 320L).map(i => (i, hashChars(512, i), "en", "s1"))
      val docs = docsDf(Seq(
        (100L, structured, "en", "s1"),
        (101L, oneBlockOff, "en", "s1"),
        (102L, twoBlocksOff, "en", "s1"),
        (103L, inverted, "en", "s1")) ++ fillers)
      val got = Multimodal.mediaPhashTopK(Multimodal.mediaTable(docs), k = 5)
        .filter(org.apache.spark.sql.functions.col("q_id") === 100L)
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
      got.take(2).toSeq shouldBe Seq((1, 101L, 1L), (2, 102L, 2L))
      got.map(_._2) should not contain 103L
      // ranks are contiguous from 1
      got.map(_._1).toSeq shouldBe (1 to got.length)
    }

    it("quality gate has bite, and full-corpus pairs ∩ gated² == pairs over the gated subset (the artifact-serve argument)") {
      // corpus mixing: a too-short payload (length gate), a near-constant
      // payload (variance gate), and BIMODAL-char fillers (uniform
      // printable ASCII has byte variance ~736 < MinByteVar; two gapped
      // clusters push it past the gate, like real text's spaces do) + one
      // twin pair
      def bimodalChars(n: Int, seed: Long): String =
        (0 until n).map { p =>
          val h = (p * 2654435761L + seed * 40503L) >>> 7
          (if (h % 2 == 0) 33 + (h / 2 % 23).toInt else 104 + (h / 2 % 23).toInt).toChar
        }.mkString
      val fillers = (100L until 130L).map(i => (i, bimodalChars(300, i), "en", s"s${i % 3}"))
      val docs = docsDf(Seq(
        (1L, hashChars(40, 1), "en", "s1"),          // n < MinMediaBytes
        (2L, "m" * 200, "en", "s1"),                  // variance ~0
        (3L, structured, "en", "s1"),
        (4L, oneBlockOff, "en", "s1")) ++ fillers)
      val media = Multimodal.mediaTable(docs)
      val gated = Multimodal.mediaQualityGate(Multimodal.decodeFeatures(media))
      val gatedIds = gated.collect().map(_.getLong(0)).toSet
      gatedIds should not contain 1L
      gatedIds should not contain 2L
      gatedIds.size should be > 20
      // the media_curation_pipeline serve-from-artifact argument:
      // restricting the FULL pair table to both-endpoints-gated equals
      // recomputing pairs over only the gated media
      import org.apache.spark.sql.functions._
      val gdf = gated.select(col("media_id"))
      val fromFull = Multimodal.mediaNearDupPairs(media)
        .join(gdf.withColumnRenamed("media_id", "media_a"), Seq("media_a"), "left_semi")
        .join(gdf.withColumnRenamed("media_id", "media_b"), Seq("media_b"), "left_semi")
        .select("media_a", "media_b", "hamming")
      val fromSubset = Multimodal.mediaNearDupPairs(
        media.join(gdf, Seq("media_id"), "left_semi"))
        .select("media_a", "media_b", "hamming")
      fromFull.collect().map(_.mkString("|")).toSet shouldBe
        fromSubset.collect().map(_.mkString("|")).toSet
    }

    it("withPlantedMediaDups twins pair through the full operator at small Hamming") {
      // real-ish base docs (hash-char payloads), one divisible by 97
      val base = Seq(0L, 97L, 101L, 202L).map(i => (i, hashChars(300, i + 7), "en", "s1"))
      val planted = Multimodal.withPlantedMediaDups(docsDf(base))
      planted.count() shouldBe 6 // ids 0 and 97 gained twins
      val pairs = Multimodal.mediaNearDupPairs(Multimodal.mediaTable(planted))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs should contain(0L -> (0L + Multimodal.PlantOffset))
      pairs should contain(97L -> (97L + Multimodal.PlantOffset))
    }

    it("planted reposts land in the mirror source and surface as off-diagonal contamination rows") {
      val base = Seq(0L, 97L, 101L, 202L).map(i => (i, hashChars(300, i + 7), "en", s"src${i % 2}"))
      val planted = Multimodal.withPlantedMediaDups(docsDf(base))
      val media = Multimodal.mediaTable(planted)
      // the twins really did change source
      import org.apache.spark.sql.functions._
      media.filter(col("media_id") >= Multimodal.PlantOffset)
        .select(col("meta.source")).collect().map(_.getString(0)).toSet shouldBe
        Set(Multimodal.RepostSource)
      val mat = Multimodal.mediaSourceContaminationFrom(
          Multimodal.mediaNearDupPairs(media), media)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      // doc 0 (src0) and doc 97 (src1) were each reposted into 'mirror':
      // both cross-source cells must appear
      val cells = mat.map(t => (t._1, t._2))
      cells should contain(Multimodal.RepostSource -> "src0")
      cells should contain(Multimodal.RepostSource -> "src1")
    }
  }
}

package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.ops.Dedup

/** Unit tests for the dedup family on crafted corpora: near-identical docs
  * must pair, unrelated docs must not, and MinHash estimates must track
  * exact Jaccard.
  */
class DedupSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base = (1 to 60).map(i => s"tok$i").mkString(" ")
  private val nearDup = ((1 to 59).map(i => s"tok$i") :+ "changed").mkString(" ")
  private val unrelated = (1 to 60).map(i => s"other$i").mkString(" ")

  describe("exactDedup") {
    it("groups identical texts under the minimum doc_id") {
      val out = Dedup.exactDedup(docsDf(Seq(1L -> "a b c", 5L -> "a b c", 9L -> "x y z")))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      out shouldBe Set((1L, 2L), (9L, 1L))
    }
  }

  describe("minhashLshPairs") {
    it("pairs near-duplicates, skips unrelated docs, estimates jaccard") {
      val pairs = Dedup.minhashLshPairs(docsDf(Seq(1L -> base, 2L -> nearDup, 3L -> unrelated)))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      pairs.keySet shouldBe Set((1L, 2L))
      // exact shingle jaccard of base vs nearDup = 55/61 ≈ 0.90
      pairs((1L, 2L)) should be >= 0.5
    }
  }

  describe("lshTuningReport") {
    it("measures every usable factorization, nested along aligned-band chains") {
      val docs = docsDf(Seq(
        1L -> base, 2L -> base, // exact dup: collides under EVERY config
        3L -> nearDup, 4L -> unrelated,
        5L -> (1 to 60).map(i => s"third$i").mkString(" ")))
      val rows = Dedup.lshTuningReport(docs).collect()
        .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getDouble(3)))).toMap
      rows.keySet shouldBe Dedup.LshTuningConfigs.toSet
      rows.keys.foreach { case (b, r) => b * r shouldBe Dedup.MinhashK }
      // the exact duplicate collides everywhere
      rows.values.foreach { case (n, _) => n should be >= 1L }
      // bands of r2 rows align inside bands of r1 = m*r2 rows, so the
      // candidate sets nest: counts are monotone along both chains
      def n(b: Int, r: Int): Long = rows((b, r))._1
      n(1, 12) should be <= n(2, 6)
      n(2, 6) should be <= n(4, 3)
      n(4, 3) should be <= n(6, 2)
      n(2, 6) should be <= n(3, 4)
      n(3, 4) should be <= n(6, 2)
      // the (4, 3) row measures exactly the production banding
      n(4, 3) shouldBe Dedup.minhashLshPairs(docs).count()
    }

    it("the nesting chains hold on random corpora (seeded trials)") {
      // aligned-band nesting is a THEOREM (an agreeing r1-block contains
      // an aligned r2-block whenever r2 | r1 positions align), so it must
      // hold on any corpus, not just the crafted one
      val rng = new scala.util.Random(2024)
      for (_ <- 1 to 4) {
        val nDocs = 6 + rng.nextInt(10)
        val vocab = 1 + rng.nextInt(4) // small vocab => plenty of collisions
        val docs = docsDf((0 until nDocs).map { i =>
          (i.toLong,
            (1 to 40).map(_ => s"w${rng.nextInt(vocab * 10)}").mkString(" "))
        })
        val rows = Dedup.lshTuningReport(docs).collect()
          .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
        def n(b: Int, r: Int): Long = rows((b, r))
        n(1, 12) should be <= n(2, 6)
        n(2, 6) should be <= n(4, 3)
        n(4, 3) should be <= n(6, 2)
        n(2, 6) should be <= n(3, 4)
        n(3, 4) should be <= n(6, 2)
      }
    }
  }

  describe("sourceContamination") {
    it("folds cross-source near-dup pairs into canonical matrix cells") {
      import spark.implicits._
      val docs = Seq(
        (1L, base, "web"), (2L, nearDup, "books"), // cross-source near-dup
        (3L, base, "web"),                         // within-source copy of 1
        (4L, unrelated, "books"))
        .toDF("doc_id", "text", "source")
      val got = Dedup.sourceContamination(docs).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      // pairs: (1,2) web×books, (1,3) web×web, (2,3) books×web — canonical
      // least/greatest folds both cross-source pairs into one cell
      got(("books", "web")) shouldBe 2L
      got(("web", "web")) shouldBe 1L
      got.keySet shouldBe Set(("books", "web"), ("web", "web"))
    }
  }

  describe("minhashQualityReport") {
    it("identical docs give a zero-error, full-precision report") {
      val r = Dedup.minhashQualityReport(
        docsDf(Seq(1L -> base, 2L -> base, 3L -> unrelated))).collect()(0)
      r.getAs[Long]("n_pairs") shouldBe 1L
      r.getAs[Long]("n_true") shouldBe 1L
      r.getAs[Long]("precision_ppm") shouldBe 1000000L
      r.getAs[Double]("mae") shouldBe 0.0 // est 12/12 = exact 1.0
      r.getAs[Double]("bias") shouldBe 0.0
      r.getAs[Double]("max_abs_err") shouldBe 0.0
    }

    it("near-dup pair: |bias| <= mae <= max error, exact jaccard grounds the truth gate") {
      val r = Dedup.minhashQualityReport(
        docsDf(Seq(1L -> base, 2L -> nearDup, 3L -> unrelated))).collect()(0)
      r.getAs[Long]("n_pairs") shouldBe 1L
      r.getAs[Long]("n_true") shouldBe 1L // exact 55/61 ≈ 0.90 >= 0.3
      val mae = r.getAs[Double]("mae")
      math.abs(r.getAs[Double]("bias")) should be <= mae
      mae should be <= r.getAs[Double]("max_abs_err")
      mae should be <= 0.5 // k=12 estimator within half a unit of truth here
    }
  }

  describe("simhash") {
    it("near-identical docs land within the hamming threshold; unrelated far") {
      val fp = Dedup.simhash(docsDf(Seq(1L -> base, 2L -> nearDup, 3L -> unrelated)))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      java.lang.Long.bitCount(fp(1L) ^ fp(2L)) should be <= 3
      java.lang.Long.bitCount(fp(1L) ^ fp(3L)) should be > 3
      val pairs = Dedup.simhashPairs(docsDf(Seq(1L -> base, 2L -> nearDup, 3L -> unrelated)))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs shouldBe Set((1L, 2L))
    }
  }

  describe("hash-agnostic behavior") {
    it("the production fast hash (xxhash64) finds the same planted near-dups") {
      val pairs = Dedup.minhashLshPairs(
          docsDf(Seq(1L -> base, 2L -> nearDup, 3L -> unrelated)),
          hash = graft.functions.PortableHash.fast)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs shouldBe Set((1L, 2L))
    }
  }

  describe("incrementalDedup") {
    it("drops new docs colliding with history or with lower-id batchmates") {
      // history: the base doc (id 1) + one unrelated doc, persisted as bands
      val history = Dedup.minhashBands(
        Dedup.minhashSignatures(docsDf(Seq(1L -> base, 2L -> unrelated))))
      // new batch: near-dup of history (drop), fresh doc (keep),
      // exact dup within batch (higher id drops, lower survives)
      val fresh = (1 to 60).map(i => s"fresh$i").mkString(" ")
      val batch = docsDf(Seq(10L -> nearDup, 11L -> fresh, 12L -> fresh))
      val survivors = Dedup.incrementalDedup(batch, history)
        .collect().map(_.getLong(0)).toSet
      survivors shouldBe Set(11L)
    }

    it("keeps everything when the batch is all-new") {
      val history = Dedup.minhashBands(
        Dedup.minhashSignatures(docsDf(Seq(1L -> base))))
      val batch = docsDf(Seq(
        20L -> (1 to 60).map(i => s"aa$i").mkString(" "),
        21L -> (1 to 60).map(i => s"bb$i").mkString(" ")))
      Dedup.incrementalDedup(batch, history)
        .collect().map(_.getLong(0)).toSet shouldBe Set(20L, 21L)
    }

    it("probes a bucketBy-persisted history table without exchanging history") {
      import org.apache.spark.sql.functions.col
      // the 100 TB ingest layout: history bands live in a table bucketed by
      // the probe key, so each arriving batch shuffles only ITSELF — the
      // (huge) history side is read pre-partitioned, no exchange
      val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.01")
      val hist = docs.filter(col("doc_id") < 250)
      val batch = docs.filter(col("doc_id") >= 250)
      val histBands = Dedup.minhashBands(Dedup.minhashSignatures(hist))
      spark.sql("DROP TABLE IF EXISTS graft_dedup_hist")
      histBands.write.bucketBy(8, "band", "bh").sortBy("band", "bh")
        .saveAsTable("graft_dedup_hist")
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val newBands = Dedup.minhashBands(Dedup.minhashSignatures(batch))
        // count via the rendered tree: the AQE wrapper hides children from
        // plan.collect but prints the full inner plan
        def probeExchanges(history: org.apache.spark.sql.DataFrame): Int =
          "Exchange hashpartitioning\\(band".r.findAllIn(
            newBands.join(history, Seq("band", "bh"), "left_semi")
              .queryExecution.executedPlan.toString).size
        // bucketed history: only the new batch shuffles; inline history
        // (no bucketing) needs an exchange on BOTH sides
        probeExchanges(spark.table("graft_dedup_hist")) shouldBe 1
        probeExchanges(histBands) shouldBe 2
        // and the full incremental path over the bucketed table agrees with
        // the inline-history path
        val viaTable = Dedup.incrementalDedup(batch, spark.table("graft_dedup_hist"))
          .collect().map(_.getLong(0)).toSet
        val inline = Dedup.incrementalDedup(batch, histBands)
          .collect().map(_.getLong(0)).toSet
        viaTable shouldBe inline
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  describe("nearDupComponents") {
    it("collapses transitive chains to the component minimum") {
      import spark.implicits._
      // chain 1~2~3 plus island 7~9: pairwise keep-lowest would keep 3
      // (never a doc_b of a *surviving* doc) — CC reps must say otherwise
      val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
      val reps = Dedup.nearDupComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      reps shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L)
    }

    it("propagates one hop per iteration") {
      import spark.implicits._
      val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("doc_a", "doc_b")
      // node 5 is 4 hops from the minimum: 3 iterations leave it unconverged...
      val r3 = Dedup.nearDupComponents(chain, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      r3(5L) shouldBe 2L
      // ...4 reach it (bounded-iteration contract, not a convergence claim)
      val r4 = Dedup.nearDupComponents(chain, iters = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      r4.values.toSet shouldBe Set(1L)
    }
  }

  describe("nearDupComponentsExact") {
    it("converges past the bounded variant's horizon on a deep chain") {
      import spark.implicits._
      // diameter 6: the 3-iteration bounded variant leaves the tail
      // unconverged; the fixpoint loop must not
      val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
        .toDF("doc_a", "doc_b")
      val bounded = Dedup.nearDupComponents(chain, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      bounded.values.toSet should not be Set(1L)
      val exact = Dedup.nearDupComponentsExact(chain)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      exact.values.toSet shouldBe Set(1L)
      exact.keySet shouldBe (1L to 7L).toSet
    }

    it("keeps disjoint components separate and throws past the iteration backstop") {
      import spark.implicits._
      val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
      val exact = Dedup.nearDupComponentsExact(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      exact shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L)
      val deep = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("doc_a", "doc_b")
      an[IllegalArgumentException] should be thrownBy
        Dedup.nearDupComponentsExact(deep, maxIters = 1)
    }

    it("pointer jumping converges a 64-node chain within a logarithmic round budget") {
      import spark.implicits._
      val chain = (1L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      // plain per-hop propagation needs ~63 rounds; path halving must land
      // well inside 16
      val exact = Dedup.nearDupComponentsExact(chain, maxIters = 16)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      exact.values.toSet shouldBe Set(1L)
      exact.keySet shouldBe (1L to 64L).toSet
    }
  }

  describe("nearDupDropSet") {
    it("equals iters=2 propagation survivorship, including the >2-hop over-keep") {
      import spark.implicits._
      // chain 3—9—7—1 (ADVICE r3's shape: 3's nearest lower label is 3 hops
      // away, so the 2-hop bound over-keeps 3), a star (5,9),(7,9)-like
      // triangle, an isolated pair, and a within-2-hops chain
      val graphs = Seq(
        Seq((3L, 9L), (7L, 9L), (1L, 7L)),             // chain: 2-hop keeps {1, 3}
        Seq((5L, 9L), (7L, 9L)),                       // star through max id
        Seq((11L, 12L)),                               // isolated pair
        Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))   // path graph
      graphs.foreach { g =>
        val pairs = g.toDF("doc_a", "doc_b")
        val viaChain = Dedup.nearDupComponents(pairs, iters = 2)
          .filter(org.apache.spark.sql.functions.col("rep") =!=
            org.apache.spark.sql.functions.col("doc_id"))
          .collect().map(_.getLong(0)).toSet
        val direct = Dedup.nearDupDropSet(pairs).collect().map(_.getLong(0)).toSet
        withClue(s"graph $g: ") { direct shouldBe viaChain }
      }
      // the explicit over-keep: 3 survives the 2-hop bound
      val drops = Dedup.nearDupDropSet(
        Seq((3L, 9L), (7L, 9L), (1L, 7L)).toDF("doc_a", "doc_b"))
        .collect().map(_.getLong(0)).toSet
      drops shouldBe Set(7L, 9L) // 1 and 3 both kept
    }
  }

  describe("fingerprintJaccardPairs") {
    it("reports high jaccard for near-dups only") {
      val pairs = Dedup.fingerprintJaccardPairs(
          docsDf(Seq(1L -> base, 2L -> nearDup, 3L -> unrelated)))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      pairs.keySet shouldBe Set((1L, 2L))
      pairs((1L, 2L)) should be >= 0.5
    }
  }

  describe("fingerprintContainmentPairs") {
    it("flags a doc contained in a larger host that symmetric Jaccard misses") {
      import spark.implicits._
      // host = 120 tokens; quote = its first 30 tokens verbatim
      val host = (1 to 120).map(i => s"w$i").mkString(" ")
      val quote = (1 to 30).map(i => s"w$i").mkString(" ")
      val unrelated = (1 to 120).map(i => s"z$i").mkString(" ")
      val docs = Seq((1L, host), (2L, quote), (3L, unrelated)).toDF("doc_id", "text")
      val cont = graft.ops.Dedup.fingerprintContainmentPairs(docs, minContainment = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      cont.keySet shouldBe Set((2L, 1L)) // quote ⊂ host, never the reverse
      cont((2L, 1L)) shouldBe 1.0
      // the same pair is invisible to symmetric Jaccard at its threshold:
      // J = |A|/|B| ≈ 0.25 for a quarter-length quote
      val jac = graft.ops.Dedup.fingerprintJaccardPairs(docs, minJaccard = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      jac should not contain ((1L, 2L))
    }
  }

  describe("dedupGranularityReport") {
    it("community granularity never keeps fewer docs than component") {
      val lowQ = ((1 to 58).map(i => s"b$i") ++ Seq("b1", "b1")).mkString(" ")
      val docs = docsDf(Seq(
        1L -> base, 2L -> ((1 to 59).map(i => s"tok$i") :+ "tok1").mkString(" "),
        4L -> lowQ, 5L -> ((1 to 58).map(i => s"b$i") ++ Seq("b1", "b59")).mkString(" "),
        9L -> unrelated))
      val r = graft.ops.Dedup.dedupGranularityReport(docs).collect()
        .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
      // refinement bound: communities partition no coarser than components
      r("community")._1 should be >= r("component")._1
      r("community")._2 should be >= r("component")._2
      // isolated PAIRS 2-cycle under synchronous LPA (labels swap each
      // round), so both 2-doc clusters degenerate to singleton
      // communities here — the documented caveat: community granularity
      // is the uppper bound, components the lower
      r("component")._1 shouldBe 3L // one per pair + the singleton
      r("community")._1 shouldBe 5L // oscillating pairs keep both docs
    }
  }

  describe("bestQualitySurvivorsCommunities") {
    it("keeps one doc per clique where a hub-weld collapses the component to one survivor") {
      // two disjoint-vocab near-dup cliques {1,2,3} and {6,7,8}; doc 5 is a
      // template hub (concatenation of both vocabularies) that LSH-pairs
      // into BOTH cliques, welding them into one connected component
      val aTok = (1 to 60).map(i => s"qa$i")
      val bTok = (1 to 60).map(i => s"qb$i")
      def tweak(ts: Seq[String], i: Int) = ts.updated(i, ts(i) + "x")
      val docs = docsDf(Seq(
        1L -> aTok.mkString(" "),
        2L -> tweak(aTok, 5).mkString(" "),
        3L -> tweak(aTok, 20).mkString(" "),
        // repeated filler depresses the hub's TTR so it can't win the
        // quality window in whichever community it lands in (the filler
        // adds only a couple of shingles, so the LSH banding is unchanged)
        5L -> (aTok ++ bTok ++ Seq.fill(80)("qa1")).mkString(" "),
        6L -> bTok.mkString(" "),
        7L -> tweak(bTok, 5).mkString(" "),
        8L -> tweak(bTok, 20).mkString(" "),
        9L -> unrelated))
      // precondition: the hub actually welds — every paired doc shares ONE
      // exact component, so component-granular survivorship keeps a single
      // doc for what are really two distinct groups (+ the singleton 9)
      val pairs = Dedup.minhashLshPairs(docs)
      val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      edges.exists { case (a, b) => Set(a, b).contains(5L) && Set(1L, 2L, 3L).intersect(Set(a, b)).nonEmpty } shouldBe true
      edges.exists { case (a, b) => Set(a, b).contains(5L) && Set(6L, 7L, 8L).intersect(Set(a, b)).nonEmpty } shouldBe true
      val compSurv = Dedup.bestQualitySurvivors(docs)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      compSurv.intersect(Set(1L, 2L, 3L, 5L, 6L, 7L, 8L)).size shouldBe 1
      // community granularity un-welds: at least one survivor per clique
      val commSurv = Dedup.bestQualitySurvivorsCommunities(docs)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      commSurv.intersect(Set(1L, 2L, 3L)) should not be empty
      commSurv.intersect(Set(6L, 7L, 8L)) should not be empty
      commSurv should contain(9L) // singleton always survives
      // and never keeps fewer than the component policy
      commSurv.size should be >= compSurv.size
    }
  }

  describe("chunk-level near-dup (composition)") {
    it("finds a copied passage that whole-document similarity dilutes") {
      import org.apache.spark.sql.functions._
      // a 32-token passage copied verbatim from doc 1 into doc 2, each
      // doc padded with its own unrelated tail — document-level Jaccard
      // sits far below the LSH threshold, but the chunk tier pairs the
      // aligned copies
      val passage = (1 to 32).map(i => s"pp$i")
      val docs = docsDf(Seq(
        1L -> (passage ++ (1 to 28).map(i => s"qa$i")).mkString(" "),
        2L -> (passage ++ (1 to 40).map(i => s"zb$i")).mkString(" "),
        3L -> (1 to 60).map(i => s"uu$i").mkString(" ")))
      val chunks = graft.ops.TextOps.chunkDocuments(docs)
        .select((col("doc_id") * 100000L + col("chunk_idx")).as("doc_id"),
          col("chunk_text").as("text"))
      val cross = Dedup.minhashLshPairs(chunks)
        .filter(expr("doc_a DIV 100000") =!= expr("doc_b DIV 100000"))
        .collect().map(r => (r.getLong(0) / 100000L, r.getLong(1) / 100000L)).toSet
      cross shouldBe Set((1L, 2L)) // the copied passage, nothing else
    }
  }

  describe("modularityGatedReport") {
    it("trusts the clique community, demotes the 2-cycle pair to component granularity") {
      // clique {1,2,3}: a genuine duplicate group — one community with
      // positive q_contrib → trusted, keeps 1 best-quality doc.
      // pair {4,5}: the planted NOISE partition — synchronous LPA
      // oscillates an isolated pair into two singleton communities, each
      // with s_in = 0 hence q_contrib < 0 → untrusted, both docs fall
      // back to their shared component and keep 1 (pure community
      // granularity would keep BOTH).
      val aTok = (1 to 60).map(i => s"qa$i")
      def tweak(ts: Seq[String], i: Int) = ts.updated(i, ts(i) + "x")
      val docs = docsDf(Seq(
        1L -> aTok.mkString(" "),
        2L -> tweak(aTok, 5).mkString(" "),
        3L -> tweak(aTok, 20).mkString(" "),
        4L -> base, 5L -> nearDup,
        9L -> unrelated))
      val r = Dedup.modularityGatedReport(docs).collect()
        .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
      r("community") shouldBe ((1L, 3L)) // clique: one trusted group of 3
      r("component") shouldBe ((1L, 2L)) // pair: one fallback group of 2
      r("singleton") shouldBe ((1L, 1L))
      // the gate repairs the granularity band's upper bound: 3 keepers
      // total (1 clique + 1 pair + 1 singleton) vs community granularity
      // keeping both oscillating pair docs (4 keepers)
      val commKept = Dedup.bestQualitySurvivorsCommunities(docs).count()
      (r("community")._1 + r("component")._1 + r("singleton")._1) shouldBe 3L
      commKept shouldBe 4L
      // the consumable APPLY relation matches the report: one survivor
      // from the clique, one from the demoted pair, plus the singleton
      val surv = Dedup.modularityGatedSurvivors(docs)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      surv.size shouldBe 3
      surv.intersect(Set(1L, 2L, 3L)).size shouldBe 1
      surv.intersect(Set(4L, 5L)).size shouldBe 1
      surv should contain(9L)
    }
  }

  describe("dedupPolicyReport") {
    it("keeps equal counts but best_quality retains >= the quality mass") {
      // cluster {1, 2}: doc 2 repeats a token (lower TTR → lower quality),
      // so min_id keeps the BETTER doc 1 here; flip the ids in cluster
      // {4, 5} so min_id keeps the WORSE doc and the policies diverge
      val lowQ = ((1 to 58).map(i => s"b$i") ++ Seq("b1", "b1")).mkString(" ")
      val docs = docsDf(Seq(
        1L -> base, 2L -> ((1 to 59).map(i => s"tok$i") :+ "tok1").mkString(" "),
        4L -> lowQ, 5L -> ((1 to 58).map(i => s"b$i") ++ Seq("b1", "b59")).mkString(" "),
        9L -> unrelated))
      val r = graft.ops.Dedup.dedupPolicyReport(docs).collect()
        .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
      r("min_id")._1 shouldBe r("best_quality")._1 // same survivor count
      r("best_quality")._2 should be >= r("min_id")._2
      r("best_quality")._2 should be > r("min_id")._2 // cluster {4,5} diverges
    }
  }
}

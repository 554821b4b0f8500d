package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.ops.Joins

class JoinsSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  describe("saltedEquiJoin") {
    it("produces exactly the rows of a plain inner join under heavy skew") {
      import spark.implicits._
      // 90% of left rows share one hot key
      val left = (1 to 2000).map(i => (i.toLong, if (i % 10 == 0) i.toLong % 7 else 999L))
        .toDF("row_id", "k")
      val right = Seq((999L, "hot"), (0L, "a"), (1L, "b"), (2L, "c")).toDF("rk", "v")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("row_id", "k", "rk", "v").as[(Long, Long, Long, String)].collect().toSet
      val plain = canon(left.join(right, left("k") === right("rk")))
      val salted = canon(graft.ops.Joins.saltedEquiJoin(left, right, "k", "rk", "row_id", factor = 8))
      salted shouldBe plain
      plain.size should be > 1000 // the hot key actually dominated
    }
  }

  describe("binnedRangeJoin") {
    it("matches the naive interval join and plans as a hash join, not a nested loop") {
      import spark.implicits._
      val rng = new scala.util.Random(7)
      val points = (1 to 500).map(i => (i.toLong % 5, rng.nextInt(100000).toLong))
        .toDF("k", "t")
      val iv = (1 to 50).map { i =>
        val s = rng.nextInt(95000).toLong
        (i.toLong, i.toLong % 5, s, s + rng.nextInt(5000)) // span ≤ bin
      }.toDF("iv_id", "ik", "s", "e")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("iv_id", "t").as[(Long, Long)].collect().toSet
      val naive = canon(points.join(iv,
        $"k" === $"ik" && $"t" >= $"s" && $"t" <= $"e"))
      val binned = Joins.binnedRangeJoin(points, iv, "k", "ik", "t", "s", "e", binMillis = 5000L)
      canon(binned) shouldBe naive
      naive.size should be > 50 // non-trivial overlap actually exercised
      // equi-join on (bin, key): a hash join, never the quadratic NLJ the
      // raw BETWEEN predicate would plan
      binned.queryExecution.executedPlan.toString should not include "NestedLoop"
    }
  }

  describe("binnedRangeJoin properties") {
    it("equals the naive interval join for random intervals and any bin size") {
      import spark.implicits._
      val rng = new scala.util.Random(11)
      for (bin <- Seq(100L, 1000L, 7777L, 100000L)) {
        val points = List.fill(300)((rng.nextInt(4).toLong, rng.nextInt(50000).toLong))
          .toDF("k", "t")
        val iv = List.fill(40) {
          val s = rng.nextInt(50000).toLong
          // spans from empty to bin-straddling, including span > bin
          (rng.nextLong(), rng.nextInt(4).toLong, s, s + rng.nextInt(2 * bin.toInt + 1))
        }.toDF("iv_id", "ik", "s", "e")
        def canon(df: org.apache.spark.sql.DataFrame) =
          df.select("iv_id", "t").as[(Long, Long)].collect()
            .groupBy(identity).view.mapValues(_.length).toMap
        val naive = canon(points.join(iv, $"k" === $"ik" && $"t" >= $"s" && $"t" <= $"e"))
        val binned = canon(Joins.binnedRangeJoin(points, iv, "k", "ik", "t", "s", "e", bin))
        withClue(s"bin=$bin: ") { binned shouldBe naive }
      }
    }
  }

  describe("bucketed co-located join") {
    it("joins two bucketed tables without a shuffle exchange") {
      import spark.implicits._
      val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "av")
      val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "bv")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
      a.write.bucketBy(4, "k").sortBy("k").saveAsTable("graft_bucket_a")
      b.write.bucketBy(4, "k").sortBy("k").saveAsTable("graft_bucket_b")
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = spark.table("graft_bucket_a")
          .join(spark.table("graft_bucket_b"), "k")
        joined.count() shouldBe 1000
        val plan = joined.queryExecution.executedPlan.toString
        plan should include("SortMergeJoin")
        // bucketing co-locates both sides: no shuffle exchange in the plan
        plan should not include "ShuffleExchange"
        plan should not include "Exchange hashpartitioning"
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

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

  describe("asofJoinMerge (native merge operator)") {
    import spark.implicits._

    def semanticsFixture = {
      val left = Seq(
        (1L, 10L, ts("2024-01-01 10:00:00")),
        (2L, 10L, ts("2024-01-01 08:00:00")),
        (3L, 10L, ts("2024-01-01 07:00:00")),
        (4L, 20L, ts("2024-01-01 10:00:00")),
        (5L, 30L, ts("2024-01-01 10:00:00"))
      ).toDF("event_id", "key", "ts")
      val right = Seq(
        (10L, 101L, ts("2024-01-01 08:00:00")),
        (10L, 102L, ts("2024-01-01 09:00:00")),
        (10L, 103L, ts("2024-01-01 11:00:00")),
        (20L, 201L, ts("2024-01-01 09:30:00")),
        (20L, 202L, ts("2024-01-01 09:30:00"))
      ).toDF("rkey", "rid", "rts")
      (left, right)
    }

    it("matches the composed implementation's semantics on the tie/drop fixture") {
      val (left, right) = semanticsFixture
      val out = Joins.asofJoinMerge(left, right,
          leftKey = "key", rightKey = "rkey", leftTs = "ts", rightTs = "rts",
          rightVals = Seq("rid"), rightTieBreak = "rid")
        .select("event_id", "rid").as[(Long, Long)].collect().toMap
      out shouldBe Map(1L -> 102L, 2L -> 101L, 4L -> 202L)
    }

    it("outer mode keeps unmatched left rows with a null right side") {
      import org.apache.spark.sql.Row
      val (left, right) = semanticsFixture
      val rows = Joins.asofJoinMerge(left, right,
          "key", "rkey", "ts", "rts", Seq("rid"), "rid", outer = true)
        .select("event_id", "rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      rows shouldBe Map(
        1L -> Some(102L), 2L -> Some(101L), 3L -> None, 4L -> Some(202L), 5L -> None)
    }

    it("agrees with the composed implementation on random adversarial data") {
      val rng = new scala.util.Random(7)
      // many collisions: few keys, coarse timestamps (ties guaranteed),
      // plus keys that exist on only one side
      val left = (1 to 500).map { i =>
        (i.toLong, rng.nextInt(12).toLong, ts(f"2024-01-01 ${rng.nextInt(24)}%02d:00:00"))
      }.toDF("event_id", "key", "ts")
      val right = (1 to 300).map { i =>
        (rng.nextInt(15).toLong, 1000L + i, ts(f"2024-01-01 ${rng.nextInt(24)}%02d:00:00"))
      }.toDF("rkey", "rid", "rts")
      def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, String,
          String, String, String, Seq[String], String) => org.apache.spark.sql.DataFrame) =
        f(left, right, "key", "rkey", "ts", "rts", Seq("rid", "rts"), "rid")
          .select("event_id", "rid").as[(Long, Long)].collect().toSet
      run(Joins.asofJoinMerge(_, _, _, _, _, _, _, _)) shouldBe run(Joins.asofJoin)
    }

    it("plans one AsofJoinExec with exchanges+sorts on both sides") {
      val (left, right) = semanticsFixture
      val out = Joins.asofJoinMerge(left, right,
        "key", "rkey", "ts", "rts", Seq("rid"), "rid")
      val plan = out.queryExecution.executedPlan.toString
      plan should include("AsofJoin")
      // EnsureRequirements satisfied the declared distribution/ordering
      plan should include("Exchange hashpartitioning")
      plan should include("Sort")
    }

    it("prunes unused left columns through the join down to the file scan") {
      // wide left table on disk: 5 columns, only 2 survive the final select
      val dir = java.nio.file.Files.createTempDirectory("graft-asof-prune").toString
      import spark.implicits._
      (1 to 100).map(i => (i.toLong, i.toLong % 5, ts(f"2024-01-01 ${i % 24}%02d:00:00"),
          s"junk$i", i * 3.14))
        .toDF("event_id", "key", "ts", "wide1", "wide2")
        .write.mode("overwrite").parquet(dir)
      val left = spark.read.parquet(dir)
      val right = Seq((0L, 100L, ts("2024-01-01 00:00:00")))
        .toDF("rkey", "rid", "rts")
      val out = Joins.asofJoinMerge(left, right,
          "key", "rkey", "ts", "rts", Seq("rid"), "rid")
        .select("event_id", "rid")
      out.collect() // force execution
      val scan = out.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).find(_.contains(dir.split("/").last)).get
      // the wide junk columns never leave the parquet reader
      scan should include("ReadSchema: struct<event_id:bigint,key:bigint,ts:timestamp>")
    }

    it("registers array_dot as a SQL function through the same install") {
      graft.plans.GraftExtensions.install(spark)
      val got = spark.sql(
        "SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect()(0).getDouble(0)
      got shouldBe 11.0
    }

    it("rejects mismatched key or timestamp types instead of merging raw values") {
      val (left, right) = semanticsFixture
      // int key vs the right's bigint key: raw internal comparison would be
      // silently wrong, so construction must throw
      val badKey = left.withColumn("key", $"key".cast("int"))
      an[IllegalArgumentException] should be thrownBy
        Joins.asofJoinMerge(badKey, right, "key", "rkey", "ts", "rts", Seq("rid"), "rid")
      // date ts vs the right's timestamp ts: days-int vs micros-long
      val badTs = left.withColumn("ts", $"ts".cast("date"))
      an[IllegalArgumentException] should be thrownBy
        Joins.asofJoinMerge(badTs, right, "key", "rkey", "ts", "rts", Seq("rid"), "rid")
      // an explicit caller-side cast back to the right's type restores it
      Joins.asofJoinMerge(
        badKey.withColumn("key", $"key".cast("bigint")), right,
        "key", "rkey", "ts", "rts", Seq("rid"), "rid").count() should be > 0L
    }

    it("pushes left-only filters below the join via the optimizer rule") {
      val (left, right) = semanticsFixture
      val out = Joins.asofJoinMerge(left, right,
          "key", "rkey", "ts", "rts", Seq("rid"), "rid")
        .filter($"event_id" > 1L)
      out.select("event_id", "rid").as[(Long, Long)].collect().toMap shouldBe
        Map(2L -> 101L, 4L -> 202L)
      val optimized = out.queryExecution.optimizedPlan
      // the Filter must sit BELOW AsofJoinPlan after optimization
      val asof = optimized.collectFirst { case a: graft.plans.AsofJoinPlan => a }
      asof.isDefined shouldBe true
      // no Filter remains ABOVE the join node...
      optimized.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.exists(_.isInstanceOf[graft.plans.AsofJoinPlan]) => f
      } shouldBe None
      // ...it moved inside the join's left subtree
      asof.get.left.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
      }.isDefined shouldBe true
    }
  }

  describe("runtime bloom-filter join pruning") {
    it("injects a bloom filter on the fact side of a selective dim join") {
      import spark.implicits._
      val confs = Seq(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
        // the default demands a >=10GB probe-side scan before it bothers —
        // zero it so the toy-sized fact qualifies
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
        "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
        // force a shuffle join so the runtime filter has a scan to protect
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
        (1L to 20000L).map(i => (i, i % 512, s"p$i"))
          .toDF("id", "key", "payload").write.parquet(s"$dir/fact")
        (0L until 512L).map(i => (i, s"d$i"))
          .toDF("key", "attr").write.parquet(s"$dir/dim")
        val fact = spark.read.parquet(s"$dir/fact")
        val dim = spark.read.parquet(s"$dir/dim").filter($"attr" === "d7")
        val joined = fact.join(dim, Seq("key"))
        joined.count() shouldBe (20000L / 512L + 1) // keys ≡ 7 (mod 512)
        // at 100 TB this is the optimization that spares the fact scan
        // from shuffling rows a selective dim filter will discard anyway:
        // the optimizer plants a BloomFilter agg on the dim side and a
        // might_contain probe above the fact scan
        val plan = joined.queryExecution.optimizedPlan.toString
        assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilter"),
          s"no runtime bloom filter in plan:\n${plan.take(2000)}")
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}

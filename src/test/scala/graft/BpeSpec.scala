package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.functions.{BpeCodec, BpeTable, BpeTokenCount}
import graft.ops.TextOps

/** Greedy-merge BPE: the kernel's scan order must equal the SQL `replace`
  * semantics the oracle replays (left-to-right, non-overlapping, merges in
  * training order), and training must be deterministic down to the
  * (count DESC, parenthesized-pair ASC) tie-break.
  */
class BpeSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  describe("BpeCodec.applyMerge") {
    it("merges left-to-right non-overlapping (the SQL replace scan order)") {
      BpeCodec.applyMerge(Array("a", "a", "a"), "a", "a").toSeq shouldBe Seq("aa", "a")
      BpeCodec.applyMerge(Array("a", "b", "a", "b"), "a", "b").toSeq shouldBe Seq("ab", "ab")
      BpeCodec.applyMerge(Array("x", "a", "b", "c"), "a", "b").toSeq shouldBe Seq("x", "ab", "c")
    }
    it("matches symbols exactly, never substrings") {
      // pair (a, b) must not fire when the second symbol is 'bc'
      BpeCodec.applyMerge(Array("a", "bc"), "a", "b").toSeq shouldBe Seq("a", "bc")
    }
    it("a merged symbol does not re-match the same rule in the same pass") {
      // (a, ab): [a, ab] merges to [aab]; the result cannot chain onto a
      // following 'b' within this pass
      BpeCodec.applyMerge(Array("a", "ab", "b"), "a", "ab").toSeq shouldBe Seq("aab", "b")
    }
  }

  describe("BpeCodec token counting") {
    val table = new BpeTable(Array(("a", "b"), ("ab", "c")))
    it("encodes a word through the merge chain in order") {
      BpeCodec.wordTokenCount("abc", table) shouldBe 1 // a b c -> ab c -> abc
      BpeCodec.wordTokenCount("abab", table) shouldBe 2 // ab ab
      BpeCodec.wordTokenCount("xyz", table) shouldBe 3 // untouched
    }
    it("pre-tokenizes as lower-cased ASCII letter runs") {
      import org.apache.spark.unsafe.types.UTF8String
      // 'ABC' lowers to 'abc' (1 token); digits/punct split words
      BpeCodec.countTokens(UTF8String.fromString("ABC xyz-ab12ab!"), table) shouldBe
        (1 + 3 + 1 + 1)
      BpeCodec.countTokens(UTF8String.fromString(""), table) shouldBe 0
      BpeCodec.countTokens(UTF8String.fromString("123 !?"), table) shouldBe 0
      BpeCodec.countWords(UTF8String.fromString("ABC xyz-ab12ab!")) shouldBe 4
    }
  }

  describe("TextOps.bpeTrainMerges") {
    it("learns the frequency-argmax merge and stops when no pairs remain") {
      // only word: 'ab' x3 -> one merge (a,b), then every word is a single
      // symbol and training exhausts despite numMerges = 5
      TextOps.bpeTrainMerges(docs("ab ab", "ab"), numMerges = 5) shouldBe Seq(("a", "b"))
    }
    it("breaks count ties on the lexicographically smaller wrapped pair") {
      // (c,d) and (a,b) both count 1; '(a)(b)' < '(c)(d)'
      TextOps.bpeTrainMerges(docs("cd ab"), numMerges = 1) shouldBe Seq(("a", "b"))
    }
    it("weights pair counts by word frequency") {
      // 'zz' x3 outweighs the unique word's pairs
      TextOps.bpeTrainMerges(docs("zz zz zz qrs"), numMerges = 1) shouldBe Seq(("z", "z"))
    }
    it("the vocab cap is a no-op on the test corpus (hash-stability of the oracle)") {
      // BpeMaxVocab (64k) far exceeds the synthetic corpus's distinct-word
      // count at every SF, so the default-capped training must equal the
      // uncapped run bit-for-bit — the committed oracle hashes depend on it
      val corpus = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")
      TextOps.bpeTrainMerges(corpus) shouldBe
        TextOps.bpeTrainMerges(corpus, maxVocab = Int.MaxValue)
    }
    it("the vocab cap is load-bearing on a planted long-tail corpus") {
      // head word 'ab' (freq 5) vs a 10-word singleton tail each carrying
      // one (z,z) pair: uncapped, the tail's 10 occurrences win the argmax;
      // capped to the top-1 word by (freq DESC, word ASC) only 'ab'
      // trains and (a,b) wins — the cap provably drops the junk tail
      val corpus = docs("ab ab ab ab ab",
        "zza zzb zzc zzd zze zzf zzg zzh zzi zzj")
      TextOps.bpeTrainMerges(corpus, numMerges = 1,
        maxVocab = Int.MaxValue).head shouldBe ("z", "z")
      TextOps.bpeTrainMerges(corpus, numMerges = 1,
        maxVocab = 1) shouldBe Seq(("a", "b"))
    }
    it("replays the classic low/lower/newest corpus deterministically") {
      val corpus = docs("low low low low low lower lower newest newest",
        "newest newest newest newest")
      val merges = TextOps.bpeTrainMerges(corpus, numMerges = 4)
      // hand-derived: (w,e)=8 wins round 1; (l,o)=7 round 2; then two
      // 6-count ties resolve to '(e)(we)' and '(ewe)(s)' by the wrapped
      // lexicographic tie-break
      merges shouldBe Seq(("w", "e"), ("l", "o"), ("e", "we"), ("ewe", "s"))
    }
  }

  describe("bpeTokenStats (codegen path)") {
    it("agrees with the interpreted kernel and hand counts") {
      import org.apache.spark.unsafe.types.UTF8String
      val d = docs("ab ab xyz", "", "ABc!")
      val merges = TextOps.bpeTrainMerges(d)
      val table = new BpeTable(merges.toArray)
      val rows = TextOps.bpeTokenStats(d).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val texts = Map(0L -> "ab ab xyz", 1L -> "", 2L -> "ABc!")
      texts.foreach { case (id, t) =>
        rows(id)._2 shouldBe BpeCodec.countTokens(UTF8String.fromString(t), table)
        rows(id)._1 shouldBe BpeCodec.countWords(UTF8String.fromString(t))
      }
      // empty doc: zero words, zero tokens, NULL ratio
      rows(1L) shouldBe (0L, 0L)
      TextOps.bpeTokenStats(d).filter(col("doc_id") === 1L)
        .select(col("tokens_per_word")).collect()(0).isNullAt(0) shouldBe true
    }
  }
}

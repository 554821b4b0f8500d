package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.functions.{PqBook, PqCodec, PqEncodeCodes, PqReconstruct}
import graft.ops.VectorOps

/** The PQ loop kernel must be bit-identical to the Column formulation it
  * replaced (round₆ cosine, ·10⁶ integer packing, lowest-cell tie-break,
  * zero-padded Lloyd gaps) — the DuckDB oracle replays that exact math.
  */
class PqCodecSpec extends AnyFunSpec with Matchers with SparkSessionTestWrapper {

  describe("PqCodec.roundAt") {
    it("matches Spark's round(double, s) on half-way and noisy values") {
      import spark.implicits._
      val vals = Seq(0.1234565, 0.1234575, -0.1234565, 0.9999995, -0.9999995,
        1.0000005e-7, 0.5e-6, -0.5e-6, 0.33333333333, 1.0, -1.0, 0.0)
      val sparkRounded = vals.toDF("x")
        .select(round(col("x"), 6).as("r6"), round(col("x") * 1000000.0, 0).as("r0"))
        .collect()
      vals.zip(sparkRounded).foreach { case (x, row) =>
        PqCodec.roundAt(x, 6) shouldBe row.getDouble(0)
        PqCodec.roundAt(x * 1000000.0, 0) shouldBe row.getDouble(1)
      }
    }
  }

  describe("PqCodec.roundAt property (seeded trials — house idiom, no scalacheck bridge)") {
    it("is bit-identical to Spark's round over 20k adversarial doubles") {
      import spark.implicits._
      val rng = new scala.util.Random(1234)
      // mix magnitudes with values engineered to sit near .5e-6 boundaries
      val vals = List.fill(20000) {
        rng.nextInt(4) match {
          case 0 => (rng.nextDouble() - 0.5) * 2.0 // cosine range
          case 1 => (rng.nextInt(4000000) - 2000000 + 0.5) / 1000000.0 * (1 + rng.nextDouble() * 1e-12)
          case 2 => (rng.nextDouble() - 0.5) * 2e-6
          case _ => rng.nextGaussian() * math.pow(10, rng.nextInt(6) - 3)
        }
      }
      val sparkSide = vals.toDF("x")
        .select(round(col("x"), 6).as("r6"),
          round(round(col("x"), 6) * 1000000.0, 0).as("packed"))
        .collect()
      vals.zip(sparkSide).foreach { case (x, row) =>
        val r6 = PqCodec.roundAt(x, 6)
        withClue(s"x=$x: ") {
          java.lang.Double.doubleToLongBits(r6) shouldBe
            java.lang.Double.doubleToLongBits(row.getDouble(0))
          java.lang.Double.doubleToLongBits(PqCodec.roundAt(r6 * 1000000.0, 0)) shouldBe
            java.lang.Double.doubleToLongBits(row.getDouble(1))
        }
      }
    }
  }

  describe("ArraySubtract") {
    it("subtracts element-wise over the min length, with float→double casts") {
      import spark.implicits._
      import graft.functions.ArraySubtract.sub
      val df = Seq((Seq(5.0f, 3.0f, 1.0f), Seq(1.0, 2.0))).toDF("a", "b")
      df.select(sub(col("a"), col("b")).as("d"))
        .collect()(0).getSeq[Double](0) shouldBe Seq(4.0, 1.0)
      // interpreted eval agrees with the codegen'd path
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      val e = graft.functions.ArraySubtract(
        Literal.create(Seq(5.0, 3.0), ArrayType(DoubleType)),
        Literal.create(Seq(1.0, 2.0), ArrayType(DoubleType)))
      e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray().toSeq shouldBe Seq(4.0, 1.0)
    }
  }

  describe("PqEncodeCodes / PqReconstruct") {
    // 2 subspaces × 2 cells over dim 4; cell ids {0, 2} in subspace 1
    // exercise the sparse (Lloyd-dropout) id space.
    val book = PqBook(Seq(
      0 -> Array(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0)),
      1 -> Array(0 -> Seq(1.0, 1.0), 2 -> Seq(-1.0, 1.0))), subDim = 2)

    it("picks the argmax-cosine cell per subspace") {
      import spark.implicits._
      val df = Seq((1L, Seq(0.9f, 0.1f, -0.5f, 0.5f))).toDF("vec_id", "embedding")
      val codes = df.select(
        PqEncodeCodes.encode(col("embedding"), book).as("c"))
        .collect()(0).getSeq[Int](0)
      codes shouldBe Seq(0, 2) // near (1,0); near (-1,1)
    }

    it("breaks cosine ties on the LOWEST cell id (the packed-long order)") {
      import spark.implicits._
      // equidistant from both subspace-0 codewords: cos = cos
      val df = Seq((1L, Seq(1.0f, 1.0f, 1.0f, 1.0f))).toDF("vec_id", "embedding")
      val codes = df.select(
        PqEncodeCodes.encode(col("embedding"), book).as("c"))
        .collect()(0).getSeq[Int](0)
      codes.head shouldBe 0
    }

    it("reconstructs the concatenated codewords, zero-padding id gaps") {
      import spark.implicits._
      val df = Seq((Seq(1, 2), Seq(0, 0))).toDF("a", "b")
      val r = df.select(
        PqReconstruct.reconstruct(col("a"), book).as("ra"),
        PqReconstruct.reconstruct(col("b"), book).as("rb")).collect()(0)
      r.getSeq[Double](0) shouldBe Seq(0.0, 1.0, -1.0, 1.0)
      r.getSeq[Double](1) shouldBe Seq(1.0, 0.0, 1.0, 1.0)
      // the padded gap cell (id 1 in subspace 1) is all zeros
      val gap = df.select(PqReconstruct.reconstruct(
        typedLit(Seq(0, 1)), book).as("g")).collect()(0).getSeq[Double](0)
      gap shouldBe Seq(1.0, 0.0, 0.0, 0.0)
    }

    it("encode names the expected dim when the vector is too short") {
      val v = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(1.0, 2.0, 3.0)) // book needs m*subDim = 4
      val e = intercept[IllegalStateException] { PqCodec.encode(v, book) }
      e.getMessage should include("m*subDim")
      e.getMessage should include("3 components")
    }

    it("reconstruct rejects a code vector whose shape mismatches the book") {
      val codes = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(0, 0, 0)) // 3 codes, m = 2 book
      val e = intercept[IllegalStateException] { PqCodec.reconstruct(codes, book) }
      e.getMessage should include("m=2")
    }

    it("reconstruct rejects an out-of-range code, naming book and subspace") {
      // persisted-index scenario: rows encoded under a bigger codebook
      val codes = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(0, 9))
      val e = intercept[IllegalStateException] { PqCodec.reconstruct(codes, book) }
      e.getMessage should include("subspace 1")
      e.getMessage should include("different book")
    }

    it("codegen and interpreted eval agree on a real corpus slice") {
      import spark.implicits._
      // dim 16 = 2 × PqSubDim, so pqCodebooks' fixed-width slices line up
      val rows = (1L to 40L).map { i =>
        (i, (0 until 16).map(d => ((i * 31 + d * 7) % 13 - 6).toFloat / 3f), (i % 3).toInt)
      }
      val emb = rows.toDF("vec_id", "embedding", "label")
      val cbs = VectorOps.pqCodebooks(emb, m = 2, k = 4, iters = 1)
      val book2 = PqBook(cbs, subDim = VectorOps.PqSubDim)
      val enc = emb.select(col("vec_id"),
        PqEncodeCodes.encode(col("embedding"), book2).as("codes"))
      val viaCodegen = enc.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      // force interpreted eval through the kernel directly
      val viaKernel = rows.map { case (id, e, _) =>
        val v = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          e.map(_.toDouble).toArray)
        id -> PqCodec.encode(v, book2).toIntArray().toSeq
      }.toMap
      viaCodegen shouldBe viaKernel
    }
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{columnExpr, exprColumn}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Normalized Walsh–Hadamard rotation of a power-of-two-dim vector:
  *
  *   r_i = ⌊(Σ_j (−1)^popcount(i AND j) · v_j) / √d · 2²⁰ + ½⌋ / 2²⁰
  *
  * The output is quantized to the BINARY 2⁻²⁰ grid (≈1e-6 resolution),
  * not the repo's usual 6dp decimal grid, deliberately: rotated values
  * feed k-means TRAINING downstream, and means of decimal-grid numbers
  * land exactly on .5 ulp-of-1e-6 rounding boundaries (avg of two grid
  * points is a half-grid point), which the two engines' sums then round
  * apart. Dyadic components make every downstream sum, dot product, and
  * mean numerator EXACT in double (2⁻²⁰-grid values in [-1,1]: products
  * need 40 mantissa bits, 64-term sums 46 — under double's 53), so the
  * whole PQ replay is order-independent and bit-identical cross-engine.
  * The quantizer itself is the same ⌊x·2²⁰+½⌋ expression in both engines
  * — no round() semantics to reconcile.
  *
  * R = H/√d is orthogonal and symmetric (its own inverse), so cosine
  * similarity is preserved exactly and the rotation needs NO trained
  * matrix — the entry at (i, j) is a closed form over the bit pattern of
  * the indices, which is what makes a DuckDB twin possible (bit_count
  * replays the sign) where a trained OPQ rotation would not be.
  *
  * This is the "fast random rotation" pre-transform production PQ stacks
  * apply before subspace splitting (FAISS's pretransform stage, and the
  * same structured transform behind QuIP#/FFHT-style kernels): PQ
  * quantizes each `subDim` slice independently, so energy concentrated in
  * a few coordinates starves most codebooks; the Hadamard rotation
  * spreads every input coordinate uniformly across ALL output
  * coordinates, equalizing per-subspace energy at O(d log d) per vector —
  * no d×d matrix multiply, no stored matrix. (On this isotropic synthetic
  * corpus energy is already spread, so the recall delta vs raw PQ is
  * ~neutral — the same honest worst-case caveat as `mrlTopK` and
  * `ivfRpqTopK`; skewed production embeddings are where rotation pays.)
  *
  * Kernel shape follows PqCodec: the generated code is one static call,
  * the butterfly itself is JIT-compiled Scala, nothing rides the plan but
  * the expression node. The butterfly's addition order differs from the
  * oracle's Σ_j replay; both land within ~1e-15 of the exact sum, 9
  * orders of magnitude inside the 2^-20 quantization both sides apply.
  */
object HadamardCodec {

  /** In-place FWHT butterfly, then scale by 1/√d and quantize to the
    * dyadic 2^-20 grid (see object scaladoc for why binary, not decimal).
    * Requires d to be a power of two (loud failure otherwise — a 100 TB
    * corpus pass must not silently mis-rotate).
    */
  def rotate(v: ArrayData): ArrayData = {
    val d = v.numElements()
    if (d == 0 || (d & (d - 1)) != 0)
      throw new IllegalStateException(
        s"HadamardCodec.rotate: dim $d is not a power of two — " +
          "pad or slice the vector before rotating")
    val a = new Array[Double](d)
    var i = 0
    while (i < d) { a(i) = v.getDouble(i); i += 1 }
    var len = 1
    while (len < d) {
      var base = 0
      while (base < d) {
        var j = base
        val end = base + len
        while (j < end) {
          val x = a(j); val y = a(j + len)
          a(j) = x + y
          a(j + len) = x - y
          j += 1
        }
        base += len << 1
      }
      len <<= 1
    }
    val inv = 1.0 / math.sqrt(d.toDouble)
    i = 0
    while (i < d) { a(i) = math.floor(a(i) * inv * 1048576.0 + 0.5) / 1048576.0; i += 1 }
    new GenericArrayData(a)
  }

  /** Naive O(d²) reference: the definition with the oracle's j-ascending
    * sum order — used by the spec to pin the butterfly against the
    * definition (and therefore against the SQL replay).
    */
  def rotateNaive(v: Array[Double]): Array[Double] = {
    val d = v.length
    val inv = 1.0 / math.sqrt(d.toDouble)
    Array.tabulate(d) { i =>
      var s = 0.0
      var j = 0
      while (j < d) {
        if (java.lang.Integer.bitCount(i & j) % 2 == 0) s += v(j) else s -= v(j)
        j += 1
      }
      math.floor(s * inv * 1048576.0 + 0.5) / 1048576.0
    }
  }
}

/** `array<double> → array<double>` normalized Hadamard rotation. */
case class HadamardRotate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hadamard_rotate"

  override protected def nullSafeEval(v: Any): Any =
    HadamardCodec.rotate(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.HadamardCodec.rotate($x);")

  override protected def withNewChildInternal(newChild: Expression): HadamardRotate =
    copy(child = newChild)
}

object HadamardRotate {
  def rotate(v: Column): Column =
    exprColumn(HadamardRotate(columnExpr(v.cast("array<double>"))))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{columnExpr, exprColumn}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Compiled product-quantization codebook: m subspaces × (cell id,
  * centroid, centroid norm), plus a dense zero-padded reconstruction table
  * (Lloyd dropout leaves gaps no code can select, same padding as the old
  * literal `element_at` lookup). One instance rides the generated code as a
  * plan reference object — the codebook never appears as literals in the
  * expression tree, so generated methods stay far under Janino's 64 KB
  * limit no matter how many subspaces/codewords the quantizer has.
  */
final class PqBook(
    val subDim: Int,
    val cellIds: Array[Array[Int]], // [m][k_s], ascending cell ids
    val cens: Array[Array[Array[Double]]], // [m][k_s][subDim]
    val cnorms: Array[Array[Double]], // [m][k_s]
    val dense: Array[Array[Array[Double]]] // [m][maxCell+1][subDim]
) extends Serializable {
  def m: Int = cellIds.length
}

object PqBook {
  def apply(cbs: Seq[(Int, Array[(Int, Seq[Double])])], subDim: Int): PqBook = {
    val sorted = cbs.sortBy(_._1).map(_._2.sortBy(_._1))
    val cellIds = sorted.map(_.map(_._1)).toArray
    val cens = sorted.map(_.map(_._2.toArray)).toArray
    // same driver-side norm fold as nearestCellExpr's literal path
    val cnorms = cens.map(_.map(c => math.sqrt(c.foldLeft(0.0)((s, x) => s + x * x))))
    val dense = sorted.map { arr =>
      val byCell = arr.toMap
      val maxCell = arr.map(_._1).max
      (0 to maxCell).map(c =>
        byCell.get(c).map(_.toArray).getOrElse(new Array[Double](subDim))).toArray
    }.toArray
    new PqBook(subDim, cellIds, cens, cnorms, dense)
  }
}

/** Loop kernels for PQ encode/reconstruct, shared by interpreted eval and
  * generated code (the codegen emits one static call; the loop itself is
  * JIT-compiled Scala). Arithmetic replicates the Column formulation the
  * operators previously inlined as literals, term for term:
  *   ccos = round₆(dot(v_s, cen) / (‖v_s‖ · ‖cen‖))   (sequential dots)
  *   enc  = round₀(ccos · 10⁶) · 1024 + (1023 − cell) (argmax packing)
  *   code = 1023 − pmod(max(enc), 1024)
  * round₆/round₀ are Spark's own double rounding (BigDecimal.valueOf +
  * HALF_UP — the exact codegen Spark emits for `round`), so results are
  * bit-identical to the literal-expression path and the DuckDB oracle.
  */
object PqCodec {

  /** Spark's `round(double, s)` semantics (NaN/Inf pass through). */
  def roundAt(d: Double, scale: Int): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else
      java.math.BigDecimal
        .valueOf(d)
        .setScale(scale, java.math.RoundingMode.HALF_UP)
        .doubleValue()

  def encode(v: ArrayData, b: PqBook): ArrayData = {
    val m = b.m
    val sd = b.subDim
    // loud contract failure instead of a bare AIOOBE from generated code:
    // ivfRpqTopK feeds ArraySubtract output (min-length semantics) here, so
    // a dim mismatch would otherwise surface as an unexplained index error
    if (v.numElements() < m * sd)
      throw new IllegalStateException(
        s"PqCodec.encode: vector has ${v.numElements()} components but the " +
          s"book needs m*subDim = $m*$sd = ${m * sd}")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * sd
      var ns = 0.0
      var i = 0
      while (i < sd) { val x = v.getDouble(off + i); ns += x * x; i += 1 }
      val norm = math.sqrt(ns)
      val ids = b.cellIds(s)
      val cs = b.cens(s)
      val cn = b.cnorms(s)
      var best = Long.MinValue
      var j = 0
      while (j < ids.length) {
        val cen = cs(j)
        var d = 0.0
        var t = 0
        while (t < sd) { d += v.getDouble(off + t) * cen(t); t += 1 }
        val ccos = roundAt(d / (norm * cn(j)), 6)
        val enc = roundAt(ccos * 1000000.0, 0).toLong * 1024L + (1023L - ids(j))
        if (enc > best) best = enc
        j += 1
      }
      codes(s) = (1023L - java.lang.Math.floorMod(best, 1024L)).toInt
      s += 1
    }
    new GenericArrayData(codes)
  }

  def reconstruct(codes: ArrayData, b: PqBook): ArrayData = {
    val m = b.m
    val sd = b.subDim
    // codes can come from a PERSISTED index (ivfPqTopKFromIndex serves
    // arbitrary parquet rows): validate shape and range against the
    // supplied book so a stale/foreign index fails with the book named,
    // not a bare AIOOBE from deep inside generated code
    if (codes.numElements() != m)
      throw new IllegalStateException(
        s"PqCodec.reconstruct: ${codes.numElements()} codes for an m=$m book " +
          "— index rows do not match this quantizer")
    val out = new Array[Double](m * sd)
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= b.dense(s).length)
        throw new IllegalStateException(
          s"PqCodec.reconstruct: code $c out of range [0, ${b.dense(s).length}) " +
            s"in subspace $s — index rows were encoded with a different book")
      System.arraycopy(b.dense(s)(c), 0, out, s * sd, sd)
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<double> vector → array<int> codes` — all m subspace argmaxes in
  * one expression whose generated code is a single static call (the old
  * shape inlined m literal argmax folds and overflowed Janino's 64 KB
  * method limit, dropping the whole corpus-scan stage to interpreted).
  */
case class PqEncodeCodes(child: Expression, book: PqBook) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode_codes"

  override protected def nullSafeEval(v: Any): Any =
    PqCodec.encode(v.asInstanceOf[ArrayData], book)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val b = ctx.addReferenceObj("pqBook", book, classOf[PqBook].getName)
      s"${ev.value} = graft.functions.PqCodec.encode($x, $b);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

object PqEncodeCodes {
  def encode(v: Column, book: PqBook): Column =
    exprColumn(PqEncodeCodes(columnExpr(v.cast("array<double>")), book))
}

/** `array<int> codes → array<double>` concatenated-codeword reconstruction
  * (the ADC dequantize step), same reference-object strategy as the encoder.
  */
case class PqReconstruct(child: Expression, book: PqBook) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_reconstruct"

  override protected def nullSafeEval(codes: Any): Any =
    PqCodec.reconstruct(codes.asInstanceOf[ArrayData], book)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val b = ctx.addReferenceObj("pqBook", book, classOf[PqBook].getName)
      s"${ev.value} = graft.functions.PqCodec.reconstruct($x, $b);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqReconstruct =
    copy(child = newChild)
}

object PqReconstruct {
  def reconstruct(codes: Column, book: PqBook): Column =
    exprColumn(PqReconstruct(columnExpr(codes), book))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{columnExpr, exprColumn}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled BPE merge table: the learned merge rules in training order.
  * Rides the generated code as a plan reference object (the `PqBook`
  * strategy), so a large vocabulary never inflates the expression tree or
  * the generated method size.
  */
final class BpeTable(val pairs: Array[(String, String)]) extends Serializable {
  def size: Int = pairs.length
}

/** Loop kernels for greedy-merge BPE encoding, shared by interpreted eval
  * and generated code (codegen emits one static call; the loop is
  * JIT-compiled Scala). Semantics are pinned to what a chain of SQL
  * `replace` calls computes, so the DuckDB oracle can replay encoding
  * exactly:
  *
  *  - pre-tokenization = `regexp_extract_all(lower(text), '[a-z]+')` —
  *    ASCII letter runs after ASCII lowercasing (the corpus contract; a
  *    non-ASCII letter is a word boundary in both engines);
  *  - each merge rule applies IN TRAINING ORDER, globally per word,
  *    left-to-right, non-overlapping — exactly
  *    `replace(word_syms, '(a)(b)', '(ab)')` over the parenthesized
  *    symbol form the oracle carries;
  *  - a word's token count is its surviving symbol count.
  */
object BpeCodec {

  /** Apply one merge rule left-to-right, non-overlapping (the SQL
    * `replace` scan order). Returns the same array when nothing merges.
    */
  def applyMerge(syms: Array[String], a: String, b: String): Array[String] = {
    var hit = false
    var i = 0
    while (i < syms.length - 1 && !hit) {
      if (syms(i) == a && syms(i + 1) == b) hit = true
      i += 1
    }
    if (!hit) return syms
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out += (syms(j) + syms(j + 1))
        j += 2 // the merged symbol cannot re-match this rule's left side here
      } else {
        out += syms(j)
        j += 1
      }
    }
    out.toArray
  }

  /** Token count of one already-lowercased [a-z]+ word under the table. */
  def wordTokenCount(word: String, t: BpeTable): Int = {
    var syms: Array[String] = word.toCharArray.map(String.valueOf(_))
    val ps = t.pairs
    var r = 0
    while (r < ps.length && syms.length > 1) {
      syms = applyMerge(syms, ps(r)._1, ps(r)._2)
      r += 1
    }
    syms.length
  }

  /** Total BPE token count of a document: pre-tokenize (ASCII lowercase,
    * [a-z]+ runs), encode each word, sum the symbol counts. One kernel
    * call per row — the whole pass stays inside WholeStageCodegen.
    */
  def countTokens(text: UTF8String, t: BpeTable): Long = {
    val s = text.toString
    var total = 0L
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= s.length) {
      val c = if (i < s.length) s.charAt(i) else ' '
      val lc =
        if (c >= 'A' && c <= 'Z') (c + 32).toChar
        else c
      if (lc >= 'a' && lc <= 'z') sb.append(lc)
      else if (sb.length > 0) {
        total += wordTokenCount(sb.toString, t)
        sb.setLength(0)
      }
      i += 1
    }
    total
  }

  /** Word count under the same pre-tokenization (for tokens-per-word). */
  def countWords(text: UTF8String): Long = {
    val s = text.toString
    var words = 0L
    var inWord = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val isLetter = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
      if (isLetter && !inWord) { words += 1; inWord = true }
      else if (!isLetter) inWord = false
      i += 1
    }
    words
  }
}

/** `string text → bigint token count` — greedy-merge BPE over the whole
  * document in one generated static call.
  */
case class BpeTokenCount(child: Expression, table: BpeTable) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override protected def nullSafeEval(text: Any): Any =
    BpeCodec.countTokens(text.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val t = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
      s"${ev.value} = graft.functions.BpeCodec.countTokens($x, $t);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  def count(text: Column, table: BpeTable): Column =
    exprColumn(BpeTokenCount(columnExpr(text), table))
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-level LONGEST COMMON SUBSEQUENCE length of two text columns —
  * the primitive behind ROUGE-L (Lin 2004): unlike the n-gram clip
  * family ([[WordGramStats]], the q_rouge/q_bleu machinery), LCS
  * rewards in-order matches at ANY gap, so it needs the classic
  * O(|a|·|b|) dynamic program, not a count join — exactly the shape
  * that belongs in ONE native codegen call (the [[SpanCorrupt]]
  * precedent): per-ROW compute bounded by document length squared,
  * zero shuffle, zero allocation beyond two int rows.
  *
  * Tokenization matches the repo contract: split on single spaces
  * keeping empties (`split(text, ' ', -1)`), so the token universe is
  * identical to q_rouge's unigram counts and the DuckDB oracle's
  * `string_split`.
  *
  * The DP is the two-row rolling form: cur[j] = prev[j-1]+1 on match
  * else max(prev[j], cur[j-1]); memory O(min-side), never the matrix.
  */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lcs"

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsUtil.lcs(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LcsUtil.lcs($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}

object LcsUtil {
  /** Static entry called from generated Java. */
  def lcs(a: UTF8String, b: UTF8String): Long = {
    val x = a.toString.split(" ", -1)
    val y = b.toString.split(" ", -1)
    // roll over the shorter side: O(min) memory, same O(n·m) time
    val (outer, inner) = if (x.length >= y.length) (x, y) else (y, x)
    var prev = new Array[Int](inner.length + 1)
    var cur = new Array[Int](inner.length + 1)
    var i = 0
    while (i < outer.length) {
      val oi = outer(i)
      var j = 0
      while (j < inner.length) {
        cur(j + 1) =
          if (oi == inner(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(inner.length).toLong
  }
}

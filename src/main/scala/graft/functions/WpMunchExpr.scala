package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece greedy maximum-munch piece count of one word under a
  * FROZEN vocabulary, as a single native codegen call — the r14
  * optimization-round fusion of `ops/Vocab.scala`'s encode unroll
  * (the [[UlmSegment]] precedent applied to BERT's encoder): the
  * per-word greedy loop is row-local over ≤ ULM_LMAX-char words, so it
  * belongs in one compiled call instead of ULM_LMAX join+window+
  * checkpoint rounds over the distinct-word relation, whose per-job
  * fixed cost dominated the measured wall at every scale.
  *
  * Semantics, IDENTICAL to the unrolled loop (WordpieceSpec re-derives
  * every doc driver-side; the DuckDB enc-CTE oracle re-verifies
  * corpus-wide):
  *
  *  - from pos 0, repeatedly take the LONGEST vocabulary piece starting
  *    at pos (the unrolled `row_number over (i DESC)` pick) and count
  *    it; the vocabulary contains every single char of every word by
  *    construction, so each step advances and a word of n chars
  *    finishes in ≤ n steps.
  *  - should a position have NO matching piece (impossible for the
  *    declared relation, by the singles argument), the loop stops and
  *    returns the pieces counted so far — exactly the unrolled loop's
  *    stalled-row semantics.
  *
  * The vocabulary rides the plan as a foldable array literal
  * (vocab-sized by construction: alphabet + merge products) and is
  * built into a per-task hash set once, never per row. Character
  * indexing via `UTF8String.numChars`/`substring` — the SQL
  * `length`/`substring` semantics both engines use.
  */
case class WpMunch(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes =
    Seq(StringType, ArrayType(StringType, containsNull = false))
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "graft_wp_munch"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable vocabulary array (driver-built)")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** Built once from the foldable array child; shipped to executors via
    * the codegen reference array (the addReferenceObj idiom).
    */
  @transient private lazy val model: WpVocab =
    WpMunchUtil.build(right.eval(null))

  override def nullSafeEval(word: Any, ignoredVocab: Any): Any =
    WpMunchUtil.munch(word.asInstanceOf[UTF8String], model)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("wpVocab", model, classOf[WpVocab].getName)
    nullSafeCodeGen(ctx, ev, (word, _) => s"""
      ${ev.value} = graft.functions.WpMunchUtil.munch($word, $modelRef);
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WpMunch =
    copy(left = newLeft, right = newRight)
}

/** The frozen vocabulary: piece set plus the longest piece's char count
  * (the munch inner-loop start).
  */
final class WpVocab(
    val pieces: java.util.HashSet[UTF8String],
    val maxPieceChars: Int)
  extends Serializable

object WpMunchUtil {

  /** Materialize the foldable array literal into the lookup set. */
  def build(raw: Any): WpVocab = {
    val a = raw.asInstanceOf[ArrayData]
    val n = a.numElements()
    val h = new java.util.HashSet[UTF8String](math.max(4, n * 2))
    var maxLen = 1
    var i = 0
    while (i < n) {
      // clone: array-literal backing bytes may be reused buffers
      val p = a.getUTF8String(i).clone()
      h.add(p)
      if (p.numChars() > maxLen) maxLen = p.numChars()
      i += 1
    }
    new WpVocab(h, maxLen)
  }

  /** Static entry called from generated Java: greedy maximum munch. */
  def munch(word: UTF8String, v: WpVocab): Long = {
    val n = word.numChars()
    var pos = 0
    var count = 0L
    while (pos < n) {
      var l = math.min(v.maxPieceChars, n - pos)
      var taken = false
      while (l >= 1 && !taken) {
        if (v.pieces.contains(word.substring(pos, pos + l))) {
          pos += l
          count += 1
          taken = true
        }
        l -= 1
      }
      // no piece matches (impossible when singles cover the alphabet):
      // stop with the count so far — the unrolled loop's stalled row
      if (!taken) return count
    }
    count
  }
}

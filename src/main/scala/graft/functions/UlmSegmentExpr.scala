package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM Viterbi segmentation of one word under a FROZEN
  * piece→weight table, as a single native codegen call — the
  * SentencePiece encode DP (Kudo 2018) that `ops/Vocab.scala` r13
  * unrolled as ~8 join+window+checkpoint rounds PER E-STEP. The DP is
  * row-local over ≤[[graft.ops.Vocab]]-capped words, so it belongs in
  * one compiled call (the [[LcsLength]] precedent): each E-step
  * becomes ONE projection over the distinct-word relation instead of
  * ~16-24 checkpointed micro-jobs whose fixed overhead dominated every
  * measured scale (r13 VERDICT's top bench lever).
  *
  * Semantics, BIT-IDENTICAL to the unrolled DataFrame DP (VocabSpec
  * pins the equality, the DuckDB CTE-chain oracle re-verifies it
  * corpus-wide):
  *
  *  - `weights` maps piece → integer log-prob bits, precomputed
  *    driver-side as flog2(c+1) − flog2(Σc+1) — exactly the per-edge
  *    `flog2(c + 1) − b` the unrolled join evaluated. The vocabulary
  *    is broadcast-sized BY CONSTRUCTION (alphabet + ≤ ULM_SEED
  *    multi-char survivors), so the map rides the plan as a foldable
  *    literal; the model is built once per task, never per row.
  *  - f(0) = 0; f(i) = max over reachable j with word[j..i) ∈ vocab of
  *    f(j) + w(piece); ties broken toward the SMALLEST j (the unrolled
  *    `row_number over (score DESC, j ASC)` — longest last piece).
  *  - Result: the argmax path's pieces in order (`array<string>`), or
  *    NULL when no segmentation exists (the unrolled DP's absent
  *    idx = length(word) row; explode() drops it identically).
  *
  * Character-index discipline: code points via `UTF8String.numChars` /
  * `substring`, matching SQL `length`/`substring` and DuckDB
  * `length`/`substr`.
  */
case class UlmSegment(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes =
    Seq(StringType, MapType(StringType, LongType, valueContainsNull = false))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ulm_segment"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable weight map (the vocabulary is driver-built)")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** Built once from the foldable map child; shipped to executors via
    * the codegen reference array (the addReferenceObj idiom), so the
    * per-row hot path is pure DP over a ready HashMap.
    */
  @transient private lazy val model: UlmModel =
    UlmSegmentUtil.build(right.eval(null))

  override def nullSafeEval(word: Any, ignoredMap: Any): Any =
    UlmSegmentUtil.segment(word.asInstanceOf[UTF8String], model)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("ulmModel", model, classOf[UlmModel].getName)
    nullSafeCodeGen(ctx, ev, (word, _) => s"""
      ${ev.value} = graft.functions.UlmSegmentUtil.segment($word, $modelRef);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UlmSegment =
    copy(left = newLeft, right = newRight)
}

/** The frozen per-round model: piece → integer-bit weight, plus the
  * longest piece's char count (the DP's inner-loop bound).
  */
final class UlmModel(
    val weights: java.util.HashMap[UTF8String, java.lang.Long],
    val maxPieceChars: Int)
  extends Serializable

object UlmSegmentUtil {

  /** Materialize the foldable map literal into the lookup model. */
  def build(raw: Any): UlmModel = {
    val m = raw.asInstanceOf[MapData]
    val n = m.numElements()
    val keys = m.keyArray()
    val vals = m.valueArray()
    val h = new java.util.HashMap[UTF8String, java.lang.Long](math.max(4, n * 2))
    var maxLen = 1
    var i = 0
    while (i < n) {
      // clone: map-literal backing bytes may be reused buffers
      val k = keys.getUTF8String(i).clone()
      h.put(k, vals.getLong(i))
      if (k.numChars() > maxLen) maxLen = k.numChars()
      i += 1
    }
    new UlmModel(h, maxLen)
  }

  /** Static entry called from generated Java: the Viterbi DP.
    * Returns null when the word has no segmentation under the model.
    */
  def segment(word: UTF8String, m: UlmModel): ArrayData = {
    val n = word.numChars()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val score = new Array[Long](n + 1)
    val from = new Array[Int](n + 1)
    java.util.Arrays.fill(from, -1)
    from(0) = 0
    var i = 1
    while (i <= n) {
      var best = Long.MinValue
      var bestJ = -1
      var j = if (i > m.maxPieceChars) i - m.maxPieceChars else 0
      while (j < i) {
        if (from(j) >= 0) {
          val w = m.weights.get(word.substring(j, i))
          if (w != null) {
            val sc = score(j) + w.longValue()
            // strict >: the first (smallest-j) maximum wins — the
            // unrolled row_number's (score DESC, j ASC) tiebreak
            if (sc > best) { best = sc; bestJ = j }
          }
        }
        j += 1
      }
      score(i) = best
      from(i) = bestJ
      i += 1
    }
    if (from(n) < 0) return null
    var cnt = 0
    var p = n
    while (p > 0) { cnt += 1; p = from(p) }
    val out = new Array[Any](cnt)
    p = n
    var k = cnt - 1
    while (p > 0) {
      out(k) = word.substring(from(p), p)
      k -= 1
      p = from(p)
    }
    new GenericArrayData(out)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** T5/UL2 span-corruption example builder as ONE native codegen call —
  * the WordShingles treatment applied to q_span_corruption (VERDICT r9
  * #5): the transform/flatten/concat_ws higher-order chain is
  * CodegenFallback, so the r9 formulation interpreted three boxed
  * HOF trees per document (~4.5 s at sf1 for a per-row op); this is a
  * single compiled pass that tokenizes once and emits the whole
  * `(n_masked, corrupted, targets)` struct.
  *
  * Semantics — BIT-IDENTICAL to the HOF chain and the DuckDB oracle
  * (FunctionsSpec pins the equivalence against the old formulation):
  * with `w = split(text, ' ')` keeping empties and the per-doc phase
  * `off ∈ [0, 7)`, position p is masked iff `(p + off) mod 7 < 3`
  * (3-token spans on a period-7 grid); span index `k = (p + off) div 7`
  * names the sentinel `<X_k>`. `corrupted` = unmasked tokens in order
  * with each span collapsed to its sentinel at the span's first masked
  * position; `targets` = each sentinel followed by its span's tokens;
  * both joined by single spaces exactly as `concat_ws` joins the
  * flattened arrays (empty tokens preserved as empty join elements).
  */
case class SpanCorrupt(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  // return type inferred: AbstractDataType is private[sql]
  override def inputTypes = Seq(StringType, LongType)
  override def dataType: DataType = SpanCorruptUtil.schema
  override def prettyName: String = "graft_span_corrupt"

  override def nullSafeEval(text: Any, off: Any): Any =
    SpanCorruptUtil.corrupt(text.asInstanceOf[UTF8String], off.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, o) => s"graft.functions.SpanCorruptUtil.corrupt($t, $o)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanCorrupt =
    copy(left = newLeft, right = newRight)
}

object SpanCorruptUtil {
  val schema: StructType = StructType(Seq(
    StructField("n_masked", LongType, nullable = false),
    StructField("corrupted", StringType, nullable = false),
    StructField("targets", StringType, nullable = false)))

  /** Static entry called from generated Java. The `first*` booleans (not
    * a length check) reproduce `concat_ws`'s join-with-empties behavior:
    * an empty FIRST token still claims a join position, so " x" and "x"
    * stay distinct.
    */
  def corrupt(text: UTF8String, off: Long): InternalRow = {
    val w = text.toString.split(" ", -1)
    val corrupted = new java.lang.StringBuilder(text.numBytes() + 16)
    val targets = new java.lang.StringBuilder(text.numBytes() + 16)
    var firstC = true
    var firstT = true
    def addC(s: String): Unit = {
      if (!firstC) corrupted.append(' ')
      corrupted.append(s); firstC = false
    }
    def addT(s: String): Unit = {
      if (!firstT) targets.append(' ')
      targets.append(s); firstT = false
    }
    var nMasked = 0L
    var p = 0
    while (p < w.length) {
      val m = ((p + off) % 7).toInt
      if (m >= 3) addC(w(p))
      else {
        nMasked += 1
        if (m == 0 || p == 0) {
          val sentinel = "<X" + ((p + off) / 7) + ">"
          addC(sentinel)
          addT(sentinel)
        }
        addT(w(p))
      }
      p += 1
    }
    InternalRow(nMasked,
      UTF8String.fromString(corrupted.toString),
      UTF8String.fromString(targets.toString))
  }
}

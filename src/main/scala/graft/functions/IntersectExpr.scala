package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** |A ∩ B| over two SORTED-ascending distinct `array<long>` columns as a
  * single codegen merge loop — O(|A|+|B|) with zero allocation.
  *
  * Replaces `size(array_intersect(a, b))` in the pair-verification hot
  * paths: the builtin builds a hash set per evaluated PAIR (millions of
  * allocations across a blocked candidate join), where the sorted
  * contract of [[WordShingleHashes]] makes a two-pointer merge
  * sufficient. Result is identical on distinct inputs — the integer
  * Jaccard decisions and their DuckDB oracles are unchanged.
  *
  * Inputs MUST be sorted ascending and duplicate-free (the
  * [[WordShingleHashes]] output contract); behaviour on unsorted input
  * is undefined by design — this is a private engine primitive, not a
  * general function.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  // inferred Seq[ArrayType]: AbstractDataType is private[sql] (see VectorFold)
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toLongArray()
    val ys = b.asInstanceOf[ArrayData].toLongArray()
    var i = 0
    var j = 0
    var c = 0
    while (i < xs.length && j < ys.length) {
      if (xs(i) < ys(j)) i += 1
      else if (xs(i) > ys(j)) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      s"""
         |long[] $xs = $a.toLongArray();
         |long[] $ys = $b.toLongArray();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $xs.length && $j < $ys.length) {
         |  if ($xs[$i] < $ys[$j]) $i++;
         |  else if ($xs[$i] > $ys[$j]) $j++;
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression,
      r: Expression
  ): SortedLongIntersectCount = copy(left = l, right = r)
}

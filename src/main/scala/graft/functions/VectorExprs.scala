package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen vector math for the similarity family (SURVEY §2.C E11).
  *
  * Why custom expressions: Spark's higher-order functions (`zip_with`,
  * `aggregate`) are `CodegenFallback` — each evaluation interprets the
  * lambda with boxed Doubles. On an all-pairs similarity join that is
  * millions of 64-step folds; these expressions generate a tight primitive
  * `double[]` loop inside whole-stage codegen instead (measured ~20× on
  * q_cosine_near at sf0.1).
  *
  * Numeric discipline: accumulation is the same left-to-right IEEE fold
  * (`acc = acc op f(x_i, y_i)` starting at 0.0) that both the previous
  * `aggregate(zip_with(...))` formulation and DuckDB's `list_sum` over a
  * list comprehension perform — results are bitwise identical, so the
  * DuckDB oracles are unchanged.
  */
abstract class VectorFold extends BinaryExpression with ExpectsInputTypes {
  // return type inferred as Seq[ArrayType]: AbstractDataType is
  // private[sql] and cannot be named here; covariance makes this a
  // valid override.
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  /** Java source for one loop step, given xs[i] and ys[i]. */
  protected def stepJava(x: String, y: String): String
  protected def stepScala(x: Double, y: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toDoubleArray()
    val ys = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(xs.length, ys.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += stepScala(xs(i), ys(i)); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |double[] $xs = $a.toDoubleArray();
         |double[] $ys = $b.toDoubleArray();
         |int $n = Math.min($xs.length, $ys.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${stepJava(s"$xs[$i]", s"$ys[$i]")};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Σ xᵢ·yᵢ — dot product; `DotProduct(v, v)` is the squared L2 norm. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  protected def stepJava(x: String, y: String): String = s"$x * $y"
  protected def stepScala(x: Double, y: Double): Double = x * y
  override def prettyName: String = "graft_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Σ (xᵢ−yᵢ)² — squared euclidean distance (IVF centroid assignment). */
case class SquaredDistance(left: Expression, right: Expression) extends VectorFold {
  protected def stepJava(x: String, y: String): String = s"($x - $y) * ($x - $y)"
  protected def stepScala(x: Double, y: Double): Double = (x - y) * (x - y)
  override def prettyName: String = "graft_sqdist"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SquaredDistance =
    copy(left = l, right = r)
}

object VectorExprs {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(expr(a), expr(b)))
  def sqDist(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredDistance(expr(a), expr(b)))

  private def expr(c: Column): Expression = ColumnBridge.expression(c)
}

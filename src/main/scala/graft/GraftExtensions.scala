package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/** Engine extension entry point (`spark.sql.extensions=graft.GraftExtensions`,
  * wired by [[Sessions.builder]]): registers the native codegen
  * expressions as SQL functions, so the pure-SQL surface reaches the
  * same tight primitive loops the DataFrame API uses — a SQL user gets
  * `SELECT graft_dot(a.v, b.v)` with whole-stage codegen, not an
  * interpreted UDF (the UDF registrations in `WorkingDays.registerUdfs`
  * exist to demo the UDF surface itself; THIS is the production path
  * for custom functions).
  *
  * SURVEY §4 extension-preference ladder: these are (b) custom catalyst
  * `Expression`s; `injectFunction` is the `SparkSessionExtensions`
  * registration mechanism that scales to (c) whole-operator
  * rules/strategies when an operator ever needs one.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, arity: Int)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (children: Seq[Expression]) => {
          require(children.length == arity, s"$name expects $arity arguments")
          builder(children)
        }
      ))

    register("graft_dot", 2)(cs => DotProduct(cs(0), cs(1)))
    register("graft_sqdist", 2)(cs => SquaredDistance(cs(0), cs(1)))
    register("graft_shingles", 2)(cs => WordShingles(cs(0), intLit(cs(1), "shingle width")))
    register("graft_shingle_hashes", 2)(cs =>
      WordShingleHashes(cs(0), intLit(cs(1), "shingle width")))
    register("graft_intersect_count", 2)(cs => SortedLongIntersectCount(cs(0), cs(1)))
    register("graft_lcs", 2)(cs => LcsLength(cs(0), cs(1)))
    register("graft_gram_stats", 2)(cs => WordGramStats(cs(0), intLit(cs(1), "gram width")))
    register("graft_ulm_segment", 2)(cs => UlmSegment(cs(0), cs(1)))
    register("graft_wp_munch", 2)(cs => WpMunch(cs(0), cs(1)))
    // the UDTF surface: a native Generator usable in LATERAL VIEW
    register("graft_explode_shingles", 2)(cs =>
      ExplodeWordShingles(cs(0), intLit(cs(1), "shingle width")))
  }
}

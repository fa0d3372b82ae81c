package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles as a native codegen expression.
  *
  * Replaces the `transform(sequence(...), i -> concat_ws(element_at…))`
  * higher-order formulation: HOFs are CodegenFallback, so that version
  * interpreted ~150 boxed sub-expressions per document — and Spark
  * re-evaluates the expression in every Filter/Project that references
  * it (~6× per doc across a self-join). This one is a single compiled
  * call inside whole-stage codegen.
  *
  * Semantics (bit-identical to the old column and the DuckDB oracle):
  * split on single space keeping empties, windows of n consecutive
  * words joined by one space, distinct keeping FIRST occurrence order,
  * empty array when the text has fewer than n words.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Distinct word n-gram shingles as 61-bit rolling hashes
  * (`array<long>`), SORTED ascending. For pair-verification workloads
  * the per-pair intersection dominates; comparing 8-byte longs instead
  * of UTF8Strings cuts that cost several-fold, and the sorted contract
  * lets [[SortedLongIntersectCount]] merge-count pairs in O(|A|+|B|)
  * with no per-pair hash set. Collision probability per compared pair
  * is ≈ |sets|²/2⁶¹ (~10⁻¹⁴ here) — and deterministic: the same corpus
  * always yields the same result.
  */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingleHashes(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

/** Per-document n-gram repetition statistics as one native codegen
  * call: `[total, top, distinct]` — total n-gram occurrences, the count
  * of the most frequent n-gram, and the distinct n-gram count.
  *
  * Backs `q_repetition`'s Gopher rules. The higher-order-function
  * formulation (`array_max(transform(array_distinct(g), g -> size(
  * filter(...))))`) is both CodegenFallback (interpreted) AND O(d²) per
  * document; this is one O(d) hash-map pass over exact strings — same
  * bit-exact counts as the oracle's list comprehension, ~6× faster
  * measured at sf0.1.
  */
case class WordGramStats(child: Expression, n: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_gram_stats"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.gramStats(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.gramStats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGramStats =
    copy(child = newChild)
}

/** The engine's UDTF surface: word shingles as a native Catalyst
  * GENERATOR (table-valued function), registered as
  * `graft_explode_shingles` — usable from pure SQL in a LATERAL VIEW
  * (`... LATERAL VIEW graft_explode_shingles(text, 3) t AS shingle`).
  * Same per-doc distinct-shingle semantics as [[WordShingles]].
  *
  * This completes the extension triad: scalar Expression
  * ([[DotProduct]]), typed Aggregator (graft.ops.TopKAgg /
  * AutoDateAgg), and Generator (this). A Generator is planned by
  * GenerateExec, which codegens only the builtin CollectionGenerators —
  * so the hot-path composition `explode(graft_shingles(text, n))`
  * (whole-stage codegen throughout) remains the recommended form; this
  * expression exists to prove the UDTF extension point end-to-end with
  * identical semantics (GraftExtensionsSpec pins the equivalence).
  */
case class ExplodeWordShingles(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def prettyName: String = "graft_explode_shingles"

  override def elementSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("shingle", StringType, nullable = false) :: Nil)

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val arr = ShingleUtil.shingles(t.asInstanceOf[UTF8String], n)
      (0 until arr.numElements()).map(i =>
        org.apache.spark.sql.catalyst.InternalRow(arr.getUTF8String(i)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ExplodeWordShingles =
    copy(child = newChild)
}

object ShingleUtil {
  /** Static entry called from generated Java. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    // String.split(" ", -1) == Spark's split(text, " "): regex split on a
    // literal space, trailing empties kept.
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((words.length - n + 1) * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Static entry called from generated Java: `[total, top, distinct]`
    * n-gram occurrence stats in one counting pass.
    */
  def gramStats(text: UTF8String, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n)
      return new GenericArrayData(Array[Any](0, 0, 0))
    val counts = new java.util.HashMap[String, Int]((words.length - n + 1) * 2)
    val sb = new java.lang.StringBuilder(64)
    var top = 0
    var i = 0
    while (i + n <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val key = sb.toString
      val c = counts.getOrDefault(key, 0) + 1
      counts.put(key, c)
      if (c > top) top = c
      i += 1
    }
    new GenericArrayData(Array[Any](words.length - n + 1, top, counts.size))
  }

  /** Static entry called from generated Java: distinct shingles as
    * rolling hashes, sorted ascending (the [[SortedLongIntersectCount]]
    * input contract; every consumer — explode, minhash min, set
    * intersection — is order-independent).
    */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.TreeSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(TextHash.rollingHash(sb.toString))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }
}

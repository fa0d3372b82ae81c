package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Codegen Bloom-filter membership probe (SURVEY §2.C E10 — the sketch
  * front-end to exact decontamination).
  *
  * A `udf((h: Long) => bf.value.mightContainLong(h))` breaks whole-stage
  * codegen in the train-side scan projection — the one stage the Bloom
  * pass exists to keep at scan speed (r4 verdict §What's-wrong #2). Spark
  * ships the cure natively: [[BloomFilterMightContain]] is the codegen
  * expression behind its own runtime row-group filtering — it
  * deserializes the sketch once per task from a constant binary child and
  * emits a straight-line `mightContainLong` call inside the generated
  * code. Wrapping the serialized filter as a [[Literal]] is exactly how
  * Spark's `InjectRuntimeFilter` plants it after the subquery result is
  * known, so the probe stage stays one fused WholeStageCodegen span.
  *
  * Distribution note: the literal rides the serialized task binary
  * instead of a `SparkContext.broadcast` — the same transport Spark's own
  * injected bloom filters use. Task binaries are themselves broadcast
  * once per stage, so a multi-MB eval sketch is shipped to each executor
  * once, not per task.
  */
object BloomProbe {

  /** `mightContainLong(value)` as a codegen Column predicate. */
  def mightContain(bf: BloomFilter, value: Column): Column = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    ColumnBridge.column(
      BloomFilterMightContain(
        Literal(bos.toByteArray, BinaryType),
        ColumnBridge.expression(value)))
  }
}

package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded per-key top-k as a typed Aggregator — the scale alternative
  * to `row_number().over(Window.partitionBy(k).orderBy(v))`:
  * the window form SORTS every key's full row set; this keeps only a
  * k-element bound per key through the partial/final (map-side combine)
  * path, so shuffle volume is |keys|·k instead of |rows|.
  *
  * Ordering: (value DESC, tiebreak ASC) — matches the deterministic
  * window `orderBy(col(v).desc, col(t).asc)` the oracle uses.
  */
object TopKAgg {

  final case class Entry(value: Double, tiebreak: Long)

  final class TopK(k: Int) extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    // Double.compare, not `>`: IEEE > is not a total order (NaN compares
    // false both ways), which would make the kept set merge-order-
    // dependent. Double.compare ranks NaN above every value — the same
    // ordering Spark's sort uses — so results stay deterministic and
    // window-oracle-consistent even with NaN inputs.
    private def better(a: Entry, b: Entry): Boolean = {
      val c = java.lang.Double.compare(a.value, b.value)
      c > 0 || (c == 0 && a.tiebreak < b.tiebreak)
    }

    def zero: List[Entry] = Nil
    // buffer kept sorted best-first, length ≤ k (k is tiny; list insert
    // beats heap constant-factor here)
    private def insert(buf: List[Entry], e: Entry): List[Entry] = {
      val (pre, post) = buf.span(better(_, e))
      val merged = pre ::: (e :: post)
      if (merged.length > k) merged.take(k) else merged
    }
    def reduce(buf: List[Entry], e: Entry): List[Entry] = insert(buf, e)
    def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      b.foldLeft(a)(insert)
    def finish(buf: List[Entry]): Seq[Entry] = buf
    def bufferEncoder: Encoder[List[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
    def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** q_window_rank's semantics (top-3 orders per customer by totalprice,
    * tiebreak orderkey asc) through the bounded aggregator instead of a
    * window sort — same oracle proves equivalence.
    */
  val qTopkPerKey = Q(
    "q_topk_per_key",
    (s, d) => {
      // the product encoder flattens Entry into (value, tiebreak) params
      val agg = udaf(new TopK(3), org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Entry]())
      Tables
        .orders(s, d)
        .groupBy("o_custkey")
        .agg(agg(col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_custkey"), posexplode(col("top")))
        .select(
          col("o_custkey"),
          col("col.tiebreak").as("o_orderkey"),
          col("col.value").as("o_totalprice"),
          (col("pos") + 1).cast("int").as("rnk")
        )
        .orderBy("o_custkey", "rnk")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
              FROM orders) t
            WHERE rnk <= 3 ORDER BY o_custkey, rnk""")
  )
}

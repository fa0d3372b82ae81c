package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode

/** q_profile_approx's law: the HLL++ profile must agree with the exact
  * profile on every non-sketch column bitwise, bound each cardinality
  * estimate within the documented rsd envelope, and actually deliver
  * the promised plan collapse (no Expand — the whole point of the
  * swap at 100 TB).
  */
class QualityProfileSpec extends SparkSpec {

  private def row(name: String) =
    graft.SparkEntry.queries(name)(spark, sf0001).collect().head

  test("q_profile_approx: exact columns bitwise, estimates within the HLL++ envelope") {
    val exact = row("q_profile")
    val approx = row("q_profile_approx")
    // the non-sketch columns are THE SAME aggregation — any drift means
    // the approx query silently changed more than the distinct-counts
    for (c <- Seq("n_rows", "n_null_text", "min_chars", "max_chars",
        "total_chars", "min_text_len", "max_text_len"))
      assert(exact.getAs[Any](c) == approx.getAs[Any](c), s"column $c drifted")
    // rsd 5% default ⇒ |est − true| ≤ 3·rsd·true covers ≥99.7% of seeds;
    // the fixture cardinalities (≤ corpus size) sit mostly in HLL++'s
    // sparse-exact regime anyway
    for (c <- Seq("n_doc_ids", "n_langs", "n_sources")) {
      val t = exact.getAs[Long](c).toDouble
      val e = approx.getAs[Long](c).toDouble
      assert(math.abs(e - t) <= math.max(1.0, 0.15 * t),
        s"$c estimate $e vs exact $t outside the rsd envelope")
    }
  }

  test("q_profile_approx: the Expand is gone — plain partial aggregation") {
    def plan(name: String) =
      graft.SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan("q_profile").contains("Expand"),
      "exact profile lost its multi-distinct Expand (did its aggregates change?)")
    val p = plan("q_profile_approx")
    assert(!p.contains("Expand"),
      "approx profile must be scan-speed partial aggregation — no Expand")
    assert(p.contains("partial_approx_count_distinct") || p.contains("approx_count_distinct"),
      "HLL++ sketch aggregate missing")
  }

  test("giniPerRow (shuffle-free twin) equals q_gini_diversity row for row, zero exchanges") {
    val declared = Quality.qGiniDiversity.fn(spark, sf0001).collect().toSeq
    val twin = Quality.giniPerRow(spark, sf0001).collect().toSeq
    assert(declared.nonEmpty && twin.map(_.toSeq) == declared.map(_.toSeq),
      "run-length fold diverged from the explode/groupBy moments")
    val p = Quality.giniPerRow(spark, sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("HashAggregate") && !p.contains("Join"))
    assert(!p.linesIterator.exists(_.matches(""".*\(\d+\) Exchange\s*""")) ||
      p.linesIterator.count(_.matches(""".*\(\d+\) Exchange\s*""")) <= 1,
      "the per-row twin acquired a data shuffle (only the output sort may exchange)")
  }
}

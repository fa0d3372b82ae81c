package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Count-Min Sketch laws (q_cms_terms is declared rows-only, so these
  * are its verification, the q_approx_distinct / q_dedup_simhash
  * pattern): one-sided error, the ε-bound, and the monoid merge.
  */
class CmsSpec extends SparkSpec {

  private def toks = Tables.documents(spark, sf0001)
    .select(explode(split(col("text"), " ")).as("term"))
    .where(col("term") =!= "")

  test("estimates are ONE-SIDED (never undercount) and within the ε bound") {
    val rows = graft.SparkEntry.queries("q_cms_terms")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 10)
    val n = toks.count()
    for ((term, exact, est) <- rows) {
      assert(est >= exact, s"CMS undercounted '$term': $est < $exact")
      // standard bound: overshoot ≤ e·N/w w.p. 1−e^-d; deterministic
      // corpus + fixed hashes make this a fixed fact, not a flake
      assert(est - exact <= 3 * n / TextOps.CMS_W,
        s"'$term' overshoot ${est - exact} exceeds 3N/w (N=$n)")
    }
  }

  test("sketch is a MONOID: cell-wise sum of split sketches equals the full sketch") {
    def cellsOf(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
      TextOps.cmsBuild(df).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    val even = cellsOf(toks.where(xxhash64(col("term")) % 2 === 0))
    val odd = cellsOf(toks.where(xxhash64(col("term")) % 2 =!= 0))
    val full = cellsOf(toks)
    val merged = (even.keySet ++ odd.keySet).map { k =>
      k -> (even.getOrElse(k, 0L) + odd.getOrElse(k, 0L))
    }.toMap
    assert(merged == full, "cell-wise merge diverged from the one-pass sketch")
  }

  test("probing a term ABSENT from the corpus still never exceeds the bound") {
    // absent terms estimate as pure collision mass: ≥ 0, ≤ εN
    val n = toks.count()
    val cells = TextOps.cmsBuild(toks)
    val ghost = spark.range(1).select(lit("zzz_never_in_corpus").as("term"))
    val est = ghost
      .select(explode(expr(
        s"transform(sequence(0, ${TextOps.CMS_D - 1}), " +
          s"i -> struct(i AS r, pmod(xxhash64(term, i), ${TextOps.CMS_W}) AS c))")).as("rc"))
      .join(cells, col("rc.r") === col("r") && col("rc.c") === col("c"), "left")
      .agg(min(coalesce(col("v"), lit(0L)))).collect()(0).getLong(0)
    assert(est >= 0 && est <= 3 * n / TextOps.CMS_W, s"ghost estimate $est")
  }
}

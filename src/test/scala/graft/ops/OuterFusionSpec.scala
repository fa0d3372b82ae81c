package graft.ops

import graft.SparkSpec

/** Result laws for q_join_outer (E2's full-outer completion) and
  * q_rank_fusion (E11's hybrid-retrieval combiner) — the semantic
  * properties the t2 hash match alone doesn't make explicit.
  */
class OuterFusionSpec extends SparkSpec {

  private def rows(name: String) =
    graft.SparkEntry.queries(name)(spark, sf0001).collect()

  test("q_join_outer: the full outer bites BOTH ways (all three statuses occur)") {
    val statuses = rows("q_join_outer").map(_.getAs[String]("status")).toSet
    assert(statuses == Set("new", "churned", "retained"),
      s"a one-sided corpus would never exercise outer-null handling: $statuses")
  }

  test("q_join_outer: status is exactly the zero pattern of the era counts") {
    rows("q_join_outer").foreach { r =>
      val (n95, n01) = (r.getAs[Long]("n_1995"), r.getAs[Long]("n_2001"))
      val expect =
        if (n95 == 0L) "new" else if (n01 == 0L) "churned" else "retained"
      assert(r.getAs[String]("status") == expect, s"row $r")
      assert(n95 > 0L || n01 > 0L, "a row with no orders in either era leaked in")
    }
  }

  test("q_join_outer: key set is the union of both eras, no duplicates") {
    val out = rows("q_join_outer").map(_.getAs[Long]("custkey")).toSeq
    assert(out.distinct.size == out.size)
    import org.apache.spark.sql.functions.{col, year}
    def era(y: Int) = Tables.orders(spark, sf0001)
      .where(year(col("o_orderdate")) === y)
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0)).toSet
    assert(out.toSet == (era(1995) ++ era(2001)))
  }

  test("q_rank_fusion: both retrievers' top-1 hits survive fusion") {
    val out = rows("q_rank_fusion")
    assert(out.exists(_.getAs[Int]("rank_dense") == 1), "dense top-1 lost")
    assert(out.exists(_.getAs[Int]("rank_lex") == 1), "lexical top-1 lost")
    // every fused row came from at least one retriever list
    assert(out.forall(r =>
      r.getAs[Int]("rank_dense") > 0 || r.getAs[Int]("rank_lex") > 0))
  }

  test("q_rank_fusion: rrf is the reciprocal-rank sum, descending, ≤ 2k rows") {
    val out = rows("q_rank_fusion")
    assert(out.length <= 40 && out.nonEmpty)
    out.foreach { r =>
      def term(rank: Int): Double = if (rank == 0) 0.0 else 1.0 / (60 + rank)
      val expect = BigDecimal(
        term(r.getAs[Int]("rank_dense")) + term(r.getAs[Int]("rank_lex"))
      ).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-9, s"row $r")
    }
    val scores = out.map(_.getAs[Double]("rrf")).toSeq
    assert(scores == scores.sorted.reverse, "fused list not rrf-descending")
  }

  test("q_rank_fusion: a dual-list doc outscores the same ranks taken singly") {
    val out = rows("q_rank_fusion")
    val dual = out.filter(r =>
      r.getAs[Int]("rank_dense") > 0 && r.getAs[Int]("rank_lex") > 0)
    // fusion's point: consensus beats either single list at equal rank
    dual.foreach { r =>
      val single = 1.0 / (60 + math.min(
        r.getAs[Int]("rank_dense"), r.getAs[Int]("rank_lex")))
      assert(r.getAs[Double]("rrf") > single - 1e-9)
    }
  }
}

package graft.ops

import graft.SparkSpec

/** ANN variants vs the exact brute-force baseline (promised by the
  * q_ann_lsh scaladoc): approximate results must be internally
  * consistent (true cosines, correctly ordered) and recall the planted
  * near neighbors.
  */
class AnnSpec extends SparkSpec {

  private def ids(name: String): Seq[Long] =
    graft.SparkEntry.queries(name)(spark, sf0001).collect().map(_.getLong(0)).toSeq

  test("q_ann_lsh: ≤5 rows, descending cos_sim, never the query vector") {
    val rows = graft.SparkEntry.queries("q_ann_lsh")(spark, sf0001).collect()
    assert(rows.length <= 5 && rows.nonEmpty)
    assert(rows.forall(_.getLong(0) != 0L))
    val sims = rows.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("q_ann_lsh recall: ≥3 of its 5 results are in the exact top-10") {
    val exact = ids("q_knn_cosine").toSet // top-10 brute force
    val lsh = ids("q_ann_lsh")
    assert(lsh.count(exact) >= 3, s"lsh=$lsh exact=$exact")
  }

  test("ivf recall curve: nondecreasing in nprobe, exact at nprobe=K") {
    val exactTop5 = ids("q_knn_cosine").take(5).toSet
    val recalls = Seq(1, 2, 4, 8).map { p =>
      val got = Similarity.ivfSearch(spark, sf0001, p).collect().map(_.getLong(0)).toSet
      p -> got.count(exactTop5).toDouble / exactTop5.size
    }
    // widening the probe set can only add candidates → recall is monotone
    recalls.sliding(2).foreach { case Seq((pa, ra), (pb, rb)) =>
      assert(rb >= ra, s"recall dropped from nprobe=$pa ($ra) to nprobe=$pb ($rb)")
    }
    // probing all 8 clusters IS the brute-force search
    assert(recalls.last._2 == 1.0, s"recalls=$recalls")
  }

  test("q_ann_ivf: results are a correctly-reranked subset of the corpus") {
    val rows = graft.SparkEntry.queries("q_ann_ivf")(spark, sf0001).collect()
    assert(rows.length == 5)
    val sims = rows.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
    // probing one cluster can only return true cosines: every value must
    // also appear in the exact all-corpus ranking at the same id
    val exact = graft.SparkEntry.queries("q_knn_cosine")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      exact.get(r.getLong(0)).foreach(c => assert(c == r.getDouble(1)))
    }
  }
}

package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The IVF codebook trainer: deterministic, objective-improving, and
  * the committed frozen literal IS its output on the training set.
  */
class KMeansSpec extends SparkSpec {

  private def vecsAt(d: String): Array[Array[Double]] =
    Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .orderBy("vec_id")
      .collect()
      .map(_.getSeq[Double](1).toArray)

  test("training is bit-deterministic") {
    val vecs = vecsAt(sf0001)
    val a = IvfCodebook.train(vecs)
    val b = IvfCodebook.train(vecs)
    assert(a.length == IvfCodebook.K)
    assert(a.zip(b).forall { case (x, y) => x.sameElements(y) })
  }

  test("trained codebook beats the vec_id<8 stand-in on the k-means objective") {
    val vecs = vecsAt(sf0001)
    val standIn = vecs.take(IvfCodebook.K)
    val trained = IvfCodebook.quantize(IvfCodebook.train(vecs))
    val before = IvfCodebook.inertia(vecs, standIn)
    val after = IvfCodebook.inertia(vecs, trained)
    assert(after < before * 0.8, s"inertia $before -> $after")
  }

  test("Lloyd rounds never increase the objective (monotone improvement)") {
    val vecs = vecsAt(sf0001)
    val inertias = (0 to 6 by 2).map(it =>
      IvfCodebook.inertia(vecs, IvfCodebook.train(vecs, iters = it)))
    inertias.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"objective rose across rounds: $inertias")
    }
  }

  test("the frozen literal is exactly the trainer's output on sf0.01 (regression)") {
    val vecs = vecsAt("/root/testdata/sf0.01")
    val retrained = IvfCodebook.quantize(IvfCodebook.train(vecs))
    assert(IvfCodebook.render(retrained) == IvfCodebook.render(IvfCodebook.centroids),
      "IvfCodebook.FROZEN is stale — regenerate with TrainIvfCodebook")
  }

  test("the frozen PQ books are exactly the trainer's output on sf0.01 (regression)") {
    val vecs = vecsAt("/root/testdata/sf0.01")
    val retrained = PqCodebook.train(vecs)
    assert(PqCodebook.render(retrained) == PqCodebook.render(PqCodebook.books),
      "PqCodebook.FROZEN is stale — regenerate with TrainPqCodebook")
    assert(PqCodebook.books.length == PqCodebook.M &&
      PqCodebook.books.forall(b => b.length == PqCodebook.Kpq &&
        b.forall(_.length == PqCodebook.SubDim)))
  }

  test("per-subspace PQ training beats the first-Kpq stand-in on quantization error") {
    val vecs = vecsAt("/root/testdata/sf0.01")
    val trained = PqCodebook.train(vecs)
    val (before, after) = (0 until PqCodebook.M).map { m =>
      val sliced = vecs.map(_.slice(m * PqCodebook.SubDim, (m + 1) * PqCodebook.SubDim))
      (IvfCodebook.inertia(sliced, sliced.take(PqCodebook.Kpq)),
        IvfCodebook.inertia(sliced, trained(m)))
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(after < before * 0.8, s"PQ quantization error $before -> $after")
  }

  test("q_kmeans (distributed Lloyd): inertia non-increasing round over round") {
    // the Lloyd law on the DISTRIBUTED trainer: each assign+update pair
    // can only lower the k-means objective (up to the 1e-6 centroid
    // rounding, bounded here by a generous epsilon)
    val vecs = Tables.embeddings(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding").cast("array<double>"))
      .orderBy("vec_id").collect()
      .map(_.getSeq[Double](1).toArray)
    val (c1, c2) = Similarity.kmeansRounds(spark, sf0001)
    val i0 = IvfCodebook.inertia(vecs, IvfCodebook.centroids)
    val i1 = IvfCodebook.inertia(vecs, c1)
    val i2 = IvfCodebook.inertia(vecs, c2)
    val eps = 1e-3 * i0
    assert(i1 <= i0 + eps, s"round 1 raised inertia: $i0 -> $i1")
    assert(i2 <= i1 + eps, s"round 2 raised inertia: $i1 -> $i2")
  }

  test("quantize round-trips through render/parse unchanged") {
    val c = IvfCodebook.centroids
    assert(IvfCodebook.parse(IvfCodebook.render(c)).zip(c)
      .forall { case (x, y) => x.sameElements(y) })
  }
}

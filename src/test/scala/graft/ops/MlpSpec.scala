package graft.ops

import graft.SparkSpec

/** The q_mlp_score contract (promised by its scaladoc): the frozen
  * integer MLP the QUERY computes as explode → one 8-sum aggregate →
  * output projection must equal a plain-Scala re-derivation of the same
  * network run directly on the raw document text — hashing trick,
  * hidden layer, ReLU, output combination all re-implemented here with
  * loops and BigInt-free Long arithmetic, sharing NOTHING with the
  * Spark plan but the weight formulas. A drift in the featurizer
  * (md5 prefix width, bucket modulus), the weight formulas, or the
  * layer wiring fails this even when both SQL dialects drift together.
  */
class MlpSpec extends SparkSpec {

  /** The one place the frozen formulas exist in this spec — deliberately
    * re-typed from the q_mlp_score scaladoc, not imported from the
    * production code.
    */
  private def w1(b: Long, j: Int): Long = (b * 13 + j * 5) % 7 - 3
  private def b1(j: Int): Long = j % 3 - 1
  private def w2(j: Int): Long = (j * 3) % 5 - 2

  private def bucket(term: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    val hex = md.take(2).map("%02x".format(_)).mkString // first 4 hex digits
    java.lang.Long.parseLong(hex, 16) % 64
  }

  private def scoreText(text: String): Long = {
    val buckets = text.split(" ", -1).map(bucket)
    (0 until 8).map { j =>
      val pre = buckets.map(b => w1(b, j)).sum + b1(j)
      math.max(0L, pre) * w2(j)
    }.sum
  }

  test("q_mlp_score equals a plain-Scala re-derivation from raw text") {
    val raw = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = graft.SparkEntry.queries("q_mlp_score")(spark, sf0001).collect()
    assert(got.length == raw.size, "one score row per document")
    got.foreach { r =>
      val (id, score, accept) = (r.getLong(0), r.getLong(1), r.getBoolean(2))
      val expect = scoreText(raw(id))
      assert(score == expect, s"doc $id: engine=$score scala=$expect")
      assert(accept == (expect > 0), s"doc $id: accept flag drifted")
    }
  }

  test("score distribution is non-degenerate: both accept values occur") {
    // a weight-formula sign error typically collapses every score to
    // one side of 0; the fixture corpus must exercise both branches
    val flags = graft.SparkEntry.queries("q_mlp_score")(spark, sf0001)
      .collect().map(_.getBoolean(2)).toSet
    assert(flags == Set(true, false), s"degenerate accept distribution: $flags")
  }
}

package graft.ops

import graft.SparkSpec

/** Cross-validation of the three similarity-dedup candidate generators
  * (promised by the Dedup scaladoc): q_dedup_ngram is the exact
  * all-candidates ground truth; MinHash must find the same final pair
  * set on this corpus (J ≥ 0.97 for every true pair → band collision is
  * certain); SimHash is a verified SUBSET with measured recall.
  */
class DedupSpec extends SparkSpec {

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntryPairs(name, spark, sf0001)

  private object SparkEntryPairs {
    def apply(name: String, s: org.apache.spark.sql.SparkSession, d: String): Set[(Long, Long)] =
      graft.SparkEntry.queries(name)(s, d)
        .select("a_id", "b_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
  }

  test("minhash+LSH finds exactly the brute-force pair set") {
    val exact = pairs("q_dedup_ngram")
    val mh = pairs("q_dedup_minhash")
    assert(exact.nonEmpty)
    assert(mh == exact)
  }

  test("simhash candidates are a subset with recall ≥ 0.5 on this corpus") {
    val exact = pairs("q_dedup_ngram")
    val sh = pairs("q_dedup_simhash")
    assert(sh.subsetOf(exact), s"simhash produced non-duplicate pairs: ${sh -- exact}")
    val recall = sh.size.toDouble / exact.size
    assert(recall >= 0.5, s"simhash recall $recall")
  }

  test("exact dedup survivor rule: lowest doc_id kept, copies counted") {
    val docs = Tables.documents(spark, sf0001)
    val total = docs.count()
    val res = Dedup.qDedupExact.fn(spark, sf0001)
    assert(res.select(org.apache.spark.sql.functions.sum("n_copies")).head.getLong(0) == total)
  }
}

package graft.ops

import graft.SparkSpec

/** Every stage of q_curation_pipeline must BITE on a corpus crafted to
  * exercise it (the driver corpus has no exact duplicates, so stage 2
  * is only oracle-verified as a pass-through there):
  *   gate drops short/stopword-free docs, dedup keeps the lowest-id
  *   copy, split assignment follows the Knuth hash, and a train doc
  *   sharing an 8-gram with a test doc is decontaminated away.
  */
class CurationSpec extends SparkSpec {

  test("all four pipeline stages fire on the crafted corpus") {
    import spark.implicits._
    // split buckets (Knuth hash): 11 -> test, 22 -> val, others train
    val p = "alpha beta gamma delta epsilon zeta eta theta" // shared 8-gram
    val docs = Seq(
      1L -> "the quick brown fox jumps over lazy dogs while rain falls softly today",
      2L -> "a calm river flows past the old mill near quiet village homes",
      3L -> s"we flag $p and more items", // train, contaminated by 11
      4L -> "too short of text", // gate: < 12 tokens
      5L -> "a calm river flows past the old mill near quiet village homes", // dup of 2
      6L -> "twelve unique tokens without stop words appear here in this line now", // gate: no stopword
      11L -> s"records show $p of interest here", // test split
      22L -> "validation documents carry a steady flow of simple words for testing purposes" // val
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-curation").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = graft.SparkEntry.queries("q_curation_pipeline")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

    assert(got == Seq(
      (1L, "train", 13L), // unique, clean
      (2L, "train", 12L), // dedup survivor (lowest id of {2,5})
      (11L, "test", 13L), // test doc is never dropped by decontamination
      (22L, "val", 12L)
    ), s"pipeline output was $got")
  }

  test("q_domain_filter: blocklist bites, and exactly on the 30% short-doc rule") {
    val docs = Tables.documents(spark, sf0001)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySource = docs.groupBy(_._1).view.mapValues { rows =>
      (rows.length.toLong, rows.count(_._3 < 200).toLong)
    }.toMap
    val expectedBlocked = bySource.collect {
      case (src, (n, short)) if short * 10 > n * 3 => src
    }.toSet

    val kept = graft.SparkEntry.queries("q_domain_filter")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val keptSources = kept.map(_._2).toSet

    // the rule must BITE both ways on this corpus: some sources die,
    // some survive — otherwise the query degenerates to a no-op/empty
    assert(expectedBlocked.nonEmpty && expectedBlocked.size < bySource.size)
    assert(keptSources == (bySource.keySet -- expectedBlocked))
    // survivors keep EVERY doc of their source (the filter is by
    // provenance, never by row)
    val expectedKept = docs.collect {
      case (src, id, _) if !expectedBlocked(src) => (id, src)
    }.sortBy(_._1).toSeq
    assert(kept == expectedKept)
  }

  test("q_nucleus_sources: core is the MINIMAL count-ranked prefix reaching 90% coverage") {
    val rows = graft.SparkEntry.queries("q_nucleus_sources")(spark, sf0001)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("cnt"), r.getAs[Long]("total"), r.getAs[Boolean]("core")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val total = rs.head._4
      assert(rs.forall(_._4 == total), s"$lang: inconsistent totals")
      assert(rs.map(_._3).sum == total, s"$lang: counts don't sum to total")
      // walk sources in nucleus rank order (cnt desc, source asc)
      val ranked = rs.sortBy(r => (-r._3, r._2))
      val coreCnt = ranked.filter(_._5).map(_._3).sum
      assert(coreCnt * 10 >= total * 9, s"$lang: core fails to cover 90%")
      // minimality: dropping the LAST core source must fall below 90%
      val coreRanked = ranked.filter(_._5)
      assert((coreCnt - coreRanked.last._3) * 10 < total * 9,
        s"$lang: core prefix is not minimal")
      // core is a PREFIX of the ranking: no tail source precedes a core one
      val flags = ranked.map(_._5).toSeq
      assert(flags == flags.sortBy(!_), s"$lang: core is not a rank prefix")
      // the rule must BITE on this corpus: at least one lang has a tail
    }
    assert(rows.exists(!_._5), "no tail source anywhere — threshold never bites")
  }
}

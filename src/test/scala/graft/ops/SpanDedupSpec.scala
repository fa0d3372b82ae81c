package graft.ops

import graft.SparkSpec

/** Ground-truth cross-validation of the two model/span curation ops
  * added in round 4: each is recomputed by an independent brute-force
  * driver-side implementation over the collected sf0.001 corpus and
  * compared row-for-row — the DedupSpec discipline (the oracle checks
  * engine-vs-DuckDB; this checks engine-vs-specification).
  */
class SpanDedupSpec extends SparkSpec {

  private val K = 8

  test("q_substring_dedup matches a brute-force keep-first span removal") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // pass 1: global first occurrence of every K-gram, in (doc, pos) order
    val first = scala.collection.mutable.Map[String, (Long, Int)]()
    for ((id, text) <- docs) {
      val w = text.split(" ", -1)
      for (i <- 0 to w.length - K) {
        val g = w.slice(i, i + K).mkString(" ")
        if (!first.contains(g)) first(g) = (id, i)
      }
    }
    // pass 2: drop tokens covered by any non-first duplicated window
    val expected = docs.map { case (id, text) =>
      val w = text.split(" ", -1)
      val covered = Array.fill(w.length)(false)
      for (i <- 0 to w.length - K) {
        val g = w.slice(i, i + K).mkString(" ")
        if (first(g) != ((id, i))) (i until i + K).foreach(covered(_) = true)
      }
      val kept = w.indices.filterNot(covered).map(w)
      (id, w.length, w.length - kept.length, kept.mkString(" "))
    }.toSeq
    val got = graft.SparkEntry.queries("q_substring_dedup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(got == expected)
    assert(expected.exists(_._3 > 0), "corpus must actually exercise span removal")
    assert(expected.exists(_._3 == 0), "first occurrences must survive untouched")
  }

  test("q_substring_dedup: first occurrence of every duplicated span keeps its text") {
    // any doc whose windows are all global-first must be byte-identical
    val res = graft.SparkEntry.queries("q_substring_dedup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    val original = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val untouched = original.filter { case (id, text) => res(id) == text }
    assert(untouched.nonEmpty, "some doc must be fully first-occurrence")
  }

  test("q_quality_classifier matches a brute-force linear-model recompute") {
    val vocab = Quality.VOCAB.toMap
    val expected = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      .map { case (id, text) =>
        val hits = text.split(" ", -1).flatMap(vocab.get)
        val score = hits.map(_.toLong).sum + Quality.BIAS_MILLI
        (id, hits.length.toLong, score, score >= 0)
      }.toSeq
    val got = graft.SparkEntry.queries("q_quality_classifier")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == expected)
    assert(expected.exists(_._4) && expected.exists(!_._4),
      "the frozen model must separate the corpus into both classes")
  }
}

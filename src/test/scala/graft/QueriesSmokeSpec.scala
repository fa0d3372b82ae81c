package graft

/** Every declared query executes at sf0.001 and returns a stable,
  * deterministically-ordered result (SURVEY §5.2 item 1: smoke tier).
  * Correctness against DuckDB is the driver's t2 gate; this spec catches
  * analysis errors, nondeterminism, and empty-result regressions early.
  */
class QueriesSmokeSpec extends SparkSpec {

  // Queries whose result is legitimately data-dependent-small; everything
  // else must return >0 rows at sf0.001.
  private val mayBeEmpty = Set("q_dedup_simhash", "q_pairwise_near", "q_cosine_near")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and is deterministic at sf0.001") {
      val df1 = fn(spark, sf0001)
      val r1 = df1.collect()
      if (!mayBeEmpty(name)) assert(r1.nonEmpty, s"$name returned 0 rows")
      // run twice — identical bytes in identical order (t2 hashes depend on it)
      val r2 = fn(spark, sf0001).collect()
      assert(r1.toSeq == r2.toSeq, s"$name nondeterministic")
    }
  }

  test("entry flagship returns >0 rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key is a declared query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}

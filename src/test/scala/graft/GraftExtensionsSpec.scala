package graft

/** The SQL function surface registered by [[GraftExtensions]]: native
  * codegen expressions reachable from pure SQL (not interpreted UDFs).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("graft_dot / graft_sqdist evaluate from SQL") {
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                graft_sqdist(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS s"""
    ).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 8.0)
  }

  test("graft_shingle_hashes + graft_intersect_count compose in SQL") {
    val r = spark.sql(
      """SELECT graft_intersect_count(
                  graft_shingle_hashes('a b c d', 3),
                  graft_shingle_hashes('a b c e', 3)) AS shared,
                size(graft_shingles('a b c d', 3)) AS n"""
    ).head()
    assert(r.getInt(0) == 1) // only "a b c" shared
    assert(r.getInt(1) == 2) // "a b c", "b c d"
  }

  test("graft_lcs evaluates from SQL (the ROUGE-L primitive, codegen path)") {
    val r = spark.sql(
      """SELECT graft_lcs('a b c b d a b', 'b d c a b a') AS l,
                graft_lcs('x y', 'p q') AS none,
                graft_lcs('same same', 'same same') AS self"""
    ).head()
    assert(r.getLong(0) == 4L)
    assert(r.getLong(1) == 0L)
    assert(r.getLong(2) == 2L)
  }

  test("graft_gram_stats evaluates from SQL: [total, top, distinct]") {
    val r = spark.sql(
      "SELECT graft_gram_stats('a b a b a b', 2) AS s"
    ).head().getSeq[Int](0)
    assert(r == Seq(5, 3, 2)) // 5 bigrams, "a b"×3, 2 distinct
  }

  test("graft_explode_shingles (UDTF): LATERAL VIEW rows == explode(graft_shingles)") {
    spark.sql("SELECT 'a b c d' AS text UNION ALL SELECT 'x y' UNION ALL SELECT 'p'")
      .createOrReplaceTempView("udtf_probe")
    val viaUdtf = spark.sql(
      """SELECT text, shingle
         FROM udtf_probe LATERAL VIEW graft_explode_shingles(text, 2) t AS shingle"""
    ).collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val viaExplode = spark.sql(
      """SELECT text, shingle
         FROM udtf_probe LATERAL VIEW explode(graft_shingles(text, 2)) t AS shingle"""
    ).collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(viaUdtf == viaExplode)
    assert(viaUdtf == Seq(("a b c d", "a b"), ("a b c d", "b c"), ("a b c d", "c d"),
      ("x y", "x y")).sorted, "sub-width docs generate zero rows, not nulls")
  }

  test("non-literal shingle width is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles('a b c', 1 + 2)").head()
    }
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("graft_shingles"))
  }
}

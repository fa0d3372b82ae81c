package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Hash/shingle primitives for the dedup family (SURVEY §2.C E10/E11).
  * Everything here is deterministic given fixed seeds — dedup outputs
  * must be reproducible run-to-run and cluster-layout-independent.
  */
object TextHash {

  /** Word n-gram shingles of a text column as a distinct string array.
    * Custom codegen expression ([[WordShingles]]) — runs inside the scan
    * stage's whole-stage codegen; at 100 TB this is the map side of
    * every dedup shuffle.
    */
  def shingles(text: Column, n: Int = 3): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      WordShingles(org.apache.spark.sql.graft.ColumnBridge.expression(text), n)
    )

  /** Shingles as 61-bit rolling hashes (`array<long>`) — for pair
    * verification where `array_intersect` on longs beats strings.
    */
  def shingleHashes(text: Column, n: Int = 3): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      WordShingleHashes(org.apache.spark.sql.graft.ColumnBridge.expression(text), n)
    )

  /** T5-style span corruption of a text column given a per-doc phase
    * column — one codegen pass emitting the whole
    * `(n_masked, corrupted, targets)` struct ([[SpanCorrupt]]).
    */
  def spanCorrupt(text: Column, off: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SpanCorrupt(
        org.apache.spark.sql.graft.ColumnBridge.expression(text),
        org.apache.spark.sql.graft.ColumnBridge.expression(off))
    )

  /** Token-level LCS length of two text columns — the ROUGE-L
    * primitive, one codegen DP pass per pair ([[LcsLength]]).
    */
  def lcsLen(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      LcsLength(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b))
    )

  /** |A ∩ B| of two sorted distinct `array<long>` columns (the
    * [[shingleHashes]] contract) — codegen merge loop, no per-pair
    * allocation ([[SortedLongIntersectCount]]).
    */
  def intersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SortedLongIntersectCount(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)
      )
    )

  /** Per-doc n-gram repetition stats `[total, top, distinct]` — one
    * codegen counting pass (backs q_repetition; see [[WordGramStats]]).
    */
  def gramStats(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      WordGramStats(org.apache.spark.sql.graft.ColumnBridge.expression(text), n)
    )

  /** MinHash signature column i: min over exploded shingles of a seeded
    * 64-bit hash. Seeding via an extra lit column re-keys xxhash64 —
    * k independent-enough permutation approximations.
    */
  def minhashCol(shingle: Column, seed: Int): Column =
    min(xxhash64(lit(seed), shingle))

  /** Polynomial rolling hash over a string (base-31 mod 2^61-1) — the
    * classic Rabin-Karp fingerprint. Pure Scala; exercised via UDF +
    * unit tests (not ANSI-SQL-expressible, so not in the oracle set).
    */
  def rollingHash(s: String): Long = {
    val M = (1L << 61) - 1
    def mod(x: Long): Long = { val v = (x >>> 61) + (x & M); if (v >= M) v - M else v }
    var h = 0L
    var i = 0
    while (i < s.length) {
      // 31h splits as hi*2^64 + lo; 2^64 ≡ 8 (mod 2^61-1)
      val hi = Math.multiplyHigh(h, 31L)
      val lo = h * 31L
      h = mod(mod(hi * 8 + mod(lo)) + s.charAt(i).toLong)
      i += 1
    }
    h
  }

  /** SimHash: 64-bit signature where bit j is the sign of the sum over
    * shingle hashes of (+1 / -1) depending on that hash's bit j.
    * Typed `Aggregator` (UDAF surface, SURVEY §2.C note): partial
    * buffers are per-bit counters → merge is commutative+associative,
    * so the result is partition-layout independent.
    */
  object SimHashAgg extends Aggregator[Long, Array[Int], Long] {
    def zero: Array[Int] = new Array[Int](64)
    def reduce(buf: Array[Int], hash: Long): Array[Int] = {
      var j = 0
      while (j < 64) {
        if (((hash >>> j) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1
        j += 1
      }
      buf
    }
    def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var j = 0
      while (j < 64) { a(j) += b(j); j += 1 }
      a
    }
    def finish(buf: Array[Int]): Long = {
      var sig = 0L
      var j = 0
      while (j < 64) {
        if (buf(j) > 0) sig |= (1L << j)
        j += 1
      }
      sig
    }
    def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b))
}

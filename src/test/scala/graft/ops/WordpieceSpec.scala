package graft.ops

import graft.SparkSpec

/** WordPiece (Schuster & Nakajima 2012; BERT) — the third tokenizer
  * family: likelihood-scored merges + greedy maximum-munch encode.
  * Both declared queries are re-derived driver-side from the raw
  * documents, independently of every Spark/DataFrame mechanism the
  * engine uses, and compared exactly.
  */
class WordpieceSpec extends SparkSpec {

  private val RS = '\u001e'
  private val Scale = 1L << 20
  private val Merges = 6
  private val LMax = 8

  /** (word → freq) over the capped whitespace words — the trainer's world. */
  private def wordCounts(): Map[String, Long] = {
    val docs = Tables.documents(spark, sf0001).select("text").collect().map(_.getString(0))
    val m = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach(_.split(" ").filter(w => w.nonEmpty && w.length <= LMax)
      .foreach(w => m.update(w, m.getOrElse(w, 0L) + 1L)))
    m.toMap
  }

  /** Greedy-leftmost non-overlapping fuse of adjacent (a, b) — the
    * vector-level twin of the engine's string rewrite (whose
    * equivalence to greedy-leftmost VocabSpec's ScalaCheck sweep pins).
    */
  private def mergeOnce(t: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < t.length) {
      if (i + 1 < t.length && t(i) == a && t(i + 1) == b) {
        out += s"$a$RS$b"; i += 2
      } else { out += t(i); i += 1 }
    }
    out.result()
  }

  /** The full brute-force trainer: per-round weighted pair/symbol
    * counts, quantized-integer likelihood score, (pa, pb) tiebreak.
    * Returns the 6 winners as (pa, pb, freq, score) in symbol form.
    */
  private def bruteTrain(words: Map[String, Long]): Seq[(String, String, Long, Long)] = {
    var seqs: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges = Seq.newBuilder[(String, String, Long, Long)]
    for (_ <- 1 to Merges) {
      val pair = scala.collection.mutable.Map.empty[(String, String), Long]
      val sym = scala.collection.mutable.Map.empty[String, Long]
      seqs.foreach { case (t, f) =>
        t.foreach(s => sym.update(s, sym.getOrElse(s, 0L) + f))
        var i = 0
        while (i + 1 < t.length) {
          val k = (t(i), t(i + 1))
          pair.update(k, pair.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      // a corpus this small can run out of adjacent pairs before the
      // merge budget (the declared corpora never do)
      if (pair.isEmpty) return merges.result()
      val best = pair.toSeq
        .map { case ((a, b), fr) => (a, b, fr, fr * Scale / (sym(a) * sym(b))) }
        .sortBy { case (a, b, _, sc) => (-sc, a, b) }
        .head
      merges += best
      seqs = seqs.map { case (t, f) => (mergeOnce(t, best._1, best._2), f) }
    }
    merges.result()
  }

  test("q_wordpiece_train equals the driver-side likelihood-merge re-derivation at sf0.001") {
    val expected = bruteTrain(wordCounts())
    val got = Vocab.qWordpieceTrain.fn(spark, sf0001).collect()
    assert(got.length == Merges)
    got.zip(expected).zipWithIndex.foreach { case ((r, (pa, pb, freq, score)), i) =>
      assert(r.getInt(0) == i + 1)
      assert(r.getString(1) == pa.replace(RS, ' '), s"round ${i + 1} lhs")
      assert(r.getString(2) == pb.replace(RS, ' '), s"round ${i + 1} rhs")
      assert(r.getLong(3) == freq, s"round ${i + 1} freq")
      assert(r.getLong(4) == score, s"round ${i + 1} score")
    }
  }

  test("q_wordpiece_apply equals the driver-side maximum-munch encode at sf0.001") {
    val words = wordCounts()
    val merges = bruteTrain(words)
    val vocab: Set[String] =
      words.keysIterator.flatMap(_.map(_.toString)).toSet ++
        merges.map { case (a, b, _, _) => (a + b).filterNot(_ == RS) }
    def munch(w: String): Long = {
      var pos = 0
      var n = 0L
      while (pos < w.length) {
        val l = (w.length - pos to 1 by -1)
          .find(len => vocab.contains(w.substring(pos, pos + len)))
          .getOrElse(sys.error(s"unsegmentable word $w — single chars must be in vocab"))
        pos += l; n += 1
      }
      n
    }
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Vocab.qWordpieceApply.fn(spark, sf0001).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val ws = docs(r.getLong(0)).split(" ").filter(_.nonEmpty)
      val nTokens = ws.map(w => if (w.length <= LMax) munch(w) else w.length.toLong).sum
      assert(r.getLong(1) == ws.length.toLong, s"doc ${r.getLong(0)} n_words")
      assert(r.getLong(2) == nTokens, s"doc ${r.getLong(0)} n_tokens")
    }
  }

  test("the likelihood argmax differs from the raw-frequency argmax on a crafted corpus") {
    // pair (q,z): freq 4 over q:4, z:4 -> score 4/16 = 0.25; the
    // freq-45 pairs (x,a)/(b,y) score only 45/2250 = 0.02. WordPiece
    // must pick the rare-but-predictive (q,z); frequency-ranked BPE
    // would pick a freq-45 pair.
    val words = Map(
      "xy" -> 5L, "xa" -> 45L, "by" -> 45L, // x:50, y:50, a:45, b:45
      "qz" -> 4L) // q:4, z:4, pair (q,z):4
    val first = bruteTrain(words).head
    assert((first._1, first._2) == (("q", "z")),
      s"likelihood criterion must beat raw frequency, picked ${(first._1, first._2)}")
  }
}

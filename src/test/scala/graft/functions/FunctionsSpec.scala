package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

/** Unit specs for the custom expression/hash primitives. */
class FunctionsSpec extends AnyFunSuite {

  test("rollingHash is deterministic and order-sensitive") {
    val h1 = TextHash.rollingHash("the quick brown fox")
    assert(h1 == TextHash.rollingHash("the quick brown fox"))
    assert(h1 != TextHash.rollingHash("quick the brown fox"))
    assert(TextHash.rollingHash("") == 0L)
    // stays within the Mersenne modulus 2^61-1
    val big = TextHash.rollingHash("x" * 10000)
    assert(big >= 0L && big < (1L << 61) - 1)
  }

  test("rollingHash matches a naive BigInt mod implementation") {
    val M = BigInt((1L << 61) - 1)
    def naive(s: String): Long =
      s.foldLeft(BigInt(0))((h, c) => (h * 31 + c.toInt) % M).toLong
    for (s <- Seq("a", "ab", "hello world", "ÿüñ", "x" * 500))
      assert(TextHash.rollingHash(s) == naive(s), s"mismatch for '$s'")
  }

  test("ShingleUtil matches a naive sliding-window implementation") {
    def naive(text: String, n: Int): Seq[String] =
      text.split(" ", -1).toSeq.sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).distinct.toSeq
    for (
      t <- Seq(
        "a b c d e",
        "a b a b a b",
        "one two",
        "",
        "  double  spaces here ",
        "exactly three words"
      )
    ) {
      val got = ShingleUtil
        .shingles(UTF8String.fromString(t), 3)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString)
        .toSeq
      assert(got == naive(t, 3), s"mismatch for '$t'")
    }
  }

  test("gramStats matches naive [total, top, distinct] counting") {
    def naive(text: String, n: Int): Seq[Int] = {
      val grams = text.split(" ", -1).toSeq.sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSeq
      if (grams.isEmpty) Seq(0, 0, 0)
      else Seq(grams.size, grams.groupBy(identity).values.map(_.size).max,
        grams.distinct.size)
    }
    for (
      t <- Seq(
        "a b c d e",
        "a b a b a b", // tied + repeated grams
        "one two",     // below n=3, exactly n=2
        "one",         // below both
        "",
        "  double  spaces here ",
        "x x x x x x x x" // one gram dominates
      );
      n <- Seq(2, 3)
    ) {
      val got = ShingleUtil
        .gramStats(UTF8String.fromString(t), n)
        .toIntArray()
        .toSeq
      assert(got == naive(t, n), s"mismatch for '$t' n=$n: $got")
    }
  }

  test("LcsUtil matches the full-matrix reference DP (edges + seeded random)") {
    // textbook O(n·m) full matrix — the independent reference
    def ref(a: String, b: String): Long = {
      val x = a.split(" ", -1); val y = b.split(" ", -1)
      val m = Array.ofDim[Int](x.length + 1, y.length + 1)
      for (i <- 1 to x.length; j <- 1 to y.length)
        m(i)(j) =
          if (x(i - 1) == y(j - 1)) m(i - 1)(j - 1) + 1
          else math.max(m(i - 1)(j), m(i)(j - 1))
      m(x.length)(y.length).toLong
    }
    def lcs(a: String, b: String): Long =
      LcsUtil.lcs(UTF8String.fromString(a), UTF8String.fromString(b))
    val edges = Seq(
      ("a b c b d a b", "b d c a b a"), // classic, multiple optima
      ("", ""),                         // empty splits to [""] — LCS 1
      ("a", ""), ("", "a"),
      ("x x x", "x x x x"),             // repeats
      ("a b c", "c b a"),               // reversal
      (" lead", "lead "),               // empty-token edges
      ("same same", "same same"))
    edges.foreach { case (a, b) =>
      assert(lcs(a, b) == ref(a, b), s"edge mismatch for ('$a','$b')")
      // laws: symmetry, bound by min length, identity = own length
      assert(lcs(a, b) == lcs(b, a), s"asymmetric for ('$a','$b')")
      assert(lcs(a, a) == a.split(" ", -1).length)
    }
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "dog", "cat", "")
    (1 to 200).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val b = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      assert(lcs(a, b) == ref(a, b), s"random mismatch for ('$a','$b')")
    }
  }
}

/** Codegen expressions must equal their interpreted/naive references —
  * evaluated THROUGH Spark (so the generated Java runs, not just the
  * Scala eval path).
  */
class VectorExprsSparkSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("DotProduct / SquaredDistance == zip_with+aggregate folds") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(100)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)
    ))
    val df = rows.toDF("a", "b")
    val got = df.select(
      VectorExprs.dot(col("a"), col("b")).as("dot"),
      VectorExprs.sqDist(col("a"), col("b")).as("sq"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("dot_ref"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x).as("sq_ref")
    ).collect()
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(2)) // bitwise: same fold order
      assert(r.getDouble(1) == r.getDouble(3))
    }
  }

  test("WordShingles through Spark == the old HOF formulation") {
    import spark.implicits._
    val texts = graft.ops.Tables.documents(spark, sf0001)
      .select("text").as[String].take(200).toSeq
    val df = texts.toDF("text")
    val w = split(col("text"), " ")
    val hof = when(
      size(w) >= 3,
      array_distinct(transform(
        sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))
      ))
    ).otherwise(array().cast("array<string>"))
    val rows = df.select(
      TextHash.shingles(col("text"), 3).as("got"),
      hof.as("ref")
    ).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("SpanCorrupt through Spark == the r9 HOF formulation (incl. empty-token and short-doc edges)") {
    import spark.implicits._
    // corpus rows + adversarial edges: empty text, doc shorter than a
    // grid period, consecutive spaces (empty join elements), doc
    // starting mid-span (p = 0 with 0 < (p+off) % 7 < 3)
    val texts = graft.ops.Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].take(150).toSeq ++
      Seq((10007L, ""), (10008L, "one"), (10009L, "a  b   c d"),
        (10010L, "w1 w2 w3 w4 w5 w6 w7 w8"), (10001L, "x y"), (10002L, "p q r s"))
    val df = texts.toDF("doc_id", "text")
      .withColumn("w", split(col("text"), " "))
      .withColumn("off",
        pmod(pmod(col("doc_id"), lit(2147483647L)) * lit(2654435761L),
          lit(4294967296L)).mod(lit(7L)))
    val rows = df.select(
      TextHash.spanCorrupt(col("text"), col("off")).as("got"),
      expr("size(filter(sequence(0, size(w) - 1), p -> (p + off) % 7 < 3))")
        .cast("long").as("ref_n"),
      expr("""concat_ws(' ', flatten(transform(sequence(0, size(w) - 1),
                p -> CASE
                  WHEN (p + off) % 7 >= 3 THEN array(element_at(w, p + 1))
                  WHEN (p + off) % 7 = 0 OR p = 0
                    THEN array(concat('<X', CAST((p + off) DIV 7 AS STRING), '>'))
                  ELSE array()
                END)))""").as("ref_c"),
      expr("""concat_ws(' ', flatten(transform(sequence(0, size(w) - 1),
                p -> CASE
                  WHEN (p + off) % 7 >= 3 THEN array()
                  WHEN (p + off) % 7 = 0 OR p = 0
                    THEN array(concat('<X', CAST((p + off) DIV 7 AS STRING), '>'),
                               element_at(w, p + 1))
                  ELSE array(element_at(w, p + 1))
                END)))""").as("ref_t")
    ).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val got = r.getStruct(0)
      assert(got.getLong(0) == r.getLong(1), "n_masked drifted from the HOF chain")
      assert(got.getString(1) == r.getString(2), "corrupted drifted from the HOF chain")
      assert(got.getString(2) == r.getString(3), "targets drifted from the HOF chain")
    }
  }

  test("intersectCount over shingle hashes == size(array_intersect)") {
    import spark.implicits._
    val docs = graft.ops.Tables.documents(spark, sf0001).limit(60)
      .select(col("doc_id"), TextHash.shingleHashes(col("text"), 3).as("sh"))
    val pairs = docs.as("a")
      .crossJoin(docs.select(col("doc_id").as("b_id"), col("sh").as("shb")).as("b"))
      .select(
        TextHash.intersectCount(col("sh"), col("shb")).as("got"),
        size(array_intersect(col("sh"), col("shb"))).as("ref")
      ).as[(Int, Int)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (got, ref) => assert(got == ref) }
  }

  test("shingleHashes output is sorted ascending and distinct") {
    import spark.implicits._
    val rows = graft.ops.Tables.documents(spark, sf0001).limit(100)
      .select(TextHash.shingleHashes(col("text"), 3)).as[Seq[Long]].collect()
    rows.foreach { sh =>
      assert(sh == sh.sorted, "sorted contract violated")
      assert(sh.distinct.size == sh.size, "distinct contract violated")
    }
  }

  test("UlmSegmentUtil matches a spec-local reference DP (edges + seeded random)") {
    // independent re-derivation of the Viterbi recurrence over plain
    // Strings: f(0)=0, f(i) = max over j of f(j) + w(word[j..i)), ties
    // toward the SMALLEST j; None when position n is unreachable
    def ref(word: String, w: Map[String, Long]): Option[List[String]] = {
      val n = word.length
      val score = new Array[Long](n + 1)
      val from = Array.fill(n + 1)(-1); from(0) = 0
      for (i <- 1 to n) {
        var best = Long.MinValue; var bj = -1
        for (j <- 0 until i if from(j) >= 0)
          w.get(word.substring(j, i)).foreach { wt =>
            val sc = score(j) + wt
            if (sc > best) { best = sc; bj = j }
          }
        score(i) = best; from(i) = bj
      }
      if (from(n) < 0) None
      else {
        var p = n; var acc = List.empty[String]
        while (p > 0) { acc = word.substring(from(p), p) :: acc; p = from(p) }
        Some(acc)
      }
    }
    def model(w: Map[String, Long]): UlmModel = {
      val h = new java.util.HashMap[UTF8String, java.lang.Long]()
      w.foreach { case (k, v) => h.put(UTF8String.fromString(k), v) }
      new UlmModel(h, if (w.isEmpty) 1 else w.keys.map(_.length).max)
    }
    def got(word: String, w: Map[String, Long]): Option[List[String]] =
      Option(UlmSegmentUtil.segment(UTF8String.fromString(word), model(w)))
        .map(_.toArray[UTF8String](org.apache.spark.sql.types.StringType)
          .map(_.toString).toList)

    // edges: tie → smallest j (longest LAST piece); empty word; no path
    val w0 = Map("a" -> 0L, "b" -> 0L, "ab" -> 0L)
    assert(got("ab", w0) == Some(List("ab")), "equal scores must prefer smallest j")
    assert(got("ab", Map("a" -> 5L, "b" -> 5L, "ab" -> 3L)) == Some(List("a", "b")))
    assert(got("", w0) == Some(Nil))
    assert(got("abc", Map("a" -> 0L)) == None)
    assert(got("zzz", Map.empty) == None)

    val rnd = new scala.util.Random(421)
    for (_ <- 1 to 400) {
      val word = (1 to (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val pieces = (1 to (2 + rnd.nextInt(10))).map { _ =>
        (1 to (1 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.distinct
      // chars sometimes included so most words segment; weights can tie
      val w = (pieces ++ (if (rnd.nextBoolean()) Seq("a", "b", "c") else Nil))
        .distinct.map(p => p -> (rnd.nextInt(21) - 15).toLong).toMap
      assert(got(word, w) == ref(word, w), s"mismatch for '$word' under $w")
    }
  }

  test("graft_ulm_segment through Spark (codegen + map literal + registry) == direct eval") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, col, typedLit}
    val w = Map("a" -> -1L, "b" -> -2L, "ab" -> -2L, "ba" -> -4L, "abc" -> -1L)
    val words = Seq("ab", "ba", "abc", "abab", "zz", "", "aabba")
    val df = words.toDF("word")
      .select(col("word"), call_function("graft_ulm_segment", col("word"), typedLit(w)).as("seg"))
    val got = df.as[(String, Option[Seq[String]])].collect().toMap
    def m(): UlmModel = {
      val h = new java.util.HashMap[UTF8String, java.lang.Long]()
      w.foreach { case (k, v) => h.put(UTF8String.fromString(k), v) }
      new UlmModel(h, 3)
    }
    for (word <- words) {
      val direct = Option(UlmSegmentUtil.segment(UTF8String.fromString(word), m()))
        .map(_.toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq)
      assert(got(word) == direct, s"Spark/eval divergence for '$word'")
    }
    assert(got("zz").isEmpty, "unsegmentable word must be NULL")
    assert(got("abc") == Some(Seq("abc")))
  }

  test("hamming == manual bit count") {
    import spark.implicits._
    val pairs = Seq((0L, 0L), (-1L, 0L), (0x5555555555555555L, 0L), (123456789L, 987654321L))
    val df = pairs.toDF("a", "b")
    val got = df.select(TextHash.hamming(col("a"), col("b"))).as[Int].collect()
    val exp = pairs.map { case (a, b) => java.lang.Long.bitCount(a ^ b) }
    assert(got.toSeq == exp)
  }
}

/** Property laws for the hash/shingle primitives. */
object TextHashLawsSpec extends Properties("TextHash") {
  private val genWords: Gen[String] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "dog", "cat", "")).map(_.mkString(" "))

  property("shingle count = distinct windows; each shingle has n words") =
    Prop.forAll(genWords) { t =>
      val got = ShingleUtil
        .shingles(UTF8String.fromString(t), 3)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType)
        .map(_.toString)
      val words = t.split(" ", -1)
      (got.length == words.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq.distinct.size) &&
      got.forall(s => s.split(" ", -1).length == 3)
    }

  property("rollingHash stays in [0, 2^61-1) and is pure") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val h = TextHash.rollingHash(s)
      h >= 0L && h < (1L << 61) - 1 && h == TextHash.rollingHash(s)
    }
}

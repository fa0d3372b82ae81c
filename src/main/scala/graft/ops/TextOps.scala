package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Text-analysis operators for training-data pipelines (SURVEY §2.C E12 +
  * the driver-mandated text family): token counting, per-language stats,
  * top terms, quality scoring, language-ID, fingerprinting.
  *
  * All implemented with native (codegen'd) functions — split/explode/
  * regexp — no UDFs in the hot path. Everything is a single scan +
  * one shuffle for the grouped variants; at 100 TB the explode fan-out
  * (≈ tokens-per-doc ×) is bounded and map-side combine keeps the
  * shuffle at |vocab × groups|.
  */
object TextOps {
  import Tables._

  /** E12: per-language corpus stats in one aggregate. */
  val qTextStats = Q(
    "q_text_stats",
    (s, d) =>
      documents(s, d)
        .select(
          col("lang"),
          length(col("text")).as("chars"),
          size(split(col("text"), " ")).as("toks")
        )
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("chars")).as("total_chars"),
          sum(col("toks")).as("total_tokens"),
          max(col("toks")).as("max_tokens")
        )
        .orderBy("lang"),
    Some("""SELECT lang, count(*) AS n_docs,
                   CAST(sum(length(text)) AS BIGINT) AS total_chars,
                   CAST(sum(len(string_split(text,' '))) AS BIGINT) AS total_tokens,
                   CAST(max(len(string_split(text,' '))) AS INTEGER) AS max_tokens
            FROM documents GROUP BY lang ORDER BY lang""")
  )

  /** E12: top-5 terms per language by frequency (tie → term asc).
    * explode → two-phase hash agg → per-group top-k window.
    */
  val qTopTerms = Q(
    "q_top_terms",
    (s, d) => {
      val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("term").asc)
      documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("term"))
        .groupBy("lang", "term")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select("lang", "term", "cnt", "rn")
        .orderBy("lang", "rn")
    },
    Some("""SELECT lang, term, cnt, CAST(rn AS INTEGER) AS rn FROM (
              SELECT lang, term, cnt,
                     row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term ASC) AS rn
              FROM (SELECT lang, term, count(*) AS cnt
                    FROM (SELECT lang, unnest(string_split(text,' ')) AS term FROM documents) tok
                    GROUP BY lang, term) c
            ) t WHERE rn <= 5 ORDER BY lang, rn""")
  )

  /** Token counting with a regex tokenizer (BPE-ish word/number pieces),
    * alongside whitespace tokens — the two standard cheap estimators.
    */
  val qTokenCount = Q(
    "q_token_count",
    (s, d) =>
      documents(s, d)
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).as("ws_tokens"),
          size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("re_tokens"),
          length(col("text")).as("n_chars_m")
        )
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   CAST(len(string_split(text,' ')) AS INTEGER) AS ws_tokens,
                   CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INTEGER) AS re_tokens,
                   CAST(length(text) AS INTEGER) AS n_chars_m
            FROM documents ORDER BY doc_id""")
  )

  /** Quality scoring: length + mean-word-length + stopword-ratio
    * heuristics. Ratios are exact-int / exact-int single divisions →
    * bitwise stable across engines.
    */
  val qQualityScore = Q(
    "q_quality_score",
    (s, d) => {
      val toks = size(split(col("text"), " ")).cast("long")
      val stop = size(
        filter(
          split(col("text"), " "),
          t => t === "the" || t === "a" || t === "of" || t === "and"
        )
      ).cast("long")
      documents(s, d)
        .select(
          col("doc_id"),
          toks.as("n_tokens"),
          stop.as("n_stopwords"),
          (stop.cast("double") / toks).as("stopword_ratio"),
          (length(col("text")).cast("double") / toks).as("mean_token_len")
        )
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
                   CAST(len(list_filter(string_split(text,' '),
                        t -> t IN ('the','a','of','and'))) AS BIGINT) AS n_stopwords,
                   CAST(len(list_filter(string_split(text,' '),
                        t -> t IN ('the','a','of','and'))) AS DOUBLE)
                     / len(string_split(text,' ')) AS stopword_ratio,
                   CAST(length(text) AS DOUBLE) / len(string_split(text,' ')) AS mean_token_len
            FROM documents ORDER BY doc_id""")
  )

  /** Language-ID heuristic: score = stopword-profile hits per candidate
    * language, argmax with lexicographic tiebreak. (The synthetic corpus
    * shares one vocabulary, so predictions are degenerate — the operator
    * semantics are what's under test; on real data the profiles differ.)
    */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "value"),
    "de" -> Seq("der", "die", "und", "table", "window"),
    "es" -> Seq("el", "la", "de", "query", "stream"),
    "fr" -> Seq("le", "la", "et", "sort", "merge"),
    "zh" -> Seq("zh1", "zh2", "zh3", "batch", "join")
  )

  val qLangId = Q(
    "q_lang_id",
    (s, d) => {
      val words = array_distinct(split(col("text"), " "))
      val scoreCols = langProfiles.map { case (l, ws) =>
        size(array_intersect(words, array(ws.map(lit): _*))).as(s"score_$l")
      }
      val scored = documents(s, d)
        .select(Seq(col("doc_id"), col("lang")) ++ scoreCols: _*)
      // argmax with lexicographic-ascending tiebreak: least() over
      // (-score, lang) structs compares fields in order.
      val best = least(
        langProfiles.map { case (l, _) =>
          struct((-col(s"score_$l")).as("ns"), lit(l).as("l"))
        }: _*
      )
      scored
        .withColumn("pred_lang", best.getField("l"))
        .groupBy("lang", "pred_lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "pred_lang")
    },
    None // argmax-of-struct tiebreak is engine-specific; rows-only check
  )

  /** Document fingerprinting: md5 content fingerprint (oracle-able) —
    * the rolling-hash variant lives in [[graft.functions.TextHash]] and
    * is unit-tested for determinism instead (not ANSI-SQL-expressible).
    */
  val qFingerprint = Q(
    "q_fingerprint",
    (s, d) =>
      documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("fp"))
        .orderBy("doc_id"),
    Some("SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id")
  )

  val all: Seq[Q] =
    Seq(qTextStats, qTopTerms, qTokenCount, qQualityScore, qLangId, qFingerprint)
}

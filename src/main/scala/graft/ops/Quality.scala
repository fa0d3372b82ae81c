package graft.ops

import org.apache.spark.sql.functions._

/** Content-quality filters for training-data curation (SURVEY §2.C E12
  * extensions): repetition rules, PII/log scrubbing, and the
  * token-length histogram that drives sequence-length planning.
  *
  * All three are pure per-row projections or one hash aggregate — the
  * shapes that run at full scan speed at 100 TB: no joins, no windows
  * over row-level data, nothing driver-side. The repetition rules do
  * O(d²) work per document in the n-gram counters, but d is the
  * per-document token count (bounded, ~10² for web text) — per-row CPU,
  * not a cross-row blowup; the corpus axis stays embarrassingly
  * parallel.
  */
object Quality {
  import Tables._

  /** Repetition-based quality rules — the filters made standard by the
    * Gopher corpus pipeline (Rae et al. 2021, "Scaling Language Models",
    * §A.1.1): a document dominated by one repeated 2-gram, or whose
    * 3-grams are mostly duplicates, is boilerplate/spam and is removed
    * before training.
    *
    * Per document: `top2_frac` = fraction of tokens covered by the most
    * frequent 2-gram (count × 2 / tokens); `dup3_frac` = fraction of
    * 3-gram occurrences that are repeats of an earlier occurrence
    * (total − distinct) / total. The flag thresholds (top2 > 1/5,
    * dup3 > 3/10) are evaluated as EXACT integer cross-multiplications
    * — no float ever decides membership (the Dedup.scala discipline);
    * the emitted fractions are one IEEE division of exact ints each.
    *
    * Implementation: one native codegen counting pass per n
    * ([[graft.functions.WordGramStats]] → `[total, top, distinct]`) —
    * O(d) per document where the higher-order-function formulation was
    * interpreted O(d²). No explode → no row fan-out, no shuffle; the
    * whole query is one scan + per-row projection and the only Exchange
    * is the output sort.
    */
  val qRepetition = Q(
    "q_repetition",
    (s, d) =>
      documents(s, d)
        .withColumn("s2", graft.functions.TextHash.gramStats(col("text"), 2))
        .withColumn("s3", graft.functions.TextHash.gramStats(col("text"), 3))
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).as("n_toks"),
          col("s2").getItem(1).as("top2_cnt"),
          (col("s3").getItem(0) - col("s3").getItem(2)).as("dup3_cnt"),
          col("s3").getItem(0).as("n_g3"))
        .select(
          col("doc_id"),
          col("n_toks"),
          col("top2_cnt"),
          ((col("top2_cnt") * 2).cast("double") / col("n_toks")).as("top2_frac"),
          col("dup3_cnt"),
          when(col("n_g3") === 0, lit(0.0))
            .otherwise(col("dup3_cnt").cast("double") / col("n_g3")).as("dup3_frac"),
          // Gopher-style removal decision, exact-integer form:
          // top2_frac > 1/5  ⇔  10·top2_cnt > n_toks
          // dup3_frac > 3/10 ⇔  10·dup3_cnt > 3·n_g3
          (col("top2_cnt") * 10 > col("n_toks") ||
            col("dup3_cnt") * 10 > col("n_g3") * 3).as("flagged"))
        .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            g AS (SELECT doc_id, CAST(len(w) AS INTEGER) AS n_toks,
                         CASE WHEN len(w) >= 2
                              THEN [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
                              ELSE [] END AS g2,
                         CASE WHEN len(w) >= 3
                              THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w)-1)]
                              ELSE [] END AS g3
                  FROM t),
            c AS (SELECT doc_id, n_toks,
                         CAST(coalesce(list_max(list_transform(list_distinct(g2),
                                g -> len(list_filter(g2, x -> x = g)))), 0) AS INTEGER) AS top2_cnt,
                         CAST(len(g3) - len(list_distinct(g3)) AS INTEGER) AS dup3_cnt,
                         CAST(len(g3) AS INTEGER) AS n_g3
                  FROM g)
            SELECT doc_id, n_toks, top2_cnt,
                   CAST(top2_cnt * 2 AS DOUBLE) / n_toks AS top2_frac,
                   dup3_cnt,
                   CASE WHEN n_g3 = 0 THEN 0.0
                        ELSE CAST(dup3_cnt AS DOUBLE) / n_g3 END AS dup3_frac,
                   (top2_cnt * 10 > n_toks OR dup3_cnt * 10 > 3 * n_g3) AS flagged
            FROM c ORDER BY doc_id""")
  )

  /** PII / identifier scrubbing — the log-scrubbing pass a pipeline runs
    * before training on telemetry-derived text: strip numeric
    * identifiers and email-shaped tokens, and count what was removed
    * (the redaction count is the audit trail). Applied to the event
    * `props` payload; the email pattern is part of the standard scrub
    * set and legitimately matches zero rows on this corpus.
    *
    * Pure per-row regexp projection (codegen'd `regexp_replace` /
    * `regexp_extract_all`, no UDF): at 100 TB this runs map-side at
    * scan speed and prunes to two columns. Patterns are kept to
    * character classes + quantifiers — the regex subset Spark (Java
    * regex) and DuckDB (RE2) interpret identically.
    */
  val qPiiRedact = Q(
    "q_pii_redact",
    (s, d) => {
      val numPat = "[0-9]+"
      val emailPat = "[a-z0-9._]+@[a-z0-9.-]+"
      events(s, d)
        .select(
          col("event_id"),
          // n_nums counts on the EMAIL-REDACTED intermediate — the audit
          // reflects what the <NUM> pass actually replaced; digit runs
          // inside an email belong to n_emails, not double-counted here
          size(expr(
            s"regexp_extract_all(regexp_replace(props, '$emailPat', '<EMAIL>'), '$numPat', 0)"))
            .as("n_nums"),
          size(expr(s"regexp_extract_all(props, '$emailPat', 0)")).as("n_emails"),
          regexp_replace(
            regexp_replace(col("props"), emailPat, "<EMAIL>"),
            numPat, "<NUM>").as("redacted"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
                   CAST(len(regexp_extract_all(
                     regexp_replace(props, '[a-z0-9._]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
                     '[0-9]+')) AS INTEGER) AS n_nums,
                   CAST(len(regexp_extract_all(props, '[a-z0-9._]+@[a-z0-9.-]+')) AS INTEGER) AS n_emails,
                   regexp_replace(regexp_replace(props, '[a-z0-9._]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
                                  '[0-9]+', '<NUM>', 'g') AS redacted
            FROM events ORDER BY event_id""")
  )

  /** Token-length histogram (16-token bins) — the distribution that
    * sizes sequence packing (q_pack) and truncation budgets. One scan +
    * one hash aggregate with map-side combine; output is |bins| rows
    * regardless of corpus size. Bin id is exact integer division.
    */
  val qLengthHistogram = Q(
    "q_length_histogram",
    (s, d) =>
      documents(s, d)
        .select(expr("size(split(text, ' ')) div 16").as("bin"),
          expr("size(split(text, ' '))").as("toks"))
        .groupBy("bin")
        .agg(
          count(lit(1)).as("n_docs"),
          min(col("toks")).as("min_toks"),
          max(col("toks")).as("max_toks"))
        .orderBy("bin"),
    Some("""SELECT len(string_split(text, ' ')) // 16 AS bin,
                   count(*) AS n_docs,
                   CAST(min(len(string_split(text, ' '))) AS INTEGER) AS min_toks,
                   CAST(max(len(string_split(text, ' '))) AS INTEGER) AS max_toks
            FROM documents GROUP BY bin ORDER BY bin""")
  )

  /** Model-based quality scoring — the fastText-style linear classifier
    * every production curation pipeline runs (CCNet / GPT-3 / LLaMA data
    * work: a cheap linear model over bag-of-words features gates
    * documents before the expensive stages). The model is TRAINED
    * OFFLINE and FROZEN as literal (token, weight) rows that ship with
    * the job — the standard serving pattern; what the engine provides is
    * the inference dataflow.
    *
    * Exactness discipline: weights are integer MILLI-units summed as
    * BIGINT — the score is an exact integer both engines agree on
    * bit-for-bit, and the accept decision is an integer comparison. (A
    * sigmoid would add nothing to the decision — it is monotone — and
    * would put a transcendental in a hash-compared column.)
    *
    * Scale shape: explode tokens → BROADCAST join against the
    * vocabulary (model-sized, corpus-independent — the one join in this
    * engine that is always correctly a broadcast) → one hash aggregate
    * with map-side combine → left join back to keep zero-hit docs. Runs
    * at scan speed at 100 TB; no shuffle carries more than (doc_id,
    * n_hits, w_sum) rows.
    */
  private[graft] val VOCAB: Seq[(String, Int)] = Seq(
    "fast" -> 220, "vector" -> 180, "spark" -> 150, "query" -> 90,
    "column" -> 60, "stream" -> 40,
    "slow" -> -240, "dup" -> -400, "batch" -> -120, "a" -> -30)
  private[graft] val BIAS_MILLI = -50L

  val qQualityClassifier = Q(
    "q_quality_classifier",
    (s, d) => {
      import s.implicits._
      val vocab = VOCAB.toDF("tok", "w_milli")
      val tokens = fanOut(documents(s, d))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val scores = tokens
        .join(broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hits"), sum("w_milli").as("w_sum"))
      documents(s, d)
        .select(col("doc_id"))
        // scores is one row per hit doc — corpus-sized: shuffle join
        .join(scores.hint("shuffle_hash"), Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("w_sum"), lit(0L)) + BIAS_MILLI).as("score_milli"))
        .withColumn("accept", col("score_milli") >= 0)
        .orderBy("doc_id")
    },
    Some {
      val rows = VOCAB.map { case (t, w) => s"('$t', $w)" }.mkString(", ")
      s"""WITH vocab(tok, w_milli) AS (VALUES $rows),
          t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
          sc AS (SELECT doc_id, count(*) AS n_hits,
                        CAST(sum(w_milli) AS BIGINT) AS w_sum
                 FROM t JOIN vocab USING (tok) GROUP BY doc_id)
          SELECT d.doc_id, coalesce(sc.n_hits, 0) AS n_hits,
                 CAST(coalesce(sc.w_sum, 0) + $BIAS_MILLI AS BIGINT) AS score_milli,
                 coalesce(sc.w_sum, 0) + $BIAS_MILLI >= 0 AS accept
          FROM documents d LEFT JOIN sc USING (doc_id)
          ORDER BY d.doc_id"""
    }
  )

  /** One-pass corpus PROFILING — the schema-drift / data-contract audit
    * a pipeline runs on every new drop before anything else touches it:
    * row count, per-column null counts, distinct cardinalities, and
    * value ranges for the `documents` table, as ONE wide row.
    *
    * Scale shape: a single aggregate pass. The exact `count(distinct)`
    * columns plan one Expand (row × |distinct-aggs| before partial
    * aggregation) — the price of exact cardinalities, paid here because
    * the oracle needs exactness; the 100 TB profile is the SHIPPED
    * twin [[qProfileApprox]] — same pass with `approx_count_distinct`,
    * no Expand, plain scan-speed partial aggregation. Everything else is min/max/sum/conditional-count —
    * map-side combined, |1| row out.
    */
  val qProfile = Q(
    "q_profile",
    (s, d) =>
      documents(s, d).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("doc_id")).as("n_doc_ids"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        count(when(col("text").isNull, 1)).as("n_null_text"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_chars")).as("total_chars"),
        min(length(col("text"))).as("min_text_len"),
        max(length(col("text"))).as("max_text_len")),
    Some("""SELECT count(*) AS n_rows,
                   count(DISTINCT doc_id) AS n_doc_ids,
                   count(DISTINCT lang) AS n_langs,
                   count(DISTINCT source) AS n_sources,
                   count(CASE WHEN text IS NULL THEN 1 END) AS n_null_text,
                   min(n_chars) AS min_chars,
                   max(n_chars) AS max_chars,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(min(length(text)) AS INTEGER) AS min_text_len,
                   CAST(max(length(text)) AS INTEGER) AS max_text_len
            FROM documents""")
  )

  /** The 100 TB profile the [[qProfile]] scaladoc promises: the SAME
    * one-pass corpus profile with every exact `count(distinct)` swapped
    * for `approx_count_distinct` (HLL++, rsd 5%) and NO other change —
    * the Expand (row × |distinct-aggs| before partial aggregation)
    * disappears and the pass collapses to plain scan-speed map-side
    * combined aggregation: each executor emits one sketch per column,
    * mergeable in any order. ∅ rows-only at the driver (sketch values
    * are engine-specific); QualityProfileSpec bounds each estimate
    * within the documented HLL++ rsd envelope against the exact
    * profile and pins the plan (no Expand).
    */
  val qProfileApprox = Q(
    "q_profile_approx",
    (s, d) =>
      documents(s, d).agg(
        count(lit(1)).as("n_rows"),
        approx_count_distinct(col("doc_id")).as("n_doc_ids"),
        approx_count_distinct(col("lang")).as("n_langs"),
        approx_count_distinct(col("source")).as("n_sources"),
        count(when(col("text").isNull, 1)).as("n_null_text"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_chars")).as("total_chars"),
        min(length(col("text"))).as("min_text_len"),
        max(length(col("text"))).as("max_text_len")),
    None // HLL++ estimates are engine-specific — law-verified in spec
  )

  /** LEXICAL DIVERSITY (r8) — the concentration signals a quality
    * filter reads to catch low-diversity boilerplate (keyword-stuffed
    * spam, template pages, log spew) that LENGTH rules miss entirely:
    *
    *  - type–token ratio `types/n` — the classic vocabulary-richness
    *    measure;
    *  - Simpson diversity `1 − Σc²/n²` — the probability two randomly
    *    drawn tokens DIFFER (the complement of the repeat probability;
    *    1 − Gini impurity's complement, exact-rational unlike Shannon
    *    entropy, which needs the banned ln).
    *
    * Both are ONE IEEE division/subtraction over exact BIGINT moments
    * (n, types, Σc²), rounded once — the q_tfidf no-transcendental
    * trade. Shape: explode → (doc, term) count (map-side combined) →
    * per-doc moment agg; the second groupBy's doc_id keys are a PREFIX
    * of the first's (doc, term) hash — at 100 TB both are plain
    * hash-agg shuffles with no join anywhere. The SHUFFLE-FREE twin
    * ([[giniPerRow]] — sorted-array run-length fold in one projection,
    * zero exchanges) is shipped and spec-proven identical
    * (QualityProfileSpec); it has no shared-dialect spelling, so the
    * explode form stays the declared/oracled query.
    */
  val qGiniDiversity = Q(
    "q_gini_diversity",
    (s, d) =>
      documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_toks"),
          count(lit(1)).as("n_types"),
          sum(col("c") * col("c")).as("sum_c2"))
        .select(col("doc_id"), col("n_toks"), col("n_types"),
          round(col("n_types").cast("double") / col("n_toks").cast("double"), 6)
            .as("ttr"),
          round(lit(1.0) - col("sum_c2").cast("double") /
            (col("n_toks") * col("n_toks")).cast("double"), 6).as("simpson"))
        .orderBy("doc_id"),
    Some("""WITH tf AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents),
            cnt AS (
              SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
              FROM tf GROUP BY doc_id, term),
            m AS (
              SELECT doc_id,
                     CAST(sum(c) AS BIGINT) AS n_toks,
                     CAST(count(*) AS BIGINT) AS n_types,
                     CAST(sum(c * c) AS BIGINT) AS sum_c2
              FROM cnt GROUP BY doc_id)
            SELECT doc_id, n_toks, n_types,
                   round(CAST(n_types AS DOUBLE) / CAST(n_toks AS DOUBLE), 6) AS ttr,
                   round(1.0 - CAST(sum_c2 AS DOUBLE) / CAST(n_toks * n_toks AS DOUBLE), 6) AS simpson
            FROM m ORDER BY doc_id""")
  )

  /** The 100 TB form of [[qGiniDiversity]]: the SAME (n, types, Σc²)
    * moments from a run-length fold over the SORTED token array — one
    * per-row projection, ZERO exchanges, scan speed at any corpus
    * size. The fold closes each run when the token changes (adding
    * run² to Σc² and 1 to types) and the finish lambda closes the last
    * run. HOF `aggregate` is CodegenFallback (documented E11 trade) —
    * still per-row and shuffle-free, which is what matters at scale.
    * QualityProfileSpec proves row-for-row equality with the declared
    * two-shuffle form, so the twin inherits its oracle transitively.
    */
  def giniPerRow(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        expr("""aggregate(
                  array_sort(split(text, ' ')),
                  named_struct('prev', CAST(NULL AS STRING),
                               'run', 0L, 'types', 0L, 'sumc2', 0L),
                  (a, x) -> IF(a.prev IS NOT NULL AND x = a.prev,
                    named_struct('prev', x, 'run', a.run + 1L,
                                 'types', a.types, 'sumc2', a.sumc2),
                    named_struct('prev', x, 'run', 1L,
                                 'types', a.types + 1L,
                                 'sumc2', a.sumc2 + a.run * a.run)),
                  a -> named_struct('types', a.types,
                                    'sumc2', a.sumc2 + a.run * a.run))""").as("m"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .select(col("doc_id"), col("n_toks"),
        col("m.types").as("n_types"),
        round(col("m.types").cast("double") / col("n_toks").cast("double"), 6)
          .as("ttr"),
        round(lit(1.0) - col("m.sumc2").cast("double") /
          (col("n_toks") * col("n_toks")).cast("double"), 6).as("simpson"))
      .orderBy("doc_id")

  /** FEATURE HASHING (r8) — the hashing trick (Weinberger et al. 2009):
    * tokens map to a FIXED 64-bucket feature space via a hash, so the
    * featurizer needs no vocabulary, no fit pass, no broadcast dict —
    * the always-online featurization a streaming classifier or an
    * online quality model consumes. Collisions are the accepted trade
    * (two tokens sharing a bucket add their counts); the dimensionality
    * is a constant independent of corpus vocabulary — the property that
    * makes the op trivially 100 TB-safe.
    *
    * Cross-engine hash: the first 4 hex digits of md5(token) parsed as
    * an integer, mod 64 — md5 is bit-identical everywhere (the
    * q_fingerprint anchor), and 16 bits ≫ 6 bucket bits keeps the
    * parse exact. Shape: pushed-filter doc sample → explode → ONE
    * (doc, bucket) hash agg, map-side combined; ≤ 64 rows out per doc.
    */
  val qFeatureHash = Q(
    "q_feature_hash",
    (s, d) =>
      documents(s, d)
        .where(col("doc_id") % 25 === 0)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .select(col("doc_id"),
          (conv(substring(md5(col("term")), 1, 4), 16, 10).cast("long") % 64)
            .as("bucket"))
        .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
        .orderBy("doc_id", "bucket"),
    Some("""WITH toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents WHERE doc_id % 25 = 0)
            SELECT doc_id,
                   ('0x' || substr(md5(term), 1, 4))::BIGINT % 64 AS bucket,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM toks
            GROUP BY doc_id, ('0x' || substr(md5(term), 1, 4))::BIGINT % 64
            ORDER BY doc_id, bucket""")
  )

  /** FROZEN INTEGER MLP QUALITY SCORER (r8) — the nonlinear step up
    * from [[qQualityClassifier]]'s linear model: a 2-layer
    * 64→8→1 ReLU network over [[qFeatureHash]]'s hashed features,
    * quantized to INTEGER weights — the quantized-distillation serving
    * shape (score with a tiny integer student, not the teacher LLM).
    * Every hidden pre-activation is an exact BIGINT sum, ReLU is
    * `greatest(0, ·)`, and the output layer a fixed 8-term integer
    * combination — NO floats anywhere, so the score is hash-exact with
    * no rounding discipline needed at all.
    *
    * Weights are formula-frozen (`w1(b,j) = (13b+5j) mod 7 − 3`,
    * `b1(j) = j mod 3 − 1`, `w2(j) = 3j mod 5 − 2`) so BOTH dialects
    * derive them from the same integers — the q_ann_lsh frozen-literal
    * discipline without shipping 520 literals; the Scala loop that
    * builds the Spark columns GENERATES the oracle's sums (the
    * q_zorder_key one-code-path rule), so layer shapes cannot drift.
    *
    * Scale shape: explode → ONE map-side-combined 8-sum aggregate
    * (the hidden layer IS the aggregate — each token row contributes
    * w1(bucket, j) to 8 partial sums) → a per-row output projection.
    * No join, no vocabulary, no broadcast: featurizer (hashing trick)
    * and model (integer formulas) are both corpus-independent
    * constants, which is what makes inference at 100 TB exactly one
    * scan + one |docs|-row shuffle. MlpSpec re-derives scores from
    * raw text in plain Scala.
    */
  /** The frozen integer MLP over a (doc_id, text) relation — shared by
    * [[qMlpScore]] (full corpus) and TextOps.qRerank (the top-20
    * retrieval candidates), so the reranker's model IS the declared
    * scorer by construction.
    */
  private[ops] def mlpScored(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .select(col("doc_id"),
        (conv(substring(md5(col("term")), 1, 4), 16, 10).cast("long") % 64)
          .as("b"))
    val hidden = toks.groupBy("doc_id").agg(
      sum((col("b") * 13 + lit(0 * 5)) % 7 - 3).as("a0"),
      (1 until 8).map(j =>
        sum((col("b") * 13 + lit(j * 5)) % 7 - 3).as(s"a$j")): _*)
    val score = (0 until 8)
      .map(j =>
        greatest(lit(0L), col(s"a$j") + lit(j % 3 - 1).cast("long")) *
          lit((j * 3) % 5 - 2).cast("long"))
      .reduceLeft(_ + _)
    hidden.select(col("doc_id"), score.as("mlp_score"))
  }

  /** The mlp oracle fragments, generated by the SAME index loop that
    * builds the Spark columns (one-code-path) — shared with the
    * q_rerank oracle.
    */
  private[ops] val mlpSumsSql: String = (0 until 8)
    .map(j => s"CAST(sum((b * 13 + ${j * 5}) % 7 - 3) AS BIGINT) AS a$j")
    .mkString(",\n                   ")
  private[ops] val mlpScoreSql: String = (0 until 8)
    .map(j => s"greatest(CAST(0 AS BIGINT), a$j + ${j % 3 - 1}) * ${(j * 3) % 5 - 2}")
    .mkString(" + ")

  val qMlpScore = Q(
    "q_mlp_score",
    (s, d) =>
      mlpScored(documents(s, d).select(col("doc_id"), col("text")))
        .select(col("doc_id"), col("mlp_score"),
          (col("mlp_score") > 0).as("accept"))
        .orderBy("doc_id"),
    Some {
      s"""WITH toks AS (
            SELECT doc_id,
                   ('0x' || substr(md5(term), 1, 4))::BIGINT % 64 AS b
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents)),
          f AS (SELECT doc_id,
                   $mlpSumsSql
                FROM toks GROUP BY doc_id)
          SELECT doc_id, CAST($mlpScoreSql AS BIGINT) AS mlp_score,
                 ($mlpScoreSql) > 0 AS accept
          FROM f ORDER BY doc_id"""
    }
  )

  val all: Seq[Q] =
    Seq(qRepetition, qPiiRedact, qLengthHistogram, qQualityClassifier, qProfile,
      qProfileApprox, qGiniDiversity, qFeatureHash, qMlpScore)
}

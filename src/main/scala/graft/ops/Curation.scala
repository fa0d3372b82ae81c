package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextHash

/** E17 — the end-to-end CURATION PIPELINE: the composition a
  * pre-training data team actually ships, declared as ONE query so the
  * inter-stage contracts (what dedup sees after the quality gate, what
  * decontamination sees after dedup) are themselves hash-verified.
  *
  * Stages, in the order production pipelines run them:
  *   1. quality gate     — per-row token/stopword thresholds
  *                         (q_quality_score's heuristics), shuffle-free;
  *   2. exact dedup      — lowest-id survivor per content
  *                         (q_dedup_exact's rule): one hash-agg shuffle;
  *   3. split assignment — q_split_assign's exact-integer Knuth hash,
  *                         per-row, shuffle-free;
  *   4. decontamination  — drop TRAIN docs sharing any 8-gram shingle
  *                         with the TEST split (the production direction
  *                         of q_decontaminate: guard the training
  *                         corpus, not just the metric): one shingle
  *                         shuffle + two doc-keyed joins.
  *
  * Scale notes: stage 2 groups on full `text` here to stay
  * char-faithful to the DuckDB oracle; at 100 TB the group key is the
  * 128-bit content hash (q_dedup_exact documents the same trade). The
  * deduped+split relation feeds THREE consumers (test-shingle set,
  * train-shingle probe, final output), so it is materialized once via
  * [[Materialize]] instead of recomputing the scan+agg per consumer —
  * on a cluster that is one executor-memory (or reliable-checkpoint)
  * materialization of the post-dedup survivors. Decontamination is
  * doc-pair-free: a semi join against the distinct test shingles, then
  * an anti join of train docs against the contaminated-id set, both
  * `shuffle_hash` (the test split is corpus-proportional — never
  * assume it broadcasts).
  */
object Curation {
  import Tables._

  private val N = 8 // decontamination shingle width (words)
  private val MIN_TOKENS = 12L
  private val MIN_STOPWORDS = 1L

  /** Stopword membership shared with q_quality_score. */
  private def stopCount = size(
    filter(split(col("text"), " "),
      t => t === "the" || t === "a" || t === "of" || t === "and")
  ).cast("long")

  /** 8-word shingle text `w[i] || ' ' || … || w[i+7]`, generated so the
    * oracle's width can never drift from the engine's `N`. */
  private val shingleSql: String =
    (0 until N).map(j => if (j == 0) "w[i]" else s"w[i+$j]").mkString(" || ' ' || ")

  val qCurationPipeline = Q(
    "q_curation_pipeline",
    (s, d) => {
      // 1. quality gate — per-row, pushes nothing past the scan it needs
      val gated = fanOut(documents(s, d))
        .select(col("doc_id"), col("text"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          stopCount.as("n_stop"))
        .where(col("n_tokens") >= MIN_TOKENS && col("n_stop") >= MIN_STOPWORDS)
      // 2. exact dedup — lowest-id survivor carries its (identical) stats
      val deduped = gated.groupBy("text")
        .agg(min(col("doc_id")).as("doc_id"), max(col("n_tokens")).as("n_tokens"))
      // 3. split assignment — exact-integer hash, per-row projection
      val assigned = Materialize(
        deduped
          .withColumn("bucket", expr(Sampling.bucketSql("doc_id", 0L, 100L)))
          .withColumn("split",
            when(col("bucket") < 90, "train")
              .when(col("bucket") < 95, "val")
              .otherwise("test")))
      // 4. decontaminate train against the test split's shingles
      val sh = assigned
        .select(col("doc_id"), col("split"),
          TextHash.shingleHashes(col("text"), N).as("sh"))
        .where(size(col("sh")) > 0)
      val testShingles = sh.where(col("split") === "test")
        .select(explode(col("sh")).as("shingle")).distinct()
      val contaminated = sh.where(col("split") === "train")
        .select(col("doc_id"), explode(col("sh")).as("shingle"))
        .join(testShingles.hint("shuffle_hash"), Seq("shingle"), "left_semi")
        .select("doc_id").distinct()
      val cleanTrain = assigned.where(col("split") === "train")
        .join(contaminated.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
      assigned.where(col("split") =!= "train")
        .unionByName(cleanTrain)
        .select("doc_id", "split", "n_tokens")
        .orderBy("doc_id")
    },
    Some(s"""WITH gated AS (
               SELECT doc_id, text,
                      CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
               FROM documents
               WHERE len(string_split(text,' ')) >= $MIN_TOKENS
                 AND len(list_filter(string_split(text,' '),
                         t -> t IN ('the','a','of','and'))) >= $MIN_STOPWORDS),
             deduped AS (
               SELECT text, min(doc_id) AS doc_id, max(n_tokens) AS n_tokens
               FROM gated GROUP BY text),
             assigned AS (
               SELECT doc_id, text, n_tokens,
                      CASE WHEN ${Sampling.bucketSql("doc_id", 0L, 100L)} < 90 THEN 'train'
                           WHEN ${Sampling.bucketSql("doc_id", 0L, 100L)} < 95 THEN 'val'
                           ELSE 'test' END AS split
               FROM deduped),
             toks AS (SELECT doc_id, split, string_split(text,' ') AS w FROM assigned),
             sh AS (SELECT doc_id, split,
                           list_distinct([$shingleSql
                                          for i in range(1, len(w) - ${N - 2})]) AS s
                    FROM toks WHERE len(w) >= $N),
             test_sh AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE split = 'test'),
             contam AS (SELECT DISTINCT doc_id
                        FROM (SELECT doc_id, unnest(s) AS shingle FROM sh
                              WHERE split = 'train') t
                        WHERE shingle IN (SELECT shingle FROM test_sh))
             SELECT doc_id, split, n_tokens FROM assigned
             WHERE split <> 'train' OR doc_id NOT IN (SELECT doc_id FROM contam)
             ORDER BY doc_id""")
  )

  /** Domain-level curation (the RefinedWeb/C4 source-blocklist stage):
    * per-source aggregate stats derive a DATA-DRIVEN blocklist — a
    * source is blocked when more than 30% of its documents are short
    * (`n_chars < 200`), tested as the exact cross-multiplied integers
    * `10·n_short > 3·n_docs` (no float ratio in any decision) — and the
    * declared query returns the documents that SURVIVE the domain
    * filter. This is the curation lever that acts on the PROVENANCE
    * axis: q_quality_score judges documents one at a time, this judges
    * the source that emitted them (spam domains produce individually
    * plausible pages; their aggregate length/quality profile is what
    * gives them away).
    *
    * Scale shape: the stats pass is one map-side-combined groupBy on
    * source (|sources| ≪ |docs| — domains are web-host cardinality,
    * docs are page cardinality); the blocklist is |blocked-sources|
    * rows and joins back as a BROADCAST anti join — the one join in
    * this family that is always legitimately broadcast-able, because
    * the build side is bounded by the domain universe, not the corpus.
    * Two passes over the scan, zero corpus-sized shuffles.
    */
  val qDomainFilter = Q(
    "q_domain_filter",
    (s, d) => {
      val docs = documents(s, d)
      val stats = docs.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_chars") < 200, 1L).otherwise(0L)).as("n_short"))
      val blocked = stats
        .where(col("n_short") * 10 > col("n_docs") * 3)
        .select("source")
      docs.join(broadcast(blocked), Seq("source"), "left_anti")
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    },
    Some("""WITH stats AS (
              SELECT source, count(*) AS n_docs,
                     sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS n_short
              FROM documents GROUP BY source),
            blocked AS (SELECT source FROM stats WHERE n_short * 10 > n_docs * 3)
            SELECT doc_id, source, n_chars FROM documents
            WHERE source NOT IN (SELECT source FROM blocked)
            ORDER BY doc_id""")
  )

  /** NUCLEUS (top-p) SOURCE COVERAGE — the mixture-audit twin of
    * [[qDomainFilter]]: within each language, rank sources by document
    * count and mark the smallest prefix covering ≥ 90% of the
    * language's corpus as `core`; the tail is the long-tail provenance
    * a curation team either samples down (q_mix_temperature) or audits
    * by hand. The same top-p idea nucleus sampling applies to token
    * distributions, applied to the source mixture.
    *
    * Exactness: membership is the running-sum test
    * `10·(cum − cnt) < 9·total` — "the mass BEFORE this source hasn't
    * reached 90% yet" — in cross-multiplied integers; the first source
    * at or past the threshold is still `core` (the prefix must REACH
    * coverage), everything after is tail. No float ratio anywhere.
    *
    * Scale shape: one map-side-combined groupBy collapses the corpus to
    * |lang × source| rows — domain-universe cardinality, NOT corpus
    * cardinality — and both windows (running sum, per-lang total) are
    * KEYED on lang over that collapsed relation; the corpus itself
    * never meets a window. At 100 TB this is scan + one shuffle of
    * |domains| rows.
    */
  val qNucleusSources = Q(
    "q_nucleus_sources",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = documents(s, d)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("cnt"))
      val order = Window.partitionBy("lang")
        .orderBy(col("cnt").desc, col("source").asc)
      val cum = sum(col("cnt"))
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      val total = sum(col("cnt")).over(Window.partitionBy("lang"))
      counts
        .select(
          col("lang"), col("source"), col("cnt"),
          cum.as("cum"), total.as("total"),
          ((cum - col("cnt")) * 10 < total * 9).as("core"))
        .orderBy("lang", "source")
    },
    Some("""WITH counts AS (
              SELECT lang, source, count(*) AS cnt
              FROM documents GROUP BY lang, source)
            SELECT lang, source, cnt,
                   CAST(sum(cnt) OVER (PARTITION BY lang
                                  ORDER BY cnt DESC, source ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                   CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS total,
                   (sum(cnt) OVER (PARTITION BY lang
                                   ORDER BY cnt DESC, source ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt) * 10
                     < sum(cnt) OVER (PARTITION BY lang) * 9 AS core
            FROM counts ORDER BY lang, source""")
  )

  /** DATA-CONTRACT EXPECTATIONS (r8) — declarative ingest-time quality
    * gates with a per-rule violation audit, the Delta-Live-Tables /
    * Great-Expectations shape: a rule set is declared ONCE, every row
    * is flagged against all rules in a single pass, and the output is
    * the audit relation a pipeline owner alerts on (rule, violation
    * count, rate, first/last offending id). The same per-row flags ARE
    * the quarantine router — `WHERE NOT v_any` is the clean stream,
    * `WHERE v_any` the quarantine sink — so enforcement costs nothing
    * beyond this audit's one scan.
    *
    * The four rules cover the contract classes a real gate needs:
    * range (`value <= 300`), enum/denylist (`event_type <> 'error'`),
    * nested-field (`props.k < 90` out of the JSON payload — the
    * q_scalar_json extraction), and referential integrity (`user_id`
    * must resolve to an ACTIVE customer, c_acctbal > 0 — a LEFT join
    * against the dim whose null side is the violation). `z_any_rule`
    * aggregates the union.
    *
    * Scale shape: ONE corpus scan → per-row flag projection → ONE
    * map-side-combined 1-row aggregate (16 sums/mins/maxes) → a 5-row
    * explode. The referential-integrity dim is `customer` — SF-SCALED,
    * so the q_pmi rule applies ("a corpus-scaled dimension never
    * broadcasts"): the join is a keyed shuffle_hash with the dim as
    * build side, and the events exchange it costs is the only
    * corpus-sized shuffle in the audit. At 100 TB: scan + one keyed
    * exchange + partial-agg merge — no broadcast of anything that
    * grows with the data (plan-pinned in QueriesPlanSpec).
    * Exactness: counts/ids are exact BIGINTs; each rate is ONE IEEE
    * division from two exact longs, round(,6).
    *
    * One-code-path discipline: the Spark struct array and the oracle's
    * UNION ALL branches are generated from the same [[expectRules]]
    * list, so rule names/order can never drift between dialects.
    */
  private val expectRules: Seq[(String, Int)] = Seq(
    "r1_value_le_300" -> 1,
    "r2_type_not_error" -> 2,
    "r3_props_k_lt_90" -> 3,
    "r4_user_active" -> 4,
    "z_any_rule" -> 0
  )

  val qExpectations = Q(
    "q_expectations",
    (s, d) => {
      val active = customer(s, d)
        .where(col("c_acctbal") > 0)
        .select(col("c_custkey").as("uid"))
      val flagged = events(s, d)
        .join(active.hint("shuffle_hash"), col("user_id") === col("uid"), "left")
        .select(
          col("event_id"),
          (col("value") > 300).as("v1"),
          (col("event_type") === "error").as("v2"),
          (get_json_object(col("props"), "$.k").cast("long") >= 90).as("v3"),
          col("uid").isNull.as("v4"))
        .withColumn("v0", col("v1") || col("v2") || col("v3") || col("v4"))
      val perRule = expectRules.map(_._2).flatMap { i =>
        Seq(
          sum(when(col(s"v$i"), 1L).otherwise(0L)).as(s"n$i"),
          min(when(col(s"v$i"), col("event_id"))).as(s"lo$i"),
          max(when(col(s"v$i"), col("event_id"))).as(s"hi$i"))
      }
      val agg = flagged.agg(count(lit(1)).as("n_rows"), perRule: _*)
      agg
        .select(explode(array(expectRules.map { case (nm, i) =>
          struct(
            lit(nm).as("rule"),
            col(s"n$i").as("n_violations"),
            round(col(s"n$i").cast("double") / col("n_rows").cast("double"), 6)
              .as("violation_rate"),
            col(s"lo$i").as("first_bad_id"),
            col(s"hi$i").as("last_bad_id"))
        }: _*)).as("r"))
        .select(col("r.*"))
        .orderBy("rule")
    },
    Some {
      val branches = expectRules.map { case (nm, i) =>
        s"""SELECT '$nm' AS rule, n$i AS n_violations,
                   round(CAST(n$i AS DOUBLE) / n_rows, 6) AS violation_rate,
                   lo$i AS first_bad_id, hi$i AS last_bad_id FROM a"""
      }.mkString("\n            UNION ALL\n            ")
      val aggCols = expectRules.map(_._2).map { i =>
        s"""CAST(sum(CASE WHEN v$i THEN 1 ELSE 0 END) AS BIGINT) AS n$i,
            min(CASE WHEN v$i THEN event_id END) AS lo$i,
            max(CASE WHEN v$i THEN event_id END) AS hi$i"""
      }.mkString(",\n                   ")
      s"""WITH active AS (SELECT c_custkey FROM customer WHERE c_acctbal > 0),
          f AS (SELECT event_id,
                       (value > 300) AS v1,
                       (event_type = 'error') AS v2,
                       (CAST(json_extract_string(props, '$$.k') AS BIGINT) >= 90) AS v3,
                       (c_custkey IS NULL) AS v4
                FROM events LEFT JOIN active ON user_id = c_custkey),
          g AS (SELECT *, (v1 OR v2 OR v3 OR v4) AS v0 FROM f),
          a AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   $aggCols
                FROM g)
          $branches
          ORDER BY rule"""
    }
  )

  val all: Seq[Q] =
    Seq(qCurationPipeline, qDomainFilter, qNucleusSources, qExpectations)
}

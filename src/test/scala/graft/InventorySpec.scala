package graft

import org.scalatest.funsuite.AnyFunSuite

/** The QA-surface RATCHET (r9) — the structural fix for two rounds of
  * "a query landed in the end-of-round snapshot with no hardening":
  * every DECLARED query must be explicitly triaged into the repo's
  * verification surfaces, and a new `Q(...)` fails this suite until it
  * is. No Spark session — pure set algebra over the companion ledgers
  * plus the committed audit artifacts, so the whole audit costs
  * milliseconds and runs on every `sbt test`.
  *
  * Surfaces audited:
  *  - plan shape: QueriesPlanSpec.pinned (run-ledger-verified by that
  *    suite's own meta test) ∪ a PLANS.md section ∪ a documented
  *    exemption below;
  *  - partition invariance: PartitionInvarianceSpec.shuffleSensitive ∪
  *    a documented exemption below;
  *  - correctness oracle: SparkEntry.oracleSql ∪ the by-design
  *    engine-specific-sketch allowlist (each law-verified by its own
  *    green spec).
  */
class InventorySpec extends AnyFunSuite {

  private val declared: Set[String] = SparkEntry.queries.keySet.toSet

  /** PLANS.md section names, mapped to the declared query each audits:
    * `## q_x`, `## q_x (final micro-batch)`, and the iterative
    * `## q_x_round` bodies (the round IS the repeated unit — the
    * declared query's own plan is just a checkpoint scan).
    */
  private def plansMdAudited: Set[String] = {
    val roundOwner = Map(
      "q_dedup_cc_round" -> "q_dedup_cc",
      "q_pagerank_round" -> "q_pagerank",
      "q_bpe_round" -> "q_bpe_train",
      "q_label_prop_round" -> "q_label_prop",
      "q_khop_round" -> "q_khop",
      "q_random_walk_round" -> "q_random_walk")
    val src = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("PLANS.md")), "UTF-8")
    "(?m)^## (q_[a-z0-9_]+)".r.findAllMatchIn(src).map(_.group(1))
      .map(n => roundOwner.getOrElse(n, n)).toSet
  }

  /** Queries with neither a QueriesPlanSpec pin nor a PLANS.md section,
    * each exempt for a stated structural reason. A name may live here
    * ONLY while it stays out of both surfaces — the staleness assert
    * below evicts it the moment a pin or section appears.
    */
  private val planExempt: Set[String] = Set(
    // per-row projection surfaces: scan → codegen projection → total-
    // order sort; no join/agg/window touches data scale, so there is
    // no load-bearing plan shape beyond pushdown (pinned on siblings)
    "q_scalar_array", "q_scalar_date", "q_scalar_json", "q_scalar_math",
    "q_scalar_string", "q_normalize", "q_fingerprint", "q_lang_id",
    "q_token_count", "q_quality_score", "q_text_stats",
    // single-aggregate / window variants whose exact shape a pinned or
    // audited sibling locks (q_agg_hash, q_window_range/percent,
    // q_sample_per_key's WindowGroupLimit, q_scd2's single window)
    "q_agg_distinct", "q_rollup", "q_cube", "q_grouping_sets",
    "q_window_rank", "q_window_lag", "q_window_running",
    "q_topk_per_key", "q_sessions", "q_winsorize", "q_cdc_apply",
    "q_union", "q_except", "q_intersect", "q_unpivot",
    "q_heavy_hitters", "q_top_terms", "q_sample_stratified",
    "q_quantiles", "q_quantiles_exact", "q_approx_distinct",
    // exact brute-force baselines: one projection + TakeOrdered funnel
    // (the documented anchors of their ANN twins, which ARE audited)
    "q_knn_cosine", "q_sql_knn", "q_ann_lsh",
    "q_dedup_exact", "q_dedup_key",
    // iterative drivers whose per-round body is the audited unit but
    // which share that body with an already-sectioned sibling family
    // (CC: q_dedup_cc_round; Lloyd rounds: KMeansSpec inertia law)
    "q_embedding_cc", "q_kmeans",
    "q_bpe_apply", "q_bpe_train_char", "q_bpe_vocab",
    // streaming replays without a dedicated micro-batch section: the
    // stateful shapes on audit (join / dedup / sample) cover the
    // operator classes; ReplaySpec holds each query's batch-twin law
    "q_stream_cdc", "q_stream_funnel", "q_stream_incremental_dedup",
    "q_stream_join_outer", "q_stream_quality", "q_stream_sessions",
    "q_stream_sliding", "q_stream_topk", "q_stream_window",
    // reference ingest + calendar ops: IngestSpec drives them end-to-
    // end and the ingest scan-shape is pinned (shuffle-free)
    "q_url_source", "q_url_source_unquoted", "q_meta_stats",
    "q_ingest_auto_date", "q_auto_date", "q_auto_date_agg",
    "q_nth_working_day", "q_publish_date", "q_jsonl_roundtrip",
    // multimodal object-stage decodes: same MapPartitions seam as the
    // sectioned q_mm_audio; MultimodalSpec drives the codec contracts
    "q_mm_decode", "q_mm_decode_ppm", "q_mm_frames", "q_mm_phash",
    "q_mm_resize", "q_multimodal_join", "q_multimodal_meta")

  test("plan surface: every declared query is pinned, PLANS.md-audited, or exempt") {
    val covered = QueriesPlanSpec.pinned ++ plansMdAudited ++ planExempt
    val missing = declared -- covered
    assert(missing.isEmpty,
      s"declared queries with NO plan triage (pin it, PlanDump it, or exempt it " +
        s"with a reason): ${missing.toSeq.sorted.mkString(", ")}")
    val ghosts = (QueriesPlanSpec.pinned ++ planExempt) -- declared
    assert(ghosts.isEmpty, s"ledger entries for undeclared queries: $ghosts")
  }

  test("plan exemptions are not stale: an exempt query has neither pin nor section") {
    val stale = planExempt & (QueriesPlanSpec.pinned ++ plansMdAudited)
    assert(stale.isEmpty,
      s"now-covered queries still in planExempt (delete them): ${stale.toSeq.sorted}")
  }

  /** Queries outside the 4-vs-32-partition sweep, by structural class.
    * The sweep list itself is in PartitionInvarianceSpec (one place).
    */
  private val invarianceExempt: Set[String] = Set(
    // per-row projections + total-order output: no data-scale shuffle
    // exists whose partitioning could matter (sort is contract-total)
    "q_filter", "q_topk", "q_sample_hash", "q_split_assign",
    "q_scalar_array", "q_scalar_date", "q_scalar_json", "q_scalar_math",
    "q_scalar_string", "q_normalize", "q_fingerprint", "q_lang_id",
    "q_token_count", "q_quality_score", "q_pii_redact", "q_repetition",
    "q_text_normalize", "q_chunk_overlap", "q_weighted_sample",
    "q_unpivot", "q_span_corruption",
    // merge-order-sensitive approx percentile sketch — QuantileSpec
    // holds its rank-error law; a 4-vs-32 sweep would pin an
    // implementation detail (the sketch merge tree), not a contract
    "q_quantiles",
    // projection + TakeOrdered funnels (zero or stat-only exchanges)
    "q_ann_ivf", "q_ann_pq", "q_knn_cosine", "q_sql_knn", "q_ann_lsh",
    "q_maxsim", "q_maxsim_ann",
    // driver-looped iteratives behind Materialize checkpoints: each
    // round's determinism is the invariant, proven by the re-derivation
    // laws in GraphSpec/KMeansSpec/VocabSpec/DedupSpec — a 4-vs-32
    // sweep of the full loop re-tests only what those laws already fix
    "q_pagerank", "q_embedding_cc", "q_kmeans", "q_semdedup",
    "q_bpe_train", "q_bpe_train_char", "q_bpe_apply", "q_bpe_vocab",
    // streaming replays: micro-batch boundaries, not shuffle counts,
    // are the risk axis — ReplaySpec's trigger-split and restart laws
    // cover exactly that (state partitions are pinned by the harness)
    "q_stream_anomaly", "q_stream_cdc", "q_stream_dedup",
    "q_stream_funnel", "q_stream_incremental_dedup", "q_stream_join",
    "q_stream_join_outer", "q_stream_quality", "q_stream_sample",
    "q_stream_sessions", "q_stream_sliding", "q_stream_topk",
    "q_stream_window", "q_stream_pit",
    // lake-layout / metadata ops: the result is a file-level property
    // (pruning, visibility, compaction) proven by PartitionedSpec's FS
    // laws; the data-plane plan is a plain pruned scan
    "q_partition_prune", "q_compact", "q_manifest_skip", "q_time_travel",
    "q_vacuum", "q_orc_roundtrip", "q_jsonl_roundtrip",
    // ingest + calendar: driver-small or shuffle-free pinned scans
    "q_ingest_pp", "q_ingest_auto_date", "q_auto_date", "q_auto_date_agg",
    "q_url_source", "q_url_source_unquoted", "q_meta_stats",
    "q_nth_working_day", "q_publish_date",
    // multimodal object stages: per-row batch decode, no shuffle
    "q_mm_audio", "q_mm_decode", "q_mm_decode_ppm", "q_mm_frames",
    "q_mm_phash", "q_mm_resize", "q_multimodal_join", "q_multimodal_meta")

  test("invariance surface: every declared query is swept at 4-vs-32 partitions or exempt") {
    val swept = PartitionInvarianceSpec.shuffleSensitive.toSet
    val missing = declared -- swept -- invarianceExempt
    assert(missing.isEmpty,
      s"declared queries with NO invariance triage: ${missing.toSeq.sorted.mkString(", ")}")
    val stale = invarianceExempt & swept
    assert(stale.isEmpty, s"swept queries still in invarianceExempt: ${stale.toSeq.sorted}")
    val ghosts = (swept ++ invarianceExempt) -- declared
    assert(ghosts.isEmpty, s"ledger entries for undeclared queries: $ghosts")
  }

  /** The by-design rows-only queries: engine-specific sketches with no
    * ANSI-SQL-expressible oracle, each carrying its own law spec.
    */
  private val noOracleByDesign: Set[String] = Set(
    "q_approx_distinct", // HLL++ — law-spec'd in QualityProfileSpec
    "q_quantiles", // approx percentile sketch — QuantileSpec
    "q_cms_terms", // count-min sketch — CmsSpec
    "q_decontaminate_bloom", // Bloom filter — DedupSpec false-positive law
    "q_dedup_simhash", // simhash bit-bands — DedupSpec hamming law
    "q_mm_phash", // perceptual hash — MultimodalSpec
    "q_profile_approx") // HLL++ profile — QualityProfileSpec

  test("oracle surface: declared minus oracled is EXACTLY the by-design sketch list") {
    val unoracled = declared -- SparkEntry.oracleSql.keySet
    assert(unoracled == noOracleByDesign,
      s"unexpectedly missing oracles: ${(unoracled -- noOracleByDesign).toSeq.sorted}; " +
        s"allowlisted but now oracled: ${(noOracleByDesign -- unoracled).toSeq.sorted}")
  }

  test("SURVEY.md documents every declared query (the r8 no-SURVEY-row class)") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val undocumented = declared.filterNot(n => survey.contains(s"`$n`"))
    assert(undocumented.isEmpty,
      s"declared queries with no SURVEY.md mention: ${undocumented.toSeq.sorted.mkString(", ")}")
  }

  test("SURVEY.md closing gate matches the live inventory (the r8 drift class)") {
    val src = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val gate = raw"Closing gate \(r\d+\):\s+(\d+)\s+tests green,\s+(\d+)/(\d+)\s+sf0\.01 oracles,\s+(\d+)\s+declared".r
    gate.findFirstMatchIn(src.replaceAll("\\s+", " ")) match {
      case Some(m) =>
        assert(m.group(2) == m.group(3), "gate must state N/N oracles")
        assert(m.group(2).toInt == SparkEntry.oracleSql.size,
          s"gate says ${m.group(2)} oracles; SparkEntry declares ${SparkEntry.oracleSql.size}")
        assert(m.group(4).toInt == declared.size,
          s"gate says ${m.group(4)} declared; SparkEntry declares ${declared.size}")
      case None => fail("SURVEY.md closing gate sentence not found / format drifted")
    }
  }
}

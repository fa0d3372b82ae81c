package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E19 — vocabulary induction: distributed BPE merge training
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
  * with Subword Units") — the tokenizer-training pass an LLM data
  * pipeline runs over the corpus BEFORE any token-count, packing, or
  * perplexity stage exists. Each round counts all adjacent symbol
  * pairs, picks the most frequent (the next merge rule), and rewrites
  * every sequence with the pair fused into one symbol; the learned
  * artifact is the ranked merge table.
  *
  * The alphabet is pluggable and BOTH levels are declared queries:
  * q_bpe_train runs over whitespace words (the learned merges are the
  * corpus's top collocations — "phrase BPE", human-auditable), and
  * q_bpe_train_char runs the SAME loop over single characters (the
  * Sennrich original) — the only difference is [[seq0]]'s delimiter.
  *
  * Exactness/engine-parity discipline: sequences are carried as
  * DOUBLE-unit-separator strings `US US w1 US US w2 US US … US US`
  * (US = chr(31), never in the ASCII corpus). A merge rewrites the
  * pattern `US a US US b US` → `US a RS b US` (RS = chr(30)) via
  * `replace`: each match consumes only ONE char of each bounding
  * `US US`, so back-to-back occurrences (`a b a b`) each keep a
  * separator to match on and BOTH fuse, while overlapping occurrences
  * (`a a a` under merge (a,a)) cannot both match — `replace`'s
  * left-to-right non-overlapping scan is therefore EXACTLY
  * greedy-leftmost BPE merge application, identical in Spark
  * (UTF8String.replace) and DuckDB. (A single-separator encoding gets
  * the overlap case right but silently skips the second of two
  * back-to-back matches — the boundary separator is consumed by the
  * first match; VocabSpec's brute-force cross-check is what catches
  * that class of defect.) Pair counts are exact BIGINTs; the per-round
  * argmax is tie-broken by the (pa, pb) binary string order. The whole
  * 6-round training loop is therefore HASH-ORACLED: [[bpeOracle]]
  * emits the DuckDB CTE chain from the same Scala loop as the Spark
  * iterations (the q_pagerank / q_zorder_key one-code-path
  * discipline), so round count, tiebreaks, and rewrite arithmetic
  * cannot drift between engines.
  *
  * Scale shape (the reason BPE training is a cluster job at all): each
  * round is ONE map-side-combined pair-count aggregation (the only
  * shuffle — pair keys, combiner collapses per-partition duplicates
  * before the exchange), ONE TakeOrderedAndProject argmax (per-partition
  * heap, 1 row to the driver's plan — never a global sort), and ONE
  * shuffle-free per-row `replace` projection over the corpus with the
  * 1-row merge rule BROADCAST onto it. State between rounds is the
  * rewritten corpus, checkpointed per round ([[Materialize]]) so
  * lineage stays O(1) in the round count — the same Pregel-on-DataFrames
  * pattern as connectedComponents/PageRank. Driver-side control only:
  * the loop counter; no corpus data ever reaches the driver. Production
  * BPE runs thousands of merges with batched rule application
  * (non-overlapping top-K per round); the per-round dataflow is
  * unchanged.
  */
object Vocab {
  import Tables._

  private val MERGES = 6

  /** Unit separator between symbols (never occurs in the ASCII corpus). */
  private val US = 31
  /** Record separator fusing the two halves of a merged symbol. */
  private val RS = 30

  /** Adjacent-pair counts over the current symbol sequences. */
  private def pairCounts(seqDf: DataFrame): DataFrame =
    seqDf
      .select(expr("filter(split(seq, chr(31)), x -> x != '')").as("t"))
      .where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS pa, t[i+1] AS pb))")).as("p"))
      .select(col("p.pa"), col("p.pb"))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("freq"))

  /** Initial symbol sequences (double-separator encoding, see above).
    * `delim` is the alphabet switch: " " = whitespace words (phrase
    * BPE, the human-auditable declared default); "" = characters (true
    * Sennrich BPE — Spark's `split(text, '')` and DuckDB's
    * `string_split(text, '')` both emit the per-char list, trailing
    * empties removed by the shared filter). NOTHING else changes —
    * the "swap the alphabet" claim, now executed, not asserted.
    */
  private def seq0(s: SparkSession, d: String, delim: String = " "): DataFrame = {
    val sep2 = US.toChar.toString * 2
    fanOut(documents(s, d)).select(
      col("doc_id"),
      concat(lit(sep2),
        array_join(expr(s"filter(split(text, '$delim'), x -> x != '')"), sep2),
        lit(sep2)).as("seq"))
  }

  /** The per-round argmax: next merge rule, tie-broken totally. */
  private def bestPair(seqDf: DataFrame): DataFrame =
    pairCounts(seqDf)
      .orderBy(col("freq").desc, col("pa").asc, col("pb").asc)
      .limit(1)

  /** The one-round rewrite on (seq, bpa, bpb) columns — THE expression
    * whose equivalence to greedy-leftmost merge application the whole
    * encoding argument rests on. Exposed so VocabSpec's ScalaCheck
    * sweep exercises the production string, not a test-side copy.
    */
  private[ops] val mergeRewriteExpr: String =
    "replace(seq, chr(31) || bpa || chr(31) || chr(31) || bpb || chr(31)," +
      " chr(31) || bpa || chr(30) || bpb || chr(31))"

  /** Greedy-leftmost application of the (1-row, broadcast) merge rule. */
  private def applyMerge(seqDf: DataFrame, best: DataFrame): DataFrame =
    seqDf
      .crossJoin(broadcast(best.select(col("pa").as("bpa"), col("pb").as("bpb"))))
      .select(col("doc_id"), expr(mergeRewriteExpr).as("seq"))

  /** The [[MERGES]]-round training loop over an initial alphabet's
    * sequences — shared verbatim by the word- and char-level declared
    * queries (the alphabet is the ONLY degree of freedom).
    */
  private def trainMerges(seqInit: DataFrame): DataFrame = {
    var seq = Materialize(seqInit)
    val merges = Seq.newBuilder[DataFrame]
    for (k <- 1 to MERGES) {
      // 1 row, checkpointed so the merge table and the rewrite below
      // share one computation of the argmax
      val best = Materialize(bestPair(seq))
      merges += best.select(lit(k).as("merge_rank"), col("pa"), col("pb"), col("freq"))
      seq = Materialize(applyMerge(seq, best))
    }
    merges.result().reduce(_ unionByName _)
      .select(col("merge_rank"),
        expr("replace(pa, chr(30), ' ')").as("lhs"),
        expr("replace(pb, chr(30), ' ')").as("rhs"),
        col("freq"))
      .orderBy("merge_rank")
  }

  val qBpeTrain = Q(
    "q_bpe_train",
    (s, d) => trainMerges(seq0(s, d)),
    Some(bpeOracle(" "))
  )

  /** CHARACTER-level BPE — the Sennrich original: same loop, alphabet
    * swapped to single characters. Merged symbols display with their
    * fuse points as spaces (rank-1 on this corpus fuses two letters
    * into a bigram token). Declared + hash-oracled, closing VERDICT
    * r5's "documented, not declared" gap: the oracle CTE chain is the
    * SAME generator with the same alphabet swap, so round count,
    * tiebreaks, and rewrite arithmetic are verified at char level too.
    */
  val qBpeTrainChar = Q(
    "q_bpe_train_char",
    (s, d) => trainMerges(seq0(s, d, "")),
    Some(bpeOracle(""))
  )

  /** Plan-audit hook (PLANS.md): ONE BPE training round as a LAZY
    * DataFrame — the pair-count shuffle, TakeOrderedAndProject argmax,
    * and broadcast-rule rewrite that repeat [[MERGES]] times; the
    * declared query's final plan hides them behind per-round
    * [[Materialize]] checkpoints.
    */
  private[graft] def bpeRound(s: SparkSession, d: String): DataFrame = {
    val seq = seq0(s, d)
    applyMerge(seq, bestPair(seq))
  }

  /** The learned tokenizer APPLIED: per-document symbol counts before
    * and after the [[MERGES]] trained merge rules — the vocabulary-
    * compression audit (how many sequence positions the merges
    * reclaim) and the other half of the tokenizer lifecycle: qBpeTrain
    * LEARNS the artifact, this query RUNS it over the corpus, exactly
    * what the production tokenize stage does with a frozen merges.txt.
    *
    * Same training loop, then one symbol-count projection of the
    * round-[[MERGES]] sequences against the initial ones — shuffle-free
    * beyond training itself. The oracle extends the training CTE chain
    * (the final rewritten corpus s6 is already its last state), so the
    * hash match verifies the APPLIED tokenization corpus-wide, not just
    * the rule table.
    */
  val qBpeApply = Q(
    "q_bpe_apply",
    (s, d) => {
      var seq = Materialize(seq0(s, d))
      val before = seq.select(col("doc_id"),
        size(expr("filter(split(seq, chr(31)), x -> x != '')")).cast("long")
          .as("n_before"))
      // unlike training, the argmax is consumed ONCE (inside the
      // rewrite's broadcast build), so it needs no eager checkpoint —
      // each round is one job; seq itself must still checkpoint per
      // round or the argmax subtree would re-embed the full prior plan
      // a second time each round (2^rounds blowup)
      for (_ <- 1 to MERGES)
        seq = Materialize(applyMerge(seq, bestPair(seq)))
      val after = seq.select(col("doc_id"),
        size(expr("filter(split(seq, chr(31)), x -> x != '')")).cast("long")
          .as("n_after"))
      before.join(after, "doc_id")
        .select("doc_id", "n_before", "n_after")
        .orderBy("doc_id")
    },
    Some(bpeApplyOracle)
  )

  /** The learned VOCABULARY — the third artifact of the tokenizer
    * lifecycle (train → vocab → apply): every distinct symbol of the
    * post-merge corpus with its frequency, fuse points shown as
    * spaces. This is the vocab.json a tokenizer ships: base alphabet
    * survivors + the merged symbols, with the counts that decide vocab
    * truncation. One explode + one map-side-combined count over the
    * round-[[MERGES]] sequences; the oracle extends the shared CTE
    * chain to unnest the same final state.
    */
  val qBpeVocab = Q(
    "q_bpe_vocab",
    (s, d) => {
      var seq = Materialize(seq0(s, d))
      for (_ <- 1 to MERGES)
        seq = Materialize(applyMerge(seq, bestPair(seq)))
      seq
        .select(explode(expr("filter(split(seq, chr(31)), x -> x != '')")).as("sym"))
        .groupBy("sym")
        .agg(count(lit(1)).as("freq"))
        .select(expr("replace(sym, chr(30), ' ')").as("token"), col("freq"))
        .orderBy(col("freq").desc, col("token").asc)
        .limit(50)
    },
    Some(bpeCtes(" ") + s"""
      SELECT replace(u.sym, chr($RS), ' ') AS token, count(*) AS freq
      FROM (SELECT unnest(list_filter(string_split(seq, chr($US)), x -> x <> '')) AS sym
            FROM s$MERGES) u
      GROUP BY u.sym
      ORDER BY freq DESC, token ASC
      LIMIT 50""")
  )

  /** One code path emits the per-round CTEs, so the Spark loop above
    * and the DuckDB replay cannot diverge in round count, tiebreak, or
    * rewrite arithmetic. Shared by BOTH E19 oracles: the training
    * oracle reads the per-round argmaxes b1..bN, the apply oracle reads
    * the chain's final corpus state sN.
    */
  private def bpeCtes(delim: String): String = {
    val rounds = (1 to MERGES).map { k =>
      s"""p$k AS (
         |  SELECT u.pa AS pa, u.pb AS pb, count(*) AS freq
         |  FROM (SELECT unnest([{'pa': t[i], 'pb': t[i+1]}
         |                       for i in range(1, len(t))]) AS u
         |        FROM (SELECT list_filter(string_split(seq, chr($US)), x -> x <> '') AS t
         |              FROM s${k - 1}))
         |  GROUP BY 1, 2),
         |b$k AS (SELECT pa, pb, freq FROM p$k
         |        ORDER BY freq DESC, pa ASC, pb ASC LIMIT 1),
         |s$k AS (SELECT doc_id,
         |               replace(seq,
         |                       chr($US) || b.pa || chr($US) || chr($US) || b.pb || chr($US),
         |                       chr($US) || b.pa || chr($RS) || b.pb || chr($US)) AS seq
         |        FROM s${k - 1} CROSS JOIN b$k b)""".stripMargin
    }.mkString(",\n")
    s"""WITH s0 AS (
       |  SELECT doc_id,
       |         repeat(chr($US), 2)
       |           || array_to_string(list_filter(string_split(text, '$delim'),
       |                                          x -> x <> ''), repeat(chr($US), 2))
       |           || repeat(chr($US), 2) AS seq
       |  FROM documents),
       |$rounds""".stripMargin
  }

  // NOTE: bpeCtes is CONCATENATED, never re-interpolated into a
  // .stripMargin template — a second stripMargin would eat one pipe of
  // every line-leading `||` concat operator inside it.
  private def bpeOracle(delim: String): String = {
    val out = (1 to MERGES)
      .map(k =>
        s"""SELECT $k AS merge_rank, replace(pa, chr($RS), ' ') AS lhs,
           |       replace(pb, chr($RS), ' ') AS rhs, freq FROM b$k""".stripMargin)
      .mkString("\nUNION ALL\n")
    bpeCtes(delim) + "\n" + out + "\nORDER BY merge_rank"
  }

  private def bpeApplyOracle: String =
    bpeCtes(" ") + "\n" +
      s"""SELECT s0.doc_id,
         |       CAST(len(list_filter(string_split(s0.seq, chr($US)), x -> x <> '')) AS BIGINT) AS n_before,
         |       CAST(len(list_filter(string_split(s$MERGES.seq, chr($US)), x -> x <> '')) AS BIGINT) AS n_after
         |FROM s0 JOIN s$MERGES ON s0.doc_id = s$MERGES.doc_id
         |ORDER BY s0.doc_id""".stripMargin

  // -------------------------------------------------------------------
  // UNIGRAM-LM TOKENIZER TRAINING (r13) — the OTHER production
  // tokenizer family (Kudo 2018, "Subword Regularization": the
  // SentencePiece unigram model): where BPE grows a vocabulary
  // bottom-up by merges, unigram LM starts from an over-complete
  // substring candidate set and fits piece probabilities by EM,
  // pruning pieces the model stops using.
  //
  // Exact-arithmetic form (the Q discipline — no floats in
  // hash-compared state): this is VITERBI (hard) EM. Piece
  // probabilities are quantized to powers of two via [[TextOps.flog2]]
  // integer bits — log2 P(p) = flog2(c_p + 1) − flog2(C + 1) with
  // plus-one smoothing, C = the round's total piece mass — so a
  // segmentation's log-probability is an integer sum and the E-step's
  // argmax segmentation (Viterbi DP over each word) is an exact
  // integer maximization with a total tiebreak (score DESC, then
  // split point ASC = longest-last-piece). Soft EM's forward-backward
  // posteriors are irreducibly float — the same reason q_lm_backoff
  // quantizes Stupid Backoff — and SentencePiece's ENCODE step is this
  // very Viterbi; fixed-round hard EM keeps every round's state
  // (counts, vocab) bit-identical across engines and partitionings.
  //
  // Algorithm (fixed rounds, generated-CTE-chain oracled like BPE):
  //   seed   candidate pieces = every substring of length ≤ ULM_PLEN of
  //          the distinct-word relation, weighted by word frequency;
  //          vocab_0 = ALL single chars (coverage guarantee — never
  //          pruned) ∪ top-ULM_SEED multi-char candidates.
  //   E-step Viterbi-segment every distinct word under vocab_{r-1}
  //          (DP unrolled over positions 1..ULM_LMAX, then a backtrack
  //          walk emits the chosen pieces); expected counts = piece
  //          occurrences × word frequency.
  //   M-step re-estimate bits from counts; PRUNE multi-char pieces the
  //          best segmentations stopped using (count 0) — chars stay.
  //   output the final vocabulary: top-ULM_TOPK (piece, freq, bits).
  //
  // Scale shape: the ONLY corpus-scale stage is the word-count
  // aggregate (one map-side-combined groupBy — the same shuffle as
  // BPE's pair counts); everything after runs on the DISTINCT-WORD
  // relation with frequencies — exactly how SentencePiece/subword-nmt
  // trainers operate (train on word-and-count tables, not raw text).
  // That relation is vocabulary-sized but still distributed: the DP
  // iterations are joins keyed on (word, position), never a driver
  // collect; per-round state is Materialize-checkpointed so lineage
  // stays O(1) in the unrolled step count. Words longer than ULM_LMAX
  // are excluded from training (SentencePiece's
  // max_sentencepiece_length discipline; the fixture corpus tops out
  // at 8 chars, so nothing is dropped at any declared scale).
  // -------------------------------------------------------------------

  /** Trainable word-length cap (DP unroll depth). */
  private val ULM_LMAX = 8
  /** Max candidate piece length. */
  private val ULM_PLEN = 4
  /** Multi-char seed candidates kept (freq DESC, piece ASC). */
  private val ULM_SEED = 40
  /** Fixed EM rounds. */
  private val ULM_ROUNDS = 2
  /** Output vocabulary rows. */
  private val ULM_TOPK = 20

  private def flog2(c: org.apache.spark.sql.Column) = TextOps.flog2(c)

  /** The distinct-word relation with frequencies — the trainer's whole
    * world after the one corpus-scale aggregate.
    */
  private def ulmWords(s: SparkSession, d: String): DataFrame =
    fanOut(documents(s, d))
      .select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "" && length(col("word")) <= ULM_LMAX)
      .groupBy("word")
      .agg(count(lit(1)).as("wfreq"))

  /** Every (start j, end i, piece) substring slot of every distinct
    * word, piece length ≤ ULM_PLEN — the DP lattice's edge set.
    */
  private def ulmSubs(words: DataFrame): DataFrame =
    words
      .select(col("word"), explode(expr("sequence(0, length(word) - 1)")).as("j"))
      .select(col("word"), col("j"),
        explode(expr(s"sequence(1, least($ULM_PLEN, length(word) - j))")).as("l"))
      .select(col("word"), col("j"), (col("j") + col("l")).as("i"),
        expr("substring(word, j + 1, l)").as("piece"))

  /** One Viterbi E-STEP under `vocab` as the POSITION-UNROLLED
    * DataFrame DP — r13's implementation, kept as the
    * cross-implementation REFERENCE: the declared queries now run the
    * same DP as ONE native codegen projection
    * ([[graft.functions.UlmSegment]], see [[ulmTrainedVocabFast]]),
    * and VocabSpec pins the two paths bit-equal round for round. The
    * unroll returns every word's chosen pieces (word, piece — one row
    * per piece occurrence).
    *
    * Each DP state CARRIES ITS PATH as an array column (words are ≤
    * [[ULM_LMAX]] chars, so the array is tiny) instead of a
    * back-pointer: the best segmentation falls out of the final state
    * directly, halving the per-round checkpoint count the r13 original
    * paid for a separate backtrack walk (8 DP steps + 8 walk steps →
    * 8 total; measured 13.3 → ~7 s at sf0.1).
    */
  private[graft] def ulmEStep(words: DataFrame, subs: DataFrame, vocab: DataFrame): DataFrame = {
    // the round's total piece mass → the log2-denominator bits
    // (1 row, broadcast onto every DP edge)
    val mass = vocab.agg(flog2(sum(col("c")) + 1).cast("long").as("b"))
    // Viterbi DP, unrolled over end positions: f(word, i) = best
    // integer log-prob of segmenting word[1..i], with its piece path
    // (tiebreak j ASC = longest last piece)
    var f = words.select(col("word"), lit(0).as("idx"),
      lit(0L).as("score"), array().cast("array<string>").as("pieces"))
    for (i <- 1 to ULM_LMAX) {
      val byWord = org.apache.spark.sql.expressions.Window
        .partitionBy(col("word"))
        .orderBy(col("score").desc, col("j").asc)
      val fi = subs.where(col("i") === i)
        .join(vocab, "piece")
        .join(f.select(col("word"), col("idx").as("j"),
          col("score").as("prev"), col("pieces").as("prefix")), Seq("word", "j"))
        .crossJoin(broadcast(mass))
        .select(col("word"), col("j"),
          (col("prev") + flog2(col("c") + 1) - col("b")).cast("long").as("score"),
          concat(col("prefix"), array(col("piece"))).as("pieces"))
        .withColumn("rn", row_number().over(byWord))
        .where(col("rn") === 1)
        .select(col("word"), lit(i).as("idx"), col("score"), col("pieces"))
      f = Materialize(f.unionByName(fi))
    }
    // the best segmentation is the full-word state's path
    f.where(col("idx") === length(col("word")))
      .select(col("word"), explode(col("pieces")).as("piece"))
  }

  /** The UNROLLED full training loop (r13 reference path — see
    * [[ulmEStep]]): seed → [[ULM_ROUNDS]] × (E-step, M-step + prune).
    * Returns (words, subs, final vocab); feeds the spec-only
    * [[unigramLmUnrolled]]/[[unigramApplyUnrolled]] twins.
    */
  private[graft] def ulmTrainedVocab(s: SparkSession, d: String): (DataFrame, DataFrame, DataFrame) = {
    val words = Materialize(ulmWords(s, d))
    val subs = Materialize(ulmSubs(words))
    val sfreq = Materialize(
      subs.join(words, "word").groupBy("piece").agg(sum("wfreq").as("c")))
    val chars = Materialize(sfreq.where(length(col("piece")) === 1))
    val multi = sfreq.where(length(col("piece")) >= 2)
      .orderBy(col("c").desc, col("piece").asc).limit(ULM_SEED)
    var vocab = Materialize(chars.unionByName(multi))
    for (_ <- 1 to ULM_ROUNDS) {
      val counts = Materialize(ulmEStep(words, subs, vocab)
        .join(words, "word")
        .groupBy("piece").agg(sum("wfreq").as("c")))
      // M-step + prune: chars persist (count 0 allowed — coverage);
      // multi-char pieces survive only while the Viterbi E-step uses them
      vocab = Materialize(
        chars.select(col("piece"))
          .join(counts, Seq("piece"), "left")
          .select(col("piece"), coalesce(col("c"), lit(0L)).as("c"))
          .unionByName(counts.where(length(col("piece")) >= 2)))
    }
    (words, subs, vocab)
  }

  // -------------------------------------------------------------------
  // r14 FAST PATH — the E-step as ONE native codegen projection.
  // The r13 unroll paid ~16-24 checkpointed join/window micro-jobs per
  // query whose FIXED overhead dominated at every measured scale
  // (sf0.1 11.5 s + 7.3 s; 38.5 s at sf10) for a DP that is row-local
  // over ≤ ULM_LMAX-char words — exactly the LcsLength/graft_lcs shape.
  // graft.functions.UlmSegment runs the identical DP (same integer
  // bits, same smallest-j tiebreak) per word inside whole-stage
  // codegen; the vocabulary rides the plan as a foldable map literal
  // (broadcast-sized BY CONSTRUCTION: alphabet + ≤ ULM_SEED pieces).
  // Driver traffic is vocab-sized only — the K×dim centroid-sync
  // precedent — and each round is one map-side-combined aggregate over
  // the materialized distinct-word relation. The unrolled pipeline
  // above survives as the spec's reference: VocabSpec pins both query
  // outputs bit-equal to it, and the DuckDB CTE-chain oracle
  // re-verifies the DP corpus-wide on every t2 run.
  // -------------------------------------------------------------------

  /** floor(log2(x)) for x ≥ 1, driver-side — the exact integer the
    * column-side [[flog2]] (`length(bin(x)) - 1`) computes.
    */
  private def flog2L(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)

  /** One round's piece→weight table: flog2(c+1) − flog2(Σc+1), the
    * per-edge bits the unrolled DP's join computed — precomputed once
    * over the vocab-sized relation so the DP's hot path is a pure
    * hash-map lookup.
    */
  private def ulmWeightMap(vocab: Seq[(String, Long)]): Map[String, Long] = {
    val b = flog2L(vocab.iterator.map(_._2).sum + 1)
    vocab.iterator.map { case (p, c) => p -> (flog2L(c + 1) - b) }.toMap
  }

  /** The E-step column: Viterbi-segment `word` under the frozen
    * weights ([[graft.functions.UlmSegment]] through the SQL registry,
    * so the pure-SQL surface gets the same primitive). NULL = no
    * segmentation (explode drops it, mirroring the unrolled DP's
    * absent final state).
    */
  private def ulmSegCol(word: org.apache.spark.sql.Column,
      weights: Map[String, Long]): org.apache.spark.sql.Column =
    call_function("graft_ulm_segment", word, typedLit(weights))

  private def utf32Len(p: String): Int = p.codePointCount(0, p.length)

  /** The r14 training loop: same seed relation, same M-step algebra as
    * [[ulmTrainedVocab]], but each E-step is ONE projection. Returns
    * (materialized words, final vocab as driver rows — vocab-sized by
    * construction).
    */
  private def ulmTrainedVocabFast(s: SparkSession, d: String): (DataFrame, Array[(String, Long)]) = {
    val words = Materialize(ulmWords(s, d))
    val sfreq = ulmSubs(words).join(words, "word")
      .groupBy("piece").agg(sum("wfreq").as("c"))
    // alphabet + top-seed collects — vocab-sized driver metadata, never
    // corpus rows (the aggregation itself is distributed)
    val chars = sfreq.where(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val multi = sfreq.where(length(col("piece")) >= 2)
      .orderBy(col("c").desc, col("piece").asc).limit(ULM_SEED)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var vocab: Array[(String, Long)] = chars ++ multi
    for (_ <- 1 to ULM_ROUNDS) {
      val counts = words
        .select(col("wfreq"),
          explode(ulmSegCol(col("word"), ulmWeightMap(vocab.toSeq))).as("piece"))
        .groupBy("piece").agg(sum("wfreq").as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // M-step + prune: chars persist (count 0 allowed — coverage);
      // multi-char pieces survive only while the E-step uses them
      vocab = chars.map { case (p, _) => (p, counts.getOrElse(p, 0L)) } ++
        counts.iterator.filter { case (p, _) => utf32Len(p) >= 2 }.toArray.sortBy(_._1)
    }
    (words, vocab)
  }

  /** Spec-only twin of q_unigram_lm over the UNROLLED reference DP. */
  private[graft] def unigramLmUnrolled(s: SparkSession, d: String): DataFrame = {
    val (_, _, vocab) = ulmTrainedVocab(s, d)
    vocab.select(col("piece"), col("c").as("freq"),
        flog2(col("c") + 1).cast("long").as("bits"))
      .orderBy(col("freq").desc, col("piece").asc)
      .limit(ULM_TOPK)
  }

  val qUnigramLm = Q(
    "q_unigram_lm",
    (s, d) => {
      val (_, vocab) = ulmTrainedVocabFast(s, d)
      import s.implicits._
      // the final sort/limit stays IN Spark so string ordering is the
      // same UTF8String binary order the unrolled twin used
      vocab.toSeq.toDF("piece", "c")
        .select(col("piece"), col("c").as("freq"),
          flog2(col("c") + 1).cast("long").as("bits"))
        .orderBy(col("freq").desc, col("piece").asc)
        .limit(ULM_TOPK)
    },
    Some(ulmOracle)
  )

  /** The trained unigram model APPLIED — the tokenize stage with a
    * frozen vocabulary, closing the lifecycle exactly as [[qBpeApply]]
    * does for merges.txt: ONE more Viterbi E-step under the FINAL
    * vocabulary (SentencePiece's encode IS this DP) yields each
    * distinct word's piece count; the corpus tokenization is then a
    * vocabulary-sized join — explode the documents to words, look up
    * n_pieces per word, sum per doc. Words longer than [[ULM_LMAX]]
    * fall back to per-CHARACTER pieces (the coverage guarantee;
    * expressed identically in the oracle — the fixture corpus has
    * none, so the rule is load-bearing only at the contract level).
    * The oracle EXTENDS the training CTE chain with the encode round
    * (no M-step) and replays the same explode/lookup/sum, so the hash
    * verifies the applied tokenization corpus-wide.
    */
  /** Spec-only twin of q_unigram_apply over the UNROLLED reference DP. */
  private[graft] def unigramApplyUnrolled(s: SparkSession, d: String): DataFrame = {
    val (words, subs, vocab) = ulmTrainedVocab(s, d)
    val perWord = Materialize(ulmEStep(words, subs, vocab)
      .groupBy("word").agg(count(lit(1)).as("n_pieces")))
    ulmApplyTail(s, d, perWord)
  }

  /** The shared corpus-tokenization tail: explode documents to words,
    * look up n_pieces per word (vocab-sized lookup join), sum per doc;
    * words longer than [[ULM_LMAX]] (or unsegmentable) fall back to
    * per-CHARACTER pieces via the coalesce (the coverage guarantee).
    */
  private def ulmApplyTail(s: SparkSession, d: String, perWord: DataFrame): DataFrame = {
    val dw = fanOut(documents(s, d))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
    val perDoc = dw
      .join(perWord.hint("shuffle_hash"), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(coalesce(col("n_pieces"), length(col("word")).cast("long")))
          .as("n_tokens"))
    documents(s, d)
      .select(col("doc_id"))
      .join(perDoc.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      .orderBy("doc_id")
  }

  val qUnigramApply = Q(
    "q_unigram_apply",
    (s, d) => {
      val (words, vocab) = ulmTrainedVocabFast(s, d)
      // one more E-step under the FROZEN vocabulary (SentencePiece's
      // encode IS this DP) — a single projection; size() of the path
      // replaces the explode+count the unrolled twin paid
      val seg = ulmSegCol(col("word"), ulmWeightMap(vocab.toSeq))
      val perWord = words.select(col("word"), seg.as("seg"))
        .where(col("seg").isNotNull)
        .select(col("word"), size(col("seg")).cast("long").as("n_pieces"))
      ulmApplyTail(s, d, perWord)
    },
    Some(ulmApplyOracle)
  )

  /** One code path emits the unigram-LM CTE chain (the [[bpeCtes]]
    * discipline): the same Scala loops that drive the Spark rounds
    * above generate the DuckDB DP/backtrack CTEs, so unroll depth,
    * tiebreaks, smoothing, and prune rules cannot drift between
    * engines. All counts CAST to BIGINT (DuckDB sums to HUGEINT).
    */
  /** One round's CTEs — E-step DP + backtrack + emissions, and (for
    * training rounds) the M-step counts/vocab. `withMStep = false` is
    * the APPLY round: encode under the frozen vocabulary, no
    * re-estimation — the same distinction the Spark loop draws by
    * calling [[ulmEStep]] without the counts/vocab update.
    */
  private def ulmRoundCtes(r: Int, withMStep: Boolean): String = {
    val dp = (1 to ULM_LMAX).map { i =>
      s"""f${r}_$i AS MATERIALIZED (
         |  SELECT word, idx, score, pieces FROM f${r}_${i - 1}
         |  UNION ALL
         |  SELECT word, $i AS idx, score, pieces FROM (
         |    SELECT s.word AS word, s.j AS j,
         |           f.score + (length(bin(v.c + 1)) - 1) - m.b AS score,
         |           list_append(f.pieces, s.piece) AS pieces,
         |           row_number() OVER (PARTITION BY s.word
         |             ORDER BY f.score + (length(bin(v.c + 1)) - 1) - m.b DESC,
         |                      s.j ASC) AS rn
         |    FROM sub s
         |    JOIN v${r - 1} v USING (piece)
         |    JOIN f${r}_${i - 1} f ON f.word = s.word AND f.idx = s.j
         |    CROSS JOIN m$r m
         |    WHERE s.i = $i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val mStep =
      if (!withMStep) ""
      else s""",
        |c$r AS MATERIALIZED (SELECT piece, CAST(sum(wfreq) AS BIGINT) AS c
        |        FROM em$r JOIN wd USING (word) GROUP BY piece),
        |v$r AS MATERIALIZED (SELECT ch.piece, coalesce(c.c, 0) AS c
        |        FROM ch LEFT JOIN c$r c USING (piece)
        |        UNION ALL
        |        SELECT piece, c FROM c$r WHERE length(piece) >= 2)""".stripMargin
    s"""m$r AS MATERIALIZED (SELECT (length(bin(CAST(sum(c) AS BIGINT) + 1)) - 1) AS b FROM v${r - 1}),
       |f${r}_0 AS MATERIALIZED (SELECT word, 0 AS idx, CAST(0 AS BIGINT) AS score,
       |        CAST([] AS VARCHAR[]) AS pieces FROM wd),
       |$dp,
       |em$r AS MATERIALIZED (SELECT word, unnest(pieces) AS piece
       |        FROM f${r}_$ULM_LMAX WHERE idx = length(word))""".stripMargin + mStep
  }

  /** Seed CTEs + training rounds 1..[[ULM_ROUNDS]] — shared by both
    * unigram oracles (the [[bpeCtes]] concatenation discipline: never
    * re-interpolated into another stripMargin template).
    */
  private def ulmCtes: String = {
    val rounds = (1 to ULM_ROUNDS).map(r => ulmRoundCtes(r, withMStep = true))
      .mkString(",\n")
    s"""WITH wd AS MATERIALIZED (
       |  SELECT t AS word, count(*) AS wfreq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
       |  WHERE t <> '' AND length(t) <= $ULM_LMAX
       |  GROUP BY t),
       |sub AS MATERIALIZED (
       |  SELECT word, j, j + l AS i, substr(word, j + 1, l) AS piece
       |  FROM (SELECT word, j,
       |               unnest(range(1, least($ULM_PLEN, length(word) - j) + 1)) AS l
       |        FROM (SELECT word, unnest(range(0, length(word))) AS j FROM wd))),
       |sf AS MATERIALIZED (SELECT piece, CAST(sum(wfreq) AS BIGINT) AS c
       |       FROM sub JOIN wd USING (word) GROUP BY piece),
       |ch AS MATERIALIZED (SELECT piece, c FROM sf WHERE length(piece) = 1),
       |v0 AS MATERIALIZED (SELECT piece, c FROM ch
       |       UNION ALL
       |       SELECT piece, c FROM (SELECT piece, c FROM sf WHERE length(piece) >= 2
       |                             ORDER BY c DESC, piece ASC LIMIT $ULM_SEED)),
       |""".stripMargin + rounds
  }

  private def ulmOracle: String =
    ulmCtes + s"""
      |SELECT piece, c AS freq, CAST(length(bin(c + 1)) - 1 AS BIGINT) AS bits
      |FROM v$ULM_ROUNDS
      |ORDER BY freq DESC, piece ASC
      |LIMIT $ULM_TOPK""".stripMargin

  private def ulmApplyOracle: String = {
    val enc = ULM_ROUNDS + 1
    ulmCtes + ",\n" + ulmRoundCtes(enc, withMStep = false) + s""",
      |wp AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS n_pieces
      |      FROM em$enc GROUP BY word),
      |dw AS MATERIALIZED (SELECT doc_id, t AS word
      |      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      |      WHERE t <> ''),
      |pd AS MATERIALIZED (SELECT dw.doc_id,
      |             CAST(count(*) AS BIGINT) AS n_words,
      |             CAST(sum(coalesce(wp.n_pieces, length(dw.word))) AS BIGINT) AS n_tokens
      |      FROM dw LEFT JOIN wp USING (word)
      |      GROUP BY dw.doc_id)
      |SELECT d.doc_id,
      |       coalesce(pd.n_words, 0) AS n_words,
      |       coalesce(pd.n_tokens, 0) AS n_tokens
      |FROM documents d LEFT JOIN pd USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin
  }

  // -------------------------------------------------------------------
  // WORDPIECE (r14) — the THIRD production tokenizer family (Schuster &
  // Nakajima 2012; BERT's tokenizer): trains like BPE but picks each
  // merge by the LIKELIHOOD criterion score = freq(ab)/(freq(a)·freq(b))
  // instead of raw pair frequency (merging what co-occurs more than its
  // parts predict), and ENCODES by greedy longest-prefix maximum munch
  // over the frozen vocabulary instead of replaying merges.
  //
  // Shape discipline (the SentencePiece word-and-count idiom, shared
  // with the unigram trainer): both training and encode run on the
  // DISTINCT-WORD relation with frequencies — one corpus-scale word
  // count, then everything is vocab-bounded. Pair/symbol counts are
  // wfreq-WEIGHTED aggregations; per-word sequences never cross word
  // boundaries (WordPiece pre-tokenizes on whitespace), which is what
  // distinguishes this trainer from q_bpe_train_char's corpus-level
  // char stream where space is a symbol.
  //
  // Exactness: the score is fractional, so the cross-engine total
  // order quantizes it to integer arithmetic — score =
  // (freq · 2^20) div (fa · fb) in BIGINT (ties broken (pa, pb) ASC).
  // Both engines compute the identical quotient, so round count and
  // selections cannot drift; 2^-20 granularity is the documented
  // selection semantics, not an approximation of it.
  // -------------------------------------------------------------------

  private val WP_MERGES = 6
  private val WP_SCALE = 1L << 20

  /** Per-word double-separator char sequences, carrying wfreq. */
  private def wpSeq0(words: DataFrame): DataFrame = {
    val sep2 = US.toChar.toString * 2
    words.select(col("word"), col("wfreq"),
      concat(lit(sep2),
        array_join(expr("filter(split(word, ''), x -> x != '')"), sep2),
        lit(sep2)).as("seq"))
  }

  /** wfreq-weighted adjacent-pair counts (the [[pairCounts]] shape). */
  private def wpPairCounts(seqDf: DataFrame): DataFrame =
    seqDf
      .select(col("wfreq"), expr("filter(split(seq, chr(31)), x -> x != '')").as("t"))
      .where(size(col("t")) >= 2)
      .select(col("wfreq"), explode(expr(
        "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS pa, t[i+1] AS pb))")).as("p"))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(sum(col("wfreq")).as("freq"))

  /** wfreq-weighted symbol (unigram) counts — the score's denominator. */
  private def wpSymCounts(seqDf: DataFrame): DataFrame =
    seqDf
      .select(col("wfreq"),
        explode(expr("filter(split(seq, chr(31)), x -> x != '')")).as("sym"))
      .groupBy("sym")
      .agg(sum(col("wfreq")).as("sfreq"))

  /** The per-round likelihood argmax: join pair counts with both
    * symbols' counts (vocab-sized, broadcast), quantized-integer score,
    * total tiebreak. Same TakeOrdered 1-row funnel as [[bestPair]].
    */
  private def wpBestPair(seqDf: DataFrame): DataFrame = {
    // r14: lazy — both broadcast sides re-aggregate the (checkpointed,
    // word-relation-scale) seq instead of paying an eager checkpoint
    // job per round; the loop's wall is job count, not data
    val syms = wpSymCounts(seqDf)
    wpPairCounts(seqDf)
      .join(broadcast(syms.select(col("sym").as("pa"), col("sfreq").as("fa"))), Seq("pa"))
      .join(broadcast(syms.select(col("sym").as("pb"), col("sfreq").as("fb"))), Seq("pb"))
      .select(col("pa"), col("pb"), col("freq"),
        expr(s"(freq * $WP_SCALE) div (fa * fb)").as("score"))
      .orderBy(col("score").desc, col("pa").asc, col("pb").asc)
      .limit(1)
  }

  /** Greedy-leftmost rewrite of the 1-row rule ([[mergeRewriteExpr]]),
    * wfreq carried through.
    */
  private def wpApplyMerge(seqDf: DataFrame, best: DataFrame): DataFrame =
    seqDf
      .crossJoin(broadcast(best.select(col("pa").as("bpa"), col("pb").as("bpb"))))
      .select(col("word"), col("wfreq"), expr(mergeRewriteExpr).as("seq"))

  /** The [[WP_MERGES]]-round training loop: returns the word relation
    * and the per-round 1-row winners (checkpointed — train and apply
    * share them).
    */
  private def wpTrainLoop(s: SparkSession, d: String): (DataFrame, Seq[DataFrame]) = {
    val words = Materialize(ulmWords(s, d))
    var seq = Materialize(wpSeq0(words))
    val bests = Seq.newBuilder[DataFrame]
    for (_ <- 1 to WP_MERGES) {
      val best = Materialize(wpBestPair(seq))
      bests += best
      seq = Materialize(wpApplyMerge(seq, best))
    }
    (words, bests.result())
  }

  val qWordpieceTrain = Q(
    "q_wordpiece_train",
    (s, d) => {
      val (_, bests) = wpTrainLoop(s, d)
      bests.zipWithIndex.map { case (b, i) =>
        b.select(lit(i + 1).as("merge_rank"),
          expr("replace(pa, chr(30), ' ')").as("lhs"),
          expr("replace(pb, chr(30), ' ')").as("rhs"),
          col("freq"), col("score"))
      }.reduce(_ unionByName _).orderBy("merge_rank")
    },
    Some(wpOracle)
  )

  /** Every (j, i, piece) substring slot up to the FULL remaining word —
    * unlike [[ulmSubs]]' ULM_PLEN cap, a WordPiece merged token can be
    * any length, so maximum munch must see every prefix.
    */
  private def wpSubs(words: DataFrame): DataFrame =
    words
      .select(col("word"), explode(expr("sequence(0, length(word) - 1)")).as("j"))
      .select(col("word"), col("j"),
        explode(expr("sequence(1, length(word) - j)")).as("l"))
      .select(col("word"), col("j"), (col("j") + col("l")).as("i"),
        expr("substring(word, j + 1, l)").as("piece"))

  /** BERT's encode: greedy LONGEST-PREFIX segmentation under the frozen
    * vocabulary (single chars ∪ merge products), unrolled over at most
    * [[ULM_LMAX]] pieces on the distinct-word relation; per-doc token
    * counts through the shared [[ulmApplyTail]] (words over the length
    * cap fall back per-char — the same coverage guarantee as unigram).
    * Termination is structural: every single char of every word is in
    * the vocabulary, so each step always advances.
    */
  val qWordpieceApply = Q(
    "q_wordpiece_apply",
    (s, d) => {
      val (words, bests) = wpTrainLoop(s, d)
      // r14 optimization: the greedy unroll (ULM_LMAX join+window+
      // checkpoint rounds over the distinct-word relation — the same
      // job-count wall the unigram E-step paid before its fusion) is
      // ONE native codegen projection, graft_wp_munch. The frozen
      // vocabulary is driver-built — vocab-sized BY CONSTRUCTION
      // (alphabet + WP_MERGES merge products; the ULM trainer's
      // chars-collect precedent) — and rides the plan as a foldable
      // array literal. WordpieceSpec's driver-side maximum-munch
      // re-derivation and the enc-CTE oracle pin result equality.
      val singles = words
        .select(explode(expr("filter(split(word, ''), x -> x != '')")).as("piece"))
        .distinct().collect().map(_.getString(0))
      val merged = bests.flatMap(
        _.select(expr("replace(concat(pa, pb), chr(30), '')").as("piece"))
          .collect().map(_.getString(0)))
      val vocab = (singles ++ merged).distinct.sorted.toSeq
      val perWord = words.select(col("word"),
        call_function("graft_wp_munch", col("word"), typedLit(vocab)).as("n_pieces"))
      ulmApplyTail(s, d, perWord)
    },
    Some(wpApplyOracle)
  )

  /** The WordPiece CTE chain — the [[bpeCtes]] one-generator discipline:
    * w0 word counts, t0 per-word char sequences, then per round the
    * weighted symbol counts y, weighted pair counts p, quantized-score
    * argmax c, and rewrite t.
    */
  private def wpCtes: String = {
    val rounds = (1 to WP_MERGES).map { k =>
      s"""y$k AS (SELECT sym, CAST(sum(wfreq) AS BIGINT) AS sfreq
         |        FROM (SELECT unnest(t) AS sym, wfreq
         |              FROM (SELECT wfreq, list_filter(string_split(seq, chr($US)), x -> x <> '') AS t
         |                    FROM t${k - 1}))
         |        GROUP BY 1),
         |p$k AS (SELECT u.pa AS pa, u.pb AS pb, CAST(sum(wfreq) AS BIGINT) AS freq
         |        FROM (SELECT unnest([{'pa': t[i], 'pb': t[i+1]}
         |                             for i in range(1, len(t))]) AS u, wfreq
         |              FROM (SELECT wfreq, list_filter(string_split(seq, chr($US)), x -> x <> '') AS t
         |                    FROM t${k - 1})
         |              WHERE len(t) >= 2)
         |        GROUP BY 1, 2),
         |c$k AS (SELECT p.pa, p.pb, p.freq,
         |               (p.freq * $WP_SCALE) // (ya.sfreq * yb.sfreq) AS score
         |        FROM p$k p JOIN y$k ya ON ya.sym = p.pa JOIN y$k yb ON yb.sym = p.pb
         |        ORDER BY score DESC, p.pa ASC, p.pb ASC LIMIT 1),
         |t$k AS (SELECT word, wfreq,
         |               replace(seq,
         |                       chr($US) || c.pa || chr($US) || chr($US) || c.pb || chr($US),
         |                       chr($US) || c.pa || chr($RS) || c.pb || chr($US)) AS seq
         |        FROM t${k - 1} CROSS JOIN c$k c)""".stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS (SELECT word, CAST(count(*) AS BIGINT) AS wfreq
       |            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |            WHERE word <> '' AND length(word) <= $ULM_LMAX
       |            GROUP BY 1),
       |t0 AS (SELECT word, wfreq,
       |              repeat(chr($US), 2)
       |                || array_to_string(list_filter(string_split(word, ''), x -> x <> ''),
       |                                   repeat(chr($US), 2))
       |                || repeat(chr($US), 2) AS seq
       |       FROM w0),
       |""".stripMargin + rounds
  }

  private def wpOracle: String =
    wpCtes + "\n" + (1 to WP_MERGES).map(k =>
      s"""SELECT $k AS merge_rank, replace(pa, chr($RS), ' ') AS lhs,
         |       replace(pb, chr($RS), ' ') AS rhs, freq, score FROM c$k""".stripMargin)
      .mkString("\nUNION ALL\n") + "\nORDER BY merge_rank"

  private def wpApplyOracle: String = {
    val steps = (1 to ULM_LMAX).map { k =>
      s"""g$k AS (
         |  SELECT word, pos, n FROM g${k - 1} WHERE pos >= length(word)
         |  UNION ALL
         |  SELECT word, CAST(pos + l AS INTEGER) AS pos, n + 1 AS n
         |  FROM (SELECT g.word, g.pos, g.n, r.l,
         |               row_number() OVER (PARTITION BY g.word ORDER BY r.l DESC) AS rn
         |        FROM g${k - 1} g, unnest(range(1, ${ULM_LMAX + 1})) AS r(l)
         |        WHERE g.pos < length(g.word)
         |          AND l <= length(g.word) - g.pos
         |          AND substr(g.word, g.pos + 1, CAST(l AS INTEGER)) IN (SELECT piece FROM v))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val merged = (1 to WP_MERGES).map(k =>
      s"SELECT replace(pa || pb, chr($RS), '') AS piece FROM c$k")
      .mkString("\n        UNION ALL ")
    wpCtes + s""",
      |v AS MATERIALIZED (SELECT DISTINCT piece FROM (
      |        SELECT unnest(list_filter(string_split(word, ''), x -> x <> '')) AS piece FROM w0
      |        UNION ALL $merged)),
      |g0 AS (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS n FROM w0),
      |""".stripMargin + steps + s""",
      |wp AS MATERIALIZED (SELECT word, n AS n_pieces FROM g$ULM_LMAX),
      |dw AS MATERIALIZED (SELECT doc_id, t AS word
      |      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      |      WHERE t <> ''),
      |pd AS MATERIALIZED (SELECT dw.doc_id,
      |             CAST(count(*) AS BIGINT) AS n_words,
      |             CAST(sum(coalesce(wp.n_pieces, length(dw.word))) AS BIGINT) AS n_tokens
      |      FROM dw LEFT JOIN wp USING (word)
      |      GROUP BY dw.doc_id)
      |SELECT d.doc_id,
      |       coalesce(pd.n_words, 0) AS n_words,
      |       coalesce(pd.n_tokens, 0) AS n_tokens
      |FROM documents d LEFT JOIN pd USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin
  }

  val all: Seq[Q] = Seq(qBpeTrain, qBpeTrainChar, qBpeApply, qBpeVocab, qUnigramLm,
    qUnigramApply, qWordpieceTrain, qWordpieceApply)
}

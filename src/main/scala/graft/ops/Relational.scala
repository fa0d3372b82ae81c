package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.cal.WorkingDays

/** Relational operator coverage — SURVEY §2.C families E1-E9.
  *
  * Every double that reaches a hash-compared output is produced as
  * `CAST(sum(CAST(x AS DECIMAL)) AS DOUBLE)` (exact, associative,
  * partial-agg-order independent) or by a single deterministic IEEE op
  * on such exact values; see Q's scaladoc.
  */
object Relational {
  import Tables._

  /** sum over an exact decimal view of a ~2-dp monetary double. */
  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  // ---------------------------------------------------------------- E1
  /** Filter/predicate — pushed to the parquet scan (PushedFilters).
    * Sort covers ALL output columns: (l_orderkey, l_linenumber) is NOT
    * unique in the driver corpus (118k duplicate key pairs at sf0.1),
    * so the 2-column sort was only accidentally deterministic — the
    * sf1 run caught Spark and DuckDB breaking those ties differently.
    * Under an all-column sort any remaining ties are bit-identical
    * rows, which the hash compare cannot distinguish by order.
    */
  val qFilter = Q(
    "q_filter",
    (s, d) =>
      lineitem(s, d)
        .where(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
            FROM lineitem
            WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
            ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount""")
  )

  // ---------------------------------------------------------------- E2
  /** Broadcast hash join: part is a dimension (2k rows at sf0.01; still
    * tiny at 100 TB fact scale) — explicit broadcast() avoids any shuffle
    * of the fact side.
    */
  val qJoinBroadcast = Q(
    "q_join_broadcast",
    (s, d) =>
      lineitem(s, d)
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("p_brand"),
    Some("""SELECT p_brand, count(*) AS cnt,
                   CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY p_brand""")
  )

  /** Big-big equi join: lineitem⋈orders — at scale this is a shuffle
    * (sort-merge) join on the key; both sides partition by orderkey, AQE
    * handles skew. Aggregation after the join keeps output bounded.
    */
  val qJoinSmj = Q(
    "q_join_smj",
    (s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("l_extendedprice")).as("sum_price")
        )
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, count(*) AS cnt,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  /** q_join_smj with explicit key salting ([[Skew]]): lineitem's
    * orderkey salted 8 ways (hashed from linenumber), orders replicated
    * 8×. Same oracle SQL as the unsalted join — the t2 hash-match IS the
    * proof that salting preserves semantics. At 100 TB this is the
    * manual fallback when one key floods a shuffle partition and AQE's
    * skew splitting can't apply (e.g. aggregation keys).
    */
  val qJoinSalted = Q(
    "q_join_salted",
    (s, d) =>
      Skew
        .saltedJoin(
          lineitem(s, d),
          orders(s, d),
          "l_orderkey",
          "o_orderkey",
          salts = 8,
          saltBy = col("l_linenumber")
        )
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("l_extendedprice")).as("sum_price")
        )
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, count(*) AS cnt,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  /** The crafted-skew join body shared by [[qJoinSkewAqe]] and the
    * SkewSpec executed-plan audit: ~75% of lineitem collapses onto ONE
    * key (the null-ish-key shape manual salting exists for), joined SMJ
    * to the unmodified orders key space.
    */
  private[ops] def skewAqeJoin(s: SparkSession, d: String): DataFrame = {
    val hot = when(col("l_orderkey") % 4 =!= 0, lit(1L)).otherwise(col("l_orderkey"))
    // fanOut matters here beyond parallelism: OptimizeSkewedJoin splits
    // a skewed reduce partition at MAPPER-range boundaries, and a
    // single-file unit-scale scan is ONE mapper — no split points at
    // all. The round-robin gives the join shuffle map-output
    // granularity at unit scale; at corpus scale the scan already has
    // thousands of mappers and fanOut is a no-op.
    Tables.fanOut(lineitem(s, d).select(hot.as("k"), col("l_extendedprice")))
      .join(
        orders(s, d).select(col("o_orderkey"), col("o_orderpriority")).hint("merge"),
        col("k") === col("o_orderkey"))
      .select("o_orderpriority", "l_extendedprice")
  }

  /** AQE SKEW-JOIN (r13) — the AUTOMATIC complement to
    * [[qJoinSalted]]'s manual salting: the same hot-key problem handed
    * to `OptimizeSkewedJoin`, which splits the oversized shuffle
    * partition into advisory-sized mapper-range chunks at RUNTIME and
    * replicates the matching right partition per chunk. The join
    * executes eagerly inside [[Skew.withSkewAqe]]'s scoped confs
    * (thresholds data-derived so the split fires at every declared
    * scale without a task explosion — see the Skew scaladoc, incl.
    * when salting still beats AQE) behind a [[Materialize]] point; the
    * oracle is the UNSALTED, UNSPLIT join verbatim, so the hash proves
    * the runtime re-plan changes the schedule and never the rows.
    * SkewSpec pins `skew=true` on the executed SMJ of this exact body.
    */
  val qJoinSkewAqe = Q(
    "q_join_skew_aqe",
    (s, d) => {
      val joined = Skew.withSkewAqe(s, Skew.dirBytes(s, s"$d/lineitem.parquet")) {
        Materialize(skewAqeJoin(s, d))
      }
      joined
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS cnt,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price
            FROM (SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 1 ELSE l_orderkey END AS k,
                         l_extendedprice FROM lineitem) l
            JOIN orders ON l.k = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  /** Multi-way dimension join: customer⋈nation⋈region — both dims
    * broadcast; zero shuffles on the customer side until the final agg.
    */
  val qJoinMulti = Q(
    "q_join_multi",
    (s, d) =>
      customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy("r_name", "n_name"),
    Some("""SELECT r_name, n_name, count(*) AS n_cust,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS sum_bal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name ORDER BY r_name, n_name""")
  )

  /** Left-semi: orders having a heavy lineitem. */
  val qSemi = Q(
    "q_semi",
    (s, d) =>
      orders(s, d)
        .join(
          lineitem(s, d).where(col("l_quantity") > 45),
          col("o_orderkey") === col("l_orderkey"),
          "left_semi"
        )
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_orderstatus FROM orders
            WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
            ORDER BY o_orderkey""")
  )

  /** Left-anti: orders with no heavy lineitem. */
  val qAnti = Q(
    "q_anti",
    (s, d) =>
      orders(s, d)
        .join(
          lineitem(s, d).where(col("l_quantity") > 45),
          col("o_orderkey") === col("l_orderkey"),
          "left_anti"
        )
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_orderstatus FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM lineitem
                              WHERE l_orderkey = o.o_orderkey AND l_quantity > 45)
            ORDER BY o_orderkey""")
  )

  /** Time-bucket-blocked band join: same user, later event, b_ts within
    * [a_ts, a_ts + 60 s). The equi key is (user_id, minute-bucket), not
    * user_id alone: since 0 ≤ b_ts − a_ts < 60 s, b's bucket is either
    * a's or a's + 1, so the a side replicates each row to those two
    * bucket keys and the band becomes a plain equi join + residual
    * filter. This bounds per-task fan-out by events-per-user-per-MINUTE
    * squared — a bot-like user with k events no longer makes one task do
    * O(k²) band checks (VERDICT r2 "what's wrong" #3); the 2× a-side
    * replication is the standard interval-blocking price.
    *
    * Exactly one replica matches each true pair (the two replicas carry
    * distinct bucket values), so the result set is identical to the
    * unblocked join — same DuckDB oracle. Shared by the batch
    * [[qRangeJoin]] and the streaming
    * [[graft.streaming.Replay.rangeJoinStream]].
    *
    * Expects columns (user_id, a_id, a_ts) / (b_user, b_id, b_ts).
    */
  def bucketedRangeJoin(a: DataFrame, b: DataFrame): DataFrame = {
    // integer `div` on epoch micros: exact bucketing, no double rounding
    val ax = a.withColumn(
      "a_bkt",
      explode(array(expr("unix_micros(a_ts) div 60000000"),
        expr("unix_micros(a_ts) div 60000000") + 1))
    )
    val bx = b.withColumn("b_bkt", expr("unix_micros(b_ts) div 60000000"))
    // shuffle_hash, not broadcast: both sides are the events FACT — the
    // local size estimate happily broadcasts the exploded side, the plan
    // that OOMs at 100 TB. A shuffle join on (user_id, bucket) is the
    // scale shape. (Streaming joins ignore the hint — they always plan
    // symmetric hash state.)
    ax.hint("shuffle_hash")
      .join(
        bx,
        col("user_id") === col("b_user") && col("a_bkt") === col("b_bkt") &&
          col("a_id") < col("b_id") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") < col("a_ts") + expr("INTERVAL 60 SECONDS")
      )
      .select("user_id", "a_id", "b_id")
  }

  /** Range (theta) self-join on events via [[bucketedRangeJoin]]. */
  val qRangeJoin = Q(
    "q_range_join",
    (s, d) => {
      val a = events(s, d).select(
        col("user_id"),
        col("event_id").as("a_id"),
        col("ts").as("a_ts")
      )
      val b = events(s, d).select(
        col("user_id").as("b_user"),
        col("event_id").as("b_id"),
        col("ts").as("b_ts")
      )
      bucketedRangeJoin(a, b).orderBy("user_id", "a_id", "b_id")
    },
    Some("""SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id
            FROM events a JOIN events b
              ON a.user_id = b.user_id AND a.event_id < b.event_id
             AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 60 SECOND
            ORDER BY a.user_id, a_id, b_id""")
  )

  /** AS-OF join (temporal lookup) via union-merge: for each probe row,
    * the matching key's latest build row at-or-before the probe time.
    * Spark has no native as-of operator, and the naive form — equi-join
    * on the key with `build_ts <= probe_ts` as a join filter, then keep
    * rn=1 per probe row — pairs every probe with EVERY earlier build row
    * of its key: a hot key with 10⁴ of each materializes 10⁸
    * intermediate rows in one task (VERDICT r3 "what's wrong" #1).
    *
    * This is the merge-scan the scaladoc used to only name, expressed
    * declaratively: UNION the two sides into one (key, ts)-stream, sort
    * each key's partition on (ts, side, build_key) with builds ordered
    * BEFORE probes at equal ts (ties are `<=`, so a same-instant build
    * qualifies), and carry the build payload forward with
    * `last(payload, ignoreNulls) OVER (... ROWS UNBOUNDED PRECEDING..
    * CURRENT ROW)` — a running frame Spark evaluates incrementally in
    * O(1) per row. There is NO join node: per-key work is the sort's
    * O(n log n), intermediate row count is exactly |probe| + |build|,
    * and the only shuffle is the window's hash partitioning on the key.
    * Probes whose key has no earlier build keep the left-join
    * convention: the running `last` over an empty prefix is null.
    *
    * A key's rows do serialize into one task (inherent to exact as-of);
    * that cost is linear, and at 100 TB the same window runs
    * shuffle-free over layouts bucketed+sorted on (key, ts) (compose
    * with [[Partitioned]]'s bucketed-copy machinery).
    *
    * Column contract: probe (probe_id, k, ts), build (bkey, k, bts).
    * Output (probe_id, k, bkey, bts), one row per probe row.
    */
  def asofJoin(probe: DataFrame, build: DataFrame): DataFrame = {
    val p = probe.select(
      col("k"), col("ts").as("t"), lit(1).as("is_probe"),
      col("probe_id"),
      lit(null).cast(build.schema("bkey").dataType).as("bkey"),
      lit(null).cast(build.schema("bts").dataType).as("bts"))
    val b = build.select(
      col("k"), col("bts").as("t"), lit(0).as("is_probe"),
      lit(null).cast(probe.schema("probe_id").dataType).as("probe_id"),
      col("bkey"), col("bts"))
    // at equal t: builds (0) before probes (1) — `<=` semantics; among
    // equal-t builds, ascending bkey makes `last` pick the max, matching
    // the (ts DESC, key DESC) rn=1 tie-break of the naive form.
    val w = Window
      .partitionBy("k")
      .orderBy(col("t"), col("is_probe"), col("bkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(b)
      .withColumn("asof_bkey", last(col("bkey"), ignoreNulls = true).over(w))
      .withColumn("asof_bts", last(col("bts"), ignoreNulls = true).over(w))
      .where(col("is_probe") === 1)
      .select(col("probe_id"), col("k"), col("asof_bkey"), col("asof_bts"))
  }

  /** AS-OF join of events (probe fact) against orders (temporal build
    * side) via [[asofJoin]] — same result set as the naive
    * join-then-rn=1 form (the DuckDB oracle), without its per-key
    * fan-out. QueriesPlanSpec pins the join-free shape.
    */
  val qAsofJoin = Q(
    "q_asof_join",
    (s, d) => {
      val e = events(s, d).select(
        col("event_id").as("probe_id"), col("user_id").as("k"), col("ts"))
      val o = orders(s, d).select(
        col("o_orderkey").as("bkey"),
        col("o_custkey").as("k"),
        col("o_orderdate").cast("timestamp").as("bts")
      )
      asofJoin(e, o)
        .select(
          col("probe_id").as("event_id"), col("k").as("user_id"),
          col("asof_bkey").as("o_orderkey"), col("asof_bts").as("o_ts"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, o_orderkey, o_ts FROM (
              SELECT event_id, user_id, o_orderkey,
                     CAST(o_orderdate AS TIMESTAMP) AS o_ts,
                     row_number() OVER (PARTITION BY event_id
                                        ORDER BY CAST(o_orderdate AS TIMESTAMP) DESC NULLS LAST,
                                                 o_orderkey DESC NULLS LAST) AS rn
              FROM events LEFT JOIN orders
                ON user_id = o_custkey AND CAST(o_orderdate AS TIMESTAMP) <= ts
            ) t WHERE rn = 1 ORDER BY event_id""")
  )

  /** FULL OUTER join — the one join type the E2 matrix was missing
    * (inner/broadcast/SMJ/salted/multi/semi/anti/range/as-of are above).
    * Cohort retention: per-customer order activity in 1995 vs 2001,
    * where either side may be absent — `churned` (1995 only), `new`
    * (2001 only), `retained` (both). Null-filling discipline: counts
    * coalesce to 0, spends to 0.0, and the join key survives via the
    * USING-column coalesce Spark applies to `full_outer` on a name Seq.
    *
    * Scale shape: both inputs are aggregated BELOW the join, so the
    * join sides are bounded by |customers|, not |orders| — and both
    * carry the same hash partitioning on custkey out of their groupBy,
    * which the full-outer SMJ REUSES: two scan-side exchanges total,
    * none between agg and join. Full outer can never broadcast (both
    * sides must see unmatched rows), so the shuffle shape here is the
    * only correct one at any scale.
    */
  val qJoinOuter = Q(
    "q_join_outer",
    (s, d) => {
      def era(yr: Int, n: String, sp: String) =
        orders(s, d)
          .where(year(col("o_orderdate")) === yr)
          .groupBy(col("o_custkey").as("custkey"))
          .agg(count(lit(1)).as(n), dsum(col("o_totalprice")).as(sp))
      era(1995, "n_1995", "spend_1995")
        .join(era(2001, "n_2001", "spend_2001"), Seq("custkey"), "full_outer")
        .select(
          col("custkey"),
          coalesce(col("n_1995"), lit(0L)).as("n_1995"),
          coalesce(col("spend_1995"), lit(0.0)).as("spend_1995"),
          coalesce(col("n_2001"), lit(0L)).as("n_2001"),
          coalesce(col("spend_2001"), lit(0.0)).as("spend_2001"),
          when(col("n_1995").isNull, "new")
            .when(col("n_2001").isNull, "churned")
            .otherwise("retained")
            .as("status")
        )
        .orderBy("custkey")
    },
    Some("""WITH h1 AS (SELECT o_custkey AS custkey, count(*) AS n,
                               CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS spend
                        FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
                 h2 AS (SELECT o_custkey AS custkey, count(*) AS n,
                               CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS spend
                        FROM orders WHERE year(o_orderdate) = 2001 GROUP BY 1)
            SELECT COALESCE(h1.custkey, h2.custkey) AS custkey,
                   COALESCE(h1.n, 0) AS n_1995,
                   COALESCE(h1.spend, 0.0) AS spend_1995,
                   COALESCE(h2.n, 0) AS n_2001,
                   COALESCE(h2.spend, 0.0) AS spend_2001,
                   CASE WHEN h1.custkey IS NULL THEN 'new'
                        WHEN h2.custkey IS NULL THEN 'churned'
                        ELSE 'retained' END AS status
            FROM h1 FULL OUTER JOIN h2 ON h1.custkey = h2.custkey
            ORDER BY custkey""")
  )

  // ---------------------------------------------------------------- E3
  /** TPC-H Q1 shape: hash aggregate with partial/map-side combine. The
    * avg is sum_exact/count — one IEEE division on exact operands.
    */
  val qAggHash = Q(
    "q_agg_hash",
    (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          // factor-FIRST decimal casts: each factor is an exact 2-dp
          // quantity, so the product is an exact 4-dp decimal in both
          // dialects. The previous double-multiply-then-cast rounded
          // each product to 6 dp, and double→decimal TIE rounding
          // diverges across engines — invisible below ~10M rows, a
          // 4e-5 hash mismatch at the r12 sf10 t2's 60M lineitem.
          sum(col("l_extendedprice").cast(DecimalType(18, 2))
            * (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
            .cast("double")
            .as("sum_disc_price"),
          count(lit(1)).as("cnt")
        )
        .withColumn("avg_qty", col("sum_qty") / col("cnt"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
                   count(*) AS cnt,
                   CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / count(*) AS avg_qty
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""")
  )

  /** Exact distinct aggregation (expand+two-phase under the hood). */
  val qAggDistinct = Q(
    "q_agg_distinct",
    (s, d) =>
      lineitem(s, d)
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows")
        ),
    Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
                   count(DISTINCT l_suppkey) AS n_supps,
                   count(*) AS n_rows
            FROM lineitem""")
  )

  /** PER-GROUP CORRELATION + OLS FIT (r7) — the feature/target
    * association audit a training pipeline runs before trusting a
    * column pair (quantity → price here): Pearson r and the least-
    * squares line y = alpha + beta·x per l_returnflag group, all from
    * the five moment sums.
    *
    * Engine-parity discipline (the float-sum hazard, as q_normalize):
    * n, Σx, Σy, Σx², Σy², Σxy accumulate as EXACT decimals — each
    * product is one deterministic IEEE multiply whose DECIMAL cast
    * rounds identically in both engines — and r/beta/alpha are a fixed
    * chain of IEEE ops on those exact sums written token-for-token
    * identically in both dialects, then rounded to 6 digits. Spark's
    * builtin `corr` is NOT used in the hash-compared column precisely
    * because it folds doubles in partial-aggregation order.
    *
    * Scale: ONE map-side-combined moment aggregation to |groups| rows —
    * the same partial/final shape as builtin corr, cost = one scan at
    * any corpus size; no second pass, no broadcast, no window.
    */
  val qCorr = Q(
    "q_corr",
    (s, d) => {
      val m = lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sx0"),
          dsum(col("l_extendedprice")).as("sy0"),
          sum((col("l_quantity") * col("l_quantity")).cast(DecimalType(38, 6))).as("sxx0"),
          sum((col("l_extendedprice") * col("l_extendedprice")).cast(DecimalType(38, 4))).as("syy0"),
          sum((col("l_quantity") * col("l_extendedprice")).cast(DecimalType(38, 4))).as("sxy0")
        )
        .select(col("l_returnflag"), col("n").cast("double").as("nd"),
          col("sx0").as("sx"), col("sy0").as("sy"),
          col("sxx0").cast("double").as("sxx"), col("syy0").cast("double").as("syy"),
          col("sxy0").cast("double").as("sxy"))
      m.select(col("l_returnflag"), col("nd").cast("long").as("n"),
          (col("nd") * col("sxy") - col("sx") * col("sy")).as("cxy"),
          (col("nd") * col("sxx") - col("sx") * col("sx")).as("vx"),
          (col("nd") * col("syy") - col("sy") * col("sy")).as("vy"),
          col("nd"), col("sx"), col("sy"))
        .select(col("l_returnflag"), col("n"),
          round(col("cxy") / (sqrt(col("vx")) * sqrt(col("vy"))), 6).as("corr_xy"),
          round(col("cxy") / col("vx"), 6).as("beta"),
          round((col("sy") * col("vx") - col("cxy") * col("sx")) / (col("nd") * col("vx")), 6)
            .as("alpha"))
        .orderBy("l_returnflag")
    },
    Some("""WITH m AS (
              SELECT l_returnflag,
                     count(*) AS n,
                     CAST(count(*) AS DOUBLE) AS nd,
                     CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sx,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sy,
                     CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
                     CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS syy,
                     CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sxy
              FROM lineitem GROUP BY l_returnflag),
            c AS (
              SELECT l_returnflag, n, nd, sx, sy,
                     nd * sxy - sx * sy AS cxy,
                     nd * sxx - sx * sx AS vx,
                     nd * syy - sy * sy AS vy
              FROM m)
            SELECT l_returnflag, n,
                   round(cxy / (sqrt(vx) * sqrt(vy)), 6) AS corr_xy,
                   round(cxy / vx, 6) AS beta,
                   round((sy * vx - cxy * sx) / (nd * vx), 6) AS alpha
            FROM c ORDER BY l_returnflag""")
  )

  /** TYPED COGROUP (r7) — the `Dataset.cogroup` surface completing the
    * typed-API matrix (Aggregator: q_auto_date_agg / q_topk_per_key;
    * flatMapGroupsWithState: streaming; mapPartitions: multimodal;
    * cogroup: HERE): per order key, both sides' groups handed to one
    * typed function — the escape hatch for per-key reconciliation
    * logic a relational join can't express (here deliberately simple —
    * count + status per key — so the FULL OUTER JOIN oracle pins the
    * cogroup semantics themselves, including keys present on only one
    * side).
    *
    * Scale: cogroup plans one co-partitioned shuffle per side on the
    * key (exactly a full-outer SMJ's exchanges) and streams each key's
    * two iterators through the lambda — per-key memory is the key's
    * group, so cap hot keys upstream. The documented trade: Catalyst
    * cannot push filters/prune columns THROUGH the lambda (the typed
    * boundary) — project to the needed columns BEFORE grouping, as
    * here (2+1 columns, not full rows).
    */
  val qCogroup = Q(
    "q_cogroup",
    (s, d) => {
      import s.implicits._
      val os = orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
        .as[(Long, Double)].groupByKey(_._1)
      val ls = lineitem(s, d).select(col("l_orderkey")).as[Long].groupByKey(identity)
      os.cogroup(ls) { (k, o, l) =>
        val ov = o.toSeq
        val n = l.size
        val status =
          if (ov.nonEmpty && n > 0) "matched"
          else if (ov.nonEmpty) "order_only"
          else "items_only"
        Iterator.single((k, ov.size, n, status))
      }.toDF("o_orderkey", "n_orders", "n_items", "status")
        .orderBy("o_orderkey")
    },
    Some("""SELECT coalesce(o.o_orderkey, l.l_orderkey) AS o_orderkey,
                   CAST(count(DISTINCT o.o_orderkey) AS INTEGER) AS n_orders,
                   CAST(count(l.l_orderkey) AS INTEGER) AS n_items,
                   CASE WHEN count(DISTINCT o.o_orderkey) > 0 AND count(l.l_orderkey) > 0
                        THEN 'matched'
                        WHEN count(DISTINCT o.o_orderkey) > 0 THEN 'order_only'
                        ELSE 'items_only' END AS status
            FROM orders o FULL OUTER JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY 1 ORDER BY 1""")
  )

  private val viewId = new java.util.concurrent.atomic.AtomicLong(0)

  /** Run `sql` with per-invocation UNIQUE temp-view names (dropped once
    * the statement is analyzed): fixed names on the shared session are
    * global mutable state — concurrent or repeated query construction
    * would clash, and the leaked views polluted catalog listings
    * (ADVICE r1). Dropping after `s.sql` is safe: analysis resolves the
    * relations eagerly, the returned plan no longer needs the catalog
    * entries.
    */
  private def sqlWithViews(
      s: SparkSession,
      views: Seq[(String, DataFrame)]
  )(sql: Seq[String] => String): DataFrame = {
    val names = views.map { case (base, df) =>
      val n = s"${base}_${viewId.incrementAndGet()}"
      df.createOrReplaceTempView(n)
      n
    }
    try s.sql(sql(names))
    finally names.foreach(s.catalog.dropTempView)
  }

  /** Rollup over region→nation; subtotal NULLs coalesced to 'ALL' so the
    * sort keys are non-null (Spark and DuckDB disagree on default null
    * ordering). Expressed through the SQL front-end: Spark 4.1's
    * DetectAmbiguousSelfJoin mis-fires on Dataset-API rollup over
    * aliased join outputs; SQL resolution has no dataset tags (and
    * exercises the §2.B SQL surface).
    */
  val qRollup = Q(
    "q_rollup",
    (s, d) =>
      sqlWithViews(
        s,
        Seq("customer_v" -> customer(s, d), "nation_v" -> nation(s, d), "region_v" -> region(s, d))
      ) { case Seq(cv, nv, rv) =>
        s"""SELECT coalesce(r_name, 'ALL') AS region,
                   coalesce(n_name, 'ALL') AS nation,
                   count(*) AS n_cust,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS sum_bal
            FROM $cv
            JOIN $nv ON c_nationkey = n_nationkey
            JOIN $rv ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
            ORDER BY region, nation"""
      },
    Some("""SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
                   count(*) AS n_cust,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS sum_bal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
            ORDER BY region, nation""")
  )

  /** Cube over (returnflag, linestatus) — the full grouping-set lattice
    * (§2.B grouping-sets line). Single-table, so the Dataset API cube
    * works directly (no self-join tag issue like q_rollup).
    */
  val qCube = Q(
    "q_cube",
    (s, d) =>
      lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("cnt"),
          col("sum_qty")
        )
        .orderBy("rf", "ls"),
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
                   coalesce(l_linestatus, 'ALL') AS ls,
                   count(*) AS cnt,
                   CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY rf, ls""")
  )

  /** Explicit GROUPING SETS (the general form rollup/cube specialize):
    * (region,nation), (region), () — via the SQL front-end like
    * q_rollup.
    */
  val qGroupingSets = Q(
    "q_grouping_sets",
    (s, d) =>
      sqlWithViews(
        s,
        Seq("customer_gs" -> customer(s, d), "nation_gs" -> nation(s, d), "region_gs" -> region(s, d))
      ) { case Seq(cv, nv, rv) =>
        s"""SELECT coalesce(r_name, 'ALL') AS region,
                   coalesce(n_name, 'ALL') AS nation,
                   count(*) AS n_cust
            FROM $cv
            JOIN $nv ON c_nationkey = n_nationkey
            JOIN $rv ON n_regionkey = r_regionkey
            GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
            ORDER BY region, nation"""
      },
    Some("""SELECT coalesce(r_name, 'ALL') AS region,
                   coalesce(n_name, 'ALL') AS nation,
                   count(*) AS n_cust
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
            ORDER BY region, nation""")
  )

  /** Approximate quantiles — the other sketch a training pipeline leans
    * on (length/quality cutoffs over 100 TB need one pass, bounded
    * memory). Rows-only: Spark's KLL-style percentile_approx and
    * DuckDB's quantile implementations legitimately differ;
    * QuantileSpec bounds the error against the exact percentiles.
    * Output is flattened to one scalar column per percentile (not an
    * `array<double>`) so the driver's rows-only check can sort/hash it.
    */
  val qQuantiles = Q(
    "q_quantiles",
    (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile_approx(l_extendedprice, array(0.25, 0.5, 0.75, 0.99), 10000)")
            .as("q"),
          count(lit(1)).as("cnt")
        )
        .select(
          col("l_returnflag"),
          element_at(col("q"), 1).as("p25"),
          element_at(col("q"), 2).as("p50"),
          element_at(col("q"), 3).as("p75"),
          element_at(col("q"), 4).as("p99"),
          col("cnt")
        )
        .orderBy("l_returnflag"),
    None
  )

  /** Exact interpolated quartiles — the correctness baseline the
    * percentile_approx sketch is the 100 TB path FOR (exact percentile
    * materializes each group's values; the sketch is mergeable constant
    * memory). Oracled: both engines interpolate at rank p·(n−1) on the
    * same doubles; round(6) absorbs sub-ulp formula-order noise.
    */
  val qQuantilesExact = Q(
    "q_quantiles_exact",
    (s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("q"),
          count(lit(1)).as("cnt")
        )
        .select(
          col("l_returnflag"),
          round(element_at(col("q"), 1), 6).as("p25"),
          round(element_at(col("q"), 2), 6).as("p50"),
          round(element_at(col("q"), 3), 6).as("p75"),
          col("cnt")
        )
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
                   round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
                   round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
                   count(*) AS cnt
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** HLL sketch — the 100 TB path for distincts (constant memory per
    * group vs expand+shuffle for exact). No SQL oracle: DuckDB's HLL
    * differs; driver records a rows-only check (SURVEY §7.4).
    */
  val qApproxDistinct = Q(
    "q_approx_distinct",
    (s, d) =>
      events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy("event_type"),
    None
  )

  // ---------------------------------------------------------------- E4
  /** Top-3 orders per customer: rank windows with a total-order tiebreak. */
  val qWindowRank = Q(
    "q_window_rank",
    (s, d) => {
      val w = Window
        .partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .where(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rnk")
        .orderBy("o_custkey", "rn", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn,
                     CAST(rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rnk
              FROM orders) t
            WHERE rn <= 3
            ORDER BY o_custkey, rn, o_orderkey""")
  )

  /** Running sum per user — decimal accumulator: DuckDB's segment-tree
    * window sum adds in a different order than Spark's running frame, so
    * double accumulation would drift; decimal is exact in both.
    */
  val qWindowRunning = Q(
    "q_window_running",
    (s, d) => {
      val w = Window
        .partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .withColumn("running_value", sum(col("value").cast(DecimalType(28, 2))).over(w).cast("double"))
        .select("user_id", "event_id", "value", "running_value")
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id, value,
                   CAST(sum(CAST(value AS DECIMAL(28,2)))
                        OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
            FROM events
            ORDER BY user_id, event_id""")
  )

  /** lag/lead per user over event time. */
  val qWindowLag = Q(
    "q_window_lag",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      events(s, d)
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_value", lead(col("value"), 1).over(w))
        .select("user_id", "event_id", "value", "prev_value", "next_value")
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT user_id, event_id, value,
                   lag(value)  OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_value,
                   lead(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next_value
            FROM events
            ORDER BY user_id, event_id""")
  )

  /** Distribution-position windows: percent_rank + cume_dist per
    * order-priority partition — the remaining ANSI window rank family
    * beyond rank/row_number (E4). Both outputs are ONE IEEE division of
    * exact integers ((rank-1)/(n-1), peers_cume/n), so Spark and DuckDB
    * produce bit-identical doubles with no rounding discipline needed.
    * Scale: keyed window — partitions by o_orderpriority (bounded
    * cardinality), each partition sorts locally after one hash shuffle;
    * no global window, no one-partition funnel.
    */
  val qWindowPercent = Q(
    "q_window_percent",
    (s, d) => {
      val w = Window
        .partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").asc)
      orders(s, d)
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "pr", "cd")
        .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
    },
    Some("""SELECT o_orderpriority, o_orderkey, o_totalprice,
                   percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC) AS pr,
                   cume_dist()    OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC) AS cd
            FROM orders
            ORDER BY o_orderpriority, o_totalprice, o_orderkey""")
  )

  /** Event-time RANGE frame: per-user trailing-1-hour rolling aggregate
    * — the remaining ANSI frame kind beyond ROWS (q_window_running) and
    * the rate/velocity feature (events per user per trailing hour) a
    * feature pipeline computes. The frame key is exact integer epoch
    * SECONDS (`unix_micros div 1_000_000` — truncation, not a double
    * `epoch()` cast, so both engines floor identically), and both
    * aggregates are exact BIGINTs (a count and a BIGINT id sum), so the
    * within-frame accumulation order can never change a bit. RANGE
    * semantics make epoch ties frame-identical for all peers — the
    * output is deterministic even though the tie ORDER inside the
    * window is not observable.
    *
    * Scale: keyed window — one hash shuffle on user_id, per-user local
    * sort; no global funnel. DuckDB mirrors with RANGE BETWEEN 3600
    * PRECEDING AND CURRENT ROW.
    */
  val qWindowRange = Q(
    "q_window_range",
    (s, d) => {
      val w = Window
        .partitionBy("user_id")
        .orderBy(col("ep").asc)
        .rangeBetween(-3600L, Window.currentRow)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(ts) div 1000000").as("ep"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("idsum_1h", sum(col("event_id")).over(w))
        .select("event_id", "user_id", "ep", "n_1h", "idsum_1h")
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, ep,
                   count(*) OVER w AS n_1h,
                   CAST(sum(event_id) OVER w AS BIGINT) AS idsum_1h
            FROM (SELECT event_id, user_id, epoch_us(ts) // 1000000 AS ep
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY ep ASC
                         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
            ORDER BY event_id""")
  )

  // ---------------------------------------------------------------- E5
  /** Global top-k with total-order tiebreak — Spark plans
    * TakeOrderedAndProject (per-partition heap + driver merge, no full
    * sort; exactly what you want at 100 TB).
    */
  val qTopk = Q(
    "q_topk",
    (s, d) =>
      lineitem(s, d)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(10),
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
            FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
            LIMIT 10""")
  )

  // ---------------------------------------------------------------- E6
  val qUnion = Q(
    "q_union",
    (s, d) => {
      val c = customer(s, d)
      c.where(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
        .union(c.where(col("c_acctbal") > 8000).select("c_custkey"))
        .distinct()
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            UNION
            SELECT c_custkey FROM customer WHERE c_acctbal > 8000
            ORDER BY c_custkey""")
  )

  val qIntersect = Q(
    "q_intersect",
    (s, d) => {
      val c = customer(s, d)
      c.where(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
        .intersect(c.where(col("c_acctbal") > 8000).select("c_custkey"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            INTERSECT
            SELECT c_custkey FROM customer WHERE c_acctbal > 8000
            ORDER BY c_custkey""")
  )

  val qExcept = Q(
    "q_except",
    (s, d) => {
      val c = customer(s, d)
      c.where(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
        .except(c.where(col("c_acctbal") > 8000).select("c_custkey"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            EXCEPT
            SELECT c_custkey FROM customer WHERE c_acctbal > 8000
            ORDER BY c_custkey""")
  )

  // ---------------------------------------------------------------- E7
  val qScalarString = Q(
    "q_scalar_string",
    (s, d) =>
      part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          substring(col("p_type"), 1, 5).as("type_prefix"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_name"), "(\\w+)$", 1).as("last_word"),
          length(col("p_name")).as("name_len")
        )
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, upper(p_name) AS name_upper,
                   substring(p_type, 1, 5) AS type_prefix,
                   p_brand || '#' || p_type AS brand_type,
                   regexp_extract(p_name, '(\w+)$', 1) AS last_word,
                   CAST(length(p_name) AS INTEGER) AS name_len
            FROM part ORDER BY p_partkey""")
  )

  /** Math scalars — only IEEE-exact ops (abs/floor/ceil/sqrt/mod) so both
    * engines produce identical bits; no libm transcendentals.
    */
  val qScalarMath = Q(
    "q_scalar_math",
    (s, d) =>
      part(s, d)
        .select(
          col("p_partkey"),
          abs(-col("p_retailprice")).as("abs_price"),
          floor(col("p_retailprice")).as("floor_price"),
          ceil(col("p_retailprice")).as("ceil_price"),
          sqrt(col("p_retailprice")).as("sqrt_price"),
          pmod(col("p_size"), lit(7)).as("size_mod7")
        )
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, abs(-p_retailprice) AS abs_price,
                   CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
                   CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
                   sqrt(p_retailprice) AS sqrt_price,
                   p_size % 7 AS size_mod7
            FROM part ORDER BY p_partkey""")
  )

  val qScalarJson = Q(
    "q_scalar_json",
    (s, d) =>
      events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val")
        )
        .orderBy("event_id"),
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
            FROM events ORDER BY event_id""")
  )

  val qScalarArray = Q(
    "q_scalar_array",
    (s, d) =>
      embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          element_at(col("embedding"), 1).cast("double").as("first_val"),
          element_at(col("embedding"), 64).cast("double").as("last_val")
        )
        .orderBy("vec_id"),
    Some("""SELECT vec_id, len(embedding) AS dim,
                   CAST(embedding[1] AS DOUBLE) AS first_val,
                   CAST(embedding[64] AS DOUBLE) AS last_val
            FROM embeddings ORDER BY vec_id""")
  )

  val qScalarDate = Q(
    "q_scalar_date",
    (s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"),
          dayofmonth(col("o_orderdate")).as("o_day"),
          datediff(col("o_orderdate"), lit("1995-01-01")).as("days_since"),
          last_day(col("o_orderdate")).as("month_end")
        )
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
                   CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   CAST(month(o_orderdate) AS INTEGER) AS o_month,
                   CAST(day(o_orderdate) AS INTEGER) AS o_day,
                   CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
                   last_day(CAST(o_orderdate AS DATE)) AS month_end
            FROM orders ORDER BY o_orderkey""")
  )

  // ---------------------------------------------------------------- E8
  /** Reference op-20 closed form as native columns (see WorkingDays):
    * the oracle replicates the same arithmetic in DuckDB SQL.
    */
  private val duckNth20 =
    """(d20.first + INTERVAL (21 +
         CASE WHEN (isodow(d20.first)-1) = 5 THEN 2
              WHEN (isodow(d20.first)-1) = 6 THEN 1 ELSE 0 END +
         4 + CASE WHEN 4 > 5 - (CASE WHEN (isodow(d20.first)-1) >= 5 THEN 0
                                     ELSE (isodow(d20.first)-1) END)
                  THEN 2 ELSE 0 END) DAY)"""

  val qNthWorkingDay = Q(
    "q_nth_working_day",
    (s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          WorkingDays
            .nthWorkingDayCol(col("o_orderdate").cast("date"), 20)
            .as("pub_day")
        )
        .orderBy("o_orderkey"),
    Some(s"""SELECT o_orderkey, CAST($duckNth20 AS DATE) AS pub_day
             FROM (SELECT o_orderkey,
                          date_trunc('month', CAST(o_orderdate AS DATE)) AS first
                   FROM orders) d20
             ORDER BY o_orderkey""")
  )

  /** Reference op-22: publish date for a given "current" date. */
  val qPublishDate = Q(
    "q_publish_date",
    (s, d) =>
      orders(s, d)
        .select(
          col("o_orderkey"),
          WorkingDays.toPublishDateCol(col("o_orderdate").cast("date")).as("publish_date")
        )
        .orderBy("o_orderkey"),
    Some(s"""WITH base AS (
               SELECT o_orderkey, CAST(o_orderdate AS DATE) AS cur,
                      date_trunc('month', CAST(o_orderdate AS DATE)) AS cur_first,
                      date_trunc('month', CAST(o_orderdate AS DATE)) - INTERVAL 1 MONTH AS prev_first
               FROM orders),
             this_m AS (
               SELECT o_orderkey, cur, CAST($duckNth20 AS DATE) AS nth20
               FROM (SELECT o_orderkey, cur, cur_first AS first FROM base) d20),
             prev_m AS (
               SELECT o_orderkey, CAST($duckNth20 AS DATE) AS nth20_prev
               FROM (SELECT o_orderkey, prev_first AS first FROM base) d20)
             SELECT t.o_orderkey AS o_orderkey,
                    CASE WHEN day(t.cur) < day(t.nth20) THEN p.nth20_prev ELSE t.nth20 END AS publish_date
             FROM this_m t JOIN prev_m p ON t.o_orderkey = p.o_orderkey
             ORDER BY t.o_orderkey""")
  )

  // ---------------------------------------------------------------- E9
  /** Reference ops 7+8 over events: max(ts) floored to date. */
  val qAutoDate = Q(
    "q_auto_date",
    (s, d) =>
      events(s, d).agg(max(col("ts")).cast("date").as("auto_date")),
    Some("SELECT CAST(max(ts) AS DATE) AS auto_date FROM events")
  )

  /** Reference op-13 analogue: per-run stats in one aggregate pass. */
  val qMetaStats = Q(
    "q_meta_stats",
    (s, d) =>
      events(s, d).agg(
        count(lit(1)).as("n_rows"),
        min(col("ts")).as("min_ts"),
        max(col("ts")).as("max_ts"),
        sum(length(col("props"))).as("props_chars")
      ),
    Some("""SELECT count(*) AS n_rows, min(ts) AS min_ts, max(ts) AS max_ts,
                   CAST(sum(length(props)) AS BIGINT) AS props_chars
            FROM events""")
  )

  val all: Seq[Q] = Seq(
    qFilter,
    qJoinBroadcast, qJoinSmj, qJoinSalted, qJoinSkewAqe, qJoinMulti, qSemi, qAnti, qRangeJoin,
    qAsofJoin, qJoinOuter, qCogroup,
    qAggHash, qAggDistinct, qCorr, qRollup, qCube, qGroupingSets, qQuantiles, qQuantilesExact,
    qApproxDistinct,
    qWindowRank, qWindowRunning, qWindowLag, qWindowPercent, qWindowRange,
    qTopk,
    qUnion, qIntersect, qExcept,
    qScalarString, qScalarMath, qScalarJson, qScalarArray, qScalarDate,
    qNthWorkingDay, qPublishDate,
    qAutoDate, qMetaStats
  )
}

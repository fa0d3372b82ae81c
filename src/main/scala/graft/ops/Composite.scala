package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** E17 — composite analytics: TPC-H-shaped multi-join + agg + top-k
  * queries over the driver's TPC-H-ish tables.
  *
  * Every prior family exercises ONE operator shape in isolation; these
  * three exercise the composition a warehouse user actually runs — and
  * the planning decisions that dominate at 100 TB: which joins
  * broadcast, which shuffle, where the dimension filter lands relative
  * to the fact join, and whether the final top-k avoids a global sort.
  *
  * Plan discipline (pinned in QueriesPlanSpec):
  *  - fixed-cardinality dims (nation 25, region 5 — constant at ANY
  *    scale factor) are explicit `broadcast()`; SF-scaled relations
  *    (customer, supplier, orders, lineitem) are left to
  *    Catalyst/AQE, which correctly picks shuffle joins once their
  *    size estimates exceed the broadcast threshold on a real cluster.
  *  - dimension predicates are applied BEFORE the fact join
  *    (star-schema filter-first): in [[qTpchMarket]] both customer and
  *    supplier are pre-pruned by the broadcast ASIA nation-key set, so
  *    the orderkey shuffle moves 1/5th of the rows it would if the
  *    region filter ran after the 6-way join.
  *  - top-k = `orderBy(...).limit(k)` → TakeOrderedAndProject (per
  *    partition heap + driver merge of k rows), never a global sort.
  *
  * Money discipline per [[Q]]'s scaladoc: revenue sums the exact
  * decimal product of factor-first 2-dp casts (see [[revenue]]) —
  * exact, associative, partial-agg-order independent; ties in the
  * top-k sort are broken by the unique group key.
  */
object Composite {
  import Tables._

  /** Factor-first decimal casts (the r12 q_agg_hash finding): the
    * factors are exact 2-dp quantities, so the product is an exact
    * 4-dp decimal in both dialects — the earlier
    * double-multiply-then-cast-to-(28,6) rounded each product, and
    * double→decimal tie rounding diverges across engines at ~10M+
    * rows.
    */
  private def revenue =
    sum(col("l_extendedprice").cast(DecimalType(18, 2))
      * (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
      .cast("double").as("revenue")

  /** TPC-H Q3 shape — shipping-priority candidates: for one market
    * segment, the 10 highest-revenue orders taken before the cutoff
    * with lines still shipping after it. lineitem⋈orders shuffle on
    * orderkey, then ⋈customer shuffle on custkey; all three scan-side
    * predicates push to parquet.
    */
  val qTpchShipping = Q(
    "q_tpch_shipping",
    (s, d) => {
      val c = customer(s, d).where(col("c_mktsegment") === "BUILDING")
      val o = orders(s, d).where(col("o_orderdate") < expr("TIMESTAMP '1998-07-01'"))
      val l = lineitem(s, d).where(col("l_shipdate") > expr("TIMESTAMP '1998-07-01'"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue)
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey, o_orderdate,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
            FROM customer JOIN orders ON c_custkey = o_custkey
                          JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-07-01'
              AND l_shipdate  > TIMESTAMP '1998-07-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey LIMIT 10""")
  )

  /** TPC-H Q5 shape — local-supplier volume: revenue per ASIA nation
    * from orders where the supplying and ordering nations coincide.
    * The 6-way join resolves as: broadcast the 25×5 nation⋈region dim
    * onto customer AND supplier first (filter-first pruning), then
    * fact-side shuffle joins on orderkey/custkey/suppkey with the
    * nation-equality as a post-join predicate.
    */
  val qTpchMarket = Q(
    "q_tpch_market",
    (s, d) => {
      val asiaNations = nation(s, d)
        .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .select("n_nationkey", "n_name")
      val c = customer(s, d)
        .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
      val sup = supplier(s, d)
        .join(broadcast(asiaNations.select(col("n_nationkey").as("sn_key"))),
          col("s_nationkey") === col("sn_key"))
        .select("s_suppkey", "s_nationkey")
      val o = orders(s, d)
        .where(col("o_orderdate") >= expr("TIMESTAMP '1997-01-01'") &&
          col("o_orderdate") < expr("TIMESTAMP '1998-01-01'"))
        .select("o_orderkey", "o_custkey")
      lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(revenue)
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
            FROM region JOIN nation   ON n_regionkey = r_regionkey
                        JOIN customer ON c_nationkey = n_nationkey
                        JOIN orders   ON o_custkey   = c_custkey
                        JOIN lineitem ON l_orderkey  = o_orderkey
                        JOIN supplier ON l_suppkey   = s_suppkey
                                     AND s_nationkey = c_nationkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
            GROUP BY n_name ORDER BY revenue DESC, n_name""")
  )

  /** TPC-H Q10 shape — returned-item ranking: top-20 customers by
    * revenue lost to returns in one quarter. The quarter predicate and
    * the returnflag predicate both push to their scans; nation (25
    * rows forever) broadcasts onto the aggregated output.
    */
  val qTpchReturns = Q(
    "q_tpch_returns",
    (s, d) => {
      val o = orders(s, d)
        .where(col("o_orderdate") >= expr("TIMESTAMP '2000-10-01'") &&
          col("o_orderdate") < expr("TIMESTAMP '2001-01-01'"))
        .select("o_orderkey", "o_custkey")
      val l = lineitem(s, d)
        .where(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
                   c_acctbal, n_name
            FROM customer JOIN orders ON o_custkey = c_custkey
                          JOIN lineitem ON l_orderkey = o_orderkey
                          JOIN nation ON c_nationkey = n_nationkey
            WHERE o_orderdate >= TIMESTAMP '2000-10-01'
              AND o_orderdate <  TIMESTAMP '2001-01-01'
              AND l_returnflag = 'R'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey LIMIT 20""")
  )

  /** ORDERED-SEQUENCE FUNNEL — the event-order analytics every product
    * warehouse runs and naive conditional aggregation CANNOT express:
    * per user, the first `view`, the first `click` AT OR AFTER that
    * view, and the first `purchase` at or after that click (stage
    * order matters — a click before any view doesn't count). Stage
    * reached ∈ {0,1,2,3} plus exact µs inter-stage delays.
    *
    * Shape: a per-user ORDERED RUNNING FOLD — one keyed window
    * (partition user_id, order (ts, event_id), running frame) carries
    * "earliest view so far" / "earliest valid click so far" past each
    * event, then one groupBy(user) collapses to the funnel row. The
    * window exchange hash-partitions on user_id and the groupBy REUSES
    * that partitioning — ONE data-scale shuffle total, one corpus pass
    * (vs the 3-scan filter-join-filter formulation). Both engines
    * evaluate the identical frame, so the min-over-frame fold is
    * deterministic; delays are exact integer epoch-µs differences.
    */
  /** The funnel window algebra over any (user_id, ts, event_id,
    * event_type) relation — shared by the declared batch query and the
    * streaming twin's ReplaySpec ground truth.
    */
  def funnelBatch(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seenView = min(when(col("event_type") === "view", col("ts"))).over(w)
    val marked = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("valid_click_ts",
        when(col("event_type") === "click" && seenView.isNotNull, col("ts")))
    val seenClick = min(col("valid_click_ts")).over(w)
    val marked2 = marked.withColumn("valid_purchase_ts",
      when(col("event_type") === "purchase" && seenClick.isNotNull, col("ts")))
    marked2
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(col("valid_click_ts")).as("t_click"),
        min(col("valid_purchase_ts")).as("t_purchase")
      )
      .select(
        col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        when(col("t_purchase").isNotNull, 3)
          .when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1)
          .otherwise(0).as("stage"),
        (unix_micros(col("t_click")) - unix_micros(col("t_view")))
          .as("us_view_to_click"),
        (unix_micros(col("t_purchase")) - unix_micros(col("t_click")))
          .as("us_click_to_purchase")
      )
      .orderBy("user_id")
  }

  val qFunnel = Q(
    "q_funnel",
    (s, d) => funnelBatch(Tables.events(s, d)),
    Some("""WITH marked AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN event_type = 'click'
                          AND min(CASE WHEN event_type = 'view' THEN ts END)
                              OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                              IS NOT NULL
                          THEN ts END AS valid_click_ts
              FROM events),
            marked2 AS (
              SELECT *, CASE WHEN event_type = 'purchase'
                             AND min(valid_click_ts)
                                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                                 IS NOT NULL
                             THEN ts END AS valid_purchase_ts
              FROM marked),
            funnel AS (
              SELECT user_id,
                     min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                     min(valid_click_ts) AS t_click,
                     min(valid_purchase_ts) AS t_purchase
              FROM marked2 GROUP BY user_id)
            SELECT user_id, t_view, t_click, t_purchase,
                   CASE WHEN t_purchase IS NOT NULL THEN 3
                        WHEN t_click IS NOT NULL THEN 2
                        WHEN t_view IS NOT NULL THEN 1
                        ELSE 0 END AS stage,
                   epoch_us(t_click) - epoch_us(t_view) AS us_view_to_click,
                   epoch_us(t_purchase) - epoch_us(t_click) AS us_click_to_purchase
            FROM funnel ORDER BY user_id""")
  )

  val all: Seq[Q] = Seq(qTpchShipping, qTpchMarket, qTpchReturns, qFunnel)
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Engine-independent laws for the E18 graph family (the oracle proves
  * engine agreement; these prove the MATH on an independent driver-side
  * recompute).
  */
class GraphSpec extends SparkSpec {

  private def baskets: Map[Long, Set[Long]] =
    Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }

  test("q_cooccur: pairs match a brute-force basket recount, oriented a<b") {
    val got = Graph.qCooccur.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val brute = baskets.values.toSeq
      .flatMap(items => items.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got.keys.forall { case (a, b) => a < b })
    // the query returns the top-25 by (support desc, pa, pb); every
    // returned pair must carry its exact brute-force support, and no
    // unreturned pair may beat the weakest returned one
    got.foreach { case (k, s) => assert(brute(k) == s, s"support mismatch at $k") }
    val cutoff = got.values.min
    val returned = got.keySet
    assert(brute.filterNot { case (k, _) => returned(k) }.values.forall(_ <= cutoff))
  }

  test("q_triangles: participation counts match brute-force enumeration") {
    val got = Graph.qTriangles.fn(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val support = baskets.values.toSeq
      .flatMap(items => items.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    // NOT `support.collect { case (k, s) if s >= 2 => k }`: collecting
    // (Long,Long) pairs out of a Map rebuilds a Map and silently dedupes
    // by first element
    val edges = support.filter(_._2 >= 2).keySet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val adj = nodes.map(n => n ->
      edges.collect { case (a, b) if a == n => b }).toMap
    val brute = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (a <- nodes; b <- adj(a); c <- adj(b) if edges((a, c))) {
      brute(a) += 1; brute(b) += 1; brute(c) += 1
    }
    assert(got == brute.toMap, "triangle participation diverged")
  }

  test("q_pmi: lift matches brute force and rank equals the PMI rank") {
    val got = Graph.qPmi.fn(spark, sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2), r.getDouble(3)))
    val bs = baskets.values.toSeq
    val n = bs.size.toLong
    val marg = bs.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val support = bs
      .flatMap(items => items.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    got.foreach { case (k, sup, lift) =>
      assert(support(k) == sup)
      assert(sup >= 3, "min support violated")
      val expect = (sup * n).toDouble / (marg(k._1) * marg(k._2))
      assert(lift == expect, s"lift mismatch at $k: $lift vs $expect")
      // rank-equivalence: lift order is PMI order (log is monotone)
      assert(math.log(lift) == math.log(expect))
    }
    // nothing outside the top-25 beats the weakest returned lift
    val cutoff = got.map(_._3).min
    val returned = got.map(_._1).toSet
    support.collect { case (k, sup) if sup >= 3 && !returned(k) =>
      (sup * n).toDouble / (marg(k._1) * marg(k._2))
    }.foreach(l => assert(l <= cutoff))
  }

  test("q_label_prop: equals a brute-force synchronous LPA walk") {
    // independent formulation: adjacency maps + per-round frequency
    // argmax with (count desc, label asc) tie-break, 4 rounds
    val support = baskets.values.toSeq
      .flatMap(items => items.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val edges = support.toSeq.collect { case ((a, b), c) if c >= 2 => (a, b) }
    val adj = (edges.map { case (a, b) => (a, b) } ++ edges.map { case (a, b) => (b, a) })
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var labels: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      labels = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(labels).map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val got = Graph.qLabelProp.fn(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == labels, "engine LPA diverged from the brute-force walk")
    // the walk must actually form communities: strictly fewer labels
    // than nodes, and every label is a member node's id
    assert(got.values.toSet.size < got.size)
    assert(got.values.toSet.subsetOf(got.keySet))
  }

  test("q_khop: equals a brute-force BFS walk from the seed set") {
    // independent formulation: adjacency maps + queue BFS, 4 levels
    val base = Tables.orders(spark, sf0001)
      .join(Tables.lineitem(spark, sf0001), col("o_orderkey") === col("l_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val adj = (base ++ base.map(_.swap)).toSeq
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val seeds = Tables.customer(spark, sf0001)
      .where(col("c_nationkey") === 1).select("c_custkey").collect()
      .map(_.getLong(0) * 2).toSet
    var dist: Map[Long, Int] = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (k <- 1 to 4) {
      val nxt = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- dist.keySet
      dist = dist ++ nxt.map(_ -> k)
      frontier = nxt
    }
    val got = Graph.qKhop.fn(spark, sf0001).collect().map { r =>
      val key = r.getLong(1)
      val node = if (r.getString(0) == "customer") key * 2 else key * 2 + 1
      node -> r.getInt(2)
    }.toMap
    assert(got == dist, "engine BFS diverged from the brute-force walk")
    // levels must be non-trivial: some node strictly beyond the seeds
    assert(got.values.exists(_ > 0))
    // minimality: a node at level k>0 has a neighbor at level k-1 and
    // none at a smaller level
    got.foreach { case (n, k) =>
      if (k > 0) {
        val nbrLevels = adj.getOrElse(n, Set.empty).flatMap(got.get)
        assert(nbrLevels.min == k - 1, s"node $n at $k has nbr levels $nbrLevels")
      }
    }
  }

  test("q_pagerank: exact mass bounds, positivity, and kind encoding") {
    val rows = Graph.qPagerank.fn(spark, sf0001).collect()
    val n = rows.length
    val scale = 1000000000000L
    val init = scale / n
    val baseMass = 15L * init / 100L
    val total = rows.map(_.getLong(2)).sum
    // every node keeps at least the teleport mass, and floor division
    // only ever LOSES mass: total ∈ (0, SCALE]; the per-iteration loss
    // is < 1 per (edge + node + the two /100 floors) — bound loosely
    assert(rows.forall(_.getLong(2) >= baseMass))
    assert(total <= scale)
    assert(total > scale / 2, s"mass collapsed: $total")
    assert(rows.map(r => (r.getString(0), r.getLong(1))).distinct.length == n)
    assert(rows.forall(r => r.getString(0) == "customer" || r.getString(0) == "supplier"))
  }

  test("q_pagerank: suppliers out-rank customers on the trade graph") {
    // 10 suppliers absorb the mass of 150 customers' endorsements —
    // the ranking must reflect graph centrality, not the uniform init
    val rows = Graph.qPagerank.fn(spark, sf0001).collect()
    val byKind = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)))
    val avgSupp = byKind("supplier").sum / byKind("supplier").length
    val avgCust = byKind("customer").sum / byKind("customer").length
    assert(avgSupp > 10 * avgCust, s"supplier avg $avgSupp vs customer avg $avgCust")
  }

  test("q_random_walk: equals a brute-force adjacency-map walk with the same hash choice") {
    // independent re-derivation: sorted adjacency lists + the scaladoc's
    // choice rule in BigInt — every emitted step must follow a real edge
    // picked at exactly the hashed rank
    val base = Tables.orders(spark, sf0001)
      .join(Tables.lineitem(spark, sf0001), col("o_orderkey") === col("l_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val adj = (base ++ base.map(_.swap)).toSeq
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).sorted }
    def choice(walk: Long, step: Long, cur: Long, deg: Int): Int = {
      val h = (BigInt(walk) * 1000003 + BigInt(step) * 7919 + BigInt(cur) * 31)
        .mod(BigInt(1000000007L))
      (h * BigInt(2654435761L)).mod(BigInt(4294967296L)).mod(BigInt(deg)).toInt
    }
    val starts = adj.keys.filter(_ % 40 == 0).toSeq.sorted
    assert(starts.nonEmpty, "fixture must yield at least one walk start")
    val expect = starts.flatMap { s0 =>
      var cur = s0
      (0 to 4).map { i =>
        if (i > 0) {
          val nbrs = adj(cur)
          cur = nbrs(choice(s0, i, cur, nbrs.length))
        }
        (s0, i, cur)
      }
    }.sorted
    val got = Graph.qRandomWalk.fn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(got.nonEmpty && got.toSeq == expect,
      "engine walks diverged from the brute-force hash-choice walk")
    // every consecutive step is a real edge (the walk never teleports)
    got.groupBy(_._1).foreach { case (_, steps) =>
      steps.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, a), (_, _, b)) =>
          assert(adj(a).contains(b), s"step $a -> $b is not an edge")
        case _ =>
      }
    }
  }
}

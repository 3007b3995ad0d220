package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** PageRank semantics: hand-computed ranks, mass conservation on a
  * dangling-free graph, and partitioning invariance. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L),
    (4L, 3L)).toDF("src", "dst")

  test("one damped iteration matches the hand computation") {
    val pr = GraphOps.pageRank(edges, "src", "dst", iters = 1,
        damping = 0.5)
      .as[(Long, Double)].collect().toMap
    // N=4, uniform 0.25 start; contributions: ->1: 0.25, ->2: 0.125,
    // ->3: 0.125+0.25+0.25; pr' = 0.125 + 0.5*c
    assert(math.abs(pr(1L) - 0.25) < 1e-12)
    assert(math.abs(pr(2L) - 0.1875) < 1e-12)
    assert(math.abs(pr(3L) - 0.4375) < 1e-12)
    assert(math.abs(pr(4L) - 0.125) < 1e-12)
  }

  test("mass conserves over iterations when no node dangles, and the " +
      "sink-heavy node dominates") {
    val pr = GraphOps.pageRank(edges, "src", "dst", iters = 5,
        damping = 0.85)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9,
      s"every node has out-edges, mass must conserve: $pr")
    // node 4 receives nothing -> strict minimum; 3 (in-degree 3) and
    // 1 (sole heir of 3's whole mass) dominate the middle node 2
    assert(pr(4L) === pr.values.min, s"sourceless node must rank last: $pr")
    assert(pr(3L) > pr(2L) && pr(1L) > pr(2L),
      s"heavy-inflow nodes must outrank the middle: $pr")
  }

  test("dangling redistribution: mass is exactly conserved every " +
      "iteration on a sink-heavy graph, and leaks without it") {
    // 4 is a sink (no out-edges) holding real mass
    val withSink = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L))
      .toDF("src", "dst")
    val (prLeak, statsLeak) = GraphOps.pageRankWithStats(withSink,
      "src", "dst", iters = 4, damping = 0.85,
      redistributeDangling = false)
    assert(statsLeak.map(_.iter) === Seq(1, 2, 3, 4))
    assert(statsLeak.forall(s => s.mass < 1.0 - 1e-6),
      s"sink mass must leak without redistribution: $statsLeak")
    assert(prLeak.agg(sum("pr")).head().getDouble(0) < 1.0 - 1e-6)

    val (prFull, statsFull) = GraphOps.pageRankWithStats(withSink,
      "src", "dst", iters = 4, damping = 0.85,
      redistributeDangling = true)
    statsFull.foreach(s => assert(math.abs(s.mass - 1.0) < 1e-9,
      s"stochastic-matrix form must conserve mass at iteration ${s.iter}: $s"))
    assert(math.abs(prFull.agg(sum("pr")).head().getDouble(0) - 1.0) < 1e-9)
    // the L1 delta is the convergence probe: it must shrink
    assert(statsFull.last.l1Delta < statsFull.head.l1Delta,
      s"power iteration must converge: $statsFull")
  }

  test("redistribution is a no-op on a dangling-free graph") {
    val a = GraphOps.pageRank(edges, "src", "dst", 3, 0.85)
      .as[(Long, Double)].collect().toMap
    val b = GraphOps.pageRank(edges, "src", "dst", 3, 0.85,
        redistributeDangling = true)
      .as[(Long, Double)].collect().toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12) }
  }

  test("partitioning-invariant up to float noise") {
    val a = GraphOps.pageRank(edges, "src", "dst", 3, 0.85)
      .as[(Long, Double)].collect().toMap
    val b = GraphOps.pageRank(edges.repartition(7), "src", "dst", 3, 0.85)
      .as[(Long, Double)].collect().toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12) }
  }
}

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

  test("partitioning-invariant up to float noise") {
    val a = GraphOps.pageRank(edges, "src", "dst", 3, 0.85)
      .as[(Long, Double)].collect().toMap
    val b = GraphOps.pageRank(edges.repartition(7), "src", "dst", 3, 0.85)
      .as[(Long, Double)].collect().toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12) }
  }
}

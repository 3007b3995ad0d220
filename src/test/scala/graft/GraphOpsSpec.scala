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

  test("seeded PageRank: teleport mass stays on the seeds, ranks sum " +
    "to 1, nodes unreachable from the seed set hold rank 0, and a " +
    "uniform (all-node) seed set degenerates to the stochastic form") {
    // s -> a -> b (b a sink) plus an island x -> y the seed never
    // reaches: teleport-to-s only, so the island must hold zero rank
    val g = Seq(("s", "a"), ("a", "b"), ("x", "y")).toDF("src", "dst")
    val seeds = Seq("s").toDF("v")
    val pr = GraphOps.pageRankSeeded(g, "src", "dst", seeds,
        iters = 4, damping = 0.85)
      .as[(String, Double)].collect().toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9,
      s"TrustRank form must conserve mass: $pr")
    assert(pr("x") === 0.0 && pr("y") === 0.0,
      s"rank must not leak to an island the seeds cannot reach: $pr")
    assert(Seq("s", "a", "b").map(pr).forall(_ > 0.0) &&
      math.abs(Seq("s", "a", "b").map(pr).sum - 1.0) < 1e-9,
      s"all mass lives on the seed's reachable component: $pr")
    // all-node seeds ≡ uniform teleport with dangling redistribution
    val allNodes = g.select(col("src").as("v"))
      .unionByName(g.select(col("dst").as("v"))).distinct()
    val a = GraphOps.pageRankSeeded(g, "src", "dst", allNodes, 3, 0.85)
      .as[(String, Double)].collect().toMap
    val b = GraphOps.pageRank(g, "src", "dst", 3, 0.85,
        redistributeDangling = true)
      .as[(String, Double)].collect().toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-9,
      s"uniform seeds must reproduce the unseeded ranks: $k $v ${b(k)}") }
    // seeds outside the graph are ignored; an empty intersection is loud
    val prExtra = GraphOps.pageRankSeeded(g, "src", "dst",
        Seq("s", "zzz").toDF("v"), iters = 4, damping = 0.85)
      .as[(String, Double)].collect().toMap
    assert(!prExtra.contains("zzz"))
    intercept[IllegalArgumentException] {
      GraphOps.pageRankSeeded(g, "src", "dst", Seq("zzz").toDF("v"),
        2, 0.85).collect()
    }
  }

  test("partitioning-invariant up to float noise") {
    val a = GraphOps.pageRank(edges, "src", "dst", 3, 0.85)
      .as[(Long, Double)].collect().toMap
    val b = GraphOps.pageRank(edges.repartition(7), "src", "dst", 3, 0.85)
      .as[(Long, Double)].collect().toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12) }
  }

  test("weighted: rank splits across out-edges by weight; uniform " +
      "weights reproduce the unweighted ranks exactly") {
    // a -> b (w=3), a -> c (w=1): b receives 3x c's contribution
    val we = Seq(("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0),
      ("c", "a", 1.0)).toDF("src", "dst", "w")
    val pr = GraphOps.pageRankWeighted(we, "src", "dst", "w",
        iters = 1, damping = 0.5)
      .as[(String, Double)].collect().toMap
    // start 1/3; contributions: b: (1/3)*(3/4), c: (1/3)*(1/4),
    // a: 1/3 + 1/3; pr' = (1-d)/3 + d*c
    assert(math.abs(pr("b") - (0.5 / 3 + 0.5 * 0.25)) < 1e-12)
    assert(math.abs(pr("c") - (0.5 / 3 + 0.5 * (0.25 / 3))) < 1e-12)
    assert(math.abs(pr("a") - (0.5 / 3 + 0.5 * (2.0 / 3))) < 1e-12)
    // all-equal weights == the unweighted recurrence, bit for bit
    val uni = GraphOps.pageRank(edges, "src", "dst", iters = 3,
      damping = 0.85).as[(Long, Double)].collect().toMap
    val wuni = GraphOps.pageRankWeighted(
      edges.withColumn("w", lit(7.0)), "src", "dst", "w",
      iters = 3, damping = 0.85).as[(Long, Double)].collect().toMap
    assert(uni === wuni)
  }

  test("weighted: parallel edges aggregate before the iteration") {
    val dup = Seq(("a", "b", 1.0), ("a", "b", 2.0), ("a", "c", 3.0),
      ("b", "a", 1.0), ("c", "a", 1.0)).toDF("src", "dst", "w")
    val merged = Seq(("a", "b", 3.0), ("a", "c", 3.0), ("b", "a", 1.0),
      ("c", "a", 1.0)).toDF("src", "dst", "w")
    val p1 = GraphOps.pageRankWeighted(dup, "src", "dst", "w", 2, 0.85)
      .as[(String, Double)].collect().toMap
    val p2 = GraphOps.pageRankWeighted(merged, "src", "dst", "w", 2, 0.85)
      .as[(String, Double)].collect().toMap
    assert(p1.keySet === p2.keySet)
    p1.keys.foreach(k => assert(math.abs(p1(k) - p2(k)) < 1e-12))
  }

  test("resolveChains: log-round pointer jumping lands on terminals; " +
      "cycles and over-long chains flag unresolved") {
    // chain a->b->c->d (terminal d), 2-cycle x<->y, parallel edge
    // p -> {q, r} collapses to min(q)
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"),
      ("y", "x"), ("p", "r"), ("p", "q")).toDF("src", "dst")
    val got = GraphOps.resolveChains(e, "src", "dst", maxRounds = 3)
      .as[(String, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") === (("d", true)))
    assert(got("b") === (("d", true)))
    assert(got("c") === (("d", true)))
    assert(got("p") === (("q", true)))
    assert(!got("x")._2 && !got("y")._2, s"cycle must flag: $got")
    // a 5-hop chain under maxRounds=1 (resolves <=2 hops) stays
    // unresolved; maxRounds=3 (<=8 hops) finishes it
    val long = Seq(("n1","n2"),("n2","n3"),("n3","n4"),("n4","n5"),
      ("n5","n6")).toDF("src", "dst")
    val under = GraphOps.resolveChains(long, "src", "dst", 1)
      .filter(!$"resolved").count()
    assert(under > 0)
    val full = GraphOps.resolveChains(long, "src", "dst", 3)
      .as[(String, String, Boolean)].collect()
    assert(full.forall(r => r._2 == "n6" && r._3))
  }

  test("harmonicCentrality: integer 12/d sums match the hand BFS, " +
    "minimal distances win over longer rediscoveries, the radius " +
    "bound truncates, and parallel/self edges are ignored") {
    // a -> b -> c -> d (chain), plus a -> c (shortcut), self loop on
    // a, and a duplicated a -> b edge
    val e = Seq(("a", "b"), ("a", "b"), ("a", "a"), ("b", "c"),
      ("a", "c"), ("c", "d")).toDF("src", "dst")
    val got = GraphOps.harmonicCentrality(e, "src", "dst", 4)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // distances into b: a@1 -> 12; into c: a@1 (shortcut wins over
    // a->b->c@2), b@1 -> 24; into d: c@1, a@2, b@2 -> 12+6+6 = 24
    assert(got === Map(
      "b" -> ((12L, 1L)), "c" -> ((24L, 2L)), "d" -> ((24L, 3L))))
    // radius 1: only direct predecessors count
    val r1 = GraphOps.harmonicCentrality(e, "src", "dst", 1)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(r1 === Map(
      "b" -> ((12L, 1L)), "c" -> ((24L, 2L)), "d" -> ((12L, 1L))))
  }

  test("coreness: the h-index fixpoint lands exact k-core numbers — " +
    "a K4 core survives its pendant and a long tail, direction and " +
    "duplicates are ignored, and the fixpoint flag reports " +
    "convergence") {
    // K4 {a,b,c,d} (coreness 3 each) + pendant chain a-e-f (coreness
    // 1: the chain peels at k=2) + a triangle {x,y,z} hanging off d
    // via one bridge edge (coreness 2 — its own 2-core, not pulled
    // up by the K4)
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
      ("c", "d"),
      ("e", "a"), ("f", "e"), ("b", "a"), // pendant chain + dup
      ("d", "x"), ("x", "y"), ("y", "z"), ("z", "x")).toDF("src", "dst")
    val got = GraphOps.coreness(edges, "src", "dst")
      .as[(String, Long, Long, Boolean)].collect()
    assert(got.forall(_._4), "must reach the fixpoint")
    val m = got.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m === Map(
      "a" -> ((4L, 3L)), "b" -> ((3L, 3L)), "c" -> ((3L, 3L)),
      "d" -> ((4L, 3L)),
      "e" -> ((2L, 1L)), "f" -> ((1L, 1L)),
      "x" -> ((3L, 2L)), "y" -> ((2L, 2L)), "z" -> ((2L, 2L))))
  }

  test("coreness hub safety: the two-level histogram fold matches an " +
    "independent sequential peel on a graph with one hub of degree " +
    "far above every other node") {
    // power-law-ish shape: hub h fans out to 500 leaves (degree 505);
    // a K6 {h, p1..p5} keeps the hub's coreness at 5; every third
    // leaf pairs with its successor (l_i-l_{i+1} + both on h =>
    // triangles => coreness 2); lone leaves peel at k=1. The hub's
    // histogram collapses to a handful of distinct values even
    // though its neighbor list dwarfs every other node's.
    val hubEdges =
      (0 until 500).map(i => ("h", s"l$i")) ++
      (1 to 5).map(i => ("h", s"p$i")) ++
      (for (i <- 1 to 5; j <- i + 1 to 5) yield (s"p$i", s"p$j")) ++
      (0 until 500 by 3).filter(_ + 1 < 500)
        .map(i => (s"l$i", s"l${i + 1}"))
    // independent oracle: sequential min-degree peeling (the textbook
    // k-core algorithm the distributed fixpoint must reproduce)
    def peel(es: Seq[(String, String)]): Map[String, Int] = {
      import scala.collection.mutable
      val adj = mutable.Map.empty[String, mutable.Set[String]]
      es.filter(e => e._1 != e._2).foreach { case (a, b) =>
        adj.getOrElseUpdate(a, mutable.Set.empty) += b
        adj.getOrElseUpdate(b, mutable.Set.empty) += a
      }
      val deg = mutable.Map(adj.view.mapValues(_.size).toSeq: _*)
      val alive = mutable.Set(adj.keys.toSeq: _*)
      val core = mutable.Map.empty[String, Int]
      var k = 0
      while (alive.nonEmpty) {
        val v = alive.minBy(x => (deg(x), x))
        k = math.max(k, deg(v))
        core(v) = k
        alive -= v
        adj(v).foreach(u => if (alive(u)) deg(u) -= 1)
      }
      core.toMap
    }
    val expected = peel(hubEdges)
    val got = GraphOps.coreness(hubEdges.toDF("src", "dst"), "src", "dst")
      .as[(String, Long, Long, Boolean)].collect()
    assert(got.forall(_._4), "must reach the fixpoint")
    assert(got.map(r => r._1 -> r._3.toInt).toMap === expected)
    val hub = got.find(_._1 === "h").get
    assert(hub._2 === 505L && hub._3 === 5L,
      "the hub's degree dwarfs its coreness")
  }

  test("bowTie: pivot FW/BW reachability lands the Broder classes — " +
    "mutual cycle = SCC, feeders = IN, sinks = OUT, islands = OTHER") {
    val g = Seq(("a", "b"), ("b", "a"), ("c", "a"), ("b", "d"),
      ("e", "f")).toDF("src", "dst")
    val out = GraphOps.bowTie(g, "src", "dst", pivot = "a")
    val cls = out.select("v", "cls").as[(String, String)]
      .collect().toMap
    assert(cls === Map("a" -> "scc", "b" -> "scc", "c" -> "in",
      "d" -> "out", "e" -> "other", "f" -> "other"))
    assert(out.select("converged").as[Boolean].collect()
      .forall(identity), "exhausted closures report converged")
  }

  test("bowTie: a round budget that truncates a closure surfaces " +
    "converged = false instead of silently misclassifying") {
    // chain of length 4 out of the pivot: one round reaches only b
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("a", "a2"), ("a2", "a")).toDF("src", "dst")
    val out = GraphOps.bowTie(g, "src", "dst", pivot = "a",
      maxRounds = 1)
    assert(out.select("converged").as[Boolean].collect()
      .forall(_ == false))
    val full = GraphOps.bowTie(g, "src", "dst", pivot = "a")
    assert(full.select("converged").as[Boolean].collect()
      .forall(identity))
    assert(full.filter($"v" === "e").select("cls").as[String]
      .head() === "out")
  }

  test("bowTieFull: tendrils, tube and islands split out of OTHER; " +
    "empty IN/OUT cut sets stay well-defined") {
    // scc {a,b}; in {i}; out {o}; tendril off IN (i->ti), tendril
    // into OUT (to2->o), tube i->tu->o, island {x,y}
    val g = Seq(("a", "b"), ("b", "a"), ("i", "a"), ("a", "o"),
      ("i", "ti"), ("to2", "o"), ("i", "tu"), ("tu", "o"),
      ("x", "y")).toDF("src", "dst")
    val cls = GraphOps.bowTieFull(g, "src", "dst", pivot = "a")
      .select("v", "cls").as[(String, String)].collect().toMap
    assert(cls === Map("a" -> "scc", "b" -> "scc", "i" -> "in",
      "o" -> "out", "ti" -> "tendril_in", "to2" -> "tendril_out",
      "tu" -> "tube", "x" -> "disconnected", "y" -> "disconnected"))
    // degenerate: a pure out-star has NO in set — the IN-forward
    // closure is empty and unclassified nodes fall to the right side
    val star = Seq(("p", "q"), ("p", "r"), ("z", "w")).toDF("src", "dst")
    val c2 = GraphOps.bowTieFull(star, "src", "dst", pivot = "p")
      .select("v", "cls").as[(String, String)].collect().toMap
    assert(c2("p") === "scc" && c2("q") === "out" && c2("r") === "out")
    assert(c2("z") === "disconnected" && c2("w") === "disconnected")
    // degenerate: no out set either way round
    val sink = Seq(("u", "p2"), ("v", "p2")).toDF("src", "dst")
    val c3 = GraphOps.bowTieFull(sink, "src", "dst", pivot = "p2")
      .select("v", "cls").as[(String, String)].collect().toMap
    assert(c3 === Map("p2" -> "scc", "u" -> "in", "v" -> "in"))
  }

  test("scc: iterated FW-BW labels every component with its min " +
    "node; acyclic graphs are all singletons; the condensation is a " +
    "DAG; bowTie's SCC class is exactly the pivot's label set") {
    // two cycles {a,b,c} and {d,e}, a bridge c->d, a pendant f
    val g = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"),
      ("e", "d"), ("c", "d"), ("e", "f")).toDF("src", "dst")
    val out = GraphOps.scc(g, "src", "dst")
    val lab = out.select("v", "scc").as[(String, String)]
      .collect().toMap
    assert(lab === Map("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "d", "e" -> "d", "f" -> "f"))
    assert(out.select("converged").as[Boolean].collect()
      .forall(identity))
    // acyclic chain: every node its own SCC
    val chain = Seq(("x", "y"), ("y", "z")).toDF("src", "dst")
    val singles = GraphOps.scc(chain, "src", "dst")
      .select("v", "scc").as[(String, String)].collect()
    assert(singles.forall(p => p._1 === p._2))
    // condensation is a DAG: contracting labels and re-running SCC
    // yields only singletons
    val cond = g.select($"src", $"dst")
      .join(Seq(("a","a"),("b","a"),("c","a"),("d","d"),("e","d"),
        ("f","f")).toDF("src", "ls"), "src")
      .join(Seq(("a","a"),("b","a"),("c","a"),("d","d"),("e","d"),
        ("f","f")).toDF("dst", "ld"), "dst")
      .select($"ls".as("src"), $"ld".as("dst"))
      .filter($"src" =!= $"dst")
    val condScc = GraphOps.scc(cond, "src", "dst")
      .select("v", "scc").as[(String, String)].collect()
    assert(condScc.forall(p => p._1 === p._2), "condensation is a DAG")
    // agreement with the one-step FW-BW: bowTie's scc class from
    // pivot 'a' = the nodes labeled 'a'
    val bt = GraphOps.bowTie(g, "src", "dst", pivot = "a")
      .filter($"cls" === "scc").select("v").as[String].collect().toSet
    assert(bt === lab.filter(_._2 == "a").keySet)
  }

  test("hyperBallDigests: sketch estimates track exact in-ball sizes, " +
    "merges are idempotent past the fixpoint, and state stays " +
    "register-bounded") {
    // chain a -> b -> c -> d plus e -> b: exact in-balls (self incl.)
    // at r=3: a:1, b:3, c:4, d:5, e:1
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("e", "b"))
      .toDF("src", "dst")
    val d3 = GraphOps.hyperBallDigests(g, "src", "dst", maxRadius = 3,
      p = 4)
    val rows = d3.filter($"r" === 3)
      .select("v", "n_regs", "sum_pow")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val exact = Map("a" -> 1, "b" -> 3, "c" -> 4, "d" -> 5, "e" -> 1)
    for ((v, n) <- exact) {
      val (regs, pow) = rows(v)
      assert(regs <= n, s"$v: registers cannot exceed ball size")
      val est = GraphOps.hllEstimate(regs, pow, p = 4)
      assert(math.abs(est - n) / n <= 0.45,
        s"$v: estimate $est too far from exact ball $n")
    }
    // fixpoint idempotence: radius 5 digests equal radius 3's (the
    // longest chain is 3 hops — extra merge rounds are no-ops)
    val d5 = GraphOps.hyperBallDigests(g, "src", "dst", maxRadius = 5,
      p = 4)
    def key(df: org.apache.spark.sql.DataFrame, r: Int) =
      df.filter($"r" === r)
        .select("v", "n_regs", "sum_rho", "sum_pow")
        .as[(String, Long, Long, Long)].collect().toSet
    assert(key(d5, 5) === key(d3, 3))
    // register-bounded: no node ever holds more than m = 16 rows'
    // worth of registers
    assert(d3.groupBy("v", "r").count()
      .agg(org.apache.spark.sql.functions.max("count")).head()
      .getLong(0) === 1L)
    assert(rows.values.forall(_._1 <= 16))
  }

  test("harmonicFromDigests: sketch-estimated harmonic centrality " +
    "tracks the exact bounded-ball op within HLL error") {
    // two feeders into a chain: exact H at R=3 — a:0, b:2 (two at
    // d=1), c:2·1/2+... compute from harmonicCentrality directly
    val g = Seq(("a", "b"), ("e", "b"), ("b", "c"), ("c", "d"))
      .toDF("src", "dst")
    val exact = GraphOps.harmonicCentrality(g, "src", "dst",
        maxRadius = 3)
      .select($"v", ($"harmonic_x12" / 12.0).as("h"))
      .as[(String, Double)].collect().toMap
    val est = GraphOps.harmonicFromDigests(
        GraphOps.hyperBallDigests(g, "src", "dst", maxRadius = 3, p = 4),
        p = 4)
      .as[(String, Double)].collect().toMap
    // every node with in-reach appears, ordering preserved within
    // tolerance: the sink d (largest in-ball) must estimate highest
    for ((v, h) <- exact) {
      val e = est(v)
      assert(math.abs(e - h) <= math.max(0.45 * h, 0.8),
        s"$v: estimate $e vs exact $h")
    }
    assert(est("d") === est.values.max,
      "the deepest sink has the largest estimated harmonic centrality")
  }

  test("closenessCentrality: hand-computed reach/sum on a chain with " +
    "two feeders; closeness = reach / sum_dist exactly") {
    // a->b, e->b, b->c, c->d: into d within R=3 arrive b(1 hop? no —
    // d's in-ball: c at 1, b at 2, a and e at 3) -> reach 4, sum 1+2+3+3
    val g = Seq(("a", "b"), ("e", "b"), ("b", "c"), ("c", "d"))
      .toDF("src", "dst")
    val out = GraphOps.closenessCentrality(g, "src", "dst", maxRadius = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("d") === ((4L, 9L, 4.0 / 9)))
    assert(out("b") === ((2L, 2L, 1.0)))
    assert(out("c") === ((3L, 5L, 3.0 / 5)))
    assert(!out.contains("a") && !out.contains("e"),
      "nodes nothing reaches have no closeness row")
  }

  test("distanceDistribution + effectiveDiameter: exact ND(r) on the " +
    "chain, interpolated diameter crosses where the pairs do") {
    val g = Seq(("a", "b"), ("e", "b"), ("b", "c"), ("c", "d"))
      .toDF("src", "dst")
    val nd = GraphOps.distanceDistribution(g, "src", "dst", maxRadius = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // 5 nodes; pairs by distance: d=1: 4 edges; d=2: a->c, e->c, b->d;
    // d=3: a->d, e->d
    assert(nd === Map(0 -> 5L, 1 -> 9L, 2 -> 12L, 3 -> 14L))
    val ed = GraphOps.effectiveDiameter(
      GraphOps.distanceDistribution(g, "src", "dst", 3), q = 0.9)
      .collect().head
    // target 12.6 crosses between r=2 (12) and r=3 (14): 2 + 0.6/2
    assert(ed.getDouble(0) === 0.9 && ed.getLong(1) === 14L)
    assert(math.abs(ed.getDouble(2) - 2.3) < 1e-12)
    // q below ND(0)/ND(max): the diameter collapses to 0 exactly
    val ed0 = GraphOps.effectiveDiameter(
      GraphOps.distanceDistribution(g, "src", "dst", 3), q = 0.3)
      .collect().head
    assert(ed0.getDouble(2) === 0.0)
  }

  test("closenessFromDigests + effectiveDiameter(neighbourhood): the " +
    "sketch consumers track the exact ops within HLL error") {
    val g = Seq(("a", "b"), ("e", "b"), ("b", "c"), ("c", "d"))
      .toDF("src", "dst")
    val digests = GraphOps.hyperBallDigests(g, "src", "dst",
      maxRadius = 3, p = 4)
    val exact = GraphOps.closenessCentrality(g, "src", "dst", 3)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val est = GraphOps.closenessFromDigests(digests, p = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    for ((v, c) <- exact) {
      assert(est.contains(v), s"$v missing from the sketch closeness")
      assert(math.abs(est(v) - c) <= math.max(0.45 * c, 0.5),
        s"$v: estimate ${est(v)} vs exact $c")
    }
    val exDiam = GraphOps.effectiveDiameter(
      GraphOps.distanceDistribution(g, "src", "dst", 3), 0.9)
      .collect().head.getDouble(2)
    val estDiam = GraphOps.effectiveDiameter(
      GraphOps.neighbourhoodFromDigests(digests, p = 4), 0.9)
      .collect().head.getDouble(2)
    assert(math.abs(estDiam - exDiam) <= 1.0,
      s"effective diameter: estimate $estDiam vs exact $exDiam")
  }

  test("labelPropagation: two triangles over one bridge settle into " +
    "two communities; stable labels report converged") {
    val g = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("x", "y"), ("y", "z"), ("z", "x"), ("c", "x"))
      .toDF("src", "dst")
    val out = GraphOps.labelPropagation(g, "src", "dst", maxRounds = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getBoolean(2)))).toMap
    assert(out.values.forall(_._2), "fixture must converge")
    val comms = out.view.mapValues(_._1).toMap
    assert(Set(comms("a"), comms("b"), comms("c")).size === 1,
      s"left triangle one community: $comms")
    assert(Set(comms("x"), comms("y"), comms("z")).size === 1,
      s"right triangle one community: $comms")
    assert(comms("a") !== comms("x"),
      s"the bridge must not merge the triangles: $comms")
  }

  test("dagDepth: hand-computed longest-path layering on a diamond + " +
    "tail, isolated extras at depth 0, cycles report non-convergence") {
    // a->b, a->c, b->d, c->d, d->e : depths a0 b1 c1 d2 e3
    val g = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
      ("d", "e")).toDF("src", "dst")
    val extra = Seq("z").toDF("id")
    val out = GraphOps.dagDepth(g, "src", "dst", maxRounds = 10,
        extraNodes = Some(extra))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.view.mapValues(_._1).toMap === Map("a" -> 0L, "b" -> 1L,
      "c" -> 1L, "d" -> 2L, "e" -> 3L, "z" -> 0L))
    assert(out.values.forall(_._2), "a DAG converges")
    val cyc = GraphOps.dagDepth(
      Seq(("p", "q"), ("q", "p")).toDF("src", "dst"), "src", "dst",
      maxRounds = 4)
      .collect().map(_.getBoolean(2))
    assert(cyc.nonEmpty && cyc.forall(_ === false),
      "a cycle must hit the round guard, not spin")
  }

  test("labelPropagation: a 2-cycle (single edge) oscillates — the " +
    "round guard reports converged = false instead of spinning") {
    val g = Seq(("p", "q")).toDF("src", "dst")
    val out = GraphOps.labelPropagation(g, "src", "dst", maxRounds = 4)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(out.size === 2 && out.values.forall(_ === false),
      s"single-edge swap never stabilizes synchronously: $out")
  }

  test("trussness: maximal k per edge — K4 edges are 4-trusses, a " +
    "glued triangle 3, a bare chain 2; trussness >= k iff the edge " +
    "survives kTruss(k)") {
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
      ("c", "d"), ("b", "a"), ("c", "c"),
      ("d", "e"), ("e", "f"), ("d", "f"), ("f", "g")
    ).toDF("src", "dst")
    val tn = GraphOps.trussness(edges, "src", "dst")
    val got = tn.select("a", "b", "trussness")
      .as[(String, String, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val k4 = Set(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"))
    k4.foreach(e => assert(got(e) === 4, s"$e in the K4"))
    Set(("d", "e"), ("e", "f"), ("d", "f"))
      .foreach(e => assert(got(e) === 3, s"$e in the glued triangle"))
    assert(got(("f", "g")) === 2, "triangle-free edge is a 2-truss")
    assert(tn.select("converged").as[Boolean].collect()
      .forall(identity))
    // cross-check the defining property against kTruss at every k
    for (k <- 3 to 5) {
      val inTruss = GraphOps.kTruss(edges, "src", "dst", k)
        .select("a", "b").as[(String, String)].collect().toSet
      assert(got.filter(_._2 >= k).keySet === inTruss,
        s"trussness >= $k must equal kTruss($k) membership")
    }
  }

  test("kTruss: support peeling lands the maximal subgraph where " +
    "every edge closes k-2 triangles — a side triangle peels at k=4, " +
    "survives at k=3, and a bare chain peels everywhere") {
    // K4 {a,b,c,d} (each edge in 2 triangles), a triangle {d,e,f}
    // glued at d (each edge in 1), a chain f-g (no triangles),
    // plus a reverse duplicate and a self loop
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
      ("c", "d"), ("b", "a"), ("c", "c"),
      ("d", "e"), ("e", "f"), ("d", "f"), ("f", "g")
    ).toDF("src", "dst")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").as[(String, String)].collect().toSet
    val t4 = GraphOps.kTruss(edges, "src", "dst", k = 4)
    assert(t4.select("converged").as[Boolean].collect().forall(identity))
    assert(pairs(t4) === Set(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d")),
      "k=4 keeps exactly the K4")
    val t3 = GraphOps.kTruss(edges, "src", "dst", k = 3)
    assert(pairs(t3) === Set(("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("c", "d"),
      ("d", "e"), ("e", "f"), ("d", "f")),
      "k=3 keeps every edge in at least one triangle; the chain peels")
    // a fully-peeled graph converges to the empty truss
    val chain = Seq(("x", "y"), ("y", "z")).toDF("src", "dst")
    val t = GraphOps.kTruss(chain, "src", "dst", k = 3)
    assert(t.count() === 0)
  }

  test("triangleCounts: degree-oriented wedge closure counts each " +
    "triangle once at its min-(degree, name) apex; direction, " +
    "duplicates and self loops are ignored; triangle-free nodes " +
    "report zero with their degree intact") {
    // K4 on {a,b,c,d} (4 triangles, each node in 3), a pendant e-a,
    // plus a reverse duplicate, a parallel duplicate and a self loop
    val edges = Seq(
      ("a", "b"), ("b", "a"), ("a", "b"), ("c", "c"),
      ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
      ("e", "a")).toDF("src", "dst")
    val got = GraphOps.triangleCounts(edges, "src", "dst")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      "a" -> ((4L, 3L)), "b" -> ((3L, 3L)), "c" -> ((3L, 3L)),
      "d" -> ((3L, 3L)), "e" -> ((1L, 0L))))
  }
}

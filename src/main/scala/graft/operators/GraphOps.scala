package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Iterative graph computation as relational iterations — PageRank as
  * the representative: the pattern (join ranks to edges, aggregate
  * contributions per target, recompute) is the same loop the
  * connected-components closure and Lloyd k-means here already use,
  * and the scale discipline is identical:
  *
  *  - per-iteration state is ONE node-bounded rank table and the
  *    edge-bounded contribution shuffle — nothing quadratic, nothing
  *    driver-side beyond per-iteration scalars;
  *  - every iteration `localCheckpoint`s its rank table, so the plan
  *    stays flat in the iteration count (the pointer-jumping /
  *    BPE-loop precedent);
  *  - the recurrence is pure arithmetic over md5-free inputs, so a
  *    fixed-iteration run replays exactly as chained SQL CTEs
  *    (`graph_pagerank` / `graph_pagerank_dangling` oracles).
  *
  * Two variants of the damped power iteration
  * pr'(v) = (1-d)/N + d·Σ_{u→v} pr(u)/outdeg(u):
  *
  *  - `redistributeDangling = false`: the textbook simplest form —
  *    dangling-node mass leaks, so ranks sum BELOW 1 on any graph
  *    with sinks (fine for within-graph ordering, wrong for
  *    cross-subgraph comparison);
  *  - `redistributeDangling = true`: the stochastic-matrix form —
  *    each iteration's dangling mass Σ_{outdeg(v)=0} pr(v) is
  *    redistributed uniformly (+ d·dm/N per node), so ranks sum to
  *    EXACTLY 1 every iteration. Any real web graph is full of
  *    dangling URLs; this is the production default. Cost: one extra
  *    node-bounded aggregate per iteration.
  */
object GraphOps {

  /** Per-round checkpoints in this file flatten STATS as well as
    * lineage: the plain `localCheckpoint` inherits the origin plan's
    * estimated sizeInBytes, which multiplies through every join of a
    * round and compounds geometrically across rounds until Catalyst's
    * BigInt stats arithmetic dominates the driver (the truss ladder
    * hit minutes of million-bit multiplications). See
    * [[org.apache.spark.sql.graft.Bridge.flatCheckpoint]]. */
  private implicit class FlatCk(private val df: DataFrame) {
    def flatCk: DataFrame =
      org.apache.spark.sql.graft.Bridge.flatCheckpoint(df)
  }

  /** Per-iteration convergence telemetry: total rank mass after the
    * iteration (1.0 under redistribution, decaying without) and the
    * L1 delta vs the previous iteration's ranks — the convergence
    * probe that says when more iterations stop paying. */
  final case class PageRankIter(iter: Int, mass: Double, l1Delta: Double)

  /** Redirect-chain resolution — the crawl-pipeline step that folds
    * `src -> dst` redirect edges (a FUNCTIONAL graph: at most one
    * outgoing edge per src; parallel edges collapse to the minimum dst
    * for determinism) down to each source's TERMINAL target. Pointer
    * jumping doubles the resolved hop distance every round (the
    * connected-components discipline), so a chain of length L folds in
    * ceil(log2 L) rounds of ONE self-equi-join each, `localCheckpoint`
    * keeping the plan flat — never a sequential walk. Returns
    * `(src, tgt, resolved)`: `resolved = false` marks sources whose
    * target still has an outgoing edge after `maxRounds` — a cycle
    * (redirect loops are real) or a chain longer than 2^maxRounds.
    */
  def resolveChains(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 6): DataFrame = {
    require(maxRounds >= 1, s"maxRounds=$maxRounds")
    var m = edges
      .select(col(srcCol).as("src"), col(dstCol).as("tgt"))
      .groupBy("src").agg(min("tgt").as("tgt"))
      .flatCk
    for (_ <- 1 to maxRounds) {
      m = m.alias("a")
        .join(m.select(col("src").as("__s"), col("tgt").as("__t"))
          .alias("b"), col("tgt") === col("__s"), "left")
        .select(col("src"), coalesce(col("__t"), col("tgt")).as("tgt"))
        .flatCk
    }
    val srcs = m.select(col("src").as("__src")).distinct()
    m.join(srcs, col("tgt") === col("__src"), "left")
      .select(col("src"), col("tgt"), col("__src").isNull.as("resolved"))
  }

  /** `iters` damped power iterations from the uniform start. Returns
    * `(v, pr)` for every node appearing as src or dst. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double,
      redistributeDangling: Boolean = false): DataFrame =
    run(edges, srcCol, dstCol, None, iters, damping,
      redistributeDangling, collectStats = false)._1

  /** WEIGHTED variant: a node's rank splits across its out-edges in
    * proportion to edge weight (parallel edges sum) — the real
    * web-graph form, where a domain linking a target 40 times should
    * carry more mass than a single stray href. Same iteration shape;
    * deg becomes sum(w) and each contribution is pr*w/sum(w). */
  def pageRankWeighted(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iters: Int, damping: Double,
      redistributeDangling: Boolean = false): DataFrame =
    run(edges, srcCol, dstCol, Some(weightCol), iters, damping,
      redistributeDangling, collectStats = false)._1

  /** [[pageRank]] plus the per-iteration telemetry (bounded: `iters`
    * driver-side triples; each costs one extra node-bounded agg). */
  def pageRankWithStats(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double, redistributeDangling: Boolean)
      : (DataFrame, Seq[PageRankIter]) =
    run(edges, srcCol, dstCol, None, iters, damping,
      redistributeDangling, collectStats = true)

  /** SEEDED (personalized) PageRank — the TrustRank form crawl
    * prioritization runs from a trusted seed set (Gyöngyi et al.,
    * VLDB 2004): the teleport vector is restricted to `seeds`
    * (t(v) = 1/|S| for seeds present in the graph, 0 elsewhere)
    * instead of uniform, the walk STARTS from the teleport vector,
    * and each iteration's dangling mass redistributes PROPORTIONAL
    * to the teleport vector (never uniformly — a sink's mass flows
    * back to the seeds, which is what keeps rank concentrated near
    * them):
    *
    *   pr'(v) = (1-d)·t(v) + d·(Σ_{u→v} pr(u)/outdeg(u) + dm·t(v))
    *
    * so rank mass sums to EXACTLY 1 every iteration and a node
    * unreachable from the seed set holds rank 0 — the property that
    * makes seeded ranks a frontier-prioritization score. Seeds not
    * appearing in the edge set are ignored; `seeds = all nodes`
    * degenerates to [[pageRank]] with `redistributeDangling = true`.
    * Cost shape is identical to the uniform variant: one teleport
    * join at setup (node-bounded), the same edge-bounded
    * contribution shuffle per iteration. */
  def pageRankSeeded(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, iters: Int, damping: Double): DataFrame =
    run(edges, srcCol, dstCol, None, iters, damping,
      redistributeDangling = true, collectStats = false,
      seeds = Some(seeds))._1

  /** Radius-bounded EXACT harmonic centrality — the metric the public
    * web-graph releases rank hosts by: H(v) = Σ_{u≠v} 1/d(u, v) over
    * directed shortest-path distances INTO v, here truncated at
    * `maxRadius` hops (contributions beyond R are ≤ 1/(R+1) each and
    * the exact unbounded closure is O(V²) state — production systems
    * estimate the full sum with HyperBall sketches; the exact
    * bounded ball is what a domain-graph ranking job can afford to
    * compute exactly, and at R=4 it already separates hubs from
    * leaves). Returns `(v, harmonic_x12, n_reachable)` with the sum
    * scaled by lcm(1..4) = 12 into INTEGER units (requires
    * `maxRadius <= 4`) — bit-exact across summation orders, the
    * pixel-mean micro-unit discipline applied to centrality.
    *
    * Scale shape: round t joins the (u, v) frontier to the edge
    * table, dedups, and anti-joins the known set — ball-bounded
    * state, edge-bounded shuffles, `localCheckpoint` per round keeps
    * the plan flat in R (the pointer-jumping precedent). An empty
    * frontier short-circuits remaining rounds. */
  def harmonicCentrality(edges: DataFrame, srcCol: String,
      dstCol: String, maxRadius: Int): DataFrame = {
    require(maxRadius >= 1 && maxRadius <= 4,
      s"maxRadius in 1..4 (12-unit integer arithmetic), got $maxRadius")
    boundedReach(edges, srcCol, dstCol, maxRadius).groupBy(col("v"))
      .agg(sum((lit(12) / col("d")).cast("long")).as("harmonic_x12"),
        count(lit(1)).as("n_reachable"))
  }

  /** The exact radius-bounded reachability closure shared by
    * [[harmonicCentrality]], [[closenessCentrality]] and
    * [[distanceDistribution]]: `(u, v, d)` = u reaches v with minimal
    * hop count d ≤ maxRadius. BFS levels with an anti-join dedup —
    * pair-count state, the exact (O(pairs)) twin the HyperBall sketch
    * approximates in node-bounded state at web scale. */
  private def boundedReach(edges: DataFrame, srcCol: String,
      dstCol: String, maxRadius: Int): DataFrame = {
    require(maxRadius >= 1 && maxRadius <= 10,
      s"maxRadius in 1..10, got $maxRadius")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst")).distinct().flatCk
    // known(u, v, d): u reaches v, minimal hop count d
    var known = e.select(col("src").as("u"), col("dst").as("v"))
      .withColumn("d", lit(1)).flatCk
    var frontier = known
    var t = 2
    var exhausted = false
    while (t <= maxRadius && !exhausted) {
      val next = frontier.join(e, frontier("v") === e("src"))
        .select(col("u"), col("dst").as("v")).distinct()
        .filter(col("u") =!= col("v"))
        .join(known.select(col("u").as("__ku"), col("v").as("__kv")),
          col("u") === col("__ku") && col("v") === col("__kv"),
          "left_anti")
        .withColumn("d", lit(t))
        .flatCk
      if (next.isEmpty) exhausted = true
      else {
        known = known.unionByName(next).flatCk
        frontier = next
      }
      t += 1
    }
    known
  }

  /** Exact radius-bounded (in-)closeness centrality — the companion
    * geometric centrality next to [[harmonicCentrality]]: for each
    * node v, the count of nodes reaching it within `maxRadius` hops
    * and the SUM of their shortest-path distances;
    * `closeness = n_reachable / sum_dist` (the classic reachable-set
    * form; Lin-style (n_reachable²) renormalization is one consumer
    * multiply away). The ratio divides two exact integers, so unlike
    * the `ln`-crossing sketch estimator it is bit-identical on any
    * IEEE engine and safe to oracle. Same closure cost as harmonic
    * ([[boundedReach]] — pair-bounded; [[closenessFromDigests]] is
    * the node-bounded sketch path at web scale). */
  def closenessCentrality(edges: DataFrame, srcCol: String,
      dstCol: String, maxRadius: Int): DataFrame =
    boundedReach(edges, srcCol, dstCol, maxRadius).groupBy(col("v"))
      .agg(count(lit(1)).as("n_reachable"),
        sum(col("d").cast("long")).as("sum_dist"))
      .withColumn("closeness",
        col("n_reachable").cast("double") / col("sum_dist"))

  /** Exact radius-bounded distance distribution (the ANF
    * "neighbourhood function", Palmer et al. 2002): `(r, nd)` for
    * r = 0..maxRadius with nd = Σ_v |B_r(v)| — the count of ordered
    * pairs within distance r, self-pairs included (ND(0) = |V|).
    * Integer-exact; [[effectiveDiameter]] interpolates it. */
  def distanceDistribution(edges: DataFrame, srcCol: String,
      dstCol: String, maxRadius: Int): DataFrame = {
    val reach = boundedReach(edges, srcCol, dstCol, maxRadius)
      .flatCk
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
    val n = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v"))).distinct().count()
    val spark = edges.sparkSession
    import spark.implicits._
    val radii = (0 to maxRadius).toDF("r")
    radii.join(
        reach.groupBy(col("d")).agg(count(lit(1)).as("__c")),
        col("d") <= col("r"), "left")
      .groupBy("r")
      .agg((lit(n) + coalesce(sum(col("__c")), lit(0L))).as("nd"))
      .orderBy("r")
  }

  /** Effective diameter at quantile `q` from a distance distribution
    * `(r, nd)` — exact ([[distanceDistribution]]) or estimated
    * ([[neighbourhoodFromDigests]]): the smallest r with
    * nd(r) ≥ q·nd(max), linearly interpolated between the crossing
    * radius and its predecessor (the ANF/HyperANF convention).
    * Distribution size is maxRadius+1 rows — the unpartitioned window
    * is radius-bounded, never graph-bounded. All arithmetic is IEEE
    * exact-op (multiply/subtract/divide), so the exact-input form is
    * oracle-safe. Returns one row `(q, nd_max, eff_diameter)`. */
  def effectiveDiameter(dist: DataFrame, q: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("r"))
    val mx = dist.agg(max(col("nd")).cast("double").as("__mx"))
    dist.select(col("r").cast("double").as("r"),
        col("nd").cast("double").as("nd"))
      .withColumn("__pn", lag(col("nd"), 1).over(w))
      .withColumn("__prr", lag(col("r"), 1).over(w))
      .crossJoin(mx)
      .filter(col("nd") >= col("__mx") * q)
      .orderBy(col("r")).limit(1)
      .select(lit(q).as("q"), col("__mx").cast("long").as("nd_max"),
        when(col("__pn").isNull, col("r"))
          .otherwise(col("__prr") + (col("r") - col("__prr")) *
            (col("__mx") * q - col("__pn")) / (col("nd") - col("__pn")))
          .as("eff_diameter"))
  }

  /** Closeness-centrality ESTIMATES from [[hyperBallDigests]] output —
    * the second Boldi-Vigna consumer beside [[harmonicFromDigests]],
    * the same per-radius delta fold: reach ≈ 1 + Σ_r δ_r and
    * Σdist ≈ Σ_r r·δ_r with δ_r the (clamped-monotone) estimated
    * ball growth at radius r. Out of oracles like every `ln`-crossing
    * estimator — spec-verified against [[closenessCentrality]]'s
    * exact integers. Returns
    * `(v, reach_est, sum_dist_est, closeness_est)`. */
  def closenessFromDigests(digests: DataFrame, p: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val est = udfFreeEstimate(p)
    val w = Window.partitionBy("v").orderBy(col("r"))
    digests
      .withColumn("__e", est(col("n_regs"), col("sum_pow")))
      .withColumn("__prev",
        coalesce(lag(col("__e"), 1).over(w), lit(1.0)))
      .withColumn("__delta",
        greatest(col("__e") - col("__prev"), lit(0.0)))
      .groupBy("v")
      .agg(sum(col("__delta")).as("__reach"),
        sum(col("__delta") * col("r")).as("sum_dist_est"))
      .select(col("v"), (col("__reach") + 1.0).as("reach_est"),
        col("sum_dist_est"),
        when(col("sum_dist_est") > 0.0,
          col("__reach") / col("sum_dist_est")).otherwise(lit(0.0))
          .as("closeness_est"))
  }

  /** Estimated distance distribution from [[hyperBallDigests]] output
    * — Σ_v of the per-node ball estimates per radius, plus the exact
    * ND(0) = |V| row. Feed to [[effectiveDiameter]] for the HyperANF
    * effective-diameter estimate. Out of oracles (ln); spec-verified
    * against [[distanceDistribution]]. */
  def neighbourhoodFromDigests(digests: DataFrame, p: Int): DataFrame = {
    val est = udfFreeEstimate(p)
    val byR = digests
      .withColumn("__e", est(col("n_regs"), col("sum_pow")))
      .groupBy(col("r")).agg(sum(col("__e")).as("nd"))
    val n0 = digests.select(col("v")).distinct()
      .agg(count(lit(1)).cast("double").as("nd"))
      .withColumn("r", lit(0))
      .select("r", "nd")
    n0.unionByName(byR).orderBy("r")
  }

  /** HyperBall register digests (Boldi & Vigna, "In-Core Computation
    * of Geometric Centralities with HyperBall", 2013 — the production
    * alternative [[harmonicCentrality]]'s scaladoc points at): each
    * node carries an m = 2^p register HyperLogLog sketch of the set
    * of nodes that REACH it, and round r element-wise-maxes every
    * node's sketch with its in-neighbors' — after round r the sketch
    * summarizes the radius-r in-ball, so ball SIZES (and from their
    * deltas, harmonic/closeness centralities) come out of
    * node-bounded state where the exact closure needs O(V²).
    *
    * Everything here is INTEGER-exact and cross-engine replayable
    * (the pixel-mean micro-unit discipline): register index
    * j = md5(v)[hex 1-8] mod m, rank ρ = 33 − (floor(log2(w)) + 1)
    * for w = md5(v)[hex 9-16] (ρ = 33 when w = 0) — md5 is byte-exact
    * everywhere, log2 of an exact-in-double integer crosses integer
    * boundaries only at exact powers of two where IEEE log2 is exact.
    * State is the LONG FORM (v, j, ρ) of nonzero registers (≤ m rows
    * per node), merged per round with one edge-bounded join + a
    * (v, j) max rollup — never an array rebuild — and the output per
    * node per radius is the integer digest
    *
    *   (v, r, n_regs, sum_rho, sum_pow),
    *   sum_pow = Σ_j 2^(33−ρ_j)  (empty registers count ρ = 0)
    *           = 2^33 · Z  for the standard HLL indicator Z,
    *
    * so the float ESTIMATE stays consumer arithmetic
    * ([[hllEstimate]]) and the oracle hash-checks pure integers.
    * Rounds are fixed at `maxRadius` (register merges are idempotent
    * past the fixpoint — extra rounds are no-ops, the kcores replay
    * property). Scale shape: state ≤ V·m rows, one edge-bounded
    * shuffle per round, [[FlatCk]] per round, no driver state. */
  def hyperBallDigests(edges: DataFrame, srcCol: String, dstCol: String,
      maxRadius: Int, p: Int = 4): DataFrame = {
    require(maxRadius >= 1 && maxRadius <= 10,
      s"maxRadius in 1..10, got $maxRadius")
    require(p >= 2 && p <= 8, s"p in 2..8, got $p")
    val m = 1 << p
    val e = stringEdges(edges, srcCol, dstCol)
    val nodes = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v"))).distinct()
    // own register: j from hex chars 1-8, rank from hex chars 9-16 —
    // both 32-bit values, positive in a signed long on any engine
    val h1 = conv(substring(md5(col("v")), 1, 8), 16, 10).cast("long")
    val w = conv(substring(md5(col("v")), 9, 8), 16, 10).cast("long")
    var state = nodes
      .select(col("v"), pmod(h1, lit(m.toLong)).cast("int").as("j"),
        when(w === 0L, lit(33))
          .otherwise(lit(32) - floor(log2(w)).cast("int")).as("rho"))
      .flatCk
    val parts = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def digest(s: DataFrame, r: Int): DataFrame = s.groupBy("v")
      .agg(count(lit(1)).as("n_regs"), sum(col("rho")).as("sum_rho"),
        ((lit(m.toLong) - count(lit(1))) * lit(8589934592L) +
          sum(pow(lit(2.0), lit(33) - col("rho")).cast("long")))
          .as("sum_pow"))
      .withColumn("r", lit(r))
      .select("v", "r", "n_regs", "sum_rho", "sum_pow")
    // exact convergence probe: register merges are MONOTONE (a round
    // only adds register rows or raises ranks), so the pair
    // (row count, Σρ) strictly increases on any change and a flat
    // round IS the fixpoint — one scalar agg per round, and remaining
    // radii reuse the fixpoint state (idempotent merges make their
    // digests identical by definition, so the output contract — one
    // digest row per node per radius — is unchanged)
    def checksum(s: DataFrame): (Long, Long) = {
      val row = s.agg(count(lit(1)), coalesce(sum(col("rho")), lit(0L)))
        .head()
      (row.getLong(0), row.getLong(1))
    }
    var prev = checksum(state)
    var atFixpoint = false
    for (r <- 1 to maxRadius) {
      if (!atFixpoint) {
        val incoming = e.join(state.withColumnRenamed("v", "__u"),
            col("src") === col("__u"))
          .select(col("dst").as("v"), col("j"), col("rho"))
        state = state.unionByName(incoming)
          .groupBy("v", "j").agg(max("rho").as("rho"))
          .flatCk
        val cur = checksum(state)
        atFixpoint = cur == prev
        prev = cur
      }
      parts += digest(state, r)
    }
    parts.reduce(_ unionByName _)
  }

  /** The HyperLogLog cardinality estimate a consumer derives from a
    * [[hyperBallDigests]] row — standard Flajolet et al. 2007 form
    * with the small-range linear-counting correction (the digest
    * keeps `sum_pow = 2^33 · Z` exactly; `zeros = m − n_regs`). */
  def hllEstimate(nRegs: Long, sumPow: Long, p: Int): Double = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    val z = sumPow.toDouble / 8589934592.0 // 2^33
    val e = alpha * m * m / z
    val zeros = m - nRegs
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else e
  }

  /** Harmonic-centrality ESTIMATES from [[hyperBallDigests]] output —
    * the consumer composition (Boldi-Vigna's actual use of the
    * sketch): H(v) ≈ Σ_r (|B_r(v)| − |B_{r−1}(v)|) / r with ball
    * sizes estimated per radius by [[hllEstimate]] (|B_0| = 1, the
    * node itself). Deliberately NOT an oracle surface — the estimator
    * crosses `ln`, whose last-ulp behavior differs between engines —
    * estimates are spec-verified against [[harmonicCentrality]]'s
    * exact integers instead. Returns `(v, harmonic_est)`; negative
    * per-radius deltas (pure estimator noise — true ball sizes are
    * monotone) clamp to 0 so the estimate stays monotone too. */
  def harmonicFromDigests(digests: DataFrame, p: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val est = udfFreeEstimate(p)
    val w = Window.partitionBy("v").orderBy(col("r"))
    digests
      .withColumn("__e", est(col("n_regs"), col("sum_pow")))
      .withColumn("__prev",
        coalesce(lag(col("__e"), 1).over(w), lit(1.0)))
      .withColumn("__delta",
        greatest(col("__e") - col("__prev"), lit(0.0)))
      .groupBy("v")
      .agg(sum(col("__delta") / col("r")).as("harmonic_est"))
  }

  /** [[hllEstimate]] as a Column expression (no UDF — the codegen'd
    * arithmetic form of the same Flajolet estimator, exactly the
    * library function's branches). */
  private def udfFreeEstimate(p: Int): (Column, Column) => Column = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    (nRegs, sumPow) => {
      val z = sumPow.cast("double") / lit(8589934592.0)
      val e = lit(alpha * m * m) / z
      val zeros = lit(m.toLong) - nRegs
      when(e <= lit(2.5 * m) && zeros > 0L,
        lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
        .otherwise(e)
    }
  }

  /** Synchronous min-label LABEL PROPAGATION communities (Raghavan et
    * al. 2007, the deterministic variant): every node starts labeled
    * with itself; each round it adopts the most frequent label among
    * its (undirected) neighbors, ties broken to the LOWEST label —
    * the tie rule that makes synchronous LPA a pure function of the
    * graph (the randomized original is not replayable). Densely
    * interlinked regions flood to one label in a few rounds while
    * bridges starve, giving the community signal trusses/cores price
    * by density rather than membership.
    *
    * Per-round cost: ONE edge-bounded join + a (node, label) count
    * rollup + a per-node `min_by` argmax — no per-node neighbor
    * sorts, hub-safe (partial aggregation absorbs skew). [[FlatCk]]
    * per round, driver state = one stability scalar per round.
    * Synchronous LPA can 2-cycle on bipartite-ish structures, so the
    * loop stops at `maxRounds` with `converged = false` rather than
    * spinning; a stable round is a fixpoint (recomputing stable
    * labels returns them), so early exit and a fixed-round replay
    * agree — the kcores oracle property. Returns
    * `(v, community, converged)`. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 10): DataFrame = {
    val dir0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
    val und = dir0
      .unionByName(dir0.select(col("b").as("a"), col("a").as("b")))
      .distinct().flatCk
    var labels = und.select(col("a").as("v")).distinct()
      .withColumn("lbl", col("v")).flatCk
    var stable = false
    var r = 0
    while (r < maxRounds && !stable) {
      val next = und
        .join(labels.select(col("v").as("b"), col("lbl")), Seq("b"))
        .groupBy(col("a"), col("lbl")).agg(count(lit(1)).as("__c"))
        .groupBy(col("a"))
        .agg(min_by(col("lbl"),
          struct((lit(0L) - col("__c")).as("nc"), col("lbl").as("l")))
          .as("lbl"))
        .select(col("a").as("v"), col("lbl"))
        .flatCk
      stable = next
        .join(labels.withColumnRenamed("lbl", "__old"), Seq("v"))
        .filter(col("lbl") =!= col("__old")).isEmpty
      labels = next
      r += 1
    }
    labels.select(col("v"), col("lbl").as("community"),
      lit(stable).as("converged"))
  }

  /** Longest-path (topological) DEPTH over a DAG — the dependency
    * stat a scheduler reads off an SCC condensation (how many
    * dependency waves before this component can run): depth(v) = the
    * longest path length from any source into v, sources at 0.
    * Iterative max-relaxation — each round one edge-bounded join +
    * a per-node max rollup; depths are monotone nondecreasing and
    * bounded by the DAG's longest path, so a flat round IS the
    * fixpoint and a fixed-round oracle replay agrees with the early
    * exit (the kcores property). On a NON-DAG input depths grow
    * forever along the cycle; the `maxRounds` guard stops with
    * `converged = false` instead of spinning — feed condensations,
    * not raw graphs. `extraNodes` (single column) adds isolated
    * vertices (e.g. edgeless SCCs) at depth 0. Returns
    * `(v, depth, converged)`. */
  def dagDepth(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 30,
      extraNodes: Option[DataFrame] = None): DataFrame = {
    val e = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v")).distinct().flatCk
    val nodes = e.select(col("u").as("v"))
      .unionByName(e.select(col("v")))
      .unionByName(extraNodes
        .map(n => n.select(col(n.columns.head).as("v")))
        .getOrElse(e.limit(0).select(col("v"))))
      .distinct()
    var depth = nodes.withColumn("depth", lit(0L)).flatCk
    var stable = false
    var r = 0
    while (r < maxRounds && !stable) {
      val relaxed = e
        .join(depth.withColumnRenamed("v", "u"), Seq("u"))
        .groupBy(col("v")).agg(max(col("depth") + 1L).as("__d"))
      val next = depth.join(relaxed, Seq("v"), "left")
        .select(col("v"),
          greatest(col("depth"), coalesce(col("__d"), lit(0L)))
            .as("depth"))
        .flatCk
      stable = next
        .join(depth.withColumnRenamed("depth", "__old"), Seq("v"))
        .filter(col("depth") =!= col("__old")).isEmpty
      depth = next
      r += 1
    }
    depth.select(col("v"), col("depth"), lit(stable).as("converged"))
  }

  /** Exact triangle counting over the UNDIRECTED fold of `edges`
    * (self loops and parallel/reverse duplicates collapse first),
    * with the standard degree orientation: every edge points from
    * its lower-(degree, name) endpoint to the higher, so a node's
    * out-set is bounded by its degeneracy and wedge enumeration
    * never squares a hub — the optimization that makes distributed
    * triangle counting survive power-law web graphs. Each triangle
    * {x < y < z} under the (degree, name) total order is found
    * exactly once as the wedge (x→y, x→z) closed by the arc y→z.
    * Returns `(v, degree, n_triangles)` for every node — the local
    * clustering structure (coefficient = 2T / d(d-1), left to the
    * consumer so the output stays integer-exact). Three edge-bounded
    * shuffles: the orientation join, the wedge self-join, the
    * closing-arc join. */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct().flatCk
    val deg = und.select(col("a").as("v"))
      .unionByName(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("degree")).flatCk
    val perNode = orientedTriangles(und, deg)
      .select(explode(array(col("x"), col("y"), col("z"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("v"), "left")
      .select(col("v"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Degree-oriented exact triangle enumeration over an undirected
    * edge fold `und(a, b)` with degrees `deg(v, degree)` — each
    * triangle exactly once as `(x, y, z)`; hubs never enumerate
    * their neighbor pairs (shared by [[triangleCounts]] and
    * [[kTruss]]'s per-round support). */
  private def orientedTriangles(und: DataFrame,
      deg: DataFrame): DataFrame = {
    val fwd = col("__da") < col("__db") ||
      (col("__da") === col("__db") && col("a") < col("b"))
    val arcs = und
      .join(deg.select(col("v").as("a"), col("degree").as("__da")), "a")
      .join(deg.select(col("v").as("b"), col("degree").as("__db")), "b")
      .select(when(fwd, col("a")).otherwise(col("b")).as("lo"),
        when(fwd, col("b")).otherwise(col("a")).as("hi"),
        when(fwd, col("__db")).otherwise(col("__da")).as("hd"))
      .flatCk
    val wedges = arcs
      .select(col("lo"), col("hi").as("v"), col("hd").as("dv"))
      .join(arcs.select(col("lo"), col("hi").as("w"), col("hd").as("dw")),
        Seq("lo"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    wedges
      .join(arcs.select(col("lo").as("v"), col("hi").as("w")),
        Seq("v", "w"))
      .select(col("lo").as("x"), col("v").as("y"), col("w").as("z"))
  }

  /** k-truss of the undirected fold — the EDGE decomposition next to
    * [[coreness]]'s node decomposition (Cohen 2008): the maximal
    * subgraph in which every edge closes at least k−2 triangles
    * WITHIN the subgraph. Trusses are the tighter community signal
    * (every k-truss lives inside the (k−1)-core but not vice versa)
    * web-graph curation uses to find genuinely interlinked cliques
    * rather than hub-glued neighborhoods. Iterative edge peeling:
    * each round recomputes per-edge support with the degree-oriented
    * triangle enumeration (hub-safe, the [[triangleCounts]]
    * machinery) and drops edges below k−2; support only shrinks as
    * edges leave, so the peel cascades to the unique fixpoint.
    * Per-round cost: the three edge-bounded orientation/wedge/closure
    * joins + one per-edge rollup; `localCheckpoint` keeps the plan
    * flat; driver state = one surviving-edge count per round.
    * Returns the surviving edges `(a, b, converged)`. */
  def kTruss(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 30): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    val e0 = undirectedFold(edges, srcCol, dstCol)
    val (e, converged) = peelTruss(e0, k, maxRounds)
    e.withColumn("converged", lit(converged))
  }

  /** Undirected edge fold shared by the truss ops: self loops out,
    * parallel/reverse duplicates collapsed, endpoints ordered. */
  private def undirectedFold(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct().flatCk

  /** The k-truss peel cascade from an already-folded edge set: each
    * round recomputes per-edge support with the degree-oriented
    * triangle enumeration and drops edges below k−2, to the unique
    * fixpoint. Returns (survivors, converged). */
  private def peelTruss(e0: DataFrame, k: Int,
      maxRounds: Int): (DataFrame, Boolean) = {
    var e = e0
    var n = e.count()
    var converged = false
    var round = 0
    while (round < maxRounds && !converged && n > 0) {
      val deg = e.select(col("a").as("v"))
        .unionByName(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("degree")).flatCk
      // per-edge support: triangles exploded into their three edges
      val sup = orientedTriangles(e, deg)
        .select(explode(array(
          struct(least(col("x"), col("y")).as("a"),
            greatest(col("x"), col("y")).as("b")),
          struct(least(col("x"), col("z")).as("a"),
            greatest(col("x"), col("z")).as("b")),
          struct(least(col("y"), col("z")).as("a"),
            greatest(col("y"), col("z")).as("b")))).as("__e"))
        .select(col("__e.a").as("a"), col("__e.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("__s"))
      val kept = e.join(sup, Seq("a", "b"), "left")
        .filter(coalesce(col("__s"), lit(0L)) >= k - 2)
        .select("a", "b").flatCk
      val kn = kept.count()
      converged = kn == n
      e = kept
      n = kn
      round += 1
    }
    (e, converged || n == 0)
  }

  /** Trussness (maximal k) of EVERY edge — the full truss
    * decomposition next to [[kTruss]]'s single cut, what a curation
    * pipeline reads to pick its community threshold instead of
    * guessing k: trussness(e) = max k with e ∈ kTruss(k), and every
    * edge (triangle-free ones included) is at least a 2-truss member.
    * Computed by running the peel cascade ONCE upward from k = 3:
    * each k starts from the previous k's survivors (valid because
    * kTruss(k) ⊆ kTruss(k−1)), and the edges the level-k peel drops
    * are exactly those with trussness k−1 — each level's work is
    * bounded by its own survivor set, so the total is the bounded
    * re-peel, never |edges| × k_max recomputation from scratch.
    * `maxK` bounds the ladder (a clique of c nodes has trussness c,
    * so the bound only bites on near-clique cores); a non-empty
    * survivor set at the bound keeps trussness = maxK with
    * `converged = false` marking the truncation, matching the
    * convergence-pin convention. Returns `(a, b, trussness,
    * converged)` over the undirected fold. */
  def trussness(edges: DataFrame, srcCol: String, dstCol: String,
      maxK: Int = 20, maxRounds: Int = 30): DataFrame = {
    require(maxK >= 3, s"maxK >= 3, got $maxK")
    var cur = undirectedFold(edges, srcCol, dstCol)
    // per-k dropped sets accumulate as references to anti-joins over
    // the checkpointed survivor ladders — one union at the end
    val parts = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var k = 3
    var allConverged = true
    var nLeft = cur.count()
    while (k <= maxK && nLeft > 0) {
      val (surv, conv) = peelTruss(cur, k, maxRounds)
      if (!conv) allConverged = false
      parts += cur.join(surv, Seq("a", "b"), "left_anti")
        .withColumn("trussness", lit(k - 1))
      cur = surv
      nLeft = cur.count()
      k += 1
    }
    parts += cur.withColumn("trussness", lit(maxK))
    if (nLeft > 0 && k > maxK) allConverged = false
    parts.reduce(_ unionByName _)
      .withColumn("converged", lit(allConverged))
  }

  /** Coreness (k-core number) of every node — the degeneracy-based
    * curation signal web-graph pipelines use to separate densely
    * interlinked cores (often link farms) from the organic fringe.
    * Computed by the h-index fixpoint (Lü et al. 2016, Nature
    * Communications 7:10168: initialize c = degree, repeatedly set
    * c(v) to the H-index of its neighbors' current values; the
    * fixpoint is exactly the coreness) — the formulation that
    * distributes, unlike sequential peeling: values only decrease
    * and an early exit fires when a round changes nothing.
    * `maxRounds` bounds pathological convergence (rounds needed is
    * typically O(graph diameter)); the fixpoint flag comes back as
    * `converged`. Returns `(v, degree, coreness, converged)`.
    *
    * Hub safety: the per-round H-index is computed by a TWO-LEVEL
    * fold, never by sorting a node's full neighbor list in one task
    * (a power-law hub would make the max-degree node the straggler).
    * Level one builds the per-node VALUE HISTOGRAM `(a, v, cnt)` with
    * a hash aggregate — map-side partial counts spread the hub's
    * edge rows across every input task before any shuffle, and the
    * shuffle key `(a, v)` splits the hub across as many reducer keys
    * as it has distinct neighbor values. Level two merges the
    * histogram: H(S) = max over DISTINCT v of min(v, |{x∈S : x≥v}|)
    * (for each distinct v the C(v) = |{x≥v}| members all have value
    * ≥ v ≥ min(v, C(v)), so min(v, C(v)) is achievable; conversely
    * the smallest distinct value v' ≥ H has C(v') ≥ H and v' ≥ H),
    * so the suffix-count window runs over distinct-value rows —
    * bounded by min(degree, #distinct current values in the graph),
    * not by degree. On a star graph the hub's window is ONE row. */
  def coreness(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
    val sym = e0.unionByName(e0.select(col("b").as("a"),
        col("a").as("b")))
      .distinct().flatCk
    val deg = sym.groupBy("a").agg(count(lit(1)).as("c"))
      .flatCk
    var c = deg
    var converged = false
    var round = 0
    while (round < maxRounds && !converged) {
      val hist = sym
        .join(c.select(col("a").as("b"), col("c").as("v")), Seq("b"))
        .groupBy("a", "v").agg(count(lit(1)).as("cnt"))
      // suffix count C(v) over the distinct-value histogram (rows
      // are unique per (a, v): the RANGE default frame has no ties)
      val w = Window.partitionBy("a").orderBy(col("v").desc)
      val next = hist.withColumn("__cum", sum(col("cnt")).over(w))
        .groupBy("a").agg(max(least(col("v"), col("__cum"))).as("c"))
        .flatCk
      // one per-round driver-side scalar (the components/PageRank
      // early-exit discipline): did this round move ANY value?
      val atFixpoint = next.join(c.select(col("a"), col("c").as("__old")),
        Seq("a"))
        .filter(col("c") =!= col("__old")).isEmpty
      converged = atFixpoint
      c = next
      round += 1
    }
    deg.select(col("a").as("v"), col("c").as("degree"))
      .join(c.select(col("a").as("v"), col("c").as("coreness")),
        Seq("v"))
      .withColumn("converged", lit(converged))
  }

  /** Normalized string edge fold shared by the macro-structure ops:
    * self loops out, parallel edges collapsed. */
  private def stringEdges(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .filter(col("src") =!= col("dst")).distinct().flatCk

  /** Multi-source ball growth over `e(src, dst)` — a forward closure
    * from `startF(v)` AND a backward closure from `startB(v)` advanced
    * in ONE round loop (the frontier carries a direction tag):
    * frontier-edge joins, known-set anti-joins, `localCheckpoint` per
    * round, early exit when both directions drain — node-bounded
    * state, never an O(V²) closure, and one dedup/anti pass, one
    * checkpoint and one emptiness probe per round instead of two of
    * each (the reachTasks merge of [[scc]], for the bow-tie passes);
    * the total round count is max(F-rounds, B-rounds), not their sum.
    * An empty seed on either side drains that direction immediately
    * and costs nothing. Returns ((v, d) with d ∈ {F, B}, both sets
    * INCLUDING their starts, exhausted-both): `exhausted = false`
    * means the round budget cut a closure short and reachability is
    * TRUNCATED — callers must surface it (the coreness/kTruss
    * convergence-pin convention), never classify silently off a
    * partial ball. */
  private def reachPair(e: DataFrame, startF: DataFrame,
      startB: DataFrame, maxRounds: Int): (DataFrame, Boolean) = {
    var known = startF.select(col("v")).distinct().withColumn("d", lit("F"))
      .unionByName(
        startB.select(col("v")).distinct().withColumn("d", lit("B")))
      .flatCk
    var frontier = known
    var round = 0
    var exhausted = false
    while (round < maxRounds && !exhausted) {
      val nf = frontier.filter(col("d") === "F")
        .join(e, col("v") === col("src"))
        .select(col("dst").as("v"), col("d"))
      val nb = frontier.filter(col("d") === "B")
        .join(e, col("v") === col("dst"))
        .select(col("src").as("v"), col("d"))
      val next = nf.unionByName(nb).distinct()
        .join(known, Seq("v", "d"), "left_anti")
        .flatCk
      if (next.isEmpty) exhausted = true
      else {
        known = known.unionByName(next).flatCk
        frontier = next
      }
      round += 1
    }
    (known, exhausted)
  }

  /** Bow-tie decomposition relative to a pivot's SCC (Broder et al.,
    * "Graph structure in the Web", WWW 2000 — the macro-structure
    * stat every web-graph release reports): forward-reachable set F
    * and backward-reachable set B of the pivot by ball growth, then
    *
    *   SCC = F ∩ B,  IN = B ∖ SCC,  OUT = F ∖ SCC,
    *   OTHER = everything else (tendrils/tubes/disconnected folded —
    *   [[bowTieFull]] runs the second pass that splits them),
    *
    * which is exactly the forward-backward (FW-BW) first step of
    * distributed SCC ([[scc]] iterates it to a full labeling).
    * Returns `(v, cls, converged)`: `converged = false` means a
    * closure hit `maxRounds` with a live frontier, so reachability —
    * and therefore every class — may be truncated (e.g. nodes
    * labeled 'other' that a longer budget would reach); the flag
    * makes truncation visible instead of silently mislabeling. */
  def bowTie(edges: DataFrame, srcCol: String, dstCol: String,
      pivot: String, maxRounds: Int = 30): DataFrame = {
    val e = stringEdges(edges, srcCol, dstCol)
    val start = e.sparkSession.range(1).select(lit(pivot).as("v"))
    val (fb0, fbOk) = reachPair(e, start, start, maxRounds)
    val f = fb0.filter(col("d") === "F").select("v")
      .withColumn("__f", lit(true))
    val b = fb0.filter(col("d") === "B").select("v")
      .withColumn("__b", lit(true))
    val nodes = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v"))).distinct()
    nodes.join(f, Seq("v"), "left").join(b, Seq("v"), "left")
      .select(col("v"),
        when(col("__f") && col("__b"), lit("scc"))
          .when(col("__b"), lit("in"))
          .when(col("__f"), lit("out"))
          .otherwise(lit("other")).as("cls"))
      .withColumn("converged", lit(fbOk))
  }

  /** Broder's FULL bow-tie: the second reach pass that splits
    * [[bowTie]]'s OTHER — forward closure from the whole IN set and
    * backward closure from the whole OUT set (two more multi-source
    * ball growths; a non-SCC/IN/OUT node reachable from IN cannot
    * have been reached THROUGH the SCC, else the pivot would reach
    * it too, so the plain closures classify correctly):
    *
    *   TUBE        = reachable from IN ∧ reaches OUT (an IN→OUT
    *                 bypass around the core),
    *   TENDRIL_IN  = reachable from IN only,
    *   TENDRIL_OUT = reaches OUT only,
    *   DISCONNECTED = neither.
    *
    * Degenerate inputs stay well-defined: an empty IN (or OUT) set
    * makes its closure empty, so everything unclassified falls
    * toward tendril_out / disconnected — spec-pinned. Returns
    * `(v, cls, converged)` with cls ∈ {scc, in, out, tube,
    * tendril_in, tendril_out, disconnected}. */
  def bowTieFull(edges: DataFrame, srcCol: String, dstCol: String,
      pivot: String, maxRounds: Int = 30): DataFrame = {
    val e = stringEdges(edges, srcCol, dstCol)
    val base = bowTie(edges, srcCol, dstCol, pivot, maxRounds)
      .flatCk
    val (fb2, fb2Ok) = reachPair(e,
      base.filter(col("cls") === "in").select("v"),
      base.filter(col("cls") === "out").select("v"), maxRounds)
    val fi = fb2.filter(col("d") === "F").select("v")
      .withColumn("__fi", lit(true))
    val bo = fb2.filter(col("d") === "B").select("v")
      .withColumn("__bo", lit(true))
    base.join(fi, Seq("v"), "left").join(bo, Seq("v"), "left")
      .select(col("v"),
        when(col("cls") =!= "other", col("cls"))
          .when(col("__fi") && col("__bo"), lit("tube"))
          .when(col("__fi"), lit("tendril_in"))
          .when(col("__bo"), lit("tendril_out"))
          .otherwise(lit("disconnected")).as("cls"),
        (col("converged") && lit(fb2Ok)).as("converged"))
  }

  /** Full strongly-connected-component labeling by ITERATED FW-BW
    * (Fleischer/Hendrickson/Pınar 2000 — the distributed SCC
    * decomposition [[bowTie]] runs one step of): each level picks
    * the MIN node of every pending cut set as its pivot, grows the
    * forward and backward balls WITHIN the cut set, extracts
    * F ∩ B as that pivot's SCC, and recurses on the three remainders
    * (F ∖ SCC, B ∖ SCC, the rest) — all pending cut sets advance in
    * ONE DataFrame pass per level (the cut-set id is just a label
    * column), so the work per level stays edge-bounded regardless of
    * how many branches the recursion has opened. Expected O(log n)
    * levels on graphs whose SCC sizes follow a power law (the web
    * case); `maxLevels` bounds the adversarial chain-of-singletons
    * worst case, and any cut set still pending at the budget labels
    * each node as its own singleton SCC with `converged = false`.
    * Returns `(v, scc, converged)` where `scc` is the MIN node of
    * the component — the min-label contract shared with the
    * connected-components closure, so labels are reproducible and
    * the condensation (distinct scc pairs over the edge set) is a
    * DAG by construction. */
  def scc(edges: DataFrame, srcCol: String, dstCol: String,
      maxLevels: Int = 20, maxRounds: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    val e = stringEdges(edges, srcCol, dstCol)
    // labeled SCCs accumulate as REFERENCES to the per-level
    // checkpointed cls tables — one union at the end, never a
    // re-materialization of all labeled rows per level
    val doneParts = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var pending = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v"))).distinct()
      .withColumn("task", lit("")).flatCk
    var level = 0
    var truncated = false
    // constrained multi-source closure: per-task pivot balls that
    // never leave their own cut set (the semi-join on (task, v)).
    // BOTH directions advance inside ONE round loop (the frontier
    // carries a direction tag): one frontier-edge union, one
    // dedup/semi/anti pass, one checkpoint and one emptiness probe
    // per round instead of two of each, and the level's round count
    // is max(F-rounds, B-rounds) rather than their sum — the same
    // reachability sets with roughly half the per-level job storm.
    def reachTasks(pivots: DataFrame): DataFrame = {
      val seed = pivots.select(col("task"), col("p").as("v"))
      var known = seed.withColumn("d", lit("F"))
        .unionByName(seed.withColumn("d", lit("B"))).flatCk
      var frontier = known
      var round = 0
      var exhausted = false
      while (round < maxRounds && !exhausted) {
        val nf = frontier.filter(col("d") === "F")
          .join(e, col("v") === col("src"))
          .select(col("task"), col("dst").as("v"), col("d"))
        val nb = frontier.filter(col("d") === "B")
          .join(e, col("v") === col("dst"))
          .select(col("task"), col("src").as("v"), col("d"))
        val next = nf.unionByName(nb).distinct()
          .join(pending, Seq("task", "v"), "left_semi")
          .join(known, Seq("task", "v", "d"), "left_anti")
          .flatCk
        if (next.isEmpty) exhausted = true
        else {
          known = known.unionByName(next).flatCk
          frontier = next
        }
        round += 1
      }
      if (!exhausted) truncated = true
      known
    }
    while (level < maxLevels && !pending.isEmpty) {
      val pivots = pending.groupBy("task").agg(min("v").as("p"))
        .flatCk
      val fb = reachTasks(pivots)
      val f = fb.filter(col("d") === "F").select("task", "v")
        .withColumn("__f", lit(true))
      val b = fb.filter(col("d") === "B").select("task", "v")
        .withColumn("__b", lit(true))
      val cls = pending
        .join(f, Seq("task", "v"), "left")
        .join(b, Seq("task", "v"), "left")
        .join(pivots, "task")
        .select(col("task"), col("v"), col("p"),
          coalesce(col("__f"), lit(false)).as("inF"),
          coalesce(col("__b"), lit(false)).as("inB"))
        .flatCk
      doneParts += cls.filter(col("inF") && col("inB"))
        .select(col("v"), col("p").as("scc"))
      pending = cls.filter(!(col("inF") && col("inB")))
        .select(col("v"),
          concat(col("task"),
            when(col("inF"), lit("F"))
              .when(col("inB"), lit("B"))
              .otherwise(lit("O"))).as("task"))
        .flatCk
      level += 1
    }
    val leftover = !pending.isEmpty
    doneParts += pending.select(col("v"), col("v").as("scc"))
    doneParts.reduce(_ unionByName _)
      .withColumn("converged", lit(!truncated && !leftover))
  }

  private def run(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: Option[String], iters: Int, damping: Double,
      redistributeDangling: Boolean, collectStats: Boolean,
      seeds: Option[DataFrame] = None): (DataFrame, Seq[PageRankIter]) = {
    require(iters >= 1, s"iters must be positive, got $iters")
    require(damping > 0 && damping < 1, s"damping in (0,1), got $damping")
    require(seeds.isEmpty || redistributeDangling,
      "seeded teleport requires dangling redistribution (TrustRank form)")
    // unweighted: distinct edges, w = 1 (pr*1/count(w) is the classic
    // recurrence bit for bit); weighted: parallel edges SUM
    val e = (weightCol match {
      case Some(wc) => edges
        .select(col(srcCol).as("src"), col(dstCol).as("dst"),
          col(wc).cast("double").as("w"))
        .groupBy("src", "dst").agg(sum("w").as("w"))
      case None => edges
        .select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .distinct().withColumn("w", lit(1.0))
    }).flatCk
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v")))
      .distinct().flatCk
    val n = nodes.count()
    val deg = e.groupBy("src").agg(sum("w").as("od")).flatCk
    // sinks: appear in the graph but never as a source
    val dangling =
      nodes.join(deg.select(col("src").as("v")), Seq("v"), "left_anti")
        .flatCk
    // teleport vector: uniform (None) keeps the literal-arithmetic
    // fast path bit-identical to the original oracles; a seed set
    // materializes t(v) as a node-bounded column (1/|S∩nodes| on
    // seeds, 0 elsewhere) that both the restart term and the
    // dangling redistribution scale by
    val tv = seeds.map { sd =>
      val sc = sd.columns.head
      val present = nodes.join(
        sd.select(col(sc).as("v")).distinct(), Seq("v"), "left_semi")
      val ns = present.count()
      require(ns > 0, "no seed appears in the edge set")
      nodes.join(present.withColumn("__s", lit(true)), Seq("v"), "left")
        .select(col("v"),
          when(col("__s"), lit(1.0 / ns)).otherwise(lit(0.0)).as("t"))
        .flatCk
    }
    var r = tv match {
      case Some(t) => t.select(col("v"), col("t").as("pr"))
      case None => nodes.withColumn("pr", lit(1.0 / n))
    }
    val stats = Seq.newBuilder[PageRankIter]
    for (it <- 1 to iters) {
      // dangling mass this iteration: ONE scalar (node-bounded agg),
      // folded into the recompute as a literal — exact in the SQL
      // replay, which computes the same scalar per chained CTE
      val dm =
        if (redistributeDangling)
          r.join(dangling, "v")
            .agg(coalesce(sum("pr"), lit(0.0))).head().getDouble(0)
        else 0.0
      val contrib = e.join(r, col("src") === col("v"))
        .join(deg, "src")
        .select(col("dst").as("v"),
          (col("pr") * col("w") / col("od")).as("m"))
        .groupBy("v").agg(sum("m").as("m"))
      val next = (tv match {
        case Some(t) => t.join(contrib, Seq("v"), "left")
          .select(col("v"),
            (lit(1 - damping) * col("t") +
              lit(damping) * (coalesce(col("m"), lit(0.0)) +
                lit(dm) * col("t"))).as("pr"))
        case None => nodes.join(contrib, Seq("v"), "left")
          .select(col("v"),
            (lit((1 - damping) / n) +
              lit(damping) * (coalesce(col("m"), lit(0.0)) + lit(dm / n)))
              .as("pr"))
      }).flatCk
      if (collectStats) {
        val row = next.join(r.select(col("v"), col("pr").as("__prev")), "v")
          .agg(sum("pr"), sum(abs(col("pr") - col("__prev")))).head()
        stats += PageRankIter(it, row.getDouble(0), row.getDouble(1))
      }
      r = next
    }
    (r, stats.result())
  }
}

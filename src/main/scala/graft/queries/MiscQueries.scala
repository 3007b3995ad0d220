package graft.queries

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Remaining §2 surface: the DataSourceV2 paginated feed (ingest path),
  * JSON serialization, date/time and math scalar functions, and CUBE
  * grouping. */
object MiscQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DataSourceV2 ingest: 1000 docs in 4 page-partitions, aggregated.
    // The oracle regenerates identical rows from range() — the source is
    // deterministic by construction.
    "feed_ingest" -> ((s, _) => {
      s.read.format("graft_feed")
        .option("total", 1000).option("pageSize", 250).load()
        .groupBy("category")
        .agg(count(lit(1)).as("n"), min("id").as("min_id"),
          max("published").as("max_pub"))
        .orderBy("category")
    }),
    // Non-parquet READ paths under the correctness gate: the same sample
    // written as csv (header), json lines, and orc, read back through
    // each reader, and aggregated identically. The oracle computes the
    // expected numbers once from parquet and cross-joins the format list.
    "fmt_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val base = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 1000)
        .select("l_orderkey", "l_returnflag", "l_quantity")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_fmt/" +
        dir.replaceAll("[^0-9.]", "")
      val schema = StructType(Seq(
        StructField("l_orderkey", LongType),
        StructField("l_returnflag", StringType),
        StructField("l_quantity", DoubleType)))
      // ~1k rows after the filter: one output file per format. Without the
      // coalesce each write fans out one task (and one tiny file) per scan
      // partition — pure scheduler overhead here, and exactly the
      // small-files pattern a 100 TB pipeline has to avoid on its small
      // dimension/sideband tables.
      val one = base.coalesce(1)
      one.write.mode("overwrite").option("header", "true").csv(s"$root/csv")
      one.write.mode("overwrite").json(s"$root/json")
      one.write.mode("overwrite").orc(s"$root/orc")
      val perFmt = Seq(
        "csv" -> s.read.schema(schema).option("header", "true")
          .csv(s"$root/csv"),
        "json" -> s.read.schema(schema).json(s"$root/json"),
        "orc" -> s.read.orc(s"$root/orc"))
      perFmt.map { case (fmt, df) =>
        df.groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
          .withColumn("fmt", lit(fmt))
      }.reduce(_ unionByName _)
        .select("fmt", "l_returnflag", "n", "sum_qty")
        .orderBy("fmt", "l_returnflag")
    }),
    // JSON serialization of result rows (reference serializes responses
    // via json.dumps, query_endpoint.py:132).
    "json_roundtrip" -> ((s, dir) => {
      EventQueries.load(s, dir)
        .filter(col("event_id") < 50)
        .select(col("event_id"),
          to_json(struct(col("event_id"), col("event_type"))).as("js"))
        .orderBy("event_id")
    }),
    // Date/time scalar functions over the orders dates.
    // Damped PageRank, 3 fixed power iterations over a deterministic
    // doc-derived edge set (src = id mod 40, dst = (id div 7) mod 40 —
    // varied in/out degrees, so the ranks genuinely differ). Each
    // iteration is one edge-bounded contribution shuffle + a
    // node-bounded recompute; the oracle replays all three iterations
    // as chained CTEs.
    "graph_pagerank" -> ((s, dir) => {
      import graft.operators.GraphOps
      val e = t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(40)).as("src"),
          pmod((col("doc_id") / lit(7)).cast("long"), lit(40)).as("dst"))
        .filter(col("src") =!= col("dst"))
      GraphOps.pageRank(e, "src", "dst", iters = 3, damping = 0.85)
        .select(col("v").cast("long").as("node"),
          round(col("pr"), 4).as("pr"))
        .orderBy("node")
    }),
    // The stochastic-matrix variant on a graph WITH sinks: src is
    // capped to 0..29 while dst ranges 0..39, so nodes 30..39 are
    // genuinely dangling. Each iteration redistributes their mass
    // uniformly (one extra node-bounded aggregate), so ranks sum to
    // exactly 1 — the cross-subgraph-comparable form any real web
    // graph (full of dangling URLs) needs.
    "graph_pagerank_dangling" -> ((s, dir) => {
      import graft.operators.GraphOps
      val e = t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(30)).as("src"),
          pmod((col("doc_id") / lit(7)).cast("long"), lit(40)).as("dst"))
        .filter(col("src") =!= col("dst"))
      GraphOps.pageRank(e, "src", "dst", iters = 3, damping = 0.85,
          redistributeDangling = true)
        .select(col("v").cast("long").as("node"),
          round(col("pr"), 4).as("pr"))
        .orderBy("node")
    }),
    // SEEDED (personalized) PageRank — TrustRank-style: teleport is
    // restricted to the seed set (nodes ≡ 0 mod 5), the walk starts
    // from the teleport vector, and each iteration's dangling mass
    // flows back proportional to it, so ranks sum to exactly 1 and
    // concentrate near the seeds — the crawl-prioritization score.
    // Same graph-with-sinks edge set as graph_pagerank_dangling; the
    // oracle replays all three iterations with the seed-masked
    // teleport term.
    "graph_pagerank_seeded" -> ((s, dir) => {
      import graft.operators.GraphOps
      val e = t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(30)).as("src"),
          pmod((col("doc_id") / lit(7)).cast("long"), lit(40)).as("dst"))
        .filter(col("src") =!= col("dst"))
      val seeds = e.select(col("src").as("v"))
        .unionByName(e.select(col("dst").as("v")))
        .distinct().filter(pmod(col("v"), lit(5)) === 0)
      GraphOps.pageRankSeeded(e, "src", "dst", seeds, iters = 3,
          damping = 0.85)
        .select(col("v").cast("long").as("node"),
          round(col("pr"), 4).as("pr"))
        .orderBy("node")
    }),
    // HyperBall register digests (Boldi-Vigna) — the sketch-based
    // alternative to the exact bounded in-ball: per node per radius,
    // the INTEGER HLL digest (register count, rank sum, 2^33·Z) of
    // the set of nodes reaching it, merged along edges one round per
    // hop. The float cardinality estimate is consumer arithmetic
    // (GraphOps.hllEstimate); the oracle replays register assignment
    // (md5 hex arithmetic) and all three merge rounds exactly.
    "graph_hyperball" -> ((s, dir) => {
      import graft.operators.GraphOps
      val e = t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(40)).as("src"),
          pmod((col("doc_id") / lit(7)).cast("long"), lit(40)).as("dst"))
        .filter(col("src") =!= col("dst"))
      GraphOps.hyperBallDigests(e, "src", "dst", maxRadius = 3, p = 4)
        .select(col("v").as("node"), col("r"), col("n_regs"),
          col("sum_rho"), col("sum_pow"))
        .orderBy("node", "r")
    }),
    // Exact radius-bounded closeness centrality on the hyperball doc
    // graph — the second geometric centrality (reach / Σ distance,
    // radius-truncated like every bounded closure, hence the _est
    // suffix) and the exact twin GraphOpsSpec checks the HyperBall
    // sketch consumer (closenessFromDigests) against. reach and
    // sum_dist are pure integers; their ratio divides two exact
    // integers (IEEE-exact on any engine — unlike the sketch's ln),
    // so the whole row is oracle-safe. The oracle replays the BFS
    // closure as a depth-guarded recursive CTE.
    "graph_closeness_est" -> ((s, dir) => {
      import graft.operators.GraphOps
      val e = t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(40)).as("src"),
          pmod((col("doc_id") / lit(7)).cast("long"), lit(40)).as("dst"))
        .filter(col("src") =!= col("dst"))
      GraphOps.closenessCentrality(e, "src", "dst", maxRadius = 3)
        .select(col("v").cast("long").as("node"), col("n_reachable"),
          col("sum_dist"), round(col("closeness"), 4).as("closeness"))
        .orderBy("node")
    }),
    // Coreness (k-core numbers) via the distributed h-index fixpoint
    // on a deterministic doc-derived graph chosen for GRADED cores
    // (the mixed formula yields 3-, 4- and 6-cores, not one uniform
    // shell): src = id mod 80; dst jumps to (13·id+1) mod 80 for
    // every 4th doc and contracts to (id div 5) mod 80 otherwise.
    // Each round is one edge-bounded join + a distinct-value
    // histogram fold; the oracle replays all six rounds as chained
    // CTEs (the graph_pagerank discipline), and the emitted
    // `converged` column pins that the engine actually reached the
    // fixpoint inside its round budget.
    "graph_kcores" -> ((s, dir) => {
      import graft.operators.GraphOps
      val e = t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(80)).as("src"),
          when(pmod(col("doc_id"), lit(4)) === 0,
            pmod(col("doc_id") * 13 + 1, lit(80)))
            .otherwise(pmod((col("doc_id") / lit(5)).cast("long"),
              lit(80))).as("dst"))
        .filter(col("src") =!= col("dst"))
      GraphOps.coreness(e, "src", "dst")
        .select(col("v").cast("long").as("node"), col("degree"),
          col("coreness"), col("converged"))
        .orderBy("node")
    }),
    // k-truss — the EDGE decomposition beside graph_kcores' node
    // decomposition: iterative support peeling to the maximal
    // subgraph where every edge closes ≥ k−2 triangles. The fixture
    // unions a dense 30-node core (even docs) with a sparse 80-node
    // fringe (odd docs), so k=4 peels a real cascade
    // (207→51→26→22→21 edges over four effective rounds) and leaves
    // a non-empty truss. The oracle replays all five rounds as
    // chained CTEs (common-neighbor support per edge per round).
    "graph_ktruss" -> ((s, dir) => {
      import graft.operators.GraphOps
      val even = pmod(col("doc_id"), lit(2)) === 0
      val e = t(s, dir, "documents")
        .select(
          when(even, pmod(col("doc_id"), lit(30)))
            .otherwise(pmod(col("doc_id"), lit(80))).as("src"),
          when(even, pmod((col("doc_id") / lit(7)).cast("long"), lit(30)))
            .otherwise(pmod((col("doc_id") / lit(3)).cast("long"),
              lit(80))).as("dst"))
        .filter(col("src") =!= col("dst"))
      GraphOps.kTruss(e, "src", "dst", k = 4)
        .select(col("a").cast("long").as("a"),
          col("b").cast("long").as("b"), col("converged"))
        .orderBy("a", "b")
    }),
    // Trussness — the FULL truss decomposition: every edge's maximal
    // k, computed by one upward peel ladder over graph_ktruss's
    // fixture (each k re-peels only the previous k's survivors).
    // The fixture's ladder: k=3 drops 109 triangle-poor edges
    // (trussness 2), k=4's five-round cascade drops 77 more
    // (trussness 3), and the 21-edge dense core dies at k=5
    // (trussness 4). The oracle replays all three peel cascades as
    // chained CTEs and differences consecutive survivor sets.
    "graph_trussness" -> ((s, dir) => {
      import graft.operators.GraphOps
      val even = pmod(col("doc_id"), lit(2)) === 0
      val e = t(s, dir, "documents")
        .select(
          when(even, pmod(col("doc_id"), lit(30)))
            .otherwise(pmod(col("doc_id"), lit(80))).as("src"),
          when(even, pmod((col("doc_id") / lit(7)).cast("long"), lit(30)))
            .otherwise(pmod((col("doc_id") / lit(3)).cast("long"),
              lit(80))).as("dst"))
        .filter(col("src") =!= col("dst"))
      GraphOps.trussness(e, "src", "dst")
        .select(col("a").cast("long").as("a"),
          col("b").cast("long").as("b"), col("trussness"),
          col("converged"))
        .orderBy("a", "b")
    }),
    // Full SCC labeling by iterated FW-BW over the designed
    // macro-structure fixture (4-cycle SCC + chains + tendrils +
    // tube + island): every level extracts each pending cut set's
    // pivot SCC and recurses on the three remainders, so labels are
    // the component's MIN node. The oracle is the DEFINITIONAL
    // replay — mutual reachability over the transitive closure,
    // min-label per node — engine-independent, so it cannot inherit
    // a recursion bug from the FW-BW side.
    "graph_scc" -> ((s, dir) => {
      sharedMacroScc(s, dir)
        .select(col("v").as("node"), col("scc"), col("converged"))
        .orderBy("node")
    }),
    // The CONDENSATION of the SCC labeling — the DAG a scheduler
    // topologically orders (each node is an SCC, each edge a
    // between-component dependency): contract every edge to its
    // endpoints' labels, drop intra-component edges, count the
    // multiplicity. min-label components make the contraction
    // deterministic; the oracle recomputes labels definitionally and
    // contracts the same edge fold.
    "graph_scc_condensation" -> ((s, dir) => {
      val e = macroEdges(s, dir)
        .select(col("src").cast("string").as("src"),
          col("dst").cast("string").as("dst"))
      val lab = sharedMacroScc(s, dir).select(col("v"), col("scc"))
      e.join(lab.withColumnRenamed("v", "src")
          .withColumnRenamed("scc", "ls"), "src")
        .join(lab.withColumnRenamed("v", "dst")
          .withColumnRenamed("scc", "ld"), "dst")
        .filter(col("ls") =!= col("ld"))
        .groupBy(col("ls").as("from_scc"), col("ld").as("to_scc"))
        .agg(count(lit(1)).as("n_edges"))
        .orderBy("from_scc", "to_scc")
    }),
    // Dependency DEPTH over the condensation DAG — the longest-path
    // layering a crawl scheduler reads (how many dependency waves
    // before each component unblocks): max-relaxation rounds over the
    // contracted inter-SCC edges, edgeless SCCs (the island) at depth
    // 0. The oracle recomputes the labels definitionally, contracts
    // the same edges, and unrolls six relaxation rounds (fixpoint at
    // 4 on the fixture — extra rounds are no-ops).
    "graph_condensation_depth" -> ((s, dir) => {
      import graft.operators.GraphOps
      val e = macroEdges(s, dir)
        .select(col("src").cast("string").as("src"),
          col("dst").cast("string").as("dst"))
      val lab = sharedMacroScc(s, dir).select(col("v"), col("scc"))
      val ce = e.join(lab.withColumnRenamed("v", "src")
          .withColumnRenamed("scc", "ls"), "src")
        .join(lab.withColumnRenamed("v", "dst")
          .withColumnRenamed("scc", "ld"), "dst")
        .filter(col("ls") =!= col("ld"))
        .select(col("ls").as("from_scc"), col("ld").as("to_scc"))
        .distinct()
      GraphOps.dagDepth(ce, "from_scc", "to_scc", maxRounds = 10,
          extraNodes = Some(lab.select(col("scc")).distinct()))
        .select(col("v").as("scc"), col("depth"), col("converged"))
        .orderBy("scc")
    }),
    // Broder's FULL bow-tie (6-class) on the same designed fixture —
    // every class materializes: scc {0,1,2,3}, in {10,11}, out
    // {20,21}, tendril_in {30}, tendril_out {31}, tube {32},
    // disconnected {40,41}. The oracle replays all four reachability
    // closures (pivot fwd/bwd, IN-set fwd, OUT-set bwd) as recursive
    // CTEs and the two-stage classification.
    "graph_bowtie_full" -> ((s, dir) => {
      import graft.operators.GraphOps
      GraphOps.bowTieFull(macroEdges(s, dir), "src", "dst", "0")
        .groupBy("cls")
        .agg(count(lit(1)).as("n_nodes"), min(col("v")).as("first_node"),
          min(col("converged")).as("converged"))
        .orderBy("cls")
    }),
    "date_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"),
          min(dayofmonth(col("o_orderdate"))).as("min_day"),
          max(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("max_date"))
        .orderBy("y", "m")
    }),
    // Math scalar functions folded into one aggregate.
    "math_funcs" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .agg(round(sum(sqrt(col("l_quantity")) + pow(col("l_discount"), 2)
          + log(col("l_extendedprice")) + abs(col("l_tax") - 0.05)), 2)
          .as("v"),
          round(min(ceil(col("l_extendedprice")).cast("double")), 2).as("mn"),
          round(max(floor(col("l_extendedprice")).cast("double")), 2).as("mx"))
    }),
    // Multi-source corpus union: documents table + DSv2 feed summaries
    // into one corpus shape, counted per origin (the union path a
    // multi-source ingest pipeline takes before dedup/embedding).
    "q_union_corpus" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(lit("documents").as("origin"), col("text"))
      val feed = s.read.format("graft_feed")
        .option("total", 1000).option("pageSize", 250).load()
        .select(lit("feed").as("origin"), col("summary").as("text"))
      docs.unionByName(feed)
        .groupBy("origin")
        .agg(count(lit(1)).as("n"),
          sum(length(col("text")).cast("long")).as("total_chars"))
        .orderBy("origin")
    }),
    // CUBE: all grouping combinations (rollup already covered).
    "q_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),
  )

  /** Chained-CTE replay of `n` h-index rounds over `sym(a, b)` with
    * `c0(a, c)` as the degree start: each round rebuilds the
    * per-node neighbor-value histogram and takes
    * max(least(v, suffix-count)) — the same two-level fold
    * [[graft.operators.GraphOps.coreness]] runs distributed, so a
    * histogram, suffix-count or merge bug on either side moves the
    * values. Replaying MORE rounds than the engine needed is safe:
    * the recurrence is idempotent at the fixpoint. */
  private[queries] def kcoresRounds(n: Int): String =
    (1 to n).map { i =>
      s"""h$i AS (
         |  SELECT s.a, p.c AS v, count(*) AS cnt
         |  FROM sym s JOIN c${i - 1} p ON s.b = p.a
         |  GROUP BY 1, 2),
         |c$i AS (
         |  SELECT a, max(least(v, cum)) AS c FROM (
         |    SELECT a, v,
         |      sum(cnt) OVER (PARTITION BY a ORDER BY v DESC) AS cum
         |    FROM h$i)
         |  GROUP BY a)""".stripMargin
    }.mkString(",\n")

  /** Chained-CTE replay of `n` k-truss peeling rounds from `e0(a, b)`
    * at support threshold `thresh` = k−2: per round, symmetric
    * adjacency, common-neighbor count per surviving edge, HAVING
    * keeps edges at or above the threshold (edges closing NO
    * triangle vanish from the aggregate — exactly the peel). Extra
    * rounds past the fixpoint are no-ops. */
  private[queries] def ktrussRounds(n: Int, thresh: Int,
      base: String = "e", sym: String = "sym"): String =
    (1 to n).map { i =>
      s"""$sym${i - 1} AS MATERIALIZED (
         |  SELECT a, b FROM $base${i - 1}
         |  UNION ALL SELECT b AS a, a AS b FROM $base${i - 1}),
         |$base$i AS MATERIALIZED (
         |  SELECT e.a, e.b
         |  FROM $base${i - 1} e
         |  JOIN $sym${i - 1} n1 ON n1.a = e.a
         |  JOIN $sym${i - 1} n2 ON n2.a = e.b AND n2.b = n1.b
         |  GROUP BY e.a, e.b
         |  HAVING count(*) >= $thresh)""".stripMargin
    }.mkString(",\n")

  /** The designed macro-structure fixture shared by `graph_scc` and
    * `graph_bowtie_full`: 13 edges selected by doc_id % 13 (all
    * residues present at every SF), laying out every Broder class —
    * a 4-cycle SCC {0,1,2,3}, an in-chain 11→10→0, an out-chain
    * 2→20→21, a tendril off IN (10→30), a tendril into OUT (31→20),
    * an IN→OUT tube (10→32→20) and a disconnected pair 40→41. */
  private val macroSrc = Seq(0, 1, 2, 3, 11, 10, 2, 20, 10, 31, 10, 32, 40)
  private val macroDst = Seq(1, 2, 3, 0, 10, 0, 20, 21, 30, 20, 32, 20, 41)

  /** ONE FW-BW SCC labeling of the macro fixture (checkpointed),
    * shared by graph_scc (the absorber), the condensation, and the
    * condensation-depth cells — the labeling is the dominant cost of
    * all three (per-level job storm, see the graph_scc bar). */
  private def sharedMacroScc(s: SparkSession, dir: String): DataFrame =
    BuildCache.memo(s"macroscc:$dir") {
      graft.operators.GraphOps.scc(macroEdges(s, dir), "src", "dst")
        .localCheckpoint(true)
    }

  private def macroEdges(s: SparkSession, dir: String): DataFrame = {
    def mapped(m: Seq[Int]) =
      m.zipWithIndex.foldLeft(lit(null).cast("long")) {
        case (acc, (v, i)) => when(col("k") === i, lit(v.toLong))
          .otherwise(acc)
      }
    t(s, dir, "documents")
      .select(pmod(col("doc_id"), lit(13)).cast("int").as("k")).distinct()
      .select(mapped(macroSrc).as("src"), mapped(macroDst).as("dst"))
  }

  /** The same 13-edge fixture as a DuckDB CTE pair `ks, e(src, dst)`
    * (VARCHAR nodes — the engine casts to string too). */
  private def macroEdgesCte: String = {
    def cases(m: Seq[Int]) = m.zipWithIndex
      .map { case (v, i) => s"WHEN $i THEN '$v'" }.mkString(" ")
    s"""ks AS (SELECT DISTINCT doc_id % 13 AS k FROM documents),
       |e AS (
       |  SELECT DISTINCT
       |    CASE k ${cases(macroSrc)} END AS src,
       |    CASE k ${cases(macroDst)} END AS dst
       |  FROM ks),
       |n AS (SELECT DISTINCT v FROM (
       |  SELECT src AS v FROM e UNION SELECT dst FROM e))""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // k-truss replay: union edge fold, five peeling rounds (fixpoint
    // confirmed at round 5), survivors with the convergence pin.
    "graph_ktruss" ->
      s"""WITH e0 AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM (
        |    SELECT CASE WHEN doc_id % 2 = 0 THEN doc_id % 30
        |                ELSE doc_id % 80 END AS src,
        |           CASE WHEN doc_id % 2 = 0 THEN (doc_id // 7) % 30
        |                ELSE (doc_id // 3) % 80 END AS dst
        |    FROM documents) WHERE src <> dst),
        |${ktrussRounds(5, 2)}
        |SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
        |  true AS converged
        |FROM e5 ORDER BY a, b""".stripMargin,
    // Trussness replay: the same edge fold, three peel cascades
    // (thresholds 1/2/3 = k−2 for k = 3/4/5; round counts 2/5/2
    // probed to each cascade's fixpoint — extra rounds are no-ops),
    // consecutive survivor sets differenced into per-edge maximal k.
    "graph_trussness" ->
      s"""WITH f30 AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM (
        |    SELECT CASE WHEN doc_id % 2 = 0 THEN doc_id % 30
        |                ELSE doc_id % 80 END AS src,
        |           CASE WHEN doc_id % 2 = 0 THEN (doc_id // 7) % 30
        |                ELSE (doc_id // 3) % 80 END AS dst
        |    FROM documents) WHERE src <> dst),
        |${ktrussRounds(2, 1, base = "f3", sym = "fs3")},
        |f40 AS MATERIALIZED (SELECT a, b FROM f32),
        |${ktrussRounds(5, 2, base = "f4", sym = "fs4")},
        |f50 AS MATERIALIZED (SELECT a, b FROM f45),
        |${ktrussRounds(2, 3, base = "f5", sym = "fs5")},
        |tn AS (
        |  SELECT a, b, 2 AS t FROM
        |    (SELECT a, b FROM f30 EXCEPT SELECT a, b FROM f32)
        |  UNION ALL SELECT a, b, 3 FROM
        |    (SELECT a, b FROM f40 EXCEPT SELECT a, b FROM f45)
        |  UNION ALL SELECT a, b, 4 FROM
        |    (SELECT a, b FROM f50 EXCEPT SELECT a, b FROM f52))
        |SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
        |  CAST(t AS INT) AS trussness, true AS converged
        |FROM tn ORDER BY a, b""".stripMargin,
    // HyperBall replay: md5-hex register assignment (index from hex
    // chars 1-8, rank = 33 − bit length of hex chars 9-16), three
    // long-form merge rounds as materialized chained CTEs, integer
    // digests per node per radius.
    // BFS closure to depth 3 (recursive CTE, min-d dedup), then the
    // per-node reach / distance-sum fold; closeness = the exact
    // integer ratio.
    "graph_closeness_est" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT doc_id % 40 AS src, (doc_id // 7) % 40 AS dst
        |  FROM documents WHERE doc_id % 40 <> (doc_id // 7) % 40),
        |reach AS (
        |  SELECT src AS u, dst AS v, 1 AS d FROM e
        |  UNION
        |  SELECT r.u, e2.dst, r.d + 1
        |  FROM reach r JOIN e e2 ON r.v = e2.src
        |  WHERE r.d < 3),
        |md AS (
        |  SELECT u, v, min(d) AS d FROM reach WHERE u <> v
        |  GROUP BY u, v)
        |SELECT v AS node, CAST(count(*) AS BIGINT) AS n_reachable,
        |  CAST(sum(d) AS BIGINT) AS sum_dist,
        |  round(CAST(count(*) AS DOUBLE) / sum(d), 4) AS closeness
        |FROM md GROUP BY v ORDER BY node""".stripMargin,
    "graph_hyperball" -> {
      val rounds = (1 to 3).map { r =>
        s"""s$r AS MATERIALIZED (
           |  SELECT v, j, max(rho) AS rho FROM (
           |    SELECT v, j, rho FROM s${r - 1}
           |    UNION ALL
           |    SELECT e.dst AS v, s.j, s.rho
           |    FROM s${r - 1} s JOIN e ON e.src = s.v)
           |  GROUP BY v, j)""".stripMargin
      }.mkString(",\n")
      val digests = (1 to 3).map { r =>
        s"""d$r AS (
           |  SELECT v, $r AS r, CAST(count(*) AS BIGINT) AS n_regs,
           |    CAST(sum(rho) AS BIGINT) AS sum_rho,
           |    CAST((16 - count(*)) * 8589934592 +
           |      sum(CAST(pow(2, 33 - rho) AS BIGINT)) AS BIGINT)
           |      AS sum_pow
           |  FROM s$r GROUP BY v)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
        |  SELECT DISTINCT CAST(src AS VARCHAR) AS src,
        |    CAST(dst AS VARCHAR) AS dst
        |  FROM (SELECT doc_id % 40 AS src, (doc_id // 7) % 40 AS dst
        |        FROM documents)
        |  WHERE src <> dst),
        |n AS (SELECT DISTINCT v FROM (
        |  SELECT src AS v FROM e UNION SELECT dst FROM e)),
        |s0 AS (
        |  SELECT v, CAST(h1 % 16 AS INT) AS j,
        |    CAST(CASE WHEN w = 0 THEN 33
        |      ELSE 32 - CAST(floor(log2(w)) AS INT) END AS INT) AS rho
        |  FROM (SELECT v,
        |          CAST('0x' || substr(md5(v), 1, 8) AS BIGINT) AS h1,
        |          CAST('0x' || substr(md5(v), 9, 8) AS BIGINT) AS w
        |        FROM n)),
        |$rounds,
        |$digests
        |SELECT v AS node, CAST(r AS INT) AS r, n_regs, sum_rho, sum_pow
        |FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2
        |      UNION ALL SELECT * FROM d3)
        |ORDER BY node, r""".stripMargin
    },
    // SCC replay — definitional, not a recursion mirror: transitive
    // closure, mutual-reachability pairs (self included), min-label.
    "graph_scc" ->
      s"""WITH RECURSIVE $macroEdgesCte,
        |tc AS (
        |  SELECT src AS u, dst AS v FROM e
        |  UNION
        |  SELECT tc.u, e.dst FROM tc JOIN e ON e.src = tc.v),
        |mr AS (
        |  SELECT v, v AS u FROM n
        |  UNION
        |  SELECT t1.v, t1.u FROM tc t1
        |  JOIN tc t2 ON t2.u = t1.v AND t2.v = t1.u)
        |SELECT v AS node, min(u) AS scc, true AS converged
        |FROM mr GROUP BY v ORDER BY node""".stripMargin,
    // Condensation replay: definitional labels, edge contraction,
    // intra-component drop, multiplicity rollup.
    "graph_scc_condensation" ->
      s"""WITH RECURSIVE $macroEdgesCte,
        |tc AS (
        |  SELECT src AS u, dst AS v FROM e
        |  UNION
        |  SELECT tc.u, e2.dst FROM tc JOIN e e2 ON e2.src = tc.v),
        |mr AS (
        |  SELECT v, v AS u FROM n
        |  UNION
        |  SELECT t1.v, t1.u FROM tc t1
        |  JOIN tc t2 ON t2.u = t1.v AND t2.v = t1.u),
        |lab AS (SELECT v, min(u) AS scc FROM mr GROUP BY v)
        |SELECT ls.scc AS from_scc, ld.scc AS to_scc,
        |  CAST(count(*) AS BIGINT) AS n_edges
        |FROM e
        |JOIN lab ls ON ls.v = e.src
        |JOIN lab ld ON ld.v = e.dst
        |WHERE ls.scc <> ld.scc
        |GROUP BY 1, 2 ORDER BY from_scc, to_scc""".stripMargin,
    // Condensation-depth replay: definitional SCC labels, contracted
    // edge fold, six unrolled max-relaxation rounds (fixpoint at 4;
    // stable rounds are idempotent), all SCC labels seeded at 0.
    "graph_condensation_depth" -> {
      val rounds = (1 to 6).map { i =>
        s"""dd$i AS MATERIALIZED (
           |  SELECT d.v, greatest(d.depth, coalesce(m.md, 0)) AS depth
           |  FROM dd${i - 1} d LEFT JOIN (
           |    SELECT ce.v, max(dp.depth + 1) AS md
           |    FROM ce JOIN dd${i - 1} dp ON dp.v = ce.u
           |    GROUP BY ce.v) m ON m.v = d.v)""".stripMargin
      }.mkString(",\n")
      s"""WITH RECURSIVE $macroEdgesCte,
        |tc AS (
        |  SELECT src AS u, dst AS v FROM e
        |  UNION
        |  SELECT tc.u, e2.dst FROM tc JOIN e e2 ON e2.src = tc.v),
        |mr AS (
        |  SELECT v, v AS u FROM n
        |  UNION
        |  SELECT t1.v, t1.u FROM tc t1
        |  JOIN tc t2 ON t2.u = t1.v AND t2.v = t1.u),
        |lab AS (SELECT v, min(u) AS scc FROM mr GROUP BY v),
        |ce AS (
        |  SELECT DISTINCT ls.scc AS u, ld.scc AS v
        |  FROM e
        |  JOIN lab ls ON ls.v = e.src
        |  JOIN lab ld ON ld.v = e.dst
        |  WHERE ls.scc <> ld.scc),
        |dd0 AS (SELECT DISTINCT scc AS v, 0 AS depth FROM lab),
        |$rounds
        |SELECT v AS scc, CAST(depth AS BIGINT) AS depth,
        |  TRUE AS converged
        |FROM dd6 ORDER BY scc""".stripMargin
    },
    // Full bow-tie replay: pivot fwd/bwd closures -> 4-class cut,
    // then the IN-set forward and OUT-set backward closures split
    // OTHER into tube / tendril_in / tendril_out / disconnected.
    "graph_bowtie_full" ->
      s"""WITH RECURSIVE $macroEdgesCte,
        |fwd AS (
        |  SELECT '0' AS v
        |  UNION SELECT e.dst FROM fwd JOIN e ON e.src = fwd.v),
        |bwd AS (
        |  SELECT '0' AS v
        |  UNION SELECT e.src FROM bwd JOIN e ON e.dst = bwd.v),
        |cl AS (
        |  SELECT n.v,
        |    CASE WHEN f.v IS NOT NULL AND b.v IS NOT NULL THEN 'scc'
        |         WHEN b.v IS NOT NULL THEN 'in'
        |         WHEN f.v IS NOT NULL THEN 'out'
        |         ELSE 'other' END AS cls
        |  FROM n
        |  LEFT JOIN (SELECT DISTINCT v FROM fwd) f ON f.v = n.v
        |  LEFT JOIN (SELECT DISTINCT v FROM bwd) b ON b.v = n.v),
        |fin AS (
        |  SELECT v FROM cl WHERE cls = 'in'
        |  UNION SELECT e.dst FROM fin JOIN e ON e.src = fin.v),
        |bout AS (
        |  SELECT v FROM cl WHERE cls = 'out'
        |  UNION SELECT e.src FROM bout JOIN e ON e.dst = bout.v),
        |fc AS (
        |  SELECT cl.v,
        |    CASE WHEN cls <> 'other' THEN cls
        |         WHEN fi.v IS NOT NULL AND bo.v IS NOT NULL THEN 'tube'
        |         WHEN fi.v IS NOT NULL THEN 'tendril_in'
        |         WHEN bo.v IS NOT NULL THEN 'tendril_out'
        |         ELSE 'disconnected' END AS cls
        |  FROM cl
        |  LEFT JOIN (SELECT DISTINCT v FROM fin) fi ON fi.v = cl.v
        |  LEFT JOIN (SELECT DISTINCT v FROM bout) bo ON bo.v = cl.v)
        |SELECT cls, CAST(count(*) AS BIGINT) AS n_nodes,
        |  min(v) AS first_node, true AS converged
        |FROM fc GROUP BY cls ORDER BY cls""".stripMargin,
    "fmt_roundtrip" ->
      """WITH agg AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         round(sum(l_quantity), 2) AS sum_qty
        |  FROM lineitem WHERE l_orderkey < 1000 GROUP BY l_returnflag)
        |SELECT f.fmt, a.l_returnflag, a.n, a.sum_qty
        |FROM (VALUES ('csv'), ('json'), ('orc')) f(fmt)
        |CROSS JOIN agg a
        |ORDER BY fmt, l_returnflag""".stripMargin,
    "feed_ingest" ->
      """WITH feed AS (
        |  SELECT 'arxiv:' || i AS id,
        |    'cs.' || CASE WHEN i % 4 = 0 THEN 'DB' WHEN i % 4 = 1 THEN 'LG'
        |                  WHEN i % 4 = 2 THEN 'IR' ELSE 'DC' END AS category,
        |    CAST(DATE '2020-01-01' + CAST(i % 365 AS INT) AS VARCHAR)
        |      AS published
        |  FROM range(0, 1000) t(i))
        |SELECT category, count(*) AS n, min(id) AS min_id,
        |       max(published) AS max_pub
        |FROM feed GROUP BY category ORDER BY category""".stripMargin,
    "json_roundtrip" ->
      """SELECT event_id,
        |  to_json(struct_pack(event_id := event_id,
        |                      event_type := event_type)) AS js
        |FROM events WHERE event_id < 50 ORDER BY event_id""".stripMargin,
    // PageRank replay: uniform start, three contribution+recompute
    // rounds as chained CTEs, dangling mass leaking exactly like the
    // engine's recurrence; rounded after the last iteration.
    "graph_pagerank" ->
      """WITH e AS (
        |  SELECT DISTINCT doc_id % 40 AS src, (doc_id // 7) % 40 AS dst
        |  FROM documents WHERE doc_id % 40 <> (doc_id // 7) % 40),
        |n AS (
        |  SELECT DISTINCT v FROM (
        |    SELECT src AS v FROM e UNION SELECT dst FROM e)),
        |cnt AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM n),
        |deg AS (SELECT src, count(*) AS od FROM e GROUP BY src),
        |r0 AS (SELECT v, 1.0 / nn AS pr FROM n CROSS JOIN cnt),
        |c1 AS (
        |  SELECT e.dst AS v, sum(r0.pr / deg.od) AS m
        |  FROM e JOIN r0 ON e.src = r0.v JOIN deg ON e.src = deg.src
        |  GROUP BY e.dst),
        |r1 AS (
        |  SELECT n.v, 0.15 / cnt.nn + 0.85 * coalesce(c1.m, 0) AS pr
        |  FROM n CROSS JOIN cnt LEFT JOIN c1 ON n.v = c1.v),
        |c2 AS (
        |  SELECT e.dst AS v, sum(r1.pr / deg.od) AS m
        |  FROM e JOIN r1 ON e.src = r1.v JOIN deg ON e.src = deg.src
        |  GROUP BY e.dst),
        |r2 AS (
        |  SELECT n.v, 0.15 / cnt.nn + 0.85 * coalesce(c2.m, 0) AS pr
        |  FROM n CROSS JOIN cnt LEFT JOIN c2 ON n.v = c2.v),
        |c3 AS (
        |  SELECT e.dst AS v, sum(r2.pr / deg.od) AS m
        |  FROM e JOIN r2 ON e.src = r2.v JOIN deg ON e.src = deg.src
        |  GROUP BY e.dst),
        |r3 AS (
        |  SELECT n.v, 0.15 / cnt.nn + 0.85 * coalesce(c3.m, 0) AS pr
        |  FROM n CROSS JOIN cnt LEFT JOIN c3 ON n.v = c3.v)
        |SELECT CAST(v AS BIGINT) AS node, round(pr, 4) AS pr
        |FROM r3 ORDER BY node""".stripMargin,
    // Dangling replay: same chained CTEs plus a per-iteration dangling
    // mass scalar (sum of sink ranks) folded uniformly into the
    // recompute — rank mass is exactly 1 after every iteration.
    "graph_pagerank_dangling" ->
      """WITH e AS (
        |  SELECT DISTINCT doc_id % 30 AS src, (doc_id // 7) % 40 AS dst
        |  FROM documents WHERE doc_id % 30 <> (doc_id // 7) % 40),
        |n AS (
        |  SELECT DISTINCT v FROM (
        |    SELECT src AS v FROM e UNION SELECT dst FROM e)),
        |cnt AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM n),
        |deg AS (SELECT src, count(*) AS od FROM e GROUP BY src),
        |dang AS (SELECT v FROM n WHERE v NOT IN (SELECT src FROM deg)),
        |r0 AS (SELECT v, 1.0 / nn AS pr FROM n CROSS JOIN cnt),
        |d1 AS (SELECT coalesce(sum(r0.pr), 0) AS dm
        |       FROM r0 JOIN dang USING (v)),
        |c1 AS (
        |  SELECT e.dst AS v, sum(r0.pr / deg.od) AS m
        |  FROM e JOIN r0 ON e.src = r0.v JOIN deg ON e.src = deg.src
        |  GROUP BY e.dst),
        |r1 AS (
        |  SELECT n.v,
        |    0.15 / cnt.nn + 0.85 * (coalesce(c1.m, 0) + d1.dm / cnt.nn) AS pr
        |  FROM n CROSS JOIN cnt CROSS JOIN d1 LEFT JOIN c1 ON n.v = c1.v),
        |d2 AS (SELECT coalesce(sum(r1.pr), 0) AS dm
        |       FROM r1 JOIN dang USING (v)),
        |c2 AS (
        |  SELECT e.dst AS v, sum(r1.pr / deg.od) AS m
        |  FROM e JOIN r1 ON e.src = r1.v JOIN deg ON e.src = deg.src
        |  GROUP BY e.dst),
        |r2 AS (
        |  SELECT n.v,
        |    0.15 / cnt.nn + 0.85 * (coalesce(c2.m, 0) + d2.dm / cnt.nn) AS pr
        |  FROM n CROSS JOIN cnt CROSS JOIN d2 LEFT JOIN c2 ON n.v = c2.v),
        |d3 AS (SELECT coalesce(sum(r2.pr), 0) AS dm
        |       FROM r2 JOIN dang USING (v)),
        |c3 AS (
        |  SELECT e.dst AS v, sum(r2.pr / deg.od) AS m
        |  FROM e JOIN r2 ON e.src = r2.v JOIN deg ON e.src = deg.src
        |  GROUP BY e.dst),
        |r3 AS (
        |  SELECT n.v,
        |    0.15 / cnt.nn + 0.85 * (coalesce(c3.m, 0) + d3.dm / cnt.nn) AS pr
        |  FROM n CROSS JOIN cnt CROSS JOIN d3 LEFT JOIN c3 ON n.v = c3.v)
        |SELECT CAST(v AS BIGINT) AS node, round(pr, 4) AS pr
        |FROM r3 ORDER BY node""".stripMargin,
    // Seeded replay: the dangling chain with the uniform teleport
    // replaced by the seed-masked vector t (1/|S| on seeds, 0 off),
    // restart AND dangling redistribution both scaled by t, walk
    // started from t.
    "graph_pagerank_seeded" ->
      """WITH e AS (
        |  SELECT DISTINCT doc_id % 30 AS src, (doc_id // 7) % 40 AS dst
        |  FROM documents WHERE doc_id % 30 <> (doc_id // 7) % 40),
        |n AS (
        |  SELECT DISTINCT v FROM (
        |    SELECT src AS v FROM e UNION SELECT dst FROM e)),
        |deg AS (SELECT src, count(*) AS od FROM e GROUP BY src),
        |dang AS (SELECT v FROM n WHERE v NOT IN (SELECT src FROM deg)),
        |scnt AS (SELECT CAST(count(*) AS DOUBLE) AS ns
        |         FROM n WHERE v % 5 = 0),
        |tv AS (
        |  SELECT n.v,
        |    CASE WHEN n.v % 5 = 0 THEN 1.0 / scnt.ns ELSE 0.0 END AS t
        |  FROM n CROSS JOIN scnt),
        |r0 AS (SELECT v, t AS pr FROM tv),
        |d1 AS (SELECT coalesce(sum(r0.pr), 0) AS dm
        |       FROM r0 JOIN dang USING (v)),
        |c1 AS (
        |  SELECT e.dst AS v, sum(r0.pr / deg.od) AS m
        |  FROM e JOIN r0 ON e.src = r0.v JOIN deg ON e.src = deg.src
        |  GROUP BY e.dst),
        |r1 AS (
        |  SELECT tv.v,
        |    0.15 * tv.t + 0.85 * (coalesce(c1.m, 0) + d1.dm * tv.t) AS pr
        |  FROM tv CROSS JOIN d1 LEFT JOIN c1 ON tv.v = c1.v),
        |d2 AS (SELECT coalesce(sum(r1.pr), 0) AS dm
        |       FROM r1 JOIN dang USING (v)),
        |c2 AS (
        |  SELECT e.dst AS v, sum(r1.pr / deg.od) AS m
        |  FROM e JOIN r1 ON e.src = r1.v JOIN deg ON e.src = deg.src
        |  GROUP BY e.dst),
        |r2 AS (
        |  SELECT tv.v,
        |    0.15 * tv.t + 0.85 * (coalesce(c2.m, 0) + d2.dm * tv.t) AS pr
        |  FROM tv CROSS JOIN d2 LEFT JOIN c2 ON tv.v = c2.v),
        |d3 AS (SELECT coalesce(sum(r2.pr), 0) AS dm
        |       FROM r2 JOIN dang USING (v)),
        |c3 AS (
        |  SELECT e.dst AS v, sum(r2.pr / deg.od) AS m
        |  FROM e JOIN r2 ON e.src = r2.v JOIN deg ON e.src = deg.src
        |  GROUP BY e.dst),
        |r3 AS (
        |  SELECT tv.v,
        |    0.15 * tv.t + 0.85 * (coalesce(c3.m, 0) + d3.dm * tv.t) AS pr
        |  FROM tv CROSS JOIN d3 LEFT JOIN c3 ON tv.v = c3.v)
        |SELECT CAST(v AS BIGINT) AS node, round(pr, 4) AS pr
        |FROM r3 ORDER BY node""".stripMargin,
    // Coreness replay: undirected fold, degree start, six h-index
    // rounds as chained CTEs (fixpoint confirmed at round 6), each
    // round = neighbor-value histogram + suffix-count window +
    // max(least(v, cum)) merge.
    "graph_kcores" ->
      s"""WITH e AS (
        |  SELECT doc_id % 80 AS src,
        |    CASE WHEN doc_id % 4 = 0 THEN (doc_id * 13 + 1) % 80
        |         ELSE (doc_id // 5) % 80 END AS dst
        |  FROM documents),
        |u AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e WHERE src <> dst),
        |sym AS (SELECT a, b FROM u UNION ALL SELECT b, a FROM u),
        |c0 AS (SELECT a, count(*) AS c FROM sym GROUP BY a),
        |${kcoresRounds(6)}
        |SELECT CAST(c0.a AS BIGINT) AS node,
        |  CAST(c0.c AS BIGINT) AS degree,
        |  CAST(c6.c AS BIGINT) AS coreness, true AS converged
        |FROM c0 JOIN c6 USING (a) ORDER BY node""".stripMargin,
    "date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m, count(*) AS n,
        |  CAST(min(day(o_orderdate)) AS INT) AS min_day,
        |  max(strftime(o_orderdate, '%Y-%m-%d')) AS max_date
        |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin,
    "math_funcs" ->
      """SELECT round(sum(sqrt(l_quantity) + pow(l_discount, 2)
        |  + ln(l_extendedprice) + abs(l_tax - 0.05)), 2) AS v,
        |  round(min(ceil(l_extendedprice)), 2) AS mn,
        |  round(max(floor(l_extendedprice)), 2) AS mx
        |FROM lineitem""".stripMargin,
    "q_union_corpus" ->
      """WITH feed AS (
        |  SELECT 'Deterministic abstract number ' ||
        |         CAST((i * 2654435761) % 1000 AS VARCHAR) AS text
        |  FROM range(0, 1000) t(i)),
        |unioned AS (
        |  SELECT 'documents' AS origin, text FROM documents
        |  UNION ALL
        |  SELECT 'feed' AS origin, text FROM feed)
        |SELECT origin, count(*) AS n,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM unioned GROUP BY origin ORDER BY origin""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |         l_linestatus ASC NULLS FIRST""".stripMargin,
  )
}

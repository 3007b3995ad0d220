package graft.tools

import graft.functions.Metric
import graft.operators.{Dedup, NearDupIndex}
import graft.search.{Ann, GraphAnn, Hybrid, Knn}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale rehearsal — the 100-TB story proven with data instead of a
  * design argument. Blows the sf fixtures up by a deterministic factor
  * (no fixture change: copies get fresh ids and hash-jittered vectors /
  * suffixed texts), rebuilds the persisted IVF and near-dup layouts at
  * 1× and N×, and measures what each access path actually OPENS:
  *
  *   - an index probe (IVF cell probe, near-dup posting probe) must
  *     open O(probed buckets) files — a count that does NOT grow with
  *     the corpus, because partition pruning drops unprobed dirs at the
  *     file listing;
  *   - the brute-force alternative (exact KNN scan, full-corpus LSH
  *     pair sweep) opens the whole corpus — a count that grows
  *     linearly with the blow-up factor.
  *
  * `run` returns the measurement table; [[check]] turns it into the
  * scale assertions (shared by the ScalaTest spec and the CLI, which
  * exits non-zero on violation). File counts come from the executed
  * scan's `numFiles` metric — `inputFiles` lists the relation
  * PRE-pruning and would hide exactly the effect under test. */
object ScaleRehearsal {

  /** One measured access path at one scale. `filesRead`/`rowsRead` are
    * the executed scan's numFiles/numOutputRows over `totalFiles` in
    * the scanned location; `bytesAdmitted` is the scan's filesSize
    * metric (bytes the PRUNED listing admits — the quantized layouts'
    * compression story measured on disk); `sec` is wall time. */
  final case class Measure(leg: String, scale: Int, corpusRows: Long,
      totalFiles: Long, filesRead: Long, rowsRead: Long, sec: Double,
      bytesAdmitted: Long = 0L)

  /** Executed-plan file/row/byte metrics for scans rooted under
    * `pathFrag` (descends through AQE wrappers; run after the
    * action). */
  private def scanMetrics3(df: DataFrame,
      pathFrag: String): (Long, Long, Long) = {
    val (f, r) = scanMetrics(df, pathFrag)
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case fs: FileSourceScanExec => Seq(fs)
      case other =>
        other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
    }
    val bytes = scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists { p =>
        val s = p.toUri.getPath
        s == pathFrag || s.startsWith(pathFrag + "/")
      })
      .map(_.metrics.get("filesSize").map(_.value).getOrElse(0L)).sum
    (f, r, bytes)
  }

  private def scanMetrics(df: DataFrame, pathFrag: String): (Long, Long) = {
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan) // AQE stages hide subtrees
      case f: FileSourceScanExec => Seq(f)
      case other =>
        other.children.flatMap(scans) ++
          other.subqueries.flatMap(scans)
    }
    // exact-dir match (path or a child of it): a bare `contains` would
    // let `nd` also swallow the sibling `nd_docs` layout's scans
    val hit = scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists { p =>
        val s = p.toUri.getPath
        s == pathFrag || s.startsWith(pathFrag + "/")
      })
    (hit.map(_.metrics("numFiles").value).sum,
      hit.map(_.metrics("numOutputRows").value).sum)
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** `factor` deterministic copies of the embeddings: copy i shifts ids
    * by i·stride and jitters every vector component by a tiny
    * hash-derived delta (pure function of (id, component, copy) — same
    * blow-up on every run/cluster), so copies are near their original
    * but not identical. Copy 0 is the fixture itself. */
  def blowUpEmbeddings(emb: DataFrame, factor: Int): DataFrame = {
    val stride = emb.agg(max("vec_id")).head().getLong(0) + 1L
    (0 until factor).map { i =>
      if (i == 0) emb
      else emb
        .withColumn("vec_id", col("vec_id") + lit(i * stride))
        // keep the fixture's array<float> dtype: SQL float arithmetic
        // widens to double, and a widened copy would silently retype
        // the whole unioned corpus (quantizer fits collect floats)
        .withColumn("embedding", transform(col("embedding"), (x, j) =>
          (x + pmod(xxhash64(col("vec_id"), j, lit(i)), lit(1000L))
            .cast("float") / lit(1e6f)).cast("float")))
    }.reduce(_ unionByName _)
  }

  /** `factor` deterministic copies of the documents: copy i shifts ids
    * and appends a copy-specific token, so copies are near-dups of
    * their original (a realistic crawl-recrawl corpus) but exact-dedup
    * survivors. */
  def blowUpDocs(docs: DataFrame, factor: Int): DataFrame = {
    val stride = docs.agg(max("doc_id")).head().getLong(0) + 1L
    (0 until factor).map { i =>
      if (i == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(i * stride))
        .withColumn("text", concat(col("text"), lit(s" rehearsal$i")))
    }.reduce(_ unionByName _)
  }

  /** Measure the four access paths at 1× and `factor`×. Writes scaled
    * corpora and layouts under `workDir` (wiped per scale). */
  def run(spark: SparkSession, sfDir: String, factor: Int,
      workDir: String): Seq[Measure] = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull && trim(col("text")) =!= "")
      .select("doc_id", "text")
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    Seq(1, factor).flatMap { scale =>
      val base = s"$workDir/x$scale"
      val corpusPath = s"$base/embeddings"
      val docsPath = s"$base/documents"
      // write the scaled corpora: union of per-copy plans → file count
      // grows with the data, the shape a growing lake actually has
      blowUpEmbeddings(emb, scale).write.mode("overwrite")
        .parquet(corpusPath)
      blowUpDocs(docs, scale).write.mode("overwrite").parquet(docsPath)
      val corpus = spark.read.parquet(corpusPath)
      val docsN = spark.read.parquet(docsPath)
      val corpusRows = corpus.count()

      // --- ANN: persisted IVF probe vs exact brute-force scan ---
      Ann.persistIvf(
        Ann.buildIvfDeterministic(corpus, "embedding", "vec_id", k = 32),
        s"$base/ivf")
      spark.sharedState.cacheManager.clearCache()
      val (probe, probeSec) = timed {
        val df = Ann.queryPersistedIvf(spark, Ann.PersistedIvf(s"$base/ivf"),
          queries, "qid", "qvec", "vec_id", "embedding", k = 5, nProbe = 2)
        df.collect(); df
      }
      val (pf, pr) = scanMetrics(probe, s"$base/ivf")
      val (brute, bruteSec) = timed {
        val df = Knn.batchQuery(corpus, queries, "embedding", "vec_id",
          "qvec", "qid", k = 5)
        df.collect(); df
      }
      val (bf, br) = scanMetrics(brute, corpusPath)

      // --- ANN: persisted sign-LSH probe (same flat-vs-linear story
      // through the (table, code) layout) ---
      val slshIdx = Ann.persistSignLsh(
        Ann.buildSignLsh(corpus, "embedding", tables = 4, bits = 3),
        "vec_id", "embedding", s"$base/slsh")
      spark.sharedState.cacheManager.clearCache()
      val (slshProbe, slshSec) = timed {
        val df = Ann.queryPersistedSignLsh(spark, slshIdx, queries,
          "qid", "qvec", "vec_id", "embedding", k = 5)
        df.collect(); df
      }
      val (slf, slr) = scanMetrics(slshProbe, s"$base/slsh")

      // --- near-dup: persisted posting probe vs full LSH pair sweep ---
      val idx = NearDupIndex.persist(docsN, "doc_id", "text", s"$base/nd")
      // small delta: 3 docs × 4 bands probe ≤ 12 of the 32 posting dirs
      val delta = docs.filter(col("doc_id") < 3)
        .withColumn("doc_id", col("doc_id") + lit(10_000_000L))
      val (ndProbe, ndProbeSec) = timed {
        val df = NearDupIndex.nearDupsAgainst(spark, idx, delta,
          "doc_id", "text", threshold = 0.5)
        df.collect(); df
      }
      val (npf, npr) = scanMetrics(ndProbe, s"$base/nd")
      val (_, sweepSec) = timed {
        Dedup.minhashLshPairs(docsN, "doc_id", "text",
          threshold = 0.5).collect()
      }
      // the sweep's corpus scan hides behind its internal checkpoint —
      // measure the identical mandatory input projection directly
      val sweepScan = Dedup.withShingles(docsN, "doc_id", "text", 3)
        .filter(size(col("sh")) > 0).select("id")
      sweepScan.collect()
      val (swf, swr) = scanMetrics(sweepScan, docsPath)

      // --- graph: one representative beam-search hop over the
      // bucket-partitioned edge layout. The frontier's src ids prune
      // to their buckets at the file listing AND the pushed `__src IN`
      // filter cuts the scan's output to the frontier's own edges, so
      // BOTH counts must stay flat while the edge table grows N× ---
      val pg = GraphAnn.persistGraph(
        GraphAnn.buildGraphLsh(corpus, "embedding", "vec_id", m = 4,
          tables = 4, bits = 3),
        s"$base/graph", buckets = 16)
      spark.sharedState.cacheManager.clearCache()
      val (hop, hopSec) = timed {
        val df = GraphAnn.prunedEdges(spark, pg, Seq(5L, 6L, 7L, 8L))
        df.collect(); df
      }
      val (gf, gr) = scanMetrics(hop, s"$base/graph")

      // --- hybrid keyword leg: BM25 over the term-bucketed persisted
      // postings. The query terms' buckets prune at the listing; the
      // pushed term filter keeps the scan's output to the query
      // terms' own postings ---
      val pp = Hybrid.persistPostings(docsN, "doc_id", "text",
        s"$base/post", buckets = 32)
      // short query texts (first 3 words) → a handful of term buckets
      val kwQueries = docs.filter(col("doc_id") < 2)
        .select(col("doc_id").as("qid"),
          concat_ws(" ", slice(split(lower(trim(col("text"))), "\\s+"),
            1, 3)).as("qtext"))
      spark.sharedState.cacheManager.clearCache()
      val (kw, kwSec) = timed {
        val df = Hybrid.bm25Persisted(spark, pp, kwQueries, "qid",
          "qtext", "doc_id")
        df.collect(); df
      }
      val (kf, kr) = scanMetrics(kw, s"$base/post")

      // --- SQ8: the coarse stage scans the byte-code FILE, the refine
      // joins the float vectors back. No dir pruning exists here by
      // design (the coarse stage is a full scan); the scale claim is
      // COMPRESSION — the bytes the coarse scan admits stay a fraction
      // of the float file's at every scale (1 B/dim vs 4 B/dim) ---
      val sq8Stats = graft.search.Sq8.fit(corpus, "embedding")
      val sq8Idx = graft.search.Sq8.persist(corpus, "embedding",
        "vec_id", s"$base/sq8", sq8Stats)
      spark.sharedState.cacheManager.clearCache()
      val (sq8Df, sq8Sec) = timed {
        val df = graft.search.Sq8.rerankPersisted(spark, sq8Idx, queries,
          "qvec", "qid", "vec_id", "embedding", k = 5, c = 2)
        df.collect(); df
      }
      val (s8cf, s8cr, s8cb) = scanMetrics3(sq8Df, s"$base/sq8_codes")
      val (s8vf, s8vr, s8vb) = scanMetrics3(sq8Df, s"$base/sq8")

      // --- IVF-PQ: cell partition pruning composed with the code
      // column scan — the probed cells' files stay flat while the
      // layout grows N× (the quantized family's pruning, metric-
      // asserted like the plain IVF probe) ---
      val ivfpqIdx = graft.search.Pq.persistIvfPq(
        Ann.buildIvfDeterministic(corpus, "embedding", "vec_id", k = 32),
        graft.search.Pq.fit(corpus, "embedding", "vec_id", m = 16, k = 16),
        "embedding", s"$base/ivfpq")
      spark.sharedState.cacheManager.clearCache()
      val (ivfpqDf, ivfpqSec) = timed {
        val df = graft.search.Pq.queryPersistedIvfPq(spark, ivfpqIdx,
          queries, "qid", "qvec", "vec_id", "embedding", k = 5, c = 2,
          nProbe = 2)
        df.collect(); df
      }
      val (pqf, pqr, pqb) = scanMetrics3(ivfpqDf, s"$base/ivfpq")

      val ivfFiles = spark.read.parquet(s"$base/ivf").inputFiles.length
      val slshFiles = spark.read.parquet(s"$base/slsh").inputFiles.length
      val ndFiles = spark.read.parquet(s"$base/nd").inputFiles.length
      val graphFiles = spark.read.parquet(s"$base/graph").inputFiles.length
      val postFiles = spark.read.parquet(s"$base/post").inputFiles.length
      val corpusFiles = corpus.inputFiles.length
      val docFiles = docsN.inputFiles.length
      Seq(
        Measure("ivf_probe", scale, corpusRows, ivfFiles, pf, pr, probeSec),
        Measure("signlsh_probe", scale, corpusRows, slshFiles, slf, slr,
          slshSec),
        Measure("knn_brute", scale, corpusRows, corpusFiles, bf, br,
          bruteSec),
        Measure("neardup_probe", scale, corpusRows, ndFiles, npf, npr,
          ndProbeSec),
        Measure("lsh_sweep", scale, corpusRows, docFiles, swf, swr,
          sweepSec),
        Measure("graph_hop", scale, corpusRows, graphFiles, gf, gr,
          hopSec),
        Measure("bm25_probe", scale, corpusRows, postFiles, kf, kr,
          kwSec),
        Measure("sq8_codes_scan", scale, corpusRows,
          spark.read.parquet(s"$base/sq8_codes").inputFiles.length,
          s8cf, s8cr, sq8Sec, s8cb),
        Measure("sq8_vec_refine", scale, corpusRows,
          spark.read.parquet(s"$base/sq8").inputFiles.length,
          s8vf, s8vr, sq8Sec, s8vb),
        Measure("ivfpq_probe", scale, corpusRows,
          spark.read.parquet(s"$base/ivfpq").inputFiles.length,
          pqf, pqr, ivfpqSec, pqb))
    }
  }

  /** The scale assertions over a [[run]] table: probes stay
    * O(probed buckets) while brute-force legs grow with the corpus.
    * Returns human-readable violations (empty = rehearsal passed). */
  def check(rows: Seq[Measure], factor: Int): Seq[String] = {
    def at(leg: String, scale: Int) =
      rows.find(r => r.leg == leg && r.scale == scale).get
    val v = scala.collection.mutable.ListBuffer[String]()
    // IVF-PQ: the quantized family's cell pruning, asserted like the
    // plain IVF probe — probed-cell files flat while the layout grows
    for (leg <- Seq("ivf_probe", "signlsh_probe", "neardup_probe",
        "ivfpq_probe")) {
      val (one, big) = (at(leg, 1), at(leg, factor))
      // pruning holds: the probe opens the same bucket dirs no matter
      // how large the corpus grew (sub-cell splits allow a small slack)
      if (big.filesRead > one.filesRead * 2)
        v += s"$leg files grew ${one.filesRead} -> ${big.filesRead} " +
          s"at ${factor}x (pruning lost)"
      if (big.filesRead * 3 > big.totalFiles * 2)
        v += s"$leg opened ${big.filesRead} of ${big.totalFiles} files " +
          s"at ${factor}x (probe reads most of the layout)"
    }
    // graph hop: the frontier opens only its own buckets' files, a
    // count that stays flat while the edge table grows N×. (The
    // residual `__src IN` filter prunes at row-group granularity — on
    // these one-row-group test files the scan still emits its bucket's
    // rows, so the LISTING-level count is the assertable guarantee.)
    locally {
      val (one, big) = (at("graph_hop", 1), at("graph_hop", factor))
      if (big.filesRead > one.filesRead * 2)
        v += s"graph_hop files grew ${one.filesRead} -> " +
          s"${big.filesRead} at ${factor}x (bucket pruning lost)"
      if (big.filesRead * 3 > big.totalFiles * 2)
        v += s"graph_hop opened ${big.filesRead} of ${big.totalFiles} " +
          s"files at ${factor}x (hop reads most of the edge layout)"
    }
    // BM25 probe: the query terms' buckets stay a strict minority of
    // the posting dirs, and the probed dir count does not grow
    locally {
      val (one, big) = (at("bm25_probe", 1), at("bm25_probe", factor))
      if (big.filesRead > one.filesRead * 2)
        v += s"bm25_probe files grew ${one.filesRead} -> " +
          s"${big.filesRead} at ${factor}x (term-bucket pruning lost)"
      if (big.filesRead * 3 > big.totalFiles * 2)
        v += s"bm25_probe opened ${big.filesRead} of ${big.totalFiles} " +
          s"files at ${factor}x (probe reads most of the layout)"
    }
    // SQ8: no dir pruning by design (the coarse stage is a full scan);
    // the on-disk claim is compression — at the BLOWN-UP scale the
    // codes scan admits a strict fraction of the float file's bytes
    // (1 B/dim codes vs 4 B/dim floats; asserted at 2× not the
    // nominal 4× because parquet encoding narrows the gap, and only
    // at N× because per-file footer overhead dominates the tiny 1×
    // dirs — the ratio IMPROVES with scale, which is the point)
    locally {
      val codes = at("sq8_codes_scan", factor)
      val vecs = at("sq8_vec_refine", factor)
      if (codes.bytesAdmitted <= 0 || vecs.bytesAdmitted <= 0)
        v += s"sq8 byte metrics missing at ${factor}x " +
          s"(${codes.bytesAdmitted}/${vecs.bytesAdmitted})"
      else if (codes.bytesAdmitted * 2 > vecs.bytesAdmitted)
        v += s"sq8 codes scan admits ${codes.bytesAdmitted} B vs " +
          s"${vecs.bytesAdmitted} B of floats at ${factor}x " +
          "(compression story lost)"
    }
    for (leg <- Seq("knn_brute", "lsh_sweep")) {
      val (one, big) = (at(leg, 1), at(leg, factor))
      if (big.rowsRead < one.rowsRead * (factor - 1))
        v += s"$leg rows ${one.rowsRead} -> ${big.rowsRead}: brute " +
          s"leg did not scan the ${factor}x corpus (bad baseline)"
      if (big.filesRead < one.filesRead * factor / 2)
        v += s"$leg files ${one.filesRead} -> ${big.filesRead}: " +
          s"brute file count did not grow with the corpus"
    }
    v.toSeq
  }

  def render(rows: Seq[Measure]): String = {
    val hdr = f"${"leg"}%-15s ${"scale"}%5s ${"corpus"}%8s " +
      f"${"files"}%6s ${"read"}%6s ${"rows_read"}%10s ${"sec"}%7s " +
      f"${"bytes"}%10s"
    (hdr +: rows.map(r =>
      f"${r.leg}%-15s ${r.scale}%5d ${r.corpusRows}%8d ${r.totalFiles}%6d " +
        f"${r.filesRead}%6d ${r.rowsRead}%10d ${r.sec}%7.2f " +
        f"${r.bytesAdmitted}%10d"))
      .mkString("\n")
  }

  /** Usage: runMain graft.tools.ScaleRehearsal [sfDir] [factor] */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files
      .createTempDirectory("graft_rehearsal").toString
    val rows = run(spark, sfDir, factor, work)
    println(render(rows))
    val violations = check(rows, factor)
    violations.foreach(v => println(s"[rehearsal] VIOLATION: $v"))
    println(if (violations.isEmpty)
      s"[rehearsal] PASS: probes stay O(probed buckets) at ${factor}x; " +
        "brute-force legs grow with the corpus"
    else s"[rehearsal] FAIL: ${violations.size} violation(s)")
    spark.stop()
    if (violations.nonEmpty) sys.exit(1)
  }
}

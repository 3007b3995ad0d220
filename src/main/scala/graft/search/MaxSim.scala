package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Late-interaction multi-vector retrieval — MaxSim (Khattab &
  * Zaharia, "ColBERT", SIGIR 2020): documents and queries are BAGS of
  * per-token vectors, and score(q, d) = Σ_{query token} max_{doc
  * token} cos(qt, dt) — each query token independently finds its best
  * match in the doc, which preserves term-level interaction that
  * single-vector pooling erases. The first-class retriever tier for
  * training-data curation the pooled ANN legs don't cover.
  *
  * Relationally the score is a grouped join + two aggregations (max
  * per query token, ordered sum per doc), and the scale story is the
  * PLAID two-stage shape (Santhanam et al., CIKM 2022): candidate
  * docs come from ONE equi-join of query-token buckets to doc-token
  * buckets on a sign-LSH key — never an unguarded
  * queries × tokens × corpus cross product — and the exact MaxSim
  * runs only over the candidate pairs. On clustered real-token
  * embeddings the bucket join prunes hard; on uniform data it
  * degrades to most-of-corpus candidates while staying correct
  * (exact MaxSim over every doc sharing at least one bucket).
  *
  * Determinism discipline: cosines are computed in DOUBLE with
  * left-to-right component folds, the per-doc sum folds in QUERY
  * TOKEN order, and the bucket sign test runs on floor(x·2^20)
  * integers — every stage bit-reproducible and DuckDB-replayable.
  */
object MaxSim {

  /** Default pk-hash dir count of the `_docs` side table
    * [[persistTokens]] writes — the table that lets
    * [[topKPersisted]]'s exact stage and [[syncPersistedTokens]]'s
    * old-row lookup open only the candidate (resp. changed) docs'
    * buckets instead of sweeping the whole bucket-partitioned token
    * store (the sign-LSH `_docs` / `IndexKinds` `_corpus`
    * discipline). The ACTIVE count is a build parameter frozen into
    * the layout's `_meta` (like `bits`): queries and syncs re-derive
    * the same hash from the side file, so re-sizing the constant here
    * can never silently mis-prune an existing layout. */
  private[graft] val defaultDocBuckets = 32

  private def docBucketCol(did: Column, buckets: Int): Column =
    pmod(xxhash64(did), lit(buckets.toLong)).cast("int")

  /** (bits, docBuckets) frozen at build. Layouts persisted before
    * docBuckets was a parameter carry a single-column `_meta`; they
    * were all written with the then-constant 32, which is exactly
    * [[defaultDocBuckets]]'s value — the fallback is the only hash
    * those layouts' `_docs` dirs can be correct under. */
  private def readMeta(spark: SparkSession, path: String): (Int, Int) = {
    val m = spark.read.parquet(path + "_meta")
    val bits = m.select("__bits").head().getInt(0)
    val db =
      if (m.columns.contains("__dbuckets"))
        m.select("__dbuckets").head().getInt(0)
      else defaultDocBuckets
    (bits, db)
  }

  /** One-time migration for layouts persisted before the `_docs` twin
    * existed: derive it from the sign-bucketed store (one full scan —
    * the legacy candidate-fetch cost, paid once instead of on every
    * query), so [[topKPersisted]] and [[syncPersistedTokens]] never
    * fail path-not-found on an old layout. */
  private def ensureDocsTwin(spark: SparkSession, path: String,
      docBuckets: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(path + "_docs")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.read.parquet(path).select(col("__did"), col("__dv"))
        .withColumn("__dbkt", docBucketCol(col("__did"), docBuckets))
        .repartition(col("__dbkt"))
        .write.mode("overwrite").partitionBy("__dbkt")
        .parquet(path + "_docs")
  }

  /** `bits` sign tests need `2·bits` vector components (bit i reads
    * the pair (2i, 2i+1)); past the vector length `element_at` is
    * null, so an over-wide bucket silently degenerates to constant-0
    * high bits (and throws under ANSI mode). Probed from ONE row —
    * uniform token dimension is the caller's contract. Applied to
    * BOTH sides: a narrow QUERY token would lose candidates just as
    * silently as a narrow doc token. */
  private def requireDim(tokens: DataFrame, vecCol: String,
      bits: Int): Unit =
    tokens.select(size(col(vecCol)).as("__d")).head(1).foreach { r =>
      val d = r.getInt(0)
      require(2 * bits <= d,
        s"bits=$bits needs 2*bits <= token dimension ($d) in '$vecCol': " +
          "each sign test consumes one component pair")
    }

  /** Sign-LSH bucket of a token vector: `bits` sign tests, bit i =
    * sign of the integer-quantized sum of adjacent component pair
    * (2i, 2i+1) — axis-pair hyperplanes, exact integer arithmetic.
    * Requires `2·bits <=` the token dimension (enforced by the public
    * entry points via [[requireDim]]). */
  def bucket(vec: Column, bits: Int): Column = {
    val xi = transform(vec,
      x => floor(x.cast("double") * lit(1048576.0)).cast("long"))
    (0 until bits).map { i =>
      when(element_at(xi, 2 * i + 1) + element_at(xi, 2 * i + 2) >= 0,
        lit(1 << i)).otherwise(lit(0))
    }.reduceOption(_ + _).getOrElse(lit(0))
  }

  /** Exact double cosine with the zero-norm → 0 convention shared
    * with every exact leg (left-to-right folds: order-deterministic).
    * Shared with [[Plaid]]'s exact refine so the two late-interaction
    * legs can never drift on scoring arithmetic. */
  private[search] def cosD(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), _ + _)
    val na = dot(a, a)
    val nb = dot(b, b)
    when(na === 0.0 || nb === 0.0, lit(0.0))
      .otherwise(dot(a, b) / (sqrt(na) * sqrt(nb)))
  }

  /** Handle to a [[persistTokens]] layout. */
  final case class PersistedTokens(path: String, bits: Int)

  /** Persist the token table partitioned by sign-LSH bucket — the
    * on-disk PLAID shape: candidate generation reads ONLY the query
    * tokens' bucket DIRECTORIES (partition pruning at the file
    * listing — a query batch touching b of 2^bits buckets never
    * opens the rest of a 100 TB token store). A pk-hash-bucketed
    * `_docs` twin persists beside it (the sign-LSH `_docs` shape): a
    * doc's tokens SCATTER across sign buckets, so the exact stage
    * fetches candidate docs' full token sets from `_docs` — opening
    * only the candidate pks' hash dirs — never by sweeping the
    * sign-bucketed store. `bits` AND `docBuckets` ride the `_meta`
    * side file so queries and syncs re-derive the same hashes; size
    * `docBuckets` so one pk dir's tokens fit an executor's read —
    * each dir holds ~1/docBuckets of the token store. */
  def persistTokens(docTokens: DataFrame, docIdCol: String,
      docVecCol: String, path: String, bits: Int = 4,
      docBuckets: Int = defaultDocBuckets): PersistedTokens = {
    require(bits >= 1 && bits <= 16, s"bits in [1, 16], got $bits")
    require(docBuckets >= 1, s"docBuckets >= 1, got $docBuckets")
    val dt0 = docTokens.filter(col(docVecCol).isNotNull)
      .select(col(docIdCol).as("__did"),
        transform(col(docVecCol), _.cast("double")).as("__dv"))
    requireDim(dt0, "__dv", bits) // before __b exists: ANSI-safe probe
    // ONE evaluation feeds both twins (the caller's token derivation —
    // shingling, embedding — runs once, not once per write) and the
    // store and `_docs` can never diverge at write time; the
    // Plaid.persist discipline
    val dt = dt0.withColumn("__b", bucket(col("__dv"), bits))
      .localCheckpoint(true)
    // the two tables land on disjoint paths — write them concurrently
    graft.index.PartitionedLayout.inParallel(
      dt.repartition(col("__b"))
        .write.mode("overwrite").partitionBy("__b").parquet(path),
      dt.drop("__b")
        .withColumn("__dbkt", docBucketCol(col("__did"), docBuckets))
        .repartition(col("__dbkt"))
        .write.mode("overwrite").partitionBy("__dbkt")
        .parquet(path + "_docs"))
    val spark = docTokens.sparkSession
    // write-fence (parquet footer counts — two metadata-cheap jobs): the
    // twins hold the same token rows by construction, so unequal counts
    // mean a torn write — fail the build loudly, never serve a
    // silently-degraded refine
    val ns = spark.read.parquet(path).count()
    val nd = spark.read.parquet(path + "_docs").count()
    require(ns == nd,
      s"maxsim persist torn: store=$ns rows, _docs=$nd rows at $path")
    import spark.implicits._
    Seq((bits, docBuckets)).toDF("__bits", "__dbuckets").coalesce(1)
      .write.mode("overwrite").parquet(path + "_meta")
    PersistedTokens(path, bits)
  }

  /** CDF-batch maintenance of a [[persistTokens]] layout — the
    * late-interaction leg's `syncPersistedSignLsh`: last-write-wins
    * per doc, deletes and empty-bag upserts leave the index. `changes`
    * carries ONE row per doc with its full token bag nested
    * (`tokensCol: array<array<float|double>>`) plus the CDF `__op` /
    * `__seq` pair — a doc's tokens replace ATOMICALLY (never a
    * half-old half-new bag). Sign buckets are a pure per-token
    * function of the vector (no trained state), so a synced layout is
    * IDENTICAL to a fresh build over the live corpus. A changed doc's
    * OLD sign buckets are located by re-bucketing its stored tokens
    * from `_docs` (a lookup pruned to the batch's pk-hash dirs); only
    * touched `__b` dirs of the store and `__dbkt` dirs of `_docs`
    * rewrite, both driver-bounded by their key spaces (2^bits,
    * docBuckets from `_meta`).
    *
    * Crash contract (idempotent under replay INCLUDING partial
    * replays): `_docs` is written in two phases around the store
    * merge — an APPEND of the new token rows first, the exact
    * anti-join trim last. At any crash point `_docs` therefore holds
    * a SUPERSET of every changed doc's live tokens, so a replay's
    * old-bucket discovery (re-bucketing `_docs` rows) can only list
    * extra affected dirs — harmless rewrites — never miss a dir
    * holding stale store rows. Were the exact trim written before
    * the store merge (or the old single write left after it, the
    * pre-r19 order), a crash between the two writes would desync
    * them: discovery would miss the changed docs' other-side buckets
    * and stale postings would survive silently. */
  def syncPersistedTokens(spark: SparkSession, idx: PersistedTokens,
      changes: DataFrame, pkCol: String, tokensCol: String): Unit = {
    import graft.index.{ChangeLog, PartitionedLayout}
    val (bits, docBuckets) = readMeta(spark, idx.path)
    ensureDocsTwin(spark, idx.path, docBuckets)
    val latest = ChangeLog.latestPerPk(changes, pkCol).localCheckpoint(true)
    val changedPks = latest.select(col(pkCol).as("__did"))
    val newToks0 = latest.filter(col("__op") =!= ChangeLog.OpDelete)
      .filter(col(tokensCol).isNotNull)
      .select(col(pkCol).as("__did"), explode(col(tokensCol)).as("__tv"))
      .filter(col("__tv").isNotNull)
      .select(col("__did"),
        transform(col("__tv"), _.cast("double")).as("__dv"))
    requireDim(newToks0, "__dv", bits) // before __b: ANSI-safe probe
    val newToks = newToks0.withColumn("__b", bucket(col("__dv"), bits))
      .localCheckpoint(true) // affected collect + both merges
    val dbks = changedPks
      .select(docBucketCol(col("__did"), docBuckets).as("__dbkt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val oldToks = spark.read.parquet(idx.path + "_docs")
      .filter(col("__dbkt").isin(dbks: _*))
      .join(changedPks, Seq("__did"), "left_semi")
      .withColumn("__b", bucket(col("__dv"), bits))
    // discovery BEFORE any write: old buckets from the pre-batch
    // _docs, new buckets from the batch itself
    val affected: Seq[Seq[Any]] = oldToks.select("__b")
      .union(newToks.select("__b")).distinct()
      .collect().map(r => Seq[Any](r.getInt(0)))
    val newDocRows = newToks.drop("__b")
      .withColumn("__dbkt", docBucketCol(col("__did"), docBuckets))
    // ---- phase 1: ADDITIVE _docs append (crash ⇒ superset, safe) ----
    newDocRows.repartition(col("__dbkt"))
      .write.mode("append").partitionBy("__dbkt")
      .parquet(idx.path + "_docs")
    // ---- phase 2: sign-bucketed store — rewrite touched __b dirs ----
    if (affected.nonEmpty) {
      PartitionedLayout.mergeOverwrite(spark, idx.path, Seq("__b"),
        affected,
        spark.read.parquet(idx.path)
          .filter(PartitionedLayout.touchedPred(Seq("__b"), affected)),
        Seq("__did"), changedPks, newToks)
    }
    // ---- phase 3: exact _docs trim — same merge keyed by pk-hash
    // dirs (new rows' pks ⊆ changed pks, so their dirs ⊆ dbks); the
    // anti-join also removes the phase-1 duplicates before re-adding
    // each new row once ----
    PartitionedLayout.mergeOverwrite(spark, idx.path + "_docs",
      Seq("__dbkt"), dbks.map(Seq[Any](_)),
      spark.read.parquet(idx.path + "_docs")
        .filter(col("__dbkt").isin(dbks: _*)),
      Seq("__did"), changedPks, newDocRows)
  }

  /** [[topK]] over a [[persistTokens]] layout — identical scores by
    * construction (same buckets, same exact stage; shares the
    * in-memory oracle). Candidate generation scans only the query
    * buckets' dirs of the sign-bucketed store; the exact MaxSim joins
    * the FULL token sets of candidate docs back from the pk-hash
    * `_docs` twin (so pruning never approximates a candidate's score,
    * exactly like the in-memory path) — and because a doc's tokens
    * live together in its ONE `__dbkt` dir there, candidate fetch
    * opens only the candidate pks' bucket dirs instead of re-sweeping
    * the whole token store (the touched-dir collect is bounded by the
    * layout's frozen docBuckets — never by the corpus). The candidate
    * pk semi-join carries NO broadcast hint: its size is
    * pruning-selectivity-dependent (≈ corpus on weakly-clustered
    * tokens), so AQE picks broadcast only when the set is genuinely
    * small instead of failing outright on the degenerate case. */
  def topKPersisted(spark: SparkSession, idx: PersistedTokens,
      docIdCol: String, queryTokens: DataFrame, queryIdCol: String,
      queryTokIdxCol: String, queryVecCol: String, k: Int): DataFrame = {
    val (bits, docBuckets) = readMeta(spark, idx.path)
    ensureDocsTwin(spark, idx.path, docBuckets)
    val qt0 = queryTokens.filter(col(queryVecCol).isNotNull)
      .select(col(queryIdCol).as("query_id"),
        col(queryTokIdxCol).as("__ti"),
        transform(col(queryVecCol), _.cast("double")).as("__qv"))
    requireDim(qt0, "__qv", bits) // before __b: ANSI-safe probe
    val qt = qt0.withColumn("__b", bucket(col("__qv"), bits))
    val bs = qt.select("__b").distinct().collect().map(_.getInt(0)).toSeq
    val cand = spark.read.parquet(idx.path)
      .filter(col("__b").isin(bs: _*))
      .select("__did", "__b")
      .join(broadcast(qt.select("query_id", "__b").distinct()),
        Seq("__b"))
      .select("query_id", "__did").distinct()
    val dbks = cand
      .select(docBucketCol(col("__did"), docBuckets).as("__dbkt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val dt = spark.read.parquet(idx.path + "_docs")
      .filter(col("__dbkt").isin(dbks: _*))
      .select("__did", "__dv")
      .join(cand.select("__did").distinct(), Seq("__did"), "left_semi")
    val scored = cand
      .join(broadcast(qt.select("query_id", "__ti", "__qv")),
        Seq("query_id"))
      .join(dt, Seq("__did"))
      .withColumn("__cos", cosD(col("__qv"), col("__dv")))
      .groupBy("query_id", "__did", "__ti")
      .agg(max(col("__cos")).as("__m"))
      .groupBy("query_id", "__did")
      .agg(aggregate(
        array_sort(collect_list(struct(col("__ti"), col("__m")))),
        lit(0.0), (a, x) => a + x("__m")).as("maxsim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("maxsim").desc, col("__did").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("__did").as(docIdCol),
        col("maxsim"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  /** MaxSim top-k. `docTokens` = one row per (doc, token vector);
    * `queryTokens` = one row per (query, token index, token vector).
    * `bits = 0` disables pruning (single bucket — the exact
    * brute-force reference). Returns (query_id, rank, <docIdCol>,
    * maxsim). */
  def topK(docTokens: DataFrame, docIdCol: String, docVecCol: String,
      queryTokens: DataFrame, queryIdCol: String, queryTokIdxCol: String,
      queryVecCol: String, k: Int, bits: Int = 4): DataFrame = {
    require(bits >= 0 && bits <= 16, s"bits in [0, 16], got $bits")
    val dt0 = docTokens.filter(col(docVecCol).isNotNull)
      .select(col(docIdCol).as("__did"),
        transform(col(docVecCol), _.cast("double")).as("__dv"))
    if (bits > 0) requireDim(dt0, "__dv", bits) // ANSI-safe probe
    val dt = dt0.withColumn("__b", bucket(col("__dv"), bits))
    val qt0 = queryTokens.filter(col(queryVecCol).isNotNull)
      .select(col(queryIdCol).as("query_id"),
        col(queryTokIdxCol).as("__ti"),
        transform(col(queryVecCol), _.cast("double")).as("__qv"))
    if (bits > 0) requireDim(qt0, "__qv", bits) // ANSI-safe probe
    val qt = qt0.withColumn("__b", bucket(col("__qv"), bits))
    // stage 1 — candidate generation: ONE equi-join on the bucket
    // key (query side broadcast: queries × tokens is request-sized)
    val cand = dt.select("__did", "__b")
      .join(broadcast(qt.select("query_id", "__b").distinct()),
        Seq("__b"))
      .select("query_id", "__did").distinct()
    // stage 2 — exact MaxSim over candidate pairs only
    val scored = cand
      .join(broadcast(qt.select("query_id", "__ti", "__qv")),
        Seq("query_id"))
      .join(dt.select("__did", "__dv"), Seq("__did"))
      .withColumn("__cos", cosD(col("__qv"), col("__dv")))
      .groupBy("query_id", "__did", "__ti")
      .agg(max(col("__cos")).as("__m"))
      .groupBy("query_id", "__did")
      .agg(aggregate(
        array_sort(collect_list(struct(col("__ti"), col("__m")))),
        lit(0.0), (a, x) => a + x("__m")).as("maxsim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("maxsim").desc, col("__did").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("__did").as(docIdCol),
        col("maxsim"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }
}

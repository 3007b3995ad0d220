package graft.search

import graft.functions.{Metric, VectorFunctions => VF}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid (keyword + vector) retrieval — the flagship feature of
  * production vector stores (the reference's managed service exposes it
  * as `query_type="HYBRID"` per public Databricks docs; the POC itself
  * only calls the ANN leg, /root/reference/src/databricks/query_endpoint.py:126-146).
  *
  * Both legs and the fusion are plain relational algebra:
  *
  *  - **Keyword leg = BM25 over an inverted-index join.** Postings are
  *    `(term, doc, tf)` rows; scoring a query batch is ONE equi-join of
  *    the postings table with the (tiny, broadcast) query-term list —
  *    never a scan of all docs per query. At 100 TB the postings table
  *    is the inverted index, shuffled once on the term key when built,
  *    and each query batch probes it by key.
  *  - **Vector leg** = the exact/ANN top-n machinery ([[Knn]]; swap in
  *    an [[Ann]] probe for scale — same contract).
  *  - **Fusion = reciprocal-rank fusion** (Cormack et al., SIGIR'09):
  *    rrf(d) = Σ_legs 1/(rrfK + rank_leg(d)) — rank-based, so the two
  *    legs' incomparable score scales never need calibration.
  *
  * Determinism: BM25 per-term contributions are folded in TERM ORDER
  * (sorted array fold, not a float `sum()`), so the per-doc score — and
  * therefore every rank and the fused output — is bit-reproducible on
  * any engine and partitioning; the DuckDB oracle replays both legs and
  * the fusion end to end.
  */
object Hybrid {

  /** BM25 scores for every (query, doc) pair sharing at least one term.
    * Output: (query_id, <docIdCol>, bm25). Standard Robertson/Lucene
    * parameters k1 (tf saturation) and b (length normalization);
    * idf = ln(1 + (N − df + ½)/(df + ½)) ≥ 0. */
  def bm25(corpus: DataFrame, queries: DataFrame,
      queryIdCol: String, queryTextCol: String,
      docIdCol: String, docTextCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val dterms = corpus
      .select(col(docIdCol).as("__did"),
        explode(split(lower(trim(col(docTextCol))), "\\s+")).as("__t"))
      .filter(col("__t") =!= "")
    // tf materialized once — dl, stats, dft and the final join all
    // fold over it instead of re-running the corpus tokenize each
    val tf = dterms.groupBy("__did", "__t").agg(count(lit(1)).as("__tf"))
      .localCheckpoint(true)
    // doc length = Σ_t tf — no second tokenize pass (exact identity)
    val dl = tf.groupBy("__did").agg(sum("__tf").as("__dl"))
    // doc lengths are integers, so the double sum behind avg() is exact
    // (< 2^53) on every partitioning — avgdl is engine-reproducible
    val stats = dl.agg(count(lit(1)).as("__n"), avg("__dl").as("__avgdl"))
    val dft = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
    val qterms = queries
      .select(col(queryIdCol).as("query_id"),
        explode(array_distinct(
          split(lower(trim(col(queryTextCol))), "\\s+"))).as("__t"))
      .filter(col("__t") =!= "")
    // postings ⋈ df on the term key (corpus-side, one shuffle), then the
    // broadcast query-term probe — the inverted-index access path
    val matched = tf.join(dft, "__t").join(dl, "__did")
      .join(broadcast(qterms), "__t")
      .crossJoin(broadcast(stats))
    scoreMatched(matched, docIdCol, k1, b)
  }

  /** BM25 scoring of matched (query, term, doc) rows carrying
    * `__tf`/`__df`/`__dl`/`__n`/`__avgdl` — shared by the in-memory and
    * persisted access paths so their scores are bit-identical by
    * construction. Contributions fold in TERM ORDER (sorted array fold,
    * not a float `sum()`), so the per-doc score is reproducible on any
    * engine and partitioning. */
  private def scoreMatched(matched: DataFrame, docIdCol: String,
      k1: Double, b: Double): DataFrame =
    matched
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) /
          (col("__df") + lit(0.5))))
      .withColumn("__contrib",
        col("__idf") * col("__tf") * (lit(k1) + lit(1.0)) /
          (col("__tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col("query_id"), col("__did"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("__t"), col("__contrib")))),
        lit(0.0), (acc, x) => acc + x("__contrib")).as("bm25"))
      .withColumnRenamed("__did", docIdCol)

  /** One field of a [[bm25f]] corpus: source column, field weight
    * `w_f`, and per-field length-normalization slope `b_f`. */
  final case class Bm25Field(textCol: String, weight: Double, b: Double)

  /** BM25F — the multi-field web-search form of BM25 (Robertson &
    * Zaragoza, "Simple BM25 extension to multiple weighted fields",
    * CIKM 2004; the reference's `query_type=HYBRID` keyword seam
    * generalized to title/body/anchor scoring): each field's term
    * frequency is length-normalized WITHIN its field and scaled by
    * the field weight,
    *
    *   tf̃(t,d) = Σ_f w_f · tf_f(t,d) / B_f,
    *   B_f = (1 − b_f) + b_f · len_f(d)/avglen_f,
    *
    * then saturation applies ONCE over the combined pseudo-frequency
    * — score(q,d) = Σ_t idf(t) · tf̃·(k1+1)/(tf̃ + k1) — which is what
    * distinguishes true BM25F from a naive weighted sum of per-field
    * BM25 scores (saturating per field would let a term spammed
    * across fields re-earn its saturation budget in each). idf is
    * DOCUMENT-level: df counts docs containing the term in ANY
    * field, N counts docs with at least one token in any field.
    *
    * Determinism discipline: the per-field contributions fold in
    * FIELD order and the per-doc score folds in TERM order (sorted
    * array folds, never a float `sum()`), so scores are
    * bit-reproducible on any partitioning and the DuckDB oracle
    * replays them exactly. A single field with weight 1 reduces
    * algebraically to [[bm25]] (spec-pinned).
    *
    * Scale shape: one tokenize + hash-agg per field (map-side
    * partial counts), one (doc, term) merge across fields, the same
    * broadcast query-term probe as [[bm25]] — field count multiplies
    * the posting build, never the query join. */
  def bm25f(corpus: DataFrame, queries: DataFrame,
      queryIdCol: String, queryTextCol: String,
      docIdCol: String, fields: Seq[Bm25Field],
      k1: Double = 1.2): DataFrame = {
    require(fields.nonEmpty, "at least one field")
    val perField = fields.zipWithIndex.map { case (f, i) =>
      val ft = corpus
        .select(col(docIdCol).as("__did"),
          explode(split(lower(trim(col(f.textCol))), "\\s+")).as("__t"))
        .filter(col("__t") =!= "")
      // tf materialized once per field — the length fold, the avg
      // stat and the join below otherwise each re-run the tokenize
      val tf = ft.groupBy("__did", "__t").agg(count(lit(1)).as("__tf"))
        .localCheckpoint(true)
      // field length = Σ_t tf — derived from tf, not a second
      // tokenize pass over the field (exact integer identity)
      val fl = tf.groupBy("__did").agg(sum("__tf").as("__fl"))
      // integer lengths sum exactly (< 2^53): avg is reproducible
      val av = fl.agg(avg("__fl").as("__avgfl"))
      tf.join(fl, "__did").crossJoin(broadcast(av))
        .select(col("__did"), col("__t"), lit(i).as("__f"),
          (lit(f.weight) * col("__tf") /
            (lit(1.0 - f.b) +
              lit(f.b) * col("__fl") / col("__avgfl"))).as("__wtf"))
    }
    // combined pseudo-frequency: fold the ≤ |fields| per-field terms
    // in FIELD order (not a float sum — shuffle-order-proof).
    // Materialized once — dft, the N stat and the final score join
    // all fold over it instead of re-running the three corpus
    // tokenize passes each.
    val combined = perField.reduce(_ unionByName _)
      .groupBy("__did", "__t")
      .agg(aggregate(
        array_sort(collect_list(struct(col("__f"), col("__wtf")))),
        lit(0.0), (acc, x) => acc + x("__wtf")).as("__ctf"))
      .localCheckpoint(true)
    val dft = combined.groupBy("__t").agg(count(lit(1)).as("__df"))
    val nStats = combined.select("__did").distinct()
      .agg(count(lit(1)).as("__n"))
    val qterms = queries
      .select(col(queryIdCol).as("query_id"),
        explode(array_distinct(
          split(lower(trim(col(queryTextCol))), "\\s+"))).as("__t"))
      .filter(col("__t") =!= "")
    combined.join(dft, "__t")
      .join(broadcast(qterms), "__t")
      .crossJoin(broadcast(nStats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) /
          (col("__df") + lit(0.5))))
      .withColumn("__contrib",
        col("__idf") * col("__ctf") * (lit(k1) + lit(1.0)) /
          (col("__ctf") + lit(k1)))
      .groupBy(col("query_id"), col("__did"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("__t"), col("__contrib")))),
        lit(0.0), (acc, x) => acc + x("__contrib")).as("bm25f"))
      .withColumnRenamed("__did", docIdCol)
  }

  // ---- `_docs` discovery sidecar shared by both postings layouts ----

  /** pk-hash dir count of the `(did, tbucket)` discovery sidecar both
    * persisted postings layouts write beside themselves — what bounds
    * a sync's affected-bucket DISCOVERY scan to the changed pks' hash
    * dirs. Without it, discovery semi-joined the changed pks against
    * the FULL layout: column-pruned but O(index) bytes per batch — the
    * read that dominates a small delta batch against a 100 TB index. */
  private[graft] val postingsDocBuckets = 32

  private def pkBucketCol(did: Column): Column =
    pmod(xxhash64(did), lit(postingsDocBuckets.toLong)).cast("int")

  /** Write the discovery sidecar from the layout's posting rows (any
    * relation carrying `__did` and `__tbucket`). */
  private def writeDocsSidecar(postRows: DataFrame, path: String): Unit =
    postRows.select(col("__did"), col("__tbucket")).distinct()
      .withColumn("__dbkt", pkBucketCol(col("__did")))
      .repartition(col("__dbkt"))
      .write.mode("overwrite").partitionBy("__dbkt")
      .parquet(path + "_docs")

  /** One-time migration: a layout persisted before the sidecar existed
    * derives it from the postings (one column-pruned full scan — the
    * legacy discovery cost, paid once instead of every batch). */
  private def ensureDocsSidecar(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path + "_docs")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      writeDocsSidecar(spark.read.parquet(path), path)
  }

  /** The changed pks' OLD term buckets, read from the sidecar pruned
    * to the batch's pk-hash dirs — O(changed-pk buckets) files.
    * `changedPks` carries one `__did` column. Exposed for the
    * HybridSpec file-pruning pin. */
  private[graft] def oldTermBuckets(spark: SparkSession, path: String,
      changedPks: DataFrame, dbks: Seq[Int]): DataFrame =
    spark.read.parquet(path + "_docs")
      .filter(col("__dbkt").isin(dbks: _*))
      .join(changedPks, Seq("__did"), "left_semi")
      .select("__tbucket")

  /** Phase-1 ADDITIVE sidecar write of a sync batch — an APPEND of
    * the batch's new (did, tbucket) pairs BEFORE the postings layout
    * merges, so a crash at any point leaves the sidecar a SUPERSET of
    * the live pairs: a later sync's old-bucket discovery can only
    * list extra affected dirs (harmless rewrites), never miss a dir
    * holding a changed doc's stale postings. The pre-r19 single
    * post-merge write had the opposite crash window — a failure
    * between layout and sidecar left the sidecar missing the batch's
    * pairs, silently retaining stale postings on the next sync. */
  private def appendDocsSidecar(newPost: DataFrame, path: String): Unit =
    newPost.select(col("__did"), col("__tbucket")).distinct()
      .withColumn("__dbkt", pkBucketCol(col("__did")))
      .repartition(col("__dbkt"))
      .write.mode("append").partitionBy("__dbkt")
      .parquet(path + "_docs")

  /** Phase-3 EXACT sidecar trim (after the layout merge): the same
    * anti-join + re-add merge as the layout itself, keyed by the
    * changed pks' hash dirs (new rows' pks ⊆ changed pks, so their
    * dirs ⊆ dbks). The anti-join also removes [[appendDocsSidecar]]'s
    * phase-1 duplicates before re-adding each pair once. */
  private def mergeDocsSidecar(spark: SparkSession, path: String,
      changedPks: DataFrame, newPost: DataFrame, dbks: Seq[Int]): Unit =
    graft.index.PartitionedLayout.mergeOverwrite(spark, path + "_docs",
      Seq("__dbkt"), dbks.map(Seq[Any](_)),
      spark.read.parquet(path + "_docs")
        .filter(col("__dbkt").isin(dbks: _*)),
      Seq("__did"), changedPks,
      newPost.select(col("__did"), col("__tbucket")).distinct()
        .withColumn("__dbkt", pkBucketCol(col("__did"))))

  /** Handle to a [[persistFieldPostings]] layout. */
  final case class PersistedFieldPostings(path: String, buckets: Int)

  /** Persist the MULTI-FIELD inverted index behind [[bm25f]]: one
    * term-bucketed layout of per-field postings
    * `(term, doc, field, tf, field_len, df)` (df is DOCUMENT-level —
    * any field — and denormalized at build like [[persistPostings]]),
    * plus side files freezing the per-field average lengths and the
    * document count. Field WEIGHTS are deliberately NOT frozen:
    * w_f/b_f are query-time relevance knobs (retuning title-vs-body
    * emphasis must not rebuild a 100 TB index), while the corpus
    * statistics that would cost a full pass are frozen. A query
    * batch prunes the scan to its own terms' buckets exactly like
    * the single-field layout. */
  def persistFieldPostings(corpus: DataFrame, docIdCol: String,
      fields: Seq[String], path: String,
      buckets: Int = 64): PersistedFieldPostings = {
    require(fields.nonEmpty, "at least one field")
    val spark = corpus.sparkSession
    import spark.implicits._
    // ONE corpus pass: the caller's corpus lineage is arbitrarily
    // expensive (html parse + anchor harvest here), and everything
    // below re-reads it per field and per derived stat — materialize
    // the narrow projection once, then tokenize from the checkpoint.
    val src = corpus
      .select((col(docIdCol).as("__did") +: fields.map(col)): _*)
      .localCheckpoint(true)
    val perField = fields.zipWithIndex.map { case (fc, i) =>
      val ft = src
        .select(col("__did"),
          explode(split(lower(trim(col(fc))), "\\s+")).as("__t"))
        .filter(col("__t") =!= "")
      val tf = ft.groupBy("__did", "__t").agg(count(lit(1)).as("__tf"))
      // field length = Σ_t tf(t,d) — derived from tf instead of a
      // second tokenize pass over the field (exact integer identity)
      val fl = tf.groupBy("__did").agg(sum("__tf").as("__fl"))
      tf.join(fl, "__did").withColumn("__f", lit(i))
    }
    // postings materialized ONCE: dft, the df join, the sidecar and
    // every frozen stat below all fold over this checkpoint instead
    // of re-tokenizing the corpus per consumer (it is the data being
    // written anyway, so the materialization is index-sized).
    val rows = perField.reduce(_ unionByName _).localCheckpoint(true)
    val dft = rows.select("__did", "__t").distinct()
      .groupBy("__t").agg(count(lit(1)).as("__df"))
    val postRows = rows.join(dft, "__t")
      .withColumn("__tbucket",
        pmod(xxhash64(col("__t")), lit(buckets.toLong)).cast("int"))
    postRows
      .repartition(col("__tbucket"))
      .write.mode("overwrite").partitionBy("__tbucket").parquet(path)
    // (did, tbucket) discovery sidecar: what lets a sync locate a
    // changed doc's old buckets with a pk-pruned lookup instead of a
    // full-layout semi-join. Derived from the checkpointed postings
    // (tbucket is a pure term hash), not the written join output.
    writeDocsSidecar(rows.withColumn("__tbucket",
      pmod(xxhash64(col("__t")), lit(buckets.toLong)).cast("int")), path)
    // the frozen document-level df as its OWN side file (the
    // persistPostings discipline): a term whose last posting a sync
    // deletes keeps its frozen df here, so a later re-insert never
    // scores with df = 0
    dft.write.mode("overwrite").parquet(path + "_df")
    // frozen stats: per-field avg length (integer sums — exact) and
    // the doc count over any field, both folded from the postings
    // checkpoint (__fl is constant per (field, doc): distinct first).
    // A field with ZERO tokens across the corpus has no posting rows
    // — freeze 1.0 (it never scores; mirrors b_f = 0 semantics).
    val avgMap = rows.select("__f", "__did", "__fl").distinct()
      .groupBy("__f").agg(avg("__fl").as("__avgfl"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val avgs = fields.indices.map(i => (i, avgMap.getOrElse(i, 1.0)))
    val n = rows.select("__did").distinct().count()
    avgs.toDF("__f", "__avgfl").coalesce(1)
      .write.mode("overwrite").parquet(path + "_fstats")
    Seq(n).toDF("__n").coalesce(1)
      .write.mode("overwrite").parquet(path + "_stats")
    PersistedFieldPostings(path, buckets)
  }

  /** CDF-batch maintenance of a [[persistFieldPostings]] layout —
    * the multi-field [[syncPersistedPostings]]: ALL corpus statistics
    * stay FROZEN (build-time per-field avg lengths, document-level
    * df, N — the frozen-centroid contract: adding docs never
    * re-weights, rebuild to re-train); a changed doc's postings
    * across EVERY field rewrite together (its old rows anti-joined
    * out of every touched bucket, its new per-field rows taking
    * their term's frozen df, 0 for terms unseen at build), so
    * updates and deletes leave no stale scoring rows. Only touched
    * term-bucket dirs rewrite. */
  def syncPersistedFieldPostings(spark: SparkSession,
      idx: PersistedFieldPostings, changes: DataFrame, docIdCol: String,
      fields: Seq[String]): Unit = {
    import graft.index.ChangeLog
    val layout = spark.read.parquet(idx.path)
    // the changes lineage is arbitrarily expensive (often a filtered
    // corpus scan) and is consumed by every step below — materialize
    // the batch-sized resolved frame once
    val latest = ChangeLog.latestPerPk(changes, docIdCol)
      .localCheckpoint(true)
    val upserts = latest.filter(col("__op") =!= ChangeLog.OpDelete)
      .drop("__op", "__seq")
    val changedPks = latest.select(col(docIdCol).as("__did"))
    val frozenDf = spark.read.parquet(idx.path + "_df")
    val perField = fields.zipWithIndex.map { case (fc, i) =>
      val ft = upserts
        .select(col(docIdCol).as("__did"),
          explode(split(lower(trim(col(fc))), "\\s+")).as("__t"))
        .filter(col("__t") =!= "")
      val tf = ft.groupBy("__did", "__t").agg(count(lit(1)).as("__tf"))
      // field length = Σ_t tf — no second tokenize pass per field
      val fl = tf.groupBy("__did").agg(sum("__tf").as("__fl"))
      tf.join(fl, "__did").withColumn("__f", lit(i))
    }
    // batch-sized; consumed by the affected collect, the sidecar
    // append and both merges — materialize once
    val newPost = perField.reduce(_ unionByName _)
      .join(frozenDf, Seq("__t"), "left")
      .withColumn("__df", coalesce(col("__df"), lit(0L)))
      .withColumn("__tbucket",
        pmod(xxhash64(col("__t")), lit(idx.buckets.toLong)).cast("int"))
      .localCheckpoint(true)
    // affected buckets: any holding a changed doc's OLD postings plus
    // every bucket receiving new rows — driver-small (≤ buckets). Old
    // buckets come from the (did, tbucket) sidecar pruned to the
    // batch's pk-hash dirs, never a semi-join against the full layout.
    ensureDocsSidecar(spark, idx.path)
    val dbks = changedPks.select(pkBucketCol(col("__did")).as("__dbkt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val affected: Seq[Seq[Any]] =
      oldTermBuckets(spark, idx.path, changedPks, dbks)
        .union(newPost.select("__tbucket")).distinct()
        .collect().map(r => Seq[Any](r.getInt(0)))
    appendDocsSidecar(newPost, idx.path) // phase 1: additive, crash-safe
    graft.index.PartitionedLayout.mergeOverwrite(spark, idx.path,
      Seq("__tbucket"), affected,
      layout.filter(graft.index.PartitionedLayout
        .touchedPred(Seq("__tbucket"), affected)),
      Seq("__did"), changedPks, newPost)
    mergeDocsSidecar(spark, idx.path, changedPks, newPost, dbks)
  }

  /** BM25F over a [[persistFieldPostings]] layout — bit-identical
    * scores to [[bm25f]] by construction: the same per-field
    * weighted tf expression over the frozen tf/fl/avgfl, the same
    * field-ordered combine and term-ordered score fold; only the
    * access path changes (term-bucket pruned scan instead of three
    * corpus tokenize passes). `weights(i) = (w_f, b_f)` for field
    * index i as persisted. */
  def bm25fPersisted(spark: SparkSession, idx: PersistedFieldPostings,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      docIdCol: String, weights: Seq[(Double, Double)],
      k1: Double = 1.2): DataFrame = {
    import spark.implicits._
    val qterms = queries
      .select(col(queryIdCol).as("query_id"),
        explode(array_distinct(
          split(lower(trim(col(queryTextCol))), "\\s+"))).as("__t"))
      .filter(col("__t") =!= "")
    val tw = qterms
      .select(col("__t"), pmod(xxhash64(col("__t")),
        lit(idx.buckets.toLong)).cast("int").as("__tbucket"))
      .distinct().collect()
    val terms = tw.map(_.getString(0)).toSeq
    val bs = tw.map(_.getInt(1)).distinct.toSeq
    val fstats = spark.read.parquet(idx.path + "_fstats")
    val nStats = spark.read.parquet(idx.path + "_stats")
    val wdf = weights.zipWithIndex
      .map { case ((w, b), i) => (i, w, b) }
      .toDF("__f", "__w", "__b")
    val postings = spark.read.parquet(idx.path)
      .filter(col("__tbucket").isin(bs: _*) && col("__t").isin(terms: _*))
    val combined = postings
      .join(broadcast(fstats), Seq("__f"))
      .join(broadcast(wdf), Seq("__f"))
      .withColumn("__wtf",
        col("__w") * col("__tf") /
          ((lit(1.0) - col("__b")) +
            col("__b") * col("__fl") / col("__avgfl")))
      .groupBy("__did", "__t")
      .agg(aggregate(
        array_sort(collect_list(struct(col("__f"), col("__wtf")))),
        lit(0.0), (acc, x) => acc + x("__wtf")).as("__ctf"),
        first(col("__df")).as("__df"))
    combined.join(broadcast(qterms), "__t")
      .crossJoin(broadcast(nStats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) /
          (col("__df") + lit(0.5))))
      .withColumn("__contrib",
        col("__idf") * col("__ctf") * (lit(k1) + lit(1.0)) /
          (col("__ctf") + lit(k1)))
      .groupBy(col("query_id"), col("__did"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("__t"), col("__contrib")))),
        lit(0.0), (acc, x) => acc + x("__contrib")).as("bm25f"))
      .withColumnRenamed("__did", docIdCol)
  }

  // ---------------- persisted inverted index ----------------

  /** Handle to a layout persisted by [[persistPostings]]. */
  final case class PersistedPostings(path: String, buckets: Int)

  /** Persist the BM25 inverted index: postings `(term, doc, tf)`
    * denormalized with their term's df and their doc's dl (those joins
    * happen once at build, not per query) and partitioned by term-hash
    * bucket; corpus-level stats (N, avgdl) go to a one-row side file,
    * FREEZING the scoring statistics the way [[Ann.persistIvf]] freezes
    * centroids. A query batch's terms then prune at the file listing —
    * the on-disk inverted-index access path: a query opens only its own
    * terms' posting buckets of a 100 TB index. */
  def persistPostings(corpus: DataFrame, docIdCol: String,
      docTextCol: String, path: String,
      buckets: Int = 64): PersistedPostings = {
    val dterms = corpus
      .select(col(docIdCol).as("__did"),
        explode(split(lower(trim(col(docTextCol))), "\\s+")).as("__t"))
      .filter(col("__t") =!= "")
    // tf materialized ONCE: dl, stats, dft, the denormalize join and
    // the sidecar all fold over this checkpoint instead of re-running
    // the corpus tokenize per consumer
    val tf = dterms.groupBy("__did", "__t").agg(count(lit(1)).as("__tf"))
      .localCheckpoint(true)
    // doc length = Σ_t tf — no second tokenize pass (exact identity)
    val dl = tf.groupBy("__did").agg(sum("__tf").as("__dl"))
    val stats = dl.agg(count(lit(1)).as("__n"), avg("__dl").as("__avgdl"))
    val dft = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
    val postRows = tf.join(dft, "__t").join(dl, "__did")
      .withColumn("__tbucket",
        pmod(xxhash64(col("__t")), lit(buckets.toLong)).cast("int"))
    postRows
      // one writer per bucket dir (the persistSignLsh discipline)
      .repartition(col("__tbucket"))
      .write.mode("overwrite").partitionBy("__tbucket").parquet(path)
    // (did, tbucket) discovery sidecar — pk-pruned old-bucket lookups
    // (tbucket is a pure term hash, derivable from tf alone)
    writeDocsSidecar(tf.withColumn("__tbucket",
      pmod(xxhash64(col("__t")), lit(buckets.toLong)).cast("int")), path)
    stats.coalesce(1).write.mode("overwrite").parquet(path + "_stats")
    // the frozen per-term df as its OWN side file: the authority
    // syncPersistedPostings scores new postings with. Recovering df
    // from the layout instead would lose a term's frozen value the
    // moment a sync deletes its last posting — a later insert of that
    // term would then score with df=0, making results batch-order-
    // dependent (vocabulary-sized, like the layout's own df column)
    dft.write.mode("overwrite").parquet(path + "_df")
    PersistedPostings(path, buckets)
  }

  /** CDF-batch maintenance of a [[persistPostings]] layout — the
    * keyword leg's [[Ann.syncPersistedIvf]]. Scoring statistics stay
    * FROZEN (build-time df/N/avgdl — the frozen-centroid contract:
    * adding docs never re-weights terms, rebuild to re-train); a new or
    * updated doc's postings take their term's frozen df (0 for terms
    * unseen at build), and every bucket holding a changed doc's old
    * postings is rewritten without them — updates and deletes leave no
    * stale scoring rows, no tombstones needed. Only touched term-bucket
    * dirs rewrite (dynamic partition overwrite); a delta batch touches
    * the buckets of its own docs' terms, not the whole index. */
  def syncPersistedPostings(spark: SparkSession, idx: PersistedPostings,
      changes: DataFrame, docIdCol: String, docTextCol: String): Unit = {
    import graft.index.ChangeLog
    val layout = spark.read.parquet(idx.path)
    // materialize the batch-sized resolved frame once — the changes
    // lineage (often a filtered corpus scan) otherwise re-runs for
    // every consumer below
    val latest = ChangeLog.latestPerPk(changes, docIdCol)
      .localCheckpoint(true)
    val upserts = latest.filter(col("__op") =!= ChangeLog.OpDelete)
      .drop("__op", "__seq").filter(col(docTextCol).isNotNull)
    val changedPks = latest.select(col(docIdCol).as("__did"))
    val dterms = upserts
      .select(col(docIdCol).as("__did"),
        explode(split(lower(trim(col(docTextCol))), "\\s+")).as("__t"))
      .filter(col("__t") =!= "")
    val tf = dterms.groupBy("__did", "__t").agg(count(lit(1)).as("__tf"))
    // doc length = Σ_t tf — no second tokenize pass
    val dl = tf.groupBy("__did").agg(sum("__tf").as("__dl"))
    // frozen per-term df from the build-time side file (NOT recovered
    // from the layout: a term whose last posting was deleted by an
    // earlier sync is gone from the layout but keeps its frozen df
    // here); terms unseen at build take df = 0
    val frozenDf = spark.read.parquet(idx.path + "_df")
    // batch-sized; consumed by the affected collect, the sidecar
    // append and both merges — materialize once
    val newPost = tf.join(dl, "__did")
      .join(frozenDf, Seq("__t"), "left")
      .withColumn("__df", coalesce(col("__df"), lit(0L)))
      .withColumn("__tbucket",
        pmod(xxhash64(col("__t")), lit(idx.buckets.toLong)).cast("int"))
      .localCheckpoint(true)
    // affected buckets: any holding a changed doc's OLD postings, plus
    // every bucket receiving new rows — driver-small (≤ buckets). Old
    // buckets come from the (did, tbucket) sidecar pruned to the
    // batch's pk-hash dirs, never a semi-join against the full layout.
    ensureDocsSidecar(spark, idx.path)
    val dbks = changedPks.select(pkBucketCol(col("__did")).as("__dbkt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val affected: Seq[Seq[Any]] =
      oldTermBuckets(spark, idx.path, changedPks, dbks)
        .union(newPost.select("__tbucket")).distinct()
        .collect().map(r => Seq[Any](r.getInt(0)))
    appendDocsSidecar(newPost, idx.path) // phase 1: additive, crash-safe
    // shared merge-overwrite skeleton — graft.index.PartitionedLayout
    graft.index.PartitionedLayout.mergeOverwrite(spark, idx.path,
      Seq("__tbucket"), affected,
      layout.filter(graft.index.PartitionedLayout
        .touchedPred(Seq("__tbucket"), affected)),
      Seq("__did"), changedPks, newPost)
    mergeDocsSidecar(spark, idx.path, changedPks, newPost, dbks)
  }

  /** BM25 over a [[persistPostings]] layout — same output contract and
    * bit-identical scores as [[bm25]] (shared [[scoreMatched]], frozen
    * build-time stats). The query batch's distinct (term, bucket) pairs
    * are collected (tiny by contract: queries × short query texts) and
    * become the partition IN-list + pushed term filter that prune the
    * posting scan to the queries' own buckets. */
  def bm25Persisted(spark: SparkSession, idx: PersistedPostings,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      docIdCol: String, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qterms = queries
      .select(col(queryIdCol).as("query_id"),
        explode(array_distinct(
          split(lower(trim(col(queryTextCol))), "\\s+"))).as("__t"))
      .filter(col("__t") =!= "")
    val tw = qterms
      .select(col("__t"), pmod(xxhash64(col("__t")),
        lit(idx.buckets.toLong)).cast("int").as("__tbucket"))
      .distinct().collect()
    val terms = tw.map(_.getString(0)).toSeq
    val bs = tw.map(_.getInt(1)).distinct.toSeq
    val stats = spark.read.parquet(idx.path + "_stats")
    val postings = spark.read.parquet(idx.path)
      .filter(col("__tbucket").isin(bs: _*) && col("__t").isin(terms: _*))
    val matched = postings.join(broadcast(qterms), "__t")
      .crossJoin(broadcast(stats))
    scoreMatched(matched, docIdCol, k1, b)
  }

  /** Generic RRF fusion of ANY per-query rankings — each leg a DataFrame
    * of (query_id, <idCol>, rank). This is how ANN legs plug into hybrid
    * retrieval: feed [[Ann.queryIvf]] / [[GraphAnn.queryGraph]] output as
    * the vector leg next to a [[bm25]] ranking (or a third recency leg —
    * RRF composes any number). Docs absent from a leg contribute 0. */
  def rrfFuse(legs: Seq[DataFrame], idCol: String, k: Int,
      rrfK: Int = 60): DataFrame = {
    require(legs.nonEmpty, "at least one leg")
    val contribs = legs.zipWithIndex.map { case (l, i) =>
      l.select(col("query_id"), col(idCol),
        (lit(1.0) / (lit(rrfK) + col("rank"))).as(s"__c$i"))
    }
    val joined = contribs.reduce((a, b) =>
      a.join(b, Seq("query_id", idCol), "full_outer"))
    val total = contribs.indices
      .map(i => coalesce(col(s"__c$i"), lit(0.0)))
      .reduce(_ + _)
    val w = Window.partitionBy("query_id")
      .orderBy(col("__rrf").desc, col(idCol).asc)
    joined.withColumn("__rrf", total)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  /** Hybrid top-k: vector top-n ∪ BM25 top-n per query, fused by RRF,
    * exact top-k of the fused score. Output
    * (query_id, rank, <docIdCol>, in_vec, in_kw) — the booleans say
    * which leg(s) retrieved the doc, standard hybrid-search telemetry.
    * A doc missing from a leg contributes 0 from that leg (classic RRF;
    * no score calibration anywhere). */
  def hybridTopK(corpus: DataFrame, queries: DataFrame,
      queryIdCol: String, queryTextCol: String, queryVecCol: String,
      docIdCol: String, docTextCol: String, docVecCol: String,
      n: Int, k: Int, rrfK: Int = 60,
      k1: Double = 1.2, b: Double = 0.75,
      metric: Metric = Metric.Cosine): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(queryTextCol).as("__qtext"), col(queryVecCol).as("__qvec"))
    val kw = bm25(corpus, q, "query_id", "__qtext", docIdCol, docTextCol,
      k1, b)
    fuseVecKw(vectorLeg(corpus, q, docIdCol, docVecCol, n, metric),
      kwLeg(kw, docIdCol, n), docIdCol, k, rrfK)
  }

  /** [[hybridTopK]] with the keyword leg served from a
    * [[persistPostings]] layout — identical output by construction
    * (shared legs + fusion, bit-identical BM25), but the keyword side
    * reads only the query terms' posting buckets instead of rebuilding
    * the inverted index per batch. */
  /** `rowFilter` is the metadata-filter parameter with the PRE-rank
    * semantics of [[graft.search.Ann.queryPersistedIvf]]: the predicate
    * restricts BOTH legs BEFORE their per-leg top-n (vector leg — the
    * filter pushes into the corpus scan; keyword leg — BM25 scores from
    * the frozen postings are semi-joined to the eligible ids before
    * ranking), so every fused rank is computed among matching docs
    * only. Scoring stats stay frozen at build time, unfiltered — the
    * same contract as filtered search over any pre-built index. */
  def hybridTopKPersistedKw(spark: SparkSession, idx: PersistedPostings,
      corpus: DataFrame, queries: DataFrame,
      queryIdCol: String, queryTextCol: String, queryVecCol: String,
      docIdCol: String, docVecCol: String,
      n: Int, k: Int, rrfK: Int = 60,
      k1: Double = 1.2, b: Double = 0.75,
      metric: Metric = Metric.Cosine,
      rowFilter: Option[Column] = None): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(queryTextCol).as("__qtext"), col(queryVecCol).as("__qvec"))
    val eligible = rowFilter.map(corpus.filter)
    val vCorpus = eligible.getOrElse(corpus)
    val kwAll = bm25Persisted(spark, idx, q, "query_id", "__qtext",
      docIdCol, k1, b)
    val kw = eligible
      .map(e => kwAll.join(e.select(col(docIdCol)), Seq(docIdCol),
        "left_semi"))
      .getOrElse(kwAll)
    fuseVecKw(vectorLeg(vCorpus, q, docIdCol, docVecCol, n, metric),
      kwLeg(kw, docIdCol, n), docIdCol, k, rrfK)
  }

  /** Exact vector top-n per query (swap in an [[Ann]] probe at scale). */
  private def vectorLeg(corpus: DataFrame, q: DataFrame, docIdCol: String,
      docVecCol: String, n: Int, metric: Metric): DataFrame = {
    val wv = Window.partitionBy("query_id")
      .orderBy(Knn.scoreOrder(col("__score"), metric), col("__did").asc)
    corpus.filter(col(docVecCol).isNotNull)
      .select(col(docIdCol).as("__did"), col(docVecCol).as("__dvec"))
      .crossJoin(broadcast(q.select("query_id", "__qvec")))
      .withColumn("__score", VF.distance(col("__dvec"), col("__qvec"), metric))
      .withColumn("__rv", row_number().over(wv))
      .filter(col("__rv") <= n)
      .select("query_id", "__did", "__rv")
  }

  private def kwLeg(bm25Scores: DataFrame, docIdCol: String,
      n: Int): DataFrame = {
    val wb = Window.partitionBy("query_id")
      .orderBy(col("bm25").desc, col("__did").asc)
    bm25Scores.withColumnRenamed(docIdCol, "__did")
      .withColumn("__rb", row_number().over(wb))
      .filter(col("__rb") <= n)
      .select("query_id", "__did", "__rb")
  }

  private def fuseVecKw(vec: DataFrame, kw: DataFrame, docIdCol: String,
      k: Int, rrfK: Int): DataFrame = {
    val fused = vec.join(kw, Seq("query_id", "__did"), "full_outer")
      .withColumn("__rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("__rv")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("__rb")), lit(0.0)))
    val wf = Window.partitionBy("query_id")
      .orderBy(col("__rrf").desc, col("__did").asc)
    fused.withColumn("rank", row_number().over(wf))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("__did").as(docIdCol),
        col("__rv").isNotNull.as("in_vec"), col("__rb").isNotNull.as("in_kw"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }
}

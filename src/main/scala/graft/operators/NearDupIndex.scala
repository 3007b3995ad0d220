package graft.operators

import graft.functions.TextExpressions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Handle to a [[NearDupIndex.persist]] layout. The LSH parameters are
  * part of the layout's identity: a probe MUST hash with the exact
  * build-time (k, bands, n, algo) or its bucket keys miss every
  * posting, so they persist in `_meta` and load back with the handle. */
final case class PersistedNearDup(path: String, k: Int, bands: Int,
    n: Int, algo: String, buckets: Int)

/** Persisted MinHash-LSH near-duplicate index — the INCREMENTAL form of
  * [[Dedup.minhashLshPairs]]: that operator answers "dedup this corpus
  * once"; this one answers the shape a production ingest actually has —
  * "here is today's batch; which documents are near-dups of the
  * 100 TB corpus we already hold?" — without rescanning the corpus.
  *
  * Layout (mirrors [[graft.search.Ann.persistIvf]]'s discipline):
  *   - `path`        — band-bucket postings `(band, bucket, id)`,
  *     partitioned by `__bkt` = hash(band, bucket) % buckets, so a
  *     delta's bucket keys prune at the FILE LISTING: a batch opens
  *     the handful of posting dirs its own shingles hash into, never
  *     the whole index.
  *   - `path_docs`   — per-doc distinct shingle sets `(id, sh)`
  *     partitioned by id-hash (`__dbkt`), the refine side and the
  *     authority for locating a changed doc's old postings at sync.
  *   - `path_meta`   — one row of LSH parameters.
  *
  * The delta probe is: band the batch (in memory), prune the posting
  * scan to the batch's `__bkt` dirs (driver-bounded: ≤ `buckets`
  * values), equi-join on (band, bucket), then exact-Jaccard refine
  * against `_docs` — one bounded-pruned scan + two equi-join shuffles,
  * never batch × corpus. With `algo = "md5"` every stage is plain-SQL
  * reproducible, so the whole persisted path is DuckDB-oracle-checked;
  * "xx" (xxhash64) stays the 100 TB default. */
object NearDupIndex {

  private def sigCol(algo: String, k: Int): Column =
    if (algo == "md5") TextExpressions.minhashSigMd5(col("sh"), k)
    else TextExpressions.minhashSig(col("sh"), k)

  private def bucketOf(algo: String): Column => Column =
    if (algo == "md5") sl => md5(concat_ws("|", sl))
    else sl => hash(sl).cast("string")

  /** `(id, sh)` → `(id, band, bucket, __bkt)` with the index's exact
    * banding (identical to [[Dedup.minhashLshPairs]]'s stages). */
  private def banded(sh: DataFrame, k: Int, bands: Int, algo: String,
      buckets: Int): DataFrame = {
    val rowsPerBand = k / bands
    sh.withColumn("sig", sigCol(algo, k))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => bucketOf(algo)(
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
          .as(Seq("band", "bucket")))
      .withColumn("__bkt",
        pmod(xxhash64(col("band"), col("bucket")), lit(buckets.toLong))
          .cast("int"))
  }

  /** Build and persist the index over `docs`. */
  def persist(docs: DataFrame, idCol: String, textCol: String,
      path: String, k: Int = 16, bands: Int = 4, n: Int = 3,
      algo: String = "xx", buckets: Int = 32): PersistedNearDup = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = Dedup.withShingles(docs, idCol, textCol, n)
      .filter(size(col("sh")) > 0)
      .localCheckpoint(true) // feeds postings AND _docs: compute once
    // the two tables land on disjoint paths — write them concurrently
    // (max instead of sum of the two write jobs)
    graft.index.PartitionedLayout.inParallel(
      banded(sh, k, bands, algo, buckets)
        .repartition(col("__bkt")) // one writer per posting dir
        .write.mode("overwrite").partitionBy("__bkt").parquet(path),
      sh.withColumn("__dbkt",
          pmod(xxhash64(col("id")), lit(buckets.toLong)).cast("int"))
        .repartition(col("__dbkt"))
        .write.mode("overwrite").partitionBy("__dbkt")
        .parquet(path + "_docs"))
    Seq((k, bands, n, algo, buckets))
      .toDF("k", "bands", "n", "algo", "buckets").coalesce(1)
      .write.mode("overwrite").parquet(path + "_meta")
    PersistedNearDup(path, k, bands, n, algo, buckets)
  }

  /** Merge N shard indexes (each a [[persist]] over one corpus shard,
    * SAME parameters) into one index at `destPath` by FILE MOVES —
    * postings and `_docs` dirs both, zero bytes rewritten
    * ([[graft.index.PartitionedLayout.moveMerge]]). Every persisted
    * column (shingles, signatures, band buckets, dir hashes) is a pure
    * per-row function of (text, k, bands, n, algo, buckets), so shard
    * layouts partition the row space and their union IS the full
    * build. This is the 100-TB dedup BOOTSTRAP: the corpus fans out
    * into independent shard builds (each one shingle+banding pass, no
    * global shuffle), and the merge is O(files) metadata ops. Guard:
    * every shard's persisted `_meta` must equal the first's — probing
    * an index whose shards banded differently silently loses pairs.
    * Shard roots are consumed. */
  def mergeShards(spark: SparkSession, shardPaths: Seq[String],
      destPath: String): PersistedNearDup = {
    require(shardPaths.nonEmpty, "mergeShards needs >= 1 shard")
    import graft.index.PartitionedLayout
    import org.apache.hadoop.fs.Path
    val fs = new Path(destPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def metaOf(p: String) = spark.read.parquet(p + "_meta").head()
    val ref = metaOf(shardPaths.head)
    shardPaths.tail.foreach { p =>
      require(metaOf(p) == ref,
        s"shard $p was built with different parameters than " +
          s"${shardPaths.head} (k/bands/n/algo/buckets must match)")
    }
    PartitionedLayout.inParallel(
      PartitionedLayout.moveMerge(spark, shardPaths, destPath, depth = 1),
      PartitionedLayout.moveMerge(spark, shardPaths.map(_ + "_docs"),
        destPath + "_docs", depth = 1))
    fs.delete(new Path(destPath + "_meta"), true)
    fs.rename(new Path(shardPaths.head + "_meta"),
      new Path(destPath + "_meta"))
    shardPaths.tail.foreach(p => fs.delete(new Path(p + "_meta"), true))
    PersistedNearDup(destPath, ref.getAs[Int]("k"),
      ref.getAs[Int]("bands"), ref.getAs[Int]("n"),
      ref.getAs[String]("algo"), ref.getAs[Int]("buckets"))
  }

  /** Re-open a persisted index by path (parameters from `_meta`). */
  def load(spark: SparkSession, path: String): PersistedNearDup = {
    val m = spark.read.parquet(path + "_meta").head()
    PersistedNearDup(path, m.getAs[Int]("k"), m.getAs[Int]("bands"),
      m.getAs[Int]("n"), m.getAs[String]("algo"), m.getAs[Int]("buckets"))
  }

  /** Near-duplicate pairs between `delta` and the persisted corpus:
    * `(corpus_id, delta_id, jaccard)` for exact Jaccard ≥ `threshold`
    * among band-bucket collisions. A doc present on both sides (a
    * re-ingest) never pairs with itself. Anti-join `delta` on
    * `delta_id` to keep only novel documents. */
  /** `maxBucket` mirrors [[Dedup.minhashLshPairs]]'s hot-bucket guard:
    * posting buckets holding more than `maxBucket` corpus docs are
    * skipped during candidate generation (explicit recall trade for
    * viral-duplicate clusters; `None` keeps exact semantics). */
  def nearDupsAgainst(spark: SparkSession, idx: PersistedNearDup,
      delta: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxBucket: Option[Int] = None): DataFrame = {
    val sh = Dedup.withShingles(delta, idCol, textCol, idx.n)
      .filter(size(col("sh")) > 0)
      .localCheckpoint(true) // banding + refine both consume it
    val dBanded = banded(sh, idx.k, idx.bands, idx.algo, idx.buckets)
      .withColumnRenamed("id", "delta_id")
    // the batch's posting dirs — driver-bounded by `buckets`
    val bks = dBanded.select("__bkt").distinct().collect()
      .map(_.getInt(0)).toSeq
    val pruned = spark.read.parquet(idx.path)
      .filter(col("__bkt").isin(bks: _*)) // partition pruning
    val postings = maxBucket match {
      case None => pruned
      case Some(cap) =>
        val hot = pruned.groupBy("band", "bucket")
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") > cap).select("band", "bucket")
        pruned.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    }
    val cand = postings.join(dBanded, Seq("band", "bucket", "__bkt"))
      .filter(col("id") =!= col("delta_id"))
      .select(col("id").as("corpus_id"), col("delta_id")).distinct()
    val refined = cand
      .join(spark.read.parquet(idx.path + "_docs")
        .select(col("id").as("corpus_id"), col("sh").as("a_sh")),
        Seq("corpus_id"))
      .join(sh.select(col("id").as("delta_id"), col("sh").as("b_sh")),
        Seq("delta_id"))
    Dedup.jaccardStaged(
        refined.select(col("corpus_id").as("a_id"),
          col("delta_id").as("b_id"), col("a_sh"), col("b_sh")),
        threshold)
      .select(col("a_id").as("corpus_id"), col("b_id").as("delta_id"),
        col("jaccard"))
  }

  /** The full admission decision for one ingest batch — the per-batch
    * body of [[graft.streaming.DedupIngest]], fused so the batch is
    * shingled ONCE and banded ONCE for all three stages (the separate
    * probe + sweep calls each re-ran both): (1) exact first-wins by
    * content hash, (2) reject near-dups of the CURRENT index contents
    * (partition-pruned posting probe), (3) optional intra-batch sweep —
    * LSH pair self-join over the survivors' ALREADY-COMPUTED bands,
    * connected components, min-id member per group admitted. The sweep
    * skips the component closure entirely when the batch has no pairs
    * (the common case), saving its iterative jobs. Returns the admitted
    * rows of `batch` (original columns). */
  def admitBatch(spark: SparkSession, idx: PersistedNearDup,
      batch: DataFrame, idCol: String, textCol: String,
      threshold: Double, intraBatch: Boolean = true,
      maxBucket: Option[Int] = None): DataFrame = {
    val exact = Dedup.exactFirstWins(
        batch.withColumn("__xh", md5(col(textCol))), Seq("__xh"), idCol)
      .drop("__xh")
      .localCheckpoint(true) // probe anti-join + sweep + result consume it
    val sh = Dedup.withShingles(exact, idCol, textCol, idx.n)
      .filter(size(col("sh")) > 0)
      .localCheckpoint(true) // banding + both refine legs consume it
    val dBanded = banded(sh, idx.k, idx.bands, idx.algo, idx.buckets)
      .withColumnRenamed("id", "delta_id")
      .localCheckpoint(true) // bucket list + probe join + self-join ×2
    val bks = dBanded.select("__bkt").distinct().collect()
      .map(_.getInt(0)).toSeq // driver-bounded by `buckets`
    val pruned = spark.read.parquet(idx.path)
      .filter(col("__bkt").isin(bks: _*)) // partition pruning
    val postings = maxBucket match {
      case None => pruned
      case Some(cap) =>
        val hot = pruned.groupBy("band", "bucket")
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") > cap).select("band", "bucket")
        pruned.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    }
    val cand = postings.join(dBanded, Seq("band", "bucket", "__bkt"))
      .filter(col("id") =!= col("delta_id"))
      .select(col("id").as("corpus_id"), col("delta_id")).distinct()
    val refined = cand
      .join(spark.read.parquet(idx.path + "_docs")
        .select(col("id").as("corpus_id"), col("sh").as("a_sh")),
        Seq("corpus_id"))
      .join(sh.select(col("id").as("delta_id"), col("sh").as("b_sh")),
        Seq("delta_id"))
    val flagged = Dedup.jaccardStaged(
        refined.select(col("corpus_id").as("a_id"),
          col("delta_id").as("b_id"), col("a_sh"), col("b_sh")),
        threshold)
      .select(col("b_id").as(idCol)).distinct()
    val kept = exact.join(flagged, Seq(idCol), "left_anti")
    if (!intraBatch) kept
    else {
      val kc = kept.localCheckpoint(true) // pair join + anti-join
      val kIds = kc.select(col(idCol).as("delta_id"))
      // intra-batch candidates from the SAME banding the probe used —
      // a (band, bucket) self-join over the survivors' bands, identical
      // to a fresh Dedup.minhashLshPairs over the survivors
      val kb = dBanded.join(kIds, Seq("delta_id"), "left_semi")
      val pairCand = kb
        .select(col("band"), col("bucket"), col("delta_id").as("a_id"))
        .join(kb.select(col("band"), col("bucket"),
          col("delta_id").as("b_id")), Seq("band", "bucket"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
      val pairs = Dedup.jaccardStaged(
          pairCand
            .join(sh.select(col("id").as("a_id"), col("sh").as("a_sh")),
              Seq("a_id"))
            .join(sh.select(col("id").as("b_id"), col("sh").as("b_sh")),
              Seq("b_id"))
            .select(col("a_id"), col("b_id"), col("a_sh"), col("b_sh")),
          threshold)
        .localCheckpoint(true)
      if (pairs.isEmpty) kc
      else {
        val losers = Dedup.connectedComponents(pairs, "a_id", "b_id")
          .filter(col("id") =!= col("component"))
          .select(col("id").as(idCol))
        kc.join(losers, Seq(idCol), "left_anti")
      }
    }
  }

  /** Fused admission + layout merge for one INSERT-ONLY ingest batch —
    * the per-batch body of [[graft.streaming.DedupIngest]]. Semantics
    * are exactly [[admitBatch]] followed by [[sync]] over the admitted
    * rows (the `ingest_neardup_pipeline`/`_multifile` oracles gate it);
    * what differs is the per-batch FIXED cost, the term that dominates
    * a micro-batch stream:
    *
    *  - the batch is shingled and banded ONCE for admission AND merge
    *    (the unfused sync re-shingled and re-banded the admitted rows
    *    from scratch, checkpoints included);
    *  - duplicate ids in a batch collapse deterministically up front
    *    (min content hash wins) instead of via `latestPerPk` at merge
    *    time, and the batch's intra-sweep pair graph closes with a
    *    driver union-find below a cap ([[Dedup.componentsAuto]])
    *    instead of the fixed-latency pointer-jumping rounds;
    *  - a FRESH batch (no admitted id present in either table — a
    *    one-probe check reusing the admission's pruned scans) APPENDS
    *    its rows as new files in the touched dirs: no current-rows
    *    read, no pre-write checkpoint, no whole-dir rewrite. A batch
    *    whose ids already exist (crash replay, or a re-ingest of a
    *    live id) takes the full anti-join merge-overwrite, preserving
    *    the self-repair contract. Appended files accumulate one per
    *    touched dir per batch; a periodic [[sync]] (or rebuild) is the
    *    compaction pass, same as any LSM-ish ingest layout.
    *
    * Returns the admitted rows of `batch`. */
  def admitAndSync(spark: SparkSession, idx: PersistedNearDup,
      batch: DataFrame, idCol: String, textCol: String,
      threshold: Double, intraBatch: Boolean = true,
      maxBucket: Option[Int] = None): DataFrame = {
    import graft.index.PartitionedLayout
    // ONE materialization carries the exact-dedup rows AND their
    // shingle sets (previously two chained checkpoints — a full
    // fixed-latency action saved per micro-batch); `exact` and `sh`
    // are lazy projections of it
    val withSh = Dedup.exactFirstWins(
        Dedup.exactFirstWins(
          batch.withColumn("__xh", md5(col(textCol))), Seq("__xh"), idCol),
        Seq(idCol), "__xh") // duplicate ids collapse: min content hash
      .drop("__xh")
      .withColumn("__sh", Dedup.shingles(col(textCol), idx.n))
      .localCheckpoint(true)
    val exact = withSh.drop("__sh")
    val sh = withSh.select(col(idCol).as("id"), col("__sh").as("sh"))
      .filter(size(col("sh")) > 0)
    val dBanded = banded(sh, idx.k, idx.bands, idx.algo, idx.buckets)
      .withColumnRenamed("id", "delta_id")
      .localCheckpoint(true) // bucket list + probe + self-join + merge
    val bks = dBanded.select("__bkt").distinct().collect()
      .map(_.getInt(0)).toSeq // bounded by `buckets`
    val pruned = spark.read.parquet(idx.path)
      .filter(col("__bkt").isin(bks: _*)) // partition pruning
    val postings = maxBucket match {
      case None => pruned
      case Some(cap) =>
        val hot = pruned.groupBy("band", "bucket")
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") > cap).select("band", "bucket")
        pruned.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
    }
    val docsTable = spark.read.parquet(idx.path + "_docs")
    val cand = postings.join(dBanded, Seq("band", "bucket", "__bkt"))
      .filter(col("id") =!= col("delta_id"))
      .select(col("id").as("corpus_id"), col("delta_id")).distinct()
    val refined = cand
      .join(docsTable
        .select(col("id").as("corpus_id"), col("sh").as("a_sh")),
        Seq("corpus_id"))
      .join(sh.select(col("id").as("delta_id"), col("sh").as("b_sh")),
        Seq("delta_id"))
    val flagged = Dedup.jaccardStaged(
        refined.select(col("corpus_id").as("a_id"),
          col("delta_id").as("b_id"), col("a_sh"), col("b_sh")),
        threshold)
      .select(col("b_id").cast("long").as("a"))
      .distinct()
    // ONE fused collect carries the cross-corpus rejections AND (when
    // sweeping) the intra-batch candidate pairs; the pair graph closes
    // driver-side and every later frame anti-joins the resulting LOCAL
    // blocklist — a broadcast of driver data builds with NO job, so
    // this replaces the old kept-twice materialization (probe chain
    // re-run for the pair collect and again for the admitted
    // checkpoint) and its per-join broadcast-build jobs. Driver state
    // is O(rejections + candidate pairs) LONGS, bounded by the
    // admission-controlled batch — the same economics as
    // componentsAuto's capped fast path (unbounded one-shot batches
    // use admitBatch + sync, which keep the distributed closure).
    // Intra pairs are computed among ALL shingled batch survivors and
    // filtered to unflagged endpoints driver-side — identical to
    // pairing only the kept rows, without making the pair plan depend
    // on (and re-run) the probe chain.
    val collected: Array[org.apache.spark.sql.Row] =
      if (!intraBatch)
        flagged.withColumn("b", lit(null).cast("long")).collect()
      else {
        val pairCand = dBanded
          .select(col("band"), col("bucket"), col("delta_id").as("a_id"))
          .join(dBanded.select(col("band"), col("bucket"),
            col("delta_id").as("b_id")), Seq("band", "bucket"))
          .filter(col("a_id") < col("b_id"))
          .select("a_id", "b_id").distinct()
        val pairs = Dedup.jaccardStaged(
            pairCand
              .join(sh.select(col("id").as("a_id"), col("sh").as("a_sh")),
                Seq("a_id"))
              .join(sh.select(col("id").as("b_id"), col("sh").as("b_sh")),
                Seq("b_id"))
              .select(col("a_id"), col("b_id"), col("a_sh"), col("b_sh")),
            threshold)
        flagged.withColumn("b", lit(null).cast("long"))
          .unionByName(pairs.select(col("a_id").cast("long").as("a"),
            col("b_id").cast("long").as("b")))
          .collect()
      }
    val flaggedIds = collected.filter(_.isNullAt(1))
      .map(_.getLong(0)).toSet
    val edges = collected.filter(r => !r.isNullAt(1))
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => !flaggedIds(a) && !flaggedIds(b) }
    val losers = Dedup.unionFindComponents(edges)
      .collect { case (id, comp) if id != comp => id }
    val rejected = (flaggedIds ++ losers).toSeq.sorted
    import spark.implicits._
    val idType = exact.schema(idCol).dataType
    val blocklist = broadcast(
      rejected.toDF("__rid").select(col("__rid").cast(idType).as(idCol)))
    // admitted no longer reads the layout (the blocklist is local), so
    // no pre-write checkpoint is needed: the plan under it is the
    // already-pinned withSh checkpoint
    val admitted = exact.join(blocklist, Seq(idCol), "left_anti")
    val admittedIds = admitted.select(col(idCol).as("id"))
    val newSh = sh.join(
      broadcast(rejected.toDF("id").select(col("id").cast(idType).as("id"))),
      Seq("id"), "left_anti")
    val newPost = dBanded
      .join(broadcast(rejected.toDF("delta_id")
        .select(col("delta_id").cast(idType).as("delta_id"))),
        Seq("delta_id"), "left_anti")
      .withColumnRenamed("delta_id", "id")
    val dbks = admittedIds
      .select(pmod(xxhash64(col("id")), lit(idx.buckets.toLong))
        .cast("int").as("__dbkt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val newDocs = newSh.withColumn("__dbkt",
      pmod(xxhash64(col("id")), lit(idx.buckets.toLong)).cast("int"))
    if (dbks.nonEmpty) {
      // one existence probe over the already-pruned scans answers "is
      // any admitted id present in either table" — old _docs rows, OR
      // postings orphaned by a crash between the two table writes
      val docsHit = docsTable.filter(col("__dbkt").isin(dbks: _*))
        .join(admittedIds, Seq("id"), "left_semi")
      val replay = docsHit.select(lit(1).as("x")).limit(1)
        .union(pruned.join(admittedIds, Seq("id"), "left_semi")
          .select(lit(1).as("x")).limit(1))
        .collect().nonEmpty
      if (!replay) {
        // fresh batch: append new files into the touched dirs — no
        // current-rows read, no pre-write checkpoint, no dir rewrite;
        // the two tables' appends run concurrently (disjoint paths)
        graft.index.PartitionedLayout.inParallel(
          newPost.repartition(col("__bkt"))
            .write.mode("append").partitionBy("__bkt").parquet(idx.path),
          newDocs.repartition(col("__dbkt"))
            .write.mode("append").partitionBy("__dbkt")
            .parquet(idx.path + "_docs"))
      } else {
        // replay / live-id re-ingest: full anti-join merge of the
        // touched dirs (idempotent — the self-repair contract)
        val oldPost = banded(docsHit.select("id", "sh"),
          idx.k, idx.bands, idx.algo, idx.buckets)
        val tagged = oldPost.select(col("__bkt"))
          .union(pruned.join(admittedIds, Seq("id"), "left_semi")
            .select(col("__bkt")))
          .union(newPost.select(col("__bkt")))
          .distinct().collect()
        val affected: Seq[Seq[Any]] =
          tagged.map(_.getInt(0)).distinct.map(Seq[Any](_))
        val current = spark.read.parquet(idx.path)
          .filter(PartitionedLayout.touchedPred(Seq("__bkt"), affected))
        PartitionedLayout.mergeOverwrite(spark, idx.path, Seq("__bkt"),
          affected, current, Seq("id"), admittedIds, newPost)
        val dcur = docsTable.filter(col("__dbkt").isin(dbks: _*))
        PartitionedLayout.mergeOverwrite(spark, idx.path + "_docs",
          Seq("__dbkt"), dbks.map(Seq[Any](_)), dcur, Seq("id"),
          admittedIds, newDocs)
      }
    }
    admitted
  }

  /** CDF-batch maintenance — the dedup index's
    * [[graft.search.Ann.syncPersistedIvf]]: last-write-wins per pk,
    * deletes and null/shingle-less upserts leave the index. A changed
    * doc's OLD postings are located by re-banding its stored shingle
    * set from `_docs` (a pk lookup pruned to the batch's id-hash dirs),
    * so only touched posting dirs rewrite. Idempotent under replay
    * (anti-join by id, then re-add), which makes
    * [[graft.streaming.IndexSync.layoutSync]] effectively exactly-once
    * over it.
    *
    * Crash contract: the postings dirs and the `_docs` dirs are
    * rewritten as two separate jobs, NOT atomically. A crash between
    * them leaves postings without their refine rows; the layout
    * self-repairs only when the SAME batch is replayed (the anti-join
    * re-merge). Under [[graft.streaming.IndexSync.layoutSync]]'s
    * checkpointed at-least-once delivery that replay is guaranteed; a
    * one-shot batch caller must re-run sync with the same `changes` on
    * failure or accept an inconsistent layout. */
  def sync(spark: SparkSession, idx: PersistedNearDup, changes: DataFrame,
      idCol: String, textCol: String): Unit = {
    import graft.index.ChangeLog
    // materialize the change batch BEFORE touching the layout: a caller
    // may derive `changes` from a probe of THIS index (the DedupIngest
    // admission filter does), and a lazy plan holding the pre-write
    // file listing would re-execute against deleted files once the
    // postings dirs are overwritten below
    val latest = ChangeLog.latestPerPk(changes, idCol).localCheckpoint(true)
    val changedPks = latest.select(col(idCol).as("id"))
    val upserts = latest.filter(col("__op") =!= ChangeLog.OpDelete)
      .drop("__op", "__seq").filter(col(textCol).isNotNull)
    val newSh = Dedup.withShingles(upserts, idCol, textCol, idx.n)
      .filter(size(col("sh")) > 0)
      .localCheckpoint(true) // postings + _docs + dir sets all consume it
    val newPost = banded(newSh, idx.k, idx.bands, idx.algo, idx.buckets)
    // locate old postings: changed ids' stored shingles, re-banded.
    // The _docs scan prunes to the batch's id-hash dirs (≤ buckets).
    val dbks = changedPks
      .select(pmod(xxhash64(col("id")), lit(idx.buckets.toLong))
        .cast("int").as("__dbkt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val docsTable = spark.read.parquet(idx.path + "_docs")
    val oldSh = docsTable.filter(col("__dbkt").isin(dbks: _*))
      .join(changedPks, Seq("id"), "left_semi")
      .select("id", "sh")
    val oldPost = banded(oldSh, idx.k, idx.bands, idx.algo, idx.buckets)
    // ---- postings: rewrite touched __bkt dirs (≤ buckets values),
    // via the shared merge-overwrite skeleton (PartitionedLayout) ----
    import graft.index.PartitionedLayout
    val affected: Seq[Seq[Any]] = oldPost.select("__bkt")
      .union(newPost.select("__bkt"))
      .distinct().collect().map(r => Seq[Any](r.getInt(0)))
    val layout = spark.read.parquet(idx.path)
    PartitionedLayout.mergeOverwrite(spark, idx.path, Seq("__bkt"),
      affected,
      layout.filter(PartitionedLayout.touchedPred(Seq("__bkt"), affected)),
      Seq("id"), changedPks, newPost)
    // ---- _docs: same merge keyed by id-hash dirs. New docs' ids are a
    // subset of the changed ids, so their dirs are a subset of `dbks` —
    // no separate touched-dir collect needed. ----
    val newDocs = newSh.withColumn("__dbkt",
      pmod(xxhash64(col("id")), lit(idx.buckets.toLong)).cast("int"))
    PartitionedLayout.mergeOverwrite(spark, idx.path + "_docs",
      Seq("__dbkt"), dbks.map(Seq[Any](_)),
      docsTable.filter(col("__dbkt").isin(dbks: _*)),
      Seq("id"), changedPks, newDocs)
  }

  /** Compact the append-grown layout ([[admitAndSync]]'s fast path
    * adds one file per touched dir per fresh batch): rewrite every
    * posting / `_docs` dir holding more than `maxFilesPerDir` files as
    * one file each, rows unchanged — the LSM-style maintenance pass
    * that bounds file-count growth under continuous ingest. Returns
    * the number of dirs compacted. */
  def compact(spark: SparkSession, idx: PersistedNearDup,
      maxFilesPerDir: Int = 1): Int = {
    import graft.index.PartitionedLayout
    PartitionedLayout.compact(spark, idx.path, Seq("__bkt"),
      maxFilesPerDir) +
      PartitionedLayout.compact(spark, idx.path + "_docs", Seq("__dbkt"),
        maxFilesPerDir)
  }

  /** Bucket-occupancy telemetry — the observability
    * [[nearDupsAgainst]]'s `maxBucket` guard needs: you cannot pick a
    * cap you cannot see. One count shuffle over the postings; returns
    * `(band, bucket, n)` for buckets holding at least `minSize` docs,
    * largest first — the hot-bucket watch list (the
    * [[graft.search.Ann.cellStats]] of the dedup index). */
  def bucketStats(spark: SparkSession, idx: PersistedNearDup,
      minSize: Long = 2L): DataFrame =
    spark.read.parquet(idx.path)
      .groupBy("band", "bucket")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minSize)
      .orderBy(col("n").desc, col("band"), col("bucket"))

}

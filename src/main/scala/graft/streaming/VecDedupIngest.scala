package graft.streaming

import graft.operators.Dedup
import graft.search.Ann
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The deduplicated-ingest pipeline for EMBEDDINGS — the vector-side
  * twin of [[DedupIngest]], the admission loop a multimodal corpus
  * (image/audio embeddings) grows by: an embedding journal drains
  * micro-batch by micro-batch, and each batch is (1) near-dup-filtered
  * AGAINST the persisted sign-LSH index (bucket-pruned probe + exact
  * cosine refine — never a corpus rescan), (2) near-dup-swept WITHIN
  * itself (bucket self-join → cosine refine → connected components →
  * min-id member per group survives; exact-duplicate vectors are
  * cosine-1 pairs, so the sweep subsumes a separate exact stage), and
  * (3) its survivors are admitted INTO that same index via
  * [[Ann.syncPersistedSignLsh]], so batch k+1 is filtered against
  * everything batch k admitted.
  *
  * Semantics (deterministic, oracle-replayable): a batch row is
  * rejected iff its cosine to an INDEXED vector is ≥ `threshold`
  * among sign-LSH bucket collisions; among survivors, each
  * intra-batch near-dup group admits only its min-id member — a pair
  * arriving in one micro-batch resolves exactly like the same pair
  * split across two. Null-vector rows never enter the index.
  *
  * Scale: the probe's pruning predicate is bounded by the CODE SPACE
  * (tables × 2^bits), the intra-batch self-join is over the BATCH
  * only, and the sync rewrites only touched (table, code) dirs. State
  * lives entirely in the persisted layout — the stream is stateless
  * and a crash replays idempotently (sync's anti-join-then-add). */
object VecDedupIngest {

  /** One admission decision for an embedding batch (the per-batch body
    * of [[run]], usable standalone for a one-shot batch): returns the
    * admitted rows of `batch`. `intraBatch = false` skips the sweep.
    *
    * `maxBucket` is the intra-batch hot-bucket guard (the vector-side
    * mirror of [[graft.operators.NearDupIndex.admitBatch]]'s cap): the
    * sweep self-joins the batch on `(table, code)`, so a degenerate
    * batch of near-identical vectors — every row in the same bucket of
    * every table — goes quadratic in the bucket size. Buckets holding
    * more than `maxBucket` batch rows are skipped during candidate
    * generation: an explicit recall trade (members of a skipped bucket
    * that collide in NO other bucket are all admitted) that bounds the
    * worst batch at `maxBucket²` pairs per bucket. `None` keeps exact
    * semantics. Occupancy telemetry to pick the cap:
    * [[Ann.signLshBucketStats]]. */
  def admitBatch(spark: SparkSession, idx: Ann.PersistedSignLsh,
      batch: DataFrame, idCol: String, vecCol: String,
      threshold: Double, intraBatch: Boolean = true,
      maxBucket: Option[Int] = None): DataFrame = {
    val valid = batch.filter(col(vecCol).isNotNull).localCheckpoint(true)
    // (1) reject near-dups of the CURRENT index contents
    val flagged = Ann.nearDupsAgainstSignLsh(spark, idx, valid,
        idCol, vecCol, idCol, vecCol, threshold)
      .select(col("delta_id").as(idCol)).distinct()
    val kept = valid.join(flagged, Seq(idCol), "left_anti")
    if (!intraBatch) kept
    else {
      // (2) intra-batch sweep: bucket collisions among the survivors
      // (same code function as the index), exact cosine refine,
      // component-min admission. The code projection is one expression
      // over the bounded batch — cheap enough to not warrant the
      // shingle-sharing fusion the text pipeline needs.
      val kc = kept.localCheckpoint(true) // self-join + anti-join
      val coded0 = kc.select(col(idCol).as("__id"), col(vecCol).as("__v"),
        posexplode(graft.functions.SignLshFunctions
          .signLshCodes(col(vecCol), idx.tables, idx.bits))
          .as(Seq("__t", "__code")))
      val coded = maxBucket match {
        case None => coded0
        case Some(cap) =>
          val hot = coded0.groupBy("__t", "__code")
            .agg(count(lit(1)).as("__bn"))
            .filter(col("__bn") > cap).select("__t", "__code")
          coded0.join(broadcast(hot), Seq("__t", "__code"), "left_anti")
      }
      val cand = coded.select(col("__t"), col("__code"),
          col("__id").as("a_id"))
        .join(coded.select(col("__t"), col("__code"),
          col("__id").as("b_id")), Seq("__t", "__code"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
      val vecs = kc.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      val pairs = cand
        .join(vecs.select(col("__id").as("a_id"), col("__v").as("__va")),
          Seq("a_id"))
        .join(vecs.select(col("__id").as("b_id"), col("__v").as("__vb")),
          Seq("b_id"))
        .filter(graft.functions.VectorFunctions
          .cosine(col("__va"), col("__vb")) >= threshold)
        .select("a_id", "b_id")
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

  /** Fused admission + layout merge for one INSERT-ONLY embedding
    * batch — the vector twin of
    * [[graft.operators.NearDupIndex.admitAndSync]], with the same
    * cost discipline: the code projections stay lazy (batch-only),
    * only layout-reading plans materialize (the admitted set, the
    * merge inputs — pinned before their dirs are overwritten), and a
    * fresh batch (no admitted id present in either table; orphaned
    * codes from a crash between the two writes count as present)
    * skips the anti-join and emptied-dir bookkeeping. Semantics
    * identical to [[admitBatch]] + [[Ann.syncPersistedSignLsh]] — the
    * `ingest_vec_pipeline` oracle gates it. Returns the admitted
    * rows. */
  def admitAndSync(spark: SparkSession, idx: Ann.PersistedSignLsh,
      batch: DataFrame, idCol: String, vecCol: String,
      threshold: Double, intraBatch: Boolean = true,
      maxBucket: Option[Int] = None): DataFrame = {
    import graft.index.PartitionedLayout
    import graft.functions.{SignLshFunctions, VectorFunctions}
    // duplicate ids in a batch collapse deterministically (min vector
    // hash wins) — the merge below assumes one row per id
    val valid = Dedup.exactFirstWins(
        batch.filter(col(vecCol).isNotNull)
          .withColumn("__vh", xxhash64(col(vecCol))),
        Seq(idCol), "__vh")
      .drop("__vh")
      .localCheckpoint(true) // probe + anti-join + sweep consume it
    def codesOf(c: org.apache.spark.sql.Column) =
      SignLshFunctions.signLshCodes(c, idx.tables, idx.bits)
    // (1) probe the persisted corpus, pruned to the batch's own codes
    val q = valid.select(col(idCol).as("delta_id"),
      col(vecCol).as("__dvec"),
      posexplode(codesOf(col(vecCol))).as(Seq("__t", "__code")))
    val qpairs: Seq[Seq[Any]] = q.select("__t", "__code").distinct()
      .collect().map(r => Seq[Any](r.getInt(0), r.getLong(1)))
    val pruned = spark.read.parquet(idx.path)
      .filter(PartitionedLayout.touchedPred(Seq("__t", "__code"), qpairs))
    val flagged = pruned.join(q, Seq("__t", "__code"))
      .filter(col(idCol) =!= col("delta_id"))
      .dropDuplicates("delta_id", idCol)
      .filter(VectorFunctions.cosine(col(vecCol), col("__dvec"))
        >= threshold)
      .select(col("delta_id").cast("long").as("a")).distinct()
    // (2) intra-batch sweep + (1)'s rejections in ONE fused collect —
    // the NearDupIndex.admitAndSync discipline: pairs are generated
    // among ALL valid batch rows, endpoint-filtered to unflagged rows
    // driver-side (the same edge set as sweeping only the kept rows),
    // the graph closes with the driver union-find, and admitted /
    // merge frames anti-join the resulting LOCAL blocklist (broadcasts
    // of driver data build with no job; the admitted plan stops
    // reading the layout, so its pre-write checkpoint is gone).
    // EXCEPTION: a hot-bucket cap counts occupancy among KEPT rows —
    // that needs the kept set materialized first, so the capped sweep
    // keeps the two-step shape.
    val admitted =
      if (intraBatch && maxBucket.isDefined) {
        val kept = valid
          .join(flagged.select(col("a").cast(valid.schema(idCol).dataType)
            .as(idCol)), Seq(idCol), "left_anti")
          .localCheckpoint(true) // self-join ×2 + anti-join
        val coded0 = kept.select(col(idCol).as("__id"),
          col(vecCol).as("__v"),
          posexplode(codesOf(col(vecCol))).as(Seq("__t", "__code")))
        val cap = maxBucket.get
        val hot = coded0.groupBy("__t", "__code")
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") > cap).select("__t", "__code")
        val coded = coded0.join(broadcast(hot), Seq("__t", "__code"),
          "left_anti")
        val cand = coded.select(col("__t"), col("__code"),
            col("__id").as("a_id"))
          .join(coded.select(col("__t"), col("__code"),
            col("__id").as("b_id")), Seq("__t", "__code"))
          .filter(col("a_id") < col("b_id"))
          .select("a_id", "b_id").distinct()
        val vecs = kept.select(col(idCol).as("__id"), col(vecCol).as("__v"))
        val pairs = cand
          .join(vecs.select(col("__id").as("a_id"), col("__v").as("__va")),
            Seq("a_id"))
          .join(vecs.select(col("__id").as("b_id"), col("__v").as("__vb")),
            Seq("b_id"))
          .filter(VectorFunctions.cosine(col("__va"), col("__vb"))
            >= threshold)
          .select("a_id", "b_id")
        val losers = Dedup.componentsAuto(pairs, "a_id", "b_id")
          .filter(col("id") =!= col("component"))
          .select(col("id").as(idCol))
        // this plan read the layout (via kept's probe): pin before the
        // merge rewrites the dirs it read
        kept.join(losers, Seq(idCol), "left_anti").localCheckpoint(true)
      } else {
        val collected: Array[org.apache.spark.sql.Row] =
          if (!intraBatch)
            flagged.withColumn("b", lit(null).cast("long")).collect()
          else {
            val coded = valid.select(col(idCol).as("__id"),
              col(vecCol).as("__v"),
              posexplode(codesOf(col(vecCol))).as(Seq("__t", "__code")))
            val cand = coded.select(col("__t"), col("__code"),
                col("__id").as("a_id"))
              .join(coded.select(col("__t"), col("__code"),
                col("__id").as("b_id")), Seq("__t", "__code"))
              .filter(col("a_id") < col("b_id"))
              .select("a_id", "b_id").distinct()
            val vecs = valid.select(col(idCol).as("__id"),
              col(vecCol).as("__v"))
            val pairs = cand
              .join(vecs.select(col("__id").as("a_id"),
                col("__v").as("__va")), Seq("a_id"))
              .join(vecs.select(col("__id").as("b_id"),
                col("__v").as("__vb")), Seq("b_id"))
              .filter(VectorFunctions.cosine(col("__va"), col("__vb"))
                >= threshold)
              .select("a_id", "b_id")
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
        val idType = valid.schema(idCol).dataType
        valid.join(broadcast(rejected.toDF("__rid")
          .select(col("__rid").cast(idType).as(idCol))),
          Seq(idCol), "left_anti")
      }
    // (3) merge into both tables — append fast path for fresh batches
    val ids = admitted.select(col(idCol))
    val newCoded = admitted.withColumn("__codes", codesOf(col(vecCol)))
    val dbks = ids
      .select(pmod(xxhash64(col(idCol)), lit(Ann.signLshDocBuckets.toLong))
        .cast("int").as("__dbkt"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val docsTable = spark.read.parquet(idx.path + "_docs")
    val newDocs = admitted.withColumn("__dbkt",
      pmod(xxhash64(col(idCol)), lit(Ann.signLshDocBuckets.toLong))
        .cast("int"))
      // project onto the docs layout's column set — a journal carrying
      // extra metadata columns must not leave file-dependent schemas
      .select(docsTable.columns.map(col): _*)
    if (dbks.nonEmpty) {
      val docsHit = docsTable.filter(col("__dbkt").isin(dbks: _*))
        .join(ids, Seq(idCol), "left_semi")
      // one existence probe: admitted id present in _docs, or codes
      // orphaned by a crash between the two table writes
      val replay = docsHit.select(lit(1).as("x")).limit(1)
        .union(pruned.join(ids, Seq(idCol), "left_semi")
          .select(lit(1).as("x")).limit(1))
        .collect().nonEmpty
      // carry = the persisted layout's own non-partition columns (from
      // the already-listed pruned scan — no extra read), matching the
      // merge path's newRows.select(current.columns) contract: the
      // append fast path must not write batch-dependent schemas
      val carry = pruned.columns
        .filterNot(Set("__t", "__code").contains)
      def codeRows(df: DataFrame) = df.select(carry.map(col) :+
        posexplode(col("__codes")).as(Seq("__t", "__code")): _*)
      if (!replay) {
        // fresh batch: append new files into the touched dirs — no
        // current-rows read, no pre-write checkpoint, no dir rewrite;
        // the two tables' appends run concurrently (disjoint paths)
        PartitionedLayout.inParallel(
          codeRows(newCoded).repartition(col("__t"), col("__code"))
            .write.mode("append").partitionBy("__t", "__code")
            .parquet(idx.path),
          newDocs.repartition(col("__dbkt"))
            .write.mode("append").partitionBy("__dbkt")
            .parquet(idx.path + "_docs"))
      } else {
        // replay / live-id re-ingest: full anti-join merge of the
        // touched dirs (idempotent — the self-repair contract)
        val oldCoded = docsHit.withColumn("__codes", codesOf(col(vecCol)))
        def pairsOf(df: DataFrame) = df
          .select(posexplode(col("__codes")).as(Seq("__t", "__code")))
          .select(col("__t"), col("__code")).distinct()
        val tagged = pairsOf(oldCoded)
          .union(pruned.join(ids, Seq(idCol), "left_semi")
            .select("__t", "__code").distinct())
          .union(pairsOf(newCoded))
          .distinct().collect()
        val affected: Seq[Seq[Any]] = tagged
          .map(r => (r.getInt(0), r.getLong(1))).distinct
          .map { case (t, c) => Seq[Any](t, c) }
        val current = spark.read.parquet(idx.path)
          .filter(PartitionedLayout.touchedPred(Seq("__t", "__code"),
            affected))
        PartitionedLayout.mergeOverwrite(spark, idx.path,
          Seq("__t", "__code"), affected, current,
          Seq(idCol), ids, codeRows(newCoded))
        val dcur = docsTable.filter(col("__dbkt").isin(dbks: _*))
        PartitionedLayout.mergeOverwrite(spark, idx.path + "_docs",
          Seq("__dbkt"), dbks.map(Seq[Any](_)), dcur, Seq(idCol), ids,
          newDocs)
      }
    }
    admitted
  }

  /** Drain `journalDir` (AvailableNow) into the sign-LSH layout at
    * `idx`, admitting only novel embeddings. */
  def run(spark: SparkSession, idx: Ann.PersistedSignLsh,
      journalDir: String, journalSchema: StructType,
      checkpointDir: String, idCol: String, vecCol: String,
      threshold: Double,
      readerOptions: Map[String, String] = Map.empty,
      intraBatch: Boolean = true,
      maxBucket: Option[Int] = None): Unit = {
    IndexSync.layoutSyncOnce(spark, journalDir, journalSchema,
      checkpointDir, readerOptions) { batch =>
      // fused admission + merge — half the per-batch driver actions of
      // admitBatch-then-sync; survivors are visible to the next batch
      admitAndSync(spark, idx, batch, idCol, vecCol, threshold,
        intraBatch, maxBucket)
      ()
    }
  }
}

package graft.queries

import graft.core.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deduplication coverage over `documents`: exact first-wins, brute-force
  * n-gram Jaccard (oracle ground truth), MinHash+LSH and SimHash (the
  * scale paths — rows-only checks here, equivalence to the exact paths is
  * asserted in ScalaTest). */
object DedupQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** Shared read-only near-dup index over `doc_id >= 60` (md5 mode) —
    * the delta-probe and bucket-stats queries build it once per JVM
    * ([[BuildCache]] contract; the sync query keeps a private copy). */
  private def sharedNearDupIdx(s: SparkSession,
      dir: String): graft.operators.PersistedNearDup =
    BuildCache.memo(s"ndidx:ge60:md5:$dir") {
      graft.operators.NearDupIndex.persist(
        docs(s, dir).filter(col("doc_id") >= 60), "doc_id", "text",
        s"${System.getProperty("java.io.tmpdir")}/graft_shared_ndidx/" +
          dir.replaceAll("[^0-9.]", ""), algo = "md5")
    }

  /** Append one journal file and pin its mtime to `ts` so the file
    * stream source (which orders files by modification time) replays
    * journal batches in write order even on coarse-mtime filesystems. */
  private[queries] def appendStamped(fs: org.apache.hadoop.fs.FileSystem,
      batch: DataFrame, dir: String, ts: Long): Unit = {
    batch.coalesce(1).write.mode("append").parquet(dir)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir)).foreach { st =>
      if (st.getPath.getName.startsWith("part-") &&
          st.getModificationTime > ts)
        fs.setTimes(st.getPath, ts, -1)
    }
  }

  /** The PRISTINE near-dup seed index over `doc_id >= 300`, built
    * once per (JVM, sf) — the ingest cells CLONE it per invocation
    * (the admission drain mutates its copy), so the bench pays the
    * seed build once across the pipeline cells ([[BuildCache]]
    * contract; layouts here are pure functions of the corpus). */
  private def sharedNearDupSeed(s: SparkSession, dir: String): String =
    BuildCache.memo(s"ndseed:md5:ge300:$dir") {
      val d = docs(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .select("doc_id", "text")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_ndseed/" +
        dir.replaceAll("[^0-9.]", "")
      val hp = new org.apache.hadoop.fs.Path(root)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(hp, true)
      graft.operators.NearDupIndex.persist(
        d.filter(col("doc_id") >= 300), "doc_id", "text", s"$root/idx",
        algo = "md5")
      s"$root/idx"
    }

  /** The 3-file `doc_id < 300` documents journal (stamped = one file
    * per micro-batch; unstamped = one multi-file batch), built once
    * per (JVM, sf) — streaming-drain fixture prep. */
  private def sharedDocJournal(s: SparkSession, dir: String,
      stamped: Boolean): String =
    BuildCache.memo(s"ndjournal:st$stamped:$dir") {
      val d = docs(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .select("doc_id", "text")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_ndjrn/" +
        (if (stamped) "st/" else "mf/") + dir.replaceAll("[^0-9.]", "")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val batches = Seq(
        d.filter(col("doc_id") < 100),
        d.filter(col("doc_id") >= 100 && col("doc_id") < 200),
        d.filter(col("doc_id") >= 200 && col("doc_id") < 300))
      batches.zipWithIndex.foreach { case (b, i) =>
        if (stamped)
          appendStamped(fs, b, s"$root/journal", (i + 1) * 10000L)
        else b.coalesce(1).write.mode("append").parquet(s"$root/journal")
      }
      s"$root/journal"
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Blocked fuzzy self-join (entity resolution): candidates from an
    // equi-join on the name's last token, verified by THRESHOLDED
    // Levenshtein (banded DP stops at maxDist+1) — never all-pairs.
    // The catalog is a heavy-duplicate string domain (64 distinct
    // names over the whole `part` table), so distances are verified on
    // the DISTINCT-name relation — quadratic work bounded by distinct
    // entities, not rows (25M row-pairs collapsed to ~2k name-pairs at
    // sf0.1, a 30x cell-time cut found via bench) — and the row-level
    // pair mass is recovered exactly by multiplying the two names'
    // multiplicities. Both engines implement classic edit distance, so
    // the per-block counts, distance-1 split, row-pair mass and id
    // checksum all hash-match.
    "dedup_fuzzy_pairs" -> ((s, dir) => {
      val names = Tables.load(s, dir, "part")
        .filter(col("p_name").isNotNull)
        .groupBy(col("p_name"))
        .agg(min("p_partkey").as("nid"), count(lit(1)).as("cnt"))
      val ca = names.select(col("nid").as("a_id"), col("cnt").as("a_cnt"))
      val cb = names.select(col("nid").as("b_id"), col("cnt").as("b_cnt"))
      Dedup.fuzzyPairs(names, "nid", "p_name",
          regexp_extract(col("p_name"), "(\\S+)$", 1), maxDist = 2)
        .join(broadcast(ca), "a_id").join(broadcast(cb), "b_id")
        .groupBy(regexp_extract(col("a_str"), "(\\S+)$", 1).as("block"))
        .agg(count(lit(1)).as("n_name_pairs"),
          sum(when(col("dist") === 1, 1L).otherwise(0L)).as("n_d1"),
          sum(col("a_cnt") * col("b_cnt")).as("n_row_pairs"),
          sum(col("a_id") + col("b_id")).as("nid_sum"))
        .orderBy("block")
    }),
    "dedup_exact_firstwins" -> ((s, dir) => {
      Dedup.exactFirstWins(docs(s, dir), Seq("lang", "source"), "doc_id")
        .select(col("lang"), col("source"), col("doc_id").as("keep_id"))
        .orderBy("lang", "source")
    }),
    // Cross-document duplicate substring spans (Lee et al. 2022,
    // arXiv:2107.06499 — the token-level exact dedup tier their suffix
    // array computes, here as pure relational ops): every maximal run
    // of tokens whose 8-grams each appear verbatim in >= 2 distinct
    // docs. The oracle replays tokenize → 8-gram → cross-doc dup →
    // gaps-and-islands merge stage by stage.
    "dedup_substring_spans" -> ((s, dir) => {
      Dedup.duplicateSpans(docs(s, dir), "doc_id", "text",
          n = 8, minDocs = 2)
        .select(col("doc_id"),
          col("span_start").cast("long").as("span_start"),
          col("span_end").cast("long").as("span_end"))
        .orderBy("doc_id", "span_start")
    }),
    // The removal pass: spans cut, survivors rejoined in position
    // order. Projected to counts + a clean-text digest (md5 on both
    // engines) so the oracle hash-checks the reassembled TEXT, not
    // just the arithmetic.
    "dedup_substring_scrub" -> ((s, dir) => {
      Dedup.removeDuplicateSpans(docs(s, dir), "doc_id", "text",
          n = 8, minDocs = 2)
        .select(col("doc_id"), col("n_tokens"), col("n_kept"),
          md5(col("clean_text")).as("clean_md5"))
        .filter(col("n_kept") < col("n_tokens"))
        .orderBy("doc_id")
    }),
    // Corpus-level ExactSubstr kill rate — the go/no-go number a
    // production scrub reports: docs carrying a duplicated span and
    // the token fraction the spans cover. Spans are maximal and
    // disjoint per doc, so the span-length sum counts each covered
    // token once; the oracle replays the full span chain plus the
    // corpus fold.
    "dedup_substring_stats" -> ((s, dir) => {
      Dedup.duplicateSpanStats(docs(s, dir), "doc_id", "text",
          n = 8, minDocs = 2)
        .select(col("n_docs"), col("docs_hit"), col("total_tokens"),
          col("dup_tokens"), col("kill_rate"))
    }),
    // Ground-truth n-gram Jaccard pairs on a bounded block (quadratic —
    // the oracle-checkable baseline the LSH path approximates).
    "dedup_jaccard_pairs" -> ((s, dir) => {
      Dedup.jaccardPairs(docs(s, dir).filter(col("doc_id") < 200),
          "doc_id", "text", threshold = 0.5)
        .orderBy("a_id", "b_id")
    }),
    // Deterministic stratified sampling (data mixing): keep fraction
    // governed per source by md5-hash of the id — a pure function of
    // the row, so the mixture is reproducible on any engine/cluster
    // (df.sample's per-partition RNG is not). Oracle recomputes the
    // identical md5 fractions and per-source aggregates.
    "sample_mix" -> ((s, dir) => {
      graft.operators.Sampling.stratifiedSample(docs(s, dir), "doc_id",
          "source", Map("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.25),
          default = 0.1)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
          sum("doc_id").as("sum_id"))
        .orderBy("source")
    }),
    // Leakage-free split: the hash decision is on SOURCE, so every doc
    // of a source lands in one split — row-level randomSplit would leak
    // near-duplicates across train/eval. Oracle replays the md5 split.
    "sample_group_split" -> ((s, dir) => {
      graft.operators.Sampling.groupSplit(docs(s, dir), "source",
          trainFrac = 0.6)
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"))
        .orderBy("source", "split")
    }),
    // Canonical-form dedup: case/punctuation-normalized text, exact
    // first-wins on the canonical key — the cheap tier below MinHash.
    "text_canonical" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val c = docs(s, dir).filter(col("doc_id") < 40)
        .select(col("doc_id"),
          graft.operators.TextAnalysis.canonicalText(col("text"))
            .as("canon"))
      val w = Window.partitionBy("canon").orderBy("doc_id")
      c.withColumn("first_wins", row_number().over(w) === 1)
        .orderBy("doc_id")
    }),
    // Temperature mixing at alpha=0.5, budget=0.5: per-source keep
    // rates derived from the corpus itself (r_s ∝ n_s^(alpha-1),
    // normalized to the budget), then the same md5 keep predicate.
    // The oracle recomputes rates AND replays the id selection.
    "sample_temperature" -> ((s, dir) => {
      graft.operators.Sampling.temperatureMix(docs(s, dir), "doc_id",
          "source", alpha = 0.5, budget = 0.5)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
          sum("doc_id").as("sum_id"))
        .orderBy("source")
    }),
    // DSIR importance resampling (arXiv:2302.03169): English docs as
    // the quality target, md5 buckets (16^3) as the hashed feature
    // space, add-one-smoothed likelihood-ratio scores, deterministic
    // top-100. The oracle replays buckets, both distributions, the
    // per-doc log-weight sum, and the selection.
    "sample_dsir" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.Sampling.dsirSelect(d,
          d.filter(col("lang") === "en"), "doc_id", "text", k = 100)
        .select(col("doc_id"),
          round(col("log_weight"), 4).as("log_weight"))
        .orderBy(col("doc_id"))
    }),
    // Streaming cross-batch dedup: the documents table replayed as an
    // id-ordered three-file journal, deduplicated on (lang, source)
    // with one-file micro-batches and forever-suppression state. The
    // oracle is the BATCH first-wins SQL — stream replay must equal the
    // batch dedup exactly (the min-id row per key survives no matter
    // which micro-batch its duplicates arrive in).
    "dedup_stream_firstwins" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val d = docs(s, dir).select("doc_id", "lang", "source")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_dedupstr/" +
        dir.replaceAll("[^0-9.]", "")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true) // fresh replay
      // id-ordered journal files with pinned increasing mtimes ->
      // micro-batches arrive in id order on any filesystem, so
      // stream-arrival order == batch orderCol order
      appendStamped(fs, d.filter(col("doc_id") < 100),
        s"$root/journal", 10000L)
      appendStamped(fs,
        d.filter(col("doc_id") >= 100 && col("doc_id") < 300),
        s"$root/journal", 20000L)
      appendStamped(fs, d.filter(col("doc_id") >= 300),
        s"$root/journal", 30000L)
      val stream = s.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/journal")
      graft.streaming.DedupStream
        .firstWins(stream, Seq("lang", "source"), "doc_id")
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .format("parquet").option("path", s"$root/out")
        .start().awaitTermination()
      s.read.parquet(s"$root/out")
        .select(col("lang"), col("source"), col("doc_id").as("keep_id"))
        .orderBy("lang", "source")
    }),
    // Token-budget mixing: per source, take documents in deterministic
    // md5-fraction order until the source's token budget is crossed.
    // The engine runs the two-phase bucketed form (histogram + boundary
    // bucket window — no full sort per source); the oracle runs the
    // textbook single window. They must agree bit-for-bit.
    "sample_token_budget" -> ((s, dir) => {
      val d = docs(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .withColumn("n_tokens",
          size(split(trim(col("text")), "\\s+")).cast("long"))
      graft.operators.Sampling.tokenBudget(d, "doc_id", "source",
          "n_tokens", Map("src0" -> 800L, "src1" -> 500L), default = 600L)
        .select(col("source"), col("doc_id"), col("n_tokens"))
        .orderBy("source", "doc_id")
    }),
    // Curriculum form of the token budget: per source, the HIGHEST-
    // quality documents are taken first (ties by id) until the token
    // budget is crossed — same two-phase exact engine plan, priority
    // key instead of the md5 fraction. Oracle: single window ordered
    // by quality DESC, id.
    "sample_quality_budget" -> ((s, dir) => {
      val d = docs(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .withColumn("n_tokens",
          size(split(trim(col("text")), "\\s+")).cast("long"))
      graft.operators.Sampling.tokenBudgetBy(d, "doc_id", "source",
          "n_tokens",
          graft.operators.TextAnalysis.qualityScore(col("text")),
          Map("src0" -> 800L), default = 600L)
        .select(col("source"), col("doc_id"), col("n_tokens"))
        .orderBy("source", "doc_id")
    }),
    // Benchmark decontamination: corpus docs sharing >= 2 distinct
    // 3-gram shingles with the "benchmark" block are flagged with
    // their hit counts — the shingle equi-join shape (one shuffle on
    // shingle keys, never corpus x benchmarks). Oracle replays the
    // shingle sets and the collision counts.
    "dedup_decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.decontaminate(
          d.filter(col("doc_id") < 200)
            .withColumnRenamed("doc_id", "corpus_id"),
          "corpus_id", "text",
          d.filter(col("doc_id") >= 200 && col("doc_id") < 260)
            .withColumnRenamed("doc_id", "bench_id"),
          "bench_id", "text", n = 3, minHits = 2)
        .orderBy("corpus_id", "bench_id")
    }),
    // Per-document contamination score: fraction of each corpus doc's
    // distinct 3-gram shingles present anywhere in the "benchmark"
    // block — every doc scored, clean docs at 0. Broadcast benchmark
    // shingle set, one agg by doc. Oracle replays the same left join.
    "decontaminate_score" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.contaminationScore(
          d.filter(col("doc_id") < 200)
            .withColumnRenamed("doc_id", "corpus_id"),
          "corpus_id", "text",
          d.filter(col("doc_id") >= 200 && col("doc_id") < 260),
          "text", n = 3)
        .orderBy("corpus_id")
    }),
    // MinHash+LSH candidate generation + exact refine, in md5 mode: the
    // signatures (min over shingles of md5(seed || shingle), hex) and the
    // band buckets are reproducible as plain SQL, so the FULL LSH path —
    // banding, bucket equi-join, Jaccard refine — is hash-checked against
    // the DuckDB oracle at realistic parameters (k=16, 4 bands). The
    // xxhash64 mode (scale default) is equivalence-tested in DedupSpec.
    "dedup_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text", threshold = 0.5,
          algo = "md5")
        .orderBy("a_id", "b_id")
    }),
    // Persisted near-dup index, delta probe: the corpus block's LSH
    // postings persist bucket-partitioned; the delta block is banded in
    // memory and probes ONLY its own posting dirs (partition-pruned),
    // then exact-Jaccard refines against the stored shingle sets. In
    // md5 mode the whole persisted path replays as SQL: the oracle
    // computes both sides' signatures and restricts candidates to
    // cross-block band collisions.
    "near_dup_delta" -> ((s, dir) => {
      val d = docs(s, dir)
      val idx = sharedNearDupIdx(s, dir)
      graft.operators.NearDupIndex.nearDupsAgainst(s, idx,
          d.filter(col("doc_id") < 60), "doc_id", "text",
          threshold = 0.5)
        .orderBy("corpus_id", "delta_id")
    }),
    // Shard-parallel near-dup index build + file-move merge — the
    // 100-TB dedup bootstrap: the corpus fans into two independently
    // built+persisted shard indexes (same banding parameters), merged
    // by renames (postings + _docs), then probed with the SAME delta
    // block as near_dup_delta. Every persisted column is a pure
    // per-row function, so the merged index ≡ a full build and the
    // probe is hash-equal to near_dup_delta, whose oracle it reuses.
    "near_dup_shard_merged" -> ((s, dir) => {
      val d = docs(s, dir)
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_ndshard/" +
        dir.replaceAll("[^0-9.]", "")
      // independent shard builds run concurrently, as a cluster would
      val shardPaths = Seq(s"$root/shard0", s"$root/shard1")
      def buildShard(p: Int): Unit = graft.operators.NearDupIndex.persist(
        d.filter(col("doc_id") >= 60 && pmod(col("doc_id"), lit(2)) === p),
        "doc_id", "text", shardPaths(p), algo = "md5")
      graft.index.PartitionedLayout.inParallel(buildShard(0), buildShard(1))
      val merged = graft.operators.NearDupIndex.mergeShards(s,
        shardPaths, s"$root/merged")
      graft.operators.NearDupIndex.nearDupsAgainst(s, merged,
          d.filter(col("doc_id") < 60), "doc_id", "text",
          threshold = 0.5)
        .orderBy("corpus_id", "delta_id")
    }),
    // Hot-bucket telemetry over the persisted index: per-(band, bucket)
    // posting counts, largest first — how a maxBucket cap gets chosen.
    // In md5 mode the bucket keys replay as SQL, so the stats are
    // hash-checked too.
    "near_dup_bucket_stats" -> ((s, dir) => {
      graft.operators.NearDupIndex.bucketStats(s,
        sharedNearDupIdx(s, dir), minSize = 2L)
    }),
    // The same persisted index MAINTAINED through a change batch before
    // probing: docs [130,200) arrive as inserts, corpus doc 245 (a
    // known near-dup partner of delta doc 8) is deleted. The synced
    // layout must answer exactly like an index built fresh on the
    // post-change corpus — the oracle replays that rebuilt corpus, so
    // the (8,245) pair is gone and pairs into [130,200) appear.
    "near_dup_delta_synced" -> ((s, dir) => {
      import graft.index.ChangeLog
      val d = docs(s, dir)
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_ndsync/" +
        dir.replaceAll("[^0-9.]", "")
      val idx = graft.operators.NearDupIndex.persist(
        d.filter(col("doc_id") >= 200), "doc_id", "text", root,
        algo = "md5")
      val changes = d.filter(col("doc_id") >= 130 && col("doc_id") < 200)
        .select("doc_id", "text")
        .withColumn("__op", lit(ChangeLog.OpInsert))
        .withColumn("__seq", lit(1L))
        .unionByName(d.filter(col("doc_id") === 245)
          .select("doc_id", "text")
          .withColumn("__op", lit(ChangeLog.OpDelete))
          .withColumn("__seq", lit(2L)))
      graft.operators.NearDupIndex.sync(s, idx, changes, "doc_id", "text")
      graft.operators.NearDupIndex.nearDupsAgainst(s,
          graft.operators.NearDupIndex.load(s, root),
          d.filter(col("doc_id") < 60), "doc_id", "text",
          threshold = 0.5)
        .orderBy("corpus_id", "delta_id")
    }),
    // The deduplicated-ingest pipeline end to end: corpus index on
    // docs >= 300; three journal batches ([0,100), [100,200),
    // [200,300)) drain through exact-dedup -> near-dup-vs-index ->
    // intra-batch sweep -> admit. Cross-batch suppression is live (doc
    // 8 admitted in batch 1 rejects its near-dup 245 in batch 3), and
    // so is the same-batch sweep (the (152,178) pair lands together in
    // batch 2 at sf0.01 — only min-id 152 is admitted). Output = the
    // final index corpus; the oracle replays all three admission
    // rounds in staged SQL, closing each round's intra-batch pair
    // graph with a recursive CTE. Journal file mtimes are pinned to
    // strictly increasing values so maxFilesPerTrigger=1 replays them
    // in write order on any filesystem.
    "ingest_neardup_pipeline" -> ((s, dir) => {
      val d = docs(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .select("doc_id", "text")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_ndingest/" +
        dir.replaceAll("[^0-9.]", "")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true) // fresh replay
      // the seed index and the journal are once-per-JVM fixtures; the
      // timed work — the 3-micro-batch admission drain, which MUTATES
      // the index — runs on a fresh clone each invocation
      BuildCache.cloneLayout(s, sharedNearDupSeed(s, dir), root)
      val journal = sharedDocJournal(s, dir, stamped = true)
      graft.streaming.DedupIngest.run(s, s"$root/idx", journal,
        d.schema, s"$root/ckpt", "doc_id", "text", threshold = 0.5,
        Map("maxFilesPerTrigger" -> "1"))
      s.read.parquet(s"$root/idx_docs")
        .select(col("id").as("doc_id")).orderBy("doc_id")
    }),
    // The SAME journal drained as ONE multi-file micro-batch (no
    // maxFilesPerTrigger): every cross-batch rejection above becomes an
    // intra-batch sweep decision here — the pair graph over all 300
    // journal docs closes in one recursive pass. Distinct entry, not a
    // rerun: single-batch and three-batch admission are different
    // semantics (sequential admission keeps a doc whose only near-dup
    // partner was itself rejected; component-min sweeps it), so each
    // gets its own staged-SQL oracle.
    "ingest_neardup_multifile" -> ((s, dir) => {
      val d = docs(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .select("doc_id", "text")
      val root =
        s"${System.getProperty("java.io.tmpdir")}/graft_ndingest_mf/" +
          dir.replaceAll("[^0-9.]", "")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true) // fresh replay
      // same shared seed index (cloned — the single-batch drain
      // mutates it) and journal; no stamps needed: all three files
      // drain as ONE micro-batch
      BuildCache.cloneLayout(s, sharedNearDupSeed(s, dir), root)
      val journal = sharedDocJournal(s, dir, stamped = false)
      graft.streaming.DedupIngest.run(s, s"$root/idx", journal,
        d.schema, s"$root/ckpt", "doc_id", "text", threshold = 0.5)
      s.read.parquet(s"$root/idx_docs")
        .select(col("id").as("doc_id")).orderBy("doc_id")
    }),
    // Pairs -> GROUPS: connected components over the MinHash-LSH pair
    // graph (min-label propagation + pointer jumping), then canonical
    // keep = min doc per component — the full dedup decision, not just
    // candidate pairs. The oracle recomputes the same pair set and
    // closes it with a recursive CTE (component = min reachable id),
    // so the distributed iteration is hash-checked against a
    // transitive-closure ground truth.
    "dedup_groups" -> ((s, dir) => {
      val pairs = Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text",
        threshold = 0.5, algo = "md5")
      Dedup.connectedComponents(pairs, "a_id", "b_id")
        .select(col("id").as("doc_id"), col("component"),
          (col("id") === col("component")).as("keep"))
        .orderBy("doc_id")
    }),
    // The production survivor policy over the same clusters: keep the
    // LONGEST member per near-dup component (RefinedWeb's choice — the
    // longest copy usually subsumes its truncated near-dups), ties by
    // min id. Diverges from min-id on ~40% of this fixture's grouped
    // docs, so the policy itself is under the hash.
    "dedup_groups_best" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
      val pairs = Dedup.minhashLshPairs(d, "doc_id", "text",
        threshold = 0.5, algo = "md5")
      val comp = Dedup.connectedComponents(pairs, "a_id", "b_id")
      val ln = d.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"))
      comp.join(ln, comp("id") === ln("doc_id"))
        .select(col("id").as("doc_id"), col("component"), col("n_chars"))
        .withColumn("keep", row_number().over(
          Window.partitionBy("component")
            .orderBy(col("n_chars").desc, col("doc_id"))) === 1)
        .orderBy("doc_id")
    }),
    // SemDeDup (arXiv:2303.09540): frozen deterministic IVF cells as
    // the clusters, within-cell cosine pairs at the near_dup_pairs
    // threshold (its cross-engine float boundary is already
    // hash-proven on the SAME comparisons), recursive-CTE closure in
    // the oracle vs componentsAuto here — the semantic-dedup keep
    // decision end-to-end, quadratic only within a cell.
    "dedup_semantic" -> ((s, dir) => {
      Dedup.semanticDedup(
          Tables.load(s, dir, "embeddings")
            .filter(col("embedding").isNotNull),
          "vec_id", "embedding", k = 16, tau = 0.4)
        .select(col("id"), col("component"), col("keep"))
        .orderBy("id")
    }),
    // SemDeDup with TRAINED clustering (the paper's own k-means): the
    // oracle replays the md5-sampled 2-iteration integer Lloyd
    // training (the ann_ivf_trained_topk recipe), the frozen-centroid
    // assignment, the within-cell cosine pairs and the recursive-CTE
    // closure — the skew-robust configuration end to end.
    "dedup_semantic_trained" -> ((s, dir) => {
      Dedup.semanticDedup(
          Tables.load(s, dir, "embeddings")
            .filter(col("embedding").isNotNull),
          "vec_id", "embedding", k = 16, tau = 0.4, trained = true)
        .select(col("id"), col("component"), col("keep"))
        .orderBy("id")
    }),
    // SemDeDup seam telemetry: within-cell pairs vs the EXACT
    // all-pairs ground truth at the same tau — n_cross_cell is the
    // pair count the cell-seam trade loses by design, and the oracle
    // replays BOTH legs (deterministic cells + exact cross join), so
    // the measured recall itself is hash-checked.
    "dedup_semantic_recall" -> ((s, dir) => {
      Dedup.semanticDedupRecall(
          Tables.load(s, dir, "embeddings")
            .filter(col("embedding").isNotNull),
          "vec_id", "embedding", k = 16, tau = 0.4)
    }),
    // SimHash near-dup pairs at Hamming distance <= 6 on a bounded block,
    // in md5 mode: the oracle rebuilds identical 64-bit signatures from
    // md5() hex and compares per-bit votes — the simhash operator itself
    // is hash-checked, not just spec-trusted.
    "dedup_simhash" -> ((s, dir) => {
      val withSig = docs(s, dir).filter(col("doc_id") < 200)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .select(col("doc_id"), Dedup.simhash64(col("text"), "md5").as("sig"))
      val a = withSig.toDF("a_id", "a_sig")
      val b = withSig.toDF("b_id", "b_sig")
      a.join(b, col("a_id") < col("b_id"))
        .withColumn("ham", Dedup.hamming64(col("a_sig"), col("b_sig")))
        .filter(col("ham") <= 6)
        .select(col("a_id"), col("b_id"), col("ham").cast("long").as("ham"))
        .orderBy("a_id", "b_id")
    }),
    // Bloom-filter cross-corpus admission: history (doc_id % 3 != 0)
    // folds into a deliberately small 1024-bit filter so false
    // positives actually occur; the incoming batch (doc_id % 3 == 0)
    // is probed with a shuffle-free literal-bitmap bit test. The
    // oracle replays every verdict — including each false positive —
    // from md5 arithmetic, and the true-dup join scores the filter's
    // error exactly: no false negatives by construction, n_false_pos
    // quantifies the admission loss.
    "dedup_bloom_novel" -> ((s, dir) => {
      import graft.operators.Bloom
      val clean = docs(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
      val hist = clean.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val bits = BuildCache.memo(s"bloom:1024:3:$dir") {
        Bloom.build(hist.select("text"), "text", mBits = 1024, k = 3)
      }
      val batch = clean.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select(col("doc_id"), col("lang"), col("text"))
      val histKeys = hist.select(col("text")).distinct()
        .withColumn("__indexed", lit(1))
      batch.withColumn("member", Bloom.memberCol(col("text"), bits, k = 3))
        .join(broadcast(histKeys), Seq("text"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_batch"),
          sum(when(col("member"), 1L).otherwise(0L)).as("n_member"),
          sum(when(!col("member"), 1L).otherwise(0L)).as("n_admitted"),
          sum(when(col("__indexed").isNotNull, 1L).otherwise(0L))
            .as("n_true_dup"),
          sum(when(col("member") && col("__indexed").isNull, 1L)
            .otherwise(0L)).as("n_false_pos"))
        .orderBy("lang")
    }),
    // Bloom filter telemetry at the sizing you'd actually deploy: bits
    // set, fill per-mille, and the k=3 cubic false-positive estimate —
    // all integer arithmetic, so the replay is exact. The build's only
    // corpus-sized pass is one explode+distinct+bit_or aggregation;
    // the driver holds m/64 longs, never corpus-shaped state.
    "dedup_bloom_stats" -> ((s, dir) => {
      import graft.operators.Bloom
      val hist = docs(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val bits = BuildCache.memo(s"bloom:4096:3:$dir") {
        Bloom.build(hist.select("text"), "text", mBits = 4096, k = 3)
      }
      val nKeys = hist.select("text").distinct().count()
      val (set, fill, fpp) = Bloom.fillStats(bits, k = 3)
      import s.implicits._
      Seq((4096L, 3L, nKeys, set, fill, fpp))
        .toDF("m_bits", "k", "n_keys", "bits_set", "fill_permille",
          "fpp_micro")
    }),
    // Persisted-filter round trip: build → save → load → probe, with
    // the probe k read FROM the artifact (Bloom.load returns a filter
    // that owns its k; a k-less or inconsistent artifact refuses to
    // load). The ledger hash-checks that the reopened filter's
    // verdicts equal the build's — the next ingest batch reopens the
    // history filter without re-scanning history OR re-guessing k.
    "dedup_bloom_roundtrip" -> ((s, dir) => {
      import graft.operators.Bloom
      val clean = docs(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
      val hist = clean.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_bloomrt/" +
        dir.replaceAll("[^0-9.]", "")
      Bloom.save(s, Bloom.BloomFilter(
        BuildCache.memo(s"bloom:1024:3:$dir") {
          Bloom.build(hist.select("text"), "text", mBits = 1024, k = 3)
        }, 3), path)
      val loaded = Bloom.load(s, path)
      val batch = clean.filter(pmod(col("doc_id"), lit(3)) === 0)
      loaded.novel(batch, "text")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_admitted"),
          sum("doc_id").as("id_sum"))
        .withColumn("m_bits", lit(loaded.mBits.toLong))
        .withColumn("k", lit(loaded.k.toLong))
        .orderBy("lang")
    }),
    // The STREAMING build of the history filter: the history docs
    // replayed as a 3-file journal, each micro-batch's keys OR-folded
    // into the persisted artifact (BloomStream — OR is idempotent, so
    // at-least-once replays are exact with zero dedup bookkeeping).
    // The drained filter must equal the batch build bit for bit, so
    // the admission ledger shares dedup_bloom_novel's oracle verbatim.
    "dedup_bloom_stream" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val clean = docs(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
      val hist = clean.filter(pmod(col("doc_id"), lit(3)) =!= 0)
        .select("doc_id", "text")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_bloomstr/" +
        dir.replaceAll("[^0-9.]", "")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true) // fresh replay
      appendStamped(fs, hist.filter(col("doc_id") < 100),
        s"$root/journal", 10000L)
      appendStamped(fs,
        hist.filter(col("doc_id") >= 100 && col("doc_id") < 300),
        s"$root/journal", 20000L)
      appendStamped(fs, hist.filter(col("doc_id") >= 300),
        s"$root/journal", 30000L)
      val stream = s.readStream.schema(hist.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/journal")
      graft.streaming.BloomStream.bloomSync(stream, "text",
          mBits = 1024, k = 3, s"$root/filter", s"$root/ckpt")
        .awaitTermination()
      val loaded = graft.operators.Bloom.load(s, s"$root/filter")
      val batch = clean.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select(col("doc_id"), col("lang"), col("text"))
      val histKeys = hist.select(col("text")).distinct()
        .withColumn("__indexed", lit(1))
      batch.withColumn("member", loaded.memberCol(col("text")))
        .join(broadcast(histKeys), Seq("text"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_batch"),
          sum(when(col("member"), 1L).otherwise(0L)).as("n_member"),
          sum(when(!col("member"), 1L).otherwise(0L)).as("n_admitted"),
          sum(when(col("__indexed").isNotNull, 1L).otherwise(0L))
            .as("n_true_dup"),
          sum(when(col("member") && col("__indexed").isNull, 1L)
            .otherwise(0L)).as("n_false_pos"))
        .orderBy("lang")
    }),
    // Efraimidis–Spirakis weighted sampling without replacement:
    // weight = token count, so long documents are proportionally
    // likelier — the md5 keys make the drawn set a pure function of
    // the corpus, and the oracle replays every key and the top-k
    // selection. Engine cost: a shuffle-free key projection + one
    // bounded TakeOrdered heap.
    "sample_weighted" -> ((s, dir) => {
      val d = docs(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .withColumn("n_tokens",
          size(split(trim(col("text")), "\\s+")).cast("long"))
      graft.operators.Sampling.weightedSample(d, "doc_id", "n_tokens",
          k = 120)
        .select(col("doc_id"), col("n_tokens"))
        .orderBy("doc_id")
    }),
    // Deterministic epoch shuffle: epoch 2 over 8 shards; every row's
    // (shard, pos) replays from md5 arithmetic — the training-data
    // writer's reproducible permutation (re-run any epoch, get the
    // identical byte order).
    "train_shard_shuffle" -> ((s, dir) => {
      graft.operators.Sampling.epochShuffle(
          docs(s, dir).select("doc_id"), "doc_id", epoch = 2, nShards = 8)
        .filter(col("doc_id") < 150)
        .select(col("doc_id"), col("shard").cast("long").as("shard"),
          col("pos"))
        .orderBy("doc_id")
    }),
    // Shard balance + position contiguity: max(pos) == n_docs per
    // shard by construction, and the md5 fraction keeps shard sizes
    // uniform (no hot shard for the per-shard sort to choke on).
    "train_shard_stats" -> ((s, dir) => {
      graft.operators.Sampling.epochShuffle(
          docs(s, dir).select("doc_id"), "doc_id", epoch = 2, nShards = 8)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_id"),
          max("pos").as("max_pos"))
        .select(col("shard").cast("long").as("shard"), col("n_docs"),
          col("sum_id"), col("max_pos"))
        .orderBy("shard")
    }),
  )

  private val baseOracleSql: Map[String, String] = Map(
    "dedup_fuzzy_pairs" ->
      """WITH names AS (
        |  SELECT p_name, CAST(min(p_partkey) AS BIGINT) AS nid,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM part WHERE p_name IS NOT NULL GROUP BY p_name),
        |n2 AS (
        |  SELECT p_name, nid, cnt,
        |    regexp_extract(p_name, '(\S+)$', 1) AS blk
        |  FROM names),
        |pairs AS (
        |  SELECT a.blk, a.nid AS a_id, b.nid AS b_id,
        |         a.cnt AS a_cnt, b.cnt AS b_cnt,
        |         levenshtein(a.p_name, b.p_name) AS dist
        |  FROM n2 a JOIN n2 b ON a.blk = b.blk AND a.nid < b.nid
        |  WHERE a.p_name <> b.p_name
        |    AND levenshtein(a.p_name, b.p_name) <= 2)
        |SELECT blk AS block, CAST(count(*) AS BIGINT) AS n_name_pairs,
        |  CAST(sum(CASE WHEN dist = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_d1,
        |  CAST(sum(a_cnt * b_cnt) AS BIGINT) AS n_row_pairs,
        |  CAST(sum(a_id + b_id) AS BIGINT) AS nid_sum
        |FROM pairs GROUP BY blk ORDER BY block""".stripMargin,
    "dedup_exact_firstwins" ->
      """SELECT lang, source, min(doc_id) AS keep_id
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,
    // Tokenize → 8-gram per position → grams in >= 2 distinct docs →
    // covered positions → gaps-and-islands merge into maximal spans.
    // (Spark shuffles two xxhash64 lanes of the gram instead of the
    // string — injective in practice, so the string replay is exact.)
    "dedup_substring_spans" ->
      """WITH toks AS (
        |  SELECT doc_id AS did, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |pos AS (
        |  SELECT did, t, unnest(range(0, greatest(len(t) - 7, 0))) AS p
        |  FROM toks),
        |grams AS (
        |  SELECT did, p, array_to_string(list_slice(t, p + 1, p + 8), ' ')
        |    AS g
        |  FROM pos),
        |dup AS (
        |  SELECT g FROM grams GROUP BY g
        |  HAVING count(DISTINCT did) >= 2),
        |hits AS (SELECT did, p FROM grams JOIN dup USING (g)),
        |isl AS (
        |  SELECT did, p,
        |    CASE WHEN lag(p) OVER (PARTITION BY did ORDER BY p) IS NULL
        |           OR p > lag(p) OVER (PARTITION BY did ORDER BY p) + 8
        |         THEN 1 ELSE 0 END AS nw
        |  FROM hits),
        |isl2 AS (
        |  SELECT did, p, sum(nw) OVER (PARTITION BY did ORDER BY p
        |    ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl)
        |SELECT did AS doc_id, CAST(min(p) AS BIGINT) AS span_start,
        |  CAST(max(p) + 7 AS BIGINT) AS span_end
        |FROM isl2 GROUP BY did, island
        |ORDER BY doc_id, span_start""".stripMargin,
    // The removal pass: span-covered positions anti-joined out,
    // survivors re-agg'd in position order; md5 over the reassembled
    // text hash-checks the actual string, not just counts.
    "dedup_substring_scrub" ->
      """WITH toks AS (
        |  SELECT doc_id AS did, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |pos AS (
        |  SELECT did, t, unnest(range(0, greatest(len(t) - 7, 0))) AS p
        |  FROM toks),
        |grams AS (
        |  SELECT did, p, array_to_string(list_slice(t, p + 1, p + 8), ' ')
        |    AS g
        |  FROM pos),
        |dup AS (
        |  SELECT g FROM grams GROUP BY g
        |  HAVING count(DISTINCT did) >= 2),
        |hits AS (SELECT did, p FROM grams JOIN dup USING (g)),
        |isl AS (
        |  SELECT did, p,
        |    CASE WHEN lag(p) OVER (PARTITION BY did ORDER BY p) IS NULL
        |           OR p > lag(p) OVER (PARTITION BY did ORDER BY p) + 8
        |         THEN 1 ELSE 0 END AS nw
        |  FROM hits),
        |isl2 AS (
        |  SELECT did, p, sum(nw) OVER (PARTITION BY did ORDER BY p
        |    ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl),
        |spans AS (
        |  SELECT did, min(p) AS s, max(p) + 7 AS e
        |  FROM isl2 GROUP BY did, island),
        |allpos AS (
        |  SELECT did, t, unnest(range(0, len(t))) AS p FROM toks),
        |kept AS (
        |  SELECT a.did, a.p, a.t[a.p + 1] AS tok
        |  FROM allpos a
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM spans s
        |    WHERE s.did = a.did AND a.p BETWEEN s.s AND s.e))
        |SELECT a.did AS doc_id,
        |  CAST(max(len(a.t)) AS BIGINT) AS n_tokens,
        |  CAST(count(k.p) AS BIGINT) AS n_kept,
        |  md5(coalesce(string_agg(k.tok, ' ' ORDER BY k.p), ''))
        |    AS clean_md5
        |FROM allpos a LEFT JOIN kept k ON k.did = a.did AND k.p = a.p
        |GROUP BY a.did
        |HAVING count(k.p) < max(len(a.t))
        |ORDER BY doc_id""".stripMargin,
    // Same span chain as dedup_substring_spans, folded to the corpus
    // kill-rate row (spans disjoint per doc -> length sum = coverage).
    "dedup_substring_stats" ->
      """WITH toks AS (
        |  SELECT doc_id AS did, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |pos AS (
        |  SELECT did, t, unnest(range(0, greatest(len(t) - 7, 0))) AS p
        |  FROM toks),
        |grams AS (
        |  SELECT did, p, array_to_string(list_slice(t, p + 1, p + 8), ' ')
        |    AS g
        |  FROM pos),
        |dup AS (
        |  SELECT g FROM grams GROUP BY g
        |  HAVING count(DISTINCT did) >= 2),
        |hits AS (SELECT did, p FROM grams JOIN dup USING (g)),
        |isl AS (
        |  SELECT did, p,
        |    CASE WHEN lag(p) OVER (PARTITION BY did ORDER BY p) IS NULL
        |           OR p > lag(p) OVER (PARTITION BY did ORDER BY p) + 8
        |         THEN 1 ELSE 0 END AS nw
        |  FROM hits),
        |isl2 AS (
        |  SELECT did, p, sum(nw) OVER (PARTITION BY did ORDER BY p
        |    ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl),
        |spans AS (
        |  SELECT did, min(p) AS s, max(p) + 7 AS e
        |  FROM isl2 GROUP BY did, island),
        |perdoc AS (SELECT did, sum(e - s + 1) AS dup FROM spans GROUP BY did),
        |totals AS (SELECT did, len(t) AS nt FROM toks)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN p.dup IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS docs_hit,
        |  CAST(sum(t.nt) AS BIGINT) AS total_tokens,
        |  CAST(coalesce(sum(p.dup), 0) AS BIGINT) AS dup_tokens,
        |  round(CAST(coalesce(sum(p.dup), 0) AS DOUBLE) / sum(t.nt), 4)
        |    AS kill_rate
        |FROM totals t LEFT JOIN perdoc p USING (did)""".stripMargin,
    "dedup_jaccard_pairs" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 1, 1)),
        |    i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
        |         string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
        |         string_split_regex(trim(text), '\s+')[i+2])) AS g
        |  FROM documents WHERE doc_id < 200)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(CAST(len(list_filter(a.g, x -> list_contains(b.g, x)))
        |          AS DOUBLE)
        |    / (len(a.g) + len(b.g)
        |       - len(list_filter(a.g, x -> list_contains(b.g, x)))), 4)
        |    AS jaccard
        |FROM sh a, sh b
        |WHERE a.doc_id < b.doc_id
        |  AND CAST(len(list_filter(a.g, x -> list_contains(b.g, x))) AS DOUBLE)
        |    / (len(a.g) + len(b.g)
        |       - len(list_filter(a.g, x -> list_contains(b.g, x)))) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    // Replays the md5-fraction sampling: first 8 md5 hex chars of the
    // id as a 32-bit value over 2^32, per-source rate thresholds,
    // per-source aggregates (sum cast BIGINT — DuckDB sums to HUGEINT).
    "sample_mix" ->
      """WITH f AS (
        |  SELECT doc_id, source,
        |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |           AS BIGINT) AS DOUBLE) / 4294967296.0 AS frac
        |  FROM documents),
        |kept AS (
        |  SELECT doc_id, source FROM f
        |  WHERE frac < CASE source
        |    WHEN 'src0' THEN 0.8 WHEN 'src1' THEN 0.5
        |    WHEN 'src2' THEN 0.25 ELSE 0.1 END)
        |SELECT source, count(*) AS n, min(doc_id) AS min_id,
        |       CAST(sum(doc_id) AS BIGINT) AS sum_id
        |FROM kept GROUP BY source ORDER BY source""".stripMargin,
    "sample_group_split" ->
      """WITH f AS (
        |  SELECT source, doc_id,
        |    CASE WHEN CAST(CAST('0x' || substr(md5(source), 1, 8)
        |        AS BIGINT) AS DOUBLE) / 4294967296.0 < 0.6
        |      THEN 'train' ELSE 'holdout' END AS split
        |  FROM documents)
        |SELECT source, split, count(*) AS n, min(doc_id) AS min_id
        |FROM f GROUP BY 1, 2 ORDER BY source, split""".stripMargin,
    "text_canonical" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS canon
        |  FROM documents WHERE doc_id < 40)
        |SELECT doc_id, canon,
        |  row_number() OVER (PARTITION BY canon ORDER BY doc_id) = 1
        |    AS first_wins
        |FROM c ORDER BY doc_id""".stripMargin,
    "sample_temperature" ->
      """WITH c AS (
        |  SELECT source, count(*) AS ns FROM documents GROUP BY source),
        |t AS (
        |  SELECT CAST(sum(ns) AS DOUBLE) AS n,
        |         sum(pow(ns, 0.5)) AS z FROM c),
        |r AS (
        |  SELECT source,
        |    least(1.0, 0.5 * n / z * pow(ns, -0.5)) AS rate
        |  FROM c CROSS JOIN t),
        |f AS (
        |  SELECT doc_id, source,
        |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |           AS BIGINT) AS DOUBLE) / 4294967296.0 AS frac
        |  FROM documents),
        |kept AS (
        |  SELECT doc_id, f.source FROM f JOIN r USING (source)
        |  WHERE frac < rate)
        |SELECT source, count(*) AS n, min(doc_id) AS min_id,
        |       CAST(sum(doc_id) AS BIGINT) AS sum_id
        |FROM kept GROUP BY source ORDER BY source""".stripMargin,
    // DSIR replay: md5 3-hex-char buckets, add-one-smoothed target
    // (lang='en') and raw distributions, per-doc log-ratio sum,
    // deterministic top-100 by (weight desc, id), rounded after
    // selection. Margins checked: rank-100 gap 7.8e-3, nearest 4dp
    // rounding boundary 1.0e-3 from any kept weight — far above
    // cross-engine double-sum noise.
    "sample_dsir" ->
      """WITH d AS (
        |  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |rawtok AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(unnest(w)), 1, 3) AS BIGINT) AS bkt
        |  FROM d),
        |tgttok AS (
        |  SELECT CAST('0x' || substr(md5(unnest(w)), 1, 3) AS BIGINT)
        |    AS bkt
        |  FROM d WHERE lang = 'en'),
        |tgtcnt AS (SELECT bkt, count(*) AS tc FROM tgttok GROUP BY bkt),
        |rawcnt AS (SELECT bkt, count(*) AS rc FROM rawtok GROUP BY bkt),
        |tt AS (SELECT CAST(sum(tc) AS DOUBLE) AS t FROM tgtcnt),
        |rt AS (SELECT CAST(sum(rc) AS DOUBLE) AS rtot FROM rawcnt),
        |ratio AS (
        |  SELECT rawcnt.bkt,
        |    ln(coalesce(tc, 0) + 1.0) - ln(t + 4096.0)
        |      - ln(rc + 1.0) + ln(rtot + 4096.0) AS lr
        |  FROM rawcnt LEFT JOIN tgtcnt USING (bkt)
        |  CROSS JOIN tt CROSS JOIN rt),
        |wts AS (
        |  SELECT doc_id, sum(lr) AS lw
        |  FROM rawtok JOIN ratio USING (bkt) GROUP BY doc_id),
        |sel AS (
        |  SELECT doc_id, lw FROM wts
        |  ORDER BY lw DESC, doc_id LIMIT 100)
        |SELECT doc_id, round(lw, 4) AS log_weight
        |FROM sel ORDER BY doc_id""".stripMargin,
    // Stream replay must land exactly on the batch first-wins result.
    "dedup_stream_firstwins" ->
      """SELECT lang, source, min(doc_id) AS keep_id
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,
    // The textbook form of token-budget selection: one running-sum
    // window per source over (md5-frac, doc_id) order; keep while the
    // preceding sum is under the source's budget. The engine's bucketed
    // two-phase plan must reproduce this exactly.
    "sample_token_budget" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens,
        |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |           AS BIGINT) AS DOUBLE) / 4294967296.0 AS frac
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
        |      ORDER BY frac, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cb
        |  FROM d)
        |SELECT source, doc_id, n_tokens FROM c
        |WHERE cb < CASE source WHEN 'src0' THEN 800 WHEN 'src1' THEN 500
        |  ELSE 600 END
        |ORDER BY source, doc_id""".stripMargin,
    // Replays decontamination: distinct 3-gram shingle sets on both
    // blocks, collision counts per (corpus, bench) pair, >= 2 hits.
    "dedup_decontaminate" ->
      """WITH csh AS (
        |  SELECT doc_id AS corpus_id, list_distinct(list_transform(
        |    range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 1, 1)),
        |    i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
        |         string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
        |         string_split_regex(trim(text), '\s+')[i+2])) AS g
        |  FROM documents WHERE doc_id < 200),
        |bsh AS (
        |  SELECT doc_id AS bench_id, list_distinct(list_transform(
        |    range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 1, 1)),
        |    i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
        |         string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
        |         string_split_regex(trim(text), '\s+')[i+2])) AS g
        |  FROM documents WHERE doc_id >= 200 AND doc_id < 260),
        |ce AS (SELECT corpus_id, unnest(g) AS g FROM csh),
        |be AS (SELECT bench_id, unnest(g) AS g FROM bsh)
        |SELECT ce.corpus_id, be.bench_id, count(*) AS hits
        |FROM ce JOIN be USING (g)
        |GROUP BY ce.corpus_id, be.bench_id
        |HAVING count(*) >= 2
        |ORDER BY corpus_id, bench_id""".stripMargin,
    // Quality-ordered budget replay: the proven qualityScore SQL as the
    // priority, one running-sum window per source over (q DESC, id).
    "sample_quality_budget" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens,
        |    round(
        |    (CASE WHEN len(string_split_regex(trim(text),'\s+'))
        |            BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.3 END) * 0.4
        |  + (CASE WHEN CAST(len(regexp_extract_all(text,'[.!?,;:]')) AS DOUBLE)
        |            / greatest(CAST(len(string_split_regex(trim(text),'\s+'))
        |                AS DOUBLE), 1.0) <= 0.2
        |          THEN 1.0 ELSE 0.5 END) * 0.3
        |  + (CASE WHEN CAST(len(list_filter(string_split_regex(lower(trim(text)),'\s+'),
        |              x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |            / greatest(CAST(len(string_split_regex(trim(text),'\s+'))
        |                AS DOUBLE), 1.0) BETWEEN 0.01 AND 0.5
        |          THEN 1.0 ELSE 0.6 END) * 0.3, 4) AS q
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
        |      ORDER BY q DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cb
        |  FROM d)
        |SELECT source, doc_id, n_tokens FROM c
        |WHERE cb < CASE source WHEN 'src0' THEN 800 ELSE 600 END
        |ORDER BY source, doc_id""".stripMargin,
    // Contamination score replay: distinct corpus shingles per doc,
    // distinct benchmark shingle SET, left join + per-doc hit fraction.
    "decontaminate_score" ->
      """WITH csh AS (
        |  SELECT doc_id AS corpus_id, list_distinct(list_transform(
        |    range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 1, 1)),
        |    i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
        |         string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
        |         string_split_regex(trim(text), '\s+')[i+2])) AS g
        |  FROM documents WHERE doc_id < 200),
        |bsh AS (
        |  SELECT list_distinct(list_transform(
        |    range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 1, 1)),
        |    i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
        |         string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
        |         string_split_regex(trim(text), '\s+')[i+2])) AS g
        |  FROM documents WHERE doc_id >= 200 AND doc_id < 260),
        |ce AS (SELECT corpus_id, unnest(g) AS g FROM csh),
        |bset AS (SELECT DISTINCT unnest(g) AS g FROM bsh),
        |h AS (
        |  SELECT ce.corpus_id, count(*) AS n_shingles,
        |    count(b.g) AS n_hits
        |  FROM ce LEFT JOIN bset b ON ce.g = b.g
        |  GROUP BY ce.corpus_id)
        |SELECT corpus_id, n_shingles, n_hits,
        |  round(CAST(n_hits AS DOUBLE) / n_shingles, 4) AS score
        |FROM h ORDER BY corpus_id""".stripMargin,
    // Full LSH-path oracle: identical md5 minhash signatures -> band
    // buckets (4 bands x 4 rows, bucket = md5 of the joined slice
    // values) -> candidate equi-join -> exact Jaccard refine. Mirrors
    // Dedup.minhashLshPairs(algo = "md5") stage by stage.
    "dedup_minhash_lsh" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
        |  FROM d),
        |mh AS (
        |  SELECT doc_id, dd.d AS d,
        |    min(md5(CAST(dd.d AS VARCHAR) || ' ' || s)) AS m
        |  FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS d) dd
        |  GROUP BY doc_id, dd.d),
        |bands AS (
        |  SELECT doc_id, CAST(d // 4 AS INT) AS band,
        |    md5(string_agg(m, '|' ORDER BY d)) AS bucket
        |  FROM mh GROUP BY doc_id, d // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bucket = b.bucket
        |  WHERE a.doc_id < b.doc_id),
        |g AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |  FROM d),
        |j AS (
        |  SELECT c.a_id, c.b_id,
        |    CAST(len(list_filter(ga.g, x -> list_contains(gb.g, x)))
        |      AS DOUBLE) AS inter,
        |    len(ga.g) AS na, len(gb.g) AS nb
        |  FROM cand c
        |  JOIN g ga ON ga.doc_id = c.a_id
        |  JOIN g gb ON gb.doc_id = c.b_id)
        |SELECT a_id, b_id, round(inter / (na + nb - inter), 4) AS jaccard
        |FROM j WHERE inter / (na + nb - inter) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    // Persisted-path replay: identical md5 signatures and band buckets
    // on both blocks; candidates restricted to corpus-side × delta-side
    // collisions; exact Jaccard refine. The partition-pruned posting
    // probe must lose nothing vs this full candidate join.
    "near_dup_delta" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
        |  FROM d),
        |mh AS (
        |  SELECT doc_id, dd.d AS d,
        |    min(md5(CAST(dd.d AS VARCHAR) || ' ' || s)) AS m
        |  FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS d) dd
        |  GROUP BY doc_id, dd.d),
        |bands AS (
        |  SELECT doc_id, CAST(d // 4 AS INT) AS band,
        |    md5(string_agg(m, '|' ORDER BY d)) AS bucket
        |  FROM mh GROUP BY doc_id, d // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bucket = b.bucket
        |  WHERE a.doc_id >= 60 AND b.doc_id < 60),
        |g AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |  FROM d),
        |j AS (
        |  SELECT c.a_id, c.b_id,
        |    CAST(len(list_filter(ga.g, x -> list_contains(gb.g, x)))
        |      AS DOUBLE) AS inter,
        |    len(ga.g) AS na, len(gb.g) AS nb
        |  FROM cand c
        |  JOIN g ga ON ga.doc_id = c.a_id
        |  JOIN g gb ON gb.doc_id = c.b_id)
        |SELECT a_id AS corpus_id, b_id AS delta_id,
        |  round(inter / (na + nb - inter), 4) AS jaccard
        |FROM j WHERE inter / (na + nb - inter) >= 0.5
        |ORDER BY corpus_id, delta_id""".stripMargin,
    // Bucket-stats replay: same md5 signatures/bands over the corpus
    // block, counts per (band, bucket) at minSize 2, largest first.
    "near_dup_bucket_stats" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents
        |  WHERE doc_id >= 60 AND text IS NOT NULL AND trim(text) <> ''),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
        |  FROM d),
        |mh AS (
        |  SELECT doc_id, dd.d AS d,
        |    min(md5(CAST(dd.d AS VARCHAR) || ' ' || s)) AS m
        |  FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS d) dd
        |  GROUP BY doc_id, dd.d),
        |bands AS (
        |  SELECT doc_id, CAST(d // 4 AS INT) AS band,
        |    md5(string_agg(m, '|' ORDER BY d)) AS bucket
        |  FROM mh GROUP BY doc_id, d // 4)
        |SELECT band, bucket, count(*) AS n
        |FROM bands GROUP BY band, bucket
        |HAVING count(*) >= 2
        |ORDER BY n DESC, band, bucket""".stripMargin,
    // Synced layout ≡ fresh build on the post-change corpus: inserts
    // [130,200) present, deleted 245 absent.
    "near_dup_delta_synced" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
        |  FROM d),
        |mh AS (
        |  SELECT doc_id, dd.d AS d,
        |    min(md5(CAST(dd.d AS VARCHAR) || ' ' || s)) AS m
        |  FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS d) dd
        |  GROUP BY doc_id, dd.d),
        |bands AS (
        |  SELECT doc_id, CAST(d // 4 AS INT) AS band,
        |    md5(string_agg(m, '|' ORDER BY d)) AS bucket
        |  FROM mh GROUP BY doc_id, d // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bucket = b.bucket
        |  WHERE a.doc_id >= 130 AND a.doc_id <> 245 AND b.doc_id < 60),
        |g AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |  FROM d),
        |j AS (
        |  SELECT c.a_id, c.b_id,
        |    CAST(len(list_filter(ga.g, x -> list_contains(gb.g, x)))
        |      AS DOUBLE) AS inter,
        |    len(ga.g) AS na, len(gb.g) AS nb
        |  FROM cand c
        |  JOIN g ga ON ga.doc_id = c.a_id
        |  JOIN g gb ON gb.doc_id = c.b_id)
        |SELECT a_id AS corpus_id, b_id AS delta_id,
        |  round(inter / (na + nb - inter), 4) AS jaccard
        |FROM j WHERE inter / (na + nb - inter) >= 0.5
        |ORDER BY corpus_id, delta_id""".stripMargin,
    // Staged replay of the three admission rounds: the directed
    // near-dup relation `nd` (md5 LSH bands -> exact Jaccard >= 0.5)
    // is computed once; each round exact-dedups its batch (first-wins
    // by md5(text)), rejects members near-dup'ing the CURRENT corpus,
    // closes the pair graph among the survivors with a recursive CTE
    // (intra-batch sweep: only each component's min id is admitted),
    // and the admitted set joins the corpus for the next round.
    // Shingle-less docs never enter the index (len(g) > 0 guard).
    "ingest_neardup_pipeline" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |gd AS (
        |  SELECT doc_id, text, list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |  FROM d
        |  WHERE len(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) > 0),
        |sh AS (SELECT doc_id, unnest(g) AS s FROM gd),
        |mh AS (
        |  SELECT doc_id, dd.d AS d,
        |    min(md5(CAST(dd.d AS VARCHAR) || ' ' || s)) AS m
        |  FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS d) dd
        |  GROUP BY doc_id, dd.d),
        |bands AS (
        |  SELECT doc_id, CAST(d // 4 AS INT) AS band,
        |    md5(string_agg(m, '|' ORDER BY d)) AS bucket
        |  FROM mh GROUP BY doc_id, d // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bucket = b.bucket
        |  WHERE a.doc_id <> b.doc_id),
        |nd AS (
        |  SELECT c.a_id, c.b_id
        |  FROM cand c
        |  JOIN gd ga ON ga.doc_id = c.a_id
        |  JOIN gd gb ON gb.doc_id = c.b_id
        |  WHERE CAST(len(list_filter(ga.g, x -> list_contains(gb.g, x)))
        |      AS DOUBLE)
        |    / (len(ga.g) + len(gb.g)
        |       - len(list_filter(ga.g, x -> list_contains(gb.g, x))))
        |    >= 0.5),
        |c0 AS (SELECT doc_id FROM gd WHERE doc_id >= 300),
        |b1 AS (
        |  SELECT doc_id FROM gd WHERE doc_id < 100
        |  QUALIFY row_number() OVER (PARTITION BY md5(text)
        |    ORDER BY doc_id) = 1),
        |k1 AS (
        |  SELECT doc_id FROM b1 WHERE doc_id NOT IN (
        |    SELECT b_id FROM nd
        |    WHERE a_id IN (SELECT doc_id FROM c0)
        |      AND b_id IN (SELECT doc_id FROM b1))),
        |r1 AS (
        |  SELECT doc_id AS id, doc_id AS r FROM k1
        |  UNION
        |  SELECT r1.id, n.b_id FROM r1 JOIN nd n ON n.a_id = r1.r
        |  WHERE n.b_id IN (SELECT doc_id FROM k1)),
        |a1 AS (SELECT id AS doc_id FROM r1 GROUP BY id HAVING min(r) = id),
        |c1 AS (SELECT doc_id FROM c0 UNION SELECT doc_id FROM a1),
        |b2 AS (
        |  SELECT doc_id FROM gd WHERE doc_id >= 100 AND doc_id < 200
        |  QUALIFY row_number() OVER (PARTITION BY md5(text)
        |    ORDER BY doc_id) = 1),
        |k2 AS (
        |  SELECT doc_id FROM b2 WHERE doc_id NOT IN (
        |    SELECT b_id FROM nd
        |    WHERE a_id IN (SELECT doc_id FROM c1)
        |      AND b_id IN (SELECT doc_id FROM b2))),
        |r2 AS (
        |  SELECT doc_id AS id, doc_id AS r FROM k2
        |  UNION
        |  SELECT r2.id, n.b_id FROM r2 JOIN nd n ON n.a_id = r2.r
        |  WHERE n.b_id IN (SELECT doc_id FROM k2)),
        |a2 AS (SELECT id AS doc_id FROM r2 GROUP BY id HAVING min(r) = id),
        |c2 AS (SELECT doc_id FROM c1 UNION SELECT doc_id FROM a2),
        |b3 AS (
        |  SELECT doc_id FROM gd WHERE doc_id >= 200 AND doc_id < 300
        |  QUALIFY row_number() OVER (PARTITION BY md5(text)
        |    ORDER BY doc_id) = 1),
        |k3 AS (
        |  SELECT doc_id FROM b3 WHERE doc_id NOT IN (
        |    SELECT b_id FROM nd
        |    WHERE a_id IN (SELECT doc_id FROM c2)
        |      AND b_id IN (SELECT doc_id FROM b3))),
        |r3 AS (
        |  SELECT doc_id AS id, doc_id AS r FROM k3
        |  UNION
        |  SELECT r3.id, n.b_id FROM r3 JOIN nd n ON n.a_id = r3.r
        |  WHERE n.b_id IN (SELECT doc_id FROM k3)),
        |a3 AS (SELECT id AS doc_id FROM r3 GROUP BY id HAVING min(r) = id)
        |SELECT doc_id FROM c2
        |UNION SELECT doc_id FROM a3
        |ORDER BY doc_id""".stripMargin,
    // Single-round replay of the multi-file batch: one exact-dedup
    // over all 300 journal docs, one rejection pass against the seed
    // corpus, one recursive closure of the survivors' pair graph.
    "ingest_neardup_multifile" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |gd AS (
        |  SELECT doc_id, text, list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |  FROM d
        |  WHERE len(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) > 0),
        |sh AS (SELECT doc_id, unnest(g) AS s FROM gd),
        |mh AS (
        |  SELECT doc_id, dd.d AS d,
        |    min(md5(CAST(dd.d AS VARCHAR) || ' ' || s)) AS m
        |  FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS d) dd
        |  GROUP BY doc_id, dd.d),
        |bands AS (
        |  SELECT doc_id, CAST(d // 4 AS INT) AS band,
        |    md5(string_agg(m, '|' ORDER BY d)) AS bucket
        |  FROM mh GROUP BY doc_id, d // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bucket = b.bucket
        |  WHERE a.doc_id <> b.doc_id),
        |nd AS (
        |  SELECT c.a_id, c.b_id
        |  FROM cand c
        |  JOIN gd ga ON ga.doc_id = c.a_id
        |  JOIN gd gb ON gb.doc_id = c.b_id
        |  WHERE CAST(len(list_filter(ga.g, x -> list_contains(gb.g, x)))
        |      AS DOUBLE)
        |    / (len(ga.g) + len(gb.g)
        |       - len(list_filter(ga.g, x -> list_contains(gb.g, x))))
        |    >= 0.5),
        |c0 AS (SELECT doc_id FROM gd WHERE doc_id >= 300),
        |b1 AS (
        |  SELECT doc_id FROM gd WHERE doc_id < 300
        |  QUALIFY row_number() OVER (PARTITION BY md5(text)
        |    ORDER BY doc_id) = 1),
        |k1 AS (
        |  SELECT doc_id FROM b1 WHERE doc_id NOT IN (
        |    SELECT b_id FROM nd
        |    WHERE a_id IN (SELECT doc_id FROM c0)
        |      AND b_id IN (SELECT doc_id FROM b1))),
        |r1 AS (
        |  SELECT doc_id AS id, doc_id AS r FROM k1
        |  UNION
        |  SELECT r1.id, n.b_id FROM r1 JOIN nd n ON n.a_id = r1.r
        |  WHERE n.b_id IN (SELECT doc_id FROM k1)),
        |a1 AS (SELECT id AS doc_id FROM r1 GROUP BY id HAVING min(r) = id)
        |SELECT doc_id FROM c0
        |UNION SELECT doc_id FROM a1
        |ORDER BY doc_id""".stripMargin,
    // The dedup_minhash_lsh pair pipeline, closed into components with
    // a recursive CTE: reach(id, r) = ids reachable over the symmetric
    // pair edges, component = min(r) (self included via the seed rows).
    "dedup_groups" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
        |  FROM d),
        |mh AS (
        |  SELECT doc_id, dd.d AS d,
        |    min(md5(CAST(dd.d AS VARCHAR) || ' ' || s)) AS m
        |  FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS d) dd
        |  GROUP BY doc_id, dd.d),
        |bands AS (
        |  SELECT doc_id, CAST(d // 4 AS INT) AS band,
        |    md5(string_agg(m, '|' ORDER BY d)) AS bucket
        |  FROM mh GROUP BY doc_id, d // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bucket = b.bucket
        |  WHERE a.doc_id < b.doc_id),
        |g AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |  FROM d),
        |j AS (
        |  SELECT c.a_id, c.b_id,
        |    CAST(len(list_filter(ga.g, x -> list_contains(gb.g, x)))
        |      AS DOUBLE) AS inter,
        |    len(ga.g) AS na, len(gb.g) AS nb
        |  FROM cand c
        |  JOIN g ga ON ga.doc_id = c.a_id
        |  JOIN g gb ON gb.doc_id = c.b_id),
        |pairs AS (
        |  SELECT a_id, b_id FROM j
        |  WHERE inter / (na + nb - inter) >= 0.5),
        |edges AS (
        |  SELECT a_id AS u, b_id AS v FROM pairs
        |  UNION SELECT b_id, a_id FROM pairs),
        |reach AS (
        |  SELECT u AS id, u AS r FROM edges
        |  UNION
        |  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r)
        |SELECT id AS doc_id, min(r) AS component,
        |  (id = min(r)) AS keep
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    // the PRODUCTION survivor policy: same MinHash/CC machinery, but
    // each near-dup cluster keeps its LONGEST member (ties by min id)
    // instead of the lowest id — you keep the best copy, not the
    // earliest. Replay = the dedup_groups chain + one per-component
    // window over exact char lengths.
    "dedup_groups_best" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
        |  FROM d),
        |mh AS (
        |  SELECT doc_id, dd.d AS d,
        |    min(md5(CAST(dd.d AS VARCHAR) || ' ' || s)) AS m
        |  FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS d) dd
        |  GROUP BY doc_id, dd.d),
        |bands AS (
        |  SELECT doc_id, CAST(d // 4 AS INT) AS band,
        |    md5(string_agg(m, '|' ORDER BY d)) AS bucket
        |  FROM mh GROUP BY doc_id, d // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bucket = b.bucket
        |  WHERE a.doc_id < b.doc_id),
        |g AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |  FROM d),
        |j AS (
        |  SELECT c.a_id, c.b_id,
        |    CAST(len(list_filter(ga.g, x -> list_contains(gb.g, x)))
        |      AS DOUBLE) AS inter,
        |    len(ga.g) AS na, len(gb.g) AS nb
        |  FROM cand c
        |  JOIN g ga ON ga.doc_id = c.a_id
        |  JOIN g gb ON gb.doc_id = c.b_id),
        |pairs AS (
        |  SELECT a_id, b_id FROM j
        |  WHERE inter / (na + nb - inter) >= 0.5),
        |edges AS (
        |  SELECT a_id AS u, b_id AS v FROM pairs
        |  UNION SELECT b_id, a_id FROM pairs),
        |reach AS (
        |  SELECT u AS id, u AS r FROM edges
        |  UNION
        |  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
        |ln AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
        |  FROM documents
        |  WHERE text IS NOT NULL AND trim(text) <> '')
        |SELECT c.id AS doc_id, c.component, ln.n_chars,
        |  (row_number() OVER (PARTITION BY c.component
        |     ORDER BY ln.n_chars DESC, c.id) = 1) AS keep
        |FROM comp c JOIN ln ON ln.doc_id = c.id
        |ORDER BY doc_id""".stripMargin,
    // SemDeDup replay: deterministic first-16 centroids, nearest-cell
    // assignment (list_distance, cell-id tiebreak — the ann_ivf_topk
    // pattern), within-cell cosine pairs, recursive-CTE transitive
    // closure, keep = min id per component; singletons via LEFT JOIN.
    "dedup_semantic" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |cents AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
        |           AS cell,
        |         embedding AS cvec
        |  FROM (SELECT vec_id, embedding FROM corpus
        |        ORDER BY vec_id LIMIT 16)),
        |asg AS (
        |  SELECT c.vec_id, c.embedding, t.cell,
        |    row_number() OVER (PARTITION BY c.vec_id
        |      ORDER BY list_distance(c.embedding, t.cvec), t.cell) AS rn
        |  FROM corpus c CROSS JOIN cents t),
        |cells AS (SELECT vec_id, embedding, cell FROM asg WHERE rn = 1),
        |pairs AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM cells a JOIN cells b
        |    ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4),
        |edges AS (
        |  SELECT a_id AS u, b_id AS v FROM pairs
        |  UNION SELECT b_id, a_id FROM pairs),
        |reach AS (
        |  SELECT u AS id, u AS r FROM edges
        |  UNION
        |  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
        |SELECT c.vec_id AS id,
        |  coalesce(comp.component, c.vec_id) AS component,
        |  (coalesce(comp.component, c.vec_id) = c.vec_id) AS keep
        |FROM cells c LEFT JOIN comp ON comp.id = c.vec_id
        |ORDER BY id""".stripMargin,
    // SemDeDup recall replay: deterministic cells + within-cell pairs
    // (the dedup_semantic machinery) counted against the exact
    // all-pairs truth at the same threshold.
    "dedup_semantic_recall" ->
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  WHERE embedding IS NOT NULL),
        |cents AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
        |           AS cell,
        |         embedding AS cvec
        |  FROM (SELECT vec_id, embedding FROM corpus
        |        ORDER BY vec_id LIMIT 16)),
        |asg AS (
        |  SELECT c.vec_id, c.embedding, t.cell,
        |    row_number() OVER (PARTITION BY c.vec_id
        |      ORDER BY list_distance(c.embedding, t.cvec), t.cell) AS rn
        |  FROM corpus c CROSS JOIN cents t),
        |cells AS (SELECT vec_id, embedding, cell FROM asg WHERE rn = 1),
        |truth AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4),
        |found AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM cells a JOIN cells b
        |    ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_true,
        |    CAST(count(f.a_id) AS BIGINT) AS n_found
        |  FROM truth t LEFT JOIN found f
        |    ON t.a_id = f.a_id AND t.b_id = f.b_id)
        |SELECT n_true, n_found, n_true - n_found AS n_cross_cell,
        |  round(CAST(n_found AS DOUBLE) /
        |    greatest(n_true, 1), 4) AS recall
        |FROM agg""".stripMargin,
    // Trained SemDeDup replay: the ann_ivf_trained_topk training
    // recipe (md5-ordered 128-sample, 2^20 integer grid, two unrolled
    // integer-Lloyd iterations with floorDiv means and lowest-index
    // ties) over the WHOLE non-null corpus, frozen-centroid
    // assignment, then the dedup_semantic within-cell pair + closure
    // machinery unchanged.
    "dedup_semantic_trained" ->
      """WITH RECURSIVE dims AS (SELECT unnest(range(0, 64)) AS d),
        |samp AS (
        |  SELECT r, embedding FROM (
        |    SELECT embedding,
        |      row_number() OVER (
        |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS r
        |    FROM embeddings WHERE embedding IS NOT NULL)
        |  WHERE r < 128),
        |sp AS (
        |  SELECT s.r, dd.d,
        |    CAST(floor(CAST(s.embedding[dd.d + 1] AS DOUBLE) * 1048576)
        |      AS BIGINT) AS y
        |  FROM samp s, dims dd),
        |c0 AS (SELECT r AS j, d, y FROM sp WHERE r < 16),
        |d1 AS (
        |  SELECT p.r, c.j, sum((p.y - c.y) * (p.y - c.y)) AS d2
        |  FROM sp p JOIN c0 c ON c.d = p.d
        |  GROUP BY p.r, c.j),
        |m1 AS (SELECT r, j FROM (
        |  SELECT r, j, row_number() OVER (PARTITION BY r ORDER BY d2, j)
        |    AS rn FROM d1) WHERE rn = 1),
        |g1 AS (
        |  SELECT m.j, p.d, CAST(sum(p.y) AS BIGINT) AS sy,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM m1 m JOIN sp p ON p.r = m.r
        |  GROUP BY m.j, p.d),
        |c1 AS (
        |  SELECT c0.j, c0.d,
        |    COALESCE(CAST((g1.sy - (((g1.sy % g1.c) + g1.c) % g1.c))
        |      / g1.c AS BIGINT), c0.y) AS y
        |  FROM c0 LEFT JOIN g1 ON g1.j = c0.j AND g1.d = c0.d),
        |d2i AS (
        |  SELECT p.r, c.j, sum((p.y - c.y) * (p.y - c.y)) AS d2
        |  FROM sp p JOIN c1 c ON c.d = p.d
        |  GROUP BY p.r, c.j),
        |m2 AS (SELECT r, j FROM (
        |  SELECT r, j, row_number() OVER (PARTITION BY r ORDER BY d2, j)
        |    AS rn FROM d2i) WHERE rn = 1),
        |g2 AS (
        |  SELECT m.j, p.d, CAST(sum(p.y) AS BIGINT) AS sy,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM m2 m JOIN sp p ON p.r = m.r
        |  GROUP BY m.j, p.d),
        |c2 AS (
        |  SELECT c1.j, c1.d,
        |    COALESCE(CAST((g2.sy - (((g2.sy % g2.c) + g2.c) % g2.c))
        |      / g2.c AS BIGINT), c1.y) AS y
        |  FROM c1 LEFT JOIN g2 ON g2.j = c1.j AND g2.d = c1.d),
        |cents AS (
        |  SELECT CAST(j AS INT) AS cell,
        |    list(y / 1048576.0 ORDER BY d) AS cvec
        |  FROM c2 GROUP BY j),
        |corpus AS (
        |  SELECT vec_id, embedding, embedding::DOUBLE[] AS v
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |asg AS (
        |  SELECT c.vec_id, c.embedding, t.cell,
        |    row_number() OVER (PARTITION BY c.vec_id
        |      ORDER BY list_distance(c.v, t.cvec), t.cell) AS rn
        |  FROM corpus c CROSS JOIN cents t),
        |cells AS (SELECT vec_id, embedding, cell FROM asg WHERE rn = 1),
        |pairs AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM cells a JOIN cells b
        |    ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4),
        |edges AS (
        |  SELECT a_id AS u, b_id AS v FROM pairs
        |  UNION SELECT b_id, a_id FROM pairs),
        |reach AS (
        |  SELECT u AS id, u AS r FROM edges
        |  UNION
        |  SELECT reach.id, e.v FROM reach JOIN edges e ON e.u = reach.r),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
        |SELECT c.vec_id AS id,
        |  coalesce(comp.component, c.vec_id) AS component,
        |  (coalesce(comp.component, c.vec_id) = c.vec_id) AS keep
        |FROM cells c LEFT JOIN comp ON comp.id = c.vec_id
        |ORDER BY id""".stripMargin,
    // Per-bit simhash reconstruction: token -> md5 hex -> bit b of the
    // big-endian first-8-byte value via hex-nibble arithmetic (hex char
    // 16 - b/4, bit b%4 within the nibble); votes sum +1/-1 per token,
    // sign sets the signature bit; Hamming distance = count of differing
    // bits. Exactly graft.functions.SimHash64(algo = "md5").
    "dedup_simhash" ->
      """WITH d AS (
        |  SELECT doc_id, trim(text) AS t FROM documents
        |  WHERE doc_id < 200 AND text IS NOT NULL AND trim(text) <> ''),
        |tok AS (
        |  SELECT doc_id, unnest(string_split_regex(t, '\s+')) AS tk FROM d),
        |th AS (SELECT doc_id, md5(tk) AS h FROM tok),
        |bits AS (
        |  SELECT doc_id, bb.b AS b,
        |    CASE WHEN ((strpos('0123456789abcdef',
        |                  substr(h, CAST(16 - bb.b // 4 AS INT), 1)) - 1)
        |               >> CAST(bb.b % 4 AS INT)) & 1 = 1
        |      THEN 1 ELSE -1 END AS vote
        |  FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bb),
        |sig AS (
        |  SELECT doc_id, b, (sum(vote) > 0) AS bit
        |  FROM bits GROUP BY doc_id, b),
        |ham AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS ham
        |  FROM sig a JOIN sig b ON a.b = b.b AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT a_id, b_id, CAST(ham AS BIGINT) AS ham
        |FROM ham WHERE ham <= 6 ORDER BY a_id, b_id""".stripMargin,
    // Bloom replay: the filter's lit positions are the distinct
    // md5-mod-m values of the history keys; a batch key is "member"
    // iff all three of its positions are lit — identical to the
    // engine's bitmap bit test, false positives included.
    "dedup_bloom_novel" ->
      """WITH hist AS (
        |  SELECT DISTINCT text FROM documents
        |  WHERE doc_id % 3 <> 0 AND text IS NOT NULL AND trim(text) <> ''),
        |js AS (SELECT unnest(range(0, 3)) AS j),
        |pos AS (
        |  SELECT DISTINCT
        |    CAST('0x' || substr(md5(h.text || '|' || CAST(js.j AS VARCHAR)),
        |                        1, 15) AS BIGINT) % 1024 AS p
        |  FROM hist h CROSS JOIN js),
        |batch AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE doc_id % 3 = 0 AND text IS NOT NULL AND trim(text) <> ''),
        |verd AS (
        |  SELECT b.doc_id, b.lang,
        |    bool_and(
        |      CAST('0x' || substr(md5(b.text || '|' || CAST(js.j AS VARCHAR)),
        |                          1, 15) AS BIGINT) % 1024
        |        IN (SELECT p FROM pos)) AS member,
        |    bool_or(b.text IN (SELECT text FROM hist)) AS truedup
        |  FROM batch b CROSS JOIN js
        |  GROUP BY b.doc_id, b.lang)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_batch,
        |  CAST(sum(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT) AS n_member,
        |  CAST(sum(CASE WHEN member THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_admitted,
        |  CAST(sum(CASE WHEN truedup THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_true_dup,
        |  CAST(sum(CASE WHEN member AND NOT truedup THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_false_pos
        |FROM verd GROUP BY lang ORDER BY lang""".stripMargin,
    // Bloom telemetry replay: bits_set = count of distinct lit
    // positions; fill and fpp in the same integer units as the engine.
    "dedup_bloom_stats" ->
      """WITH hist AS (
        |  SELECT DISTINCT text FROM documents
        |  WHERE doc_id % 3 <> 0 AND text IS NOT NULL AND trim(text) <> ''),
        |js AS (SELECT unnest(range(0, 3)) AS j),
        |pos AS (
        |  SELECT DISTINCT
        |    CAST('0x' || substr(md5(h.text || '|' || CAST(js.j AS VARCHAR)),
        |                        1, 15) AS BIGINT) % 4096 AS p
        |  FROM hist h CROSS JOIN js),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM pos),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_keys FROM hist)
        |SELECT CAST(4096 AS BIGINT) AS m_bits, CAST(3 AS BIGINT) AS k,
        |  n.n_keys, s.bits_set,
        |  (s.bits_set * CAST(1000 AS BIGINT)) // CAST(4096 AS BIGINT)
        |    AS fill_permille,
        |  (s.bits_set * s.bits_set * s.bits_set * CAST(1000000 AS BIGINT))
        |    // CAST(68719476736 AS BIGINT) AS fpp_micro
        |FROM s, n""".stripMargin,
    // Round-trip replay: admission through the REOPENED filter must
    // equal the build's verdicts — same md5 position arithmetic, k and
    // m being the build constants the artifact carries.
    "dedup_bloom_roundtrip" ->
      """WITH hist AS (
        |  SELECT DISTINCT text FROM documents
        |  WHERE doc_id % 3 <> 0 AND text IS NOT NULL AND trim(text) <> ''),
        |js AS (SELECT unnest(range(0, 3)) AS j),
        |pos AS (
        |  SELECT DISTINCT
        |    CAST('0x' || substr(md5(h.text || '|' || CAST(js.j AS VARCHAR)),
        |                        1, 15) AS BIGINT) % 1024 AS p
        |  FROM hist h CROSS JOIN js),
        |batch AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE doc_id % 3 = 0 AND text IS NOT NULL AND trim(text) <> ''),
        |verd AS (
        |  SELECT b.doc_id, b.lang,
        |    bool_and(
        |      CAST('0x' || substr(md5(b.text || '|' || CAST(js.j AS VARCHAR)),
        |                          1, 15) AS BIGINT) % 1024
        |        IN (SELECT p FROM pos)) AS member
        |  FROM batch b CROSS JOIN js
        |  GROUP BY b.doc_id, b.lang)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_admitted,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  CAST(1024 AS BIGINT) AS m_bits, CAST(3 AS BIGINT) AS k
        |FROM verd WHERE NOT member GROUP BY lang ORDER BY lang""".stripMargin,
    // A-Res replay: key = frac^(1/w), top-120 by (key desc, id).
    "sample_weighted" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |k AS (
        |  SELECT doc_id, n_tokens,
        |    pow(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |          AS BIGINT) / 4294967296.0, 1.0 / n_tokens) AS ky
        |  FROM d WHERE n_tokens > 0),
        |sel AS (
        |  SELECT doc_id, n_tokens FROM k
        |  ORDER BY ky DESC, doc_id LIMIT 120)
        |SELECT doc_id, n_tokens FROM sel ORDER BY doc_id""".stripMargin,
    // Epoch-shuffle replay: frac = md5('2|id'), shard = floor(frac·8),
    // pos = rank of (frac, id) within the shard.
    "train_shard_shuffle" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5('2|' || CAST(doc_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) / 4294967296.0 AS frac
        |  FROM documents),
        |a AS (
        |  SELECT doc_id, CAST(floor(frac * 8) AS BIGINT) AS shard,
        |    row_number() OVER (
        |      PARTITION BY CAST(floor(frac * 8) AS BIGINT)
        |      ORDER BY frac, doc_id) AS pos
        |  FROM f)
        |SELECT doc_id, shard, CAST(pos AS BIGINT) AS pos
        |FROM a WHERE doc_id < 150 ORDER BY doc_id""".stripMargin,
    "train_shard_stats" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5('2|' || CAST(doc_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) / 4294967296.0 AS frac
        |  FROM documents),
        |a AS (
        |  SELECT doc_id, CAST(floor(frac * 8) AS BIGINT) AS shard,
        |    row_number() OVER (
        |      PARTITION BY CAST(floor(frac * 8) AS BIGINT)
        |      ORDER BY frac, doc_id) AS pos
        |  FROM f)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
        |  CAST(max(pos) AS BIGINT) AS max_pos
        |FROM a GROUP BY shard ORDER BY shard""".stripMargin,
  )

  /** The merged shard index holds exactly a full build's rows (every
    * persisted column is a pure per-row function), so its probe reuses
    * near_dup_delta's oracle verbatim. */
  /** Phase split for the shard-merge cell (merged into
    * SparkEntry.phases): two concurrent shard builds + the file-move
    * merge dominate; the probe is the leg the cell claims to measure. */
  val phases: Map[String, (SparkSession, String) => Map[String, Double]] =
    Map(
      "near_dup_shard_merged" -> ((s, dir) => {
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime()
          val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val d = docs(s, dir)
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_ndshard_ph/" +
          dir.replaceAll("[^0-9.]", "")
        val shardPaths = Seq(s"$root/shard0", s"$root/shard1")
        def buildShard(p: Int): Unit = graft.operators.NearDupIndex.persist(
          d.filter(col("doc_id") >= 60 && pmod(col("doc_id"), lit(2)) === p),
          "doc_id", "text", shardPaths(p), algo = "md5")
        val (_, build) = timed {
          graft.index.PartitionedLayout.inParallel(buildShard(0),
            buildShard(1))
        }
        val (merged, merge) = timed {
          graft.operators.NearDupIndex.mergeShards(s, shardPaths,
            s"$root/merged")
        }
        val (_, probe) = timed {
          graft.operators.NearDupIndex.nearDupsAgainst(s, merged,
            d.filter(col("doc_id") < 60), "doc_id", "text",
            threshold = 0.5).count()
        }
        Map("build" -> build, "merge" -> merge, "probe" -> probe)
      }),
      // The r11 watch item: the cell drifted 2.45 -> 3.3 s between
      // driver hosts while being streaming-engine-setup dominated
      // (10 jobs, 100 output rows). The split makes the drift
      // attributable: journal = fixture write, drain = the stateful
      // streaming run (engine setup + 3 micro-batches), ledger = the
      // final batch read-and-sort.
      "dedup_stream_firstwins" -> ((s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime()
          val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val d = docs(s, dir).select("doc_id", "lang", "source")
        val root =
          s"${System.getProperty("java.io.tmpdir")}/graft_dedupstr_ph/" +
            dir.replaceAll("[^0-9.]", "")
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val (_, journal) = timed {
          appendStamped(fs, d.filter(col("doc_id") < 100),
            s"$root/journal", 10000L)
          appendStamped(fs,
            d.filter(col("doc_id") >= 100 && col("doc_id") < 300),
            s"$root/journal", 20000L)
          appendStamped(fs, d.filter(col("doc_id") >= 300),
            s"$root/journal", 30000L)
        }
        val (_, drain) = timed {
          val stream = s.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$root/journal")
          graft.streaming.DedupStream
            .firstWins(stream, Seq("lang", "source"), "doc_id")
            .writeStream.trigger(Trigger.AvailableNow())
            .option("checkpointLocation", s"$root/ckpt")
            .format("parquet").option("path", s"$root/out")
            .start().awaitTermination()
        }
        val (_, ledger) = timed {
          s.read.parquet(s"$root/out")
            .select(col("lang"), col("source"), col("doc_id"))
            .orderBy("lang", "source").count()
        }
        Map("journal" -> journal, "drain" -> drain, "ledger" -> ledger)
      }))

  val oracleSql: Map[String, String] =
    baseOracleSql +
      ("near_dup_shard_merged" -> baseOracleSql("near_dup_delta")) +
      // the stream-folded filter equals the batch build bit for bit
      // (OR is associative + idempotent), so the admission ledger
      // replays identically
      ("dedup_bloom_stream" -> baseOracleSql("dedup_bloom_novel"))
}

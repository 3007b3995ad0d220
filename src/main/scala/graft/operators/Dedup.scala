package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus-scale deduplication operators: exact, n-gram Jaccard,
  * MinHash+LSH and SimHash. Embedding-cosine near-dup lives in
  * graft.search (it shares the KNN kernels).
  *
  * Design for 100 TB: exact dedup is one hash-partitioned groupBy;
  * MinHash/LSH turns the quadratic pair search into an equi-join on
  * band buckets (shuffle on bucket id, candidates only); brute-force
  * Jaccard is kept for ground truth / small blocks only.
  */
object Dedup {

  /** First-wins exact dedup: keep the lowest `orderCol` row per key
    * group. One shuffle on the key columns. */
  def exactFirstWins(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Word n-gram shingles, distinct, as an array column. Empty when the
    * text has fewer than n tokens. Single Catalyst expression
    * (graft.functions.WordShingles) — a HOF composition here gets
    * inlined per downstream reference and re-splits the text per gram. */
  def shingles(c: Column, n: Int = 3): Column =
    graft.functions.TextExpressions.wordShingles(c, n)

  /** Stage `(id, shingle-set)` as its own projection. */
  def withShingles(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))

  /** Exact Jaccard over two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(filter(a, x => array_contains(b, x))).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Jaccard from a pre-staged intersection-size column (avoids computing
    * the set intersection twice — numerator and denominator). Shingle
    * arrays from WordShingles are sorted, so the intersection is a
    * linear merge, not a quadratic contains-scan. */
  private[operators] def jaccardStaged(df: DataFrame,
      threshold: Double): DataFrame =
    df.withColumn("__inter",
        graft.functions.TextExpressions
          .sortedIntersectSize(col("a_sh"), col("b_sh")).cast("double"))
      .withColumn("jaccard",
        col("__inter") / (size(col("a_sh")) + size(col("b_sh")) - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))

  /** Benchmark decontamination — the training-pipeline step that flags
    * corpus documents overlapping an evaluation set (the n-gram
    * collision recipe GPT-3/Gopher-style pipelines apply before
    * training): a corpus doc is contaminated when it shares at least
    * `minHits` distinct n-gram shingles with a benchmark doc.
    *
    * Relational shape: explode both sides' (distinct, sorted) shingle
    * sets and equi-join on the shingle STRING — one shuffle keyed by
    * shingle, never corpus × benchmarks. The benchmark side is tiny by
    * nature (eval sets), so at 100 TB the join broadcasts it and the
    * corpus side stays a single codegen pass. Returns
    * `(<corpusIdCol>, <benchIdCol>, hits)` for flagged pairs; anti-join
    * the result's ids to actually drop them. */
  def decontaminate(corpus: DataFrame, corpusIdCol: String,
      corpusTextCol: String, benchmarks: DataFrame, benchIdCol: String,
      benchTextCol: String, n: Int = 8, minHits: Int = 1): DataFrame = {
    val cEx = withShingles(corpus, corpusIdCol, corpusTextCol, n)
      .select(col("id").as("__doc"), explode(col("sh")).as("__g"))
    val bEx = withShingles(benchmarks, benchIdCol, benchTextCol, n)
      .select(col("id").as("__bench"), explode(col("sh")).as("__g"))
    cEx.join(bEx, "__g")
      .groupBy("__doc", "__bench")
      .agg(count(lit(1)).as("hits")) // shingle sets are distinct per doc
      .filter(col("hits") >= minHits)
      .select(col("__doc").as(corpusIdCol), col("__bench").as(benchIdCol),
        col("hits"))
  }

  /** Per-document contamination SCORE — the fraction of a corpus doc's
    * distinct n-gram shingles that occur anywhere in the benchmark set
    * (the overlap metric decontamination thresholds are stated in:
    * "drop documents with > X% n-gram overlap with any eval set").
    * [[decontaminate]] answers "which (doc, benchmark) pairs collide";
    * this answers "how contaminated is each doc", including clean docs
    * at score 0 — the column a pipeline filters or audits on.
    *
    * Relational shape: the benchmark side collapses to its DISTINCT
    * shingle set (tiny — eval suites), broadcast against the exploded
    * corpus shingles; hits and totals aggregate per doc in one partial+
    * final agg. One shuffle keyed by doc id, never corpus × benchmarks,
    * and the corpus is read once. Returns
    * `(<corpusIdCol>, n_shingles, n_hits, score)` for every corpus doc
    * with at least one shingle. */
  def contaminationScore(corpus: DataFrame, corpusIdCol: String,
      corpusTextCol: String, benchmarks: DataFrame, benchTextCol: String,
      n: Int = 8): DataFrame = {
    val cEx = withShingles(corpus, corpusIdCol, corpusTextCol, n)
      .select(col("id").as("__doc"), explode(col("sh")).as("__g"))
    val bSet = benchmarks
      .select(explode(shingles(col(benchTextCol), n)).as("__g"))
      .distinct()
    cEx.join(broadcast(bSet.withColumn("__hit", lit(1))), Seq("__g"), "left")
      .groupBy("__doc")
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum("__hit"), lit(0L)).as("n_hits"))
      .select(col("__doc").as(corpusIdCol), col("n_shingles"),
        col("n_hits"),
        round(col("n_hits").cast("double") / col("n_shingles"), 4)
          .as("score"))
  }

  /** Brute-force near-duplicate pairs by n-gram Jaccard (ground truth;
    * quadratic — keep for small blocks, LSH is the scale path). */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3): DataFrame = {
    val sh = withShingles(docs, idCol, textCol, n)
    val a = sh.toDF("a_id", "a_sh")
    val b = sh.toDF("b_id", "b_sh")
    jaccardStaged(a.join(b, col("a_id") < col("b_id")), threshold)
  }

  /** MinHash signature: for each of `k` seeded hash functions, the min
    * xxhash64 over the shingle set. Single expression, one pass. */
  def minhashSignature(shCol: Column, k: Int = 16): Column =
    graft.functions.TextExpressions.minhashSig(shCol, k)

  /** MinHash+LSH candidate pairs: band the signature, explode to
    * (band, bucket) keys, equi-join on the bucket — the scale path that
    * replaces the quadratic pair search with a shuffle on bucket id.
    * Candidates are then verified with exact Jaccard (refine step).
    *
    * `algo = "md5"` switches the signature to MD5-hex minhashes
    * (graft.functions.MinHashSigMd5): slower per shingle but every
    * signature value — and therefore the candidate set itself — is
    * reproducible as plain SQL on any engine, so the LSH stage is
    * DuckDB-oracle-checkable, not just spec-trusted. "xx" (xxhash64)
    * remains the 100 TB default.
    */
  /** `maxBucket` is the hot-bucket guard for corpus-scale runs: a viral
    * near-duplicate cluster (templated spam, boilerplate) shares every
    * band, so ONE bucket goes quadratic in the candidate join — at
    * 100 TB that is the task that never finishes. Buckets holding more
    * than `maxBucket` docs are excluded from candidate generation (an
    * EXPLICIT recall trade, the standard production guard; run
    * [[exactFirstWins]] on canonical text first so identical clusters
    * collapse before they ever form a hot bucket). `None` (default)
    * keeps exact LSH semantics — the oracle-checked configuration. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 16, bands: Int = 4, n: Int = 3,
      algo: String = "xx", maxBucket: Option[Int] = None): DataFrame = {
    val rowsPerBand = k / bands
    // The shingle+signature projection feeds three consumers (banding and
    // both sides of the refine join): materialize it once instead of
    // running WordShingles/MinHash over the corpus four times. An eager
    // localCheckpoint (not .persist) so the blocks are reclaimed when the
    // result is garbage-collected — a plain persist here outlives the
    // query with no unpersist hook, leaking executor memory across a
    // long session. At 100 TB this is the projection you'd checkpoint
    // to storage between stages.
    val sig =
      if (algo == "md5") graft.functions.TextExpressions.minhashSigMd5(col("sh"), k)
      else minhashSignature(col("sh"), k)
    val sh = withShingles(docs, idCol, textCol, n)
      .filter(size(col("sh")) > 0)
      .withColumn("sig", sig)
      .localCheckpoint(true)
    // bucket keys only — keep the (large) shingle arrays out of the
    // candidate shuffle and distinct; re-join them for the refine step.
    // md5 signatures band by md5 OF the joined slice values: still a pure
    // SQL-reproducible function (DuckDB md5 yields the same hex), but the
    // shuffle key is 32 chars instead of rowsPerBand×33 — the band join
    // and the candidate distinct move 4× fewer key bytes. xx signatures
    // band by murmur hash of the slice (the 100 TB default).
    val bucketOf: Column => Column =
      if (algo == "md5") sl => md5(concat_ws("|", sl))
      else sl => hash(sl).cast("string")
    val banded = sh.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => bucketOf(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
        .as(Seq("band", "bucket")))
    val capped = maxBucket match {
      case None => banded
      case Some(cap) =>
        // one small agg keyed like the join itself; hot buckets are by
        // definition few, so the keep-set join stays a broadcast
        val sizes = banded.groupBy("band", "bucket")
          .agg(count(lit(1)).as("__bn"))
        banded.join(broadcast(sizes.filter(col("__bn") > cap)
            .select("band", "bucket")),
          Seq("band", "bucket"), "left_anti")
          // the using-join puts its keys first; the positional toDF
          // renames below need the original (id, band, bucket) order
          .select("id", "band", "bucket")
    }
    val a = capped.toDF("a_id", "band", "bucket")
    val b = capped.toDF("b_id", "band", "bucket")
    val cand = a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val withSh = cand
      .join(sh.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(sh.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
    jaccardStaged(withSh, threshold)
  }

  /** Embedding-cosine near-duplicate pairs at scale: LSH self-join on
    * the vector column prunes candidates, exact cosine refines. The
    * brute-force variant (a_id < b_id cross join + cosine filter) is the
    * oracle ground truth; this path replaces the quadratic join with
    * bucket collisions. Vectors should be L2-normalized so the cosine
    * threshold maps to an L2 radius: ||a-b||² = 2(1-cos).
    *
    * `l2RadiusOverride` decouples the candidate radius from the cosine
    * threshold (needed for un-normalized vectors, where no radius maps to
    * a cosine bound). With a large override AND a large `bucketLength`
    * every pair becomes a candidate, so the output degenerates to exactly
    * the brute-force pair set — the degeneracy that lets the DuckDB
    * oracle hash-check this whole path (candidates ⊇ all pairs ⇒ output ≡
    * cosine filter alone). */
  def embeddingNearDupLsh(vectors: DataFrame, idCol: String, vecCol: String,
      cosineThreshold: Double, bucketLength: Double = 1.0,
      numTables: Int = 4, seed: Long = 42L,
      l2RadiusOverride: Option[Double] = None): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.functions.array_to_vector
    import graft.functions.{VectorFunctions => VF}
    val l2Radius = l2RadiusOverride.getOrElse(
      math.sqrt(2.0 * (1.0 - cosineThreshold)))
    // fit + both sides of the self-join consume this projection:
    // materialize once (same multi-consumer pattern — and same
    // leak-free eager-checkpoint rationale — as minhashLshPairs)
    val withVec = vectors.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("__mlvec", array_to_vector(col("v")))
      .localCheckpoint(true)
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("__mlvec").setOutputCol("__hashes")
      .setBucketLength(bucketLength).setNumHashTables(numTables)
      .setSeed(seed)
    val model = lsh.fit(withVec)
    val joined = model.approxSimilarityJoin(withVec, withVec, l2Radius,
      "l2dist")
    joined
      .select(col("datasetA.id").as("a_id"), col("datasetA.v").as("a_v"),
        col("datasetB.id").as("b_id"), col("datasetB.v").as("b_v"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("score", VF.cosine(col("a_v"), col("b_v")))
      .filter(col("score") > cosineThreshold)
      .select(col("a_id"), col("b_id"), round(col("score"), 4).as("score"))
  }

  /** Chunk-level first-wins dedup (C4-style paragraph dedup at token-chunk
    * granularity): split each doc's tokens into fixed-size non-overlapping
    * chunks, then keep only the first occurrence of each chunk text across
    * the corpus (ordered by doc id, then position). Returns one row per
    * chunk: `(id, pos, chunk, kept)` — callers aggregate survival
    * fractions or reassemble kept chunks.
    *
    * Scale shape: one explode (no driver collect), one shuffle on the
    * chunk text for the global first-wins window. At 100 TB the window key
    * should be `xxhash64(chunk)` to keep the exchange narrow; the raw text
    * is kept here because the oracle compares chunk strings. */
  def chunkFirstWins(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, carryCols: Seq[String] = Nil): DataFrame = {
    require(chunkTokens >= 1)
    val toks = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol).as("id") +: carryCols.map(col) :+
        split(trim(col(textCol)), "\\s+").as("t"): _*)
    val nChunks = ceil(size(col("t")).cast("double") / chunkTokens).cast("long")
    val chunks = toks.select(col("id") +: carryCols.map(col) :+
      posexplode(transform(sequence(lit(0L), nChunks - 1),
        i => concat_ws(" ",
          slice(col("t"), (i * chunkTokens + 1).cast("int"), lit(chunkTokens)))))
        .as(Seq("pos", "chunk")): _*)
    val w = Window.partitionBy("chunk").orderBy(col("id").asc, col("pos").asc)
    chunks.withColumn("kept",
      (row_number().over(w) === 1).cast("int"))
  }

  /** Frequent-line boilerplate removal (the RefinedWeb / CCNet line
    * dedup: arXiv:2306.01116 §3.3, arXiv:1911.00359 §3.1): a line
    * whose normalized form (`lower(trim(..))`) appears in at least
    * `minDocs` DISTINCT documents is boilerplate (nav bars, cookie
    * banners, license headers — templated text that survives per-doc
    * quality gates because every copy looks fine in isolation) and is
    * struck from every document; surviving lines are re-joined in
    * their original order. Distinct-doc counting — not raw occurrence
    * counting — so a single doc repeating its own refrain is NOT
    * boilerplate (that is [[Dedup.dupTokenFraction]]'s territory).
    *
    * Returns one row per input doc:
    * `(idCol, <carryCols…>, n_lines, n_removed, textCol)` — a doc
    * whose every line is boilerplate keeps its row with empty text,
    * so downstream falsy filters own the drop decision. Blank lines
    * count like any line: once `minDocs` docs contain one (e.g.
    * paragraph breaks), every blank line is struck — run this BEFORE
    * formatting-sensitive stages, or pre-normalize blank runs.
    *
    * Scale shape: one explode, one distinct-count aggregation keyed
    * on the normalized line (at 100 TB the shuffle key becomes the
    * line's 128-bit hash, the [[chunkFirstWins]] convention), one
    * join of the SMALL hot-line table (only lines crossing the
    * threshold — broadcastable by construction, AQE picks that up),
    * and one re-group by doc id. Never all-pairs, no driver state. */
  def frequentLineDedup(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Int, carryCols: Seq[String] = Nil): DataFrame = {
    require(minDocs >= 2, s"minDocs=$minDocs: below 2 every line is hot")
    val lines = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol) +: carryCols.map(col) :+
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")): _*)
      .withColumn("__key", lower(trim(col("__line"))))
    val hot = lines.groupBy("__key")
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col("__key"), lit(1).as("__hot"))
    val keepCols = col(idCol) +: carryCols.map(col)
    lines.join(hot, Seq("__key"), "left")
      .groupBy(keepCols: _*)
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("__hot").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        // ordered reassembly: nulls (hot lines) vanish from
        // collect_list, survivors sort back into document order
        array_join(transform(array_sort(collect_list(
          when(col("__hot").isNull,
            struct(col("__pos").as("p"), col("__line").as("l"))))),
          x => x.getField("l")), "\n").as(textCol))
  }

  /** Blocked fuzzy self-join — the entity-resolution primitive (near-
    * identical names/titles differing by typos): candidate pairs come
    * from an EQUI-join on a blocking key (never all-pairs — the
    * [[minhashLshPairs]] discipline, with the same viral-block guard),
    * then verify with Levenshtein edit distance. The distance call is
    * the THRESHOLDED form: Spark's banded DP stops at `maxDist + 1`
    * (O(maxDist·min(n,m)) per pair, not O(n·m)) — at 100 TB the
    * verify cost is linear in string length, and the shuffle keys on
    * the block, so block sizes bound the quadratic term exactly like
    * LSH bucket sizes do.
    *
    * Returns `(a_id, b_id, a_str, b_str, dist)` with `a_id < b_id`,
    * identical strings excluded (exact dedup owns those). `maxBlock`
    * drops blocks larger than the cap — a degenerate blocking key
    * (half the corpus in one block) otherwise re-creates the
    * quadratic blowup blocking exists to prevent.
    *
    * Heavy-duplicate string domains (catalog names, titles): run this
    * over the DISTINCT-string relation and recover row-level pair mass
    * by multiplying the two strings' multiplicities afterwards — the
    * quadratic term then bounds by distinct entities, not rows (the
    * `dedup_fuzzy_pairs` query's shape; 25M row-pairs vs ~2k
    * name-pairs on the sf0.1 part table). */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String,
      blockCol: Column, maxDist: Int,
      maxBlock: Option[Int] = None): DataFrame = {
    require(maxDist >= 1, s"maxDist=$maxDist must be positive")
    val base0 = df
      .filter(col(strCol).isNotNull)
      .select(col(idCol).as("a_id"), col(strCol).as("a_str"),
        blockCol.as("__blk"))
    val base = maxBlock match {
      case None => base0
      case Some(cap) =>
        val keep = base0.groupBy("__blk")
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= cap).select("__blk")
        base0.join(keep, Seq("__blk"), "left_semi")
    }
    val right = base.select(col("__blk"), col("a_id").as("b_id"),
      col("a_str").as("b_str"))
    base.join(right, Seq("__blk"))
      .filter(col("a_id") < col("b_id") && col("a_str") =!= col("b_str"))
      .withColumn("dist", levenshtein(col("a_str"), col("b_str"), maxDist))
      .filter(col("dist") =!= -1)
      .select("a_id", "b_id", "a_str", "b_str", "dist")
  }

  /** Event-time TTL dedup (throttle): per key, admit a row iff no row
    * was ADMITTED within the preceding `ttlMicros` of event time —
    * the first occurrence wins, repeats inside the TTL are struck, and
    * the key re-admits once the gap from the LAST ADMITTED occurrence
    * reaches the TTL. This is the policy between
    * [[exactFirstWins]] (suppress forever) and keeping everything: a
    * crawler's hourly re-fetches collapse while a genuine monthly
    * re-crawl survives as a fresh version. The suppression chain is a
    * per-key greedy recurrence (a struck row does NOT refresh the
    * clock), so results are independent of partitioning and replay
    * exactly in SQL as a recursive CTE.
    *
    * Scale shape: ONE hash shuffle on the key columns, then a single
    * sorted linear scan per partition (secondary sort — the
    * [[Packing.nextFitPack]] discipline); no state beyond one
    * timestamp per open key per partition. Rows with a NULL `tsCol`
    * are dropped (no event time — no TTL semantics). Ties on `tsCol`
    * break by ascending `orderCol`; an exact tie is inside any
    * positive TTL and is struck. */
  def ttlFirstWins(df: DataFrame, keyCols: Seq[String], tsCol: String,
      orderCol: String, ttlMicros: Long): DataFrame = {
    require(ttlMicros > 0, s"ttlMicros=$ttlMicros must be positive")
    require(keyCols.nonEmpty, "at least one key column")
    val withTu = df.filter(col(tsCol).isNotNull)
      .withColumn("__tu", unix_micros(col(tsCol)))
    val sorted = withTu.repartition(keyCols.map(col): _*)
      .sortWithinPartitions(
        keyCols.map(col) :+ col("__tu") :+ col(orderCol): _*)
    val schema = sorted.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    val tuIdx = schema.fieldIndex("__tu")
    sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var hasLast = false
      var last = 0L
      it.filter { r =>
        val k = keyIdx.map(r.get)
        if (k != curKey) { curKey = k; hasLast = false }
        val tu = r.getLong(tuIdx)
        val admit = !hasLast || tu - last >= ttlMicros
        if (admit) { hasLast = true; last = tu }
        admit
      }
    }(org.apache.spark.sql.Encoders.row(schema)).drop("__tu")
  }

  /** [[frequentLineDedup]] with the threshold as a FRACTION of the
    * corpus — the form that survives a scale-up: an absolute minDocs
    * silently reclassifies lines as the corpus grows (a line in 6 of
    * 10 docs is boilerplate; the same line in 6 of 10M is not), while
    * a document-fraction threshold makes the same strike decision at
    * any scale (RefinedWeb's own formulation). Costs one extra
    * distinct-id count action; the floor of 2 keeps tiny corpora from
    * declaring every line hot. */
  def frequentLineDedupFrac(docs: DataFrame, idCol: String,
      textCol: String, minDocFrac: Double,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(minDocFrac > 0.0 && minDocFrac <= 1.0,
      s"minDocFrac=$minDocFrac out of (0, 1]")
    val n = docs.filter(col(textCol).isNotNull)
      .select(col(idCol)).distinct().count()
    frequentLineDedup(docs, idCol, textCol,
      math.max(2L, math.ceil(minDocFrac * n).toLong).toInt, carryCols)
  }

  /** Connected components over an undirected pair set — the clustering
    * stage that turns near-dup PAIRS into dedup GROUPS (keep one doc
    * per component; the reference's dedup story stops at pairs, this
    * is the operational completion). Distributed min-label propagation
    * with POINTER JUMPING: each round every node takes the min label
    * over itself and its neighbors (one hash shuffle on node id), then
    * labels are compressed through themselves (`comp(comp(id))`),
    * which collapses chains in O(log diameter) rounds instead of
    * O(diameter) — the property that keeps pathological chain
    * components from serializing a 100 TB run. No driver-side graph
    * state: the only driver values are the per-round convergence
    * checksums (count + label hash-sum); rounds are
    * localCheckpoint-truncated so the plan doesn't grow with the
    * iteration count. Returns `(id, component)` for every id
    * appearing in `pairs`, component = min reachable id. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame =
    connectedComponentsTyped(
      pairs.select(col(aCol).cast("long").as(aCol),
        col(bCol).cast("long").as(bCol)),
      aCol, bCol, maxIter)

  /** [[connectedComponents]] without the long-id cast: min-label
    * propagation needs only a TOTAL ORDER on node ids, so string ids
    * (host names, domain strings) run the closure directly — no
    * global dense-rank pre-pass (a one-task sort at web scale) to
    * manufacture numeric ids. Output id/component types follow the
    * input column type; component = min reachable id under the
    * column's native ordering. */
  def connectedComponentsTyped(pairs: DataFrame, aCol: String,
      bCol: String, maxIter: Int = 25): DataFrame = {
    val edges = pairs
      .select(col(aCol).as("u"), col(bCol).as("v"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct().localCheckpoint(true)
    var comp = edges.groupBy("u").agg(min("v").as("mv"))
      .select(col("u").as("id"), least(col("u"), col("mv")).as("c"))
      .localCheckpoint(true)
    def checksum(df: DataFrame): (Long, Long) = {
      // bit_xor, not sum: an order-free combiner that cannot overflow
      // under ANSI arithmetic
      val r = df.agg(count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(id, c))"), lit(0L)).as("h"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    var prev = checksum(comp)
    var it = 0
    var done = false
    while (!done && it < maxIter) {
      val nbr = edges.join(comp.withColumnRenamed("id", "v"), "v")
        .groupBy(col("u").as("id")).agg(min(col("c")).as("nc"))
      val prop = comp.join(nbr, Seq("id"), "left")
        .select(col("id"),
          least(col("c"), coalesce(col("nc"), col("c"))).as("c"))
      // pointer jumping: map each label through its own current label.
      // The checkpoint flattens STATS as well as lineage: inherited
      // sizeInBytes estimates compound geometrically across iterated
      // self-joins (Bridge.flatCheckpoint scaladoc) — bounded here by
      // the early exit, but a high-diameter graph would hit it.
      val jumped = org.apache.spark.sql.graft.Bridge.flatCheckpoint(
        prop.join(prop.toDF("c", "cc"), Seq("c"), "left")
          .select(col("id"),
            least(col("c"), coalesce(col("cc"), col("c"))).as("c")))
      comp = jumped
      val cur = checksum(comp)
      done = cur == prev
      prev = cur
      it += 1
    }
    comp.select(col("id"), col("c").as("component"))
  }

  /** [[connectedComponents]] with a driver fast path for SMALL pair
    * sets: up to `cap` pairs are collected and closed with local
    * union-find (union-by-min, so every root is its component's min
    * id — the same contract). An ingest micro-batch's intra-sweep pair
    * graph is typically a handful of edges, and the distributed
    * closure costs several fixed-latency shuffle rounds regardless of
    * size; above the cap the pointer-jumping path runs unchanged, so
    * the 100 TB story is untouched. Returns `(id, component)`.
    *
    * Id contract (shared with [[connectedComponents]], made explicit
    * here): ids must be non-null and long-castable — the driver path
    * asserts it loudly where the distributed closure would only
    * degrade silently. */
  def componentsAuto(pairs: DataFrame, aCol: String, bCol: String,
      cap: Int = 100000): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val sample = pairs
      .select(col(aCol).cast("long"), col(bCol).cast("long"))
      .limit(cap + 1).collect()
    if (sample.length > cap) connectedComponents(pairs, aCol, bCol)
    else {
      val rows = sample.map { row =>
        require(!row.isNullAt(0) && !row.isNullAt(1),
          s"componentsAuto needs non-null long-castable ids " +
            s"($aCol, $bCol) — the connectedComponents id contract")
        (row.getLong(0), row.getLong(1))
      }
      unionFindComponents(rows).toSeq.sortBy(_._1)
        .toDF("id", "component")
    }
  }

  /** Driver union-find (union-by-min, so every root is its
    * component's min id — the [[connectedComponents]] contract) over an
    * already-collected edge list. Shared by [[componentsAuto]]'s
    * small-graph fast path and the fused ingest admission
    * ([[NearDupIndex.admitAndSync]]'s single-collect sweep). Returns
    * every node of the edge list with its component min. */
  def unionFindComponents(edges: Iterable[(Long, Long)])
      : Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    parent.keys.map(id => id -> find(id)).toMap
  }

  /** 64-bit SimHash over word tokens: per bit, sum +1/-1 across token
    * hashes, sign gives the bit. ONE custom-Expression pass
    * (graft.functions.SimHash64) — the previous 64x `aggregate()` HOF
    * foldLeft re-traversed every token hash once per bit (the
    * nested-HOF re-evaluation trap, measured 30x+ on kernels this
    * shape). `algo = "md5"` makes the signature reproducible in any SQL
    * engine (DuckDB-oracle-checkable); "xx" is the faster scale default. */
  def simhash64(textCol: Column, algo: String = "xx"): Column =
    graft.functions.TextExpressions.simhash64(textCol, algo)

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Cross-document duplicate SUBSTRING spans — the token-level exact
    * dedup tier of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better", arXiv:2107.06499), re-expressed
    * relationally instead of via their suffix array: any n-token run
    * appearing verbatim in >= `minDocs` distinct documents marks every
    * token position it covers as duplicated, and overlapping/adjacent
    * covered ranges merge into maximal spans (gaps-and-islands). Doc-
    * and paragraph-level dedup miss these (boilerplate headers, license
    * blocks, quoted passages embedded in otherwise-unique documents);
    * span removal is what actually shrinks the memorization surface.
    *
    * Returns `(<idCol>, span_start, span_end)` — inclusive 0-based
    * token positions of each maximal duplicated span.
    *
    * Scale shape: tokenize is one explode (corpus token count rows);
    * gram construction is a per-doc window (lead), no shuffle beyond
    * the doc partitioning; duplicate detection is ONE groupBy shuffle
    * on the gram; the cover join is an equi-join on gram; the island
    * merge is a per-doc window. Nothing is quadratic and nothing
    * driver-side — a 100 TB corpus pays ~3 shuffles of token-count
    * rows. (The suffix-array construction the paper uses is the
    * single-node alternative; fixed-n grams trade detecting arbitrary-
    * length matches [any match >= n tokens is still found — it is a
    * run of matching n-grams] for pure relational operators.) */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2): DataFrame = {
    val hits = dupGramHits(docs, idCol, textCol, n, minDocs)
    val w = Window.partitionBy("__did").orderBy(col("__pos").asc)
    // equal-length intervals sorted by start: a new island begins when
    // this start clears the previous interval's coverage (prev + n)
    val isl = hits
      .withColumn("__prev", lag(col("__pos"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("__pos") > col("__prev") + n, 1)
          .otherwise(0))
      .withColumn("__isl", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy(col("__did"), col("__isl"))
      .agg(min(col("__pos")).as("span_start"),
        (max(col("__pos")) + n - 1).as("span_end"))
      .select(col("__did").as(idCol), col("span_start"), col("span_end"))
  }

  /** Remove every duplicated span found by [[duplicateSpans]] from the
    * corpus: tokens covered by a span are dropped, survivors rejoin in
    * position order. Returns the full id set with
    * `(<idCol>, n_tokens, n_kept, clean_text)` — documents without a
    * span pass through with `clean_text` = the whitespace-normalized
    * original. The cover anti-join is equi on the doc id with a range
    * residual (spans per doc are few), never a cross join. */
  def removeDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2): DataFrame = {
    val spans = duplicateSpans(docs, idCol, textCol, n, minDocs)
      .select(col(idCol).as("__sid"), col("span_start"), col("span_end"))
    val toks = tokenPositions(docs, idCol, textCol)
    val kept = toks.join(spans,
      toks("__did") === spans("__sid") &&
        toks("__pos").between(col("span_start"), col("span_end")),
      "left_anti")
    // position-ordered reassembly without a sort shuffle: sort_array on
    // the (pos, tok) structs collected per doc
    toks.groupBy(col("__did"))
      .agg(count(lit(1)).as("n_tokens"))
      .join(
        kept.groupBy(col("__did")).agg(
          count(lit(1)).as("n_kept"),
          concat_ws(" ", transform(
            sort_array(collect_list(struct(col("__pos"), col("__tok")))),
            s => s.getField("__tok"))).as("clean_text")),
        Seq("__did"), "left")
      .select(col("__did").as(idCol),
        col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Corpus-level kill-rate telemetry for [[duplicateSpans]] — the
    * number every production ExactSubstr pass (Lee et al. 2022 §4.1)
    * reports before committing a scrub: how many docs carry a
    * duplicated span and what fraction of the corpus' tokens the
    * spans cover. One row:
    * `(n_docs, docs_hit, total_tokens, dup_tokens, kill_rate)`.
    * Spans per doc are maximal and disjoint by construction, so
    * summing their lengths counts each covered token exactly once.
    * Same shuffle budget as the span pass plus one global fold. */
  def duplicateSpanStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2): DataFrame = {
    val totals = tokenPositions(docs, idCol, textCol)
      .groupBy(col("__did")).agg(count(lit(1)).as("__nt"))
    val perDoc = duplicateSpans(docs, idCol, textCol, n, minDocs)
      .groupBy(col(idCol).as("__did"))
      .agg(sum(col("span_end") - col("span_start") + 1).as("__dup"))
    totals.join(perDoc, Seq("__did"), "left")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__dup").isNotNull, 1L).otherwise(0L)).as("docs_hit"),
        sum(col("__nt")).as("total_tokens"),
        coalesce(sum(col("__dup")), lit(0L)).as("dup_tokens"))
      .withColumn("kill_rate",
        round(col("dup_tokens").cast("double") / col("total_tokens"), 4))
  }

  /** `(doc, pos, token)` rows — split(trim, \s+) convention shared with
    * TextAnalysis so oracles replay with string_split_regex. */
  private def tokenPositions(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol).as("__did"),
        posexplode(split(trim(col(textCol)), "\\s+"))
          .as(Seq("__pos", "__tok")))

  /** Duplicated-gram cover positions: each `(doc, pos)` whose n-gram
    * occurs in >= minDocs distinct docs. Shared by span detection and
    * removal. */
  private def dupGramHits(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int): DataFrame = {
    val toks = tokenPositions(docs, idCol, textCol)
    val w = Window.partitionBy("__did").orderBy(col("__pos").asc)
    val gramToks: Seq[Column] = (0 until n).map(i =>
      if (i == 0) col("__tok") else lead(col("__tok"), i).over(w))
    // null-out when fewer than n tokens remain (concat_ws alone would
    // alias the short tail with a legitimate shorter gram elsewhere)
    // shuffle 128 bits of gram identity (two independent xxhash64
    // lanes), not the gram STRING — an n=8 gram averages ~50 bytes, so
    // hashing cuts the dup-detection shuffle ~3-6x; two lanes push the
    // birthday bound past any corpus size (one 64-bit lane collides
    // around 2^32 distinct grams — real at 100 TB)
    val grams = toks
      .withColumn("__gram",
        when(lead(col("__tok"), n - 1).over(w).isNotNull,
          concat_ws(" ", gramToks: _*)))
      .filter(col("__gram").isNotNull)
      .select(col("__did"), col("__pos"),
        xxhash64(lit(1), col("__gram")).as("__g1"),
        xxhash64(lit(2), col("__gram")).as("__g2"))
    val dup = grams.groupBy(col("__g1"), col("__g2"))
      .agg(countDistinct(col("__did")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select("__g1", "__g2")
    grams.join(dup, Seq("__g1", "__g2")).select(col("__did"), col("__pos"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-space
    * SEMANTIC dedup — near-duplicate meaning, not near-duplicate
    * bytes, the tier above [[minhashLshPairs]]/[[embeddingNearDupLsh]]
    * in a training-data pipeline. Cluster the corpus with frozen
    * deterministic centroids (the IVF cell assignment,
    * [[graft.search.Ann.buildIvfDeterministic]] — pure function of the
    * corpus, so the whole operator is SQL-replayable), compare pairs
    * ONLY within a cluster (cosine >= `tau`), close the pair graph,
    * and keep the min-id row per semantic group.
    *
    * Scale shape: the quadratic work is bounded by the largest CELL,
    * never the corpus — the within-cell self-join is one equi-join
    * shuffle on the cell id, and `k` grows with the corpus to hold
    * cell width constant (SemDeDup's own recipe: 50k clusters for
    * LAION-scale). Cross-cell near-dups are missed by design — the
    * paper's trade; raise `k` resolution or fall back to
    * [[embeddingNearDupLsh]] when recall across cluster seams
    * matters. The component closure is [[componentsAuto]]: driver
    * union-find under `cap` pairs, pointer-jumping
    * [[connectedComponents]] above it.
    *
    * `trained=true` swaps the frozen first-k centroids for
    * [[graft.search.Ann.buildIvfTrained]]'s deterministic sampled
    * k-means — the paper's own clustering. SemDeDup clusters with
    * k-means precisely because BALANCED cells bound the within-cell
    * O(cell²): on a skewed real corpus the first-k centroids can
    * degenerate (all k seeds inside one dense blob → one giant cell
    * re-quadratizing the join), where trained centroids spread with
    * the data (DedupSpec measures the max-cell-width drop). Still a
    * pure function of the corpus — the trained replay is the
    * `ann_ivf_trained_topk` SQL recipe.
    *
    * Returns every corpus row with a non-null vector as
    * `(id, component, keep)` — singletons are their own component and
    * keep themselves; ids must be non-null and long-castable (the
    * [[connectedComponents]] id contract). */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double, cap: Int = 100000, trained: Boolean = false,
      iters: Int = 2, sampleN: Int = 128): DataFrame = {
    val cells = semanticCells(corpus, idCol, vecCol, k, trained, iters,
      sampleN)
    val pairs = cellPairs(cells, tau)
    val comp = componentsAuto(pairs, "a_id", "b_id", cap)
      .withColumnRenamed("id", "__id")
    cells.select(col("__id"))
      .join(comp, Seq("__id"), "left")
      .select(col("__id").as("id"),
        coalesce(col("component"), col("__id")).as("component"))
      .withColumn("keep", col("id") === col("component"))
  }

  /** The cell assignment behind [[semanticDedup]] —
    * `(__id, __v, __cell)` for every non-null-vector row. */
  private def semanticCells(corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, trained: Boolean, iters: Int,
      sampleN: Int): DataFrame = {
    val index =
      if (trained) graft.search.Ann
        .buildIvfTrained(corpus, vecCol, idCol, k, iters, sampleN)
      else graft.search.Ann.buildIvfDeterministic(corpus, vecCol, idCol, k)
    index.corpusWithCell
      .select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"),
        col("__cell"))
  }

  /** Within-cell near-dup pairs at `tau`. Self-join on the cell id:
    * both sides shuffle-partition on `__cell` identically, so the
    * second exchange is reused, not recomputed (ReuseExchange); a<b
    * halves the pair space. */
  private def cellPairs(cells: DataFrame, tau: Double): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    cells
      .select(col("__cell"), col("__id").as("a_id"), col("__v").as("__va"))
      .join(cells.select(col("__cell"), col("__id").as("b_id"),
        col("__v").as("__vb")), Seq("__cell"))
      .filter(col("a_id") < col("b_id") &&
        VF.cosine(col("__va"), col("__vb")) >= tau)
      .select("a_id", "b_id")
  }

  /** SemDeDup pair-recall telemetry — quantifies the cell-seam trade
    * the operator documents: pairs at cosine >= `tau` that fall in
    * DIFFERENT cells are invisible to [[semanticDedup]] by design.
    * Scores the within-cell pair set against the EXACT all-pairs
    * ground truth and returns one row
    * `(n_true, n_found, n_cross_cell, recall)`.
    *
    * Scale: the exact all-pairs leg is O(n²) — run it on a bounded
    * corpus slice or a deterministic sample (the `ann_recall_probe`
    * pattern); production telemetry samples, it never sweeps. Every
    * within-cell pair passes the same cosine test as the truth side,
    * so `n_found <= n_true` and recall = found/true exactly measures
    * the seam loss. */
  def semanticDedupRecall(corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, tau: Double, trained: Boolean = false,
      iters: Int = 2, sampleN: Int = 128): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    val valid = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"))
    val truth = valid.select(col("__id").as("a_id"), col("__v").as("__va"))
      .crossJoin(valid.select(col("__id").as("b_id"),
        col("__v").as("__vb")))
      .filter(col("a_id") < col("b_id") &&
        VF.cosine(col("__va"), col("__vb")) >= tau)
      .select("a_id", "b_id")
    val found = cellPairs(
      semanticCells(corpus, idCol, vecCol, k, trained, iters, sampleN),
      tau)
    truth.join(found.withColumn("__hit", lit(1)), Seq("a_id", "b_id"),
        "left")
      .agg(count(lit(1)).as("n_true"), count(col("__hit")).as("n_found"))
      .select(col("n_true"), col("n_found"),
        (col("n_true") - col("n_found")).as("n_cross_cell"),
        round(col("n_found").cast("double") /
          greatest(col("n_true"), lit(1L)).cast("double"), 4).as("recall"))
  }
}

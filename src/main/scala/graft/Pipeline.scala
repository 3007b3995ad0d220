package graft

import graft.embed.Embedder
import graft.functions.Metric
import graft.index.{IndexMeta, VectorIndex}
import graft.operators.{Dedup, LangModel, TextAnalysis}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end corpus preparation: the composition a training-data
  * pipeline runs at 100 TB, built from the engine's operators —
  *
  *   raw corpus → Bloom history admission (optional, drops rows whose
  *   text the historical corpus already holds)
  *   → frequent-line boilerplate strike (optional, rewrites
  *   text) → C4 line rules + doc gates (optional, rewrites text)
  *   → falsy/quality filter → Gopher rule gate (optional)
  *   → repetition filter → learned-model quality gate (optional,
  *   trained linear classifier) → exact dedup → near-dup removal
  *   (MinHash+LSH, keep lowest id per duplicate cluster, optional
  *   hot-bucket guard) → benchmark decontamination (optional, n-gram
  *   overlap fraction) → per-source balancing (top-k by quality, heap
  *   operator) → DSIR importance selection toward a target corpus
  *   (optional) → embed → SemDeDup semantic dedup over the embeddings
  *   (optional) → vector index
  *
  * Every stage is a DataFrame transform: filters are codegen'd
  * projections, exact dedup is one key shuffle, near-dup removal
  * shuffles bucket ids only, balancing is the TopKPerGroup physical
  * operator (map-side heaps, k rows per group per partition on the
  * wire), embedding is a single expression, and the index build is one
  * write. Nothing collects to the driver.
  */
final case class PipelineReport(
    input: Long, afterQuality: Long, afterRepetition: Long,
    afterExact: Long, afterNearDup: Long, afterDecontam: Long,
    afterBalance: Long, afterGopher: Long = -1L, afterDsir: Long = -1L,
    afterSemantic: Long = -1L, afterLineDedup: Long = -1L,
    afterC4: Long = -1L, afterModel: Long = -1L,
    afterBloom: Long = -1L)

final class CorpusPipeline(
    minQuality: Double = 0.5,
    nearDupJaccard: Double = 0.8,
    shingleSize: Int = 3,
    maxDupTokenFraction: Double = 1.0,
    perSourceCap: Int = 0,
    maxBucket: Option[Int] = None,
    maxContamination: Double = 1.0,
    useGopherRules: Boolean = false,
    dsirKeep: Int = 0,
    semanticDedupK: Int = 0,
    semanticTau: Double = 0.95,
    semanticTrained: Boolean = false,
    nearDupAlgo: String = "xx",
    boilerplateMinDocs: Int = 0,
    useC4Rules: Boolean = false,
    qualityModel: Option[LangModel.LinearModel] = None,
    modelMaxSpamMicro: Long = 500000L,
    normalizeUnicode: Boolean = false,
    bloomHistory: Option[Array[Long]] = None,
    bloomK: Int = 3) {

  /** Cross-corpus Bloom admission (optional, the very first gate):
    * drop rows whose text is (probably) already in the historical
    * corpus the caller folded into [[bloomHistory]] — the O(1)-per-row
    * alternative to an anti-join against all of history. False
    * positives drop some genuinely novel rows (the filter's quantified
    * trade); no true duplicate survives. Rows with NULL text drop here
    * too (a NULL key has no admission verdict — the later quality gate
    * would drop them anyway). Runs on RAW text: admission is an ingest
    * decision, made before any rewriting stage. */
  def bloomAdmission(docs: DataFrame, textCol: String): DataFrame =
    bloomHistory match {
      case None => docs
      case Some(bits) =>
        graft.operators.Bloom.novel(docs, textCol, bits, bloomK)
    }

  /** Unicode NFC normalization (optional, FIRST): decomposed and
    * precomposed spellings of the same word must hash identically
    * before any exact/near dedup sees them. A pure codegen projection
    * with a zero-copy ASCII fast path; rewrites text, drops nothing. */
  def unicodeStage(docs: DataFrame, textCol: String): DataFrame =
    if (!normalizeUnicode) docs
    else docs.withColumn(textCol,
      graft.functions.TextExpressions.nfcNormalize(col(textCol)))

  /** Frequent-line boilerplate removal (RefinedWeb §3.3): lines in
    * ≥ [[boilerplateMinDocs]] distinct docs are struck everywhere and
    * the doc TEXT is rewritten — run FIRST, so every later gate judges
    * the de-boilerplated content. Disabled at the default of 0. */
  def boilerplateStage(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    if (boilerplateMinDocs <= 0) docs
    else {
      val carry = docs.columns.toSeq
        .filterNot(c => c == idCol || c == textCol)
      Dedup.frequentLineDedup(docs, idCol, textCol, boilerplateMinDocs,
        carry).drop("n_lines", "n_removed")
    }

  /** C4 cleanup (arXiv:1910.10683 §2.2): line rules rewrite the text
    * to the retained lines, document gates drop the doc outright.
    * Disabled by default ([[useC4Rules]]). */
  def c4Filter(docs: DataFrame, textCol: String): DataFrame =
    if (!useC4Rules) docs
    else docs
      .withColumn("__c4", TextAnalysis.c4Clean(col(textCol)))
      .filter(col("__c4.keep"))
      .withColumn(textCol, col("__c4.text"))
      .drop("__c4")

  /** Model-based quality gate (the GPT-3 filter tier): drop docs the
    * trained [[qualityModel]] scores at or above
    * [[modelMaxSpamMicro]] (the model is trained to score JUNK high).
    * Runs after the rule gates — the learned filter sees only text
    * the cheap rules already admitted. Disabled at the default None. */
  def modelFilter(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    qualityModel match {
      case None => docs
      case Some(m) =>
        val junk = LangModel.linearScore(m, docs, idCol, textCol)
          .filter(col("p_micro") >= modelMaxSpamMicro)
          .select(col(idCol))
        docs.join(junk, Seq(idCol), "left_anti")
    }

  /** Quality gate: drop null/empty and low-quality docs. */
  def qualityFilter(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull && col(textCol) =!= "")
      .filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality)

  /** Gopher rule-based gate (arXiv:2112.11446 App. A): the published
    * word-count / mean-length / symbol / alpha / stopword rules as one
    * codegen projection. Disabled by default ([[useGopherRules]]). */
  def gopherFilter(docs: DataFrame, textCol: String): DataFrame =
    if (!useGopherRules) docs
    else docs.filter(
      TextAnalysis.gopherRules(col(textCol)).getField("keep"))

  /** DSIR importance selection (arXiv:2302.03169): keep the `dsirKeep`
    * docs whose hashed-feature likelihood ratio most favors `target`.
    * Runs AFTER dedup (selecting before dedup re-admits duplicates of
    * favored docs). Disabled at the default keep of 0. */
  def dsirSelection(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame): DataFrame =
    if (dsirKeep <= 0) docs
    else docs.join(
      graft.operators.Sampling.dsirSelect(docs, target, idCol, textCol,
        dsirKeep).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** SemDeDup semantic dedup (arXiv:2303.09540) over the EMBEDDED
    * corpus: within-cluster cosine groups keep their min-id member.
    * Rows with a null embedding (embed failure) pass through — the
    * quality gates own that decision, semantic grouping cannot judge
    * them. Disabled at the default k of 0. */
  def semanticFilter(embedded: DataFrame, idCol: String): DataFrame =
    if (semanticDedupK <= 0) embedded
    else {
      val keepers = Dedup.semanticDedup(
          embedded.filter(col("embedding").isNotNull), idCol,
          "embedding", semanticDedupK, semanticTau,
          trained = semanticTrained)
        .filter(col("keep")).select(col("id").as(idCol))
      embedded.filter(col("embedding").isNull)
        .unionByName(embedded.join(keepers, Seq(idCol), "left_semi"))
    }

  /** Repetition gate (Gopher dup-token form): drop docs whose
    * duplicate-token fraction exceeds the cap. Disabled at the default
    * cap of 1.0. */
  def repetitionFilter(docs: DataFrame, textCol: String): DataFrame =
    if (maxDupTokenFraction >= 1.0) docs
    else docs.filter(
      TextAnalysis.dupTokenFraction(TextAnalysis.tokens(col(textCol)))
        <= maxDupTokenFraction)

  /** Exact dedup first-wins on the full text (one hash shuffle; catches
    * byte-identical copies before the expensive near-dup pass). A
    * prefix fingerprint is NOT a safe key here — near-dup corpora
    * routinely share long prefixes and would be over-deduped. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.exactFirstWins(docs, Seq(textCol), idCol)

  /** Near-dup removal: every LSH-confirmed duplicate pair drops its
    * higher id — connected near-dup clusters keep their lowest member
    * (transitively: anything paired with a smaller id leaves). */
  def nearDupRemoval(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val losers = Dedup.minhashLshPairs(docs, idCol, textCol,
        nearDupJaccard, n = shingleSize, algo = nearDupAlgo,
        maxBucket = maxBucket)
      .select(col("b_id").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Benchmark decontamination gate: drop docs whose n-gram overlap
    * fraction with the eval set reaches `maxContamination` (disabled at
    * the default 1.0 unless a doc fully overlaps). Docs too short to
    * shingle pass — they cannot leak an eval answer. */
  def decontaminationFilter(docs: DataFrame, idCol: String,
      textCol: String, benchmarks: DataFrame,
      benchTextCol: String): DataFrame = {
    val hot = Dedup.contaminationScore(docs, idCol, textCol,
        benchmarks, benchTextCol, n = shingleSize)
      .filter(col("score") >= maxContamination)
      .select(col(idCol))
    docs.join(hot, Seq(idCol), "left_anti")
  }

  /** Per-source balancing: keep the `perSourceCap` highest-quality docs
    * per source via the heap-based TopKPerGroup operator (partial top-k
    * before the exchange — the shuffle carries at most k rows per source
    * per input partition, not the corpus). Disabled at cap 0. */
  def balance(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame =
    if (perSourceCap <= 0) docs
    else {
      val scored = docs.select(col(sourceCol),
        TextAnalysis.qualityScore(col(textCol)).cast("double").as("__q"),
        col(idCol))
      val kept = graft.plans.TopK
        .perGroup(scored, sourceCol, "__q", idCol, perSourceCap)
        .select(col(idCol))
      docs.join(kept, Seq(idCol), "left_semi")
    }

  /** Full run: returns the cleaned, embedded corpus and stage counts;
    * optionally persists a vector index of the result. `sourceCol`
    * enables the balancing stage when `perSourceCap` > 0.
    *
    * Single-pass discipline (the 100 TB constraint): every stage
    * boundary is persisted before it is counted, so each stage's work
    * executes exactly ONCE — the count materializes the stage from its
    * cached parent, and every later consumer (the next stage, the
    * multi-consumer self-joins inside near-dup removal and balancing,
    * the final embed + index build) reads the cache. The raw input is
    * scanned once: its count rides the quality pass as a
    * `Dataset.observe` metric instead of a separate action. (The naive
    * formulation — eager counts on unpersisted frames — re-ran the
    * whole upstream chain per stage, ~6 full corpus passes.) Interior
    * caches are dropped on exit; the last stage stays cached for the
    * caller's follow-up actions on the returned frame. */
  def run(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, embedder: Embedder,
      indexPath: Option[String] = None,
      sourceCol: Option[String] = None,
      benchmarks: Option[DataFrame] = None,
      benchTextCol: String = "text",
      dsirTarget: Option[DataFrame] = None): (DataFrame, PipelineReport) = {
    // a dsirKeep with no target would silently skip the stage and ship
    // the unselected corpus with a pass-through count indistinguishable
    // from "ran, removed nothing" — fail loudly instead
    require(dsirKeep <= 0 || dsirTarget.nonEmpty,
      s"dsirKeep=$dsirKeep but no dsirTarget corpus was supplied")
    import org.apache.spark.sql.Observation
    import org.apache.spark.storage.StorageLevel
    val persisted = scala.collection.mutable.ListBuffer[DataFrame]()
    def stage(df: DataFrame): DataFrame = {
      persisted += df.persist(StorageLevel.MEMORY_AND_DISK)
      persisted.last
    }
    val obsIn = Observation()
    val raw = docs.observe(obsIn, count(lit(1)).as("n"))
    // the text-REWRITING cleanups come first (boilerplate strike, C4
    // line rules) so every later gate judges the cleaned content; when
    // enabled, their count is the action that fires obsIn — `input`
    // is read only after the first action over the raw lineage
    val bl0 = bloomAdmission(raw, textCol)
    val bl = if (bl0 eq raw) raw else stage(bl0)
    val nBlOpt = if (bl eq raw) None else Some(bl.count())
    val un0 = unicodeStage(bl, textCol)
    val un = if (un0 eq bl) bl else stage(un0)
    val bp0 = boilerplateStage(un, idCol, textCol)
    val bp = if (bp0 eq un) un else stage(bp0)
    val nBpOpt = if (bp eq un) None else Some(bp.count())
    val c40 = c4Filter(bp, textCol)
    val c4 = if (c40 eq bp) bp else stage(c40)
    val nC4Opt = if (c4 eq bp) nBpOpt else Some(c4.count())
    val q = stage(qualityFilter(c4, textCol))
    val nQ = q.count() // at most one raw-corpus scan total; fires obsIn
    val input = obsIn.get("n").asInstanceOf[Long]
    val nBl = nBlOpt.getOrElse(input)
    val nBp = nBpOpt.getOrElse(nBl)
    val nC4 = nC4Opt.getOrElse(nBp)
    // disabled stages pass through un-persisted (df eq parent): their
    // count re-reads the parent's cache, no extra pass
    val g0 = gopherFilter(q, textCol)
    val g = if (g0 eq q) q else stage(g0)
    val nG = if (g eq q) nQ else g.count()
    val r0 = repetitionFilter(g, textCol)
    val r = if (r0 eq g) g else stage(r0)
    val nR = if (r eq g) nG else r.count()
    val m0 = modelFilter(r, idCol, textCol)
    val m = if (m0 eq r) r else stage(m0)
    val nM = if (m eq r) nR else m.count()
    val e = stage(exactDedup(m, idCol, textCol))
    val nE = e.count()
    val nd = stage(nearDupRemoval(e, idCol, textCol))
    val nNd = nd.count()
    val dc = benchmarks
      .map(b => stage(decontaminationFilter(nd, idCol, textCol, b,
        benchTextCol))).getOrElse(nd)
    // no decontamination stage -> dc IS nd; reuse its count instead of
    // re-running an action over the same cached frame
    val nDc = if (dc eq nd) nNd else dc.count()
    val bal = sourceCol.filter(_ => perSourceCap > 0)
      .map(sc => stage(balance(dc, idCol, textCol, sc))).getOrElse(dc)
    val nBal = if (bal eq dc) nDc else bal.count()
    val ds = dsirTarget.filter(_ => dsirKeep > 0)
      .map(t => stage(dsirSelection(bal, idCol, textCol, t)))
      .getOrElse(bal)
    val nDs = if (ds eq bal) nBal else ds.count()
    val emb0 = embedder.embed(ds, textCol)
    val embedded =
      if (semanticDedupK <= 0) emb0
      else stage(semanticFilter(stage(emb0), idCol))
    val nSem = if (embedded eq emb0) nDs else embedded.count()
    indexPath.foreach { p =>
      val idx = new VectorIndex(IndexMeta("pipeline_idx", idCol,
        "embedding", embedder.dim, Metric.Cosine, p))
      idx.rebuild(embedded)
    }
    // release interior stages; keep the last staged frame hot — the
    // returned (possibly unpersisted) embed projection reads from it
    val hot = if (embedded eq emb0) ds else embedded
    persisted.filter(_ ne hot).foreach(_.unpersist(blocking = false))
    (embedded, PipelineReport(input, nQ, nR, nE, nNd, nDc, nBal,
      afterGopher = nG, afterDsir = nDs, afterSemantic = nSem,
      afterLineDedup = nBp, afterC4 = nC4, afterModel = nM,
      afterBloom = nBl))
  }
}

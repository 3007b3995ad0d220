package graft

import graft.embed.HashProjectionEmbedder
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("corpus pipeline: quality -> exact dedup -> near-dup -> embed -> index") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    // plant an exact duplicate and an empty doc to exercise the stages
    val planted = docs
      .union(docs.filter($"doc_id" === 8).select(lit(90001L), $"text"))
      .union(Seq((90002L, "")).toDF("doc_id", "text"))
    val path = Files.createTempDirectory("graft_pipe").toString + "/idx"
    val (embedded, report) = new CorpusPipeline(minQuality = 0.5,
      nearDupJaccard = 0.8)
      .run(spark, planted, "doc_id", "text",
        new HashProjectionEmbedder(32), Some(path))

    assert(report.input === 502)
    assert(report.afterQuality < report.input, "empty/low-quality dropped")
    assert(report.afterRepetition === report.afterQuality,
      "repetition gate disabled at default cap")
    assert(report.afterExact === report.afterRepetition - 1,
      "exactly the planted byte-identical copy is removed")
    assert(report.afterNearDup <= report.afterExact,
      "near-dup pass only removes")
    // fixture docs 8 and 12 are near-identical (jaccard 0.97): the
    // higher id must be gone, the lower kept
    val ids = embedded.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(8L) && !ids.contains(12L))
    // the persisted index holds exactly the surviving docs, embedded
    val idx = spark.read.parquet(path)
    assert(idx.count() === report.afterNearDup)
    assert(idx.schema.fieldNames.contains("embedding") &&
      idx.schema.fieldNames.contains("__norm"))
  }

  test("run() scans the raw input exactly once (single-pass stage counts)") {
    // count how many times raw-input partitions are computed: if any
    // stage count re-ran the upstream chain from the source (the 6x
    // recompute bug), the accumulator exceeds the partition count
    val raw = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").repartition(4)
    val scans = spark.sparkContext.longAccumulator("rawScans")
    val instrumented = raw.mapPartitions { it =>
      scans.add(1); it
    }(org.apache.spark.sql.Encoders.row(raw.schema))
    val (_, report) = new CorpusPipeline(minQuality = 0.5,
      nearDupJaccard = 0.8)
      .run(spark, instrumented, "doc_id", "text",
        new HashProjectionEmbedder(16), None)
    assert(report.input > 0)
    assert(scans.value === 4L,
      s"raw input computed ${scans.value / 4.0}x, expected exactly 1x")
  }

  test("repetition gate drops the pathological doc, keeps normal text") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog near the river bank"),
      (2L, ("spam " * 40).trim)
    ).toDF("doc_id", "text")
    val p = new CorpusPipeline(minQuality = 0.0, maxDupTokenFraction = 0.9)
    val kept = p.repetitionFilter(docs, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L))
  }

  test("per-source balancing caps each source via the heap operator") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text", $"source")
    val p = new CorpusPipeline(minQuality = 0.0, perSourceCap = 3)
    val out = p.balance(docs, "doc_id", "text", "source")
    val bySource = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource.nonEmpty && bySource.values.forall(_ <= 3))
    // full run with balancing enabled threads the count through
    val (_, report) = p.run(spark, docs, "doc_id", "text",
      new HashProjectionEmbedder(16), None, Some("source"))
    assert(report.afterBalance <= report.afterNearDup)
    assert(report.afterBalance <= bySource.keySet.size.toLong * 3)
  }

  test("decontamination stage drops docs overlapping the eval set") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
      .filter($"text".isNotNull && trim($"text") =!= "")
    // the "benchmark" is a block of the corpus itself: those docs fully
    // overlap it (score 1.0) and must leave; everything else stays
    val bench = docs.filter($"doc_id" >= 400 && $"doc_id" < 420)
    val p = new CorpusPipeline(minQuality = 0.0, nearDupJaccard = 0.99,
      maxContamination = 0.8)
    val (embedded, report) = p.run(spark, docs, "doc_id", "text",
      new HashProjectionEmbedder(16), None, None, Some(bench))
    assert(report.afterDecontam < report.afterNearDup,
      s"contaminated docs must drop: $report")
    val ids = embedded.select("doc_id").as[Long].collect().toSet
    val benchIds = bench.select("doc_id").as[Long].collect().toSet
    val survivingBench = benchIds.intersect(ids)
    assert(survivingBench.isEmpty,
      s"benchmark-identical docs survived: $survivingBench")
  }

  test("gopher + dsir + semantic stages compose: each enabled stage " +
    "only removes, counts land in the report, disabled ≡ absent") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text", $"lang")
    val target = docs.filter($"lang" === "en").select($"doc_id", $"text")
    val p = new CorpusPipeline(minQuality = 0.0, nearDupJaccard = 0.99,
      useGopherRules = true, dsirKeep = 120, semanticDedupK = 16,
      semanticTau = 0.4)
    val (embedded, r) = p.run(spark, docs.select($"doc_id", $"text"),
      "doc_id", "text", new HashProjectionEmbedder(16),
      dsirTarget = Some(target))
    assert(r.afterGopher < r.afterQuality,
      s"fixture has docs failing the published Gopher rules: $r")
    assert(r.afterDsir === 120L,
      s"dsir keeps exactly the budget when enough docs survive: $r")
    assert(r.afterSemantic <= r.afterDsir,
      s"semantic dedup only removes: $r")
    assert(embedded.count() === r.afterSemantic)
    // stage monotonicity end to end
    val chain = Seq(r.input, r.afterQuality, r.afterGopher,
      r.afterRepetition, r.afterExact, r.afterNearDup, r.afterDecontam,
      r.afterBalance, r.afterDsir, r.afterSemantic)
    assert(chain.zip(chain.tail).forall { case (a, b) => b <= a },
      s"stages must be monotone non-increasing: $chain")

    // default-disabled run reports pass-through counts
    val (_, r0) = new CorpusPipeline(minQuality = 0.0,
      nearDupJaccard = 0.99)
      .run(spark, docs.select($"doc_id", $"text"), "doc_id", "text",
        new HashProjectionEmbedder(16))
    assert(r0.afterGopher === r0.afterQuality &&
      r0.afterDsir === r0.afterBalance &&
      r0.afterSemantic === r0.afterDsir,
      s"disabled stages must pass through: $r0")
  }

  test("run() reproduces the oracled corpus_pipeline stage ledger " +
    "count for count") {
    // the corpus_pipeline query composes the stage METHODS and is
    // hash-checked against DuckDB; this closes the remaining gap by
    // asserting the orchestrating run() lands on the same per-stage
    // survivor counts at the same pinned config
    val dir = "/root/testdata/sf0.001"
    val ledger = graft.queries.PipelineQueries
      .stageFrames(spark, dir)
      .map { case (name, df) => name -> df.count() }.toMap
    val r = graft.queries.PipelineQueries.runReport(spark, dir)
    assert(r.input === ledger("input"))
    assert(r.afterQuality === ledger("quality"))
    assert(r.afterGopher === ledger("gopher"))
    assert(r.afterRepetition === ledger("repetition"))
    assert(r.afterExact === ledger("exact"))
    assert(r.afterNearDup === ledger("neardup"))
    assert(r.afterDsir === ledger("dsir"))
    assert(r.afterSemantic === ledger("semantic"),
      s"run() must compose the stages exactly as the oracle chains " +
        s"them: $r vs $ledger")
    // and the config genuinely exercises the composition: at least
    // five stages strictly reduce the corpus at this fixture
    val chain = Seq(ledger("input"), ledger("quality"), ledger("gopher"),
      ledger("repetition"), ledger("exact"), ledger("neardup"),
      ledger("dsir"), ledger("semantic"))
    assert(chain.zip(chain.tail).count { case (a, b) => b < a } >= 5,
      s"pinned config should make most stages bite: $chain")
  }

  test("run() reproduces the ALL-stages corpus_pipeline_full ledger — " +
    "decontamination and balancing included") {
    val dir = "/root/testdata/sf0.001"
    val ledger = graft.queries.PipelineQueries
      .stageFramesFull(spark, dir)
      .map { case (name, df) => name -> df.count() }.toMap
    val r = graft.queries.PipelineQueries.runReportFull(spark, dir)
    assert(r.input === ledger("input"))
    assert(r.afterQuality === ledger("quality"))
    assert(r.afterGopher === ledger("gopher"))
    assert(r.afterRepetition === ledger("repetition"))
    assert(r.afterExact === ledger("exact"))
    assert(r.afterNearDup === ledger("neardup"))
    assert(r.afterDecontam === ledger("decontam"))
    assert(r.afterBalance === ledger("balance"))
    assert(r.afterDsir === ledger("dsir"))
    assert(r.afterSemantic === ledger("semantic"),
      s"full run() vs full ledger: $r vs $ledger")
    assert(ledger("decontam") < ledger("neardup"),
      "decontamination must drop the self-contaminated eval members")
    assert(ledger("balance") < ledger("decontam"),
      "the per-source cap must bite")
  }

  test("run() reproduces the cleaning-front corpus_pipeline_clean " +
    "ledger — boilerplate strike and C4 included") {
    val dir = "/root/testdata/sf0.001"
    val ledger = graft.queries.PipelineQueries
      .stageFramesClean(spark, dir)
      .map { case (name, df) => name -> df.count() }.toMap
    val r = graft.queries.PipelineQueries.runReportClean(spark, dir)
    assert(r.input === ledger("input"))
    assert(r.afterLineDedup === ledger("linededup"))
    assert(r.afterC4 === ledger("c4"))
    assert(r.afterQuality === ledger("quality"))
    assert(r.afterExact === ledger("exact"),
      s"clean run() vs clean ledger: $r vs $ledger")
    // the strike stage rewrites text without dropping rows; the C4 and
    // quality gates must then genuinely bite on the cleaned text
    assert(ledger("linededup") === ledger("input"))
    assert(ledger("c4") < ledger("linededup"), "C4 doc gates must bite")
    assert(ledger("quality") < ledger("c4"),
      "short-after-cleaning docs must fail the 0.9 quality bar")
  }

  test("bloom front: run() counts equal the oracled ledger; admission " +
    "genuinely bites and no history text survives") {
    val dir = sf
    val ledger = graft.queries.PipelineQueries
      .stageFramesBloom(spark, dir)
      .map { case (name, df) => name -> df.count() }.toMap
    val r = graft.queries.PipelineQueries.runReportBloom(spark, dir)
    assert(r.input === ledger("input"))
    assert(r.afterBloom === ledger("bloom"))
    assert(r.afterQuality === ledger("quality"))
    assert(r.afterExact === ledger("exact"),
      s"bloom run() vs bloom ledger: $r vs $ledger")
    assert(ledger("bloom") < ledger("input"),
      "the history filter must strike the indexed two-thirds")
    // zero false negatives: nothing the history holds gets admitted
    val hist = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"text".isNotNull && trim($"text") =!= "" &&
        pmod($"doc_id", lit(3)) =!= 0)
      .select("text").as[String].collect().toSet
    val admitted = graft.queries.PipelineQueries
      .stageFramesBloom(spark, dir).toMap.apply("bloom")
      .select("text").as[String].collect()
    assert(admitted.forall(t => !hist.contains(t)),
      "a true history duplicate survived admission")
  }

  test("model quality gate drops predicted junk; new stages disabled " +
    "by default pass the SAME frame through") {
    val docs = (0 until 45).map { i =>
      val spam = i % 3 == 0
      val base = s"common words shared by all documents number $i"
      (i.toLong,
        if (spam) s"$base junktok junktok junktok junktok junktok"
        else base)
    }.toDF("doc_id", "text")
    val m = graft.operators.LangModel.linearTrain(docs, "text",
      pmod($"doc_id", lit(3)) === 0, dim = 64, iters = 16)
    val p = new CorpusPipeline(qualityModel = Some(m))
    val kept = p.modelFilter(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    // equivalence with the raw scorer's anti-join
    val junk = graft.operators.LangModel
      .linearScore(m, docs, "doc_id", "text")
      .filter($"p_micro" >= 500000L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === (0L until 45L).toSet -- junk)
    assert(junk.nonEmpty && kept.nonEmpty, "the gate must separate")
    // disabled-by-default contract: the stage methods return the
    // parent frame ITSELF (run() relies on eq for pass-through counts)
    val defaults = new CorpusPipeline()
    assert(defaults.boilerplateStage(docs, "doc_id", "text") eq docs)
    assert(defaults.c4Filter(docs, "text") eq docs)
    assert(defaults.modelFilter(docs, "doc_id", "text") eq docs)
  }
}

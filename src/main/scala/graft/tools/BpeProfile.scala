package graft.tools

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession

/** Measures BPE training at production merge counts — the scale claim
  * behind the driver-local merge loop (BASELINE.md "BPE training").
  *
  * Usage: runMain graft.tools.BpeProfile <sfDir> [nMerges]
  *
  * Prints the one corpus-pass vocabulary-reduction time and the
  * driver-local merge-loop time separately: the first scales with the
  * corpus (distributed), the second only with vocabulary size — the
  * point being that 1k..30k merges add driver milliseconds, not
  * thousands of sequential Spark rounds. */
object BpeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nMerges = if (args.length > 1) args(1).toInt else 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm the scan path
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (full, total) = timed(
      TextAnalysis.bpeTrain(docs, "text", nMerges))
    val (merges, vocab) = full
    val nVocab = vocab.count()
    // isolate the corpus pass by re-running at 0 merges
    val (_, passOnly) = timed(TextAnalysis.bpeTrain(docs, "text", 0))
    println(f"""{"tool":"BpeProfile","sf":"$sfDir","nMerges":$nMerges,""" +
      f""""mergesLearned":${merges.size},"vocab":$nVocab,""" +
      f""""totalSec":$total%.3f,"corpusPassSec":$passOnly%.3f,""" +
      f""""mergeLoopSec":${total - passOnly}%.3f}""")
    // The fixture corpus has a ~31-word vocabulary and exhausts its
    // merges early; the scale claim needs a vocabulary that sustains
    // deep merge chains. Deterministic synthetic leg: 200k docs of
    // four 8-char md5-hex words each (~vocab 800k words over a
    // 16-char alphabet — hundreds of thousands of live pairs).
    import org.apache.spark.sql.functions._
    val synth = spark.range(200000L).select(concat_ws(" ",
      substring(md5(col("id").cast("string")), 1, 8),
      substring(md5(col("id").cast("string")), 9, 8),
      substring(md5(col("id").cast("string")), 17, 8),
      substring(md5(col("id").cast("string")), 25, 8)).as("text"))
      .localCheckpoint(true)
    val (sf2, t2) = timed(TextAnalysis.bpeTrain(synth, "text", nMerges))
    val (m2, v2) = sf2
    val nV2 = v2.count()
    val (_, p2) = timed(TextAnalysis.bpeTrain(synth, "text", 0))
    println(f"""{"tool":"BpeProfile","sf":"synthetic-hex-200k",""" +
      f""""nMerges":$nMerges,"mergesLearned":${m2.size},"vocab":$nV2,""" +
      f""""totalSec":$t2%.3f,"corpusPassSec":$p2%.3f,""" +
      f""""mergeLoopSec":${t2 - p2}%.3f}""")
    // ENCODE throughput at the full trained depth through the
    // single-node BpeEncode expression (the replace chain could not
    // even plan at this depth): chars/sec over the synthetic corpus
    import org.apache.spark.sql.functions.{length => flen, sum => fsum}
    val (encStats, encSec) = timed {
      synth.select(
          flen(TextAnalysis.bpeApplyFast(col("text"), m2)).as("enc"),
          flen(col("text")).as("raw"))
        .agg(fsum(col("raw")), fsum(col("enc"))).head()
    }
    println(f"""{"tool":"BpeProfile","leg":"encode","nMerges":${m2.size},""" +
      f""""rawChars":${encStats.getLong(0)},""" +
      f""""encChars":${encStats.getLong(1)},"encodeSec":$encSec%.3f,""" +
      f""""mcharsPerSec":${encStats.getLong(0) / encSec / 1e6}%.1f}""")
    spark.stop()
  }
}

package graft

import graft.embed.{EmbedCache, FittedEmbedder, HashProjectionEmbedder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

class EmbedCacheSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath() =
    Files.createTempDirectory("graft_ecache").toString + "/cache"

  /** Fails the test the moment anything tries to embed through it. */
  private object ThrowingEmbedder extends FittedEmbedder {
    override def dim: Int = 16
    override def transform(df: DataFrame, textCol: String): DataFrame =
      throw new IllegalStateException("embedder invoked on a full cache hit")
  }

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .filter($"doc_id" < 60).cache()
  private lazy val embedder = new HashProjectionEmbedder(16).fit(docs, "text")

  test("first run == direct embed; cache holds one row per distinct text") {
    val path = freshPath()
    val out = EmbedCache.embedWithCache(spark, docs, "text", embedder, path)
    val direct = embedder.transform(docs, "text")
    val a = out.select($"doc_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap
    val b = direct.select($"doc_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap
    assert(a === b, "cache-backed vectors identical to direct embed")
    val distinctTexts = docs.select("text").distinct().count()
    assert(EmbedCache.readCache(spark, path).count() === distinctTexts)
  }

  test("unchanged re-run never invokes the embedder") {
    val path = freshPath()
    EmbedCache.embedWithCache(spark, docs, "text", embedder, path)
    // would throw if any miss slipped through
    val again = EmbedCache.embedWithCache(spark, docs, "text",
      ThrowingEmbedder, path)
    assert(again.filter($"embedding".isNull).count() === 0L)
    assert(again.count() === docs.count())
  }

  test("delta run embeds only the new texts, cache grows by the delta") {
    val path = freshPath()
    EmbedCache.embedWithCache(spark, docs, "text", embedder, path)
    val n0 = EmbedCache.readCache(spark, path).count()
    val more = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" < 80) // superset: 60..79 are new
    val out = EmbedCache.embedWithCache(spark, more, "text", embedder, path)
    val newTexts = more.join(docs.select("text").distinct(),
      Seq("text"), "left_anti").select("text").distinct().count()
    assert(EmbedCache.readCache(spark, path).count() === n0 + newTexts)
    // and the combined output still matches a from-scratch embed
    val direct = embedder.transform(more, "text")
      .select($"doc_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    val got = out.select($"doc_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap
    assert(got === direct)
  }

  test("duplicate keys in the cache never multiply output rows") {
    val path = freshPath()
    EmbedCache.embedWithCache(spark, docs, "text", embedder, path)
    // simulate the documented failure mode: a concurrent double-insert
    // (append the cache's own rows back onto itself)
    val raw = spark.read.parquet(path).localCheckpoint(true)
    raw.write.mode("append").parquet(path)
    assert(spark.read.parquet(path).count() === raw.count() * 2)
    val distinctTexts = docs.select("text").distinct().count()
    assert(EmbedCache.readCache(spark, path).count() === distinctTexts,
      "readCache must collapse duplicate keys")
    // full hit: one output row per input row, embedder never invoked
    val out = EmbedCache.embedWithCache(spark, docs, "text",
      ThrowingEmbedder, path)
    assert(out.count() === docs.count(),
      "duplicate cache keys must not fan out the hit join")
  }

  test("compact dedupes physically and shrinks the file count") {
    val path = freshPath()
    EmbedCache.embedWithCache(spark, docs, "text", embedder, path)
    val raw = spark.read.parquet(path).localCheckpoint(true)
    raw.write.mode("append").parquet(path)
    val contentBefore = EmbedCache.readCache(spark, path)
      .as[(Long, Seq[Float])].collect().toMap
    def parquetFiles() = new java.io.File(path).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val filesBefore = parquetFiles()
    val report = EmbedCache.compact(spark, path)
    assert(report.filesBefore === filesBefore)
    assert(parquetFiles() < filesBefore,
      s"compaction must shrink files: $filesBefore -> ${parquetFiles()}")
    // physical rows == distinct keys now; content unchanged
    assert(spark.read.parquet(path).count() === contentBefore.size)
    val contentAfter = EmbedCache.readCache(spark, path)
      .as[(Long, Seq[Float])].collect().toMap
    assert(contentAfter === contentBefore)
  }
}

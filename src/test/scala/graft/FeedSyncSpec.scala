package graft

import graft.embed.Md5FeatureEmbedder
import graft.functions.Metric
import graft.index.{IndexMeta, VectorIndex}
import graft.streaming.IndexSync
import java.nio.file.Files

/** End-to-end streaming composition: paginated feed → embed → delta-sync
  * into the index — the reference's whole ingest story
  * (syntetic_data_arxiv.py pagination + syntetic_data.py CDF-triggered
  * sync) as ONE Structured Streaming pipeline. */
class FeedSyncSpec extends SparkSpec {

  private val embedder = new Md5FeatureEmbedder(64)

  private def emptyInit(index: VectorIndex): Unit =
    index.rebuild(embedder.transform(
      spark.read.format("graft_feed").option("total", 100).load().limit(0),
      "summary"))

  test("streamed feed→embed→sync equals the batch rebuild, in micro-batches") {
    val dir = Files.createTempDirectory("graft_feedsync").toString
    val index = new VectorIndex(IndexMeta("feed_stream", "id", "embedding",
      64, Metric.Cosine, s"$dir/idx"))
    emptyInit(index)

    val q = IndexSync.feedSync(spark, index, embedder, "summary",
      Map("total" -> "500", "pageSize" -> "100", "maxRowsPerBatch" -> "150"),
      s"$dir/ckpt")
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 3,
      s"admission control must micro-batch the drain (got ${batches.length})")

    // the batch path over the same feed, embedded once
    val batchIdx = new VectorIndex(IndexMeta("feed_batch", "id", "embedding",
      64, Metric.Cosine, s"$dir/idx_batch"))
    batchIdx.rebuild(embedder.transform(
      spark.read.format("graft_feed")
        .option("total", 500).option("pageSize", 100).load(), "summary"))

    def content(ix: VectorIndex): Map[String, Seq[Float]] =
      ix.read(spark).select("id", "embedding").collect()
        .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    val streamed = content(index)
    val batch = content(batchIdx)
    assert(streamed.size === batch.size && streamed === batch,
      "streamed ingest must equal the batch rebuild row for row")
  }

  test("a second drain of the same checkpoint is a no-op (exactly-once)") {
    val dir = Files.createTempDirectory("graft_feedsync2").toString
    val index = new VectorIndex(IndexMeta("feed_once", "id", "embedding",
      64, Metric.Cosine, s"$dir/idx"))
    emptyInit(index)
    val opts = Map("total" -> "300", "pageSize" -> "100",
      "maxRowsPerBatch" -> "100")
    IndexSync.feedSyncOnce(spark, index, embedder, "summary", opts,
      s"$dir/ckpt")
    val first = index.read(spark).count()
    IndexSync.feedSyncOnce(spark, index, embedder, "summary", opts,
      s"$dir/ckpt")
    assert(index.read(spark).count() === first,
      "re-draining a drained checkpoint must not re-ingest rows")
    assert(first > 0 && first <= 300)
  }
}

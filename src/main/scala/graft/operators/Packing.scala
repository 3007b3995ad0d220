package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: arrange a tokenized corpus into fixed-capacity
  * training sequences — the step between a cleaned corpus (the tables the
  * reference embeds, src/databricks/syntetic_data.py:55-66) and an LLM
  * trainer that consumes constant-length token blocks.
  *
  * Both packers shard the corpus by `bucket = id mod buckets` first, so
  * every bucket packs independently: one shuffle on a uniform key, then
  * embarrassingly parallel — the layout that holds at 100 TB (buckets ≫
  * executors) and keeps placement a pure function of (id, token count),
  * independent of partitioning, so results are engine-reproducible.
  *
  * Two disciplines, matching the two conventions in training stacks:
  *  - [[concatPack]] — GPT-style: documents are concatenated in id order
  *    and the token stream is split at capacity boundaries; a document
  *    may straddle two or more sequences. Placement is pure window
  *    arithmetic over a running token-count sum (no iteration at all).
  *  - [[nextFitPack]] — no-straddle: a document joins the current
  *    sequence if it fits, else opens a new one (oversized documents get
  *    a sequence of their own). The running fill is a NON-associative
  *    scan, so no window frame expresses it; within a bucket it is
  *    inherently sequential. The Spark shape is the secondary-sort
  *    pattern: repartition by bucket, sort (bucket, id) within
  *    partitions, and a single mapPartitions pass carries the fill state
  *    — the one place imperative per-partition code is genuinely needed.
  */
object Packing {

  private def tokenized(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol).cast("long").as("id"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("bucket", pmod(col("id"), lit(buckets.toLong)).cast("int"))

  /** GPT-style concat packing. Returns one row per document:
    * (bucket, id, n_tokens, seq_first, seq_last, start_offset) where
    * `seq_first`/`seq_last` are the first/last capacity-sized sequence
    * the document's tokens land in and `start_offset` is its position
    * within `seq_first`. */
  def concatPack(docs: DataFrame, idCol: String, textCol: String,
      capacity: Int, buckets: Int = 64): DataFrame = {
    val w = Window.partitionBy("bucket").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    tokenized(docs, idCol, textCol, buckets)
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("seq_first", floor(col("cum_before") / capacity))
      .withColumn("seq_last",
        floor((col("cum_before") + col("n_tokens") - lit(1L)) / capacity))
      .withColumn("start_offset", pmod(col("cum_before"), lit(capacity.toLong)))
      .select("bucket", "id", "n_tokens", "seq_first", "seq_last",
        "start_offset")
  }

  /** Next-fit no-straddle packing. Returns one row per document:
    * (bucket, id, n_tokens, seq) where `seq` numbers the sequences
    * within the bucket from 0 in id order. A document longer than
    * `capacity` still gets exactly one sequence (callers typically
    * length-filter first; the packer must not drop data silently). */
  def nextFitPack(docs: DataFrame, idCol: String, textCol: String,
      capacity: Int, buckets: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    tokenized(docs, idCol, textCol, buckets)
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "id")
      .select("bucket", "id", "n_tokens").as[(Int, Long, Long)]
      .mapPartitions { it =>
        // a partition holds whole buckets (repartition hashes the bucket
        // key); state resets at each bucket boundary
        var cur = Int.MinValue
        var seq = 0L
        var fill = 0L
        it.map { case (b, id, t) =>
          if (b != cur) { cur = b; seq = 0L; fill = t }
          else if (fill + t <= capacity) fill += t
          else { seq += 1L; fill = t }
          (b, id, t, seq)
        }
      }
      .toDF("bucket", "id", "n_tokens", "seq")
  }
}

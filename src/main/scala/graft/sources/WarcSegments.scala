package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reassembly of ISO 28500 §5.18–5.20 SEGMENTED records — the other
  * half of [[WarcSink.writeSegmentedConversions]]: an oversized
  * logical record ships as a first segment (its original record
  * type, `WARC-Segment-Number: 1`) plus `continuation` members
  * chained to it by `WARC-Segment-Origin-ID`, the last carrying
  * `WARC-Segment-Total-Length`. Real archives segment records larger
  * than their member-size ceiling (ISO 28500 §5.18 exists precisely
  * so a 2 GB capture doesn't force a 2 GB gzip member); a consumer
  * that ignores `continuation` rows silently reads PARTIAL payloads.
  *
  * Scale shape: only segmented rows shuffle (one hash exchange on
  * the origin id — in a real archive a fraction of a percent of
  * records); unsegmented rows pass through untouched on their
  * existing partitioning. Per-group state is one logical record's
  * segments, bounded by the writer's segment ceiling × segment
  * count, never corpus-sized.
  */
object WarcSegments {

  /** Fold segmented records back into logical records over the
    * `graft_warc` schema: rows with a null `segment_number` pass
    * through; segment chains group on
    * `coalesce(segment_origin_id, record_id)` (the first segment IS
    * the origin), payloads concatenate in segment order, and every
    * other column — type, url, digest (which the writer computed
    * over the LOGICAL payload), date — comes from the first segment.
    * Provenance: `member_offset`/`file` of the first segment,
    * `member_length` = the chain's total storage footprint. An
    * INCOMPLETE chain (missing members, or a reassembled length that
    * misses `WARC-Segment-Total-Length`) still emits — flagged
    * `truncated = 'unspecified'` (ISO 28500 §5.13) so the
    * truncation gate quarantines it like any partial capture; the
    * segment columns come back null either way (the logical record
    * is no longer segmented). */
  def reassemble(df: DataFrame): DataFrame = {
    val cols = df.columns
    val plain = df.filter(col("segment_number").isNull)
    val first = struct(cols.map(col): _*)
    val grouped = df.filter(col("segment_number").isNotNull)
      .groupBy(coalesce(col("segment_origin_id"), col("record_id"))
        .as("__key"))
      .agg(
        min_by(first, col("segment_number")).as("__first"),
        array_sort(collect_list(struct(col("segment_number").as("n"),
          col("payload").as("p")))).as("__parts"),
        max(col("segment_total_length")).as("__total"),
        max(col("segment_number")).as("__maxn"),
        count(lit(1)).as("__nsegs"),
        sum(col("member_length")).as("__mlen"))
      .withColumn("__payload",
        aggregate(col("__parts"), lit(Array.emptyByteArray),
          (acc, x) => concat(acc, x("p"))))
      // ISO 28500 §5.20: only the LAST segment carries
      // WARC-Segment-Total-Length, so a null __total proves the tail
      // of the chain is missing — contiguous numbers 1..k alone would
      // wave through a chain that lost its trailing segment(s) (or a
      // lone first segment that lost every continuation). A complete
      // chain must have the declared total AND reassemble to exactly
      // that many bytes.
      .withColumn("__complete",
        col("__maxn") === col("__nsegs") &&
          col("__total").isNotNull &&
          length(col("__payload")) === col("__total"))
    val reassembled = grouped.select(cols.map {
      case "payload" => col("__payload").as("payload")
      case "member_length" => col("__mlen").as("member_length")
      case "truncated" => when(col("__complete"),
          col("__first.truncated"))
        .otherwise(coalesce(col("__first.truncated"),
          lit("unspecified"))).as("truncated")
      case c @ ("segment_number" | "segment_origin_id" |
          "segment_total_length") =>
        lit(null).cast(df.schema(c).dataType).as(c)
      case c => col(s"__first.$c").as(c)
    }: _*)
    plain.unionByName(reassembled)
  }
}

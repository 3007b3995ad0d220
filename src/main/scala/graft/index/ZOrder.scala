package graft.index

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Z-order (Morton) clustering — multi-dimensional data skipping for
  * the persisted layouts, the technique behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`.
  *
  * A single-column sort prunes scans on that column only; a 100 TB
  * table queried by 2-D boxes (user × time, lat × lon, domain ×
  * quality bin) needs BOTH dimensions to cluster. Interleaving the
  * bits of the two keys (the Morton curve) makes rows close in either
  * dimension land close on disk, so a box query touches a bounded set
  * of curve cells instead of the whole table.
  *
  * Layout: rows are bucketed by the Morton code of the TOP `gridBits`
  * bits of each dimension (a 2^gridBits × 2^gridBits grid) and written
  * `partitionBy` that cell id — [[readBox]] then decomposes the query
  * box into O(perimeter) contiguous z-ranges ([[zRanges]], a bounded
  * driver-side quadtree recursion, never the data) and scans only the
  * matching cell dirs via partition pruning: the same touched-dir
  * discipline every other persisted layout here uses, measurable
  * through the scan's `numFiles` metric.
  *
  * The Morton code itself is a pure integer expression (shift / mask /
  * add), codegen-friendly and replayable in SQL as a sum of bit
  * tests — the `layout_zorder` oracle hash-checks it cross-engine.
  */
object ZOrder {

  /** 2-D Morton code: interleave the low `bits` bits of `a` (even
    * positions) and `b` (odd positions). Inputs must be non-negative
    * and fit in `bits` bits for the curve to be a bijection. */
  def morton2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(bl, i).bitwiseAND(1L), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Driver-side twin of [[morton2]] for cell enumeration. */
  def mortonLong(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Grid-cell id for the layout: Morton of the top `gridBits` of each
    * dimension (`dimBits` = total significant bits per dimension). */
  def zCell(a: Column, b: Column, dimBits: Int, gridBits: Int): Column = {
    require(gridBits >= 1 && gridBits <= dimBits && dimBits <= 31,
      s"bad grid: dimBits=$dimBits gridBits=$gridBits")
    val s = dimBits - gridBits
    morton2(shiftright(a.cast("long"), s), shiftright(b.cast("long"), s),
      gridBits)
  }

  /** Write `df` clustered on the z-grid of (`aCol`, `bCol`):
    * `partitionBy` the cell id, one exchange keyed on the cell (so
    * each cell dir is written by one task — no small-file spray). */
  def write(df: DataFrame, path: String, aCol: String, bCol: String,
      dimBits: Int, gridBits: Int): Unit =
    df.withColumn("__zc", zCell(col(aCol), col(bCol), dimBits, gridBits))
      .repartition(col("__zc"))
      .write.mode("overwrite").partitionBy("__zc").parquet(path)

  /** Value-rank cell boundaries for a SKEWED dimension — the raw bit
    * grid of [[zCell]] assumes near-uniform values; on a skewed real
    * column (lengths, counts, revenues) it concentrates the corpus in
    * a few hot cells, the same failure mode k-means fixes for SemDeDup
    * cells. Cut points are the (i·n/nBins)-th-smallest sample values
    * (value-based ranks — ties collapse), calibrated on a
    * deterministic md5 sample exactly like `LangModel.pplBuckets`:
    * the only ordered work is one window over the BOUNDED sample, and
    * the cut array (nBins−1 doubles) then bins the full corpus as a
    * shuffle-free comparison projection. Deterministic and replayable
    * as a row_number() window on any engine. */
  def rankCuts(df: DataFrame, valueCol: String, idCol: String,
      nBins: Int, sampleRate: Double): Array[Double] = {
    require(nBins >= 2 && nBins <= 1024, s"nBins out of range: $nBins")
    val sample = df
      .filter(graft.operators.Sampling.hashFraction(col(idCol)) <
        sampleRate)
      .select(col(valueCol).cast("double").as("v"))
      .persist()
    try {
      val n = sample.count()
      require(n >= nBins, s"cut sample too small: $n rows for $nBins bins")
      val ranks = (1 until nBins)
        .map(i => math.ceil(i.toDouble * n / nBins).toLong)
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      sample.withColumn("rn", row_number().over(w))
        .filter(col("rn").isin(ranks: _*))
        .orderBy("rn").select("v").collect().map(_.getDouble(0))
    } finally sample.unpersist()
  }

  /** Bin id under [[rankCuts]] boundaries: the count of cuts strictly
    * below the value — unrolled comparison conjuncts (≤ 1023), so the
    * binning stays inside whole-stage codegen. */
  def binByCuts(c: Column, cuts: Array[Double]): Column =
    cuts.map(cut => when(c.cast("double") > lit(cut), 1).otherwise(0))
      .reduceOption((a, b) => a + b).getOrElse(lit(0))
      .cast("long")

  /** CONTIGUOUS z-ranges covering every grid cell the box
    * [aLo,aHi]×[bLo,bHi] (in CELL coordinates) intersects — the
    * quadtree decomposition behind BIGMIN-style range scans: a quad
    * fully inside the box contributes ONE range regardless of its
    * area (a Morton quad is a contiguous z-interval by construction),
    * and quads straddling the boundary recurse, so the range count is
    * O(perimeter) in the box span, never O(area) — the full-interior
    * cell enumeration was quadratic in the span at fine grids.
    * Emitted in increasing z order, adjacent ranges pre-merged. */
  def zRanges(aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      gridBits: Int): Seq[(Long, Long)] = {
    require(gridBits >= 1 && gridBits <= 31, s"bits out of range: $gridBits")
    require(aLo <= aHi && bLo <= bHi, "empty box")
    require(aLo >= 0 && bLo >= 0 &&
      aHi < (1L << gridBits) && bHi < (1L << gridBits),
      "box exceeds the grid")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def rec(ax: Long, bx: Long, level: Int, zPrefix: Long): Unit = {
      val size = 1L << level
      val (aMax, bMax) = (ax + size - 1, bx + size - 1)
      if (aMax < aLo || ax > aHi || bMax < bLo || bx > bHi) return
      if (ax >= aLo && aMax <= aHi && bx >= bLo && bMax <= bHi) {
        val zLo = zPrefix << (2 * level)
        val span = 1L << (2 * level)
        // adjacent-in-z quads merge on the fly (children are visited
        // in increasing z order, so contiguity is local)
        if (buf.nonEmpty && buf.last._2 + 1 == zLo)
          buf(buf.length - 1) = (buf.last._1, zLo + span - 1)
        else buf += ((zLo, zLo + span - 1))
        return
      }
      val half = level - 1
      val hs = 1L << half
      // z bit layout: a on even bits, b on odd — child index (bBit<<1)|aBit
      rec(ax, bx, half, zPrefix << 2)
      rec(ax + hs, bx, half, (zPrefix << 2) | 1)
      rec(ax, bx + hs, half, (zPrefix << 2) | 2)
      rec(ax + hs, bx + hs, half, (zPrefix << 2) | 3)
    }
    rec(0, 0, gridBits, 0)
    buf.toSeq
  }

  /** Coalesce [[zRanges]] output down to at most `maxRanges` intervals
    * by repeatedly bridging the SMALLEST inter-range gaps — the ranges
    * over-cover (extra cells scanned, then discarded by the exact box
    * predicate), never under-cover, so the planner predicate stays a
    * bounded OR chain even for pathological boundary boxes. */
  def coalesceRanges(ranges: Seq[(Long, Long)],
      maxRanges: Int): Seq[(Long, Long)] = {
    require(maxRanges >= 1, s"maxRanges must be positive: $maxRanges")
    if (ranges.length <= maxRanges) return ranges
    // bridge the (length - maxRanges) smallest gaps
    val gaps = ranges.sliding(2).zipWithIndex
      .map { case (Seq(a, b), i) => (b._1 - a._2, i) }.toSeq
    val bridge = gaps.sortBy(_._1).take(ranges.length - maxRanges)
      .map(_._2).toSet
    val out = scala.collection.mutable.ArrayBuffer(ranges.head)
    ranges.tail.zipWithIndex.foreach { case (r, i) =>
      if (bridge(i)) out(out.length - 1) = (out.last._1, r._2)
      else out += r
    }
    out.toSeq
  }

  /** Box query over a z-clustered layout: decompose the box into
    * O(perimeter) contiguous z-ranges ([[zRanges]], capped at
    * `maxRanges` by gap coalescing), scan only the matching cell dirs
    * (partition pruning on the range predicates), then apply the exact
    * box predicate (parquet row-group pushdown within the cells). */
  def readBox(spark: SparkSession, path: String, aCol: String,
      bCol: String, aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      dimBits: Int, gridBits: Int, maxRanges: Int = 64): DataFrame = {
    require(aLo <= aHi && bLo <= bHi, "empty box")
    val s = dimBits - gridBits
    val ranges = coalesceRanges(
      zRanges(aLo >> s, aHi >> s, bLo >> s, bHi >> s, gridBits), maxRanges)
    val pred = ranges
      .map { case (lo, hi) => col("__zc").between(lo, hi) }
      .reduce(_ || _)
    spark.read.parquet(path)
      .filter(pred)
      .filter(col(aCol).between(aLo, aHi) && col(bCol).between(bLo, bHi))
  }
}

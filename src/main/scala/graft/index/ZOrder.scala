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
  * `partitionBy` that cell id — [[readBox]] then enumerates the cells
  * intersecting the query box (a bounded driver-side loop over the
  * grid, never the data) and scans them alone via partition pruning:
  * the same touched-dir discipline every other persisted layout here
  * uses, measurable through the scan's `numFiles` metric.
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

  /** Box query over a z-clustered layout: enumerate the grid cells the
    * box [aLo,aHi]×[bLo,bHi] intersects (bounded by the grid, never
    * the data), scan only those dirs (partition pruning), then apply
    * the exact box predicate (parquet row-group pushdown within the
    * cells). */
  def readBox(spark: SparkSession, path: String, aCol: String,
      bCol: String, aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      dimBits: Int, gridBits: Int): DataFrame = {
    require(aLo <= aHi && bLo <= bHi, "empty box")
    val s = dimBits - gridBits
    val cells = for {
      ha <- (aLo >> s) to (aHi >> s)
      hb <- (bLo >> s) to (bHi >> s)
    } yield mortonLong(ha, hb, gridBits)
    spark.read.parquet(path)
      .filter(col("__zc").isin(cells: _*))
      .filter(col(aCol).between(aLo, aHi) && col(bCol).between(bLo, bHi))
  }
}

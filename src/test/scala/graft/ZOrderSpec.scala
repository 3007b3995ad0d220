package graft

import graft.index.ZOrder
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Z-order clustering: Morton-code correctness (vs hand codes and the
  * driver twin) and the layout's data-skipping contract — a box query
  * opens only the cell dirs it intersects, and 2-D clustering prunes
  * where a single-column layout cannot. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def filesRead(df: org.apache.spark.sql.DataFrame,
      frag: String): Long = {
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case f: FileSourceScanExec => Seq(f)
      case o => o.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString
        .contains(frag)))
      .map(_.metrics("numFiles").value).sum
  }

  private lazy val grid = (0L until 4096L)
    .map(i => (i, i % 64, i / 64)).toDF("id", "a", "b")

  test("morton2 matches hand codes, the driver twin, and is a " +
      "bijection over the grid") {
    val out = Seq((3L, 0L), (0L, 3L), (5L, 6L), (63L, 63L)).toDF("a", "b")
      .select(ZOrder.morton2($"a", $"b", 6).as("z")).as[Long].collect()
    assert(out(0) === 5L, "a=11b interleaves to 0101b")
    assert(out(1) === 10L, "b=11b interleaves to 1010b")
    assert(out(2) === ZOrder.mortonLong(5, 6, 6))
    assert(out(3) === 4095L)
    val all = grid.select(ZOrder.morton2($"a", $"b", 6).as("z"))
      .as[Long].collect()
    assert(all.distinct.length === 4096 && all.min === 0L &&
      all.max === 4095L)
  }

  test("box query opens only intersecting cell dirs and equals the " +
      "full-scan filter") {
    val path = Files.createTempDirectory("graft_zorder").toString + "/t"
    ZOrder.write(grid, path, "a", "b", dimBits = 6, gridBits = 3)
    assert(new java.io.File(path).listFiles()
      .count(_.getName.startsWith("__zc=")) === 64)
    val one = ZOrder.readBox(spark, path, "a", "b", 0, 7, 8, 15, 6, 3)
    assert(filesRead(one, "/t") === 1L, "aligned cell box reads 1 dir")
    val four = ZOrder.readBox(spark, path, "a", "b", 0, 15, 0, 15, 6, 3)
    assert(filesRead(four, "/t") === 4L, "quarter box reads 4 dirs")
    val box = ZOrder.readBox(spark, path, "a", "b", 5, 20, 9, 40, 6, 3)
    val expect = grid.filter($"a".between(5, 20) && $"b".between(9, 40))
      .select("id").as[Long].collect().toSet
    assert(box.select("id").as[Long].collect().toSet === expect)
  }

  test("zRanges covers exactly the intersecting cells (exhaustive " +
      "boxes over a small grid)") {
    val g = 4 // 16x16 grid — every box checked against brute force
    for (aLo <- 0L until 16L by 3; aHi <- aLo until 16L by 2;
         bLo <- 0L until 16L by 3; bHi <- bLo until 16L by 2) {
      val want = (for {
        a <- aLo to aHi; b <- bLo to bHi
      } yield ZOrder.mortonLong(a, b, g)).toSet
      val got = ZOrder.zRanges(aLo, aHi, bLo, bHi, g)
        .flatMap { case (lo, hi) => lo to hi }.toSet
      assert(got === want,
        s"box [$aLo,$aHi]x[$bLo,$bHi]: ranges must cover exactly")
    }
  }

  test("range count is O(perimeter), not O(area) — the decomposition " +
      "contract that keeps fine grids usable") {
    val g = 10 // 1024x1024 grid
    // centered boxes of growing span: interior cells grow as span^2,
    // ranges must grow at most linearly in span
    val counts = Seq(32L, 64L, 128L, 256L, 512L).map { span =>
      val lo = 512L - span / 2
      val hi = lo + span - 1
      val n = ZOrder.zRanges(lo, hi, lo, hi, g).length
      assert(n <= 8 * span,
        s"span $span: $n ranges exceeds the perimeter bound")
      (span, n.toLong)
    }
    val (s0, n0) = counts.head
    val (s1, n1) = counts.last
    assert(n1.toDouble / n0 <= 2.0 * s1 / s0,
      s"range growth must track the perimeter, not the area: $counts")
    // a grid-aligned quarter box is ONE contiguous range
    assert(ZOrder.zRanges(0, 511, 0, 511, g) === Seq((0L, 262143L)))
  }

  test("coalesceRanges caps the predicate size and only ever " +
      "over-covers") {
    val ranges = ZOrder.zRanges(3, 700, 5, 900, 10)
    val capped = ZOrder.coalesceRanges(ranges, 64)
    assert(ranges.length > 64 && capped.length <= 64)
    val full = ranges.flatMap { case (lo, hi) => Seq(lo, hi) }.toSet
    assert(full.forall(z => capped.exists(r => r._1 <= z && z <= r._2)),
      "every originally covered cell must stay covered")
    assert(capped.sliding(2).forall {
      case Seq(a, b) => a._2 < b._1
      case _ => true
    }, "capped ranges stay disjoint and ordered")
  }

  test("rank-binned cells debulk a skewed dimension's hot cells; " +
      "cuts are repartition-invariant") {
    // quadratic values concentrate the low end: a quarter of the value
    // range holds half the rows
    val d = (0L until 1024L).map(i => (i, i * i / 256L))
      .toDF("id", "v")
    val cuts = ZOrder.rankCuts(d, "v", "id", nBins = 8, sampleRate = 1.0)
    assert(cuts.length === 7 && cuts.sorted.sameElements(cuts))
    assert(cuts.sameElements(
      ZOrder.rankCuts(d.repartition(13), "v", "id", 8, 1.0)),
      "cut points must not depend on partitioning")
    def maxMin(bin: org.apache.spark.sql.Column): (Long, Long) = {
      val counts = d.groupBy(bin.as("b")).count()
        .select("count").as[Long].collect()
      (counts.max, counts.min)
    }
    val (maxRanked, minRanked) = maxMin(ZOrder.binByCuts($"v", cuts))
    assert(maxRanked - minRanked <= 2,
      s"rank bins must balance: max $maxRanked min $minRanked")
    // raw equal-width bins on the same values: hot low bins
    val (maxRaw, _) = maxMin(floor($"v" * 8 / 4096).cast("long"))
    assert(maxRaw > 2 * maxRanked,
      s"the skewed dim must show the hot cell raw binning makes: " +
        s"raw max $maxRaw vs ranked max $maxRanked")
  }

  test("2-D clustering prunes a cross-dimension box where a " +
      "single-column layout cannot") {
    val dir = Files.createTempDirectory("graft_zcmp").toString
    ZOrder.write(grid, s"$dir/z", "a", "b", 6, 3)
    grid.withColumn("__ab", shiftright($"a", 3))
      .repartition($"__ab").write.partitionBy("__ab").parquet(s"$dir/lin")
    // full a range, narrow b range: the a-only layout prunes nothing
    val z = ZOrder.readBox(spark, s"$dir/z", "a", "b", 0, 63, 0, 7, 6, 3)
    val zFrac = filesRead(z, "/z") / 64.0
    val lin = spark.read.parquet(s"$dir/lin")
      .filter($"a".between(0, 63) && $"b".between(0, 7))
    val linFrac = filesRead(lin, "/lin") / 8.0
    assert(zFrac <= 0.125 && linFrac === 1.0,
      s"z read fraction $zFrac, linear $linFrac")
    assert(z.count() === lin.count())
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention and ordered-funnel analytics over an event stream
  * — the engagement rollups a product-analytics user runs daily over
  * the reference's change-stream seam (the `events` table stands in
  * for it, SURVEY.md §5.3).
  *
  * THE scale rule both operators share: the per-user aggregates
  * (first-seen week, each stage's first qualifying timestamp) are
  * user-keyed, and "user-bounded" is NOT bounded — at 100 TB of
  * events, 10⁸–10⁹ users is tens of GiB. So no join here carries a
  * `broadcast()` hint: the plans are plain equi-joins on the user key,
  * and AQE picks broadcast at runtime only when a side is GENUINELY
  * small (and falls back to a skew-safe shuffle join when it isn't —
  * the forced hint would OOM the executors exactly where the shuffle
  * join is safe). PlanAuditSpec pins the no-hint contract.
  *
  * Everything is two-to-k keyed aggregations plus equi-joins — no
  * windows over unbounded partitions, no driver-side state beyond the
  * stage list — and the arithmetic is engine-portable (week
  * truncation + integer day division), so every rollup replays as
  * plain SQL cross-engine.
  */
object CohortOps {

  /** Classic cohort retention: users grouped by first-seen week, and
    * per (cohort, week-offset) the count of distinct users active at
    * that offset. Two user-keyed aggregations joined on the user key;
    * the day-difference of two week-truncated dates is an exact
    * multiple of 7, so the integer division replays exactly. */
  def retention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val first = events.groupBy(userCol)
      .agg(date_trunc("week", min(tsCol)).as("cohort"))
    events.join(first, userCol)
      .withColumn("wk_off",
        (datediff(date_trunc("week", col(tsCol)), col("cohort")) / 7)
          .cast("long"))
      .groupBy("cohort", "wk_off")
      .agg(countDistinct(userCol).as("n_users"))
  }

  /** Ordered funnel: per user, stage i counts only when an event of
    * stage i's type STRICTLY FOLLOWS the user's first qualifying time
    * for stage i−1 (coexistence is not progression). Returns one row
    * per (user, reached stage): `(userCol, stage, s_ts)` with `stage`
    * the 0-based index and `s_ts` the stage's first qualifying time.
    *
    * Shape: one filtered aggregation + equi-join per stage — the
    * stage count is a query constant (3–7 in practice), so the plan
    * is a short fixed chain, each link shuffling only that stage's
    * candidate events and the previous stage's survivors. */
  def funnelSurvivors(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.length == stages.length,
      s"duplicate funnel stages: $stages")
    var prev = events.filter(col(typeCol) === stages.head)
      .groupBy(userCol).agg(min(tsCol).as("s_ts"))
    var acc = prev.withColumn("stage", lit(0L))
    for (i <- 1 until stages.length) {
      prev = events.filter(col(typeCol) === stages(i))
        .join(prev.select(col(userCol), col("s_ts").as("__p_ts")), userCol)
        .filter(col(tsCol) > col("__p_ts"))
        .groupBy(userCol).agg(min(tsCol).as("s_ts"))
      acc = acc.unionByName(prev.withColumn("stage", lit(i.toLong)))
    }
    acc.select(col(userCol), col("stage"), col("s_ts"))
  }

  /** Per-stage survivor counts — `(stage, n_users)`, one output row
    * per stage, computed in ONE job over [[funnelSurvivors]] (no
    * driver-side per-stage count() actions). */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame =
    funnelSurvivors(events, userCol, tsCol, typeCol, stages)
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
}

package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Iterative graph computation as relational iterations — PageRank as
  * the representative: the pattern (join ranks to edges, aggregate
  * contributions per target, recompute) is the same loop the
  * connected-components closure and Lloyd k-means here already use,
  * and the scale discipline is identical:
  *
  *  - per-iteration state is ONE node-bounded rank table and the
  *    edge-bounded contribution shuffle — nothing quadratic, nothing
  *    driver-side beyond the node-count scalar;
  *  - every iteration `localCheckpoint`s its rank table, so the plan
  *    stays flat in the iteration count (the pointer-jumping /
  *    BPE-loop precedent);
  *  - the recurrence is pure arithmetic over md5-free inputs, so a
  *    fixed-iteration run replays exactly as chained SQL CTEs
  *    (`graph_pagerank` oracle).
  *
  * The variant is the textbook damped power iteration
  * pr'(v) = (1-d)/N + d·Σ_{u→v} pr(u)/outdeg(u); dangling-node mass
  * leaks (the simplest published formulation — callers wanting
  * stochastic-matrix semantics add a dangling redistribution term).
  */
object GraphOps {

  /** `iters` damped power iterations from the uniform start. Returns
    * `(v, pr)` for every node appearing as src or dst. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    require(damping > 0 && damping < 1, s"damping in (0,1), got $damping")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    val deg = e.groupBy("src").agg(count(lit(1)).as("od")).localCheckpoint()
    var r = nodes.withColumn("pr", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contrib = e.join(r, col("src") === col("v"))
        .join(deg, "src")
        .select(col("dst").as("v"), (col("pr") / col("od")).as("m"))
        .groupBy("v").agg(sum("m").as("m"))
      r = nodes.join(contrib, Seq("v"), "left")
        .select(col("v"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("m"), lit(0.0))).as("pr"))
        .localCheckpoint()
    }
    r
  }
}

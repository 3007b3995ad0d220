package graft.queries

import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Star-schema relational coverage (the BASELINE north-star extension:
  * scans, joins incl. semi/anti/broadcast, hash aggs, rollup, windows,
  * sorts/top-k, set ops). All plans are declarative DataFrame ops so
  * Catalyst handles pushdown/pruning/broadcast selection; doubles are
  * rounded and every output carries a total order for the DuckDB hash
  * compare.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: partial+final hash agg, one shuffle.
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    // Global top-N: orderBy+limit → TakeOrderedAndProject (no full sort).
    "q2_top_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("total"))
    }),
    // 3-way join + agg + top-N revenue (TPC-H Q3 shape). customer is tiny
    // → broadcast; lineitem⋈orders shuffles on the join key.
    "q3_revenue_topn" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),
    // Full star join through region→nation→customer→orders→lineitem with
    // all dims broadcast (TPC-H Q5 shape, minus supplier re-join).
    "q5_revenue_by_nation" -> ((s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("n_name").asc)
    }),
    // Semi join: orders having at least one high-quantity line (EXISTS).
    "q_semi_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val big = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy("o_orderkey")
    }),
    // Anti join: customers with no large finished orders (NOT EXISTS).
    "q_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 150000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),
    // Window ranking: top-3 orders per customer by price.
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("rnk"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("total"))
        .orderBy("o_custkey", "rnk")
    }),
    // Running-sum window: sequential fold order matches DuckDB's.
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 3)
        .withColumn("running_qty", round(sum(col("l_quantity")).over(w), 2))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("running_qty"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    }),
    // Set ops: customers that ordered EXCEPT high-balance ones, plus an
    // INTERSECT — exercised as a distinct-set pipeline.
    "q_set_ops" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val rich = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k"))
      o.intersect(rich).except(
          t(s, dir, "customer").filter(col("c_acctbal") > 9000)
            .select(col("c_custkey").as("k")))
        .orderBy("k")
    }),
    // Rollup: subtotals + grand total over two grouping columns.
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),
    // Equi-join with a range residual: lines shipped within 60 days of
    // their order date. Stays a hash join (equi key) with the range as a
    // post-join predicate — no NLJ.
    "q_range_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      l.join(o, l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") >= o("o_orderdate") &&
          l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy("o_orderpriority")
    }),
    // Navigation + distribution window functions: lag, lead, ntile.
    "q_window_funcs" -> ((s, dir) => {
      val byDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val byPrice = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .filter(col("o_custkey") < 50)
        .select(col("o_orderkey"), col("o_custkey"),
          round(lag(col("o_totalprice"), 1).over(byDate), 2).as("prev_t"),
          round(lead(col("o_totalprice"), 1).over(byDate), 2).as("next_t"),
          ntile(4).over(byPrice).as("price_quartile"))
        .orderBy("o_orderkey")
    }),
    // RANGE-frame windows: value-based frames (vs the row-based frames
    // above). A numeric band frame (orders within ±10000 of this order's
    // price, same customer) and a trailing 30-day event-time frame —
    // frame membership depends on the ORDER BY value, so results are
    // deterministic under ties.
    "q_window_range" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("graft_ord_wr")
      s.sql(
        """SELECT o_orderkey, o_custkey,
          |  count(*) OVER band AS band_n,
          |  round(sum(o_totalprice) OVER band, 2) AS band_sum,
          |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
          |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
          |    AS trail30_n
          |FROM graft_ord_wr WHERE o_custkey < 100
          |WINDOW band AS (PARTITION BY o_custkey ORDER BY o_totalprice
          |  RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
          |ORDER BY o_orderkey""".stripMargin)
    }),
    // Approximate sketches (HLL++ count-distinct, quantile digest) — the
    // 100 TB path where exact distinct/percentile would shuffle every
    // value. Oracle strategy: the query emits EXACT values plus booleans
    // asserting the sketch landed within tolerance; the oracle computes
    // the exact values and literal TRUEs, so a sketch drifting out of
    // bounds fails the hash compare.
    "q_approx_sketch" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_exact"),
          approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("n_approx"),
          round(expr("percentile(l_quantity, 0.5)"), 2).as("p50_exact"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
            .as("p50_approx"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")) <=
            col("n_exact") * 0.05).as("acd_ok"),
          col("p50_exact"),
          (abs(col("p50_approx") - col("p50_exact")) <=
            col("p50_exact") * 0.05).as("pct_ok"))
        .orderBy("l_returnflag")
    }),
    // Null-safe equality join (<=>): null keys match each other, unlike
    // plain = which drops them.
    "q_null_safe_join" -> ((s, dir) => {
      val a = t(s, dir, "nation").select(
        when(col("n_nationkey") % 5 === 0, lit(null))
          .otherwise(col("n_regionkey")).as("k"),
        col("n_nationkey"))
      val b = t(s, dir, "region").select(
        when(col("r_regionkey") % 3 === 0, lit(null))
          .otherwise(col("r_regionkey")).as("k"),
        col("r_name"))
      a.join(b, a("k") <=> b("k"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n"), sum(col("n_nationkey")).cast("long")
          .as("sum_nk"))
        .orderBy(col("r_name").asc_nulls_first)
    }),
    // Correlated EXISTS subquery through the SQL surface (plans as a
    // semi join — the DataFrame variant is q_semi_join).
    "q_exists_subquery" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("graft_cust_ex")
      t(s, dir, "orders").createOrReplaceTempView("graft_ord_ex")
      s.sql(
        """SELECT c_custkey, c_name FROM graft_cust_ex c
          |WHERE EXISTS (SELECT 1 FROM graft_ord_ex o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_totalprice > 300000)
          |ORDER BY c_custkey""".stripMargin)
    }),
    // Higher-order array functions over the embedding column: transform /
    // filter / aggregate run as codegen'd lambdas, never UDFs.
    "q_array_hof" -> ((s, dir) => {
      Tables.load(s, dir, "embeddings")
        .filter(col("vec_id") < 50 && col("embedding").isNotNull)
        .select(col("vec_id"),
          size(filter(col("embedding"), x => x > 0f)).as("n_pos"),
          round(aggregate(col("embedding"), lit(0.0d),
            (acc, x) => acc + x.cast("double")), 4).as("sum_all"),
          round(aggregate(transform(col("embedding"),
              x => x.cast("double") * x.cast("double")), lit(0.0d),
            (acc, x) => acc + x), 4).as("sum_sq"))
        .orderBy("vec_id")
    }),
    // Navigation window functions over a whole-partition frame:
    // first_value / last_value / nth_value.
    "q_window_nav" -> ((s, dir) => {
      val whole = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .filter(col("o_custkey") < 40)
        .select(col("o_orderkey"), col("o_custkey"),
          first(col("o_orderkey")).over(whole).as("first_ok"),
          last(col("o_orderkey")).over(whole).as("last_ok"),
          nth_value(col("o_orderkey"), 2).over(whole).as("second_ok"))
        .orderBy("o_orderkey")
    }),
    // PIVOT: long-to-wide reshape with an explicit value list (explicit
    // values keep the plan a single pass — no distinct-collect job).
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(round(sum("l_quantity"), 2))
        .orderBy("l_linestatus")
    }),
    // Rank-family window functions: rank / dense_rank / percent_rank /
    // cume_dist (all deterministic under ties, unlike row_number).
    "q_window_rank_funcs" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc)
      t(s, dir, "orders")
        .filter(col("o_custkey") < 30)
        .select(col("o_orderkey"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          round(percent_rank().over(w), 4).as("prnk"),
          round(cume_dist().over(w), 4).as("cdist"))
        .orderBy("o_orderkey")
    }),
    // The WindowTopKRewrite optimizer rule end-to-end: the user writes
    // the DECLARATIVE row_number window + filter; the rule swaps in the
    // partial/final heap operator (no sort, pruned shuffle). The oracle
    // runs the same SQL in DuckDB — proving rewrite ≡ window semantics.
    "q_window_topk_rewrite" -> ((s, dir) => {
      graft.plans.WindowTopK.enable(s)
      t(s, dir, "orders").createOrReplaceTempView("graft_ord_tk")
      s.sql(
        """SELECT o_custkey, CAST(rnk AS BIGINT) AS rnk, o_orderkey
          |FROM (SELECT o_custkey, o_orderkey,
          |        row_number() OVER (PARTITION BY o_custkey
          |          ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          |      FROM graft_ord_tk WHERE o_custkey < 200)
          |WHERE rnk <= 2 ORDER BY o_custkey, rnk""".stripMargin)
    }),
    // GROUPING SETS through the SQL surface (incl. grouping() marker).
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("graft_li_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          |  CAST(grouping(l_returnflag) AS INT) AS g_rf
          |FROM graft_li_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY l_returnflag ASC NULLS FIRST,
          |         l_linestatus ASC NULLS FIRST""".stripMargin)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_range_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_window_funcs" ->
      """SELECT o_orderkey, o_custkey,
        |  round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC), 2) AS prev_t,
        |  round(lead(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC), 2) AS next_t,
        |  CAST(ntile(4) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT)
        |    AS price_quartile
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_orderkey""".stripMargin,
    "q_window_range" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(count(*) OVER band AS BIGINT) AS band_n,
        |  round(sum(o_totalprice) OVER band, 2) AS band_sum,
        |  CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS trail30_n
        |FROM orders WHERE o_custkey < 100
        |WINDOW band AS (PARTITION BY o_custkey ORDER BY o_totalprice
        |  RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "q_null_safe_join" ->
      """WITH a AS (
        |  SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL
        |              ELSE n_regionkey END AS k, n_nationkey
        |  FROM nation),
        |b AS (
        |  SELECT CASE WHEN r_regionkey % 3 = 0 THEN NULL
        |              ELSE r_regionkey END AS k, r_name
        |  FROM region)
        |SELECT b.r_name, count(*) AS n,
        |  CAST(sum(a.n_nationkey) AS BIGINT) AS sum_nk
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |GROUP BY b.r_name ORDER BY b.r_name NULLS FIRST""".stripMargin,
    "q_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q_array_hof" ->
      """SELECT vec_id,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
        |  round(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE))), 4) AS sum_all,
        |  round(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sum_sq
        |FROM embeddings
        |WHERE vec_id < 50 AND embedding IS NOT NULL
        |ORDER BY vec_id""".stripMargin,
    "q_window_nav" ->
      """SELECT o_orderkey, o_custkey,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER w AS last_ok,
        |  nth_value(o_orderkey, 2) OVER w AS second_ok
        |FROM orders WHERE o_custkey < 40
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "q_pivot" ->
      """SELECT l_linestatus,
        |  round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS "A",
        |  round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS "N",
        |  round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS "R"
        |FROM lineitem GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "q_window_rank_funcs" ->
      """SELECT o_orderkey,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  round(percent_rank() OVER w, 4) AS prnk,
        |  round(cume_dist() OVER w, 4) AS cdist
        |FROM orders WHERE o_custkey < 30
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC)
        |ORDER BY o_orderkey""".stripMargin,
    "q_window_topk_rewrite" ->
      """SELECT o_custkey, CAST(rnk AS BIGINT) AS rnk, o_orderkey
        |FROM (SELECT o_custkey, o_orderkey,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |      FROM orders WHERE o_custkey < 200)
        |WHERE rnk <= 2 ORDER BY o_custkey, rnk""".stripMargin,
    "q_approx_sketch" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact,
        |  TRUE AS acd_ok,
        |  round(quantile_cont(l_quantity, 0.5), 2) AS p50_exact,
        |  TRUE AS pct_ok
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |         l_linestatus ASC NULLS FIRST""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_top_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q3_revenue_topn" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q5_revenue_by_nation" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name ASC""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderstatus = 'F' AND o_totalprice > 150000)
        |ORDER BY c_custkey""".stripMargin,
    "q_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rnk,
        |    o_orderkey, round(o_totalprice, 2) AS total
        |  FROM orders)
        |WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,
    "q_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_qty
        |FROM lineitem
        |WHERE l_suppkey <= 3
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q_set_ops" ->
      """(SELECT o_custkey AS k FROM orders
        | INTERSECT
        | SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
        |EXCEPT
        |SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
        |ORDER BY k""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
  )
}

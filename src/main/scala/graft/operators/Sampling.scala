package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic, engine-portable sampling — the data-mixing primitive a
  * training pipeline needs that `df.sample` cannot give it: `sample`
  * draws from a per-partition seeded RNG, so the selected rows change
  * with partitioning, cluster size and Spark version. Here the
  * keep/drop decision is a pure function of the row's id (md5), so the
  * same rows are kept on any engine, any cluster, any repartitioning —
  * reproducible mixtures, diffable across pipeline versions, and
  * DuckDB-oracle-checkable.
  *
  * Scale shape: a codegen-friendly filter — no shuffle, no state; at
  * 100 TB it fuses into the scan it follows. (The reference has no
  * sampling; this extends the training-data toolkit like Dedup /
  * TextAnalysis do.)
  */
object Sampling {

  /** Uniform hash fraction in [0, 1): the first 8 md5 hex chars of the
    * id rendered as a 32-bit integer over 2^32. Exact in double, and
    * reproducible as SQL on any engine with md5(). */
  def hashFraction(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)

  /** Keep each row iff hashFraction(id) < rate. Deterministic: the same
    * id set survives every run, everywhere. */
  def deterministicSample(df: DataFrame, idCol: String,
      rate: Double): DataFrame =
    df.filter(hashFraction(col(idCol)) < rate)

  /** Per-stratum rates (data mixing): a row in stratum s survives iff
    * hashFraction(id) < rates(s), `default` for unlisted strata. The
    * rate map is driver-small by nature (one entry per source). */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], default: Double = 0.0): DataFrame = {
    val rateCol = coalesce(
      element_at(typedlit(rates), col(strataCol).cast("string")),
      lit(default))
    df.filter(hashFraction(col(idCol)) < rateCol)
  }

  /** Temperature mixing — the multilingual-pretraining rebalance where
    * source s is drawn with probability ∝ n_s^alpha (alpha < 1 flattens
    * the source distribution toward small sources; alpha = 1 is plain
    * uniform thinning). A source's keep rate is
    *
    *   r_s = min(1, budget · N / Σ_t n_t^alpha · n_s^(alpha−1))
    *
    * so ~budget·N rows survive overall with the temperature-shaped mix
    * (rates clamp at 1 — a filter cannot upsample; the budget then
    * undershoots, the standard behavior). Rates are computed on the
    * cluster (one tiny per-source agg, broadcast back); the keep
    * decision stays the shuffle-free md5 predicate, so the selected id
    * set is deterministic and replayable on any engine. */
  /** Leakage-free train/holdout split: the keep decision hashes the
    * GROUP key, so every row of a group (all chunks of a document, all
    * documents of a domain) lands in the same split — the property that
    * prevents near-duplicate leakage across train/eval that row-level
    * `randomSplit` silently violates. Deterministic and shuffle-free
    * like every Sampling decision. */
  def groupSplit(df: DataFrame, groupCol: String, trainFrac: Double,
      splitCol: String = "split"): DataFrame =
    df.withColumn(splitCol,
      when(hashFraction(col(groupCol)) < trainFrac, lit("train"))
        .otherwise(lit("holdout")))

  /** Token-budget mixing — "give me ~B tokens per source": within each
    * stratum, documents are taken in deterministic md5-fraction order
    * (ties broken by id) until the stratum's token budget is reached; a
    * document is kept iff the tokens BEFORE it are still under budget,
    * so the budget-crossing document is included and the mix replays
    * identically on any engine.
    *
    * Scale shape: the textbook form is one running-sum window per
    * stratum — a total sort of the corpus over a handful of stratum
    * partitions, the worst skew shape there is at 100 TB. This computes
    * the EXACT same selection in two phases instead: (1) a bucketed
    * token histogram (stratum × `buckets` md5-range buckets → one
    * partial-agg shuffle whose result is tiny), cumulated per stratum
    * with a window over that tiny table to classify every bucket as
    * fully-kept / fully-dropped / boundary; (2) fully-kept buckets pass
    * as a broadcast-join + filter (no sort), and only the single
    * boundary bucket per stratum (~1/`buckets` of the data) pays the
    * exact running-sum window. Bucket id is monotonic in the fraction,
    * so (bucket, frac, id) order ≡ (frac, id) order and the result is
    * bit-identical to the single-window form — which is exactly what
    * the DuckDB oracle runs. */
  def tokenBudget(df: DataFrame, idCol: String, strataCol: String,
      tokensCol: String, budgets: Map[String, Long],
      default: Long = 0L, buckets: Int = 4096): DataFrame =
    tokenBudgetByKey(df, idCol, strataCol, tokensCol,
      hashFraction(col(idCol)), budgets, default, buckets)

  /** Priority-ordered token budget — the CURRICULUM form: "the best B
    * tokens per source". `priorityCol` must be a double in [0, 1]
    * (e.g. [[TextAnalysis.qualityScore]]); within each stratum the
    * HIGHEST-priority documents are taken first (ties by id) until the
    * budget is crossed. Same two-phase exact plan as [[tokenBudget]] —
    * the bucketed histogram keys on the priority itself, so no stratum
    * ever pays a full sort here either. */
  def tokenBudgetBy(df: DataFrame, idCol: String, strataCol: String,
      tokensCol: String, priorityCol: Column, budgets: Map[String, Long],
      default: Long = 0L, buckets: Int = 4096): DataFrame =
    tokenBudgetByKey(df, idCol, strataCol, tokensCol,
      lit(1.0) - priorityCol, budgets, default, buckets)

  /** Shared two-phase exact selection in ascending `key` order (key in
    * [0, 1]; ties broken by id). See [[tokenBudget]] for the plan. */
  private def tokenBudgetByKey(df: DataFrame, idCol: String,
      strataCol: String, tokensCol: String, key: Column,
      budgets: Map[String, Long], default: Long,
      buckets: Int): DataFrame = {
    val base = df.withColumn("__frac", key)
      // clamp: key = 1.0 exactly (priority 0) must land in the last
      // bucket, not one past it
      .withColumn("__bkt", least(floor(col("__frac") * buckets),
        lit(buckets - 1)).cast("int"))
    val budgetCol = coalesce(
      element_at(typedlit(budgets), col(strataCol).cast("string")),
      lit(default))
    // Phase 1: per-(stratum, bucket) token sums — tiny (strata × buckets).
    val hist = base.groupBy(col(strataCol), col("__bkt"))
      .agg(sum(col(tokensCol).cast("long")).as("__tok"))
    val wh = Window.partitionBy(strataCol).orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    // keep: __before + __tok < budget guarantees every row's
    // preceding-sum stays under budget (even for zero-token rows at the
    // bucket's end); drop: at/over budget before the bucket starts;
    // boundary: the budget line crosses inside this bucket — only these
    // rows pay the exact per-row window in phase 2.
    val cls = hist
      .withColumn("__before", coalesce(sum("__tok").over(wh), lit(0L)))
      .withColumn("__budget", budgetCol)
      .withColumn("__class",
        when(col("__before") >= col("__budget"), lit("drop"))
          .when(col("__before") + col("__tok") < col("__budget"), lit("keep"))
          .otherwise(lit("boundary")))
      .select(col(strataCol), col("__bkt"), col("__before"), col("__budget"),
        col("__class"))
    val joined = base.join(broadcast(cls), Seq(strataCol, "__bkt"))
      .filter(col("__class") =!= "drop")
    val full = joined.filter(col("__class") === "keep")
    // Phase 2: exact window over boundary-bucket rows only.
    val wb = Window.partitionBy(col(strataCol), col("__bkt"))
      .orderBy(col("__frac"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bnd = joined.filter(col("__class") === "boundary")
      .withColumn("__in",
        coalesce(sum(col(tokensCol).cast("long")).over(wb), lit(0L)))
      .filter(col("__before") + col("__in") < col("__budget"))
      .drop("__in")
    full.unionByName(bnd)
      .drop("__frac", "__bkt", "__before", "__budget", "__class")
  }

  /** DSIR-style importance scoring (Xie et al. 2023,
    * arXiv:2302.03169): score raw documents by how much more likely
    * their hashed-token features are under a small TARGET corpus'
    * distribution than under the raw corpus' own —
    * `log w(doc) = Σ_tokens [log p̂_target(b(tok)) − log p̂_raw(b(tok))]`
    * with `b` = the token's md5 bucket (`16^hexChars` buckets, the
    * paper's hashed n-gram trick collapsing an open vocabulary to a
    * fixed feature space) and add-one smoothing on both distributions.
    * Downstream selection keeps the top-budget docs
    * ([[dsirSelect]]) — "data selection with importance resampling"
    * toward a quality/domain target, the tier between the pure-rate
    * mixers above and a learned classifier
    * ([[LangModel]]'s naive Bayes).
    *
    * Scale shape: two bounded aggregations (≤ B rows each), a
    * broadcast join of the B-row log-ratio table onto the raw token
    * stream, one groupBy doc — no all-pairs, no driver state, and the
    * heavy shuffle keys on (doc id), never on the corpus pair.
    * Deterministic and engine-portable like everything here: md5
    * buckets, so the whole scoring replays as SQL.
    *
    * Returns `(idCol, log_weight)` for every raw doc with ≥ 1 token. */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, hexChars: Int = 3): DataFrame = {
    // 16^6 = 16.7M buckets is already far past DSIR's published feature
    // space (the paper uses 10^4); beyond it the ratio table stops
    // being broadcastable and the operator's "≤ B rows" framing breaks
    require(hexChars >= 1 && hexChars <= 6, "hexChars in [1, 6]")
    val b = math.pow(16, hexChars).toLong
    // broadcast the ratio table only while it is genuinely small; at
    // 16^6 potential buckets fall back to a shuffle join rather than
    // risk OOMing the driver on a high-cardinality corpus
    val hintRatio: DataFrame => DataFrame =
      if (b <= (1L << 20)) broadcast(_) else identity
    def toks(df: DataFrame, cols: Column*) = df
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(cols :+ explode(split(trim(col(textCol)), "\\s+"))
        .as("__tok"): _*)
      .withColumn("__bkt",
        conv(substring(md5(col("__tok")), 1, hexChars), 16, 10)
          .cast("long"))
    val rawToks = toks(raw, col(idCol))
    val tgtCnt = toks(target).groupBy("__bkt").agg(count(lit(1)).as("__tc"))
    val rawCnt = rawToks.groupBy("__bkt").agg(count(lit(1)).as("__rc"))
    val tgtTot = tgtCnt.agg(sum("__tc").as("__tt"))
    val rawTot = rawCnt.agg(sum("__rc").as("__rt"))
    // ≤ B rows: raw buckets (the only ones ever looked up), target
    // counts joined in with 0 default, totals broadcast-crossed
    val ratio = rawCnt
      .join(tgtCnt, Seq("__bkt"), "left")
      .crossJoin(broadcast(tgtTot)).crossJoin(broadcast(rawTot))
      .select(col("__bkt"),
        (log(coalesce(col("__tc"), lit(0L)) + lit(1.0)) -
          log(col("__tt") + lit(b.toDouble)) -
          log(col("__rc") + lit(1.0)) +
          log(col("__rt") + lit(b.toDouble))).as("__lr"))
    rawToks.join(hintRatio(ratio), Seq("__bkt"))
      .groupBy(col(idCol))
      .agg(sum("__lr").as("log_weight"))
  }

  /** [[dsirLogWeights]] + deterministic selection: keep the `k` docs
    * whose hashed-feature likelihood ratio most favors the target
    * (ties by id). The paper resamples from Gumbel-perturbed weights;
    * the deterministic top-k variant keeps the operator
    * engine-portable and diffable across runs — seeded-noise
    * resampling composes on top via [[hashFraction]] if spread is
    * needed. */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, hexChars: Int = 3): DataFrame =
    dsirLogWeights(raw, target, idCol, textCol, hexChars)
      .orderBy(col("log_weight").desc, col(idCol).asc)
      .limit(k)

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res,
    * Inf. Process. Lett. 97(5), 2006): each row draws the key
    * u^(1/w) with u = hashFraction(id); the k LARGEST keys are exactly
    * a weighted sample without replacement — P(row first) = w / Σw,
    * then recursively on the rest. With u md5-deterministic the
    * selected id set is reproducible on any engine/partitioning and
    * the whole draw replays as SQL pow().
    *
    * Scale shape: a shuffle-free key projection + ONE bounded top-k
    * heap (`TakeOrdered`) — never a global sort, no per-stratum state.
    * Rows with w ≤ 0 or null never qualify (a zero-weight row must not
    * beat a positive one at u→1). Ties (never, for distinct ids) break
    * on id for a total order. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__key",
        pow(hashFraction(col(idCol)), lit(1.0) / col(weightCol)))
      .orderBy(col("__key").desc, col(idCol).asc)
      .limit(k)
      .drop("__key")
  }

  /** Deterministic epoch shuffle + shard assignment — the training-data
    * writer's ordering: epoch e permutes the corpus by
    * frac = hashFraction(e || '|' || id), shard = floor(frac · n), and
    * position-in-shard = rank of (frac, id) within the shard. Every
    * epoch is a fresh, reproducible permutation (change e, nothing
    * else); membership never changes, only order.
    *
    * Scale shape: ONE hash exchange on the shard key + a per-shard
    * sort — exactly the `repartition(shard).sortWithinPartitions`
    * plan a shard writer runs; shards are uniform by construction
    * (md5 fraction), so the sort never sees corpus-scale skew. No
    * global sort, no driver state. A writer that doesn't need the
    * explicit `pos` column drops the window and keeps the same
    * exchange+sort. */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    val frac = hashFraction(
      concat_ws("|", lit(epoch.toString), col(idCol).cast("string")))
    val w = Window.partitionBy("shard").orderBy(col("__frac"), col(idCol))
    df.withColumn("__frac", frac)
      .withColumn("shard", floor(col("__frac") * nShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__frac")
  }

  /** Materialize an epoch's shards: one dir per shard, rows inside
    * each file already in the epoch's (frac, id) read order — a
    * training loader streams shard dirs sequentially with zero
    * shuffling at read time. One exchange on the shard key (the
    * [[epochShuffle]] plan), each shard written by one task. */
  def writeShards(df: DataFrame, idCol: String, epoch: Int,
      nShards: Int, path: String): Unit =
    epochShuffle(df, idCol, epoch, nShards)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Largest-remainder (Hamilton) apportionment: split an INTEGER
    * `budget` across keys in proportion to integer weights, summing to
    * the budget EXACTLY — floors of budget·w/total, then the
    * top-(budget − Σfloors) fractional remainders get one more. Every
    * step is integer arithmetic (`div`/`mod` on longs), so the split
    * is bit-reproducible on any engine — the allocation shape a crawl
    * scheduler (fetch quota per domain) or a training-mix planner
    * (examples per source) needs, where float shares drift and never
    * sum to the budget. Remainder ties break by key. The rank window
    * is UNPARTITIONED — justified exactly like the KMV jaccard window:
    * the input is key-bounded (domains/sources), never row-bounded. */
  def apportion(df: DataFrame, keyCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget=$budget")
    // NULL weight = unknown demand -> 0 (the key stays visible in the
    // allocation instead of poisoning base/rem with NULL arithmetic).
    val w = df.select(col(keyCol).as("key"),
      coalesce(col(weightCol).cast("long"), lit(0L)).as("w"))
    // Eager total: the input is key-bounded (domains/sources), and the
    // guard must be LOUD on a non-empty input — an all-zero total would
    // otherwise flow NULL through div/pmod and come back as a silent
    // NULL alloc. A genuinely EMPTY input (e.g. a drained crawl
    // frontier) is not an error: the natural allocation is empty.
    val totRow = w.agg(sum("w"), min("w")).head()
    if (totRow.isNullAt(0))
      return w.withColumn("alloc", lit(0L))
        .select(col("key").as(keyCol), col("w"), col("alloc"))
    require(totRow.getLong(0) > 0,
      "apportion: summed weight must be positive")
    require(totRow.getLong(1) >= 0,
      "apportion: weights must be non-negative")
    val totV = totRow.getLong(0)
    require(budget == 0 || totV <= Long.MaxValue / budget,
      s"apportion: budget*totalWeight overflows Long " +
        s"(budget=$budget, total=$totV)")
    val q = w
      .withColumn("base", expr(s"($budget * w) div ${totV}L"))
      .withColumn("rem", pmod(lit(budget) * col("w"), lit(totV)))
    val deficit = q.agg((lit(budget) - sum("base")).as("__d"))
    val wn = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("key").asc)
    q.crossJoin(broadcast(deficit))
      .withColumn("__rnk", row_number().over(wn))
      .withColumn("alloc",
        col("base") + when(col("__rnk") <= col("__d"), 1L).otherwise(0L))
      .select(col("key").as(keyCol), col("w"), col("alloc"))
  }

  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
      alpha: Double, budget: Double): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__ns"))
    val totals = counts.agg(sum("__ns").as("__n"),
      sum(pow(col("__ns"), alpha)).as("__z"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col(strataCol),
        least(lit(1.0), lit(budget) * col("__n") / col("__z") *
          pow(col("__ns"), alpha - 1)).as("__rate"))
    df.join(broadcast(rates), strataCol)
      .filter(hashFraction(col(idCol)) < col("__rate"))
      .drop("__rate")
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Bloom-filter cross-corpus membership — the O(1)-per-row form of
  * "have we ingested this document before?".
  *
  * The reference dedups only within a result set (BE:72–82) and keeps
  * its corpus fresh through the change-data-feed sync seam (SD:68–75).
  * At 100 TB the question inverts: an incoming batch must be checked
  * against the *historical* corpus, and the join that answers it
  * (`batch ANTI JOIN history ON key`) shuffles the full history every
  * run. The production answer is a Bloom filter: fold the history's
  * keys into an m-bit array once, then probe each incoming row with k
  * hash-bit tests — a shuffle-free projection whose cost is independent
  * of history size. The price is a quantified false-positive rate
  * (novel rows wrongly dropped as dups); there are no false negatives.
  *
  * Everything here is md5-deterministic, so the filter's bit pattern —
  * and therefore every membership verdict, including the false
  * positives — is reproducible as plain SQL on any engine:
  * position_j(key) = int(md5(key || '|' || j)[0,15 hex]) mod m.
  *
  * Scale shape:
  *  - build: one explode + distinct + `bit_or` word aggregation over
  *    the history — the ONLY corpus-sized pass; the collect is bounded
  *    by m/64 words, never by corpus size.
  *  - probe: a literal-array bit test inside whole-stage codegen; no
  *    join, no shuffle, no broadcast exchange. The bitmap rides in the
  *    plan (fine to ~10^7 bits); past that, ship the same words with
  *    `SparkContext.broadcast` and probe via [[novelViaBroadcast]] —
  *    identical verdicts, executor-memory-resident bitmap (a 2^33-bit
  *    filter for ~10^9 history keys is 1 GiB — broadcast once, probe
  *    every batch).
  */
object Bloom {

  /** The k bit positions lit by `key`: md5(key|j) over 15 hex chars
    * (60 bits, exact in a Long) mod m. One array expression, codegen'd,
    * replayable in SQL as CAST('0x' || substr(md5(..),1,15) AS BIGINT). */
  def positions(key: Column, mBits: Int, k: Int): Column = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
    require(k >= 1 && k <= 32, s"k out of range: $k")
    transform(sequence(lit(0), lit(k - 1)), j =>
      pmod(conv(substring(md5(concat(key, lit("|"), j.cast("string"))), 1, 15),
        16, 10).cast("long"), lit(mBits.toLong)))
  }

  /** Fold the history's keys into the m-bit filter. The distinct and
    * the word-wise `bit_or` both key on position/word id, so the shuffle
    * is bounded by m, and the driver collects at most m/64 rows. */
  def build(history: DataFrame, keyCol: String, mBits: Int, k: Int): Array[Long] = {
    val words = history
      .select(explode(positions(col(keyCol), mBits, k)).as("p"))
      .distinct()
      .select(shiftright(col("p"), 6).cast("int").as("w"),
        call_function("shiftleft", lit(1L), pmod(col("p"), lit(64L)).cast("int")).as("m"))
      .groupBy("w").agg(bit_or(col("m")).as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Shard merge: the union's filter is the word-wise OR of the shards'
    * filters — build per shard, OR on the driver, no re-scan. */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length, "bloom word counts differ")
    Array.tabulate(a.length)(i => a(i) | b(i))
  }

  /** Membership verdict for `key` against a built filter: all k bits
    * set. The k tests are UNROLLED into plain conjunct expressions
    * (k is known here), not a lambda `forall` — higher-order array
    * functions fall back to interpreted eval, while this form stays
    * inside whole-stage codegen (PlanAuditSpec pins it). The bitmap is
    * a literal array in the plan; no join, no shuffle. */
  def memberCol(key: Column, bits: Array[Long], k: Int): Column = {
    require(k >= 1 && k <= 32, s"k out of range: $k")
    val mBits = bits.length * 64
    val words = typedLit(bits.toSeq)
    (0 until k).map { j =>
      val p = pmod(conv(substring(
        md5(concat(key, lit("|"), lit(j.toString))), 1, 15), 16, 10)
        .cast("long"), lit(mBits.toLong))
      (element_at(words, shiftright(p, 6).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pmod(p, lit(64L)).cast("int")))) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** Keep only rows whose key is NOT (probably) in the history — the
    * admission filter for an incoming batch. False positives drop some
    * genuinely novel rows (the filter's documented trade); no true
    * duplicate ever survives. Rows with a NULL key drop too (their
    * verdict is NULL under SQL three-valued logic — a keyless row has
    * no admission decision). */
  def novel(batch: DataFrame, keyCol: String, bits: Array[Long], k: Int): DataFrame =
    batch.filter(!memberCol(col(keyCol), bits, k))

  /** The giant-filter probe: same verdicts as [[novel]], but the words
    * ride an executor-side torrent broadcast instead of the plan, so a
    * multi-GiB filter never bloats the query plan or the task binaries.
    * Row-at-a-time (no codegen) — use only past literal scale. */
  def novelViaBroadcast(batch: DataFrame, keyCol: String,
      bits: Array[Long], k: Int): DataFrame = {
    val spark = batch.sparkSession
    val bc = spark.sparkContext.broadcast(bits)
    val mBits = bits.length * 64
    // NULL key → None → NULL verdict → row dropped, exactly like the
    // codegen path's three-valued logic (a keyless row has no
    // admission decision); without the guard the UDF would hash the
    // literal text "null|j" and hand the row a real verdict.
    val member = udf { key: String =>
      if (key == null) None
      else {
        val words = bc.value
        var j = 0
        var all = true
        while (all && j < k) {
          val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$key|$j")
          val p = (java.lang.Long.parseLong(hex.substring(0, 15), 16) % mBits).toInt
          all = (words(p >>> 6) & (1L << (p & 63))) != 0
          j += 1
        }
        Some(all)
      }
    }
    batch.filter(!member(col(keyCol).cast("string")))
  }

  /** A filter whose k travels WITH its bits — the only probe-safe
    * unit: probing with k' < k bits passes rows the build would
    * reject, silently inverting the filter's one hard guarantee (no
    * false negatives). Callers holding a `BloomFilter` cannot
    * mismatch k by construction. */
  final case class BloomFilter(bits: Array[Long], k: Int) {
    require(k >= 1 && k <= 32, s"k out of range: $k")
    require(bits.nonEmpty, "empty filter")
    def mBits: Int = bits.length * 64
    def memberCol(key: Column): Column = Bloom.memberCol(key, bits, k)
    def novel(batch: DataFrame, keyCol: String): DataFrame =
      Bloom.novel(batch, keyCol, bits, k)
    def novelViaBroadcast(batch: DataFrame, keyCol: String): DataFrame =
      Bloom.novelViaBroadcast(batch, keyCol, bits, k)
    def merge(other: BloomFilter): BloomFilter = {
      require(other.k == k,
        s"cannot merge filters built with different k: $k vs ${other.k}")
      BloomFilter(Bloom.merge(bits, other.bits), k)
    }
    def fillStats: (Long, Long, Long) = Bloom.fillStats(bits, k)
  }

  /** [[build]] wrapped in its probe-safe carrier. */
  def buildFilter(history: DataFrame, keyCol: String, mBits: Int,
      k: Int): BloomFilter =
    BloomFilter(build(history, keyCol, mBits, k), k)

  /** Persisted-artifact layout version (bump on layout change). */
  val FormatVersion: Int = 2

  /** Persist the filter as one parquet row per 64-bit word, with
    * `(k, version)` beside every word — the layout that lets the NEXT
    * ingest batch reopen the history filter without re-scanning
    * history, and that makes a k-mismatch on reopen impossible: the
    * probe k is read FROM the artifact, never from caller config (a
    * mismatched k would silently false-negate — the inverted
    * contract). m falls out of the word count. Composes with
    * [[BloomFilter.merge]] for shard builds. */
  def save(spark: org.apache.spark.sql.SparkSession, filter: BloomFilter,
      path: String): Unit = {
    import spark.implicits._
    filter.bits.zipWithIndex
      .map { case (w, i) => (i, w, filter.k, FormatVersion) }.toSeq
      .toDF("w", "bits", "k", "version")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reopen a persisted filter; the returned [[BloomFilter]] owns the
    * k it was built with. Refuses legacy/foreign artifacts that carry
    * no k (probing those with guessed config is exactly the silent
    * false-negative hazard this layout exists to close). */
  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): BloomFilter = {
    val df = spark.read.parquet(path)
    require(df.columns.contains("k") && df.columns.contains("version"),
      s"bloom artifact at $path carries no (k, version) metadata — " +
        "rebuild and re-save it; probing with caller-guessed k risks " +
        "silent false negatives")
    val rows = df.select("w", "bits", "k", "version").collect()
    require(rows.nonEmpty, s"empty bloom artifact at $path")
    val ks = rows.map(_.getInt(2)).distinct
    val vs = rows.map(_.getInt(3)).distinct
    require(ks.length == 1 && vs.length == 1,
      s"inconsistent bloom artifact at $path: k=${ks.toSeq} version=${vs.toSeq}")
    require(vs.head == FormatVersion,
      s"bloom artifact version ${vs.head} != $FormatVersion at $path")
    val arr = new Array[Long](rows.length)
    rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    BloomFilter(arr, ks.head)
  }

  /** Filter telemetry: bits set, fill per-mille, and the fill^k
    * false-positive estimate in micro-units — all integer (BigInt)
    * arithmetic, exact on any engine for any k. */
  def fillStats(bits: Array[Long], k: Int): (Long, Long, Long) = {
    require(k >= 1 && k <= 32, s"k out of range: $k")
    val m = bits.length.toLong * 64
    val set = bits.map(java.lang.Long.bitCount(_).toLong).sum
    val fillPerMille = set * 1000L / m
    val fppMicro =
      (BigInt(set).pow(k) * 1000000 / BigInt(m).pow(k)).toLong
    (set, fillPerMille, fppMicro)
  }
}

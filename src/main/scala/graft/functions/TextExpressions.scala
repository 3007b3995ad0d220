package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-node Catalyst expressions for the text hot paths: word-shingle
  * extraction, MinHash signatures, and hash-projection embedding.
  *
  * Why expressions and not higher-order-function compositions: a
  * `transform/aggregate/zip_with` tree computes the same thing, but any
  * reuse of the resulting column invites Catalyst to inline the whole
  * tree at each reference, and nested HOF lambdas re-evaluate inner
  * aggregates per element — measured 30x blowups at bench time. One
  * opaque expression evaluates exactly once per reference with a tight
  * loop inside (SURVEY.md §4.4: custom Expression beats UDF beats
  * HOF-tree for kernels). CodegenFallback is fine: the work is one
  * virtual call per row into JVM-jitted Scala.
  */
object TextHash {
  /** xxhash64 over a UTF8String with an int seed (same primitive Spark's
    * xxhash64 builtin uses underneath). */
  @inline def hash(s: UTF8String, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  private[functions] val ws = "\\s+".r
  def tokenize(text: UTF8String): Array[UTF8String] = {
    val trimmed = text.trim()
    if (trimmed.numBytes == 0) Array.empty
    else ws.split(trimmed.toString).map(UTF8String.fromString)
  }
}

/** MD5-derived hashes: the CROSS-ENGINE REPRODUCIBLE alternative to
  * xxhash64. MD5 is a published, byte-exact standard every engine
  * implements identically (JVM `MessageDigest`, DuckDB `md5()`,
  * Postgres, …), so operators built on it — simhash, minhash,
  * feature-hash embeddings — produce THE SAME values in Spark and in
  * the DuckDB oracle, making the whole fuzzy-dedup/ANN surface
  * hash-checkable end to end. xxhash64 stays the scale default (~5x
  * faster); `algo = "md5"` buys auditability: a 100 TB corpus prep run
  * can be spot-verified row-for-row by any other SQL engine.
  */
object Md5Hash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 digest bytes, big-endian — the value a SQL engine recovers
    * from hex chars 1-16 of `md5(s)` (char 1 = bits 63..60). */
  def hash64(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    h
  }

  private val hexChars = "0123456789abcdef".toCharArray

  /** Full lowercase hex digest of `prefix || s` — comparable
    * lexicographically (fixed-length lowercase hex orders like the
    * unsigned 128-bit value, so `min(hex)` is a valid minhash). */
  def hexDigest(prefix: String, s: UTF8String): UTF8String = {
    val d = md.get()
    d.reset()
    d.update(prefix.getBytes("UTF-8"))
    val digest = d.digest(s.getBytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((digest(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(digest(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** `string → long`: 64-bit SimHash over whitespace tokens in ONE pass —
  * per token hash, each bit votes +1/-1; the sign of the vote sum sets
  * the output bit. Replaces a 64x `aggregate()` HOF foldLeft that
  * re-traversed the token hashes once PER BIT (the nested-HOF
  * re-evaluation trap, measured 30x+ on kernels this shape).
  *
  * `algo`: "xx" (xxhash64, scale default) | "md5" (cross-engine
  * reproducible — the DuckDB oracle rebuilds identical signatures from
  * `md5()` hex, so near-dup pairs at a Hamming radius are hash-checked
  * against SQL, not just spec-trusted). Empty/whitespace text → 0L.
  */
case class SimHash64(child: Expression, algo: String)
    extends UnaryExpression with CodegenFallback {
  require(algo == "xx" || algo == "md5", s"simhash64: unknown algo $algo")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val toks = TextHash.tokenize(input.asInstanceOf[UTF8String])
    val votes = new Array[Int](64)
    val useMd5 = algo == "md5"
    var i = 0
    while (i < toks.length) {
      val h = if (useMd5) Md5Hash.hash64(toks(i))
              else TextHash.hash(toks(i), 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `array<string> → array<string>`: k-seed MinHash signature over MD5 hex
  * digests — `sig(d) = min over shingles of md5(d || ' ' || shingle)`,
  * min by lexicographic hex (≡ unsigned numeric order). Same banding /
  * refine machinery as [[MinHashSig]], but every value is reproducible
  * as SQL (`min(md5(d || ' ' || s))`), so the LSH candidate stage itself
  * is oracle-checkable. Empty input → k empty strings (no bucket
  * collisions with real docs). */
case class MinHashSigMd5(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig_md5"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = new Array[UTF8String](k)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      var d = 0
      while (d < k) {
        val h = Md5Hash.hexDigest(d.toString + " ", s)
        if (sig(d) == null || h.compareTo(sig(d)) < 0) sig(d) = h
        d += 1
      }
      i += 1
    }
    var d = 0
    while (d < k) {
      if (sig(d) == null) sig(d) = UTF8String.EMPTY_UTF8
      d += 1
    }
    new GenericArrayData(sig.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `string → array<float>`: MD5 feature-hashing embedding — per token,
  * byte 7 of the digest picks the dimension (`% dim`, so dim ≤ 256) and
  * bit 6 the ±1 sign; contributions sum per dimension. Deliberately NOT
  * L2-normalized: components stay small exact integers, so dot products
  * and norms computed downstream are exact in double on ANY engine —
  * cosine rankings from these vectors are bit-identical between Spark
  * and the DuckDB oracle (cosine is scale-invariant, so normalization
  * adds nothing but float-rounding divergence). One digest per token
  * (vs 2·dim xxhash calls in [[TextHashEmbed]]). Null/empty → null. */
case class Md5FeatureHashEmbed(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {
  require(dim >= 1 && dim <= 256, "md5_feature_embed: dim must be in [1, 256]")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "md5_feature_embed"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val toks = TextHash.tokenize(input.asInstanceOf[UTF8String])
    if (toks.isEmpty) return null
    val acc = new Array[Int](dim)
    var i = 0
    while (i < toks.length) {
      val h = Md5Hash.hash64(toks(i))
      val b7 = (h & 0xffL).toInt
      val d = b7 % dim
      if (((h >>> 6) & 1L) == 1L) acc(d) += 1 else acc(d) -= 1
      i += 1
    }
    val out = new Array[Float](dim)
    var d = 0
    while (d < dim) { out(d) = acc(d).toFloat; d += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `string → array<string>`: distinct word n-gram shingles (space-joined),
  * first-occurrence order. Fewer than n tokens → empty array. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val toks = TextHash.tokenize(input.asInstanceOf[UTF8String])
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    // sorted set output: lets pairwise consumers intersect by linear
    // merge (SortedIntersectSize) instead of quadratic contains-scans
    val seen = new java.util.TreeSet[UTF8String]()
    var i = 0
    val sp = UTF8String.fromString(" ")
    while (i <= toks.length - n) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        parts(2 * j) = toks(i + j)
        if (j < n - 1) parts(2 * j + 1) = sp
        j += 1
      }
      seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `(array<string>, array<string>) → int`: intersection size of two
  * SORTED string arrays by linear merge — O(m+n) instead of the O(m·n)
  * of `size(filter(a, x => array_contains(b, x)))`. WordShingles emits
  * sorted arrays precisely so pairwise Jaccard refinement (the inner
  * loop of dedup) can use this. */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { n += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `array<string> → array<long>`: k-seed MinHash signature. Empty input
  * → signature of Long.MaxValue (matches the HOF formulation's fold
  * identity). */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getUTF8String(i)
      var d = 0
      while (d < k) {
        val h = TextHash.hash(s, d.toLong)
        if (h < sig(d)) sig(d) = h
        d += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `string → array<float>`: deterministic L2-normalized hash-projection
  * embedding. Per token and dimension d: sign from bit 0 of
  * xxhash64(token, d), weight from xxhash64(token, d+7919) mod 97 / 97.
  * Null/empty text → null (embed failures never enter an index —
  * reference behavior, syntetic_data.py:140,169). */
case class TextHashEmbed(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {
  require(dim >= 1)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "text_hash_embed"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val toks = TextHash.tokenize(input.asInstanceOf[UTF8String])
    if (toks.isEmpty) return null
    val acc = new Array[Double](dim)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var d = 0
      while (d < dim) {
        val sign = if ((TextHash.hash(t, d.toLong) & 1L) == 1L) 1.0 else -1.0
        val h2 = TextHash.hash(t, (d + 7919).toLong)
        val w = (((h2 % 97) + 97) % 97).toDouble / 97.0
        acc(d) += sign * w
        d += 1
      }
      i += 1
    }
    var norm = 0.0
    var d = 0
    while (d < dim) { norm += acc(d) * acc(d); d += 1 }
    val nrm = math.sqrt(norm)
    val out = new Array[Float](dim)
    d = 0
    while (d < dim) {
      out(d) = (if (nrm == 0.0) acc(d) else acc(d) / nrm).toFloat; d += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `string → string`: apply a trained BPE merge table
  * ([[graft.operators.TextAnalysis.bpeTrain]]) in ONE expression pass —
  * the production apply path. The rank-order `replace` chain
  * ([[graft.operators.TextAnalysis.bpeApply]]) is the semantics
  * witness, but as an expression TREE it grows one node per merge: at
  * a real tokenizer's 30k merges that is a 30k-deep Catalyst plan
  * (analyzer/codegen blow-up long before execution). This node holds
  * the merge table as DATA and encodes with the classic
  * tokenizer algorithm — adjacent-pair linked list + lazy-deletion
  * min-heap on (rank, position) — O(len · log len) per row,
  * independent of merge count.
  *
  * Equivalence to the chain (QualitySpec asserts it): merging pair r
  * only creates adjacencies involving the fresh symbol U+E000+r, which
  * participates in LATER-rank pairs only — so no earlier-rank pair is
  * ever (re)created, and "replace rank 1 everywhere, then rank 2, …"
  * equals "repeatedly merge the lowest-rank pair present"; the
  * (rank, position) heap order reproduces the chain's greedy
  * left-to-right handling of overlaps ("aaa" → "Xa"). Precondition
  * shared with training: BMP text without private-use chars. */
case class BpeEncode(child: Expression, merges: Seq[(Int, String)])
    extends UnaryExpression with CodegenFallback {
  require(merges.forall { case (r, p) =>
    r >= 1 && r <= 0x18FF && p.length == 2 },
    "merges must be (rank in [1, 0x18FF], 2-char pair)")
  // a trained table can never repeat a pair (merging removes every
  // occurrence and fresh symbols only feed later-rank pairs), and the
  // rank map below keys by pair — reject rather than silently keep one
  require(merges.map(_._2).distinct.size == merges.size,
    "duplicate pair in merge table")
  require(merges.map(_._1).distinct.size == merges.size,
    "duplicate rank in merge table")
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_encode"

  @transient private lazy val ranks: scala.collection.mutable.LongMap[Int] = {
    val m = scala.collection.mutable.LongMap.empty[Int]
    merges.foreach { case (r, p) =>
      m.update((p.charAt(0).toLong << 16) | p.charAt(1).toLong, r)
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < 2 || ranks.isEmpty) return input
    val chars = s.toCharArray
    val next = Array.tabulate(n)(_ + 1)
    val prev = Array.tabulate(n)(_ - 1)
    val alive = Array.fill(n)(true)
    val heap = new java.util.PriorityQueue[java.lang.Long]()
    @inline def pairRank(i: Int): Int = {
      val j = next(i)
      if (j >= n) 0
      else ranks.getOrElse(
        (chars(i).toLong << 16) | chars(j).toLong, 0)
    }
    @inline def push(i: Int): Unit =
      if (i >= 0 && i < n) {
        val r = pairRank(i)
        if (r > 0) heap.add((r.toLong << 32) | i.toLong)
      }
    var i = 0
    while (i < n - 1) { push(i); i += 1 }
    while (!heap.isEmpty) {
      val e = heap.poll().longValue()
      val r = (e >>> 32).toInt
      val p = (e & 0xffffffffL).toInt
      // stale-entry guard: the position must be live and still carry
      // EXACTLY this rank (a changed pair re-enqueued its own entry)
      if (alive(p) && pairRank(p) == r) {
        val j = next(p)
        chars(p) = (0xE000 + r).toChar
        alive(j) = false
        val k = next(j)
        next(p) = k
        if (k < n) prev(k) = p
        push(prev(p))
        push(p)
      }
    }
    val sb = new java.lang.StringBuilder(n)
    var c = 0
    while (c < n) { if (alive(c)) sb.append(chars(c)); c += 1 }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `binary → binary`: inflate one gzip stream (RFC 1952), NULL on
  * malformed input (the corrupt-blob contract of the media decoders —
  * a damaged fetch surfaces as NULL, the downstream gate owns the
  * drop). The expression form keeps compressed-payload decode inside
  * the scan projection (sitemap `.xml.gz` fetches, compressed text
  * blobs) instead of forcing a typed-Dataset detour. */
/** The deterministic Viterbi segmenter shared by the unigram-LM
  * trainer's E-step ([[graft.operators.TextAnalysis.unigramTrain]])
  * and the [[UnigramEncode]] expression — ONE implementation so the
  * two can never drift. Objective: over all segmentations of `w`
  * into vocabulary pieces of length ≤ maxPieceLen (single chars
  * outside the vocabulary are admitted at `unkRank` so every word
  * segments), minimize (piece count, Σ rank), ties broken to the
  * LEXICOGRAPHICALLY LARGEST piece-length sequence (longest first
  * piece, then longest second, …) — the rank analog of unigram-LM
  * likelihood on the pure-integer grid the DuckDB oracle replays by
  * full composition enumeration with `ORDER BY k, rsum, parts DESC`.
  * O(|w|·maxPieceLen) per word. */
private[graft] object UnigramSeg {
  def viterbi(w: String, ranks: Map[String, Int], unkRank: Int,
      maxPieceLen: Int): Seq[String] = {
    val n = w.length
    if (n == 0) return Seq.empty
    val optK = new Array[Int](n + 1)
    val optR = new Array[Long](n + 1)
    val choice = new Array[Int](n + 1)
    var i = n - 1
    while (i >= 0) {
      var bk = Int.MaxValue
      var br = Long.MaxValue
      var bj = 0
      var j = 1
      val jm = math.min(maxPieceLen, n - i)
      while (j <= jm) {
        val r = ranks.get(w.substring(i, i + j)) match {
          case Some(x) => x
          case None => if (j == 1) unkRank else -1
        }
        if (r > 0) {
          val ck = 1 + optK(i + j)
          val cr = r + optR(i + j)
          // min (k, rsum); exact tie -> larger j (suffix opt values
          // are themselves tie-broken this way, so the walk yields
          // the parts-lexicographically-largest optimum)
          if (ck < bk || (ck == bk && (cr < br || (cr == br && j > bj)))) {
            bk = ck; br = cr; bj = j
          }
        }
        j += 1
      }
      optK(i) = bk; optR(i) = br; choice(i) = bj
      i -= 1
    }
    val out = Seq.newBuilder[String]
    var p = 0
    while (p < n) {
      val j = choice(p)
      out += w.substring(p, p + j)
      p += j
    }
    out.result()
  }
}

/** Viterbi unigram-LM segmentation of ONE WORD into vocabulary pieces
  * ([[UnigramSeg]] semantics) — the SentencePiece-style apply path as
  * a single expression pass: the trained (piece → rank) table rides
  * the expression (broadcast with the plan), unknown single chars
  * segment at rank |vocab|+1 so any input word encodes. Returns the
  * piece array. */
case class UnigramEncode(child: Expression, vocab: Seq[(String, Int)],
    maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {
  require(maxPieceLen >= 1, "maxPieceLen >= 1")
  require(vocab.map(_._1).distinct.size == vocab.size,
    "duplicate piece in vocabulary")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  @transient private lazy val ranks: Map[String, Int] = vocab.toMap
  @transient private lazy val unkRank: Int = vocab.size + 1

  override def nullSafeEval(input: Any): Any = {
    val pieces = UnigramSeg.viterbi(input.asInstanceOf[UTF8String].toString,
      ranks, unkRank, maxPieceLen)
    new GenericArrayData(
      pieces.map(p => UTF8String.fromString(p): Any).toArray)
  }

  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

case class GunzipBytes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gunzip"

  override def nullSafeEval(input: Any): Any =
    graft.operators.Multimodal
      .gzipDecompress(input.asInstanceOf[Array[Byte]]).orNull

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object TextExpressions {
  def gunzip(c: Column): Column =
    Bridge.column(GunzipBytes(Bridge.expression(c)))
  def wordShingles(c: Column, n: Int = 3): Column =
    Bridge.column(WordShingles(Bridge.expression(c), n))
  def bpeEncode(c: Column, merges: Seq[(Int, String)]): Column =
    Bridge.column(BpeEncode(Bridge.expression(c), merges))
  def unigramEncode(c: Column, vocab: Seq[(String, Int)],
      maxPieceLen: Int = 4): Column =
    Bridge.column(UnigramEncode(Bridge.expression(c), vocab, maxPieceLen))
  def sortedIntersectSize(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectSize(Bridge.expression(a),
      Bridge.expression(b)))
  def minhashSig(c: Column, k: Int = 16): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), k))
  def minhashSigMd5(c: Column, k: Int = 16): Column =
    Bridge.column(MinHashSigMd5(Bridge.expression(c), k))
  def textHashEmbed(c: Column, dim: Int = 64): Column =
    Bridge.column(TextHashEmbed(Bridge.expression(c), dim))
  def md5FeatureEmbed(c: Column, dim: Int = 64): Column =
    Bridge.column(Md5FeatureHashEmbed(Bridge.expression(c), dim))
  def simhash64(c: Column, algo: String = "xx"): Column =
    Bridge.column(SimHash64(Bridge.expression(c), algo))
  def nfcNormalize(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
  def stripAccents(c: Column): Column =
    Bridge.column(StripAccents(Bridge.expression(c)))
  def deflateRatio(c: Column): Column =
    Bridge.column(DeflateRatio(Bridge.expression(c)))
}

/** Unicode normalization kernels (JDK `java.text.Normalizer` — the
  * engine's cross-engine rule: pick primitives every engine agrees on;
  * DuckDB's `nfc_normalize`/`strip_accents` replay these exactly for
  * the Latin repertoire, which is how the oracle checks them).
  *
  * The ASCII FAST PATH is the scale story: real web corpora are
  * overwhelmingly ASCII, `numBytes == numChars` detects it from the
  * UTF-8 lead bytes without decoding, and the kernel then returns the
  * INPUT buffer — zero allocation, zero normalizer calls on the hot
  * 99%. A top-level object, so Scala emits static forwarders the
  * generated Java can call directly. */
object UnicodeNorm {
  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")

  @inline def isAscii(s: UTF8String): Boolean =
    s.numBytes() == s.numChars()

  /** Canonical composition (NFC): decomposed sequences (`e` +
    * combining acute) collapse to their precomposed forms — the
    * standard first cleaning step before any byte-level dedup, which
    * would otherwise see visually identical texts as distinct. */
  def nfc(s: UTF8String): UTF8String =
    if (isAscii(s)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** Diacritic strip: NFD-decompose, drop combining marks. Base
    * letters that do not decompose (ß, Ł) survive unchanged —
    * matching DuckDB's `strip_accents`. */
  def stripAccents(s: UTF8String): UTF8String =
    if (isAscii(s)) s
    else UTF8String.fromString(Marks.matcher(
      java.text.Normalizer.normalize(s.toString,
        java.text.Normalizer.Form.NFD)).replaceAll(""))
}

/** `string → double`: deflate compression ratio
  * (compressed bytes / raw UTF-8 bytes) — the third classic junk
  * signal beside Gopher's repetition fractions (RefinedWeb/CCNet
  * pipelines drop pages compressing suspiciously well: templated spam
  * and boilerplate deflate far below natural prose, random noise
  * barely at all). Empty strings score 1.0.
  *
  * NO SQL oracle exists for this one (DuckDB has no deflate scalar) —
  * spec-checked against direct `java.util.zip` reference calls
  * instead. The Deflater is thread-local and reset per row (native
  * allocation once per executor thread, not per row); level 6 is the
  * zlib default every corpus-prep pipeline quotes ratios at. */
case class DeflateRatio(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"
  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].getBytes
    if (raw.isEmpty) 1.0
    else DeflateRatio.ratio(raw)
  }
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

object DeflateRatio {
  private val local =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue() =
        new java.util.zip.Deflater(6, /* nowrap = */ true)
    }
  def ratio(raw: Array[Byte]): Double = {
    val d = local.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](math.max(64, raw.length / 2))
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    n.toDouble / raw.length
  }
}

/** `string → string`: NFC canonical composition, codegen'd (a direct
  * static call inside whole-stage codegen — no fallback row path). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfc($c)")
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

/** `string → string`: NFD + combining-mark strip, codegen'd. */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"
  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeNorm.stripAccents($c)")
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

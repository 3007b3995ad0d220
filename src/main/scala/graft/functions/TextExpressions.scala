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

object TextExpressions {
  def wordShingles(c: Column, n: Int = 3): Column =
    Bridge.column(WordShingles(Bridge.expression(c), n))
  def sortedIntersectSize(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectSize(Bridge.expression(a),
      Bridge.expression(b)))
  def minhashSig(c: Column, k: Int = 16): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), k))
  def textHashEmbed(c: Column, dim: Int = 64): Column =
    Bridge.column(TextHashEmbed(Bridge.expression(c), dim))
}

package graft.functions

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sign (random-hyperplane) LSH for vectors — Charikar's SimHash
  * for cosine similarity, with RADEMACHER (±1) hyperplanes derived from
  * MD5 bits, so the hash is a pure deterministic function of the vector
  * and reproducible in ANY engine with `md5()`:
  *
  *   sign(t, b, d) = ±1 from bit 0 of md5("t b d")
  *   y_d           = floor(x_d · 2^20)     (exact integer quantization)
  *   bit(t, b)     = [ Σ_d sign(t,b,d) · y_d > 0 ]
  *   code(t)       = Σ_b bit(t,b) · 2^b   (one bucket code per table)
  *
  * Everything after quantization is integer arithmetic — exact,
  * order-independent, so the engine-side codes and a SQL oracle's codes
  * are bit-identical and the whole ANN candidate path (bucket equi-join,
  * refine) is hash-checkable at REALISTIC parameters, unlike MLlib's
  * JVM-internal random projections which only degenerate cases can
  * check. Near pair at angle θ: per-bit agreement 1-θ/π, per-table
  * collision (1-θ/π)^bits, recall 1-(1-(1-θ/π)^bits)^tables.
  *
  * One Expression pass per row (the nested-HOF inlining trap forbids a
  * column-function composition); the ±1 plane matrix is md5-derived
  * once per (tables, bits, dim) per JVM and cached.
  */
case class SignLshCodes(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression with CodegenFallback {
  require(tables >= 1 && bits >= 1 && bits <= 32)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_lsh_codes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val y = new Array[Long](dim)
    var d = 0
    while (d < dim) {
      val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      y(d) = math.floor(x * SignLshCodes.Scale).toLong
      d += 1
    }
    val signs = SignLshCodes.signMatrix(tables, bits, dim)
    val codes = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var code = 0L
      var b = 0
      while (b < bits) {
        val row = signs(t * bits + b)
        var acc = 0L
        d = 0
        while (d < dim) { acc += row(d) * y(d); d += 1 }
        if (acc > 0) code |= (1L << b)
        b += 1
      }
      codes(t) = code
      t += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object SignLshCodes {
  /** 2^20: floats in the embedding range quantize exactly (double × a
    * power of two only shifts the exponent), sums of ≤ millions of
    * dims stay far inside Long. */
  val Scale: Double = 1048576.0

  private val cache =
    new ConcurrentHashMap[(Int, Int, Int), Array[Array[Byte]]]()

  /** ±1 plane matrix, row (t*bits + b), md5-derived: bit 0 of the
    * 64-bit value of md5("t b d") — the value a SQL engine recovers
    * from hex char 16. */
  def signMatrix(tables: Int, bits: Int, dim: Int): Array[Array[Byte]] =
    cache.computeIfAbsent((tables, bits, dim), { _ =>
      Array.tabulate(tables * bits) { tb =>
        val t = tb / bits
        val b = tb % bits
        Array.tabulate(dim) { d =>
          val h = Md5Hash.hash64(UTF8String.fromString(s"$t $b $d"))
          if ((h & 1L) == 1L) 1.toByte else (-1).toByte
        }
      }
    })
}

/** Native bucketed random-projection LSH for EUCLIDEAN locality — the
  * deterministic, engine-owned analog of MLlib's
  * `BucketedRandomProjectionLSH` (Datar et al. p-stable LSH), with
  * RADEMACHER (±1) projections derived from MD5 bits so the bucket id
  * is a pure function of the vector, reproducible in any engine with
  * `md5()` (where MLlib's Gaussian projections are JVM-internal and
  * uncheckable outside degenerate parameters):
  *
  *   sign(t, d)  = ±1 from bit 0 of md5("brp t d")
  *   y_d         = floor(x_d · 2^20)          (exact integer quantization)
  *   acc(t)      = Σ_d sign(t,d) · y_d        (exact integer)
  *   bucket(t)   = floorDiv(acc(t), L)        (L = floor(bucketLength·2^20))
  *
  * Everything after quantization is integer arithmetic — order-free and
  * bit-identical between the engine and a SQL oracle. Near points in L2
  * project near each other, so they share (or neighbor) buckets; recall
  * is OR-across-tables exactly as in MLlib's model.
  */
case class BrpLshBuckets(child: Expression, tables: Int, bucketLenInt: Long)
    extends UnaryExpression with CodegenFallback {
  require(tables >= 1 && bucketLenInt >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "brp_lsh_buckets"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val y = new Array[Long](dim)
    var d = 0
    while (d < dim) {
      val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      y(d) = math.floor(x * SignLshCodes.Scale).toLong
      d += 1
    }
    val signs = BrpLshBuckets.signMatrix(tables, dim)
    val buckets = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      val row = signs(t)
      var acc = 0L
      d = 0
      while (d < dim) { acc += row(d) * y(d); d += 1 }
      buckets(t) = Math.floorDiv(acc, bucketLenInt)
      t += 1
    }
    new GenericArrayData(buckets)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object BrpLshBuckets {
  private val cache = new ConcurrentHashMap[(Int, Int), Array[Array[Byte]]]()

  /** ±1 projection matrix, one row per table, md5-derived with the
    * "brp" salt so it never collides with [[SignLshCodes.signMatrix]]
    * planes: bit 0 of the 64-bit value of md5("brp t d"). */
  def signMatrix(tables: Int, dim: Int): Array[Array[Byte]] =
    cache.computeIfAbsent((tables, dim), { _ =>
      Array.tabulate(tables) { t =>
        Array.tabulate(dim) { d =>
          val h = Md5Hash.hash64(UTF8String.fromString(s"brp $t $d"))
          if ((h & 1L) == 1L) 1.toByte else (-1).toByte
        }
      }
    })
}

object SignLshFunctions {
  def signLshCodes(c: Column, tables: Int = 8, bits: Int = 4): Column =
    Bridge.column(SignLshCodes(Bridge.expression(c), tables, bits))

  /** `bucketLength` is in vector units; quantized to the same 2^20 grid
    * as the coordinates so the floor-division replays exactly in SQL. */
  def brpLshBuckets(c: Column, tables: Int, bucketLength: Double): Column =
    Bridge.column(BrpLshBuckets(Bridge.expression(c), tables,
      math.floor(bucketLength * SignLshCodes.Scale).toLong))
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Centroid aggregation over `array<float>` vectors — the UDAF surface
  * (SURVEY.md §2.2 row "UDF/UDAF"). Used for IVF cell refresh and
  * embedding averaging. Typed Aggregator with a primitive double[]
  * buffer: partial aggregation (reduce) runs map-side, merge combines
  * partials — the same partial/final split Spark's built-in aggs get.
  */
object VectorCentroid extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    if (v == null) return b
    val acc = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    val n = math.min(acc.length, v.length)
    while (i < n) { acc(i) += v(i); i += 1 }
    (acc, b._2 + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._1.isEmpty) return y
    if (y._1.isEmpty) return x
    val acc = x._1
    var i = 0
    while (i < acc.length) { acc(i) += y._1(i); i += 1 }
    (acc, x._2 + y._2)
  }

  override def finish(b: (Array[Double], Long)): Seq[Double] =
    if (b._2 == 0L) Seq.empty else b._1.map(_ / b._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  /** Column-level handle: `centroid(col("embedding"))`. */
  lazy val asUdaf = udaf(this,
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
  def centroid(c: Column): Column = asUdaf(c)
}

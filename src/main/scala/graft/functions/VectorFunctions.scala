package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Distance metrics between two `array<float|double>` vectors.
  *
  * The reference delegates distance to the managed Databricks Vector Search
  * service (reference src/databricks/query_endpoint.py:126-146 — HNSW with
  * L2/cosine per public docs); Spark 4.1 has no builtin array-distance
  * function, so this is the one hot-path kernel we own. Implemented as a
  * native Catalyst Expression with whole-stage codegen (not a Scala UDF):
  * no serialization boundary, stays inside WholeStageCodegen spans, which
  * is what makes a 100 TB brute-force scan-and-score viable.
  *
  * Accumulation is a sequential fold over the array index in Double, which
  * matches DuckDB's `list_cosine_similarity`/`list_distance` evaluation
  * order so oracle rankings agree (SURVEY.md §7.4).
  */
sealed trait Metric { def name: String }
object Metric {
  case object Cosine extends Metric { val name = "cosine" }
  case object Dot    extends Metric { val name = "dot" }
  case object L2     extends Metric { val name = "l2" }
  def of(s: String): Metric = s.toLowerCase match {
    case "cosine" => Cosine
    case "dot" | "inner" | "ip" => Dot
    case "l2" | "euclidean" => L2
    case other => throw new IllegalArgumentException(s"unknown metric $other")
  }
}

case class VectorDistance(left: Expression, right: Expression, metric: Metric)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = s"vector_${metric.name}"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"$prettyName expects array<float|double>, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two array<float|double> arguments")
    }
  }

  @transient private lazy val af = elemIsFloat(left)
  @transient private lazy val bf = elemIsFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // Dimension mismatch is malformed input: error loudly (matches the
    // DuckDB oracle's list_cosine_similarity/list_distance semantics)
    // instead of silently truncating to a plausible-but-wrong score.
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch ${a.numElements()} vs ${b.numElements()}")
    val n = a.numElements()
    var i = 0
    metric match {
      case Metric.Dot =>
        var dot = 0.0
        while (i < n) {
          val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
          val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
          dot += x * y; i += 1
        }
        dot
      case Metric.Cosine =>
        var dot = 0.0; var na = 0.0; var nb = 0.0
        while (i < n) {
          val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
          val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        // Zero-norm guard: 0/0 = NaN, and Spark sorts NaN ABOVE every
        // double, so a zero embedding would rank #1 in every score-DESC
        // top-k. Define cosine(0, ·) = 0 (no similarity) instead.
        if (na == 0.0 || nb == 0.0) 0.0
        else dot / (math.sqrt(na) * math.sqrt(nb))
      case Metric.L2 =>
        var s = 0.0
        while (i < n) {
          val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
          val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
          val d = x - y; s += d * d; i += 1
        }
        math.sqrt(s)
    }
  }

  // All locals use ctx.freshName: several VectorDistance instances can be
  // fused into ONE generated class by whole-stage codegen, and fixed names
  // would collide (janino "redefinition of local variable") — which
  // silently degrades the whole plan to interpreted mode.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val getA = if (af) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (bf) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      val body = metric match {
        case Metric.Dot =>
          val dot = ctx.freshName("dot")
          s"""double $dot = 0.0;
             |for (int $i = 0; $i < $n; $i++) { $dot += ($getA) * ($getB); }
             |${ev.value} = $dot;""".stripMargin
        case Metric.Cosine =>
          val (dot, na, nb) = (ctx.freshName("dot"), ctx.freshName("na"),
            ctx.freshName("nb"))
          val (x, y) = (ctx.freshName("x"), ctx.freshName("y"))
          s"""double $dot = 0.0, $na = 0.0, $nb = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $x = $getA; double $y = $getB;
             |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
             |}
             |${ev.value} = ($na == 0.0 || $nb == 0.0)
             |  ? 0.0 : $dot / (Math.sqrt($na) * Math.sqrt($nb));""".stripMargin
        case Metric.L2 =>
          val s = ctx.freshName("s")
          val d = ctx.freshName("d")
          s"""double $s = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $d = ($getA) - ($getB); $s += $d * $d;
             |}
             |${ev.value} = Math.sqrt($s);""".stripMargin
      }
      s"""if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: dimension mismatch " + $a.numElements() + " vs " +
         |    $b.numElements());
         |}
         |int $n = $a.numElements();
         |$body""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level API. */
object VectorFunctions {
  def cosine(a: Column, b: Column): Column =
    Bridge.column(VectorDistance(Bridge.expression(a), Bridge.expression(b),
      Metric.Cosine))
  def dot(a: Column, b: Column): Column =
    Bridge.column(VectorDistance(Bridge.expression(a), Bridge.expression(b),
      Metric.Dot))
  def l2(a: Column, b: Column): Column =
    Bridge.column(VectorDistance(Bridge.expression(a), Bridge.expression(b),
      Metric.L2))
  def distance(a: Column, b: Column, metric: Metric): Column =
    Bridge.column(VectorDistance(Bridge.expression(a), Bridge.expression(b),
      metric))

  /** L2 norm of one vector (used to normalize once at index build so cosine
    * degrades to dot at query time — SURVEY.md §4.4). */
  def norm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(dot(a, a))
  }

  /** Normalize to unit length; null-safe, zero vectors stay zero. */
  def normalize(a: Column): Column = {
    import org.apache.spark.sql.functions._
    val nrm = norm(a)
    when(nrm === 0.0 || a.isNull, a)
      .otherwise(transform(a, x => (x / nrm).cast("float")))
  }
}

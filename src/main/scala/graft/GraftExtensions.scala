package graft

import graft.functions.{Metric, VectorDistance}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration: exposes the engine's native expressions to
  * `spark.sql(...)` users via SparkSessionExtensions —
  * `vector_cosine(a, b)`, `vector_dot(a, b)`, `vector_l2(a, b)`.
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`. Also installable on a
  * live session via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[VectorDistance].getName, name),
        builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
  }
}

object GraftExtensions {
  private def two(name: String, args: Seq[Expression]): (Expression, Expression) =
    args match {
      case Seq(a, b) => (a, b)
      case _ => throw new IllegalArgumentException(
        s"$name expects exactly 2 arguments, got ${args.length}")
    }

  /** `f(text)` or `f(text, <int literal>)` — anything else is an error
    * (silently dropping extra args would run with the wrong parameter). */
  private def textAndOptInt(name: String, args: Seq[Expression],
      default: Int): (Expression, Int) = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    args match {
      case Seq(t) => (t, default)
      case Seq(t, Literal(v: Int, org.apache.spark.sql.types.IntegerType)) =>
        (t, v)
      case Seq(_, other) => throw new IllegalArgumentException(
        s"$name: second argument must be an integer literal, got $other")
      case _ => throw new IllegalArgumentException(
        s"$name expects 1 or 2 arguments, got ${args.length}")
    }
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vector_cosine" -> { args: Seq[Expression] =>
      val (a, b) = two("vector_cosine", args); VectorDistance(a, b, Metric.Cosine) },
    "vector_dot" -> { args: Seq[Expression] =>
      val (a, b) = two("vector_dot", args); VectorDistance(a, b, Metric.Dot) },
    "vector_l2" -> { args: Seq[Expression] =>
      val (a, b) = two("vector_l2", args); VectorDistance(a, b, Metric.L2) },
    "word_shingles" -> { args: Seq[Expression] =>
      val (t, n) = textAndOptInt("word_shingles", args, default = 3)
      graft.functions.WordShingles(t, n) },
    "minhash_sig" -> { args: Seq[Expression] =>
      val (t, k) = textAndOptInt("minhash_sig", args, default = 16)
      graft.functions.MinHashSig(t, k) },
    "text_hash_embed" -> { args: Seq[Expression] =>
      val (t, d) = textAndOptInt("text_hash_embed", args, default = 64)
      graft.functions.TextHashEmbed(t, d) },
    "sorted_intersect_size" -> { args: Seq[Expression] =>
      val (a, b) = two("sorted_intersect_size", args)
      graft.functions.SortedIntersectSize(a, b) },
    "simhash64" -> { args: Seq[Expression] =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      args match {
        case Seq(t) => graft.functions.SimHash64(t, "xx")
        case Seq(t, Literal(a: org.apache.spark.unsafe.types.UTF8String,
            org.apache.spark.sql.types.StringType)) =>
          graft.functions.SimHash64(t, a.toString)
        case Seq(_, other) => throw new IllegalArgumentException(
          s"simhash64: second argument must be a string literal ('xx'|'md5'), got $other")
        case _ => throw new IllegalArgumentException(
          s"simhash64 expects 1 or 2 arguments, got ${args.length}")
      } },
    "minhash_sig_md5" -> { args: Seq[Expression] =>
      val (t, k) = textAndOptInt("minhash_sig_md5", args, default = 16)
      graft.functions.MinHashSigMd5(t, k) },
    "md5_feature_embed" -> { args: Seq[Expression] =>
      val (t, d) = textAndOptInt("md5_feature_embed", args, default = 64)
      graft.functions.Md5FeatureHashEmbed(t, d) },
    "sign_lsh_codes" -> { args: Seq[Expression] =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.IntegerType
      args match {
        case Seq(v) => graft.functions.SignLshCodes(v, 8, 4)
        case Seq(v, Literal(t: Int, IntegerType)) =>
          graft.functions.SignLshCodes(v, t, 4)
        case Seq(v, Literal(t: Int, IntegerType),
            Literal(b: Int, IntegerType)) =>
          graft.functions.SignLshCodes(v, t, b)
        case _ => throw new IllegalArgumentException(
          "sign_lsh_codes expects (vector[, tables-literal[, bits-literal]])," +
            s" got ${args.length} args")
      } },
    "sq8_dot" -> { args: Seq[Expression] =>
      val (a, b) = two("sq8_dot", args)
      graft.search.Sq8Dot(a, b) },
    "nfc_normalize" -> { args: Seq[Expression] =>
      require(args.length == 1,
        s"nfc_normalize expects 1 argument, got ${args.length}")
      graft.functions.NfcNormalize(args.head) },
    "strip_accents" -> { args: Seq[Expression] =>
      require(args.length == 1,
        s"strip_accents expects 1 argument, got ${args.length}")
      graft.functions.StripAccents(args.head) },
    "deflate_ratio" -> { args: Seq[Expression] =>
      require(args.length == 1,
        s"deflate_ratio expects 1 argument, got ${args.length}")
      graft.functions.DeflateRatio(args.head) },
  )

  /** Register on an already-built session (temp functions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

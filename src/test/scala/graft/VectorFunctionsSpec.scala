package graft

import graft.functions.{Metric, VectorFunctions => VF}
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def eval(metric: Metric, a: Seq[Float], b: Seq[Float]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(VF.distance(col("a"), col("b"), metric).as("d"))
      .head().getDouble(0)

  test("dot product matches hand-computed value") {
    assert(eval(Metric.Dot, Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)) === 32.0)
  }

  test("cosine of identical vectors is 1") {
    assert(math.abs(eval(Metric.Cosine, Seq(1f, 2f, 2f), Seq(1f, 2f, 2f)) - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    assert(eval(Metric.Cosine, Seq(1f, 0f), Seq(0f, 1f)) === 0.0)
  }

  test("l2 matches hand-computed value") {
    assert(eval(Metric.L2, Seq(0f, 3f), Seq(4f, 0f)) === 5.0)
  }

  test("null input yields null, not a crash") {
    val df = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
      .select(VF.cosine(col("a"), col("b")).as("d"))
    assert(df.head().isNullAt(0))
  }

  test("interpreted eval matches codegen eval") {
    val vecs = Seq((Seq(0.3f, -1.2f, 9.9f), Seq(2.2f, 0.0f, -4.5f)))
    val df = vecs.toDF("a", "b")
    val withCodegen = df.select(VF.cosine(col("a"), col("b"))).head().getDouble(0)
    // nullSafeEval path (interpreted) on resolved Literal children
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val expr = graft.functions.VectorDistance(
      Literal.create(Array(0.3f, -1.2f, 9.9f)),
      Literal.create(Array(2.2f, 0.0f, -4.5f)), Metric.Cosine)
    val interp = expr.nullSafeEval(
      ArrayData.toArrayData(Array(0.3f, -1.2f, 9.9f)),
      ArrayData.toArrayData(Array(2.2f, 0.0f, -4.5f))).asInstanceOf[Double]
    assert(math.abs(withCodegen - interp) < 1e-15)
  }

  test("SQL surface: vector_cosine/dot/l2 registered via extensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT vector_cosine(array(1.0F,0.0F), array(1.0F,0.0F)) c, " +
      "vector_dot(array(1.0F,2.0F), array(3.0F,4.0F)) d, " +
      "vector_l2(array(0.0F,3.0F), array(4.0F,0.0F)) l").head()
    assert(r.getDouble(0) === 1.0 && r.getDouble(1) === 11.0 && r.getDouble(2) === 5.0)
  }

  test("SQL surface: text expressions registered via extensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT size(word_shingles('a b c d')) ns, " +
      "size(minhash_sig(word_shingles('a b c d'))) k, " +
      "size(text_hash_embed('hello world')) dim, " +
      "sorted_intersect_size(array('a','b','c'), array('b','c','d')) i")
      .head()
    assert(r.getInt(0) === 2 && r.getInt(1) === 16 &&
      r.getInt(2) === 64 && r.getInt(3) === 2)
  }

  test("normalize produces unit vectors; zero vector unchanged") {
    val df = Seq(Seq(3f, 4f), Seq(0f, 0f)).toDF("v")
      .select(VF.norm(VF.normalize(col("v"))).as("n"))
    val ns = df.collect().map(_.getDouble(0))
    assert(math.abs(ns(0) - 1.0) < 1e-6)
    assert(ns(1) === 0.0)
  }

  test("cosine with a zero-norm vector is 0, never NaN (codegen + interp)") {
    // NaN would sort ABOVE every double and rank #1 in score-DESC top-k
    val codegen = eval(Metric.Cosine, Seq(0f, 0f, 0f), Seq(1f, 2f, 3f))
    assert(codegen === 0.0 && !codegen.isNaN)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val expr = graft.functions.VectorDistance(
      Literal.create(Array(0f, 0f)), Literal.create(Array(1f, 2f)),
      Metric.Cosine)
    val interp = expr.nullSafeEval(
      ArrayData.toArrayData(Array(0f, 0f)),
      ArrayData.toArrayData(Array(1f, 2f))).asInstanceOf[Double]
    assert(interp === 0.0 && !interp.isNaN)
  }

  test("dimension mismatch throws, matching oracle error semantics") {
    val ex = intercept[Exception] {
      Seq((Seq(1f, 2f, 3f), Seq(1f, 2f))).toDF("a", "b")
        .select(VF.cosine(col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("dimension mismatch")))
  }

  test("SQL surface: optional int-literal parameter and arity errors") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT size(word_shingles('a b c d', 2)) ns, " +
      "size(minhash_sig(word_shingles('a b c'), 8)) k, " +
      "size(text_hash_embed('hello', 32)) dim").head()
    assert(r.getInt(0) === 3 && r.getInt(1) === 8 && r.getInt(2) === 32)
    val ex = intercept[Exception] {
      spark.sql("SELECT word_shingles('a b', 2, 99)").collect()
    }
    assert(ex.getMessage.contains("1 or 2 arguments"))
  }

  test("property: d(x,x)=0 for l2; cosine within [-1,1]; symmetry") {
    val rnd = new scala.util.Random(42)
    def vec(): Seq[Float] = Seq.fill(8)(rnd.nextFloat() * 20f - 10f)
    // evaluate all cases in one Spark job instead of one per sample
    val cases = Seq.fill(25)((vec(), vec()))
    val rows = cases.toDF("a", "b").select(
      VF.l2(col("a"), col("a")).as("l2xx"),
      VF.cosine(col("a"), col("b")).as("cos"),
      VF.dot(col("a"), col("b")).as("dxy"),
      VF.dot(col("b"), col("a")).as("dyx")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === 0.0)
      assert(r.getDouble(1) >= -1.0 - 1e-9 && r.getDouble(1) <= 1.0 + 1e-9)
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-9)
    }
  }
}

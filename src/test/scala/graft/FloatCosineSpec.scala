package graft

import graft.functions.VectorFunctions.floatCosine
import org.apache.spark.sql.functions._

/** Unit tests for the custom Catalyst FloatCosine expression — interpreted
  * and codegen paths, null/edge semantics, and agreement with a composed
  * built-in formulation. */
class FloatCosineSpec extends SparkSpec {
  import spark.implicits._

  private def cosOf(a: Seq[Float], b: Seq[Float]): Option[Double] = {
    val df = Seq((a, b)).toDF("a", "b")
      .select(floatCosine(col("a"), col("b")).as("c"))
    val r = df.head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("identical vectors -> 1.0") {
    val c = cosOf(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)).get
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("orthogonal vectors -> 0.0") {
    assert(cosOf(Seq(1f, 0f), Seq(0f, 1f)).contains(0.0))
  }

  test("opposite vectors -> -1.0") {
    val c = cosOf(Seq(1f, 2f), Seq(-1f, -2f)).get
    assert(math.abs(c + 1.0) < 1e-12)
  }

  test("zero-norm input -> null") {
    assert(cosOf(Seq(0f, 0f), Seq(1f, 2f)).isEmpty)
  }

  test("length mismatch -> null") {
    assert(cosOf(Seq(1f, 2f, 3f), Seq(1f, 2f)).isEmpty)
  }

  test("null input -> null") {
    val df = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]])).toDF("a", "b")
      .select(floatCosine(col("a"), col("b")).as("c"))
    assert(df.head().isNullAt(0))
  }

  test("codegen path agrees with composed built-ins on real embeddings") {
    val emb = Tables.embeddings(spark, Sf).limit(50).cache()
    val a = emb.as("a"); val b = emb.as("b")
    val builtin = expr(
      """aggregate(zip_with(a.embedding, b.embedding, (x, y) -> double(x * y)),
                   0D, (acc, v) -> acc + v)
         / (sqrt(aggregate(zip_with(a.embedding, a.embedding, (x, y) -> double(x * y)),
                           0D, (acc, v) -> acc + v))
            * sqrt(aggregate(zip_with(b.embedding, b.embedding, (x, y) -> double(x * y)),
                             0D, (acc, v) -> acc + v)))""")
    val diff = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .select((floatCosine(col("a.embedding"), col("b.embedding")) - builtin).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff < 1e-12, s"codegen vs built-in max diff $diff")
    emb.unpersist()
  }

  test("LongSqDist/LongDot equal the interpreted formulations exactly") {
    import graft.functions.VectorFunctions.{longDot, longSqDist}
    // Adversarial longs for the quantized-embedding domain (|v| <= 1e6).
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      def arr = Seq.fill(64)((rnd.nextInt(2000001) - 1000000).toLong)
      (i.toLong, arr, arr)
    }
    val df = rows.toDF("id", "a", "b").cache()
    val bad = df.select(
        (longSqDist(col("a"), col("b")) =!= expr(
          "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)")).as("d1"),
        (longDot(col("a"), col("b")) =!= expr(
          "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")).as("d2"),
        (longDot(col("a"), col("a")) =!= expr(
          "aggregate(a, 0L, (acc, x) -> acc + x * x)")).as("d3"))
      .filter(col("d1") || col("d2") || col("d3")).count()
    assert(bad == 0, s"$bad rows diverged from the interpreted kernels")
    df.unpersist()
  }

  test("LongSqDist/LongDot null semantics: mismatch and null -> null") {
    import graft.functions.VectorFunctions.{longDot, longSqDist}
    val df = Seq((Seq(1L, 2L, 3L), Seq(1L, 2L))).toDF("a", "b")
    assert(df.select(longSqDist(col("a"), col("b"))).head().isNullAt(0))
    assert(df.select(longDot(col("a"), col("b"))).head().isNullAt(0))
    val nn = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(nn.select(longSqDist(col("a"), col("b"))).head().isNullAt(0))
  }

  test("FloatQuantize equals the transform lambda exactly — live corpus + crafted") {
    import graft.functions.VectorFunctions.floatQuantize
    val lambda = expr(
      "transform(v, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0D + 0.5D) AS BIGINT))")
    // Live embeddings (the exact frame scaledOf feeds the ANN family)...
    val live = Tables.embeddings(spark, Sf)
      .select(col("embedding").as("v"))
    // ...plus crafted rows: negatives (floor vs truncation differs),
    // exact .5 boundaries in the scaled domain, zeros, and an empty array.
    val crafted = Seq(
      Seq(-1.5f, -0.0000005f, 0.0000005f, 0f, 1.0000004f),
      Seq(0.9999995f, -0.9999995f, 123.456f, -123.456f),
      Seq.empty[Float]).toDF("v")
    Seq(live, crafted).foreach { df =>
      val bad = df
        .filter(!(floatQuantize(col("v"), 1000000.0) <=> lambda)).count()
      assert(bad == 0, s"$bad rows diverged from the transform lambda")
    }
    // Null in -> null out.
    val nn = Seq(Option.empty[Seq[Float]]).toDF("v")
    assert(nn.select(floatQuantize(col("v"), 1000000.0)).head().isNullAt(0))
  }

  test("FloatQuantize rejects non-array<float> input at analysis time") {
    import graft.functions.VectorFunctions.floatQuantize
    // array<double>: getFloat would silently misread half of each element —
    // must fail in the analyzer, not return garbage.
    val dbl = Seq(Seq(1.0, 2.0)).toDF("v")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      dbl.select(floatQuantize(col("v"), 10.0)).head()
    }
    assert(e1.getMessage.contains("float_quantize"))
    // Scalar input rejected the same way.
    val str = Seq("x").toDF("v")
    intercept[org.apache.spark.sql.AnalysisException] {
      str.select(floatQuantize(col("v"), 10.0)).head()
    }
  }
}

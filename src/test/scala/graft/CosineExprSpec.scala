package graft

import graft.functions.CosineSimilarity
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The native codegen'd cosine expression must be bit-identical to the
  * ScalaUDF kernel it replaced (same fold order, same null semantics) —
  * in BOTH the whole-stage-codegen and interpreted evaluation paths. */
class CosineExprSpec extends GraftSpec {
  import spark.implicits._

  // the retired UDF kernel, kept here as the semantic reference
  private val udfKernel = udf { (a: Seq[Double], b: Seq[Double]) =>
    if (a == null || b == null || a.length != b.length) Option.empty[Double]
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        val x = a(i); val y = b(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      Some(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
  }

  private def vecs(seed: Int): Seq[(Array[Double], Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(64)((Array.fill(16)(rnd.nextGaussian()), Array.fill(16)(rnd.nextGaussian())))
  }

  test("bit-identical to the UDF kernel on random vectors (codegen path)") {
    val df = vecs(7).toDF("a", "b")
      .withColumn("expr", Similarity.cosine(col("a"), col("b")))
      .withColumn("udf", udfKernel(col("a"), col("b")))
    val rows = df.select("expr", "udf").collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"expr ${r.getDouble(0)} != udf ${r.getDouble(1)}")
    }
  }

  test("bit-identical in the interpreted (non-codegen) path") {
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val df = vecs(13).toDF("a", "b")
        .withColumn("expr", Similarity.cosine(col("a"), col("b")))
        .withColumn("udf", udfKernel(col("a"), col("b")))
      df.select("expr", "udf").collect().foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("null array, mismatched lengths, empty arrays") {
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(1.0, 2.0))),   // equal → 1.0
      (None, Some(Array(1.0, 2.0))),                     // null side → null
      (Some(Array(1.0, 2.0)), None),                     // null side → null
      (Some(Array(1.0, 2.0)), Some(Array(1.0, 2.0, 3.0))), // mismatch → null
      (Some(Array.empty[Double]), Some(Array.empty[Double])) // 0/0 → NaN
    ).toDF("a", "b").withColumn("c", Similarity.cosine(col("a"), col("b")))
    val got = df.select("c").collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(math.abs(got(0).asInstanceOf[Double] - 1.0) < 1e-12)
    assert(got(1) == null && got(2) == null && got(3) == null)
    assert(got(4).asInstanceOf[Double].isNaN)
  }

  test("float arrays cast transparently (embedding columns)") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f)))
      .toDF("a", "b").withColumn("c", Similarity.cosine(col("a"), col("b")))
    assert(df.select("c").head().getDouble(0) == 1.0)
  }

  test("dot_product and l2_distance: native kernels, both eval paths") {
    import graft.functions.ArrayKernels
    val df = vecs(31).toDF("a", "b")
      .withColumn("dot", ArrayKernels.dot(col("a"), col("b")))
      .withColumn("l2", ArrayKernels.l2(col("a"), col("b")))
    df.collect().foreach { r =>
      val a = r.getSeq[Double](0).toArray
      val b = r.getSeq[Double](1).toArray
      val dot = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      val l2 = math.sqrt(a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + (x - y) * (x - y) })
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(dot))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(l2))
    }
    // null propagation: mismatched lengths
    val bad = Seq((Array(1.0), Array(1.0, 2.0))).toDF("a", "b")
      .select(ArrayKernels.dot(col("a"), col("b")).as("d"),
        ArrayKernels.l2(col("a"), col("b")).as("l"))
      .head()
    assert(bad.isNullAt(0) && bad.isNullAt(1))
  }

  test("cosine_similarity callable from plain SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT cosine_similarity(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c")
      .head().getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
    // and against a real table column
    vecs(21).toDF("a", "b").createOrReplaceTempView("cos_pairs")
    val n = spark.sql(
      "SELECT cosine_similarity(a, b) AS c FROM cos_pairs WHERE cosine_similarity(a, b) IS NOT NULL")
      .count()
    assert(n == 64)
    // the sibling kernels register too (note: SQL literals arrive as
    // array<double> already — the builders take expressions as-is)
    val d = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d," +
        " l2_distance(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS l").head()
    assert(d.getDouble(0) == 11.0 && d.getDouble(1) == 5.0)
  }

  test("ANN brute-force plan carries no ScalaUDF — scoring is native codegen") {
    val p = SparkEntry.queries("q_ann_topk")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("UDF("), s"scoring should be the native expression:\n$p")
    assert(p.contains("cosine_similarity"), s"expected cosine_similarity in plan:\n$p")
  }
}

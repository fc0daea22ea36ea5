package graft

import graft.operators._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Specs for A10-A13 feature transformers. */
class FeaturesSpec extends GraftSpec {
  import spark.implicits._

  test("MeanImputer: null -> mean of non-nulls (MeanImputer.java:41-58)") {
    val df = Seq(Some(1.0), None, Some(3.0), Some(5.0)).toDF("v")
    val model = new MeanImputer().setInputCol("v").fit(df)
    assert(model.mean == 3.0)
    val out = model.transform(df)
    // append contract (spark.ml composability): input cols stay
    assert(out.columns.toSeq == Seq("v", "imputed_value"))
    assert(out.select("imputed_value").as[Double].collect().sorted.toSeq
      == Seq(1.0, 3.0, 3.0, 5.0))
  }

  test("StandardScaler: real (x-mu)/sd, not the reference identity stub") {
    val df = Seq(2.0, 4.0, 6.0).toDF("v")
    val model = new StandardScalerEst().setInputCol("v").fit(df)
    assert(model.mean == 4.0 && math.abs(model.std - 2.0) < 1e-12)
    val out = model.transform(df).select("scaled_value").as[Double].collect().sorted
    assertApprox(out.toSeq, Seq(-1.0, 0.0, 1.0), 1e-12)
  }

  test("TimeFeatureExtractor: yyyy-MM-dd -> (year INT, month/day %02d strings); junk -> nulls") {
    val df = Seq("2021-03-07", "bad-date", null, "2021-3-7").toDF("d")
    val out = new TimeFeatureExtractor().setInputCol("d").transform(df)
      .select("year", "month", "day") // appended next to the input col
    assert(out.schema == new StructType()
      .add("year", IntegerType).add("month", StringType).add("day", StringType))
    val rows = out.collect()
    assert(rows(0) == Row(2021, "03", "07"))
    rows.drop(1).foreach(r => assert(r == Row(null, null, null)))
  }

  test("AutoFeatureTransformer: double col, null AND 0.0 both imputed (reference quirk)") {
    val df = Seq(Some(2.0), None, Some(0.0), Some(4.0)).toDF("x")
    val out = new AutoFeatureTransformer().transform(df)
    // non-"missing" values 2.0, 4.0 -> mean 3.0 fills both null and 0.0
    assert(out.select("newValue").as[Double].collect().sorted.toSeq ==
      Seq(2.0, 3.0, 3.0, 4.0))
  }

  test("model save/load round-trips (testSaveLoadAndTransform parity)") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val mi = new MeanImputer().setInputCol("v").fit(df)
    val d1 = java.nio.file.Files.createTempDirectory("mi").toString
    mi.save(d1)
    assert(MeanImputerModel.load(spark, d1).mean == mi.mean)

    val sc = new StandardScalerEst().setInputCol("v").fit(df)
    val d2 = java.nio.file.Files.createTempDirectory("sc").toString
    sc.save(d2)
    val sl = StandardScalerModel.load(spark, d2)
    assert(sl.mean == sc.mean && sl.std == sc.std)
    // save -> load -> TRANSFORM golden: the reloaded model must score
    // identically, not just carry the same coefficients
    def vals(out: org.apache.spark.sql.DataFrame, c: String): Seq[Option[Double]] =
      out.select(c).collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Double])).toSeq
    val want = vals(sc.transform(df), "scaled_value")
    val got = vals(sl.setInputCol("v").transform(df), "scaled_value")
    assert(got == want, s"reloaded scaler scores differ: $got vs $want")

    // estimator side round-trips through DefaultParams*
    val d3 = java.nio.file.Files.createTempDirectory("sce").toString
    new StandardScalerEst().setInputCol("v").setOutputCol("z").write.overwrite().save(d3)
    val re = StandardScalerEst.load(d3)
    assert(re.getOrDefault(re.inputCol) == "v" && re.getOrDefault(re.outputCol) == "z")
    assert(vals(re.fit(df).transform(df), "z") == want)
  }

  test("AutoFeatureTransformer: integer columns one-hot over observed domain") {
    val df = Seq((1, 2.0), (3, 0.0), (1, 4.0)).toDF("cat", "x")
    val out = new AutoFeatureTransformer().transform(df)
    val oh = out.select("cat_onehot").collect().map(_.getSeq[Int](0).toList)
    assert(oh.toList == List(List(1, 0), List(0, 1), List(1, 0))) // domain [1,3]
  }

  test("AutoFeatureTransformer: oversized one-hot domain fails fast, names the fix") {
    // an id-like integer column must not flood the driver with its
    // domain; the error points at the frequency-indexing alternative
    val wide = (1 to 1500).map(i => (i, 1.0)).toDF("user_id", "x")
    val e = intercept[IllegalArgumentException] {
      new AutoFeatureTransformer().transform(wide)
    }
    assert(e.getMessage.contains("user_id") && e.getMessage.contains("1000")
      && e.getMessage.toLowerCase.contains("frequency"), e.getMessage)
  }

  test("AutoFeatureTransformer: schema-driven dispatch plan") {
    val t = new AutoFeatureTransformer()
    val schema = new StructType().add("s", StringType).add("d", DoubleType)
      .add("i", IntegerType).add("b", BinaryType)
    assert(t.plan(schema) == Map("s" -> "time", "d" -> "mean_impute_zero_as_missing",
      "i" -> "one_hot", "b" -> "passthrough"))
  }
}

package graft

import graft.operators.Topsis
import org.apache.spark.ml.linalg.Vectors

/** Golden fixture F2 (reference TopsisTest.java:37-47,128-132). */
class TopsisSpec extends GraftSpec {
  import spark.implicits._

  private val input = Seq(
    Tuple1(Vectors.dense(9.0, 10.0, 175.0, 120.0)),
    Tuple1(Vectors.dense(8.0, 7.0, 164.0, 80.0)),
    Tuple1(Vectors.dense(6.0, 3.0, 157.0, 90.0)))

  private def fitted = new Topsis()
    .setWeights(Array(0.4, 0.3, 0.2, 0.1))
    .setCriteriaTypes(Array(1, 2, 3, 4))
    .setBestValue(165.0)
    .setIntervalValue(Array(90.0, 100.0))

  test("golden scores match reference within 1e-4") {
    val df = input.toDF("features")
    val out = fitted.transform(df)
    assert(out.columns.toSeq == Seq("features", "prediction"))
    val scores = out.collect().map(r =>
      (r.getAs[org.apache.spark.ml.linalg.Vector]("features")(0),
       r.getAs[org.apache.spark.ml.linalg.Vector]("prediction")(0)))
      .sortBy(-_._1).map(_._2).toSeq // sort by first feature desc = input order
    assertApprox(scores, Seq(0.2033, 0.5905, 0.6247), 1e-4)
  }

  test("scores are in [0,1] and array<double> input works") {
    val df = input.map(t => Tuple1(t._1.toArray)).toDF("features")
    val out = Topsis.score(df, "features", Array(0.4, 0.3, 0.2, 0.1),
      Array(1, 2, 3, 4), 165.0, Array(90.0, 100.0), "score")
    val scores = out.select("score").collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(out.columns.toSeq == Seq("features", "score"))
  }

  test("param defaults and round-trip") {
    val t = new Topsis()
    assert(t.getFeaturesCol == "features")
    assert(t.getPredictionCol == "prediction")
    assert(t.getBestValue == 0.0)
    val t2 = fitted.setFeaturesCol("f").setPredictionCol("p")
    assert(t2.getWeights.toSeq == Seq(0.4, 0.3, 0.2, 0.1))
    assert(t2.getCriteriaTypes.toSeq == Seq(1, 2, 3, 4))
    assert(t2.getFeaturesCol == "f" && t2.getPredictionCol == "p")
  }
}

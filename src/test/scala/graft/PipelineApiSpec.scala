package graft

import graft.operators.{FCM, MeanImputer, StandardScalerEst}
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.SQLTransformer
import org.apache.spark.sql.functions._

/** The reference's central abstraction is the ML pipeline (stages chained
  * through fit/transform). Our stages are genuine spark.ml
  * Estimator/Model/Transformer classes, so they must compose inside a
  * STOCK `org.apache.spark.ml.Pipeline` — including interleaved with
  * Spark's own stages — with schema propagation through transformSchema. */
class PipelineApiSpec extends GraftSpec {
  import spark.implicits._

  test("impute -> scale -> assemble -> FCM composes in a stock Pipeline") {
    val df = Seq(
      (1L, Some(10.0), 1.0), (2L, None, 1.2), (3L, Some(14.0), 0.9),
      (4L, Some(100.0), 9.0), (5L, Some(104.0), 9.5), (6L, None, 9.2))
      .toDF("id", "v", "w")

    val impute = new MeanImputer().setInputCol("v").setOutputCol("v_imp")
    val scale = new StandardScalerEst().setInputCol("v_imp").setOutputCol("v_scaled")
    val assemble = new SQLTransformer()
      .setStatement("SELECT *, array(v_scaled, w) AS features FROM __THIS__")
    val fcm = new FCM().setK(2).setMaxIter(50).setSeed(7)

    val model = new Pipeline()
      .setStages(Array(impute, scale, assemble, fcm))
      .fit(df)
    val out = model.transform(df)

    assert(out.columns.contains("prediction"))
    assert(out.count() == 6)
    // the two w-groups must split into the two clusters
    val byGroup = out.select(col("id"), col("prediction"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .partition(_._1 <= 3)
    val (lo, hi) = (byGroup._1.map(_._2).toSet, byGroup._2.map(_._2).toSet)
    assert(lo.size == 1 && hi.size == 1 && lo != hi,
      s"pipeline clustering must separate the groups: lo=$lo hi=$hi")
    // schema propagated through every stage (imputed + scaled cols kept)
    assert(out.columns.toSet.contains("v_imp") && out.columns.toSet.contains("v_scaled"))
  }
}

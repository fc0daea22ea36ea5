package graft

import graft.operators.AHP

/** Golden fixture F3 (reference AHPTest.java:33-55). */
class AHPSpec extends GraftSpec {
  import spark.implicits._

  private val judgment = Array(
    Array(1.0, 0.5, 4.0, 3.0, 3.0, 2.0),
    Array(2.0, 1.0, 7.0, 5.0, 5.0, 4.0),
    Array(0.25, 0.143, 1.0, 0.5, 0.67, 0.4),
    Array(0.67, 0.2, 2.0, 1.0, 1.0, 0.67),
    Array(0.33, 0.2, 3.0, 1.0, 1.0, 2.0),
    Array(0.5, 0.25, 2.5, 3.0, 0.5, 1.0))
  private val indicator = Array(1, 1, 1, 0, 0, 0)
  private val cols = Array("High", "Low", "Open", "Close", "Volume", "Marketcap")

  private val rows = Seq(
    (55.11235847, 49.78789992, 52.67503496, 53.21924296, 553091.4598, 8.912812886084658e7),
    (53.40227002, 40.73457791, 53.29196931, 42.40159861, 583091.4598, 7.101144125451232e7),
    (42.40831364, 35.97068975, 42.39994711, 40.08397561, 682834.18632335, 6.713003689981823e7),
    (44.90251114, 36.69605677, 39.88526234, 43.76446306, 1658816.92260445, 2.2026514210956782e8))

  test("golden scores match reference within 1e-4") {
    val df = rows.toDF(cols: _*)
    val out = new AHP().setInputCols(cols).setJudgmentMatrix(judgment)
      .setIndicatorType(indicator).setOutputCol("score").transform(df)
    assert(out.columns.toSeq == cols.toSeq :+ "score")
    val scores = out.collect().map(r => (r.getDouble(0), r.getAs[Double]("score")))
      .sortBy(-_._1).map(_._2).toSeq
    
    assertApprox(scores, Seq(0.1841, 0.1189, 0.0218, 0.0396), 1e-4) // sorted by High desc
  }

  test("inconsistent judgment matrix is rejected") {
    val bad = Array(
      Array(1.0, 9.0, 0.111),
      Array(0.111, 1.0, 9.0),
      Array(9.0, 0.111, 1.0))
    val df = rows.toDF(cols: _*)
    val e = intercept[IllegalArgumentException] {
      new AHP().setInputCols(Array("High", "Low", "Open")).setJudgmentMatrix(bad)
        .setIndicatorType(Array(1, 1, 1)).transform(df).collect()
    }
    assert(e.getMessage.contains("CR"))
  }

  test("score invariant under row order") {
    val df = rows.reverse.toDF(cols: _*)
    val out = AHP.score(df, cols, judgment, indicator, "score")
    val scores = out.collect().map(r => (r.getDouble(0), r.getAs[Double]("score")))
      .sortBy(-_._1).map(_._2).toSeq
    assertApprox(scores, Seq(0.1841, 0.1189, 0.0218, 0.0396), 1e-4) // sorted by High desc
  }
}

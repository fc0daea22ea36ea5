package graft

import graft.operators._
import org.apache.spark.sql.functions.col

/** Golden tests for the Online* operators, ported from
  * test/java/cn/swust/algorithms/ahp/OnlineAHPTest.java and
  * test/java/cn/swust/algorithms/topsis/OnlineTopsisTest.java. */
class OnlineSpec extends GraftSpec {
  import spark.implicits._

  // ---- OnlineAHP fixture (OnlineAHPTest.java:31-71) ----
  private val ahpJudgment = Array(
    Array(1.0, 0.5, 4.0, 3.0, 3.0, 2.0),
    Array(2.0, 1.0, 7.0, 5.0, 5.0, 4.0),
    Array(0.25, 0.143, 1.0, 0.5, 0.67, 0.4),
    Array(0.67, 0.2, 2.0, 1.0, 1.0, 0.67),
    Array(0.33, 0.2, 3.0, 1.0, 1.0, 2.0),
    Array(0.5, 0.25, 2.5, 3.0, 0.5, 1.0))
  private val ahpTypes = Array(1, 1, 1, 0, 0, 0)

  private val ahpRows = Seq(
    (1601913600000L, 55.11235847, 49.78789992, 52.67503496, 53.21924296, 0.0, 89128128.86084658),
    (1602000000000L, 53.40227002, 40.73457791, 53.29196931, 42.40159861, 583091.4598, 71011441.25451232),
    (1602086400000L, 42.40831364, 35.97068975, 42.39994711, 40.08397561, 682834.18632335, 67130036.89981823),
    (1602172800000L, 44.90251114, 36.69605677, 39.88526234, 43.76446306, 1658816.92260445, 220265142.10956782),
    (1602259200000L, 47.56953274, 43.2917758, 43.76446306, 46.81774415, 815537.6608, 235632208.16269898),
    (1602345600000L, 51.4056548, 46.70332768, 46.81814554, 49.13371767, 1074627.02770495, 247288428.75616974),
    (1602432000000L, 51.45337431, 48.71603954, 49.13312951, 49.66072573, 692150.60094118, 249940843.43242228),
    (1602518400000L, 54.42141763, 48.75407708, 49.66157329, 52.23869222, 1354836.06481028, 262915666.29307267),
    (1602518400000L, 57.48190422, 49.59873521, 52.23839242, 51.12431679, 1386221.2066711, 257307050.43080166))

  private val ahpGolden = Map( // id (with dup handling by value) -> score
    1601913600000L -> Seq(0.1342), 1602000000000L -> Seq(0.0931),
    1602086400000L -> Seq(0.0337), 1602172800000L -> Seq(0.0366),
    1602259200000L -> Seq(0.0970), 1602345600000L -> Seq(0.1235),
    1602432000000L -> Seq(0.0543), 1602518400000L -> Seq(0.0215, 0.1326))

  test("OnlineAHP golden scores, 3-day windows (OnlineAHPTest.java:49-71,186-222)") {
    val df = ahpRows.toDF("id", "High", "Low", "Open", "Close", "Volume", "Marketcap")
    val out = new OnlineAHP()
      .setInputCols("High", "Low", "Open", "Close", "Volume", "Marketcap")
      .setJudgmentMatrix(ahpJudgment)
      .setIndicatorType(ahpTypes)
      .setTimeCol("id")
      .setWindowDuration("3 days")
      .setOutputCol("output")
      .transform(df)
    assert(out.columns.toSeq ==
      Seq("id", "High", "Low", "Open", "Close", "Volume", "Marketcap", "output"))
    val got = out.select("id", "output").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(1)).sorted.toSeq).toMap
    ahpGolden.foreach { case (id, want) =>
      val g = got(id)
      assert(g.length == want.length, s"id $id: $g vs $want")
      g.sorted.zip(want.sorted).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-4, s"id $id: got $g want $want")
      }
    }
  }

  // ---- OnlineTopsis fixture (OnlineTopsisTest.java:45-77) ----
  private val topsisRows = Seq(
    (1517414400000L, Array(262.000000, 267.899994, 250.029999, 254.259995, 254.259995, 11896100.0)),
    (1517500800000L, Array(247.699997, 266.700012, 245.000000, 265.720001, 265.720001, 12595800.0)),
    (1517587200000L, Array(266.579987, 272.450012, 264.329987, 264.559998, 264.559998, 8981500.0)),
    (1517673600000L, Array(267.079987, 267.619995, 250.000000, 250.100006, 250.100006, 9306700.0)),
    (1517760000000L, Array(253.850006, 255.800003, 236.110001, 249.470001, 249.470001, 16906900.0)),
    (1517846400000L, Array(252.139999, 259.149994, 249.000000, 257.950012, 257.950012, 8534900.0)),
    (1517932800000L, Array(257.290009, 261.410004, 254.699997, 258.269989, 258.269989, 6855200.0)),
    (1518019200000L, Array(260.470001, 269.880005, 260.329987, 266.000000, 266.000000, 10972000.0)),
    (1518105600000L, Array(270.029999, 280.500000, 267.630005, 280.269989, 280.269989, 10759700.0)))

  // (timestamp, minTimestamp, score) (OnlineTopsisTest.java:57-66)
  private val expectedModelData = Set(
    (1517875199999L, 1517673600000L, 0.5704),
    (1518134399999L, 1517932800000L, 0.4296),
    (1517615999999L, 1517414400000L, 0.3537))

  private val topsisGolden = Map(
    1517414400000L -> 0.3537, 1517500800000L -> 0.3537, 1517587200000L -> 0.3537,
    1517673600000L -> 0.5704, 1517760000000L -> 0.5704, 1517846400000L -> 0.5704,
    1517932800000L -> 0.4296, 1518019200000L -> 0.4296, 1518105600000L -> 0.4296)

  private def fitTopsis() = {
    val df = topsisRows.toDF("id", "features")
    val model = new OnlineTopsis()
      .setCriteriaTypes(1, 1, 1, 2, 2, 2)
      .setWeights(0.1, 0.1, 0.1, 0.1, 0.1, 0.1)
      .setTimeCol("id")
      .setWindowDuration("3 days")
      .fit(df)
    (df, model)
  }

  test("OnlineTopsis model data golden (OnlineTopsisTest.java:255-276)") {
    val (_, model) = fitTopsis()
    val md = model.getModelData
    assert(md.columns.toSeq == Seq("data", "timestamp", "score", "minTimestamp"))
    val got = md.collect().map(r =>
      (r.getAs[Long]("timestamp"), r.getAs[Long]("minTimestamp"),
        math.rint(r.getAs[Double]("score") * 1e4) / 1e4)).toSet
    assert(got == expectedModelData, s"got $got")
  }

  test("OnlineTopsis per-row scores via model gating (OnlineTopsisTest.java:180-224)") {
    val (df, model) = fitTopsis()
    val out = model.transform(df)
    assert(out.columns.toSeq == Seq("id", "features", "prediction"))
    val got = out.select("id", "prediction").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    topsisGolden.foreach { case (id, want) =>
      assert(math.abs(got(id) - want) <= 1e-4, s"id $id: got ${got(id)} want $want")
    }
  }

  test("model-table cap: broadcast-range-join fallback matches the collect path") {
    // past maxCollectedModelRows the gate switches from the broadcast
    // scan to a broadcast range join; both must pick the same (earliest
    // suitable) window for every row, including delay-gated no-matches
    val (df, model) = fitTopsis()
    for (delay <- Seq(0L, 86400000L)) {
      model.setMaxAllowedModelDelayMs(delay)
      def scores(m: OnlineTopsisModel) =
        m.transform(df).select("id", "prediction").collect()
          .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
          .toMap
      val viaScan = scores(model.setMaxCollectedModelRows(1L << 20))
      val viaJoin = scores(model.setMaxCollectedModelRows(1L)) // 3 windows > cap
      assert(viaScan == viaJoin, s"delay=$delay: $viaScan vs $viaJoin")
    }
    model.setMaxAllowedModelDelayMs(0L).setMaxCollectedModelRows(1L << 20)
  }

  test("OnlineTopsisModel save/load + setModelData (OnlineTopsisTest.java:277-291)") {
    val (df, model) = fitTopsis()
    val dir = java.nio.file.Files.createTempDirectory("ot-model").toString
    model.save(dir)
    val loaded = OnlineTopsisModel.load(spark, dir)
      .setTimeCol("id")
    val got = loaded.transform(df).select("id", "prediction").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    topsisGolden.foreach { case (id, want) =>
      assert(math.abs(got(id) - want) <= 1e-4, s"id $id after reload: ${got(id)}")
    }
  }

  test("OnlineTopsis estimator save/load round-trip refits to the same scores") {
    // estimator params persist via DefaultParams*; the reloaded estimator
    // must fit an equivalent model (reference testSaveLoadAndTransform
    // parity for the Estimator side)
    val (df, _) = fitTopsis()
    val est = new OnlineTopsis()
      .setCriteriaTypes(1, 1, 1, 2, 2, 2)
      .setWeights(0.1, 0.1, 0.1, 0.1, 0.1, 0.1)
      .setTimeCol("id").setWindowDuration("3 days")
    val dir = java.nio.file.Files.createTempDirectory("ot-est").toString
    est.write.overwrite().save(dir)
    val reloaded = OnlineTopsis.load(dir)
    assert(reloaded.getMaxAllowedModelDelayMs == est.getMaxAllowedModelDelayMs)
    val got = reloaded.fit(df).transform(df).select("id", "prediction").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    topsisGolden.foreach { case (id, want) =>
      assert(math.abs(got(id) - want) <= 1e-4, s"id $id after estimator reload: ${got(id)}")
    }
  }

  test("OnlineTopsis param defaults (OnlineTopsisTest.java:128-158)") {
    val ot = new OnlineTopsis()
    assert(ot.getFeaturesCol == "features")
    assert(ot.getPredictionCol == "prediction")
    assert(ot.getWindowDuration == "") // GlobalWindows analog
    assert(ot.getMaxAllowedModelDelayMs == 0L)
  }

  test("sliding windows: each row scored in win/slide overlapping windows") {
    val df = ahpRows.toDF("id", "High", "Low", "Open", "Close", "Volume", "Marketcap")
    val out = new OnlineAHP()
      .setInputCols("High", "Low", "Open", "Close", "Volume", "Marketcap")
      .setJudgmentMatrix(ahpJudgment)
      .setIndicatorType(ahpTypes)
      .setTimeCol("id")
      .setWindowDuration("3 days").setSlideDuration("1 day")
      .setOutputCol("output")
      .transform(df)
    assert(out.columns.contains("window_start"))
    assert(out.count() == ahpRows.size * 3L, "3-day window / 1-day slide = 3 memberships")
    // every (row, window) pair is consistent: window contains the row's ts
    out.select("id", "window_start").collect().foreach { r =>
      val (t, ws) = (r.getLong(0), r.getLong(1))
      assert(ws <= t && t < ws + 3L * 86400000L)
    }
    // a tumbling-aligned window's scores must match the tumbling run
    val tumbling = new OnlineAHP()
      .setInputCols("High", "Low", "Open", "Close", "Volume", "Marketcap")
      .setJudgmentMatrix(ahpJudgment).setIndicatorType(ahpTypes)
      .setTimeCol("id").setWindowDuration("3 days").setOutputCol("output")
      .transform(df).select("id", "output").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(1)).toSet).toMap
    val slidingAligned = out
      .filter(col("window_start") % (3L * 86400000L) === 0)
      .select("id", "output").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(1)).toSet).toMap
    slidingAligned.foreach { case (id, scores) =>
      assert(scores == tumbling(id), s"id $id: $scores vs ${tumbling(id)}")
    }
  }

  test("session windows: gap threshold starts new sessions per key") {
    val ev = Seq(
      (1L, 0L), (1L, 1000L), (1L, 2000L),      // session 0 (1s gaps)
      (1L, 10000L), (1L, 10500L),              // session 1 (8s gap > 5s)
      (1L, 30000L),                            // session 2
      (2L, 0L), (2L, 20000L))                  // user 2: sessions 0, 1
      .toDF("user_id", "tms")
    val out = EventWindows.sessionize(ev, "tms", Seq("user_id"), gapMs = 5000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 0L)) == 0 && out((1L, 2000L)) == 0)
    assert(out((1L, 10000L)) == 1 && out((1L, 10500L)) == 1)
    assert(out((1L, 30000L)) == 2)
    assert(out((2L, 0L)) == 0 && out((2L, 20000L)) == 1)
  }

  test("global window = one window over everything (GlobalWindows default)") {
    val df = topsisRows.toDF("id", "features")
    val model = new OnlineTopsis()
      .setCriteriaTypes(1, 1, 1, 2, 2, 2)
      .setWeights(0.1, 0.1, 0.1, 0.1, 0.1, 0.1)
      .setTimeCol("id")
      .fit(df)
    assert(model.getModelData.count() == 1L)
  }
}

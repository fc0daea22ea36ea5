package graft

import graft.operators.Quantiles
import org.apache.spark.sql.functions._

/** Exact-quantile selection: percentile_disc rank semantics, recursion
  * depth behavior (tiny collectThreshold forces multi-level), degenerate
  * distributions (constant, two adjacent values, heavy duplicates). */
class QuantilesSpec extends GraftSpec {
  import spark.implicits._

  private def quantiles(vals: Seq[Double], ps: Seq[Double],
                        bins: Int = 8, thr: Long = 4): Map[Double, Double] =
    Quantiles.exactQuantiles(vals.toDF("x"), "x", ps, bins, thr)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap

  /** percentile_disc oracle: k-th smallest, k = max(1, ceil(p*n)). */
  private def disc(vals: Seq[Double], p: Double): Double = {
    val s = vals.sorted
    s(math.max(1, math.ceil(p * s.length).toInt) - 1)
  }

  test("matches percentile_disc on shuffled distinct values") {
    val vals = (1 to 1000).map(i => (i * 37 % 1009).toDouble)
    val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
    val got = quantiles(vals, ps, bins = 8, thr = 4)
    ps.foreach(p => assert(got(p) == disc(vals, p), s"p=$p"))
  }

  test("heavy duplicates: equal values share a bucket, ranks stay exact") {
    val vals = Seq.fill(500)(7.0) ++ Seq.fill(300)(3.0) ++ Seq.fill(200)(9.0)
    val ps = Seq(0.1, 0.3, 0.31, 0.8, 0.81)
    val got = quantiles(vals, ps)
    ps.foreach(p => assert(got(p) == disc(vals, p), s"p=$p"))
  }

  test("constant column resolves with no recursion") {
    assert(quantiles(Seq.fill(100)(5.5), Seq(0.0, 0.5, 1.0)) ==
      Map(0.0 -> 5.5, 0.5 -> 5.5, 1.0 -> 5.5))
  }

  test("adjacent doubles converge") {
    val a = 1.0
    val b = java.lang.Math.nextUp(a)
    val vals = Seq.fill(60)(a) ++ Seq.fill(40)(b)
    val got = quantiles(vals, Seq(0.5, 0.7), bins = 4, thr = 2)
    assert(got(0.5) == a && got(0.7) == b)
  }

  test("subnormal range converges (bin width underflows to zero)") {
    // (hi-lo)/bins == 0.0 here: the naive division is NaN/Inf and would
    // spin to the level cap; the two-way split must still resolve
    val tiny = java.lang.Double.MIN_VALUE
    val vals = Seq.fill(10)(0.0) ++ Seq.fill(10)(tiny)
    val got = quantiles(vals, Seq(0.5, 1.0), bins = 4, thr = 2)
    assert(got(0.5) == 0.0 && got(1.0) == tiny)
  }

  test("nulls and NaNs are ignored; empty input yields empty values") {
    val df = Seq(Some(1.0), None, Some(Double.NaN), Some(3.0), Some(2.0))
      .toDF("x")
    val got = Quantiles.exactQuantiles(df, "x", Seq(1.0 / 3, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got == Map(1.0 / 3 -> 1.0, 1.0 -> 3.0))
    val empty = Quantiles.exactQuantiles(df.filter(lit(false)), "x", Seq(0.5))
    assert(empty.collect().forall(_.isNullAt(1)))
  }

  test("invalid p fails fast") {
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(Seq(1.0).toDF("x"), "x", Seq(1.5))
    }
  }

  private val groupedDf = Seq(
    ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
    ("b", 10.0), ("b", 20.0), ("b", 20.0),
    ("c", 5.0)
  ).toDF("g", "x")
  private val groupedWant = Map(
    ("a", 0.5) -> 2.0, ("a", 1.0) -> 4.0,
    ("b", 0.5) -> 20.0, ("b", 1.0) -> 20.0,
    ("c", 0.5) -> 5.0, ("c", 1.0) -> 5.0)

  test("grouped quantiles match per-group percentile_disc in BOTH regimes") {
    for (out <- Seq(
      Quantiles.groupedQuantilesWindow(groupedDf, "g", "x", Seq(0.5, 1.0)),
      Quantiles.groupedQuantilesHistogram(groupedDf, "g", "x", Seq(0.5, 1.0),
        bins = 4, collectThreshold = 2),
      Quantiles.groupedQuantiles(groupedDf, "g", "x", Seq(0.5, 1.0)))) {
      val got = out.collect()
        .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      assert(got == groupedWant)
    }
  }

  test("histogram regime fails fast past maxGroups; window is partitioned") {
    val e = intercept[IllegalArgumentException] {
      Quantiles.groupedQuantilesHistogram(groupedDf, "g", "x", Seq(0.5),
        maxGroups = 2)
    }
    assert(e.getMessage.contains("groupedQuantilesWindow"))
    val p = Quantiles.groupedQuantilesWindow(groupedDf, "g", "x", Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      s"grouped quantile window must partition by group:\n$p")
  }

  test("q_group_quantiles dispatches to the histogram regime (3 groups, no Window)") {
    val p = SparkEntry.queries("q_group_quantiles")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"few-group quantiles must not sort per-group in single tasks:\n$p")
  }

  test("histogram regime: null groups omitted, total-collect cap forces extra levels") {
    val df = Seq((Some("a"), 1.0), (Some("a"), 2.0), (None, 9.0), (None, 8.0),
      (Some("b"), 3.0)).toDF("g", "x")
    for (out <- Seq(
      Quantiles.groupedQuantilesHistogram(df, "g", "x", Seq(1.0)),
      Quantiles.groupedQuantilesWindow(df, "g", "x", Seq(1.0)))) {
      val got = out.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(got == Map("a" -> 2.0, "b" -> 3.0), "null group omitted, no crash")
    }
    // many small groups, each under collectThreshold, together over
    // maxCollectRows: recursion must keep narrowing so the final collect
    // stays bounded — and stay exact
    val many = (0 until 40).flatMap(g => (0 to g % 7).map(i => (s"g$g", i.toDouble)))
    val got = Quantiles.groupedQuantilesHistogram(many.toDF("g", "x"), "g", "x",
        Seq(0.5), bins = 2, collectThreshold = 100, maxCollectRows = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    (0 until 40).foreach { g =>
      val vals = (0 to g % 7).map(_.toDouble)
      assert(got(s"g$g") == disc(vals, 0.5), s"group g$g")
    }
  }

  test("regimes agree on real data") {
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
    val ps = Seq(0.25, 0.5, 0.75)
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val h = m(Quantiles.groupedQuantilesHistogram(li, "l_returnflag",
      "l_extendedprice", ps, bins = 16, collectThreshold = 50))
    val w = m(Quantiles.groupedQuantilesWindow(li, "l_returnflag",
      "l_extendedprice", ps))
    assert(h == w && h.size == 9)
  }

  test("mode per group: counts, greatest-value tie-break, null handling, plan") {
    val df = Seq(
      (Some("a"), Some(1.0)), (Some("a"), Some(1.0)), (Some("a"), Some(2.0)),
      (Some("b"), Some(5.0)), (Some("b"), Some(7.0)), // tie -> greatest value
      (Some("b"), None), (None, Some(9.0))
    ).toDF("g", "x")
    val got = Quantiles.modePerGroup(df, "g", "x")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got == Map("a" -> ((1.0, 2L)), "b" -> ((7.0, 1L))))
    val p = Quantiles.modePerGroup(df, "g", "x")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window") && p.contains("partial"),
      s"mode must be two partial-agg levels, no window:\n$p")
    // categorical values work too — no numeric cast silently nulling them
    val cats = Seq(("a", "en"), ("a", "en"), ("a", "de")).toDF("g", "lang")
    val m = Quantiles.modePerGroup(cats, "g", "lang").collect()
    assert(m.length == 1 && m(0).getString(1) == "en" && m(0).getLong(2) == 2L)
  }

  test("histogram: exact bucket counts, top edge folds into last bucket") {
    val df = (0 to 100).map(_.toDouble).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = Quantiles.histogram(df, "v", bins = 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // [0,100] in 4 bins of width 25; v=100 clamps into bin 3
    assert(got(0) == (25L, 0.0, 24.0), s"got $got")
    assert(got(1) == (25L, 25.0, 49.0))
    assert(got(2) == (25L, 50.0, 74.0))
    assert(got(3) == (26L, 75.0, 100.0))
    assert(got.values.map(_._1).sum == 101L)
    // constant column: one bucket, all rows
    val const = Seq.fill(7)(5.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val cg = Quantiles.histogram(const, "v", bins = 4).collect()
    assert(cg.length == 1 && cg(0).getLong(1) == 7L)
    // empty input
    assert(Quantiles.histogram(df.filter(col("v") < 0), "v").count() == 0)
  }

  test("MAD outliers: hand-computed flags, nulls never flag, MAD=0 degenerate") {
    // values 1..9 + spike 100: med=5 (k=ceil(0.5*10)=5), |x-5| sorted =
    // 0,1,1,2,2,3,3,4,4,95 -> MAD (5th smallest) = 2; k=3 -> |x-5| > 6
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = Quantiles.madOutliers(df, "v", k = 3.0)
      .filter(col("is_outlier")).select("v").as[Double].collect().toSet
    assert(got == Set(100.0), s"got $got")
    // nulls never flag
    val withNull = Seq((1L, Some(1.0)), (2L, None), (3L, Some(50.0)))
      .toDF("id", "v")
    val flags = Quantiles.madOutliers(withNull, "v", k = 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(!flags(2L), "null must not flag")
    // constant column: MAD=0, any deviation flags at any k
    val const = (Seq.fill(9)(5.0) :+ 6.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val cf = Quantiles.madOutliers(const, "v", k = 100.0)
      .filter(col("is_outlier")).select("v").as[Double].collect().toSeq
    assert(cf == Seq(6.0), s"got $cf")
    // all-infinite column: every deviation is NaN -> nothing flags, no crash
    val inf = Seq((1L, Double.PositiveInfinity), (2L, Double.PositiveInfinity))
      .toDF("id", "v")
    assert(Quantiles.madOutliers(inf, "v").filter(col("is_outlier")).count() == 0)
  }

  test("winsorize clamps to exact quantiles; nulls and empty input pass through") {
    val vals = (1 to 100).map(_.toDouble)
    val df = (vals.map(Some(_)) :+ None).toDF("x")
    val got = Quantiles.winsorize(df, "x", 0.05, 0.95)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    // k = ceil(p*100): lo = 5th smallest = 5.0, hi = 95th = 95.0
    assert(got.flatten.min == 5.0 && got.flatten.max == 95.0)
    assert(got.contains(None), "null passes through unclamped")
    assert(got.flatten.count(_ == 5.0) == 5 && got.flatten.count(_ == 95.0) == 6)
    val empty = Quantiles.winsorize(df.filter(lit(false)), "x")
    assert(empty.count() == 0)
  }

  test("oracle parity on real data at test SF") {
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
    val vals = li.select($"l_extendedprice").collect().map(_.getDouble(0)).toSeq
    val ps = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val got = Quantiles.exactQuantiles(li, "l_extendedprice", ps,
        bins = 64, collectThreshold = 100)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    ps.foreach(p => assert(got(p) == disc(vals, p), s"p=$p"))
  }
}

package graft

import graft.operators.Canopy
import graft.core.VecOps

/** Canopy structural tests. The reference's own test prints without golden
  * values because next-center order is nondeterministic there
  * (test/java/cn/swust/algorithms/canopy/CanopyTest.java:131-153); ours is
  * deterministic (input order), so we assert the canopy invariants. */
class CanopySpec extends GraftSpec {
  import spark.implicits._

  private val data = Seq(
    Array(1.0, 1.0), Array(1.2, 1.1), Array(1.4, 1.4),
    Array(5.0, 5.0), Array(5.3, 5.1), Array(9.0, 9.0), Array(9.1, 9.2))
  private lazy val df = data.map(Tuple1(_)).toDF("features").repartition(2)

  test("param defaults match reference (CanopyTest.java:88-115)") {
    val c = new Canopy()
    assert(c.getT1 == 1.0 && c.getT2 == 0.5)
    assert(c.getDistanceMeasure == "euclidean")
    assert(c.getFeaturesCol == "features" && c.getPredictionCol == "prediction")
  }

  test("T1 <= T2 rejected (Canopy.java:58-60)") {
    intercept[IllegalArgumentException] {
      new Canopy().setT1(0.4).setT2(0.5).transform(df)
    }
  }

  test("canopy invariants: centers >= T2 apart, members < T1, full coverage") {
    val t1 = 2.0; val t2 = 1.0
    val centers = Canopy.selectCenters(df, "features", t1, t2, 100, "euclidean")
    // pairwise center separation >= T2
    for (i <- centers.indices; j <- centers.indices if i < j)
      assert(VecOps.euclidean(centers(i), centers(j)) >= t2,
        s"centers $i,$j closer than T2")
    // every point within T1 of some center (or is a center)
    data.foreach { p =>
      assert(centers.exists(c => VecOps.euclidean(p, c) < t1),
        s"point ${p.toSeq} uncovered")
    }
    // three natural groups at these thresholds
    assert(centers.length == 3)
  }

  test("isolated center keeps its singleton canopy row (Canopy.java:93-109)") {
    // a far-outlier becomes a center with no strict members; the reference
    // still emits one row per center, so the canopy must not vanish
    val withOutlier = (data :+ Array(100.0, 100.0)).map(Tuple1(_))
      .toDF("features").repartition(2)
    val out = new Canopy().setT1(2.0).setT2(1.0).setMaxIter(100)
      .transform(withOutlier).collect()
    val singleton = out.filter(r =>
      r.getAs[scala.collection.Seq[Double]]("centroids").toArray
        .sameElements(Array(100.0, 100.0)))
    assert(singleton.length == 1, "outlier center row missing")
    val members = singleton.head
      .getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("prediction")
    assert(members.length == 1 && members.head.toArray.sameElements(Array(100.0, 100.0)))
  }

  test("tiny-T2 center explosion aborts fast with a clear message") {
    // T2 below the point spacing makes every point a center; the guard
    // must abort the partition sweep instead of flooding the driver
    val many = (1 to 300).map(i => Tuple1(Array(i * 10.0, 0.0)))
      .toDF("features").repartition(1)
    val e = intercept[org.apache.spark.SparkException] {
      Canopy.selectCenters(many, "features", t1 = 2.0, t2 = 1.0,
        maxIter = 1000, measure = "euclidean", maxCenters = 100)
    }
    assert(e.getMessage.contains("T2") || e.getCause.getMessage.contains("T2"),
      s"abort message must point at T2: ${e.getMessage}")
  }

  test("sequential sweep with orderCols is partition-layout-independent") {
    // the deterministic sweep must select the same centers, in the same
    // order, whatever the partitioning — that's the property that makes
    // it oracle-checkable (and the in-memory flat sweep is its spec)
    val pts = (1 to 200).map(i => (i.toLong, Array((i % 17).toDouble, (i % 23).toDouble)))
    val expected = Canopy.localCenters(
      pts.sortBy(_._1).iterator.map(_._2), 6.0, 3.0, 50, "euclidean")
    for (parts <- Seq(1, 3, 8)) {
      val df = pts.toDF("id", "features").repartition(parts)
      val got = Canopy.selectCentersSequential(df, "features", Seq("id"),
        6.0, 3.0, 50, "euclidean")
      assert(got.length == expected.length &&
        got.zip(expected).forall { case (a, b) => a.sameElements(b) },
        s"parts=$parts: ${got.map(_.toSeq).toSeq} vs ${expected.map(_.toSeq)}")
    }
  }

  test("filter-and-take sweep: driver fetch is bounded by batch, not data size") {
    // 5 tight clusters, all represented within the first few ids: round 1
    // fetches one TakeOrdered page (batch rows), selects all 5 centers
    // from its prefix, and the round-2 filter leaves nothing — so the
    // driver sees ~one page of a 2000-row input, independent of
    // partitioning (no sort ever runs; at 100 TB the fetch stays
    // batch x rounds while the old sorted-stream form pulled the corpus)
    val n = 2000
    val pts = (1 to n).map { i =>
      val c = i % 5
      (i.toLong, Array(c * 100.0 + (i % 7) * 0.1, (i % 11) * 0.1))
    }
    val df = pts.toDF("id", "features").repartition(8)
    val (centers, fetched) = Canopy.sweepWithStats(
      df, "features", Seq("id"), t2 = 10.0, maxIter = 50, measure = "euclidean",
      batch = 32)
    assert(centers.length == 5, s"expected 5 cluster centers, got ${centers.length}")
    // same output as the flat in-memory sweep
    val expected = Canopy.localCenters(
      pts.sortBy(_._1).iterator.map(_._2), 20.0, 10.0, 50, "euclidean")
    assert(centers.zip(expected).forall { case (a, b) => a.sameElements(b) })
    // one 32-row page selected every center; pruning left nothing to fetch
    assert(fetched < n / 10, s"driver fetched $fetched of $n rows")
  }

  test("transform fails fast past maxMembers instead of building the buffer") {
    import spark.implicits._
    // 40 near-identical points -> one canopy holding ~all of them
    val df40 = (0 until 40).map(i => (i.toLong, Array(i * 1e-4, 0.0)))
      .toDF("id", "features")
    val e = intercept[IllegalArgumentException] {
      new Canopy().setT1(10.0).setT2(5.0).setMaxIter(100)
        .setMaxMembers(10).transform(df40).collect()
    }
    assert(e.getMessage.contains("maxMembers"))
    // same data passes once the knob covers the canopy
    val ok = new Canopy().setT1(10.0).setT2(5.0).setMaxIter(100)
      .setMaxMembers(40).transform(df40).collect()
    assert(ok.nonEmpty)
  }

  test("transform output shape: (centroids, prediction=members incl center first)") {
    val out = new Canopy().setT1(2.0).setT2(1.0).setMaxIter(100).transform(df)
    assert(out.columns.toSeq == Seq("centroids", "prediction"))
    val rows = out.collect()
    rows.foreach { r =>
      val center = r.getAs[scala.collection.Seq[Double]]("centroids").toArray
      val members = r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("prediction")
      assert(members.head.toArray.sameElements(center), "center must lead the member list")
      members.tail.foreach { m =>
        assert(VecOps.euclidean(m.toArray, center) < 2.0)
      }
    }
  }
}

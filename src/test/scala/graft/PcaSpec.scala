package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Embedding covariance + the driver-side eigensolver (the PCA pair). */
class PcaSpec extends GraftSpec {

  test("embeddingCovariance: diagonal equals embeddingStats variance; symmetry by construction") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val cov = Similarity.embeddingCovariance(emb, "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val vars = Similarity.embeddingStats(emb, "embedding")
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(cov.size == 64 * 65 / 2, s"upper triangle of 64 dims: ${cov.size}")
    vars.foreach { case (d, v) =>
      assert(math.abs(cov((d, d)) - v) <= 1e-6, s"diag($d): ${cov((d, d))} vs $v")
    }
  }

  test("topEigen: recovers a planted spectrum; eigenpairs satisfy Av = lv") {
    // A = 5 u u^T + 2 w w^T with orthonormal u, w in R^4
    val u = Array(0.5, 0.5, 0.5, 0.5)
    val w = Array(0.5, -0.5, 0.5, -0.5)
    val a = Array.tabulate(4, 4)((i, j) => 5.0 * u(i) * u(j) + 2.0 * w(i) * w(j))
    val eig = Similarity.topEigen(a, 2, iters = 500)
    assert(math.abs(eig.head._1 - 5.0) < 1e-9, s"l1 ${eig.head._1}")
    assert(math.abs(eig(1)._1 - 2.0) < 1e-9, s"l2 ${eig(1)._1}")
    eig.foreach { case (l, v) =>
      val av = a.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
      av.zip(v).foreach { case (x, y) => assert(math.abs(x - l * y) < 1e-8) }
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9, "unit norm")
    }
    // orthogonality of the two components
    val dot = eig.head._2.zip(eig(1)._2).map { case (x, y) => x * y }.sum
    assert(math.abs(dot) < 1e-8, s"components not orthogonal: $dot")
  }

  test("hardNegatives: every negative carries a different label, ranks descend") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val labels = emb.select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = SparkEntry.queries("q_hard_negatives")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      rs.foreach { r =>
        assert(labels(r.getLong(1)) != labels(qid),
          s"negative ${r.getLong(1)} shares anchor $qid's label")
      }
      val byRank = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"scores must descend with rank: ${byRank.toSeq}")
    }
  }

  test("pcaLeadingComponent: 8-step iterate recovers a planted dominant direction") {
    // vectors = s * u + noise-free minor component: dominant direction u
    val u = Array(0.6, 0.0, 0.8, 0.0)
    val w = Array(0.0, 1.0, 0.0, 0.0)
    val rows = (0 until 40).map { i =>
      val s = (i % 7) - 3.0; val t = ((i % 3) - 1.0) * 0.1
      (i.toLong, u.map(_ * s).zip(w.map(_ * t)).map { case (a, b) => a + b }.toSeq)
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val (means, comp) = Similarity.pcaLeadingComponent(
      Similarity.pcaMomentCells(df, "embedding"))
    assert(math.abs(comp.map(x => x * x).sum - 1.0) < 1e-6, "unit norm")
    val cos = comp.zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.999, s"|cos(component, planted)| = ${math.abs(cos)}")
    // means of the minor coordinate: t cycles -0.1/0/0.1 evenly over 39 of
    // 40 rows; just assert the dominant coords' means track s's mean
    val sBar = (0 until 40).map(i => (i % 7) - 3.0).sum / 40.0
    assert(math.abs(means(0) - 0.6 * sBar) < 1e-9)
  }

  test("pcaProject: centered projection has ~zero mean; matches a driver dot product") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val (means, comp) = Similarity.pcaLeadingComponent(
      Similarity.pcaMomentCells(emb, "embedding"))
    val out = Similarity.pcaProject(emb, "vec_id", "embedding", means, comp)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val raw = emb.select("vec_id", "embedding").collect().map { r =>
      val x = r.getSeq[Float](1).map(_.toDouble)
      r.getLong(0) -> x.indices.map(i => (x(i) - means(i)) * comp(i)).sum
    }.toMap
    assert(out.size == raw.size)
    out.foreach { case (id, p) =>
      assert(math.abs(p - raw(id)) < 1e-5, s"vec $id: $p vs ${raw(id)}")
    }
    val mean = out.values.sum / out.size
    assert(math.abs(mean) < 1e-4, s"centered projection mean $mean")
  }

  test("q_whiten: coordinates are decorrelated with ~unit variance; pc1 axis matches q_pca_project") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val cells = Similarity.pcaMomentCells(emb, "embedding")
    val (means, comps) = Similarity.pcaTopComponents(cells, k = 2)
    // both Rayleigh values positive (whitening precondition). Strict
    // descent is NOT asserted: the synthetic embeddings are near-
    // isotropic (lambda1 ~ lambda2), and an 8-step iterate — a contract,
    // not a converged eigenvector — can land on a mix whose deflated
    // complement carries marginally more variance. Within 20% of a tie
    // is the expected regime here.
    assert(comps(0)._2 > 0 && comps(1)._2 > 0, s"spectrum ${comps.map(_._2)}")
    assert(comps(1)._2 <= comps(0)._2 * 1.2, s"spectrum ${comps.map(_._2)}")
    // component 1 tracks the single-component contract to the round-9
    // last digit — NOT bit-equal: pcaLeadingComponent sums in decimal
    // (order-independent), pcaTopComponents in fixed-order doubles (the
    // boundary-band-free discipline its oracle replays); both are
    // contracts, each exact against its own replay
    val (_, c1) = Similarity.pcaLeadingComponent(cells)
    comps(0)._1.zip(c1).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 2e-9, s"components diverge: $a vs $b") }
    val w = SparkEntry.queries("q_whiten")(spark, sf())
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val n = w.length.toDouble
    def meanOf(f: ((Double, Double)) => Double) = w.map(f).sum / n
    val (m1, m2) = (meanOf(_._1), meanOf(_._2))
    val v1 = meanOf(t => t._1 * t._1) - m1 * m1
    val v2 = meanOf(t => t._2 * t._2) - m2 * m2
    val cov12 = meanOf(t => t._1 * t._2) - m1 * m2
    // variances ~1 (whitened); cross-correlation bounded (deflation
    // worked — without it v2 ~ v1 and the correlation is ~1). The
    // correlation tolerance is deliberately loose: on this near-tied
    // spectrum the 8-step power iterate decays the off-axis mix by only
    // (lambda2/lambda1)^8 ~ 1, so residual correlation is the expected
    // regime, not a defect (observed ~0.12 at sf0.001).
    assert(math.abs(v1 - 1.0) < 0.05, s"w1 variance $v1")
    assert(math.abs(v2 - 1.0) < 0.05, s"w2 variance $v2")
    assert(math.abs(cov12 / math.sqrt(v1 * v2)) < 0.25, s"w1/w2 correlation ${cov12 / math.sqrt(v1 * v2)}")
  }

  test("q_whiten_stream: the stream-maintained model whitens bit-identically to the batch kernel's") {
    def m(q: String) = SparkEntry.queries(q)(spark, sf())
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m("q_whiten_stream") == m("q_whiten"),
      "streaming-grid model must reproduce the batch whitening exactly")
  }

  test("q_embed_cov_stream: drained cells equal the batch kernel bit-for-bit") {
    val stream = SparkEntry.queries("q_embed_cov_stream")(spark, sf())
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val batch = SparkEntry.queries("q_embed_cov")(spark, sf())
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(stream == batch, "streaming cell grid must equal the batch covariance")
  }

  test("q_pca_var: spectrum report is internally consistent") {
    val r = SparkEntry.queries("q_pca_var")(spark, sf()).collect().head
    val (n, v, tr, ratio) = (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(n > 0 && v > 0.0 && tr > 0.0)
    assert(v <= tr + 1e-6, s"pc1 variance $v cannot exceed the trace $tr")
    assert(math.abs(ratio - v / tr) < 1e-5, s"ratio $ratio vs ${v / tr}")
    // a unit direction's variance is at least the isotropic floor when
    // the iterate tracks the dominant component at all
    assert(ratio >= 1.0 / 64 / 2, s"ratio $ratio below half the isotropic floor")
  }

  test("topEigen on the corpus covariance: residual small, spectrum descending") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val cells = Similarity.embeddingCovariance(emb, "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val m = Array.tabulate(64, 64)((i, j) =>
      cells.getOrElse((math.min(i, j), math.max(i, j)), 0.0))
    val eig = Similarity.topEigen(m, 3)
    assert(eig.map(_._1) == eig.map(_._1).sortBy(-_), s"descending: ${eig.map(_._1)}")
    eig.foreach { case (l, v) =>
      val av = m.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
      val res = math.sqrt(av.zip(v).map { case (x, y) => (x - l * y) * (x - l * y) }.sum)
      // near-isotropic synthetic spectrum converges slowly; the bound
      // asserts the pair is a genuine approximate eigenpair, scale-aware
      assert(res < 1e-3 * math.max(math.abs(l), 1e-9) + 1e-6, s"residual $res for l=$l")
    }
  }
}

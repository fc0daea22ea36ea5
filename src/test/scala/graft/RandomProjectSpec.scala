package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** The JL projection kernel and the projected-candidate ANN cascade:
  * null contract, the distance-preservation property the 100 TB story
  * rests on, and recall of the cascade against exact brute force. */
class RandomProjectSpec extends GraftSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"${sf("sf0.01")}/embeddings.parquet")

  test("null contract: null array, null element, length mismatch all → null") {
    val rows = Seq(
      (1L, Array(1.0, 2.0, 3.0, 4.0)),
      (2L, null.asInstanceOf[Array[Double]]),
      (3L, Array(1.0, 2.0)) // length mismatch vs inDims=4
    ).toDF("id", "v")
      .union(Seq((4L, Array[java.lang.Double](1.0, null, 3.0, 4.0))) // null element
        .toDF("id", "v").select(col("id"), col("v").cast(ArrayType(DoubleType))))
    val got = Similarity.randomProjection(rows, "v", "p", inDims = 4, outDims = 4, tag = "t")
      .select(col("id"), col("p")).collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
  }

  test("kernel matches a hand fold (signs replayed from md5 parity)") {
    val x = Array(0.5, -1.25, 2.0, 3.5)
    val signs = Similarity.rpSigns(4, 4, "t")
    val want = Array.tabulate(4) { j =>
      var acc = 0.0
      (0 until 4).foreach(i => acc += signs(j * 4 + i) * x(i))
      acc * 0.5 // 1/sqrt(4)
    }
    val got = Similarity.randomProjection(
        Seq((1L, x)).toDF("id", "v"), "v", "p", 4, 4, "t")
      .select(col("p")).head.getSeq[Double](0).toArray
    assert(got.sameElements(want), s"${got.toSeq} != ${want.toSeq}")
  }

  test("JL property: pairwise squared L2 distances survive 64→16 within JL noise") {
    // deterministic pair sample: consecutive vec_ids. ε at k=16 is
    // coarse (~0.5 typical), so the bounds are loose — the property
    // under test is "distances are preserved up to JL noise", not
    // precision. Everything here is deterministic: fixed data, fixed
    // md5 signs — this either always passes or always fails.
    val proj = Similarity.randomProjection(emb, "embedding", "p", 64, 16, "16")
      .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"), col("p"))
      .filter(col("vec_id") < 40)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getSeq[Double](2).toArray))
      .sortBy(_._1)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = proj.sliding(2).map { case Array((_, xa, pa), (_, xb, pb)) =>
      d2(pa, pb) / d2(xa, xb)
    }.toArray
    assert(ratios.forall(r => r > 0.2 && r < 3.0),
      s"a pair distorted past JL plausibility: ${ratios.min} .. ${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.3, s"mean distortion $mean drifted from 1")
  }

  test("cascade recall on the noise corpus: above the random floor, deterministic") {
    // the synthetic embeddings are near-orthogonal noise — cosine gaps
    // between rank 3 and rank 50 sit below the k=16 JL error, so
    // corpus-wide recall@3 here IS the noise floor. The pin: measured
    // 0.20 (vs 0.02 for random candidates), stable because everything
    // is deterministic. The production regime (real neighbor structure)
    // is the planted-cluster test below.
    val exact = SparkEntry.queries("q_ann_topk")(spark, sf("sf0.01"))
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("q_ann_proj")(spark, sf("sf0.01"))
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.15, s"recall@3 through the 16-dim candidate stage = $recall")
  }

  test("planted near-dup cluster: the cascade recovers all of it at ranks 1-3") {
    // the regime ANN actually runs in — a tight cluster (cosine ~0.999)
    // over a noise background: all three planted neighbors must fill
    // the query's top-3 through the 16-dim candidate stage at candK=10
    val base = emb.filter(col("vec_id") === 7L)
      .select(col("embedding").cast(ArrayType(DoubleType))).head.getSeq[Double](0).toArray
    def perturb(seed: Int) = base.zipWithIndex.map { case (x, d) =>
      x + 0.02 * ((d * seed + seed) % 5 - 2)
    }
    val planted = Seq(9001, 9002, 9003).map(id => (id.toLong, perturb(id % 100), 0))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast(emb.schema("embedding").dataType),
        col("label"))
    val corpus = emb.select("vec_id", "embedding", "label").union(planted)
    val queries = corpus.filter(col("vec_id") === 7L)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val top = Similarity.projTopK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 3, candK = 10, inDims = 64, outDims = 16)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(top == Set(9001L, 9002L, 9003L), s"cluster not recovered: $top")
  }

  test("clone recovery: an exact duplicate vector is rank 1 through the cascade") {
    val base = emb.filter(col("vec_id") === 7L)
      .select(col("embedding")).head.getSeq[Float](0)
    val clone = Seq((9001L, base.toArray, 0)).toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast(emb.schema("embedding").dataType),
        col("label"))
    val corpus = emb.select("vec_id", "embedding", "label").union(clone)
    val queries = corpus.filter(col("vec_id") === 7L)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val top = Similarity.projTopK(corpus, "vec_id", "embedding",
        queries, "qid", "qvec", k = 3, candK = 10, inDims = 64, outDims = 16)
      .filter(col("rank") === 1).head
    assert(top.getLong(1) == 9001L, s"clone not rank 1: $top")
    assert(top.getDouble(3) == 1.0, s"clone cosine must round to 1.0: $top")
  }
}

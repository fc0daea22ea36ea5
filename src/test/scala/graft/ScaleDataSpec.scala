package graft

import graft.core.VecOps
import org.apache.spark.sql.functions._

/** Invariants of the scaling-curve data generator (SCALE.md "Measured
  * scaling curve"): disjoint keys, within-copy cosine preservation,
  * cross-copy decorrelation of text. */
class ScaleDataSpec extends GraftSpec {
  import spark.implicits._

  test("replicate offsets keys into disjoint ranges, row count scales") {
    val df = Seq((0L, 1L, "a"), (1L, 5L, "b"), (2L, 3L, "c"))
      .toDF("id", "other", "payload")
    val out = ScaleData.replicate(df, "t", Seq("id", "other"), factor = 4)
    assert(out.count() == 12)
    assert(out.select("id").distinct().count() == 12)
    // copy i occupies [i*(max+1), i*(max+1)+max]
    val ids = out.select("id").as[Long].collect().sorted
    assert(ids.toSeq == (0 until 4).flatMap(i => Seq(0L, 1L, 2L).map(_ + i * 3L)))
  }

  test("embedding copies preserve within-copy cosines exactly, decorrelate across copies") {
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, -1.0f, 0.5f)),
      (1L, Array(0.5f, 1.9f, -1.2f, 0.4f)),
      (2L, Array(-1.0f, 0.1f, 2.0f, -0.7f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = ScaleData.replicate(df, "embeddings", Seq("vec_id"), factor = 3)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      VecOps.dot(ad, bd) / (VecOps.norm2(ad) * VecOps.norm2(bd))
    }
    val base = cos(vecs(0)._2, vecs(1)._2)
    // copy 1 = ids 3,4,5; copy 2 = ids 6,7,8 (step = max+1 = 3)
    assert(math.abs(cos(out(3L), out(4L)) - base) < 1e-7, "within-copy cosine must be preserved")
    assert(math.abs(cos(out(6L), out(7L)) - base) < 1e-7)
    // the same vector across copies is NOT identical (signs flipped)
    assert(!out(0L).sameElements(out(3L)))
  }

  test("document copies rewrite every token, preserving within-copy token structure") {
    val df = Seq((0L, "the cat sat"), (1L, "the cat ran")).toDF("doc_id", "text")
    val out = ScaleData.replicate(df, "documents", Seq("doc_id"), factor = 2)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out(2L) == "the_1 cat_1 sat_1")
    assert(out(3L) == "the_1 cat_1 ran_1")
    // cross-copy token overlap is zero; within-copy overlap matches the base
    val (t0, t2) = (out(0L).split(" ").toSet, out(2L).split(" ").toSet)
    assert(t0.intersect(t2).isEmpty)
    assert(out(2L).split(" ").toSet.intersect(out(3L).split(" ").toSet).size == 2)
  }

  test("permute mode: vocabulary FIXED across copies, within-copy structure exact") {
    val df = Seq((0L, "the cat sat"), (1L, "the cat ran")).toDF("doc_id", "text")
    val out = ScaleData.replicate(df, "documents", Seq("doc_id"),
        factor = 3, textMode = "permute")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val srcVocab = Set("the", "cat", "sat", "ran")
    val allVocab = out.values.flatMap(_.split(" ")).toSet
    // the point of the mode: NO vocabulary growth at any factor
    assert(allVocab == srcVocab, s"vocab must stay the source's: $allVocab")
    // bijection preserves within-copy relations: docs 0 and 1 share
    // exactly 2 tokens in every copy (the/cat -> their shifted images)
    Seq((0L, 1L), (2L, 3L), (4L, 5L)).foreach { case (a, b) =>
      assert(out(a).split(" ").toSet.intersect(out(b).split(" ").toSet).size == 2,
        s"within-copy overlap broken for ($a, $b): ${out(a)} | ${out(b)}")
    }
    // copies decorrelate: no token maps to itself (shift has no fixed
    // points below V), so the same source doc never repeats a POSITION
    // across copies — n-gram shingles decorrelate even though tiny-vocab
    // token SETS must overlap by pigeonhole (real vocab >> doc length)
    Seq(2L, 4L).foreach { cid =>
      out(0L).split(" ").zip(out(cid).split(" ")).foreach { case (a, b) =>
        assert(a != b, s"fixed point in copy of doc 0: $a")
      }
    }
    // deterministic: rank order is sorted vocab (cat,ran,sat,the); copy 1
    // maps w -> next rank
    assert(out(2L) == "cat ran the", s"got ${out(2L)}")
  }
}

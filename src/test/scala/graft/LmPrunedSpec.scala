package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Count-pruned broadcastable LM variants vs their exact siblings. */
class LmPrunedSpec extends GraftSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the hat"),
    (3L, "the dog sat on the mat"),
    (4L, "a dog ran to the mat"),
    (5L, "one"), // single token: no bigrams, no output row
    (6L, "zz qq") // a singleton bigram in every position
  ).toDF("doc_id", "text")

  test("minCount=1 reproduces the exact bigram add-1 values bit-for-bit") {
    val exact = TextAnalysis.bigramNll(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    val pruned = TextAnalysis.bigramNllPruned(docs, "text", "doc_id",
        minCount = 1)
      .orderBy("doc_id").collect()
    assert(exact.length == pruned.length && exact.length == 5)
    exact.zip(pruned).foreach { case (e, p) =>
      assert(e.getLong(0) == p.getLong(0) && e.getLong(1) == p.getLong(1))
      assert(e.getDouble(2) == p.getDouble(2), s"doc ${e.getLong(0)}")
    }
  }

  test("minCount=1 reproduces the exact Kneser-Ney values bit-for-bit") {
    val exact = TextAnalysis.kneserNeyNll(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    val pruned = TextAnalysis.kneserNeyNllPruned(docs, "text", "doc_id",
        minCount = 1)
      .orderBy("doc_id").collect()
    assert(exact.length == pruned.length && exact.length == 5)
    exact.zip(pruned).foreach { case (e, p) =>
      assert(e.getLong(0) == p.getLong(0) && e.getLong(1) == p.getLong(1))
      assert(e.getDouble(2) == p.getDouble(2), s"doc ${e.getLong(0)}")
    }
  }

  test("pruned singleton bigrams score the documented backoff formula") {
    // doc 6 = "zz qq": one bigram, count 1 -> pruned at minCount=2.
    // add-1 backoff: nll = ln(c1(zz) + V); c1(zz) = 1, V = distinct words
    val uni = docs.select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val v = uni.size.toDouble
    val want = math.log(uni("zz") + v)
    val got = TextAnalysis.bigramNllPruned(docs, "text", "doc_id", minCount = 2)
      .filter(col("doc_id") === 6L).head()
    assert(got.getLong(1) == 1L)
    assert(got.getDouble(2) == math.rint(want * 1e6) / 1e6 ||
      math.abs(got.getDouble(2) - want) < 1e-6,
      s"got ${got.getDouble(2)} want ~$want")
  }

  test("pruned KN singleton scores a(w1)+b(w2) continuation backoff") {
    // doc 6's bigram (zz,qq): a = -ln(D*fwd(zz)/cv(zz)), fwd=cv=1 ->
    // a = -ln(0.75); b = -ln(bwd(qq)/tt) with bwd(qq)=1
    val tt = docs.select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .count() // not tt, just sanity that corpus is non-trivial
    assert(tt > 10)
    val biTypes = 14.0 // hand count below
    // bigram types: the-cat, cat-sat, sat-on, on-the, the-mat, the-hat,
    // the-dog, dog-sat, a-dog, dog-ran, ran-to, to-the, zz-qq = 13
    val types = 13.0
    val want = -math.log(0.75) + -math.log(1.0 / types)
    val got = TextAnalysis.kneserNeyNllPruned(docs, "text", "doc_id",
        minCount = 2)
      .filter(col("doc_id") === 6L).head()
    assert(got.getLong(1) == 1L)
    assert(math.abs(got.getDouble(2) - want) < 1e-6,
      s"got ${got.getDouble(2)} want ~$want (types=$types, unused=$biTypes)")
  }

  test("maxModelRows fail-fast fires before a mis-sized broadcast") {
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bigramNllPruned(docs, "text", "doc_id", minCount = 1,
        maxModelRows = 2L).count()
    }
    assert(e.getMessage.contains("maxModelRows"))
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.kneserNeyNllPruned(docs, "text", "doc_id", minCount = 1,
        maxModelRows = 2L).count()
    }
    assert(e2.getMessage.contains("maxModelRows"))
  }

  test("scoring plan broadcasts the model: no bigram-keyed token shuffle") {
    val q = TextAnalysis.kneserNeyNllPruned(docs, "text", "doc_id", minCount = 2)
    q.collect() // materialize so AQE finalizes
    val plan = q.queryExecution.executedPlan.toString
    // every join on the scoring path must be a broadcast join; the only
    // sort-merge/shuffled-hash joins allowed are NONE (model build is
    // staged at build time, not in this plan)
    assert(!plan.contains("SortMergeJoin"), plan.take(4000))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("EXACT ops cross into broadcast when the type table fits (adaptive)") {
    Seq(
      TextAnalysis.bigramNll(docs, "text", "doc_id"),
      TextAnalysis.kneserNeyNll(docs, "text", "doc_id"),
      TextAnalysis.unigramNll(docs, "text", "doc_id")
    ).foreach { q =>
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        "small-vocab exact LM must broadcast its staged model:\n" + plan.take(3000))
      assert(plan.contains("BroadcastHashJoin"))
    }
  }
}

package graft

import graft.functions.HashTfLinearMargin
import graft.operators.{Dedup, QualityClassifier}
import org.apache.spark.sql.functions._

/** Hash-TF linear classifier: expression semantics, codegen/interpreted
  * parity, and the model-DataFrame bridge. */
class ClassifierSpec extends GraftSpec {
  import spark.implicits._

  private val dim = 64
  private val w = QualityClassifier.syntheticWeightsMilli(dim)

  /** Independent reimplementation of the margin (plain Scala). */
  private def refMargin(text: String, bias: Double): Double = {
    val toks = Dedup.wsPattern.split(text.toLowerCase)
    val sum = toks.map(t => w((Dedup.md5LongJvm(t) % dim).toInt)).sum
    sum / 1000.0 / toks.length + bias
  }

  private val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "spark engines shuffle data across executors"),
    (3L, "x"),
    (4L, ""),                       // empty text: one empty token, n = 1
    (5L, "MIXED Case TOKENS here")).toDF("doc_id", "text")

  test("margin matches an independent reimplementation on every doc") {
    val got = docs.select($"doc_id",
        HashTfLinearMargin($"text", w, 0.1).as("m"))
      .as[(Long, Double)].collect().toMap
    val texts = Map(1L -> "the quick brown fox",
      2L -> "spark engines shuffle data across executors",
      3L -> "x", 4L -> "", 5L -> "MIXED Case TOKENS here")
    texts.foreach { case (id, t) =>
      assert(got(id) == refMargin(t, 0.1), s"doc $id: got ${got(id)}")
    }
  }

  test("codegen and interpreted paths agree bit-for-bit") {
    val expr = HashTfLinearMargin($"text", w, 0.1).as("m")
    val on = docs.select(expr).as[Double].collect().toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val off = docs.select(expr).as[Double].collect().toSeq
      assert(on == off)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null text yields null margin and null label") {
    val withNull = Seq((1L, "some text"), (2L, null)).toDF("doc_id", "text")
    val out = QualityClassifier.classify(withNull, "text", "doc_id", w, 0.1)
      .orderBy("doc_id").collect()
    assert(!out(0).isNullAt(1) && !out(0).isNullAt(2))
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }

  test("model-DataFrame entry equals the primitive-array entry") {
    val viaArray = QualityClassifier.classify(docs, "text", "doc_id", w, 0.1)
      .orderBy("doc_id").collect().toSeq
    val viaModel = QualityClassifier.classifyWithModel(docs, "text", "doc_id",
      QualityClassifier.weightsDF(spark, w), 0.1).orderBy("doc_id").collect().toSeq
    assert(viaArray == viaModel)
  }

  test("label thresholds the unrounded margin; synthetic weights are in range") {
    assert(w.forall(v => v >= -1000L && v <= 1000L))
    // a tiny negative margin must stay label 0 even when it ROUNDS to -0.0
    val tiny = Seq((1L, "a")).toDF("doc_id", "text")
    val b = -(w((Dedup.md5LongJvm("a") % dim).toInt) / 1000.0) - 1e-9
    val r = QualityClassifier.classify(tiny, "text", "doc_id", w, b).head()
    assert(r.getInt(2) == 0, s"margin ${r.getDouble(1)} must not flip label")
  }

  test("DSIR: target-exclusive tokens weigh positive, raw-exclusive negative") {
    val corpus = Seq(
      (1L, "ml ml ml training data", "target"),
      (2L, "ml training corpora rock", "target"),
      (3L, "spam spam spam buy now", "web"),
      (4L, "click here buy spam now", "web")).toDF("doc_id", "text", "src")
    val d = 128
    val (wts, (nt, nr)) = QualityClassifier.dsirWeightsMilli(
      corpus, "text", col("src") === "target", dim = d)
    assert(nt == 9 && nr == 19, s"token totals ($nt, $nr)")
    def wOf(t: String) = wts((Dedup.md5LongJvm(t) % d).toInt)
    // hand-check 'ml': ct=4, cr=4 -> ln(((4+1)/(9+128))/((4+1)/(19+128)))
    val expMl = math.floor(1000.0 * math.log(
      ((4 + 1.0) / (9 + 1.0 * d)) / ((4 + 1.0) / (19 + 1.0 * d))) + 0.5).toLong
    assert(wOf("ml") == expMl && wOf("ml") > 0, s"ml weight ${wOf("ml")}")
    assert(wOf("spam") < 0, s"raw-only token must weigh negative: ${wOf("spam")}")
    // unseen-bucket prior: ct=cr=0 ratio, positive here (nr > nt)
    val unseen = wts((Dedup.md5LongJvm("zzz_unseen") % d).toInt)
    assert(unseen == math.floor(1000.0 * math.log(
      (19 + 1.0 * d) / (9 + 1.0 * d)) + 0.5).toLong)
    val scores = QualityClassifier.dsirScore(corpus, "text", "doc_id", wts)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toMap
    // target docs lean positive, spam docs negative
    assert(scores(1L)._3 == 1 && scores(3L)._3 == 0, s"got $scores")
    assert(scores(1L)._1 == 5 && scores(3L)._1 == 5)
    assert(scores(1L)._2 > scores(3L)._2)
  }
}

package graft

import graft.functions.{Blocklist, BlocklistHits}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Moore–Lewis selection, JS drift, and the blocklist kernel: hand-checked
  * semantics on tiny corpora plus the null/codegen conventions. */
class SelectionSpec extends GraftSpec {
  import spark.implicits._

  test("mooreLewis: in-domain-like docs score negative and are selected") {
    // in-domain (flag) speaks 'aa bb'; out-domain speaks 'zz yy'. A pure
    // in-domain doc must get ce_diff < 0 (selected), a pure out-domain
    // doc ce_diff > 0, and the mixed doc sits between them.
    val df = Seq(
      (1L, "aa bb aa bb", true), (2L, "aa bb bb aa", true),
      (3L, "zz yy zz yy", false), (4L, "aa zz", false)
    ).toDF("doc_id", "text", "ind")
    val got = TextAnalysis.mooreLewis(df, "text", "doc_id", col("ind"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getBoolean(3), r.getLong(1)))).toMap
    assert(got(1L)._3 == 4L)
    assert(got(1L)._1 < 0 && got(1L)._2, s"pure in-domain doc: ${got(1L)}")
    assert(got(3L)._1 > 0 && !got(3L)._2, s"pure out-domain doc: ${got(3L)}")
    assert(got(1L)._1 < got(4L)._1 && got(4L)._1 < got(3L)._1,
      s"mixed doc must rank between: $got")
    // docs 1 and 2 are permutations of the same bag -> identical scores
    assert(got(1L)._1 == got(2L)._1)
  }

  test("mooreLewis: unseen-in-domain tokens take smoothing mass, not a drop") {
    // 'qq' never appears in-domain; the left join + add-1 smoothing must
    // still score the doc over ALL its tokens
    val df = Seq(
      (1L, "aa aa", true), (2L, "qq qq qq", false)
    ).toDF("doc_id", "text", "ind")
    val got = TextAnalysis.mooreLewis(df, "text", "doc_id", col("ind"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 3L))
  }

  test("doremiWeights: learnable domain upweighted over its token share; weights normalize") {
    // dom A: repetitive bigram structure (unigram poor, bigram sharp) —
    // high excess, the hard-but-learnable signal. dom B: the same
    // unigram bag shuffled per-doc so bigram context buys little.
    // dom C: one word, both models nail it — excess ~ 0.
    val docs = Seq(
      (1L, "a", "x y x y x y x y"), (2L, "a", "y x y x y x y x"),
      (3L, "b", "x x y y x y y x"), (4L, "b", "y y x x y x x y"),
      (5L, "c", "z z z z z z z z"), (6L, "c", "z z z z z z z z")
    ).toDF("doc_id", "source", "text")
    val w = TextAnalysis.doremiWeights(docs, "text", "doc_id", col("source"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(w.size == 3)
    val milliSum = w.values.map(_._3).sum
    assert(math.abs(milliSum - 1000L) <= w.size,
      s"milli-weights must normalize (got $milliSum)")
    w.values.foreach { case (_, ex, _) => assert(ex >= 0.0, s"excess $ex < 0") }
    // a and b share the same unigram bag; a's deterministic alternation
    // concentrates its bigram mass (context predicts), b's shuffle
    // spreads it — so a is the more bigram-learnable domain. (c, the
    // single-token domain, is ALSO high-excess: z→z is near-certain
    // where the unigram model spreads over the vocabulary — the add-1
    // smoothing arithmetic, worth remembering when reading real runs.)
    assert(w("a")._2 > w("b")._2, "structured domain must out-excess the shuffled one")
    // equal token shares => the weight ordering IS the excess ordering
    val shares = w.values.map(_._1).toSeq
    assert(shares.distinct.size == 1, s"fixture should have equal shares: $shares")
    assert(w("a")._3 > w("b")._3,
      "higher-excess domain must take more of the mixture at equal share")
  }

  test("jsDivergence: a group distributed like the corpus scores exactly 0") {
    // two groups with IDENTICAL token bags -> each equals the corpus
    // distribution -> every ln(1) term is exactly 0.0, no rounding needed
    val df = Seq(
      ("s1", "aa bb cc"), ("s2", "aa bb cc")
    ).toDF("src", "text")
    val got = TextAnalysis.jsDivergence(df, "text", col("src"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == Map("s1" -> 0.0, "s2" -> 0.0))
  }

  test("jsDivergence: drifted groups score in (0, ln 2], symmetric, hand-computed") {
    val df = Seq(
      ("s1", "aa aa aa aa"), ("s2", "zz zz zz zz")
    ).toDF("src", "text")
    val got = TextAnalysis.jsDivergence(df, "text", col("src"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val ln2 = math.log(2.0)
    got.values.foreach { js =>
      assert(js > 0 && js <= ln2 + 1e-9, s"JS out of bounds: $got")
    }
    // each disjoint half vs the corpus MIXTURE (not vs the other half):
    // JS = 0.5·[ln(4/3) + 0.5·ln(2/3)] + 0.25·ln 2 = 0.21576155…
    val want = 0.5 * (math.log(4.0 / 3) + 0.5 * math.log(2.0 / 3)) + 0.25 * ln2
    got.values.foreach(js => assert(math.abs(js - want) < 1e-6, s"$got want $want"))
    assert(got("s1") == got("s2"), s"symmetric corpora must tie: $got")
  }

  test("blocklist kernel: leftmost non-overlapping counts, hand-checked") {
    def counts(t: String): Seq[Long] = {
      val a = Blocklist.hitCounts(org.apache.spark.unsafe.types.UTF8String.fromString(t))
      (0 until a.numElements()).map(a.getLong(_))
    }
    assert(Blocklist.patterns.head == "hash join")
    assert(counts("hash join then HASH JOIN") == Seq(2L, 0L, 0L, 0L, 0L))
    assert(counts("big data big data") == Seq(0L, 0L, 0L, 0L, 2L))
    // adjacent occurrences sharing no chars both count; no pattern found -> 0s
    assert(counts("table scantable scan") == Seq(0L, 2L, 0L, 0L, 0L))
    assert(counts("nothing here") == Seq(0L, 0L, 0L, 0L, 0L))
  }

  test("blocklist expression: codegen projection, null text is null") {
    val df = Seq((1L, "a hash join b"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"), BlocklistHits(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got == Map(1L -> false, 2L -> true))
    val p = df.select(BlocklistHits(col("text"))).queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), p)
  }

  test("zipfFit: a perfect power law recovers its slope with r2 ~ 1") {
    // freq(term_r) = floor(1000 / r): close to slope -1 in the head
    val docs = (1 to 12).flatMap { r =>
      Seq.fill(1000 / r)(s"t$r")
    }.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val row = TextAnalysis.zipfFit(docs, "text", topK = 12).collect().head
    assert(row.getLong(0) == 12L)
    val (slope, r2) = (row.getDouble(1), row.getDouble(3))
    assert(math.abs(slope - (-1.0)) < 0.01, s"slope $slope")
    assert(r2 > 0.999, s"r2 $r2")
  }

  test("zipfFit: a uniform corpus reports a flat slope (the health signal)") {
    val docs = (1 to 10).map(i => (i.toLong, s"w$i")).toDF("doc_id", "text")
    val row = TextAnalysis.zipfFit(docs, "text", topK = 10).collect().head
    assert(math.abs(row.getDouble(1)) < 1e-9, s"uniform corpus must fit flat: $row")
  }

  test("q_domain_filter: relative bar splits sources, gate is per-source") {
    val rows = SparkEntry.queries("q_domain_filter")(spark, sf()).collect()
    assert(rows.nonEmpty)
    // every doc of one source carries the same source_quality and verdict
    val bySrc = rows.groupBy(_.getString(1))
    bySrc.foreach { case (_, rs) =>
      assert(rs.map(_.getDouble(2)).distinct.length == 1)
      assert(rs.map(_.getBoolean(4)).distinct.length == 1)
    }
    // the relative bar drops at least one source and keeps at least one
    val verdicts = bySrc.map { case (_, rs) => rs.head.getBoolean(4) }.toSet
    assert(verdicts == Set(true, false), s"bar must split sources: $verdicts")
  }

  test("kneserNeyNll: matches an independent in-memory replication; short docs drop") {
    val docs = Seq(
      (1L, "a b a b a c"), (2L, "b a c a"), (3L, "only"), (4L, "a b")
    ).toDF("doc_id", "text")
    // independent replication of the interpolated-KN formula
    val texts = Map(1L -> "a b a b a c", 2L -> "b a c a", 4L -> "a b")
    def bigrams(t: String) = t.split("\\s+").sliding(2).map(a => (a(0), a(1))).toSeq
    val all = texts.values.flatMap(bigrams).toSeq
    val cb = all.groupBy(identity).map { case (k, v) => k -> v.size.toDouble }
    val cv = all.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    val fwd = cb.keys.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    val bwd = cb.keys.groupBy(_._2).map { case (k, v) => k -> v.size.toDouble }
    val tt = cb.size.toDouble
    def p(v: String, w: String) =
      math.max(cb((v, w)) - 0.75, 0.0) / cv(v) + 0.75 * fwd(v) / cv(v) * (bwd(w) / tt)
    def meanNll(t: String) = {
      val bs = bigrams(t)
      BigDecimal(bs.map(b => -math.log(p(b._1, b._2)))
        .map(x => BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
        .toDouble / bs.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = TextAnalysis.kneserNeyNll(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(!got.contains(3L), "a 1-token doc has no bigrams and must emit no row")
    texts.foreach { case (id, t) =>
      assert(got(id)._1 == bigrams(t).size)
      assert(math.abs(got(id)._2 - meanNll(t)) < 2e-6, s"doc $id: ${got(id)} vs ${meanNll(t)}")
    }
  }

  test("q_curate7: survivors pass all three gates (domain bar, ML<0, zero hits)") {
    val surv = SparkEntry.queries("q_curate7")(spark, sf()).collect()
    assert(surv.nonEmpty, "the composed funnel must keep something at sf0.001")
    // every survivor is from a kept source and carries a negative ce_diff
    val kept = SparkEntry.queries("q_domain_filter")(spark, sf())
      .filter(col("kept")).select("source").distinct()
      .collect().map(_.getString(0)).toSet
    val blocked = SparkEntry.queries("q_blocklist")(spark, sf())
      .filter(col("n_hits") >= 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    surv.foreach { r =>
      assert(kept.contains(r.getString(1)), s"survivor from dropped source: $r")
      assert(r.getDouble(2) < 0, s"survivor with non-negative ce_diff: $r")
      assert(!blocked.contains(r.getLong(0)), s"survivor with blocklist hits: $r")
    }
  }

  test("q_blocklist / q_bpe_fertility query semantics on the tiny sf") {
    val bl = SparkEntry.queries("q_blocklist")(spark, sf()).collect()
    assert(bl.nonEmpty)
    bl.foreach { r =>
      val (hits, pats, blocked) = (r.getLong(1), r.getLong(2), r.getBoolean(3))
      assert(pats <= hits && pats <= Blocklist.patterns.length)
      assert(blocked == (hits >= 1))
    }
    val f = SparkEntry.queries("q_bpe_fertility")(spark, sf()).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      // fertility (tokens/word) is positive and bounded by the longest
      // word; compression is >= 1 char per token minus the whitespace
      // the token sequence never carries
      assert(r.getDouble(5) > 0.0, s"fertility <= 0: $r")
      assert(r.getDouble(6) >= 1.0, s"chars/token < 1: $r")
    }
  }
}

package graft

import graft.operators.{AHP, Apriori, FCM, Joins, Quantiles, Topsis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5): random inputs, structural truths.
  * Spark jobs per case are expensive — a handful of seeded samples per
  * property (the scalatestplus bridge is not in the offline cache, so
  * sampling is driven directly off scalacheck Gens). */
class PropertySpec extends GraftSpec {
  import spark.implicits._

  /** Run `f` over `n` deterministic samples of `g`. */
  private def forSamples[T](g: Gen[T], n: Int = 5)(f: T => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default.withSize(12), Seed(1000L + i))
        .foreach(f)
    }

  private val rowGen = Gen.listOfN(4, Gen.choose(0.1, 100.0))
  private val dataGen = Gen.choose(4, 15).flatMap(n => Gen.listOfN(n, rowGen))

  test("quantize12 fast path matches the BigDecimal reference everywhere") {
    import graft.operators.KMeansDet
    // adversarial grid: exact scale-12 half-boundaries k.5e-12, their
    // float-origin neighbours, and broad random magnitudes
    val gens = Seq(
      Gen.choose(-1000000L, 1000000L).map(k => (2 * k + 1) / 2.0 * 1e-12),
      Gen.choose(-1e-6, 1e-6), Gen.choose(-1.0, 1.0),
      Gen.choose(-1e5, 1e5), Gen.choose(-999999.0, 999999.0),
      Gen.choose(-1f, 1f).map(_.toDouble))
    gens.foreach { g =>
      forSamples(g, n = 500) { x =>
        assert(KMeansDet.quantize12(x) == KMeansDet.quantize12Exact(x),
          s"fast path diverges at $x")
      }
    }
  }

  test("TOPSIS scores always land in [0,1] for type-1/2 criteria") {
    forSamples(dataGen) { data =>
      val df = data.map(r => Tuple1(r.toArray)).toDF("features")
      val scores = Topsis.score(df, "features", Array(0.4, 0.3, 0.2, 0.1),
        Array(1, 2, 1, 2), 0.0, Array(0.0, 0.0), "score")
        .select("score").as[Double].collect()
      scores.foreach { s =>
        assert(s.isNaN || (s >= -1e-9 && s <= 1.0 + 1e-9), s"score $s out of range")
      }
    }
  }

  test("AHP score is invariant under row permutation") {
    val judgment = Array(
      Array(1.0, 2.0, 4.0, 8.0), Array(0.5, 1.0, 2.0, 4.0),
      Array(0.25, 0.5, 1.0, 2.0), Array(0.125, 0.25, 0.5, 1.0))
    forSamples(dataGen) { data =>
      val cols = Array("a", "b", "c", "d")
      def score(rows: List[List[Double]]): Map[List[Double], Double] = {
        val df = rows.map { case List(a, b, c, d) => (a, b, c, d) }.toDF(cols: _*)
        AHP.score(df, cols, judgment, Array(1, 1, 0, 0), "s").collect()
          .map(r => List(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)) -> r.getDouble(4))
          .toMap
      }
      val fwd = score(data)
      val rev = score(data.reverse)
      fwd.foreach { case (k, v) =>
        val w = rev(k)
        assert((v.isNaN && w.isNaN) || math.abs(v - w) < 1e-9,
          s"row-order dependence: $v vs $w")
      }
    }
  }

  test("FCM membership vectors sum to 1 and predictions are in [0,k)") {
    forSamples(Gen.zip(Gen.choose(5, 12), Gen.choose(2, 4))) { case (n, k) =>
      val rng = new java.util.Random(n * 31 + k)
      val data = List.fill(n)(Array(rng.nextDouble() * 10, rng.nextDouble() * 10))
      val df = data.map(Tuple1(_)).toDF("features")
      val model = new FCM().setK(k).setMaxIter(5).setSeed(1).fit(df)
      val m = model.membershipMatrix(df)
        .select("membership").collect()
        .map(_.getAs[scala.collection.Seq[Double]](0))
      m.foreach(u => assert(math.abs(u.sum - 1.0) < 1e-9))
      val preds = model.transform(df).select("prediction").as[Int].collect()
      preds.foreach(p => assert(p >= 0 && p < k))
    }
  }

  test("exactQuantiles equals sorted-pick for random data, ps, and duplicates") {
    val valGen = for {
      n <- Gen.choose(5, 60)
      // small value domain forces heavy duplicates
      vs <- Gen.listOfN(n, Gen.choose(1, 8).map(_.toDouble))
      ps <- Gen.listOfN(3, Gen.choose(0.0, 1.0))
    } yield (vs, ps)
    forSamples(valGen) { case (vs, ps) =>
      val got = Quantiles.exactQuantiles(vs.map(Tuple1(_)).toDF("x"), "x", ps,
          bins = 4, collectThreshold = 3)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      val sorted = vs.sorted
      ps.foreach { p =>
        val want = sorted(math.max(1, math.ceil(p * vs.length).toInt) - 1)
        assert(got(p) == want, s"p=$p vals=$vs")
      }
    }
  }

  test("asofBackward equals per-row brute-force argmax on random streams") {
    val evGen = for {
      nl <- Gen.choose(1, 12)
      nr <- Gen.choose(0, 12)
      ls <- Gen.listOfN(nl, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 50L)))
      rs <- Gen.listOfN(nr, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 50L)))
      tol <- Gen.choose(5L, 60L)
    } yield (ls, rs, tol)
    forSamples(evGen) { case (ls, rs, tol) =>
      val l = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("id", "key", "tms")
      val r = rs.zipWithIndex.map { case ((k, t), i) => (k, t, i.toDouble) }
        .toDF("key", "rtms", "value")
      val got = Joins.asofBackward(l, r, Seq("key"), "tms", "rtms",
          Seq("value"), tol)
        .collect().map(row => row.getAs[Long]("id") ->
          Option(row.get(row.fieldIndex("matched_time"))).map(_.asInstanceOf[Long]))
        .toMap
      ls.zipWithIndex.foreach { case ((k, t), i) =>
        val want = rs.filter(x => x._1 == k && x._2 <= t && t - x._2 <= tol)
          .map(_._2).sorted.lastOption
        assert(got(i.toLong) == want, s"left ($k,$t) rights=$rs tol=$tol")
      }
    }
  }

  test("packSequences equals brute-force concat-and-chunk on random corpora") {
    val gen = for {
      n <- Gen.choose(1, 20)
      toks <- Gen.listOfN(n, Gen.choose(0L, 40L))
      seqLen <- Gen.choose(1L, 25L)
    } yield (toks, seqLen)
    forSamples(gen) { case (toks, seqLen) =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "tok")
      val got = graft.operators.Sampling
        .packSequences(df, col("id"), col("tok"), seqLen,
          nBlocks = 4, blockRows = 3L) // force the two-phase path
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("seq_id"),
          r.getAs[Long]("seq_offset"), r.getAs[Long]("doc_offset"),
          r.getAs[Long]("slice_len"))).toSet
      // brute force: walk the token stream in id order
      var cum = 0L
      val want = toks.zipWithIndex.flatMap { case (t, i) =>
        val prev = cum; cum += t
        if (t == 0) Nil
        else (prev / seqLen to (cum - 1) / seqLen).map { s =>
          val start = math.max(prev, s * seqLen)
          val end = math.min(cum, (s + 1) * seqLen)
          (i.toLong, s, start - s * seqLen, start - prev, end - start)
        }
      }.toSet
      assert(got == want, s"toks=$toks seqLen=$seqLen")
    }
  }

  test("removeBoilerplateLines equals brute-force hot-line filtering") {
    val lineGen = Gen.choose(0, 3).map(i => s"L$i") // tiny line alphabet
    val gen = for {
      n <- Gen.choose(2, 10)
      docs <- Gen.listOfN(n, Gen.choose(1, 4).flatMap(Gen.listOfN(_, lineGen)))
      minDocs <- Gen.choose(2, 4)
    } yield (docs, minDocs)
    forSamples(gen) { case (docLines, minDocs) =>
      val df = docLines.zipWithIndex
        .map { case (ls, i) => (i.toLong, ls.mkString("\n")) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup
        .removeBoilerplateLines(df, "text", "doc_id", minDocs = minDocs)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
        .toMap
      val hot = docLines.flatMap(_.distinct).groupBy(identity)
        .filter(_._2.size >= minDocs).keySet
      docLines.zipWithIndex.foreach { case (ls, i) =>
        val kept = ls.filterNot(hot)
        if (kept.isEmpty) assert(!got.contains(i.toLong), s"doc $i should vanish")
        else assert(got(i.toLong) ==
          (kept.mkString("\n"), kept.size.toLong, (ls.size - kept.size).toLong),
          s"doc $i lines=$ls hot=$hot")
      }
    }
  }

  test("Apriori support anti-monotonicity: subset support >= superset support") {
    val txGen = Gen.choose(3, 8).flatMap(n => Gen.listOfN(n,
      Gen.someOf("A", "B", "C", "D").map(_.toList.sorted)))
      .map(_.filter(_.nonEmpty))
    forSamples(txGen) { txs =>
      if (txs.nonEmpty) {
        val df = txs.map(_.mkString("/")).toDF("items")
        val out = new Apriori().setMinSupport(0.01).setMinConfidence(0.0)
          .setLift(0.0).setItemSeparator("/").setInputCols("items")
          .transform(df)
        val sup = out.collect()
          .map(r => r.getAs[scala.collection.Seq[String]](0).toSet -> r.getDouble(2))
          .toMap
        for ((s1, v1) <- sup; (s2, v2) <- sup if s1.subsetOf(s2) && s1 != s2)
          assert(v1 >= v2 - 1e-12,
            s"anti-monotonicity violated: $s1=$v1 < $s2=$v2")
      }
    }
  }

  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    (8, Gen.alphaNumChar), (3, Gen.const(' ')), (1, Gen.const('\t')),
    (1, Gen.const('\n')), (1, Gen.choose(0.toChar, 31.toChar)),
    (1, Gen.const('')), (2, Gen.oneOf('.', ',', '!', 'Ä', 'ß'))))
    .map(_.mkString)

  test("normalizeText is idempotent and leaves only single spaces") {
    forSamples(Gen.listOfN(8, textGen), n = 4) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val once = graft.operators.TextAnalysis.normalizeText(col("text"))
      val norm = df.select(col("id"), once.as("n1")).withColumn("n2",
        graft.operators.TextAnalysis.normalizeText(col("n1")))
        .collect()
      norm.foreach { r =>
        val (n1, n2) = (r.getString(1), r.getString(2))
        assert(n1 == n2, s"not idempotent: '$n1' -> '$n2'")
        assert(!n1.exists(c => c.isControl || c == ''), s"control char survives: '$n1'")
        assert(!n1.contains("  ") && n1 == n1.trim, s"whitespace not canonical: '$n1'")
        assert(n1 == n1.toLowerCase, s"not casefolded: '$n1'")
      }
    }
  }

  test("noveltyScores: per-shingle novelty mass sums to the distinct-shingle count") {
    // every distinct shingle is novel in EXACTLY one doc (its min-id
    // holder), so sum(n_novel) == |distinct shingles| and each doc's
    // n_novel <= n_shingles — for any corpus
    // trailing-whitespace note: the fused kernels follow Java split
    // semantics (trailing empty tokens dropped) while the Column-form
    // hashedTokens used for the expectation keeps them — trim to compare
    // on the shared convention (corpus text is trimmed by contract)
    forSamples(Gen.listOfN(8, textGen), n = 4) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t.trim) }.toDF("id", "text")
      val out = graft.operators.Dedup.noveltyScores(df, "text", "id", shingleN = 2)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      val distinctShingles = df
        .select(org.apache.spark.sql.functions.explode(
          graft.operators.Dedup.hashedTokens(col("text"), 2)).as("sh"))
        .distinct().count()
      assert(out.map(_._2).sum == distinctShingles,
        s"novel mass ${out.map(_._2).sum} != $distinctShingles distinct shingles")
      out.foreach { case (n, novel) => assert(novel >= 0 && novel <= n) }
    }
  }

  test("weightedTake: uniform weights reduce to the pure-hash order; n caps at corpus") {
    forSamples(Gen.listOfN(30, Gen.choose(0L, 1000000L)), n = 4) { rawIds =>
      val ids = rawIds.distinct
      val df = ids.map(Tuple1(_)).toDF("id")
        .withColumn("w", org.apache.spark.sql.functions.lit(1.0))
      val take = graft.operators.Sampling.weightedTake(df, col("id"), col("w"), n = 10)
        .select("id").as[Long].collect()
      assert(take.length == math.min(10, ids.length))
      // with w == 1 the score is ln(u): ranking is by the raw hash u desc
      val expected = ids.map(id => id ->
        (graft.operators.Dedup.md5LongJvm(id.toString) % graft.operators.Dedup.P))
        .sortBy { case (id, h) => (-h, id) }.take(10).map(_._1)
      assert(take.toSeq == expected.toSeq, s"got ${take.toSeq} want $expected")
    }
  }

  test("semDedup: permutation-invariant verdicts; exact clones never both kept") {
    forSamples(Gen.listOfN(10, Gen.listOfN(4, Gen.choose(-1.0, 1.0))), n = 3) { vs =>
      val vecs = vs.zipWithIndex.map { case (v, i) =>
        (i.toLong, v.map(_.toFloat).toArray) }
      val withClone = vecs :+ (99L, vecs.head._2.clone) // clone of id 0
      def run(rows: Seq[(Long, Array[Float])]) =
        graft.operators.Dedup.semDedup(
          rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
          tau = 0.999, targetClusterSize = 4)
          .collect().map(r => (r.getLong(0), r.getInt(3))).sortBy(_._1)
      val a = run(withClone)
      val b = run(scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).shuffle(withClone))
      assert(a.toSeq == b.toSeq, "row order must not change verdicts")
      val kept = a.filter(_._2 == 1).map(_._1).toSet
      assert(kept.contains(0L) && !kept.contains(99L),
        s"clone must drop to its lowest id; kept = $kept")
    }
  }

  test("hashSplit covers every row with exactly one of the three labels") {
    forSamples(Gen.listOfN(60, Gen.choose(0L, 1000000L)), n = 4) { ids =>
      val df = ids.distinct.map(Tuple1(_)).toDF("id")
      val labeled = df.select(col("id"),
        graft.operators.Sampling.hashSplit(col("id"), 80, 10).as("split"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(labeled.forall(l => Set("train", "val", "test")(l._2)))
      // determinism: the same ids relabel identically
      val again = df.select(col("id"),
        graft.operators.Sampling.hashSplit(col("id"), 80, 10).as("split"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(labeled.sortBy(_._1).sameElements(again.sortBy(_._1)))
    }
  }

  test("RealCodecs WAV: arbitrary PCM16 round-trips exactly, any length incl. empty") {
    import graft.operators.Multimodal.RealCodecs
    val wavGen = for {
      n <- Gen.choose(0, 120)
      ss <- Gen.listOfN(n, Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
      rate <- Gen.oneOf(8000, 16000, 44100)
    } yield (ss.map(_.toShort).toArray, rate)
    forSamples(wavGen, n = 10) { case (ss, rate) =>
      val Some((m, back)) = RealCodecs.decodeWavPcm16(
        RealCodecs.encodeWavPcm16(ss, rate))
      assert(m.sampleRate == rate && m.nSamples == ss.length)
      assert(back.toSeq == ss.toSeq, "samples must round-trip bit-exactly")
    }
  }

  test("sourceCap: per-source counts = min(n, cap), kept set is a subset, caps sublinear") {
    import graft.operators.Sampling
    val corpGen = for {
      nSrc <- Gen.choose(1, 5)
      sizes <- Gen.listOfN(nSrc, Gen.choose(1, 40))
    } yield sizes
    forSamples(corpGen, n = 6) { sizes =>
      val rows = sizes.zipWithIndex.flatMap { case (sz, s) =>
        (0 until sz).map(i => (s * 1000L + i, s"s$s"))
      }
      val df = rows.toDF("doc_id", "source")
      val got = Sampling.sourceCap(df, col("source"), col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(got.map(_._1).toSet.subsetOf(rows.map(_._1).toSet))
      val bySrc = got.groupBy(_._2).view.mapValues(_.length).toMap
      sizes.zipWithIndex.foreach { case (sz, s) =>
        val cap = math.max(2L, math.ceil(math.sqrt(sz.toDouble)).toLong)
        assert(bySrc.getOrElse(s"s$s", 0) == math.min(sz.toLong, cap).toInt,
          s"source s$s size $sz cap $cap got ${bySrc.get(s"s$s")}")
        // the emitted cap column agrees with the formula
        got.filter(_._2 == s"s$s").foreach { case (_, _, c) => assert(c == cap) }
      }
    }
  }

  test("unimaxAllocation: never over budget, never over epochs, exhausts the binding constraint") {
    import graft.operators.Sampling
    val gen = for {
      nl <- Gen.choose(1, 6)
      ns <- Gen.listOfN(nl, Gen.choose(1L, 500L))
      b <- Gen.choose(10L, 3000L)
      e <- Gen.choose(1, 4)
    } yield (ns, b, e)
    forSamples(gen, n = 8) { case (ns, b, e) =>
      val df = ns.zipWithIndex.map { case (n, i) => (s"l$i", n) }.toDF("lang", "nt")
      val got = Sampling.unimaxAllocation(df, col("lang"), col("nt"), b, e)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val total = got.map(_._3).sum
      assert(total <= b, s"allocated $total over budget $b")
      got.foreach { case (l, n, a, m) =>
        assert(a <= n * e, s"$l epoch cap violated: $a > $n*$e")
        assert(m == (if (n > 0) 1000L * a / n else 0L))
      }
      // one constraint binds: either the whole corpus*E fits (all
      // epoch-capped) or the leftover budget is under #uncapped langs
      // (integer-division remainder only)
      val fullNeed = got.map { case (_, n, _, _) => n * e }.sum
      if (fullNeed > b) {
        // budget-limited: uncapped langs each take exactly share =
        // (B - S_k) div (L - k), so the leftover is the integer-division
        // remainder — strictly under the uncapped count
        val uncapped = got.count { case (_, n, a, _) => a < n * e }
        assert(uncapped > 0, "budget-limited case must have uncapped langs")
        assert(b - total < uncapped,
          s"leftover ${b - total} >= uncapped $uncapped — not a division remainder")
      } else assert(total == fullNeed, "everything fits -> exact epoch-capped total")
    }
  }

  test("unimaxAllocation equals the sequential waterfill on ties, zeros and share boundaries") {
    import graft.operators.Sampling
    // independent BigInt re-derivation of the paper's waterfill: sorted
    // ascending (lang tiebreak), scan for the first language whose full
    // epochs exceed its uniform share of what's left; it and every
    // larger language split the remainder equally (one floor division)
    def reference(ns: Seq[(String, Long)], b: Long, e: Int): Seq[(String, Long, Long, Long)] = {
      val sorted = ns.sortBy { case (l, n) => (n, l) }
      val L = sorted.length
      var left = BigInt(b); var k = 0
      while (k < L && BigInt(sorted(k)._2) * e * (L - k) <= left) {
        left -= BigInt(sorted(k)._2) * e; k += 1
      }
      val share = if (k < L) (left / (L - k)).toLong else 0L
      sorted.zipWithIndex.map { case ((l, n), i) =>
        val a = if (i < k) n * e else math.min(share, n * e)
        (l, n, a, if (n > 0) 1000L * a / n else 0L)
      }
    }
    val gen = for {
      nl <- Gen.choose(1, 7)
      // zeros allowed (empty langs) and a small value range to force ties
      ns <- Gen.listOfN(nl, Gen.oneOf(Gen.choose(0L, 6L), Gen.choose(0L, 400L)))
      e <- Gen.choose(1, 3)
      // mix arbitrary budgets with exact prefix-boundary budgets (the
      // <= in the crossover predicate is the edge a random budget misses)
      boundary <- Gen.choose(0, nl)
      exact <- Gen.oneOf(true, false)
      slack <- Gen.choose(1L, 50L)
    } yield {
      val sorted = ns.sorted
      val pref = sorted.take(boundary).map(_ * e.toLong).sum
      val b = if (exact) math.max(1L, pref) else pref + slack
      (ns, b, e)
    }
    forSamples(gen, n = 12) { case (ns, b, e) =>
      val df = ns.zipWithIndex.map { case (n, i) => (s"l${i % 3}x$i", n) }
        .toDF("lang", "nt")
      val got = Sampling.unimaxAllocation(df, col("lang"), col("nt"), b, e)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val want = reference(ns.zipWithIndex.map { case (n, i) => (s"l${i % 3}x$i", n) }, b, e)
      assert(got == want, s"ns=$ns b=$b e=$e:\n got=$got\nwant=$want")
    }
  }

  test("urlNormalize is idempotent and domain-stable over randomized URLs") {
    import graft.operators.TextAnalysis.{urlNormalize, urlDomain}
    val gen = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HtTpS", "ftp")
      labels <- Gen.choose(1, 4)
      host <- Gen.listOfN(labels, Gen.oneOf("WWW", "api", "Example7", "x"))
        .map(_.mkString("."))
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/A/b", "/A/b/", "/a//b///")
      query <- Gen.oneOf("", "?", "?Z=1&a=2")
      frag <- Gen.oneOf("", "#F", "#a/b?c")
    } yield s"$scheme://$host$port$path$query$frag"
    forSamples(gen, n = 25) { u =>
      val df = Seq(u).toDF("u")
      val once = df.select(urlNormalize(col("u")).as("n"),
        urlDomain(col("u")).as("d")).collect().head
      val (n1, d1) = (once.getString(0), once.getString(1))
      val twice = Seq(n1).toDF("u")
        .select(urlNormalize(col("u")), urlDomain(col("u"))).collect().head
      assert(twice.getString(0) == n1, s"not idempotent: $u -> $n1 -> ${twice.getString(0)}")
      assert(twice.getString(1) == d1, s"domain moved under normalization: $u")
      // canonical invariants
      assert(!n1.contains("#"), s"fragment survived: $u -> $n1")
      val schemeOut = n1.takeWhile(_ != ':')
      assert(schemeOut == schemeOut.toLowerCase, s"scheme case: $n1")
    }
  }

  test("dedupConsecutiveLines: random docs under the cap fold exactly; a multi-MB doc fails fast") {
    import graft.operators.TextAnalysis.dedupConsecutiveLines
    val lineGen = Gen.oneOf("a", "b", "menu item", "", "x y")
    val docGen = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, lineGen))
    forSamples(docGen, n = 30) { lines =>
      val doc = lines.mkString("\n")
      val got = Seq(doc).toDF("t")
        .select(dedupConsecutiveLines(col("t"))).collect().head.getString(0)
      // JVM reference: collapse consecutive equals
      val want = lines.foldLeft(List.empty[String]) {
        case (acc, l) if acc.headOption.contains(l) => acc
        case (acc, l) => l :: acc
      }.reverse.mkString("\n")
      assert(got == want, s"doc=${doc.take(80)}…")
    }
    // the quadratic-fold guard: a multi-MB single document must fail
    // FAST with the named knob, not grind through O(doc²) copies
    val big = ("line\n" * 500000) + "tail" // ~2.5 MB
    val e = intercept[Exception] {
      Seq(big).toDF("t")
        .select(dedupConsecutiveLines(col("t"))).collect()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("maxChars")),
      s"expected the named maxChars guard, got: $e")
    // and an explicit higher cap restores the fold
    val ok = Seq("a\na\nb").toDF("t")
      .select(dedupConsecutiveLines(col("t"), maxChars = 1 << 24))
      .collect().head.getString(0)
    assert(ok == "a\nb")
  }

  test("SplittableCsv: random content and block sizes always equal the single-task read") {
    import graft.sources.SplittableCsv
    import org.apache.spark.sql.types._
    val schema = new StructType().add("id", LongType).add("text", StringType)
    val fieldGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(20)),
      Gen.const("\"\"\""),            // quote soup
      Gen.const("a,b\nc\"d\n\ne"),    // separators + newlines + empties
      Gen.const("\\N"),               // the null token, literally
      Gen.const(""),
      Gen.const(null: String))
    val gen = for {
      n <- Gen.choose(1, 120)
      texts <- Gen.listOfN(n, fieldGen)
      block <- Gen.oneOf(1024L, 1031L, 2048L, 4099L) // prime offsets move the cuts
    } yield (texts, block)
    forSamples(gen, n = 6) { case (texts, block) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_splitprop")
      val f = dir.resolve("r.csv")
      val sb = new StringBuilder("id,text\n")
      texts.zipWithIndex.foreach { case (t, i) =>
        val field = if (t == null) "\\N"
          else "\"" + t.replace("\"", "\"\"") + "\""
        sb.append(s"$i,$field\n")
      }
      java.nio.file.Files.writeString(f, sb.toString)
      def canon(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      val want = canon(spark.read.schema(schema)
        .option("header", "true").option("nullValue", "\\N")
        .option("escape", "\"").option("multiLine", "true").csv(f.toString))
      val got = canon(SplittableCsv.read(spark, f.toString, schema,
        header = true, blockBytes = block))
      assert(got == want,
        s"block=$block rows=${texts.length}: missing=${(want -- got).take(2)} " +
          s"extra=${(got -- want).take(2)}")
    }
  }

  test("RealCodecs BMP: arbitrary dims round-trip pixel-exactly incl. padded row widths") {
    import graft.operators.Multimodal.RealCodecs
    val dimGen = for {
      w <- Gen.choose(1, 9) // covers every padding residue w*3 mod 4
      h <- Gen.choose(1, 9)
      seed <- Gen.choose(0, 1000)
    } yield (w, h, seed)
    forSamples(dimGen, n = 10) { case (w, h, seed) =>
      def pix(x: Int, y: Int) =
        ((x * 31 + y * 17 + seed) % 256, (x * 7 + y * 101 + seed) % 256,
          (x + y + seed) % 256)
      val Some((m, px)) = RealCodecs.decodeBmp24(RealCodecs.encodeBmp24(w, h, pix))
      assert((m.width, m.height) == (Some(w), Some(h)))
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = pix(x, y)
        val o = (y * w + x) * 3
        assert((px(o) & 0xff, px(o + 1) & 0xff, px(o + 2) & 0xff) == (r, g, b),
          s"pixel ($x,$y) of ${w}x$h corrupted")
      }
    }
  }

  test("hi/lo-split long moment sums reconstruct the exact BigDecimal sum") {
    // the q_corr/q_rollup agg trick: per-row product p >= 0 split at
    // 2^31, summed as two longs, reconstructed hi*2^31 + lo — must equal
    // the exact arbitrary-precision sum for any product distribution,
    // including values far past 2^53 in aggregate
    import spark.implicits._
    val M = 2147483648L
    val caseGen = for {
      n <- Gen.choose(1, 2000)
      seed <- Gen.choose(0L, Long.MaxValue / 4)
    } yield (n, seed)
    forSamples(caseGen, n = 8) { case (n, seed) =>
      // products up to ~1e14 — the q_corr y*y regime
      val prods = (0 until n).map { i =>
        val h = graft.operators.Dedup.md5LongJvm(s"p_${seed}_$i")
        math.abs(h) % 100000000000000L
      }
      val df = prods.toDF("p")
      val row = df.agg(
        sum(shiftright(col("p"), 31)).as("hi"),
        sum(col("p").bitwiseAND(lit(M - 1))).as("lo")).head()
      val rebuilt = (BigDecimal(row.getLong(0)) * M) + BigDecimal(row.getLong(1))
      val exact = prods.map(BigDecimal(_)).sum
      assert(rebuilt == exact, s"n=$n seed=$seed: $rebuilt != $exact")
      // and the in-query decimal reconstruction casts to the same double
      val viaDecimal = df.agg(
          sum(shiftright(col("p"), 31)).as("hi"),
          sum(col("p").bitwiseAND(lit(M - 1))).as("lo"))
        .select(((col("hi").cast("decimal(26,0)") * lit(M).cast("decimal(12,0)")
          + col("lo")).cast("decimal(38,4)") / 10000).cast("double"))
        .as[Double].head()
      assert(viaDecimal == (exact / 10000).toDouble,
        s"decimal path diverged: $viaDecimal vs ${(exact / 10000).toDouble}")
    }
  }
}

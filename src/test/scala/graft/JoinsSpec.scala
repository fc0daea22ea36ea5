package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

/** As-of and range joins: semantics on handcrafted corners (ties, staleness,
  * unmatched rows, interval boundaries) plus the plan-shape guarantees —
  * the range join must never plan a nested loop. */
class JoinsSpec extends GraftSpec {
  import spark.implicits._

  private val clicks = Seq(
    // (user, time, value)
    (1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0),
    (2L, 15L, 4.0)
  ).toDF("user_id", "ctms", "click_value")

  private val purchases = Seq(
    // (id, user, time)
    (100L, 1L, 25L),  // matches click@20
    (101L, 1L, 30L),  // equal-time: matches click@30 (ASOF >=)
    (102L, 1L, 5L),   // before any click -> unmatched
    (103L, 2L, 50L),  // matches click@15 unless tolerance rejects
    (104L, 3L, 40L)   // user with no clicks -> unmatched
  ).toDF("event_id", "user_id", "tms")

  test("asof: latest at-or-before match per key, left-outer nulls") {
    val out = Joins.asofBackward(purchases, clicks, Seq("user_id"),
        "tms", "ctms", Seq("click_value"))
      .select($"event_id", $"click_value", $"matched_time")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(out(100L) == (Some(2.0), Some(20L)))
    assert(out(101L) == (Some(3.0), Some(30L)), "equal timestamps must match (>=)")
    assert(out(102L) == (None, None), "purchase before any click")
    assert(out(103L) == (Some(4.0), Some(15L)))
    assert(out(104L) == (None, None), "key absent from right side")
  }

  test("asof: tolerance rejects stale matches atomically") {
    val out = Joins.asofBackward(purchases, clicks, Seq("user_id"),
        "tms", "ctms", Seq("click_value"), tolerance = 10L)
      .select($"event_id", $"click_value", $"matched_time")
      .collect().map(r => (r.getLong(0), (r.isNullAt(1), r.isNullAt(2)))).toMap
    assert(out(100L) == ((false, false)), "within tolerance (25-20=5)")
    assert(out(103L) == ((true, true)),
      "stale match (50-15=35 > 10) must null value AND time together")
  }

  test("asof: duplicate right timestamps tie-break deterministically") {
    val dup = Seq((1L, 20L, 9.0), (1L, 20L, 2.0)).toDF("user_id", "ctms", "click_value")
    val left = Seq((100L, 1L, 25L)).toDF("event_id", "user_id", "tms")
    val rows = (1 to 5).map { _ =>
      Joins.asofBackward(left.repartition(3), dup.repartition(2), Seq("user_id"),
        "tms", "ctms", Seq("click_value")).select($"click_value").head().getDouble(0)
    }
    assert(rows.distinct == Seq(9.0), "greatest payload struct wins, every run")
  }

  test("asof: payload name collision fails fast") {
    val bad = clicks.withColumnRenamed("click_value", "tms")
    intercept[IllegalArgumentException] {
      Joins.asofBackward(purchases, bad, Seq("user_id"), "tms", "ctms", Seq("tms"))
    }
  }

  private val intervals = Seq(
    (1L, 10.0, 20.0), (2L, 15.0, 25.0), (3L, 100.0, 100.0)
  ).toDF("band_id", "lo", "hi")
  private val points = Seq(
    (1L, 10.0), (2L, 20.0), (3L, 17.5), (4L, 99.9), (5L, 100.0), (6L, 26.0)
  ).toDF("pid", "p")

  test("range join: inclusive bounds, overlapping intervals, no equi-key") {
    val got = Joins.rangePointJoin(points, "p", intervals, "lo", "hi", binWidth = 4.0)
      .select($"pid", $"band_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Set((1L, 1L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L), (5L, 3L))
    assert(got == want, s"got $got")
  }

  test("range join: matches a brute-force cross filter on real data") {
    val li = spark.read.parquet(sf() + "/lineitem.parquet")
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
    val bands = spark.read.parquet(sf() + "/part.parquet")
      .orderBy($"p_retailprice".desc, $"p_partkey").limit(20)
      .select($"p_partkey", ($"p_retailprice" * 2.0).as("lo"),
        ($"p_retailprice" * 2.05).as("hi"))
    val fast = Joins.rangePointJoin(li, "l_extendedprice", bands, "lo", "hi", 16.0)
      .select($"p_partkey", $"l_orderkey", $"l_linenumber")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = li.crossJoin(bands)
      .filter($"l_extendedprice" >= $"lo" && $"l_extendedprice" <= $"hi")
      .select($"p_partkey", $"l_orderkey", $"l_linenumber")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fast == brute && fast.nonEmpty)
  }

  test("range join: plans an equi hash join, never a nested loop") {
    val p = SparkEntry.queries("q_range_join")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated into a nested loop:\n$p")
    assert(p.contains("HashJoin"), s"expected a hash join on the bin key:\n$p")
  }

  test("range join: empty intervals yield an empty result, not an error") {
    val out = Joins.rangePointJoin(points, "p",
      intervals.filter(lit(false)), "lo", "hi", binWidth = 4.0)
    assert(out.count() == 0)
  }

  test("reserved internal columns fail fast in both joins") {
    val badLeft = purchases.withColumn("__t", lit(1))
    intercept[IllegalArgumentException] {
      Joins.asofBackward(badLeft, clicks, Seq("user_id"), "tms", "ctms",
        Seq("click_value"))
    }
    intercept[IllegalArgumentException] {
      Joins.rangePointJoin(points.withColumn("__bin", lit(1)), "p",
        intervals, "lo", "hi", 4.0)
    }
  }

  test("range join: degenerate binWidth fails fast with the bin count") {
    val e = intercept[IllegalArgumentException] {
      Joins.rangePointJoin(points, "p", intervals, "lo", "hi",
        binWidth = 0.001, maxBinsPerInterval = 100)
    }
    assert(e.getMessage.contains("binWidth"))
  }

  test("asof query plans one shuffle over the unioned sides") {
    val p = SparkEntry.queries("q_asof_join")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"asof should shuffle once (by key), got $exchanges:\n$p")
  }

  test("fuzzyMatch: typos resolve across band boundaries, strangers don't match") {
    import graft.operators.Joins
    val catalog = Seq((1L, "red widget"), (2L, "red widgets"), (3L, "blue bolt"),
      (4L, "red sprocket")).toDF("id", "name")
    // "red widgetX" (insert) crosses the len-band of "red widget" (10 -> 11
    // chars, band 3 -> 3); "red widgett" matches both widget forms
    val dirty = Seq((101L, "red widgett"), (102L, "blue boltt"),
      (103L, "green gear"), (104L, null.asInstanceOf[String])).toDF("id", "name")
    val out = Joins.fuzzyMatch(dirty, col("id"), col("name"),
        catalog, col("id"), col("name"), maxDist = 2,
        blockOf = Joins.firstTokenBlock)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((101L, 1L, 1), (101L, 2L, 1), (102L, 3L, 1)), out.toString)
  }

  test("suffixPrefixWidth: grows log16 with the corpus, clamped to the corruption-safe band") {
    import graft.operators.Joins.suffixPrefixWidth
    // small corpora sit on the floor (keeps the sf0.01 oracle byte-stable)
    assert(suffixPrefixWidth(0L, 25) == 4)
    assert(suffixPrefixWidth(2000L, 25) == 4)
    assert(suffixPrefixWidth(2000000L, 25) == 4) // the measured-OK 100x point
    // the 1000x point that ran superlinear at fixed width 4 now widens
    assert(suffixPrefixWidth(20000000L, 25) == 5)
    // monotone in corpus size, capped at the last untouchable suffix char
    val ws = Seq(1L, 1000L, 100000L, 10000000L, 1000000000L, Long.MaxValue / 2)
      .map(suffixPrefixWidth(_, 25))
    assert(ws == ws.sorted && ws.last == 7, ws.toString)
    // finer base cardinality needs less suffix
    assert(suffixPrefixWidth(20000000L, 25000) <= suffixPrefixWidth(20000000L, 25))
  }

  test("fuzzyMatch: verified output is invariant to the block width (4..7)") {
    import graft.operators.Joins
    // mirror the q_fuzzy_match construction on a small slice: widening
    // the prefix only prunes CANDIDATES; every true match shares all 7
    // stable suffix chars, so the verified pair set cannot change
    val cat = spark.read.parquet(s"${sf()}/part.parquet").limit(300)
      .select(col("p_partkey"), concat(col("p_name"), lit(" "),
        substring(md5(col("p_partkey").cast("string")), 1, 8)).as("name"))
    val dirty = cat.filter(pmod(col("p_partkey"), lit(5)) === 0)
      .select(col("p_partkey").as("k"),
        concat(col("name").substr(lit(1), length(col("name")) - 1), lit("q")).as("nm"))
    val outs = Seq(4, 7).map { w =>
      val block = (c: org.apache.spark.sql.Column) =>
        concat(split(c, " ").getItem(0), lit("|"),
          substring(element_at(split(c, " "), -1), 1, w))
      Joins.fuzzyMatch(dirty, col("k"), col("nm"), cat, col("p_partkey"),
          col("name"), maxDist = 2, blockOf = block)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }
    assert(outs(0) == outs(1), s"width changed the verified pairs")
    assert(outs(0).nonEmpty, "slice produced no matches — test is vacuous")
  }

  test("fuzzyMatch: candidate generation is a hash equi-join, not a nested loop") {
    val p = SparkEntry.queries("q_fuzzy_match")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"fuzzy match must block, not cross:\n$p")
  }
}

package graft

/** Harness guard: every registered query must at least ANALYZE against the
  * current sf0.001 testdata. The round-4 regeneration flipped `events.ts`
  * from int64-nanos to TIMESTAMP_NTZ and ten queries silently vanished
  * from CORRECTNESS (an analysis-time failure produces no entry at all) —
  * this spec makes that class of drift fail at commit time instead.
  *
  * queryExecution.analyzed resolves the full plan (types, columns,
  * functions) without executing — EXCEPT the q_*_stream entries, whose
  * builder eagerly runs a full file-source drain. Those are built ONCE
  * here and their schemas shared by every test, so the suite pays 3
  * drains (at sf0.001, sub-second each), not 3 per test.
  */
class RegistrySpec extends GraftSpec {

  // one build per query for the whole suite; a streaming drain or an
  // analysis failure happens exactly once and is reported by every test
  // that needs that query
  private lazy val built: Map[String, Either[String, org.apache.spark.sql.DataFrame]] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, q) =>
      name -> (try Right(q(spark, sf()))
               catch { case e: Exception =>
                 Left(s"$name: ${e.getMessage.linesIterator.next()}") })
    }.toMap

  test("every registered query analyzes against sf0.001") {
    val broken = built.toSeq.sortBy(_._1).flatMap {
      case (_, Left(err)) => Some(err)
      case (name, Right(df)) =>
        try { df.queryExecution.analyzed; None }
        catch { case e: Exception => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(broken.isEmpty, s"queries failing analysis:\n${broken.mkString("\n")}")
  }

  test("every oracleSql key has a registered query (and schema column parity)") {
    val qs = SparkEntry.queries
    val orphans = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(orphans.isEmpty, s"oracleSql without a query: $orphans")
    // The driver's compare sorts columns BY NAME before hashing — a Spark
    // result and an oracle that disagree on any column name hash-mismatch
    // even with identical values. Cheap static guard: every column of the
    // Spark schema must appear verbatim in the oracle SQL text.
    val suspicious = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      built(name) match {
        case Left(err) => Some(err)
        case Right(df) =>
          val cols = df.queryExecution.analyzed.schema.fieldNames
          val missing = cols.filterNot(c => sql.contains(c))
          if (missing.isEmpty) None
          else Some(s"$name: cols ${missing.mkString(",")} absent from oracle SQL")
      }
    }
    assert(suspicious.isEmpty, s"schema/oracle column drift:\n${suspicious.mkString("\n")}")
  }

  test("every query has an oracle entry (or is on the documented rows-only list)") {
    // rows-only queries: the driver records a weaker rows>0 check. Keep
    // this list EXPLICIT so a forgotten oracle is a test failure, not a
    // silent downgrade. Empty since r5 (q_canopy_full gained its exact
    // oracle) — keep the machinery so a future non-SQL op is a conscious
    // listing, not an accident.
    val rowsOnly = Set.empty[String]
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries with no oracleSql: $missing")
  }

  test("events.ts normalizes to a plausible epoch-millis range") {
    // tbl()'s LongType branch assumes int64-NANOS; a regeneration that
    // ships plain int64 millis (or micros/seconds) would mis-scale every
    // event-time query by 1e6 with no analysis failure — RegistrySpec
    // would stay green and only the oracle run would catch it. One tiny
    // aggregate pins the normalized range to [2000-01-01, 2101-01-01):
    // any wrong carrier scale lands orders of magnitude outside it.
    val r = SparkEntry.tbl(spark, sf(), "events")
      .agg(org.apache.spark.sql.functions.min("ts"),
        org.apache.spark.sql.functions.max("ts")).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    assert(lo >= 946684800000L && hi < 4133980800000L,
      s"events.ts normalized to [$lo, $hi] — outside plausible epoch-millis " +
        "range; the parquet carrier scale likely drifted (see SparkEntry.epochMillis)")
  }
}

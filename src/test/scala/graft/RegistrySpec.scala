package graft

/** Harness guard: every registered query must at least ANALYZE against the
  * current sf0.001 testdata. The round-4 regeneration flipped `events.ts`
  * from int64-nanos to TIMESTAMP_NTZ and ten queries silently vanished
  * from CORRECTNESS (an analysis-time failure produces no entry at all) —
  * this spec makes that class of drift fail at commit time instead.
  *
  * queryExecution.analyzed resolves the full plan (types, columns,
  * functions) without executing, so the whole registry checks in seconds.
  */
class RegistrySpec extends GraftSpec {

  test("every registered query analyzes against sf0.001") {
    val dir = sf()
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try { q(spark, dir).queryExecution.analyzed; None }
      catch { case e: Exception => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(broken.isEmpty, s"queries failing analysis:\n${broken.mkString("\n")}")
  }

  test("every oracleSql key has a registered query (and schema column parity)") {
    val dir = sf()
    val qs = SparkEntry.queries
    val orphans = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(orphans.isEmpty, s"oracleSql without a query: $orphans")
    // The driver's compare sorts columns BY NAME before hashing — a Spark
    // result and an oracle that disagree on any column name hash-mismatch
    // even with identical values. Cheap static guard: every column of the
    // Spark schema must appear verbatim in the oracle SQL text.
    val suspicious = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      val cols = qs(name)(spark, dir).queryExecution.analyzed.schema.fieldNames
      val missing = cols.filterNot(c => sql.contains(c))
      if (missing.isEmpty) None else Some(s"$name: cols ${missing.mkString(",")} absent from oracle SQL")
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
}

package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // Shuffle partitions default to core count (right at sf0.1); the
    // 1000x stress points need more — 32 partitions over 600M rows is
    // ~19M rows each, which spills. On a cluster this is the knob AQE
    // coalescing makes safe to oversize.
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run (targeted re-timing)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // fixed (sorted) execution order: Map iteration order is arbitrary,
    // and run order matters at large SFs (one query's cache pressure
    // lands on whichever query follows it) — sorted order makes rounds
    // comparable run-to-run
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // min of 2 runs per query: the first pays JIT/codegen compilation,
    // which otherwise dominates sub-second queries and adds ±50% noise.
    // SPARK_GRAFT_RUNS=1 for the multi-minute stress points, where a
    // second run buys nothing (JIT is amortized) and doubles wall time.
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    // ------------------------------------------------------------------
    // self-adjudication (round-11): BENCH_r10.json was taken under
    // co-running load and read 448s/38 false >2x rows without any
    // self-flagging. The artifact now carries its own evidence:
    //  - 1-min /proc/loadavg sampled BEFORE each query ("load" map —
    //    a high value entering a query marks residual/external load),
    //  - any query that lands >2x its recorded gate (bench_map.json,
    //    override via SPARK_GRAFT_GATES) is RE-PROBED at the end of the
    //    run, alone, min-of-2 ("reprobe" map) — a contended first pass
    //    and a clean re-probe then disagree in the same artifact, and
    //    a real regression reproduces in both.
    // ------------------------------------------------------------------
    def load1(): Double =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")))
        .split("\\s+")(0).toDouble
      catch { case _: Exception => -1.0 }
    // Gates of record come from the COMMITTED bench_gates.json (r10 clean
    // map + per-round isolated re-recordings), never from bench_map.json:
    // defaulting to the file this run overwrites let one contended closing
    // run ratchet every later run's 2x reprobe threshold (round-11
    // verdict — a self-adjudication that ratchets is self-defeating).
    val gates: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(sys.env.getOrElse(
            "SPARK_GRAFT_GATES", "/root/repo/bench_gates.json"))))
        // gates only adjudicate a run at the SAME scale they were
        // recorded at — a 100x stress run compared against sf0.1 gates
        // would re-probe every query for nothing
        val gateSf = "\"sf\":\"([^\"]+)\"".r.findFirstMatchIn(txt).map(_.group(1))
        if (!gateSf.contains(sfDir)) Map.empty[String, Double]
        else {
          // bound the scan to the queries object ONLY: the artifact also
          // carries "reprobe"/"load" maps whose keys repeat query names,
          // and an unbounded scan let those overwrite gate values via
          // toMap last-wins. The queries map is flat, so the first '}'
          // after its opening brace closes it.
          val idx = txt.indexOf("\"queries\":{")
          val body = txt.substring(idx, txt.indexOf('}', idx) + 1)
          "\"([A-Za-z0-9_]+)\":(-?[0-9][0-9.eE+-]*)".r
            .findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        }
      } catch { case _: Exception => Map.empty[String, Double] }
    def timeQuery(name: String,
                  fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                  nRuns: Int): Double = {
      val times = (1 to nRuns).flatMap { _ =>
        // clean cache state per run: queries that cache a relation
        // (model tables, pair lineage) would otherwise leak it into
        // every later query's measurement — each query should be timed
        // against cold cache state, and CacheManager plan-matching
        // against a leftover complex lineage is planning overhead the
        // later query never asked for
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // toRdd.count(), NOT DataFrame.count(): df.count() lets Catalyst
        // replace the final projection with an empty aggregate, so a
        // projection-only query (html strip, url normalize, destutter)
        // records its SCAN SKELETON instead of the transform it claims —
        // the q_embed_cov fake-fast gate generalized. Counting the
        // executed plan's UnsafeRows materializes every output column:
        // each query's recorded time is the cost of producing its
        // actual result rows (still no driver transfer — count per
        // partition). Round-9 change; earlier per-query records for
        // pruned projections read low (BASELINE.md note).
        try {
          fn(spark, sfDir).queryExecution.toRdd.count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); None
        }
      }
      // min over SUCCESSFUL runs only; -1 marks a query that never ran
      if (times.nonEmpty) times.min else -1.0
    }
    val loadIn = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val results = selected.map { case (name, fn) =>
      loadIn(name) = load1()
      name -> timeQuery(name, fn, runs)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total sums SUCCESSFUL times only: a failed query keeps its -1
    // marker in the per-query map but must not shrink the headline total
    val total = results.map(_._2).filter(_ >= 0).sum
    // end-of-run adjudication: everything >2x its gate runs again, alone
    val flagged = results.filter { case (name, t) =>
      t >= 0 && gates.get(name).exists(g => g > 0 && t > 2 * g)
    }.map(_._1)
    val byName = selected.toMap
    val reprobes = flagged.map { name =>
      name -> timeQuery(name, byName(name), math.max(runs, 2))
    }
    val loadJson = loadIn.map { case (k, v) => s"\"$k\":$v" }
      .mkString("{", ",", "}")
    val reprobeJson = reprobes.map { case (k, v) => s"\"$k\":$v" }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""reprobe":$reprobeJson,"load":$loadJson,"sf":"$sfDir"}"""
    println(line)
    // The same JSON line as a committed ARTIFACT: the driver captures
    // stdout with a tail cap, and round 5 lost 12 of 84 per-query times
    // to that truncation — a file can't be truncated by a log pipe.
    // Skipped for SPARK_GRAFT_ONLY partial runs so a targeted re-timing
    // never overwrites the full-suite record.
    if (only.isEmpty) {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_map.json"))
      java.nio.file.Files.write(out,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}

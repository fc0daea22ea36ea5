package graft.operators

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

/**
 * Canopy pre-clustering with thresholds T1 &gt; T2.
 *
 * Reference semantics (cn/swust/algorithms/canopy/Canopy.java:384-414):
 * for the current center, each point with d &lt;= 1e-6 is treated as the
 * center itself and dropped; d &lt; T1 joins the canopy; of those, d &lt; T2
 * is removed from candidacy while d in [T2, T1) stays a candidate (so
 * points may belong to several canopies); d &gt;= T1 stays a candidate. Next
 * center = first remaining candidate (Canopy.java:427-435); stop when
 * candidates are exhausted or maxIter rounds ran (Canopy.java:287-299).
 *
 * The reference's next-center choice is partition-order-dependent and its
 * own test has no golden values (CanopyTest.java:151). Here the order is
 * pinned to the input row order, making output deterministic for a given
 * file layout; correctness is asserted through structural invariants
 * (pairwise center distance &gt;= T2, members within T1, full coverage).
 *
 * Spark architecture (the reference's per-partition pattern,
 * Canopy.java:163-212, made explicit): (1) mapPartitions runs the
 * sequential selection locally, emitting O(#local centers) rows; (2) the
 * driver re-runs the same selection over the collected local centers to
 * merge near-duplicates; (3) one broadcast pass assigns every point to the
 * canopies within T1. The data is scanned twice total, nothing iterative
 * touches the cluster, and driver state is O(#centers * dims) — the same
 * plan at 100 TB, provided T2 is chosen so #centers stays driver-sized.
 */
class Canopy(override val uid: String) extends Transformer
    with HasFeaturesCol with HasPredictionCol with HasMaxIter
    with HasDistanceMeasure with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("canopy"))

  /** Outer threshold (CanopyParams.java:8-14, default 1.0). */
  final val t1: DoubleParam =
    new DoubleParam(this, "t1", "outer threshold T1 (> T2)", ParamValidators.gt(0.0))
  setDefault(t1 -> 1.0)
  def getT1: Double = $(t1)
  def setT1(value: Double): this.type = set(t1, value)

  /** Inner threshold (CanopyParams.java:16-22, default 0.5). */
  final val t2: DoubleParam =
    new DoubleParam(this, "t2", "inner threshold T2 (< T1)", ParamValidators.gt(0.0))
  setDefault(t2 -> 0.5)
  def getT2: Double = $(t2)
  def setT2(value: Double): this.type = set(t2, value)

  /** Stable sort columns for a DETERMINISTIC sweep: when non-empty, the
    * sequential center selection runs over the data globally sorted by
    * these columns instead of partition order — partition-layout-
    * independent and exactly reproducible by any engine (the DuckDB
    * oracle replays it as a recursive CTE). Empty (default) keeps the
    * reference's order-dependent two-level sweep (Canopy.java:163-212). */
  final val orderCols: StringArrayParam =
    new StringArrayParam(this, "orderCols",
      "stable sort columns for a deterministic sweep; empty = input order")
  setDefault(orderCols -> Array.empty[String])
  def setOrderCols(value: String*): this.type = set(orderCols, value.toArray)

  def setMaxIter(value: Int): this.type = set(maxIter, value)
  def setDistanceMeasure(value: String): this.type = set(distanceMeasure, value)
  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setPredictionCol(value: String): this.type = set(predictionCol, value)

  /** Fail-fast guard on the reference-shaped output: [[transform]]
    * materializes every member VECTOR of a canopy into one
    * `collect_list` buffer, so a canopy with more members than this is
    * a one-task memory bomb (measured: 1.7 GB at 60M rows / 50
    * canopies). A cheap count pass (counts only — no vectors shuffled)
    * runs first and aborts loudly instead; at corpus scale consume
    * [[Canopy.assign]]'s exploded (canopy, center, member) rows
    * directly, which is the shape q_canopy_sweep uses. */
  final val maxMembers: IntParam = new IntParam(this, "maxMembers",
    "largest per-canopy member count transform will materialize",
    ParamValidators.gt(0))
  setDefault(maxMembers -> 1000000)
  def getMaxMembers: Int = $(maxMembers)
  def setMaxMembers(value: Int): this.type = set(maxMembers, value)

  /** Output: one row per canopy, (centroids, predictionCol) = (center,
    * members incl. center) mirroring Canopy.java:93-109.
    *
    * SCALE CAVEAT: this output contract materializes every member
    * VECTOR of a canopy into one `collect_list` buffer — O(members)
    * memory in a single aggregation task (measured: one task demanding
    * 1.7 GB at 60M rows / 50 canopies). It exists for reference parity
    * and is guarded by [[maxMembers]]: a count-only pre-pass (one extra
    * scan, nothing but (id, count) shuffled) aborts loudly before the
    * buffer can build. At corpus scale consume [[Canopy.assign]]'s
    * exploded rows directly and aggregate what you need (counts, sums)
    * — the q_canopy_sweep query does exactly that. */
  override def transform(ds: Dataset[_]): DataFrame = {
    require($(t1) > $(t2), s"T1 (${$(t1)}) must be > T2 (${$(t2)})")
    // ONE evaluation of the input feeds center selection, the guard,
    // and the output: localCheckpoint materializes the partitions
    // eagerly, so a nondeterministic/expensive upstream plan is not
    // re-run per pass (the guard's counts and the transform's
    // aggregation would otherwise observe different rows, and the
    // guard alone re-evaluated upstream up to twice more)
    val df = ds.toDF().localCheckpoint(true)
    val centers =
      if ($(orderCols).nonEmpty)
        Canopy.selectCentersSequential(df, $(featuresCol), $(orderCols).toSeq,
          $(t1), $(t2), $(maxIter), $(distanceMeasure))
      else Canopy.selectCenters(df, $(featuresCol), $(t1), $(t2),
        $(maxIter), $(distanceMeasure))
    // guard pre-pass only when a canopy COULD exceed the knob: total
    // row count is an upper bound on any per-canopy count, and both
    // passes read the checkpointed blocks (no upstream re-evaluation),
    // so small inputs (every test/bench sf) pay one cheap block scan
    // and the count-only pass runs exactly when it matters
    if (df.count() > $(maxMembers).toLong) {
      val worst = Canopy.assign(df, $(featuresCol), centers, $(t1),
          $(distanceMeasure))
        .groupBy(col("__canopy_id")).agg(count(lit(1)).as("__n"))
        .agg(max(col("__n"))).head()
      val biggest = if (worst.isNullAt(0)) 0L else worst.getLong(0)
      require(biggest <= $(maxMembers).toLong,
        s"Canopy.transform: a canopy has $biggest members — past " +
          s"maxMembers=${$(maxMembers)}, the collect_list output contract " +
          "is a one-task memory bomb. Consume Canopy.assign's exploded " +
          "rows instead, or raise maxMembers with executor memory to match.")
    }
    // Canopy row = center + strict members; duplicates of the center are
    // dropped like the reference's `dis <= 1e-6 -> continue`, and the
    // center itself appears exactly once, prepended (Canopy.java:416-423).
    // Seeding from the full center list keeps isolated centers: the
    // reference emits one row per center even when `belongs` is empty
    // (Canopy.java:93-109 adds centroidValues[0] before the members), so a
    // singleton canopy must not vanish from the grouped assignment.
    val spark = df.sparkSession
    import spark.implicits._
    val seed = centers.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
      .toDF("__canopy_id", "centroids")
    val grouped = Canopy.assign(df, $(featuresCol), centers, $(t1), $(distanceMeasure))
      .groupBy(col("__canopy_id"))
      .agg(collect_list(col("__member")).as("__members"))
    seed.join(grouped, Seq("__canopy_id"), "left")
      .withColumn($(predictionCol),
        concat(array(col("centroids")),
          coalesce(col("__members"), array().cast("array<array<double>>"))))
      .select(col("centroids"), col($(predictionCol)))
  }

  override def transformSchema(schema: StructType): StructType =
    new StructType()
      .add("centroids", ArrayType(DoubleType), nullable = false)
      .add($(predictionCol), ArrayType(ArrayType(DoubleType)), nullable = false)

  override def copy(extra: ParamMap): Canopy = defaultCopy(extra)
}

object Canopy extends DefaultParamsReadable[Canopy] {

  /** Sequential canopy-center selection over an ordered sweep
    * (Canopy.java:384-435). Implemented as a single greedy pass — output-
    * identical to the reference's round structure (pick head, filter,
    * repeat): selected centers are strictly increasing in input order, so
    * "first remaining candidate after r filter rounds" equals "first
    * point surviving (d > 1e-6 && d >= T2) against every center selected
    * so far". The streaming form retains nothing but the centers (the
    * round form materialized the whole partition and re-filtered it per
    * center — 60M boxed rows of transient garbage at the 100x point, and
    * the GC debt taxed everything scheduled after it). */
  def localCenters(points: Iterator[Array[Double]], t1: Double, t2: Double,
                   maxIter: Int, measure: String): Seq[Array[Double]] = {
    val dist = VecOps.distance(measure) _
    val centers = ArrayBuffer.empty[Array[Double]]
    while (points.hasNext && centers.length < maxIter) {
      val p = points.next()
      var ok = true
      var i = 0
      while (ok && i < centers.length) {
        val d = dist(p, centers(i))
        if (!(d > 1e-6 && d >= t2)) ok = false
        i += 1
      }
      if (ok) centers += p
    }
    centers.toSeq
  }

  /** Two-level selection: per-partition local canopies, then the same
    * sequential merge over local centers on the driver.
    *
    * `maxCenters` is the fail-fast guard for the driver-sized-state
    * assumption: a partition that accumulates that many centers (before
    * the maxIter cap kicks in) means T2 is far too small for the data —
    * nearly every point is becoming its own canopy — and collecting the
    * local centers would flood the driver. Aborting with a clear message
    * beats an executor-side slow death or a driver OOM. */
  def selectCenters(df: DataFrame, featuresCol: String, t1: Double, t2: Double,
                    maxIter: Int, measure: String,
                    maxCenters: Int = 100000): Array[Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val pts = df.select(Features.asArray(df, featuresCol)).as[Array[Double]]
    val local = pts.rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        val cs = localCenters(it, t1, t2, maxIter, measure)
        if (cs.length >= maxCenters)
          throw new IllegalStateException(
            s"Canopy selected $maxCenters+ centers in one partition: " +
              s"T2=$t2 is too small for this data (nearly every point becomes " +
              s"a center). Raise T2, lower maxIter, or raise maxCenters explicitly.")
        cs.iterator.map(c => (pid, c))
      }
      .collect()
    // Merge in partition order then local order — deterministic.
    val ordered = local.sortBy(_._1).iterator.map(_._2)
    localCenters(ordered, t1, t2, maxIter, measure).toArray
  }

  /** Deterministic flat sweep: the SAME sequential selection as a scan
    * over the data globally sorted by `orderCols` — independent of
    * partition layout, hence exactly reproducible from SQL (recursive
    * CTE) — but executed WITHOUT ever building the global sort.
    *
    * Filter-and-take rounds: each round broadcasts the selected centers,
    * filters the raw data to survivors of (d &gt; 1e-6 &amp;&amp; d &gt;= T2)
    * against ALL of them, and fetches only the first `batch` survivors
    * in `orderCols` order via TakeOrderedAndProject (a bounded per-
    * partition heap — no shuffle, no sort). The local sweep then
    * continues over that prefix, re-checking against centers added
    * within the round. Every point before the fetched prefix's cutoff
    * was either selected or permanently fails some selected center, so
    * re-collecting from the top each round skips it — output is
    * identical to the sorted sweep. Each non-empty round selects at
    * least one center (its first row survives everything selected so
    * far), so the loop runs at most min(maxIter, #centers)+1 rounds of
    * one filtered scan each, and the driver fetch is bounded by
    * batch x rounds AT ANY DATA SIZE. (The first cut of this operator
    * walked the partitions of a real global sort: the per-partition
    * sorts made it 45x slower at the 100x point and the first block was
    * still an unbounded driver fetch.) Inherently sequential semantics —
    * the two-level [[selectCenters]] stays the default when exact
    * order-reproducibility isn't needed. */
  def selectCentersSequential(df: DataFrame, featuresCol: String,
                              orderCols: Seq[String], t1: Double, t2: Double,
                              maxIter: Int, measure: String): Array[Array[Double]] =
    sweepWithStats(df, featuresCol, orderCols, t2, maxIter, measure)._1

  /** The sweep plus its fetch diagnostic: rows actually collected to the
    * driver across all rounds (spec hook for the bounded-fetch
    * guarantee). `batch` is the TakeOrdered prefix per round. */
  private[graft] def sweepWithStats(df: DataFrame, featuresCol: String,
                                    orderCols: Seq[String], t2: Double,
                                    maxIter: Int, measure: String,
                                    batch: Int = 4096): (Array[Array[Double]], Long) = {
    val centers = ArrayBuffer.empty[Array[Double]]
    var fetched = 0L
    var done = false
    while (!done && centers.length < maxIter) {
      val sel = centers.toArray
      val m = measure; val t2v = t2
      val survives = udf { (p: Seq[Double]) =>
        val dist = VecOps.distance(m) _
        val arr = p.toArray
        var ok = true
        var i = 0
        while (ok && i < sel.length) {
          val d = dist(arr, sel(i))
          if (!(d > 1e-6 && d >= t2v)) ok = false
          i += 1
        }
        ok
      }
      val cand = df
        .withColumn("__pt", Features.asArray(df, featuresCol))
        .filter(survives(col("__pt")))
        .orderBy(orderCols.map(col): _*)
        .limit(batch)
        .select(col("__pt"))
        .collect()
        .map(_.getAs[scala.collection.Seq[Double]](0).toArray)
      fetched += cand.length
      if (cand.isEmpty) done = true
      else {
        val dist = VecOps.distance(measure) _
        var i = 0
        while (i < cand.length && centers.length < maxIter) {
          val pt = cand(i)
          var ok = true
          var j = 0
          while (ok && j < centers.length) {
            val d = dist(pt, centers(j))
            if (!(d > 1e-6 && d >= t2)) ok = false
            j += 1
          }
          if (ok) centers += pt
          i += 1
        }
        // a short page means the filter is exhausted: no survivor beyond
        // this prefix can exist, so skip the extra empty round
        if (cand.length < batch) done = true
      }
    }
    (centers.toArray, fetched)
  }

  /** Exploded assignment: (canopy_id, center, member) rows, one per strict
    * membership (1e-6 < d < T1); scalable output shape. */
  def assign(df: DataFrame, featuresCol: String, centers: Array[Array[Double]],
             t1: Double, measure: String): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(centers)
    val memberUdf = udf { (p: Seq[Double]) =>
      val arr = p.toArray
      val dist = VecOps.distance(measure) _
      bc.value.indices.filter { i =>
        val d = dist(arr, bc.value(i))
        d > 1e-6 && d < t1
      }
    }
    val centerUdf = udf { (i: Int) => bc.value(i) }
    df.withColumn("__member", Features.asArray(df, featuresCol))
      .withColumn("__canopy_id", explode(memberUdf(col("__member"))))
      .withColumn("__center", centerUdf(col("__canopy_id")))
  }
}

package graft.operators

import graft.core._
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType}
import scala.util.hashing.MurmurHash3

/**
 * Fuzzy c-means clustering, re-expressed Spark-first.
 *
 * Reference semantics (cn/swust/algorithms/fcm/FCM.java):
 *  - init: k random centroids sampled from the data (FCM.java:71), initial
 *    memberships ~ symmetric Dirichlet(1) (FCM.java:555-563 — unseeded
 *    there; seeded here, an intentional determinism upgrade);
 *  - per round: centroid_k = sum_i(u_ik^m * x_i) / sum_i(u_ik^m)
 *    (FCM.java:474-503,242-260), memberships recomputed from the new
 *    centroids as u_ik = 1 / sum_j (d_ik/d_jk)^(2/(m-1)) with the 1e-10
 *    zero-distance guard (FCM.java:527-553);
 *  - stop when max |delta u| <= TOL or maxIter (FCM.java:288-341).
 *
 * Spark architecture: memberships are a pure function of the centroids
 * (except the random epoch-0 matrix, which we regenerate deterministically
 * from a per-point hash), so NO per-row membership state is cached or
 * shuffled — each round is ONE treeAggregate over the cached feature
 * Dataset with broadcast (prev, curr) centroid pairs, accumulating
 * (sum u^m, sum u^m x, max |delta u|) in primitive arrays. The Flink
 * iteration machinery (epoch watermarks, feedback edges, termination
 * streams — FCM.java:85-98,269-341) collapses into this driver loop; per
 * round cost is one pass over the data and O(k*d) driver state, so the
 * same loop runs unchanged on a 1000-executor cluster.
 */
class FCM(override val uid: String) extends Estimator[FCMModel]
    with FCMParams with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("fcm"))

  private var initialCentroids: Option[Array[Array[Double]]] = None
  /** Seed fit with explicit centroids (e.g. Canopy centers — canopy
    * pre-clustering feeding FCM is the intended composition of the two
    * reference operators); overrides k and random sampling. */
  def setInitialCentroids(value: Array[Array[Double]]): this.type = {
    initialCentroids = Some(value); set(k, value.length); this
  }

  /** Column whose md5 hash orders the deterministic init sample; empty
    * (default) keeps the Dirichlet random-init path. */
  def setInitIdCol(value: String): this.type = set(initIdCol, value)

  def setK(value: Int): this.type = set(k, value)
  def setM(value: Double): this.type = set(m, value)
  def setTol(value: Double): this.type = set(tol, value)
  def setMaxIter(value: Int): this.type = set(maxIter, value)
  def setSeed(value: Long): this.type = set(seed, value)
  def setDistanceMeasure(value: String): this.type = set(distanceMeasure, value)
  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setPredictionCol(value: String): this.type = set(predictionCol, value)

  override def fit(ds: Dataset[_]): FCMModel = {
    val df = ds.toDF()
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(Features.asArray(df, $(featuresCol)))
      .as[Array[Double]].rdd
    // Hash-sample init: the k rows with the smallest 60-bit md5 of the id
    // column (ties broken by id) — a deterministic, partition-independent,
    // ENGINE-REPRODUCIBLE sample (the DuckDB oracle replays the identical
    // ordering), planned as a distributed TakeOrderedAndProject. Behaves
    // like explicit centroids: epoch-0 memberships derive from them.
    val hashInit: Option[Array[Array[Double]]] =
      if (initialCentroids.isEmpty && $(initIdCol).nonEmpty) Some {
        // The fixed-width hex substring orders identically to its 60-bit
        // numeric value (and to the oracle's ::BIGINT sort) — skipping
        // conv, which profiles at ~the md5's own per-row cost (KMeansDet
        // carries the same form).
        val h = substring(md5(col($(initIdCol)).cast("string")), 1, 15)
        df.orderBy(h.asc, col($(initIdCol)).asc)
          .limit($(k))
          .select(Features.asArray(df, $(featuresCol)))
          .as[Array[Double]].collect()
      } else None
    val explicit = initialCentroids.orElse(hashInit)
    // Default (no explicit/hash init): the epoch-0 state is the content-
    // hash-keyed Dirichlet membership matrix inside runBlocks — already
    // partition-independent — and the init centroids are never consulted
    // on that path, so a single-row dims probe replaces the old
    // takeSample (which cost a pass and was partition-dependent for
    // nothing).
    val init = explicit.getOrElse(Array(rows.first()))
    // Iterations run over flat per-block arrays: ~15k cached block objects
    // instead of tens of millions of boxed Array[Double] rows — sequential
    // scans, no old-gen pointer chasing.
    val blocks = FCM.blockify(rows)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val centroids = FCM.runBlocks(blocks, init, $(k), $(m), $(tol),
        $(maxIter), $(seed), $(distanceMeasure),
        explicitInit = explicit.isDefined)
      copyValues(new FCMModel(Identifiable.randomUID("fcmModel"))
        .setCentroids(centroids)).setParent(this)
    // blocking: release executor storage deterministically before the
    // caller's next job — sequential fits (canopy->FCM composition, bench
    // reruns) must not stack block caches in constrained memory
    } finally blocks.unpersist(blocking = true)
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add($(predictionCol), IntegerType, nullable = false)

  override def copy(extra: ParamMap): FCM = defaultCopy(extra)
}

trait FCMParams extends HasFeaturesCol with HasPredictionCol with HasMaxIter
    with HasSeed with HasDistanceMeasure {
  /** Number of clusters (FCMModelParams.java:11-16, default 3). */
  final val k: IntParam =
    new IntParam(this, "k", "number of clusters", ParamValidators.gt(1))
  setDefault(k -> 3)
  final def getK: Int = $(k)

  /** Fuzziness exponent (FCMModelParams.java:18-24, default 2.0). */
  final val m: DoubleParam =
    new DoubleParam(this, "m", "fuzziness exponent (>1)", ParamValidators.gt(1.0))
  setDefault(m -> 2.0)
  final def getM: Double = $(m)

  /** Convergence tolerance on max |delta membership| (FCMModelParams.java:26-30). */
  final val tol: DoubleParam =
    new DoubleParam(this, "tol", "convergence tolerance", ParamValidators.gtEq(0.0))
  setDefault(tol -> 1e-4)
  final def getTol: Double = $(tol)

  /** Deterministic init: when non-empty, the k initial centroids are the
    * rows with the SMALLEST 60-bit md5 of this column (ties by the column
    * value) — partition-independent and replayable by any engine, unlike
    * an RDD sample. Capability extension over the reference's unseeded
    * selectRandomCentroids (FCM.java:71). */
  final val initIdCol: Param[String] =
    new Param[String](this, "initIdCol",
      "id column for the deterministic hash-sample init; '' = random init")
  setDefault(initIdCol -> "")
  final def getInitIdCol: String = $(initIdCol)
}

object FCM extends DefaultParamsReadable[FCM] {

  /** u_ik = 1 / sum_j (d_ik/d_jk)^(2/(m-1)), 1e-10 guard (FCM.java:527-553). */
  def membership(point: Array[Double], centroids: Array[Array[Double]],
                 measure: String, m: Double): Array[Double] = {
    val k = centroids.length
    val u = new Array[Double](k)
    membershipInto(point, centroids, measure, m, new Array[Double](k), u)
    u
  }

  /** Hot-path membership: algebraically equal to the reference's
    * u_i = 1/Σ_j (d_i/d_j)^(2/(m-1)) (FCM.java:527-553) but O(k) instead
    * of O(k²) — u_i = (d_i/dmin)^-p / Σ_j (d_j/dmin)^-p. Normalizing by
    * the min distance keeps every pow argument ≥ 1, so nothing overflows
    * even as m → 1. Euclidean runs inlined on SQUARED distances (the ratio
    * exponent halves, so the m=2 default needs no pow and no sqrt) with
    * caller-provided scratch — no per-row allocation, no virtual dispatch. */
  private[operators] def membershipInto(
      point: Array[Double], centroids: Array[Array[Double]], measure: String,
      m: Double, dis: Array[Double], u: Array[Double]): Unit = {
    val k = centroids.length
    var dmin = Double.MaxValue
    var i = 0
    if (measure == "euclidean") {
      while (i < k) {
        val c = centroids(i)
        var s = 0.0
        var j = 0
        while (j < c.length) { val t = point(j) - c(j); s += t * t; j += 1 }
        if (s == 0.0) s = 1e-20 // (1e-10)^2 — the reference's zero guard, squared
        dis(i) = s
        if (s < dmin) dmin = s
        i += 1
      }
    } else {
      val dist = VecOps.distance(measure) _
      while (i < k) {
        var d = dist(point, centroids(i))
        if (d == 0.0) d = 1e-10
        d = d * d
        dis(i) = d
        if (d < dmin) dmin = d
        i += 1
      }
    }
    val exp = 1.0 / (m - 1.0) // (2/(m-1)) / 2: dis holds squared distances
    var s = 0.0
    i = 0
    while (i < k) {
      val r = dmin / dis(i) // in (0, 1]
      val w = if (exp == 1.0) r else math.pow(r, exp)
      u(i) = w; s += w
      i += 1
    }
    i = 0
    while (i < k) { u(i) /= s; i += 1 }
  }

  /** Symmetric Dirichlet(1) row keyed by a per-point hash — deterministic
    * across partitionings (upgrade over the unseeded FCM.java:555-563). */
  private[operators] def dirichletRow(point: Array[Double], k: Int, seed: Long): Array[Double] = {
    val h = MurmurHash3.orderedHash(point.toSeq, (seed ^ (seed >>> 32)).toInt)
    val rng = new java.util.Random(seed * 31 + h)
    // alpha=1 symmetric Dirichlet == normalized Exp(1) draws.
    val e = Array.fill(k)(-math.log(1.0 - rng.nextDouble()))
    val s = e.sum
    e.map(_ / s)
  }

  /** Rows -> flat (rowCount, values) blocks for the iteration cache. */
  def blockify(rows: org.apache.spark.rdd.RDD[Array[Double]],
               blockSize: Int = 4096): org.apache.spark.rdd.RDD[(Int, Array[Double])] =
    rows.mapPartitions { it =>
      it.grouped(blockSize).map { g =>
        val d = g.head.length
        val flat = new Array[Double](g.length * d)
        var i = 0
        g.foreach { r => System.arraycopy(r, 0, flat, i * d, d); i += 1 }
        (g.length, flat)
      }
    }

  /** Driver loop over row blocks; returns final centroids. With
    * `explicitInit` the epoch-0 memberships are computed from the provided
    * centroids (so Canopy seeding actually shapes the fit); the Dirichlet
    * row init is the random-init path, matching FCM.java:74-81. */
  def runBlocks(blocks: org.apache.spark.rdd.RDD[(Int, Array[Double])],
                init: Array[Array[Double]], k: Int, m: Double, tol: Double,
                maxIter: Int, seed: Long, measure: String,
                explicitInit: Boolean = false): Array[Array[Double]] = {
    val sc = blocks.sparkContext
    var curr: Array[Array[Double]] = init
    require(curr.nonEmpty, "cannot fit FCM on an empty dataset")
    // Degenerate input (fewer rows than k): pad by repeating samples, like
    // the reference's selectRandomCentroids on duplicate-heavy data.
    while (curr.length < k) curr = curr ++ curr.take(k - curr.length)
    var prev: Array[Array[Double]] = null

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val bPrev = sc.broadcast(prev)
      val bCurr = sc.broadcast(curr)
      val dims = curr(0).length
      // One pass: membership under curr (epoch i) and prev (epoch i-1, or
      // the regenerated Dirichlet init), accumulating the centroid update
      // and max |delta u| exactly as FCM.java:422-503 does across tasks.
      val (sums, contrib, delta) = blocks.treeAggregate(
        (new Array[Double](k), Array.fill(k)(new Array[Double](dims)), -1.0))(
        seqOp = { case ((cs, pc, d0), (n, flat)) =>
          // per-block scratch: row + distance/membership buffers
          val p = new Array[Double](dims)
          val dis = new Array[Double](k)
          val uC = new Array[Double](k)
          val uP = new Array[Double](k)
          var d = d0
          var r = 0
          while (r < n) {
            System.arraycopy(flat, r * dims, p, 0, dims)
            val uCurr =
              if (iter == 0 && !explicitInit) dirichletRow(p, k, seed)
              else { membershipInto(p, bCurr.value, measure, m, dis, uC); uC }
            if (iter > 0) {
              val uPrev =
                if (iter == 1 && !explicitInit) dirichletRow(p, k, seed)
                else { membershipInto(p, bPrev.value, measure, m, dis, uP); uP }
              var i = 0
              while (i < k) {
                val t = math.abs(uCurr(i) - uPrev(i)); if (t > d) d = t; i += 1
              }
            }
            var i = 0
            while (i < k) {
              val u = uCurr(i)
              val um = if (m == 2.0) u * u else math.pow(u, m)
              cs(i) += um
              VecOps.axpy(um, p, pc(i))
              i += 1
            }
            r += 1
          }
          (cs, pc, d)
        },
        combOp = { case ((cs1, pc1, d1), (cs2, pc2, d2)) =>
          var i = 0
          while (i < k) { cs1(i) += cs2(i); VecOps.axpy(1.0, pc2(i), pc1(i)); i += 1 }
          (cs1, pc1, math.max(d1, d2))
        })
      bPrev.destroy(); bCurr.destroy()
      prev = curr
      curr = Array.tabulate(k) { i =>
        if (sums(i) == 0.0) prev(i) else VecOps.scal(1.0 / sums(i), contrib(i))
      }
      converged = iter > 0 && delta >= 0 && delta <= tol
      iter += 1
    }
    curr
  }

  /** Row-RDD convenience wrapper (init sampling + blocking). */
  def run(points: org.apache.spark.rdd.RDD[Array[Double]], k: Int, m: Double,
          tol: Double, maxIter: Int, seed: Long, measure: String,
          init: Option[Array[Array[Double]]] = None): Array[Array[Double]] = {
    val curr = init.getOrElse(points.takeSample(withReplacement = false, k, seed))
    runBlocks(blockify(points), curr, k, m, tol, maxIter, seed, measure,
      explicitInit = init.isDefined)
  }
}

/**
 * FCM predictor: argmax membership == nearest centroid (membership is
 * monotone-decreasing in distance), appended as an int prediction column
 * (FCMModel.java:74-143). Centroids ride a broadcast variable; the scoring
 * UDF runs over primitive arrays.
 */
class FCMModel(override val uid: String) extends Model[FCMModel]
    with FCMParams {

  def this() = this(Identifiable.randomUID("fcmModel"))

  private var centroids: Array[Array[Double]] = _
  def setCentroids(value: Array[Array[Double]]): this.type = { centroids = value; this }
  def getCentroids: Array[Array[Double]] = centroids

  def setFeaturesColM(value: String): this.type = set(featuresCol, value)

  /** Model data as a DataFrame (cluster_id, centroid) — the scalable analog
    * of FCMModelData (FCMModelData.java:35-47); the O(n*k) membership
    * matrix is intentionally NOT materialized (see membershipMatrix). */
  def modelData(spark: SparkSession): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("cluster_id", "centroid")
  }

  /** Per-row membership vector for a dataset — computed on demand instead
    * of being packed into one driver-side object like FCMModelData's
    * membershipMatrix (untenable at scale; the reference's own predictor
    * only ever uses the centroids, FCMModel.java:126-127). */
  def membershipMatrix(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    val measure = $(distanceMeasure); val fuzz = $(m)
    val uUdf = udf { (p: Seq[Double]) =>
      FCM.membership(p.toArray, bc.value, measure, fuzz)
    }
    df.withColumn("membership", uUdf(Features.asArray(df, $(featuresCol))))
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    val measure = $(distanceMeasure)
    val predictUdf = udf { (p: Seq[Double]) =>
      val arr = p.toArray
      val cs = bc.value
      val dist = VecOps.distance(measure) _
      var best = 0; var bestD = Double.MaxValue
      var i = 0
      while (i < cs.length) {
        val d = dist(arr, cs(i))
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      best
    }
    df.withColumn($(predictionCol), predictUdf(Features.asArray(df, $(featuresCol))))
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add($(predictionCol), IntegerType, nullable = false)

  override def copy(extra: ParamMap): FCMModel =
    copyValues(new FCMModel(uid).setCentroids(centroids), extra).setParent(parent)

  /** Parquet model layout: centroids under &lt;path&gt;/data (FCMModel.java:153-166
    * used custom byte encoders; Parquet replaces them). */
  def save(path: String, spark: SparkSession): Unit =
    modelData(spark).coalesce(1).write.mode("overwrite").parquet(s"$path/data")
}

object FCMModel {
  def load(spark: SparkSession, path: String): FCMModel = {
    val rows = spark.read.parquet(s"$path/data")
      .orderBy("cluster_id").collect()
    val cs = rows.map(_.getAs[Seq[Double]]("centroid").toArray)
    new FCMModel(Identifiable.randomUID("fcmModel")).setCentroids(cs)
  }
}

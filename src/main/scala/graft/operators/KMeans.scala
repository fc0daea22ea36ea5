package graft.operators

import graft.core._
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructType}

/**
 * Lloyd's k-means with ENGINE-REPRODUCIBLE determinism — the property
 * spark.ml's stock `clustering.KMeans` does not give you: k-means|| init
 * is seeded-random over partition layout, and its per-round double
 * reductions are partitioning-order-dependent, so two runs of the same
 * pipeline on differently-laid-out input produce different models. For a
 * training-data pipeline that must be replayable (and auditable against
 * an independent engine), this variant pins both sources of divergence:
 *
 *  - init: the k rows with the smallest 60-bit md5 of an id column
 *    (ties by id) — partition-independent, planned as a distributed
 *    TakeOrderedAndProject, and replayable by any engine with md5 (the
 *    same convention as FCM.setInitIdCol / Sampling.hashSample);
 *  - per round: new centroid = per-dimension decimal-scale-12 sum divided
 *    by the member count. Fixed-point addition is exact and associative,
 *    so the reduction order (Spark's aggregation tree, DuckDB's serial
 *    scan) cannot perturb the mean; scale 12 stays inside a double's
 *    17-digit shortest decimal representation so both engines round the
 *    cast identically (see Similarity.labelCentroids). Every round's
 *    centroids are therefore bit-identical across engines and across
 *    partitionings, which makes the whole ITERATIVE fit hash-exactly
 *    verifiable — not just spec-tested.
 *
 * Spark architecture (the FCM.runBlocks shape — one treeAggregate per
 * round over a cached blockified projection): features are quantized
 * ONCE at cache build to scale-12 unscaled longs with Spark's own
 * double->decimal(18,12) cast semantics (|x| < 1e6 enforced there —
 * per-row BigDecimal allocation inside the loop is what an earlier
 * DataFrame-aggregate formulation spent most of its time on), and each
 * round accumulates them into per-cluster 128-bit sums — the same
 * arithmetic DuckDB's own decimal sum uses — at primitive-long speed.
 * Per-round cost is one scan of the cached blocks; the driver holds
 * O(k*d) state, and nothing shuffles. The same loop runs unchanged on a
 * 1000-executor cluster. Assignment inside the fit mirrors the predict
 * expression's text-order double arithmetic exactly (left-to-right
 * squared-distance accumulation, first-min tie-break to the LOWEST
 * cluster index, NaN falling through to cluster k-1); an empty cluster
 * keeps its previous centroid.
 */

/** Thrown by [[KMeansDet.quantize12]] when a feature value is non-finite
  * or outside the exact scale-12 range. A DISTINCT type (not a bare
  * IllegalArgumentException) so callers that rewrap range errors with
  * operator-specific advice (the covariance moment loop) cannot
  * accidentally relabel an unrelated IAE as a magnitude problem. */
final class FeatureRangeException(msg: String)
  extends IllegalArgumentException(msg)

class KMeansDet(override val uid: String) extends Estimator[KMeansDetModel]
    with KMeansDetParams with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("kmeansdet"))

  private var initialCentroids: Option[Array[Array[Double]]] = None
  /** Seed fit with explicit centroids (e.g. Canopy centers); overrides k
    * and the hash-sample init. */
  def setInitialCentroids(value: Array[Array[Double]]): this.type = {
    initialCentroids = Some(value); set(k, value.length); this
  }

  def setK(value: Int): this.type = set(k, value)
  def setTol(value: Double): this.type = set(tol, value)
  def setMaxIter(value: Int): this.type = set(maxIter, value)
  def setInitIdCol(value: String): this.type = set(initIdCol, value)
  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setPredictionCol(value: String): this.type = set(predictionCol, value)

  override def fit(ds: Dataset[_]): KMeansDetModel = {
    val df = ds.toDF()
    val spark = df.sparkSession
    import spark.implicits._
    require(initialCentroids.isDefined || $(initIdCol).nonEmpty,
      "KMeansDet needs setInitialCentroids or setInitIdCol — determinism " +
        "is the point of this estimator; there is no random-init path.")
    val init: Array[Array[Double]] = initialCentroids.getOrElse {
      // Ordering by the fixed-width hex substring is identical to
      // ordering by its 60-bit numeric value (lowercase hex is
      // lexicographic-numeric) — same selection as the oracle's
      // ('0x' || substr(md5(...), 1, 15))::BIGINT sort, without conv's
      // per-row cost, which profiled 2x the md5 itself at 60M rows.
      val h = substring(md5(col($(initIdCol)).cast("string")), 1, 15)
      df.orderBy(h.asc, col($(initIdCol)).asc)
        .limit($(k))
        .select(Features.asArray(df, $(featuresCol)))
        .as[Array[Double]].collect()
    }
    require(init.nonEmpty, "cannot fit k-means on an empty dataset")
    // Degenerate input (fewer rows than k): pad by repeating samples so
    // the loop stays well-formed; duplicates collapse to empty clusters.
    var curr = init
    while (curr.length < $(k)) curr = curr ++ curr.take($(k) - curr.length)
    val dim = curr(0).length

    val rawRdd = df.select(Features.asArray(df, $(featuresCol))).rdd.map { r =>
      val s = r.getAs[scala.collection.Seq[Any]](0)
      require(s != null && s.length == dim && s.forall(_ != null),
        s"KMeansDet: feature vectors must be non-null with $dim non-null " +
          "elements")
      val a = new Array[Double](dim)
      var j = 0
      while (j < dim) { a(j) = s(j).asInstanceOf[Number].doubleValue; j += 1 }
      a
    }
    val blocks = KMeansDet.blockify(rawRdd, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val k0 = $(k)
    try {
      var iter = 0
      var converged = false
      while (iter < $(maxIter) && !converged) {
        val cc = curr
        val (cnt, hi, lo) = blocks.treeAggregate(
          (new Array[Long](k0), new Array[Long](k0 * dim),
            new Array[Long](k0 * dim)))(
          seqOp = { case (acc @ (cnt, hi, lo), (n, raw, q)) =>
            val dists = new Array[Double](k0)
            var r = 0
            while (r < n) {
              val base = r * dim
              var i = 0
              while (i < k0) {
                val c = cc(i)
                var s = 0.0; var j = 0
                while (j < dim) {
                  val t = raw(base + j) - c(j); s += t * t; j += 1
                }
                dists(i) = s
                i += 1
              }
              // first-min == assignExpr's chain: i wins iff d(i) <= every
              // later d; right-scan with a NaN-propagating running min is
              // equivalent clause-for-clause (NaN comparisons all false)
              var best = k0 - 1
              var mAfter = dists(k0 - 1)
              i = k0 - 2
              while (i >= 0) {
                val d = dists(i)
                if (d <= mAfter) best = i
                mAfter = java.lang.Math.min(d, mAfter)
                i -= 1
              }
              cnt(best) += 1
              val ob = best * dim
              var j = 0
              while (j < dim) {
                KMeansDet.add128(hi, lo, ob + j, q(base + j)); j += 1
              }
              r += 1
            }
            acc
          },
          combOp = { case ((cnt1, hi1, lo1), (cnt2, hi2, lo2)) =>
            var i = 0
            while (i < k0) { cnt1(i) += cnt2(i); i += 1 }
            var idx = 0
            while (idx < k0 * dim) {
              val a = lo1(idx); val b = lo2(idx)
              val nlo = a + b
              hi1(idx) += hi2(idx) + (((a & b) | ((a | b) & ~nlo)) >>> 63)
              lo1(idx) = nlo
              idx += 1
            }
            (cnt1, hi1, lo1)
          })
        val next = curr.map(_.clone())
        var i = 0
        while (i < k0) {
          if (cnt(i) != 0L) {
            var j = 0
            while (j < dim) {
              next(i)(j) =
                KMeansDet.mean128(hi(i * dim + j), lo(i * dim + j), cnt(i))
              j += 1
            }
          }
          i += 1
        }
        var delta = 0.0
        i = 0
        while (i < curr.length) {
          var j = 0
          while (j < dim) {
            val t = math.abs(next(i)(j) - curr(i)(j)); if (t > delta) delta = t
            j += 1
          }
          i += 1
        }
        curr = next
        converged = delta <= $(tol)
        iter += 1
      }
      copyValues(new KMeansDetModel(Identifiable.randomUID("kmeansdetModel"))
        .setCentroids(curr)).setParent(this)
    } finally blocks.unpersist(blocking = true)
  }

  override def transformSchema(schema: StructType): StructType = {
    require(!schema.fieldNames.contains($(predictionCol)),
      s"output column ${$(predictionCol)} already exists")
    schema.add($(predictionCol), IntegerType, nullable = false)
  }

  override def copy(extra: ParamMap): KMeansDet = defaultCopy(extra)
}

trait KMeansDetParams extends HasFeaturesCol with HasPredictionCol
    with HasMaxIter {
  final val k: IntParam =
    new IntParam(this, "k", "number of clusters", ParamValidators.gt(1))
  setDefault(k -> 3)
  final def getK: Int = $(k)

  /** Convergence tolerance on max |centroid shift|; 0.0 stops only on an
    * exact fixpoint (identical centroids two rounds running), which is
    * safe for unrolled-round oracles: once a fixpoint is hit every later
    * round reproduces it. */
  final val tol: DoubleParam =
    new DoubleParam(this, "tol", "convergence tolerance", ParamValidators.gtEq(0.0))
  setDefault(tol -> 0.0)
  final def getTol: Double = $(tol)

  /** Id column for the deterministic hash-sample init (smallest-k by
    * 60-bit md5, ties by id). Required unless explicit centroids are set. */
  final val initIdCol: Param[String] =
    new Param[String](this, "initIdCol",
      "id column for the deterministic hash-sample init")
  setDefault(initIdCol -> "")
  final def getInitIdCol: String = $(initIdCol)
}

object KMeansDet extends DefaultParamsReadable[KMeansDet] {

  /** Rows -> flat (rowCount, raw doubles, scale-12 unscaled longs) blocks
    * for the iteration cache. Quantization replicates Spark's
    * double->decimal(18,12) cast (shortest-repr BigDecimal, HALF_UP at
    * scale 12) exactly once per value; NaN/Inf/|x|>=1e6 fail fast here
    * rather than skewing sums silently. */
  def blockify(rows: org.apache.spark.rdd.RDD[Array[Double]], dim: Int,
               blockSize: Int = 4096)
      : org.apache.spark.rdd.RDD[(Int, Array[Double], Array[Long])] =
    rows.mapPartitions { it =>
      it.grouped(blockSize).map { g =>
        val n = g.length
        val raw = new Array[Double](n * dim)
        val q = new Array[Long](n * dim)
        var i = 0
        g.foreach { r =>
          var j = 0
          while (j < dim) {
            val x = r(j)
            raw(i * dim + j) = x
            q(i * dim + j) = quantize12(x)
            j += 1
          }
          i += 1
        }
        (n, raw, q)
      }
    }

  /** x as a scale-12 unscaled long with Spark's cast semantics:
    * BigDecimal over the double's SHORTEST decimal representation
    * (valueOf = Double.toString, exactly what Spark's Decimal(double)
    * builds), HALF_UP at scale 12 (what changePrecision applies).
    *
    * Fast path: `Math.round(x·1e12)` — valid whenever the scaled value
    * sits clearly away from a rounding boundary. The computed y and the
    * true shortest-repr decimal T differ by ≤ ~3 ulp(y) (one IEEE
    * multiply + the shortest-repr gap), so outside a 4·ulp guard band
    * around the half-integer boundary both round to the same long, and
    * ties/near-ties fall back to the exact BigDecimal path (~1e-3 of
    * calls). This removes the two-allocations-per-value cost that
    * dominated both the k-means cache build and the covariance moment
    * kernel (430M calls at the 100× embeddings point ≈ 34 GB of
    * BigDecimal churn). Exactness is pinned by PropertySpec against the
    * BigDecimal reference, and end-to-end by the hash-exact kmeans /
    * embed-cov oracles. */
  private[graft] def quantize12(x: Double): Long = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
      throw new FeatureRangeException(
        s"KMeansDet: non-finite feature value $x")
    if (math.abs(x) >= 1e6)
      throw new FeatureRangeException(
        s"KMeansDet: feature value $x out of range (exact scale-12 sums " +
          "need |x| < 1e6; rescale the features)")
    val y = x * 1e12
    val f = y - Math.floor(y)
    val band = Math.ulp(y) * 4.0 + 1e-9
    if (Math.abs(f - 0.5) > band) Math.round(y) else quantize12Exact(x)
  }

  /** The exact reference path (and boundary fallback) for
    * [[quantize12]]. */
  private[graft] def quantize12Exact(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** (hi, lo) 128-bit sums at flat index idx += sign-extended v — the
    * same arithmetic DuckDB's decimal sum runs in int128. */
  @inline private[operators] def add128(hi: Array[Long], lo: Array[Long],
                                        idx: Int, v: Long): Unit = {
    val l0 = lo(idx)
    val nlo = l0 + v
    hi(idx) += (v >> 63) + (((l0 & v) | ((l0 | v) & ~nlo)) >>> 63)
    lo(idx) = nlo
  }

  /** 128-bit scale-12 sum -> double mean, matching
    * `cast(sum AS DOUBLE) / count` bit-for-bit: reconstruct the exact
    * BigDecimal, shortest-round to double, then IEEE-divide by n. */
  private[operators] def mean128(hi: Long, lo: Long, n: Long): Double = {
    val big = (BigInt(hi) << 64) + BigInt(java.lang.Long.toUnsignedString(lo))
    new java.math.BigDecimal(big.bigInteger, 12).doubleValue() / n
  }

  /** First-min assignment as a codegen'd CASE chain: cluster i wins when
    * its squared distance is <= every LATER cluster's (earlier clusters
    * already failed their own clause), i.e. the first index attaining the
    * minimum. Identical text-order arithmetic to the SQL oracle, so the
    * doubles compare bit-equally in both engines. NaN features fall
    * through to cluster k-1 here (SQL comparisons with NaN differ across
    * engines) — filter NaN upstream when it can occur. */
  def assignExpr(fcols: Seq[Column], centroids: Array[Array[Double]]): Column = {
    val d: Array[Column] = centroids.map { c =>
      c.zipWithIndex.map { case (v, j) =>
        (fcols(j) - lit(v)) * (fcols(j) - lit(v))
      }.reduceLeft(_ + _)
    }
    val k = centroids.length
    (0 until k - 1).foldRight(lit(k - 1)) { (i, rest) =>
      val beatsLater = (i + 1 until k).map(l => d(i) <= d(l)).reduceLeft(_ && _)
      when(beatsLater, lit(i)).otherwise(rest)
    }.cast(IntegerType)
  }
}

/** Nearest-centroid predictor with the same first-min tie-break as the
  * fit's assignment step, appended as an int prediction column. Small k
  * runs as a literal codegen'd expression; beyond ~512 centroid cells the
  * same logic drops to a broadcast-backed UDF so the plan does not carry
  * a megabyte of expression tree. */
class KMeansDetModel(override val uid: String) extends Model[KMeansDetModel]
    with KMeansDetParams {

  def this() = this(Identifiable.randomUID("kmeansdetModel"))

  private var centroids: Array[Array[Double]] = _
  def setCentroids(value: Array[Array[Double]]): this.type = { centroids = value; this }
  def getCentroids: Array[Array[Double]] = centroids

  def modelData(spark: SparkSession): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("cluster_id", "centroid")
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val f = Features.asArray(df, $(featuresCol))
    val pred: Column =
      if (centroids.length.toLong * centroids(0).length <= 512) {
        val dim = centroids(0).length
        val fcols = (0 until dim).map(j => f.getItem(j))
        KMeansDet.assignExpr(fcols, centroids)
      } else {
        val bc = df.sparkSession.sparkContext.broadcast(centroids)
        udf { (p: Seq[Double]) =>
          val arr = p.toArray
          val cs = bc.value
          var best = 0; var bestD = Double.MaxValue
          var i = 0
          while (i < cs.length) {
            val c = cs(i)
            var s = 0.0; var j = 0
            while (j < c.length) { val t = arr(j) - c(j); s += t * t; j += 1 }
            if (s < bestD) { bestD = s; best = i }
            i += 1
          }
          best
        }.apply(f)
      }
    df.withColumn($(predictionCol), pred)
  }

  override def transformSchema(schema: StructType): StructType = {
    require(!schema.fieldNames.contains($(predictionCol)),
      s"output column ${$(predictionCol)} already exists")
    schema.add($(predictionCol), IntegerType, nullable = false)
  }

  override def copy(extra: ParamMap): KMeansDetModel =
    copyValues(new KMeansDetModel(uid).setCentroids(centroids), extra).setParent(parent)

  def save(path: String, spark: SparkSession): Unit =
    modelData(spark).coalesce(1).write.mode("overwrite").parquet(s"$path/data")
}

object KMeansDetModel {
  def load(spark: SparkSession, path: String): KMeansDetModel = {
    val rows = spark.read.parquet(s"$path/data")
      .orderBy("cluster_id").collect()
    val cs = rows.map(_.getAs[Seq[Double]]("centroid").toArray)
    new KMeansDetModel(Identifiable.randomUID("kmeansdetModel")).setCentroids(cs)
  }
}

package graft.core

/**
 * Small dense-vector helpers + distance measures.
 *
 * Mirrors the semantics of flink-ml's EuclideanDistanceMeasure /
 * CosineDistanceMeasure as used by the reference
 * (cn/swust/algorithms/fcm/FCM.java:527-553,
 * cn/swust/algorithms/canopy/Canopy.java:386-391).
 * spark.ml's BLAS is private[ml], so these are hand-rolled; all loops are
 * over primitive arrays (no boxing) and safe to call per-row in hot paths.
 */
object VecOps {

  /** y += a * x (flink-ml BLAS.axpy analog). */
  def axpy(a: Double, x: Array[Double], y: Array[Double]): Unit = {
    var i = 0
    while (i < x.length) { y(i) += a * x(i); i += 1 }
  }

  def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  def norm2(a: Array[Double]): Double = math.sqrt(dot(a, a))

  def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  def euclidean(a: Array[Double], b: Array[Double]): Double = math.sqrt(sqDist(a, b))

  /** Cosine distance 1 - cos(a,b); 0-norm inputs yield NaN like the reference. */
  def cosine(a: Array[Double], b: Array[Double]): Double =
    1.0 - dot(a, b) / (norm2(a) * norm2(b))

  def distance(measure: String)(a: Array[Double], b: Array[Double]): Double = measure match {
    case "euclidean" => euclidean(a, b)
    case "cosine"    => cosine(a, b)
    case m => throw new IllegalArgumentException(s"unknown distanceMeasure: $m")
  }

  def scal(a: Double, x: Array[Double]): Array[Double] = {
    val r = new Array[Double](x.length)
    var i = 0
    while (i < x.length) { r(i) = a * x(i); i += 1 }
    r
  }
}

package graft.operators

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructType}

/**
 * AHP (Analytic Hierarchy Process) + entropy-weight scoring.
 *
 * Semantics match the reference (cn/swust/algorithms/ahp/AHP.java:51-201):
 *  1. judgment-matrix weight vector = mean of geometric and arithmetic row
 *     averages (AHP.java:487-536 — including the reference's `sum = 1`
 *     initialization in the arithmetic average, which golden outputs embed);
 *  2. consistency ratio CR = CI/RI[m] must be < 0.1 (AHP.java:462-484);
 *  3. per-column min-max normalization, direction by indicatorType
 *     (1 positive (x-min)/(max-min), 0 negative (max-x)/(max-min),
 *     AHP.java:349-382);
 *  4. entropy weights over the normalized matrix: P = x/colSum,
 *     e_j from sum(P ln P) with 0*ln0 := 0, d_j = 1 - e_j, w_j = d_j/sum(d)
 *     (AHP.java:115-177);
 *  5. score_i = sum_j norm(i,j) * entropyW(j) * ahpW(j), appended as
 *     outputCol (AHP.java:180-198).
 *
 * Spark plan shape: two global aggregations + one projection. The entropy
 * term is derived in a single pass via
 * sum(p ln p) = (1/S) * sum(x ln x) - ln(S)  with S = colSum,
 * so no third scan is needed. All matrix math (O(cols^2)) runs on the
 * driver; per-row work is pure codegen'd expressions.
 */
class AHP(override val uid: String) extends Transformer
    with HasInputCols with HasOutputCol with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("ahp"))

  /** Pairwise judgment matrix (AHPParams.java:10-14). Stored flattened row-major. */
  final val judgmentMatrix: DoubleArrayParam =
    new DoubleArrayParam(this, "judgmentMatrix", "pairwise judgment matrix, row-major")
  def setJudgmentMatrix(m: Array[Array[Double]]): this.type = set(judgmentMatrix, m.flatten)
  def getJudgmentMatrix: Array[Array[Double]] = {
    val flat = $(judgmentMatrix); val n = math.sqrt(flat.length).toInt
    flat.grouped(n).toArray
  }

  /** 1 = positive (larger better), 0 = negative indicator (AHPParams.java:16-22). */
  final val indicatorType: IntArrayParam =
    new IntArrayParam(this, "indicatorType", "indicator direction per column (1|0)",
      (a: Array[Int]) => a.nonEmpty && a.forall(t => t == 0 || t == 1))
  def getIndicatorType: Array[Int] = $(indicatorType)
  def setIndicatorType(value: Array[Int]): this.type = set(indicatorType, value)

  def setInputCols(value: Array[String]): this.type = set(inputCols, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)
  setDefault(outputCol -> "score")

  override def transform(ds: Dataset[_]): DataFrame =
    AHP.score(ds.toDF(), $(inputCols), getJudgmentMatrix, $(indicatorType), $(outputCol))

  override def transformSchema(schema: StructType): StructType =
    schema.add($(outputCol), DoubleType, nullable = false)

  override def copy(extra: ParamMap): AHP = defaultCopy(extra)
}

object AHP extends DefaultParamsReadable[AHP] {

  /** Random-consistency index table (AHP.java:48). Index = matrix order. */
  private val RI = Array(0.0, 0.0, 0.58, 0.89, 1.12, 1.26, 1.36, 1.41, 1.46,
    1.49, 1.52, 1.54, 1.56, 1.58, 1.59)

  /**
   * Judgment-matrix weight vector: mean of geometric and arithmetic row
   * averages, each normalized (AHP.java:487-536). The arithmetic average
   * keeps the reference's `sum = 1` seed — golden outputs embed it.
   */
  def weightVector(m: Array[Array[Double]]): Array[Double] = {
    val n = m.length
    val geo = m.map(row => math.pow(row.foldLeft(1.0)(_ * _), 1.0 / n))
    val geoW = geo.map(_ / geo.sum)
    val arith = m.map(row => (1.0 + row.sum) / n)
    val arithW = arith.map(_ / arith.sum)
    Array.tabulate(n)(i => (geoW(i) + arithW(i)) / 2)
  }

  /** CR = CI/RI[m] with CI = (lambdaMax - m)/(m - 1) (AHP.java:462-484). */
  def consistencyRatio(m: Array[Array[Double]], w: Array[Double]): Double = {
    val n = m.length
    val total = (0 until n).map { i =>
      (0 until n).map(j => m(i)(j) * w(j)).sum / w(i)
    }.sum
    val lambdaMax = total / n
    val ci = (lambdaMax - n) / (n - 1)
    ci / RI(n)
  }

  def checkMatrix(m: Array[Array[Double]], nCols: Int): Unit = {
    require(nCols <= RI.length, s"at most ${RI.length} input columns supported")
    require(m != null && m.nonEmpty, "judgment matrix must be non-empty")
    require(m(0).length == nCols, "judgment matrix order must equal number of input columns")
  }

  /** Appends `outputCol: double` AHP+entropy score; keeps all input columns. */
  def score(df: DataFrame, inputCols: Array[String], judgment: Array[Array[Double]],
            indicatorType: Array[Int], outputCol: String): DataFrame = {
    checkMatrix(judgment, inputCols.length)
    require(indicatorType.length == inputCols.length,
      "indicatorType length must equal inputCols length")
    val ahpW = weightVector(judgment)
    val cr = consistencyRatio(judgment, ahpW)
    require(cr < 0.1, f"CR $cr%.4f is too large, please check your judgment matrix")

    val n = inputCols.length
    def x(i: Int): Column = col(inputCols(i)).cast(DoubleType)

    // Pass 1: per-column min/max (AHP.java:72-99).
    val aggs1 = (0 until n).flatMap(i => Seq(min(x(i)).as(s"mn_$i"), max(x(i)).as(s"mx_$i")))
    val s1 = df.agg(aggs1.head, aggs1.tail: _*).head()
    require(!s1.isNullAt(0), "cannot score an empty dataset")
    val mn = (0 until n).map(i => s1.getDouble(2 * i)).toArray
    val mx = (0 until n).map(i => s1.getDouble(2 * i + 1)).toArray

    // Min-max normalization, direction per indicatorType (AHP.java:349-382).
    // Constant columns (mx == mn) give NaN like the reference's Java 0/0.
    def norm(i: Int): Column =
      if (mx(i) == mn(i)) lit(Double.NaN)
      else if (indicatorType(i) == 1) (x(i) - lit(mn(i))) / lit(mx(i) - mn(i))
      else (lit(mx(i)) - x(i)) / lit(mx(i) - mn(i))

    // Pass 2: colSum, sum(x ln x) with 0 -> 0 guard (AHP.java:295-299), count.
    val aggs2 = (0 until n).flatMap { i =>
      val nm = norm(i)
      Seq(sum(nm).as(s"s_$i"),
        sum(when(nm > 0.0, nm * log(nm)).otherwise(0.0)).as(s"xlx_$i"))
    } :+ count(lit(1)).as("cnt")
    val s2 = df.agg(aggs2.head, aggs2.tail: _*).head()
    val cnt = s2.getLong(2 * n)
    val k = 1.0 / math.log(cnt.toDouble)
    // sum(p ln p) = (1/S) sum(x ln x) - ln S; e_j = -k * that; d_j = 1 - e_j.
    val d = (0 until n).map { i =>
      val s = s2.getDouble(2 * i); val xlx = s2.getDouble(2 * i + 1)
      val plnp = xlx / s - math.log(s)
      1.0 - (-k * plnp)
    }
    val entW = d.map(_ / d.sum)

    // Final projection (AHP.java:180-198).
    val score = (0 until n).map(i => norm(i) * lit(entW(i)) * lit(ahpW(i))).reduce(_ + _)
    df.withColumn(outputCol, score)
  }
}

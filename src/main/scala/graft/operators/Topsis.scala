package graft.operators

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.linalg.SQLDataTypes
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * TOPSIS multi-criteria ranking, re-expressed Spark-first.
 *
 * Semantics match the reference exactly
 * (cn/swust/algorithms/topsis/Topsis.java:58-247):
 *  1. positiveization per criteria type — 1 larger-better (identity),
 *     2 smaller-better (colMax - x), 3 intermediate
 *     (1 - |x-best| / max|x-best|), 4 interval (1 inside [a,b], linear
 *     falloff outside scaled by m = max(a - colMin, colMax - b))
 *     (Topsis.java:324-385);
 *  2. column L2 normalization x/sqrt(sum x^2) times per-column weight
 *     (Topsis.java:299-321);
 *  3. score = dMin / (dMax + dMin) against per-column max (ideal) and min
 *     (anti-ideal) of the normalized matrix (Topsis.java:261-297).
 *
 * Spark plan shape: two global aggregations (per-dim stats; partial+final
 * HashAggregate, no custom operators) + one projection — every per-row
 * expression stays inside whole-stage codegen. Stats are collected to the
 * driver (O(dims) scalars) and inlined as literals, so at cluster scale the
 * data is scanned three times with full column pruning and zero shuffles
 * beyond the two scalar aggregations.
 */
class Topsis(override val uid: String) extends Transformer
    with HasFeaturesCol with HasPredictionCol with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("topsis"))

  /** Per-column weights (TopsisParams.java:8-14). */
  final val weights: DoubleArrayParam =
    new DoubleArrayParam(this, "weights", "per-column weight", ParamValidators.arrayLengthGt(0))
  def getWeights: Array[Double] = $(weights)
  def setWeights(value: Array[Double]): this.type = set(weights, value)

  /** 1 larger-better, 2 smaller-better, 3 intermediate, 4 interval (TopsisParams.java:16-25). */
  final val criteriaTypes: IntArrayParam =
    new IntArrayParam(this, "criteriaTypes", "criteria type per column (1|2|3|4)",
      (a: Array[Int]) => a.nonEmpty && a.forall(t => t >= 1 && t <= 4))
  def getCriteriaTypes: Array[Int] = $(criteriaTypes)
  def setCriteriaTypes(value: Array[Int]): this.type = set(criteriaTypes, value)

  /** Best value for intermediate criteria (TopsisParams.java:27-32). */
  final val bestValue: DoubleParam = new DoubleParam(this, "bestValue", "intermediate best value")
  setDefault(bestValue -> 0.0)
  def getBestValue: Double = $(bestValue)
  def setBestValue(value: Double): this.type = set(bestValue, value)

  /** [lo, hi] for interval criteria (TopsisParams.java:34-40). */
  final val intervalValue: DoubleArrayParam =
    new DoubleArrayParam(this, "intervalValue", "interval [lo, hi] for interval criteria")
  setDefault(intervalValue -> Array(0.0, 0.0))
  def getIntervalValue: Array[Double] = $(intervalValue)
  def setIntervalValue(value: Array[Double]): this.type = set(intervalValue, value)

  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setPredictionCol(value: String): this.type = set(predictionCol, value)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val scored = Topsis.score(df, $(featuresCol), $(weights), $(criteriaTypes),
      $(bestValue), $(intervalValue), $(predictionCol))
    // Reference output schema is exactly (featuresCol, predictionCol) with
    // the prediction as a 1-dim vector (Topsis.java:251-258).
    import org.apache.spark.ml.functions.array_to_vector
    scored.select(col($(featuresCol)),
      array_to_vector(array(col($(predictionCol)))).as($(predictionCol)))
  }

  override def transformSchema(schema: StructType): StructType =
    new StructType()
      .add(schema($(featuresCol)))
      .add($(predictionCol), SQLDataTypes.VectorType, nullable = false)

  override def copy(extra: ParamMap): Topsis = defaultCopy(extra)
}

object Topsis extends DefaultParamsReadable[Topsis] {

  /**
   * Core scoring: appends `outputCol: double` to every row of `df`,
   * preserving all input columns (so callers can keep join keys — the
   * Transformer wrapper reproduces the reference's narrower output).
   */
  def score(df: DataFrame, featuresCol: String, weights: Array[Double],
            criteriaTypes: Array[Int], bestValue: Double,
            intervalValue: Array[Double], outputCol: String): DataFrame = {
    val dims = weights.length
    require(criteriaTypes.length == dims, "criteriaTypes and weights must have equal length")
    val feat = Features.asArray(df, featuresCol)
    def x(i: Int): Column = element_at(feat, i + 1)

    // Pass 1: raw per-dim stats needed by positiveization (Topsis.java:73-134).
    val statAggs = (0 until dims).flatMap { i =>
      Seq(min(x(i)).as(s"mn_$i"), max(x(i)).as(s"mx_$i"),
        max(abs(x(i) - lit(bestValue))).as(s"dev_$i"))
    }
    val s1 = df.agg(statAggs.head, statAggs.tail: _*).head()
    require(!s1.isNullAt(0), "cannot score an empty dataset")
    val colMin = (0 until dims).map(i => s1.getDouble(3 * i)).toArray
    val colMax = (0 until dims).map(i => s1.getDouble(3 * i + 1)).toArray
    val devMax = (0 until dims).map(i => s1.getDouble(3 * i + 2)).toArray

    // Positiveization expression per dim (Topsis.java:324-385). Zero
    // denominators reproduce the reference's Java IEEE semantics (NaN)
    // instead of ANSI-mode divide errors.
    def pos(i: Int): Column = criteriaTypes(i) match {
      case 1 => x(i)
      case 2 => lit(colMax(i)) - x(i)
      case 3 =>
        if (devMax(i) == 0.0) lit(Double.NaN)
        else lit(1.0) - abs(x(i) - lit(bestValue)) / lit(devMax(i))
      case 4 =>
        val lo = intervalValue(0); val hi = intervalValue(1)
        val m = math.max(lo - colMin(i), colMax(i) - hi)
        if (m == 0.0) when(x(i) >= lo && x(i) <= hi, lit(1.0)).otherwise(lit(Double.NaN))
        else when(x(i) < lo, lit(1.0) - (lit(lo) - x(i)) / lit(m))
          .when(x(i) <= hi, lit(1.0))
          .otherwise(lit(1.0) - (x(i) - lit(hi)) / lit(m))
    }
    val posArr = array((0 until dims).map(pos): _*)
    val withPos = df.withColumn("__graft_pos", posArr)
    def p(i: Int): Column = element_at(col("__graft_pos"), i + 1)

    // Pass 2: per-dim sum of squares + min/max of the positiveized matrix.
    // z = pos/sqrt(ss)*w is monotone per column, so the normalized matrix's
    // ideal/anti-ideal points derive from pos min/max on the driver —
    // this fuses the reference's three separate reduce passes
    // (Topsis.java:175-220) into one aggregation.
    val aggs2 = (0 until dims).flatMap { i =>
      Seq(sum(p(i) * p(i)).as(s"ss_$i"), min(p(i)).as(s"pmn_$i"), max(p(i)).as(s"pmx_$i"))
    }
    val s2 = withPos.agg(aggs2.head, aggs2.tail: _*).head()
    val denom = (0 until dims).map(i => math.sqrt(s2.getDouble(3 * i))).toArray
    val posMin = (0 until dims).map(i => s2.getDouble(3 * i + 1)).toArray
    val posMax = (0 until dims).map(i => s2.getDouble(3 * i + 2)).toArray
    val zLo = (0 until dims).map { i =>
      val a = posMin(i) / denom(i) * weights(i); val b = posMax(i) / denom(i) * weights(i)
      math.min(a, b)
    }
    val zHi = (0 until dims).map { i =>
      val a = posMin(i) / denom(i) * weights(i); val b = posMax(i) / denom(i) * weights(i)
      math.max(a, b)
    }

    // Final projection: distances to ideal/anti-ideal, score (Topsis.java:261-297).
    def z(i: Int): Column =
      if (denom(i) == 0.0) lit(Double.NaN)
      else p(i) / lit(denom(i)) * lit(weights(i))
    val maxDis = sqrt((0 until dims).map(i => pow(lit(zHi(i)) - z(i), 2)).reduce(_ + _))
    val minDis = sqrt((0 until dims).map(i => pow(lit(zLo(i)) - z(i), 2)).reduce(_ + _))
    withPos
      .withColumn(outputCol,
        when(maxDis + minDis =!= 0.0, minDis / (maxDis + minDis))
          .otherwise(lit(Double.NaN)))
      .drop("__graft_pos")
  }
}

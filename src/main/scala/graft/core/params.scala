package graft.core

import org.apache.spark.ml.param._

/**
 * Shared param mixins mirroring the reference's Flink ML param traits
 * (cn/swust/algorithms/&lt;algo&gt;Params.java; flink-ml HasFeaturesCol etc.).
 * Spark's own org.apache.spark.ml.param.shared._ traits are private[ml],
 * so we re-declare the small set we need on top of the public Params API.
 */
trait HasFeaturesCol extends Params {
  final val featuresCol: Param[String] =
    new Param[String](this, "featuresCol", "features column name (vector or array<numeric>)")
  setDefault(featuresCol -> "features")
  final def getFeaturesCol: String = $(featuresCol)
}

trait HasPredictionCol extends Params {
  final val predictionCol: Param[String] =
    new Param[String](this, "predictionCol", "prediction column name")
  setDefault(predictionCol -> "prediction")
  final def getPredictionCol: String = $(predictionCol)
}

trait HasInputCol extends Params {
  final val inputCol: Param[String] =
    new Param[String](this, "inputCol", "input column name")
  final def getInputCol: String = $(inputCol)
}

trait HasInputCols extends Params {
  final val inputCols: StringArrayParam =
    new StringArrayParam(this, "inputCols", "input column names")
  final def getInputCols: Array[String] = $(inputCols)
}

trait HasOutputCol extends Params {
  final val outputCol: Param[String] =
    new Param[String](this, "outputCol", "output column name")
  setDefault(outputCol -> "output")
  final def getOutputCol: String = $(outputCol)
}

trait HasOutputCols extends Params {
  final val outputCols: StringArrayParam =
    new StringArrayParam(this, "outputCols", "output column names")
  final def getOutputCols: Array[String] = $(outputCols)
}

trait HasMaxIter extends Params {
  final val maxIter: IntParam =
    new IntParam(this, "maxIter", "maximum number of iterations (>=0)", ParamValidators.gtEq(0))
  setDefault(maxIter -> 20)
  final def getMaxIter: Int = $(maxIter)
}

trait HasSeed extends Params {
  final val seed: LongParam = new LongParam(this, "seed", "random seed")
  // Reference default: class-name hash (flink-ml HasSeed); we keep the
  // same convention so param tests are meaningful, but everything that
  // samples is seeded (the reference's Dirichlet init was NOT).
  setDefault(seed -> this.getClass.getName.hashCode.toLong)
  final def getSeed: Long = $(seed)
}

trait HasDistanceMeasure extends Params {
  final val distanceMeasure: Param[String] = new Param[String](
    this, "distanceMeasure", "distance measure (euclidean|cosine)",
    ParamValidators.inArray(Array("euclidean", "cosine")))
  setDefault(distanceMeasure -> "euclidean")
  final def getDistanceMeasure: String = $(distanceMeasure)
}

trait HasTimeCol extends Params {
  final val timeCol: Param[String] =
    new Param[String](this, "timeCol", "event-time timestamp column")
  setDefault(timeCol -> "rowtime")
  final def getTimeCol: String = $(timeCol)
}

/**
 * Analog of the reference's HasWindows (flink-ml Windows param,
 * cn/swust/algorithms/ahp/OnlineAHPParams.java:5): a tumbling
 * event-time window duration as a Spark interval string; empty string
 * means global (single) window, the reference's GlobalWindows default.
 */
trait HasWindowDuration extends Params {
  final val windowDuration: Param[String] = new Param[String](
    this, "windowDuration", "tumbling window duration, e.g. '3 days'; '' = global window")
  setDefault(windowDuration -> "")
  final def getWindowDuration: String = $(windowDuration)
}

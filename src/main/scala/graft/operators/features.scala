package graft.operators

import graft.core._
import org.apache.spark.ml.{Estimator, Model, Transformer}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * MeanImputer: fit computes the mean of the non-null input column, transform
 * replaces nulls with it (featureGeneration/mean/MeanImputer.java:41-58,
 * MeanImputerModel.java:46-65). The reference collects the whole column to
 * the driver to average it (executeAndCollect, MeanImputer.java:44); here it
 * is one `avg` aggregate — a single partial+final HashAggregate at any scale.
 * The imputed column is appended (spark.ml composability).
 */
class MeanImputer(override val uid: String) extends Estimator[MeanImputerModel]
    with HasInputCol with HasOutputCol with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("meanImputer"))
  setDefault(outputCol -> "imputed_value") // MeanImputerParams.java:12-16

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  override def fit(ds: Dataset[_]): MeanImputerModel = {
    val mean = ds.toDF().agg(avg(col($(inputCol)))).head().getDouble(0)
    copyValues(new MeanImputerModel(Identifiable.randomUID("meanImputerModel"), mean))
      .setParent(this)
  }

  override def transformSchema(schema: StructType): StructType = {
    require(!schema.fieldNames.contains($(outputCol)),
      s"output column ${$(outputCol)} already exists") // spark.ml contract
    schema.add($(outputCol), DoubleType)
  }

  override def copy(extra: ParamMap): MeanImputer = defaultCopy(extra)
}

class MeanImputerModel(override val uid: String, val mean: Double)
    extends Model[MeanImputerModel] with HasInputCol with HasOutputCol {

  def this(uid: String) = this(uid, Double.NaN)
  setDefault(outputCol -> "imputed_value")

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  // APPEND the imputed column (idiomatic spark.ml: stages compose in a
  // Pipeline). The reference emitted a single-column replacement table
  // (MeanImputerModel.java:46-65) — an artifact of its demo wiring, and
  // fatal to stage composition; the q_mean_impute oracle pins the values.
  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF().withColumn($(outputCol),
      coalesce(col($(inputCol)).cast(DoubleType), lit(mean)))

  override def transformSchema(schema: StructType): StructType = {
    require(!schema.fieldNames.contains($(outputCol)),
      s"output column ${$(outputCol)} already exists")
    schema.add($(outputCol), DoubleType)
  }

  override def copy(extra: ParamMap): MeanImputerModel =
    copyValues(new MeanImputerModel(uid, mean), extra).setParent(parent)

  /** Parquet model layout (reference persisted via ReadWriteUtils,
    * MeanImputer.java:60-66). */
  def save(path: String): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    Seq(mean).toDF("mean").coalesce(1).write.mode("overwrite").parquet(s"$path/data")
  }
}

object MeanImputerModel {
  def load(spark: org.apache.spark.sql.SparkSession, path: String): MeanImputerModel =
    new MeanImputerModel(Identifiable.randomUID("meanImputerModel"),
      spark.read.parquet(s"$path/data").head().getDouble(0))
}

/**
 * StandardScaler. The reference's version is an identity stub — its fit is a
 * no-op and transform passes values through (standardScaler/
 * StandardScalerModel.java:62-64 admits the missing logic). This is the real
 * (x - mean) / stddev_samp, which is what that stub's own docs promise.
 */
class StandardScalerEst(override val uid: String)
    extends Estimator[StandardScalerModel]
    with HasInputCol with HasOutputCol with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("stdScaler"))
  setDefault(outputCol -> "scaled_value") // StandardScalerParams.java:12-16

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  override def fit(ds: Dataset[_]): StandardScalerModel = {
    val r = ds.toDF().agg(avg(col($(inputCol))), stddev_samp(col($(inputCol)))).head()
    copyValues(new StandardScalerModel(
      Identifiable.randomUID("stdScalerModel"), r.getDouble(0), r.getDouble(1)))
      .setParent(this)
  }

  override def transformSchema(schema: StructType): StructType = {
    require(!schema.fieldNames.contains($(outputCol)),
      s"output column ${$(outputCol)} already exists")
    schema.add($(outputCol), DoubleType)
  }

  override def copy(extra: ParamMap): StandardScalerEst = defaultCopy(extra)
}

class StandardScalerModel(override val uid: String, val mean: Double, val std: Double)
    extends Model[StandardScalerModel] with HasInputCol with HasOutputCol {

  def this(uid: String) = this(uid, 0.0, 1.0)
  setDefault(outputCol -> "scaled_value")

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCol(value: String): this.type = set(outputCol, value)

  // append, not replace — see MeanImputerModel.transform
  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF().withColumn($(outputCol),
      (col($(inputCol)).cast(DoubleType) - lit(mean)) / lit(std))

  override def transformSchema(schema: StructType): StructType = {
    require(!schema.fieldNames.contains($(outputCol)),
      s"output column ${$(outputCol)} already exists")
    schema.add($(outputCol), DoubleType)
  }

  override def copy(extra: ParamMap): StandardScalerModel =
    copyValues(new StandardScalerModel(uid, mean, std), extra).setParent(parent)

  def save(path: String): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    Seq((mean, std)).toDF("mean", "std").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/data")
  }
}

object StandardScalerModel {
  def load(spark: org.apache.spark.sql.SparkSession, path: String): StandardScalerModel = {
    val r = spark.read.parquet(s"$path/data").head()
    new StandardScalerModel(Identifiable.randomUID("stdScalerModel"),
      r.getDouble(0), r.getDouble(1))
  }
}

/**
 * TimeFeatureExtractor: parses `yyyy-MM-dd` date strings into
 * (year INT, month STRING "%02d", day STRING "%02d"); a null or unparsable
 * input yields an all-null row (featureGeneration/time/
 * TimeFeatureExtractor2.java:41-89 — string-typed month/day kept for
 * parity). The three columns are APPENDED (the reference emitted a
 * replacement table — demo wiring, not composable in a Pipeline).
 */
class TimeFeatureExtractor(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCols with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("timeFeatures"))
  setDefault(outputCols -> Array("year", "month", "day")) // TimeFeatureExtractorParams.java:12-16

  def setInputCol(value: String): this.type = set(inputCol, value)
  def setOutputCols(value: Array[String]): this.type = set(outputCols, value)

  override def transform(ds: Dataset[_]): DataFrame = {
    val Array(y, m, d) = $(outputCols)
    // Strict pattern first: to_date accepts junk like '2021-1-1'; the
    // reference regex-gates on ^\d{4}-\d{2}-\d{2}$ shape then parses
    // (TimeFeatureExtractor2.java:78-87).
    val parsed = when(col($(inputCol)).rlike("^\\d{4}-\\d{2}-\\d{2}$"),
      to_date(col($(inputCol)), "yyyy-MM-dd"))
    ds.toDF()
      .withColumn(y, year(parsed))
      .withColumn(m, when(parsed.isNotNull, format_string("%02d", month(parsed))))
      .withColumn(d, when(parsed.isNotNull, format_string("%02d", dayofmonth(parsed))))
  }

  override def transformSchema(schema: StructType): StructType = {
    val Array(y, m, d) = $(outputCols)
    Seq(y, m, d).foreach(c => require(!schema.fieldNames.contains(c),
      s"output column $c already exists"))
    schema.add(y, IntegerType).add(m, StringType).add(d, StringType)
  }

  override def copy(extra: ParamMap): TimeFeatureExtractor = defaultCopy(extra)
}

/**
 * AutoFeatureTransformer: walks the input schema and dispatches per column
 * type (featureGeneration/AutoFeatureTransformer.java:47-100):
 * StringType -> TimeFeatureExtractor; DoubleType -> mean imputation where
 * BOTH null and 0.0 count as missing (the reference first maps null->0.0
 * at AutoFeatureTransformer.java:141-148, then 0.0->mean at :198-208 — a
 * documented reference quirk we keep for parity, appending `newValue`);
 * IntegerType -> one-hot index array. Like the reference, the returned
 * table is the imputed one (AutoFeatureTransformer.java:100); the schema
 * walk itself is the tested surface.
 */
class AutoFeatureTransformer(override val uid: String) extends Transformer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("autoFeatures"))

  /** Per-type plans chosen from the runtime schema — exposed for tests. */
  def plan(schema: StructType): Map[String, String] =
    schema.fields.map { f =>
      f.name -> (f.dataType match {
        case StringType => "time"
        case DoubleType | FloatType => "mean_impute_zero_as_missing"
        case IntegerType | LongType => "one_hot"
        case _ => "passthrough"
      })
    }.toMap

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val doubles = df.schema.fields.collect {
      case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
    }
    val imputed = doubles.headOption match {
      case Some(c) =>
        // Reference parity: null -> 0.0 first, then 0.0 -> mean of the
        // non-zero values; result appended as `newValue`.
        val zeroed = df.withColumn("__v", coalesce(col(c).cast(DoubleType), lit(0.0)))
        val mean = zeroed.agg(avg(when(col("__v") =!= 0.0, col("__v")))).head().getDouble(0)
        zeroed.withColumn("newValue",
          when(col("__v") === 0.0, lit(mean)).otherwise(col("__v"))).drop("__v")
      case None => df
    }
    // Integer columns -> one-hot indicator arrays over the observed value
    // domain (the reference routes these to Flink ML's OneHotEncoder,
    // AutoFeatureTransformer.java:67-75). Domain collected once (one
    // distinct agg, LIMITED so an id-like column can't flood the driver
    // before the cap fires). One-hot only makes sense for small
    // categorical domains; for larger ones use a StringIndexer-style
    // frequency-ordered integer index (groupBy(c).count ordered by count
    // desc, broadcast-joined back) — dense vectors of 1000+ indicator
    // columns waste space even when they fit.
    val ints = df.schema.fields.collect {
      case f if f.dataType == IntegerType || f.dataType == LongType => f.name
    }
    val maxDomain = 1000
    ints.foldLeft(imputed) { (acc, c) =>
      val domain = df.select(col(c).cast(LongType)).na.drop()
        .distinct().orderBy(col(c)).limit(maxDomain + 1).collect().map(_.getLong(0))
      require(domain.length <= maxDomain,
        s"one-hot domain of '$c' exceeds $maxDomain distinct values: one-hot " +
          s"encoding is for small categorical domains. Drop or pre-bucket the " +
          s"column, or index it by frequency (StringIndexer-style) instead.")
      acc.withColumn(s"${c}_onehot",
        array(domain.map(v => when(col(c) === v, 1).otherwise(0)): _*))
    }
  }

  override def transformSchema(schema: StructType): StructType = {
    require(!schema.fieldNames.contains("newValue"),
      "output column newValue already exists")
    schema.add("newValue", DoubleType)
  }

  override def copy(extra: ParamMap): AutoFeatureTransformer = defaultCopy(extra)
}

object MeanImputer extends DefaultParamsReadable[MeanImputer]
object StandardScalerEst extends DefaultParamsReadable[StandardScalerEst]
object TimeFeatureExtractor extends DefaultParamsReadable[TimeFeatureExtractor]
object AutoFeatureTransformer extends DefaultParamsReadable[AutoFeatureTransformer]

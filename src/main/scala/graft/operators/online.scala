package graft.operators

import graft.core._
import org.apache.spark.ml.{Estimator, Model, Transformer}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tumbling event-time window helpers shared by the Online* operators.
  * The reference windows on epoch-millis event time assigned from a BIGINT
  * `id` field (OnlineTopsisExample.java:108-116); window start = epoch-
  * aligned floor, window maxTimestamp = start + size - 1
  * (Flink TimeWindow.maxTimestamp). An empty duration = the reference's
  * GlobalWindows default: one window over everything. */
object EventWindows {
  def durationMs(spec: String): Long = {
    val m = "(\\d+)\\s*(day|days|hour|hours|minute|minutes|second|seconds|millisecond|milliseconds|ms)".r
    spec.trim match {
      case m(n, unit) =>
        val mult = unit match {
          case u if u.startsWith("day") => 86400000L
          case u if u.startsWith("hour") => 3600000L
          case u if u.startsWith("minute") => 60000L
          case u if u.startsWith("second") => 1000L
          case _ => 1L
        }
        n.toLong * mult
      case other => throw new IllegalArgumentException(s"bad window duration: '$other'")
    }
  }

  /** Event-time column as epoch millis, whatever its carrier type. */
  def millis(df: DataFrame, timeCol: String): Column = df.schema(timeCol).dataType match {
    case LongType => col(timeCol)
    case TimestampType => unix_millis(col(timeCol))
    // naive timestamp read as UTC — sessions pin spark.sql.session.timeZone=UTC
    case TimestampNTZType => unix_millis(col(timeCol).cast(TimestampType))
    case other => throw new IllegalArgumentException(s"timeCol must be LongType millis or timestamp, got $other")
  }

  /** Window-start key; one global window when spec is empty. */
  def startCol(df: DataFrame, timeCol: String, spec: String): Column =
    if (spec.isEmpty) lit(0L)
    else {
      val d = durationMs(spec)
      (millis(df, timeCol) / d).cast(LongType) * d
    }

  /** Flink's window.maxTimestamp(): end - 1; Long.MaxValue for global. */
  def maxTimestampCol(spec: String): Column =
    if (spec.isEmpty) lit(Long.MaxValue)
    else lit(EventWindows.durationMs(spec)) + col("__wstart") - 1

  /**
   * Session windows: per key, a new session starts whenever the gap since
   * the previous event exceeds `gapMs`. Appends `session_id` (0-based per
   * key, in event-time order). Pure window functions — lag + a running sum
   * of gap-breaks — so one shuffle on the key and identical semantics in
   * any SQL engine. The 100 TB shape: partitions by key, sorts within
   * partitions only.
   */
  def sessionize(df: DataFrame, timeCol: String, keyCols: Seq[String],
                 gapMs: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(millis(df, timeCol))
    val t = millis(df, timeCol)
    val newSession = when(
      t - lag(t, 1).over(w) > gapMs || lag(t, 1).over(w).isNull, 1).otherwise(0)
    df.withColumn("session_id",
      (sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
        .cast(LongType))
  }

  /**
   * Streaming session windows: Spark's native `session_window` keyed by
   * `keyCols` — the same gap semantics as the batch `sessionize` (a
   * session closes when the next event is more than `gap` after the
   * previous one) INCLUDING the exact boundary: an event precisely `gap`
   * after its predecessor stays in-session in both forms (per-event
   * windows span [t, t+gap), but Spark merges abutting windows whose end
   * equals the next start — parity pinned in StreamingSpec).
   * Watermark-driven state eviction: closed
   * sessions emit in append mode and their state is dropped, so state
   * stays bounded by the number of OPEN sessions regardless of stream
   * length — the 100 TB streaming-ingest shape. Emits one row per closed
   * session: key cols, session_start/session_end millis, n_events,
   * duration_ms.
   */
  def sessionizeStream(ds: DataFrame, timeCol: String, keyCols: Seq[String],
                       gap: String, delay: String): DataFrame = {
    val withTime = ds
      .withColumn("__rowtime", timestamp_millis(millis(ds, timeCol)))
      .withWatermark("__rowtime", delay)
    withTime
      .groupBy(keyCols.map(col) :+ session_window(col("__rowtime"), gap): _*)
      .agg(count(lit(1)).as("n_events"),
        (unix_millis(max(col("__rowtime"))) - unix_millis(min(col("__rowtime"))))
          .as("duration_ms"))
      .select(keyCols.map(col) ++ Seq(
        unix_millis(col("session_window.start")).as("session_start"),
        unix_millis(col("session_window.end")).as("session_end"),
        col("n_events"), col("duration_ms")): _*)
  }

  /** All sliding-window starts containing the event: starts are epoch-
    * aligned multiples of `slide`; a timestamp t belongs to every start in
    * (t - win, t]. Requires win % slide == 0. Explode this to assign rows
    * to their ceil(win/slide) overlapping windows. */
  def slidingStartsCol(df: DataFrame, timeCol: String, winSpec: String,
                       slideSpec: String): Column = {
    val win = durationMs(winSpec); val slide = durationMs(slideSpec)
    require(win % slide == 0, s"window ($win ms) must be a multiple of slide ($slide ms)")
    val t = millis(df, timeCol)
    val startMax = (t / slide).cast(LongType) * slide
    sequence(startMax - win + slide, startMax, lit(slide))
  }
}

/**
 * OnlineAHP: AHP + entropy scoring computed INDEPENDENTLY inside each
 * event-time tumbling window (cn/swust/algorithms/ahp/OnlineAHP.java:82-186).
 * Semantic difference from batch AHP preserved: the entropy constant is
 * k = 1/ln(numCols), not 1/ln(rowCount) (OnlineAHP.java:151 vs AHP.java:158).
 *
 * Spark plan: the reference's parallelism-1 ProcessAllWindowFunction
 * becomes two window-keyed hash aggregations broadcast-joined back — every
 * window is processed in parallel and nothing is single-threaded, which is
 * what makes this run on 100 TB where the reference's windowAll cannot.
 */
class OnlineAHP(override val uid: String) extends Transformer
    with HasInputCols with HasOutputCol with HasTimeCol with HasWindowDuration
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("onlineAhp"))
  setDefault(outputCol -> "output")

  final val judgmentMatrix: DoubleArrayParam =
    new DoubleArrayParam(this, "judgmentMatrix", "pairwise judgment matrix, row-major")
  def setJudgmentMatrix(m: Array[Array[Double]]): this.type = set(judgmentMatrix, m.flatten)
  def getJudgmentMatrix: Array[Array[Double]] = {
    val flat = $(judgmentMatrix); val n = math.sqrt(flat.length).toInt
    flat.grouped(n).toArray
  }

  final val indicatorType: IntArrayParam =
    new IntArrayParam(this, "indicatorType", "indicator direction per column (1|0)",
      (a: Array[Int]) => a.nonEmpty && a.forall(t => t == 0 || t == 1))
  def setIndicatorType(value: Array[Int]): this.type = set(indicatorType, value)

  /** Slide duration; empty = tumbling (the reference supports only
    * tumbling/global — sliding is a capability extension). */
  final val slideDuration: Param[String] =
    new Param[String](this, "slideDuration", "slide duration; '' = tumbling")
  setDefault(slideDuration -> "")
  def setSlideDuration(value: String): this.type = set(slideDuration, value)

  def setInputCols(value: String*): this.type = set(inputCols, value.toArray)
  def setOutputCol(value: String): this.type = set(outputCol, value)
  def setTimeCol(value: String): this.type = set(timeCol, value)
  def setWindowDuration(value: String): this.type = set(windowDuration, value)

  override def transform(ds: Dataset[_]): DataFrame =
    OnlineAHP.score(ds.toDF(), $(inputCols), getJudgmentMatrix, $(indicatorType),
      $(timeCol), $(windowDuration), $(outputCol), $(slideDuration))

  override def transformSchema(schema: StructType): StructType =
    schema.add($(outputCol), DoubleType, nullable = false)

  override def copy(extra: ParamMap): OnlineAHP = defaultCopy(extra)
}

object OnlineAHP extends DefaultParamsReadable[OnlineAHP] {

  def score(df: DataFrame, inputCols: Array[String], judgment: Array[Array[Double]],
            indicatorType: Array[Int], timeCol: String, windowSpec: String,
            outputCol: String, slideSpec: String = ""): DataFrame = {
    AHP.checkMatrix(judgment, inputCols.length)
    val ahpW = AHP.weightVector(judgment)
    val cr = AHP.consistencyRatio(judgment, ahpW)
    require(cr < 0.1, f"CR $cr%.4f is too large, please check your judgment matrix")

    val n = inputCols.length
    def x(i: Int): Column = col(inputCols(i)).cast(DoubleType)
    // sliding windows: each row joins all its overlapping windows (one
    // output row per membership, disambiguated by __wstart)
    val withW =
      if (slideSpec.nonEmpty)
        df.withColumn("__wstart",
          explode(EventWindows.slidingStartsCol(df, timeCol, windowSpec, slideSpec)))
      else
        df.withColumn("__wstart", EventWindows.startCol(df, timeCol, windowSpec))

    // Pass 1: per-window per-column min/max (OnlineAHP.java:102-117).
    val aggs1 = (0 until n).flatMap(i =>
      Seq(min(x(i)).as(s"__mn_$i"), max(x(i)).as(s"__mx_$i")))
    val s1 = withW.groupBy(col("__wstart")).agg(aggs1.head, aggs1.tail: _*)

    // Per-window constant columns give NaN (Java 0/0), not ANSI errors.
    def norm(i: Int): Column = {
      val range = col(s"__mx_$i") - col(s"__mn_$i")
      val v = if (indicatorType(i) == 1) (x(i) - col(s"__mn_$i")) / range
        else (col(s"__mx_$i") - x(i)) / range
      when(range =!= 0.0, v).otherwise(lit(Double.NaN))
    }

    val j1 = withW.join(broadcast(s1), "__wstart")

    // Pass 2: per-window colSum + sum(x ln x); entropy via
    // sum(p ln p) = (1/S) sum(x ln x) - ln S (0*ln0 := 0 guard,
    // OnlineAHP.java:139-151).
    val aggs2 = (0 until n).flatMap { i =>
      val nm = norm(i)
      Seq(sum(nm).as(s"__s_$i"),
        sum(when(nm > 0.0, nm * log(nm)).otherwise(0.0)).as(s"__xlx_$i"))
    }
    val s2 = j1.groupBy(col("__wstart")).agg(aggs2.head, aggs2.tail: _*)

    val k = 1.0 / math.log(n.toDouble) // OnlineAHP.java:151 — cols, not rows
    def dW(i: Int): Column =
      when(col(s"__s_$i") =!= 0.0,
        lit(1.0) - (lit(-k) * (col(s"__xlx_$i") / col(s"__s_$i") - log(col(s"__s_$i")))))
        .otherwise(lit(Double.NaN))
    val dTotal = (0 until n).map(dW).reduce(_ + _)

    val score = (0 until n).map(i => norm(i) * lit(ahpW(i)) * (dW(i) / dTotal)).reduce(_ + _)
    val scored = j1.join(broadcast(s2), "__wstart").withColumn(outputCol, score)
    val outCols =
      if (slideSpec.nonEmpty)
        df.columns.map(col) :+ col("__wstart").as("window_start") :+ col(outputCol)
      else df.columns.map(col) :+ col(outputCol)
    scored.select(outCols: _*)
  }
}

/**
 * OnlineTopsis: per-window mean feature vector (+ window max-timestamp and
 * min event-timestamp) -> batch TOPSIS over the stream of window means ->
 * scores joined back (cn/swust/algorithms/topsis/OnlineTopsis.java:57-164).
 * fit() produces an OnlineTopsisModel whose model data has the reference
 * schema (data, timestamp, score, minTimestamp) (TopsisModelData.java:32-41).
 */
class OnlineTopsis(override val uid: String) extends Estimator[OnlineTopsisModel]
    with OnlineTopsisParams with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("onlineTopsis"))

  def setWeights(value: Double*): this.type = set(weights, value.toArray)
  def setCriteriaTypes(value: Int*): this.type = set(criteriaTypes, value.toArray)
  def setBestValue(value: Double): this.type = set(bestValue, value)
  def setIntervalValue(value: Array[Double]): this.type = set(intervalValue, value)
  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setPredictionCol(value: String): this.type = set(predictionCol, value)
  def setTimeCol(value: String): this.type = set(timeCol, value)
  def setWindowDuration(value: String): this.type = set(windowDuration, value)
  def setMaxAllowedModelDelayMs(value: Long): this.type = set(maxAllowedModelDelayMs, value)

  override def fit(ds: Dataset[_]): OnlineTopsisModel = {
    val df = ds.toDF()
    val spec = $(windowDuration)
    val withW = df
      .withColumn("__wstart", EventWindows.startCol(df, $(timeCol), spec))
      .withColumn("__ts", EventWindows.millis(df, $(timeCol)))
      .withColumn("__f", Features.asArray(df, $(featuresCol)))

    // Per-window elementwise mean + min event ts (OnlineTopsis.java:127-164).
    // posexplode keeps this a plain hash aggregation at any window count.
    val means = withW
      .select(col("__wstart"), col("__ts"), posexplode(col("__f")).as(Seq("__pos", "__v")))
      .groupBy(col("__wstart"), col("__pos"))
      .agg(avg(col("__v")).as("__avg"), min(col("__ts")).as("__mnts"))
      .groupBy(col("__wstart"))
      .agg(array_sort(collect_list(struct(col("__pos"), col("__avg"))))
          .getField("__avg").as("data"),
        min(col("__mnts")).as("minTimestamp"))
      .withColumn("timestamp", EventWindows.maxTimestampCol(spec))

    // Batch TOPSIS over the window means (OnlineTopsis.java:78,165-317).
    val scored = Topsis.score(means, "data", $(weights), $(criteriaTypes),
      $(bestValue), $(intervalValue), "score")
      .select(col("data"), col("timestamp"), col("score"), col("minTimestamp"))

    copyValues(new OnlineTopsisModel(Identifiable.randomUID("onlineTopsisModel"))
      .setModelData(scored.cache())).setParent(this)
  }

  override def transformSchema(schema: StructType): StructType = schema

  override def copy(extra: ParamMap): OnlineTopsis = defaultCopy(extra)
}

object OnlineTopsis extends DefaultParamsReadable[OnlineTopsis]

trait OnlineTopsisParams extends HasFeaturesCol with HasPredictionCol
    with HasTimeCol with HasWindowDuration {
  final val weights: DoubleArrayParam =
    new DoubleArrayParam(this, "weights", "per-column weight", ParamValidators.arrayLengthGt(0))
  final val criteriaTypes: IntArrayParam =
    new IntArrayParam(this, "criteriaTypes", "criteria type per column (1|2|3|4)",
      (a: Array[Int]) => a.nonEmpty && a.forall(t => t >= 1 && t <= 4))
  final val bestValue: DoubleParam = new DoubleParam(this, "bestValue", "intermediate best value")
  setDefault(bestValue -> 0.0)
  final val intervalValue: DoubleArrayParam =
    new DoubleArrayParam(this, "intervalValue", "interval [lo, hi] for interval criteria")
  setDefault(intervalValue -> Array(0.0, 0.0))
  /** Model-readiness gate (OnlineTopsisModelParams.java:5, default 0). */
  final val maxAllowedModelDelayMs: LongParam =
    new LongParam(this, "maxAllowedModelDelayMs", "max allowed model delay ms",
      ParamValidators.gtEq(0))
  setDefault(maxAllowedModelDelayMs -> 0L)
  final def getMaxAllowedModelDelayMs: Long = $(maxAllowedModelDelayMs)

  /** Driver-side guard: the model table is one row per time window —
    * small by construction — but over an unbounded time range it grows
    * without limit. Up to this many rows it is collected and scored as a
    * pure projection (no shuffle); above it, transform falls back to a
    * broadcast range join (default 1M rows ≈ 24 MB). */
  final val maxCollectedModelRows: LongParam =
    new LongParam(this, "maxCollectedModelRows",
      "max model rows collected to the driver before the broadcast-join fallback",
      ParamValidators.gt(0))
  setDefault(maxCollectedModelRows -> (1L << 20))
  final def getMaxCollectedModelRows: Long = $(maxCollectedModelRows)
}

/**
 * OnlineTopsisModel: each row with event timestamp t is scored by the
 * window model satisfying minTimestamp <= t - maxAllowedModelDelayMs <=
 * timestamp (OnlineTopsisModel.java:131-163). The reference buffers early
 * rows in operator state and drains them when a suitable model arrives; in
 * batch that collapses to an event-time range join against the (small,
 * broadcast) model table, picking the earliest suitable model — the one
 * that would have arrived first on the stream.
 */
class OnlineTopsisModel(override val uid: String) extends Model[OnlineTopsisModel]
    with OnlineTopsisParams {

  def this() = this(Identifiable.randomUID("onlineTopsisModel"))

  private var modelData: DataFrame = _
  def setModelData(value: DataFrame): this.type = { modelData = value; this }
  def getModelData: DataFrame = modelData

  def setTimeCol(value: String): this.type = set(timeCol, value)
  def setPredictionCol(value: String): this.type = set(predictionCol, value)
  def setMaxAllowedModelDelayMs(value: Long): this.type = set(maxAllowedModelDelayMs, value)
  def setMaxCollectedModelRows(value: Long): this.type = set(maxCollectedModelRows, value)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val delay = $(maxAllowedModelDelayMs)
    val t = EventWindows.millis(df, $(timeCol))
    val slim = modelData.select(col("timestamp").cast(LongType),
      col("minTimestamp").cast(LongType), col("score").cast(DoubleType))
    // The model table is one row per time window — small by construction —
    // so up to the collect cap the range join collapses to a broadcast
    // scan of the timestamp-sorted models: the first (= earliest, stream
    // arrival order) window with minTimestamp <= t - delay <= timestamp
    // wins; no match scores null. Scoring stays a pure projection: no
    // shuffle, no per-row window. When minTimestamps are monotone in
    // timestamp (always true for the tumbling windows fit() emits —
    // disjoint ordered ranges), the per-row scan is a binary search.
    val cap = $(maxCollectedModelRows)
    if (slim.limit(math.min(cap + 1, Int.MaxValue.toLong).toInt).count() <= cap) {
      val models = slim.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1)
      val monotone = models.length <= 1 ||
        models.sliding(2).forall(p => p(0)._2 <= p(1)._2)
      val bc = df.sparkSession.sparkContext.broadcast(models)
      val gateUdf = udf { (tm: Long) =>
        val ms = bc.value
        val te = tm - delay
        if (monotone) {
          // first i with timestamp >= te; its window matches iff its
          // minTimestamp <= te (later windows have larger minTimestamps)
          var lo = 0; var hi = ms.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (ms(mid)._1 >= te) hi = mid else lo = mid + 1
          }
          if (lo < ms.length && te >= ms(lo)._2) Some(ms(lo)._3) else None
        } else {
          var i = 0
          var res: Option[Double] = None
          while (i < ms.length && res.isEmpty) {
            if (te <= ms(i)._1 && te >= ms(i)._2) res = Some(ms(i)._3)
            i += 1
          }
          res
        }
      }
      df.withColumn($(predictionCol), gateUdf(t))
    } else {
      // Fallback past the driver cap: broadcast range join, earliest
      // (min-timestamp) suitable window per row — same pick order as the
      // scan. Row identity rides a transient id; original columns come
      // back via first() (constant within each group by construction).
      val te = t - delay
      val joined = df.withColumn("__rowid", monotonically_increasing_id())
        .join(broadcast(slim.withColumnRenamed("timestamp", "__mts")
          .withColumnRenamed("minTimestamp", "__mnts")
          .withColumnRenamed("score", "__msc")),
          te <= col("__mts") && te >= col("__mnts"), "left")
      val aggs = df.columns.map(c => first(col(c)).as(c)) :+
        min_by(col("__msc"), col("__mts")).as($(predictionCol))
      joined.groupBy(col("__rowid"))
        .agg(aggs.head, aggs.tail: _*)
        .select(df.columns.map(col) :+ col($(predictionCol)): _*)
    }
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add($(predictionCol), DoubleType)

  override def copy(extra: ParamMap): OnlineTopsisModel =
    copyValues(new OnlineTopsisModel(uid).setModelData(modelData), extra).setParent(parent)

  /** Model data (data, timestamp, score, minTimestamp) as parquet —
    * replaces the reference's custom byte encoders
    * (TopsisModelData.java:88-142). */
  def save(path: String): Unit =
    modelData.coalesce(1).write.mode("overwrite").parquet(s"$path/data")
}

object OnlineTopsisModel {
  def load(spark: org.apache.spark.sql.SparkSession, path: String): OnlineTopsisModel =
    new OnlineTopsisModel(Identifiable.randomUID("onlineTopsisModel"))
      .setModelData(spark.read.parquet(s"$path/data"))
}

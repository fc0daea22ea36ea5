package graft.streaming

import graft.core._
import graft.operators.{AHP, EventWindows, Topsis}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** A buffered event-time row inside one window's state. */
case class EvRow(tms: Long, features: Array[Double])

/** One bounded append chunk of a window's buffered events. */
case class EvChunk(rows: Array[EvRow])

/**
 * Insert-only keyed window state for the streaming OnlineAHP forms.
 *
 * The round-6 shape (flatMapGroupsWithState with ONE `Array[EvRow]` state
 * value per window) was a measured scale-killer: every microbatch
 * deserialized and rewrote the whole window buffer, so per-microbatch cost
 * grew with accumulated window VOLUME (~3 GB/state value and 341 s at the
 * 1000x stress point — SCALE.md round 6). Here arrivals land in a
 * `MapState[Long, Array[EvRow]]` under the window key as bounded APPEND
 * CHUNKS (<= `chunkSize` events from the current microbatch): every write
 * is a fresh RocksDB key — never a read-modify-write of existing state —
 * so per-microbatch cost is O(new events) regardless of what the window
 * already holds, and no state value ever exceeds chunkSize·|row| bytes
 * (~128 KB at the default — vs window-volume-bounded before). chunkSize=1
 * is the strict per-event limiting case; the default amortizes RocksDB
 * put/encoder overhead ~4096x, which the 1000x stress measured as the
 * difference between 674 s (per-event) and the monolithic buffer's 341 s
 * baseline. The only per-window mutable value is an 8-byte chunk counter.
 *
 * The buffer is materialized exactly once, in `handleExpiredTimer`, when
 * the event-time timer registered at first sight of the window fires
 * (watermark passed window end — the same trigger point as the Flink
 * reference, OnlineAHP.java:63-71). Scoring (`OnlineStreaming
 * .scoreWindow`) is order-insensitive — per-row scores depend only on the
 * row and whole-window column stats — so MapState iteration order does
 * not affect results.
 *
 * Requires the RocksDB state store provider (transformWithState needs
 * column families); callers set it at query start.
 *
 * @param toEv  pull the buffered event out of an input row
 * @param emit  build the output row from (window start, scored row)
 */
private[streaming] class AhpWindowProcessor[I, O](
    winMs: Long, ahpW: Array[Double], indicatorType: Array[Int],
    toEv: I => EvRow, emit: (Long, ScoredRow) => O,
    chunkSize: Int = 4096)
  extends StatefulProcessor[Long, I, O] {

  require(chunkSize >= 1, "chunkSize must be positive")

  @transient private var chunks: MapState[Long, EvChunk] = _
  @transient private var count: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    chunks = getHandle.getMapState[Long, EvChunk]("chunks",
      Encoders.scalaLong, Encoders.product[EvChunk], TTLConfig.NONE)
    count = getHandle.getValueState[Long]("count",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(wstart: Long, rows: Iterator[I],
      timers: TimerValues): Iterator[O] = {
    // first sight of this window arms its watermark trigger
    var n = if (count.exists()) count.get() else {
      getHandle.registerTimer(wstart + winMs - 1); 0L
    }
    rows.grouped(chunkSize).foreach { g =>
      chunks.updateValue(n, EvChunk(g.iterator.map(toEv).toArray)); n += 1
    }
    count.update(n)
    Iterator.empty
  }

  override def handleExpiredTimer(wstart: Long, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[O] = {
    val buf = chunks.values().flatMap(_.rows).toArray
    chunks.clear(); count.clear()
    OnlineStreaming.scoreWindow(buf, ahpW, indicatorType)
      .iterator.map(sr => emit(wstart, sr))
  }
}

/** Scored output row. */
case class ScoredRow(tms: Long, features: Array[Double], score: Double)

/** Sliding-window scored row: one output per (window, input row). */
case class SlidingScoredRow(wstart: Long, tms: Long, features: Array[Double],
                            score: Double)

/**
 * Structured Streaming forms of the Online* operators.
 *
 * The reference's Online* stages are event-time windowed DataStream
 * programs (cn/swust/algorithms/ahp/OnlineAHP.java:63-71,
 * …/topsis/OnlineTopsis.java:67-73) whose window state lives in Flink
 * operator state. Here:
 *
 *  - `onlineAhpStream` is the faithful streaming port of OnlineAHP's
 *    ProcessAllWindowFunction (OnlineAHP.java:82-186): rows buffer in
 *    per-EVENT keyed state (transformWithState + MapState, see
 *    AhpWindowProcessor) and are scored+emitted when the event-time
 *    watermark passes the window end — the event-time timer is the exact
 *    analog of Flink's window trigger on watermark passage. Unlike the
 *    reference's parallelism-1 windowAll, windows are keyed so distinct
 *    windows score on distinct executors, and unlike a single buffer
 *    value per window, per-microbatch state cost is O(new events),
 *    independent of accumulated window volume.
 *
 *  - `onlineTopsisModelStream` streams window means (the model-fitting
 *    aggregation of OnlineTopsis.java:127-164) as an append-mode windowed
 *    aggregation. The TOPSIS scoring over the means is CROSS-window
 *    (column max / sum-of-squares span all windows — OnlineTopsis.java:
 *    165-317), which is non-monotonic over an unbounded stream; the
 *    reference only gets away with it because its streams are bounded.
 *    We therefore score means per micro-batch in foreachBatch, the
 *    documented Spark pattern for bounded-replay semantics (SURVEY §2.1 A4).
 */
object OnlineStreaming {

  /** Event-time epoch-millis long -> timestamp col + watermark. */
  def withRowtime(ds: DataFrame, timeCol: String, delay: String): DataFrame =
    ds.withColumn("rowtime", timestamp_millis(col(timeCol)))
      .withWatermark("rowtime", delay)

  /**
   * Streaming OnlineAHP: per tumbling event-time window, buffer rows until
   * the watermark passes the window end, then run the in-window AHP+entropy
   * scoring (k = 1/ln(numCols), OnlineAHP.java:151) over the buffer and
   * emit one ScoredRow per input row.
   *
   * @param ds streaming Dataset with `tms: Long` epoch millis and
   *           `features: Array[Double]`, already watermarked via withRowtime
   */
  def onlineAhpStream(ds: DataFrame, judgment: Array[Array[Double]],
                      indicatorType: Array[Int], windowSpec: String,
                      watermarkDelay: String = "0 seconds"): Dataset[ScoredRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val ahpW = AHP.weightVector(judgment)
    val cr = AHP.consistencyRatio(judgment, ahpW)
    require(cr < 0.1, f"CR $cr%.4f is too large, please check your judgment matrix")
    val winMs = EventWindows.durationMs(windowSpec)

    val typed = withRowtime(ds, "tms", watermarkDelay)
      .select(col("tms"), col("features"), col("rowtime"))
      .as[(Long, Array[Double], java.sql.Timestamp)]

    typed
      .groupByKey { case (tms, _, _) => (tms / winMs) * winMs }
      .transformWithState(
        new AhpWindowProcessor[(Long, Array[Double], java.sql.Timestamp), ScoredRow](
          winMs, ahpW, indicatorType,
          { case (tms, f, _) => EvRow(tms, f) }, (_, sr) => sr),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /**
   * Sliding-window streaming OnlineAHP (capability extension — the
   * reference supports only tumbling/global): each row is assigned to
   * every window containing it, windows buffer independently in keyed
   * state and score when the watermark passes their end. Output is one
   * SlidingScoredRow per (window, row) membership, matching the batch
   * `OnlineAHP.setSlideDuration` form.
   */
  def onlineAhpStreamSliding(ds: DataFrame, judgment: Array[Array[Double]],
                             indicatorType: Array[Int], windowSpec: String,
                             slideSpec: String,
                             watermarkDelay: String = "0 seconds"): Dataset[SlidingScoredRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val ahpW = AHP.weightVector(judgment)
    val cr = AHP.consistencyRatio(judgment, ahpW)
    require(cr < 0.1, f"CR $cr%.4f is too large, please check your judgment matrix")
    val winMs = EventWindows.durationMs(windowSpec)

    // Window starts exploded as a COLUMN (not a typed flatMap): object-level
    // maps re-serialize and drop the watermark tag from `rowtime`, which
    // EventTimeTimeout requires downstream.
    val wm = withRowtime(ds, "tms", watermarkDelay)
    val typed = wm
      .withColumn("__wstart",
        explode(EventWindows.slidingStartsCol(wm, "tms", windowSpec, slideSpec)))
      .select(col("__wstart"), col("tms"), col("features"), col("rowtime"))
      .as[(Long, Long, Array[Double], java.sql.Timestamp)]

    typed
      .groupByKey(_._1)
      .transformWithState(
        new AhpWindowProcessor[(Long, Long, Array[Double], java.sql.Timestamp), SlidingScoredRow](
          winMs, ahpW, indicatorType,
          { case (_, tms, f, _) => EvRow(tms, f) },
          (wstart, sr) => SlidingScoredRow(wstart, sr.tms, sr.features, sr.score)),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The in-window scoring of OnlineAHP.java:94-175, verbatim semantics:
    * per-column min/max -> min-max normalize by indicator direction ->
    * entropy weights with k = 1/ln(numCols) -> score. */
  private[streaming] def scoreWindow(buf: Array[EvRow], ahpW: Array[Double],
                                     indicatorType: Array[Int]): Array[ScoredRow] = {
    if (buf.isEmpty) return Array.empty
    val n = indicatorType.length
    val mn = Array.fill(n)(Double.MaxValue); val mx = Array.fill(n)(Double.MinValue)
    buf.foreach { r =>
      var i = 0
      while (i < n) {
        if (r.features(i) < mn(i)) mn(i) = r.features(i)
        if (r.features(i) > mx(i)) mx(i) = r.features(i)
        i += 1
      }
    }
    val norm = buf.map { r =>
      Array.tabulate(n) { i =>
        if (indicatorType(i) == 1) (r.features(i) - mn(i)) / (mx(i) - mn(i))
        else (mx(i) - r.features(i)) / (mx(i) - mn(i))
      }
    }
    val colSum = Array.fill(n)(0.0)
    norm.foreach { t => var i = 0; while (i < n) { colSum(i) += t(i); i += 1 } }
    val e = Array.fill(n)(0.0)
    norm.foreach { t =>
      var i = 0
      while (i < n) {
        val p = t(i) / colSum(i)
        e(i) += (if (p == 0.0) 0.0 else p * math.log(p))
        i += 1
      }
    }
    val k = 1.0 / math.log(n.toDouble)
    val d = e.map(ei => 1.0 - (-k * ei))
    val dTot = d.sum
    buf.indices.map { ri =>
      var s = 0.0; var i = 0
      while (i < n) { s += norm(ri)(i) * ahpW(i) * (d(i) / dTot); i += 1 }
      ScoredRow(buf(ri).tms, buf(ri).features, s)
    }.toArray
  }

  /**
   * Streaming OnlineTopsis fit: window means as an append-mode watermarked
   * aggregation; per micro-batch, TOPSIS over the batch's emitted means.
   * `sink(batchDf)` receives (data, timestamp, minTimestamp, score) rows.
   * Returns the StreamingQuery (caller awaits/stops).
   */
  def onlineTopsisFitStream(ds: DataFrame, windowSpec: String,
                            weights: Array[Double], criteriaTypes: Array[Int],
                            watermarkDelay: String = "0 seconds")(
                            sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val winMs = EventWindows.durationMs(windowSpec)
    val means = withRowtime(ds, "tms", watermarkDelay)
      .select(col("tms"), col("rowtime"), posexplode(col("features")).as(Seq("__pos", "__v")))
      .groupBy(window(col("rowtime"), s"$winMs milliseconds"), col("__pos"))
      .agg(avg(col("__v")).as("__avg"), min(col("tms")).as("__mnts"))
      .groupBy(col("window"))
      .agg(array_sort(collect_list(struct(col("__pos"), col("__avg"))))
          .getField("__avg").as("data"),
        min(col("__mnts")).as("minTimestamp"))
      .select(col("data"),
        (unix_millis(col("window.end")) - 1).as("timestamp"), col("minTimestamp"))

    means.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          sink(Topsis.score(batch.toDF(), "data", weights, criteriaTypes,
            0.0, Array(0.0, 0.0), "score"))
        }
      }
      .start()
  }

  /**
   * Streaming OnlineTopsisModel scoring (the A5 gate,
   * OnlineTopsisModel.java:131-163): each streaming row with event time t
   * is scored by the fitted window model satisfying
   * minTimestamp <= t - maxAllowedModelDelayMs <= timestamp. The reference
   * buffers early rows in ListState and drains on model arrival; with a
   * FITTED (static) model table the same outcome is a stream-static range
   * join — rows whose model is missing get a null score, exactly the rows
   * the reference would still be buffering when the stream ends. Returns a
   * streaming DataFrame (input columns + `score`).
   */
  def onlineTopsisScoreStream(ds: DataFrame, modelData: DataFrame,
                              maxAllowedModelDelayMs: Long = 0L): DataFrame = {
    val md = broadcast(modelData.select(col("timestamp").as("__m_ts"),
      col("minTimestamp").as("__m_mnts"), col("score").as("__m_score")))
    ds.join(md,
        (col("tms") - maxAllowedModelDelayMs) <= col("__m_ts") &&
          (col("tms") - maxAllowedModelDelayMs) >= col("__m_mnts"),
        "left")
      .withColumn("score", col("__m_score"))
      .drop("__m_ts", "__m_mnts", "__m_score")
  }

  /**
   * Stream-stream model-gated scoring: BOTH the data rows and the model
   * records arrive as streams. This is the full analog of the reference's
   * two-input operator (OnlineTopsisModel.java:131-163): a data row whose
   * model has not arrived yet waits in join state and is emitted when a
   * suitable model-data row lands — Spark's stateful symmetric hash join
   * provides exactly that buffering, with watermark-driven state cleanup
   * instead of the reference's unbounded ListState.
   *
   * Stream-stream joins need an equality key, so the range condition
   * `minTimestamp <= t - delay <= timestamp` is bucketized: each model
   * window is exploded to the fixed-width time buckets it spans (one
   * bucket for tumbling windows) and a data row joins its own bucket.
   * At scale both sides hash-partition by bucket — no broadcast, state
   * per executor is one window-span of rows.
   *
   * @param data     streaming `tms: Long` (epoch millis) + payload cols
   * @param models   streaming model rows (timestamp, minTimestamp, score)
   * @param windowMs model window width; must be >= timestamp - minTimestamp
   *                 for every model row (true for tumbling-window fits)
   * @param delayMs  maxAllowedModelDelayMs
   */
  def onlineTopsisScoreStreamStream(data: DataFrame, models: DataFrame,
                                    windowMs: Long, delayMs: Long = 0L,
                                    lateness: String = "10 seconds"): DataFrame = {
    val d = data
      .withColumn("__bucket", floor((col("tms") - delayMs) / windowMs))
      .withColumn("__d_time", timestamp_millis(col("tms")))
      .withWatermark("__d_time", lateness)
      .alias("d")
    val m = models
      .select(col("timestamp").as("__m_ts"), col("minTimestamp").as("__m_mnts"),
        col("score").as("__m_score"))
      .withColumn("__bucket",
        explode(sequence(floor(col("__m_mnts") / windowMs),
          floor(col("__m_ts") / windowMs))))
      .withColumn("__m_time", timestamp_millis(col("__m_ts")))
      .withWatermark("__m_time", lateness)
      .alias("m")
    // The join condition may hold ONLY the equi-key plus inequalities
    // between the two WATERMARKED columns: StreamingJoinHelper derives
    // state-eviction bounds by eval'ing every other term in a time
    // conjunct, and any non-watermark attribute there is Unevaluable
    // (internal error). `__m_time >= __d_time - delay` is the exact upper
    // range bound (t - delay <= timestamp); the width bound is implied and
    // only ages state out.
    val joined = d.join(m,
      col("d.__bucket") === col("m.__bucket") &&
        col("__m_time") >= col("__d_time") - expr(s"INTERVAL $delayMs MILLISECOND") &&
        col("__m_time") <= col("__d_time") + expr(s"INTERVAL ${windowMs + delayMs} MILLISECOND"))
    // Exact lower range bound (minTimestamp <= t - delay) as a TYPED filter:
    // opaque to the optimizer, so it cannot be pushed back into the join
    // condition where the planner would trip on the non-watermark column.
    joined.filter((r: Row) =>
        r.getAs[Long]("tms") - delayMs >= r.getAs[Long]("__m_mnts"))
      .withColumn("score", col("__m_score"))
      .drop("__bucket", "__d_time", "__m_time", "__m_ts", "__m_mnts", "__m_score")
  }
}

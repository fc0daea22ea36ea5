package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One side's event for the streaming as-of state machine: `side` 0 =
  * right (reference stream), 1 = left (probe stream). */
case class AsofEvent(key: Long, tms: Long, side: Int, id: Long, value: Double)

/** Emitted match: one row per left event once the watermark finalizes it;
  * None = no right event at-or-before within tolerance (left outer). */
case class AsofMatch(key: Long, id: Long, tms: Long,
                     matchedTms: Option[Long], value: Option[Double])

/** Per-key state: pending lefts (awaiting watermark) + right history. */
case class AsofState(lefts: Array[(Long, Long)], rights: Array[(Long, Double)])

/**
 * Streaming backward as-of join — the stream form of
 * [[graft.operators.Joins.asofBackward]].
 *
 * Spark's stream-stream joins only support equality plus watermarked
 * interval bounds; "the LATEST right at-or-before t" is an argmax the
 * join state machine can't express. So, like the reference's
 * model-delay gate (OnlineTopsisModel.java:131-163 buffers early rows
 * in operator state and re-emits on model arrival), this is a keyed
 * state machine: both streams union into one keyed stream, each key
 * buffers pending left rows and the right-side history, and a left row
 * at time t is matched and emitted exactly when the event-time
 * watermark passes t — from then on no right row <= t can still arrive
 * (later ones are late by definition and dropped by the watermark), so
 * the emitted match is FINAL. Emission is append-mode with no retraction.
 *
 * State stays bounded without any TTL heuristic: pending lefts drain at
 * watermark speed, and the right history keeps only the newest right at
 * or below the watermark (every future left has t >= watermark, so that
 * row dominates all older ones) plus rights still above the watermark.
 * Per key that is O(lateness-window x right rate) — the same bound as a
 * stream-stream interval join, but holding one row beyond the window
 * instead of the whole window twice. With a FINITE tolerance, even the
 * dominant right expires once the watermark passes its time + tolerance
 * (no future left can accept it), so dead keys fully clear their state
 * and stop being processed; with an infinite tolerance the dominant
 * right per key is retained forever by the semantics themselves ("the
 * latest right however old") — O(1) per key, but supply a tolerance on
 * high-key-churn streams so dead keys actually vanish.
 *
 * Rights sharing an identical (key, time) tie-break by greatest value —
 * the same deterministic rule as the batch form, replay-stable.
 *
 * Both sides share one watermark (they union into one stream), so a
 * probe far ahead of the right stream advances it for rights too: a
 * right older than (max event time − lateness) is late and dropped,
 * exactly as in any event-time stream-stream join. Size `lateness` to
 * the real cross-stream disorder, not just within-stream disorder.
 *
 * At 100 TB-rate: hash-partitioned by key like every keyed stateful op;
 * the RocksDB state store holds the per-key arrays; one hot key
 * serializes that key's matching (same caveat as the batch form).
 */
object AsofStreaming {

  /** @param events    streaming Dataset of [[AsofEvent]]; epoch-millis tms
    * @param tolerance max allowed tms - matchedTms (stale matches → None)
    * @param lateness  watermark delay, e.g. "10 seconds" */
  def asofStream(events: DataFrame, tolerance: Long = Long.MaxValue,
                 lateness: String = "10 seconds"): Dataset[AsofMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("key").cast("long"), col("tms").cast("long"),
        col("side").cast("int"), col("id").cast("long"),
        col("value").cast("double"))
      .as[AsofEvent]
      .withColumn("rowtime", timestamp_millis(col("tms")))
      .withWatermark("rowtime", lateness)
      .as[AsofEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsofState, AsofMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, newEvents, state: GroupState[AsofState]) =>
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(AsofState(Array.empty, Array.empty))
          var lefts = prev.lefts
          var rights = prev.rights
          newEvents.foreach { e =>
            if (e.side == 1) lefts = lefts :+ ((e.tms, e.id))
            else rights = rights :+ ((e.tms, e.value))
          }
          // sorted by (time, value): equal-time rights tie-break by
          // greatest value — same deterministic rule as the batch form,
          // independent of arrival order (replay-stable)
          rights = rights.sorted
          // finalize every left the watermark has passed
          val (ready, pending) = lefts.partition(_._1 <= wm)
          val out = ready.sortBy(_._1).iterator.map { case (t, id) =>
            // latest right at-or-before t (rights sorted; scan from end)
            val m = rights.reverseIterator.find(_._1 <= t)
              .filter(r => t - r._1 <= tolerance)
            AsofMatch(key, id, t, m.map(_._1), m.map(_._2))
          }.toArray
          // prune right history: drop everything older than the newest
          // right at-or-below the watermark (it dominates them for every
          // future left, which must have t >= wm) ...
          val cut = rights.lastIndexWhere(_._1 <= wm)
          if (cut > 0) rights = rights.drop(cut)
          // ... and with a finite tolerance even the dominant right dies
          // once no future left (t >= wm) can accept it
          if (tolerance != Long.MaxValue)
            rights = rights.dropWhile(r => wm - r._1 > tolerance)
          if (pending.isEmpty && rights.isEmpty) state.remove()
          else {
            state.update(AsofState(pending, rights))
            if (pending.nonEmpty)
              // wake when the watermark passes the earliest pending left
              state.setTimeoutTimestamp(pending.map(_._1).min)
            else if (tolerance != Long.MaxValue)
              // wake when the last right expires, to clear dead-key state
              state.setTimeoutTimestamp(rights.map(_._1).max + tolerance + 1)
            // else: infinite tolerance — the dominant right is part of the
            // answer forever; no timeout, so idle keys are never reprocessed
          }
          out.iterator
      }
  }
}

package graft

import graft.operators.Joins
import graft.streaming.{AsofEvent, AsofStreaming}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming as-of join: matches finalize exactly when the watermark
  * passes the left row, results equal the batch asofBackward on the same
  * data, and out-of-order arrival within the watermark doesn't change
  * the outcome. */
class AsofStreamingSpec extends GraftSpec {
  import spark.implicits._

  // (key, tms, side, id, value): rights (side 0) at t=10/20/30 for key 1,
  // t=15 for key 2; lefts probe before/at/after, plus a keyless-right user.
  private val events = Seq(
    AsofEvent(1L, 10L, 0, 900L, 1.0), AsofEvent(1L, 20L, 0, 901L, 2.0),
    AsofEvent(1L, 30L, 0, 902L, 3.0), AsofEvent(2L, 15L, 0, 903L, 4.0),
    AsofEvent(1L, 25L, 1, 100L, 0.0), AsofEvent(1L, 30L, 1, 101L, 0.0),
    AsofEvent(1L, 5L, 1, 102L, 0.0), AsofEvent(2L, 50L, 1, 103L, 0.0),
    AsofEvent(3L, 40L, 1, 104L, 0.0))

  private def batchExpected(tolerance: Long): Map[Long, (Option[Long], Option[Double])] = {
    val l = events.filter(_.side == 1)
      .map(e => (e.id, e.key, e.tms)).toDF("id", "key", "tms")
    val r = events.filter(_.side == 0)
      .map(e => (e.key, e.tms, e.value)).toDF("key", "rtms", "value")
    Joins.asofBackward(l, r, Seq("key"), "tms", "rtms", Seq("value"), tolerance)
      .collect().map { row =>
        row.getAs[Long]("id") ->
          ((Option(row.get(row.fieldIndex("matched_time"))).map(_.asInstanceOf[Long]),
            Option(row.get(row.fieldIndex("value"))).map(_.asInstanceOf[Double])))
      }.toMap
  }

  private def run(tolerance: Long, name: String,
                  chunks: Seq[Seq[AsofEvent]]): Map[Long, (Option[Long], Option[Double])] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AsofEvent]
    val q = AsofStreaming.asofStream(mem.toDF(), tolerance, "1 second")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      // sentinel pushes the watermark past every probe
      mem.addData(Seq(AsofEvent(99L, 1000000L, 0, 999L, 0.0)))
      q.processAllAvailable()
      mem.addData(Seq(AsofEvent(99L, 2000000L, 0, 998L, 0.0)))
      q.processAllAvailable()
      spark.table(name).as[graft.streaming.AsofMatch].collect()
        .map(m => m.id -> ((m.matchedTms, m.value))).toMap
    } finally q.stop()
  }

  test("stream equals batch asofBackward (unbounded tolerance)") {
    val got = run(Long.MaxValue, "asof_s1", Seq(events))
    assert(got == batchExpected(Long.MaxValue))
    // spot-check semantics: at-or-before, equal-time inclusive, outer nulls
    assert(got(100L) == ((Some(20L), Some(2.0))))
    assert(got(101L) == ((Some(30L), Some(3.0))), "equal-time right matches")
    assert(got(102L) == ((None, None)), "left before any right")
    assert(got(104L) == ((None, None)), "key with no rights")
  }

  test("stream equals batch under tolerance") {
    val got = run(20L, "asof_s2", Seq(events))
    assert(got == batchExpected(20L))
    assert(got(103L) == ((None, None)), "50-15=35 > 20 rejected")
  }

  test("duplicate right timestamps tie-break by greatest value, any arrival order") {
    val l = Seq(AsofEvent(1L, 25L, 1, 100L, 0.0))
    val dupA = Seq(AsofEvent(1L, 20L, 0, 900L, 9.0), AsofEvent(1L, 20L, 0, 901L, 2.0))
    for ((rs, nm) <- Seq((dupA, "asof_d1"), (dupA.reverse, "asof_d2"))) {
      val got = run(Long.MaxValue, nm, Seq(rs ++ l))
      assert(got(100L) == ((Some(20L), Some(9.0))),
        s"greatest value must win (batch parity), got ${got(100L)}")
    }
  }

  test("finite tolerance clears dead-key state (expired rights removed)") {
    // a right whose time + tolerance is far behind the watermark must not
    // match a much-later left — and must have been prunable meanwhile
    val got = run(5L, "asof_tol", Seq(Seq(
      AsofEvent(7L, 10L, 0, 910L, 1.0), AsofEvent(7L, 500000L, 1, 300L, 0.0))))
    assert(got(300L) == ((None, None)))
  }

  test("asof stream restarts from a checkpoint with no lost or duplicate matches") {
    // durable sink + checkpointLocation; stop after one probe emitted
    // (one pending left + right history in state), deliver more rights
    // and probes while down, restart — the restored state must finalize
    // the pending probe against a right that arrived BEFORE the stop
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_asof_ck_").toString
    val mem = MemoryStream[AsofEvent]
    val out = AsofStreaming.asofStream(mem.toDF(), Long.MaxValue, "1 second")
    def start() = out.writeStream.format("parquet")
      .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ck")
      .outputMode("append").start()

    val q1 = start()
    try {
      // right@10, left@15 (finalized by the sentinel watermark push),
      // left@90000 stays PENDING in state across the stop
      mem.addData(Seq(AsofEvent(1L, 10L, 0, 900L, 1.0),
        AsofEvent(1L, 15L, 1, 100L, 0.0), AsofEvent(1L, 90000L, 1, 101L, 0.0),
        AsofEvent(50L, 20000L, 0, 998L, 0.0)))
      q1.processAllAvailable()
    } finally q1.stop()

    // arrives while the query is down: a fresher right below the pending
    // probe but ABOVE the checkpointed watermark (89000 — the probe
    // itself advanced it; anything older is late by event-time rules),
    // and the sentinel that pushes the watermark past the probe
    mem.addData(Seq(AsofEvent(1L, 89500L, 0, 901L, 8.0),
      AsofEvent(50L, 9000000L, 0, 999L, 0.0)))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()

    val got = spark.read.parquet(s"$tmp/out").as[graft.streaming.AsofMatch]
      .collect().filter(_.key == 1L).map(m => m.id -> ((m.matchedTms, m.value))).toMap
    assert(got.size == 2, s"exactly one row per probe: $got")
    assert(got(100L) == ((Some(10L), Some(1.0))), "pre-stop match stays emitted once")
    assert(got(101L) == ((Some(89500L), Some(8.0))),
      "pending probe restored from checkpoint matches the post-restart right")
  }

  test("out-of-order arrival within the watermark changes nothing") {
    // rights arrive AFTER the lefts that probe them, in a later batch,
    // while the watermark still permits them
    val lateRights = events.filter(_.side == 0)
    val leftsFirst = events.filter(_.side == 1)
    val got = run(Long.MaxValue, "asof_s3", Seq(leftsFirst, lateRights))
    assert(got == batchExpected(Long.MaxValue))
  }
}

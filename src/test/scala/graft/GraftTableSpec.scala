package graft

import graft.sources.GraftTable
import org.apache.spark.sql.functions._

/** Manifest-table semantics: atomic snapshots, manifest-side bucket
  * pruning, compaction invariance + time travel, snapshot delta, expire. */
class GraftTableSpec extends GraftSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_table_spec_").toString

  private def rows(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, i.toLong % 16, s"doc-$i"))
      .toDF("id", "bucket", "payload")

  test("append + read round-trips; manifests are atomic renames") {
    val dir = freshDir()
    GraftTable.append(rows(0, 100), dir, "bucket")
    GraftTable.append(rows(100, 150), dir, "bucket")
    val got = GraftTable.read(spark, dir).orderBy("id").collect()
    assert(got.length == 150 && got.head.getLong(0) == 0L &&
      got.last.getLong(0) == 149L)
    assert(GraftTable.snapshotIds(spark, dir) == Seq(1L, 2L))
    // no torn temp manifests left behind (dot-files = Hadoop crc
    // sidecars); only snapshot lists and manifest shards may exist
    val mf = new java.io.File(s"$dir/_manifests").listFiles().map(_.getName)
      .filterNot(_.startsWith("."))
    assert(mf.forall(n =>
      (n.startsWith("snapshot-") || n.startsWith("manifest-")) &&
        n.endsWith(".json")), mf.toSeq)
  }

  test("two-level manifests: one immutable shard per append, O(#shards) lists") {
    val dir = freshDir()
    (0 until 4).foreach(k =>
      GraftTable.append(rows(k * 100, k * 100 + 100), dir, "bucket",
        numFiles = Some(4)))
    val meta = GraftTable.snapshotMeta(spark, dir).get
    assert(meta.refs.length == 4, s"one shard per append: ${meta.refs}")
    // shard aggregates reconcile with the materialized file set
    val snap = GraftTable.snapshot(spark, dir).get
    assert(meta.refs.map(_.nFiles).sum == snap.files.length)
    assert(meta.refs.map(_.rows).sum == snap.files.map(_.rows).sum)
    assert(meta.refs.map(_.minBucket).min == snap.files.map(_.minBucket).min)
    assert(meta.refs.map(_.maxBucket).max == snap.files.map(_.maxBucket).max)
    // an earlier snapshot's list references the SAME immutable shards —
    // a commit never rewrites history, only adds its own shard
    val m2 = GraftTable.snapshotMeta(spark, dir, Some(2L)).get
    assert(m2.refs.length == 2)
    assert(m2.refs.map(_.name).toSet.subsetOf(meta.refs.map(_.name).toSet))
    // every entry materializes with its shard's commit identity
    assert(snap.files.map(_.addedAt).toSet == Set(1L, 2L, 3L, 4L))
    assert(snap.files.forall(_.kind == "append"))
  }

  test("expire garbage-collects shards no kept snapshot references") {
    val dir = freshDir()
    (0 until 5).foreach(k =>
      GraftTable.append(rows(k * 50, k * 50 + 50), dir, "bucket"))
    GraftTable.compact(spark, dir, targetFileBytes = 1L << 30, minFiles = 2)
    GraftTable.expire(spark, dir, keepSnapshots = 1)
    val kept = GraftTable.snapshotMeta(spark, dir).get
    val onDisk = new java.io.File(s"$dir/_manifests").listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSet
    assert(onDisk ==
      kept.refs.map(_.name).toSet + f"snapshot-${kept.id}%09d.json",
      s"orphan shards must be deleted: $onDisk vs ${kept.refs.map(_.name)}")
    // and the kept snapshot still reads completely
    assert(GraftTable.read(spark, dir).count() == 250)
  }

  test("readBuckets prunes manifest-side: only intersecting files open") {
    val dir = freshDir()
    GraftTable.append(rows(0, 1600), dir, "bucket", numFiles = Some(8))
    val snap = GraftTable.snapshot(spark, dir).get
    assert(snap.files.length >= 2, "need multiple files to demonstrate pruning")
    val pruned = GraftTable.readBuckets(spark, dir, 3, 4)
    val hitFiles = pruned.inputFiles.toSet
    val allFiles = GraftTable.read(spark, dir).inputFiles.toSet
    assert(hitFiles.subsetOf(allFiles))
    assert(hitFiles.size < allFiles.size,
      s"pruning must skip files: ${hitFiles.size} vs ${allFiles.size}")
    // every skipped file's manifest range really excludes [3,4]
    val skipped = snap.files.filter(e => !hitFiles.exists(_.endsWith(
      new org.apache.hadoop.fs.Path(e.path).getName)))
    assert(skipped.forall(e => e.maxBucket < 3 || e.minBucket > 4))
    // and the values equal the unpruned filter
    val want = GraftTable.read(spark, dir)
      .filter(col("bucket").between(3, 4)).orderBy("id").collect().toSeq
    assert(pruned.orderBy("id").collect().toSeq == want)
  }

  test("readForBuckets: bucket-set pruning equals the isin filter") {
    val dir = freshDir()
    GraftTable.append(rows(0, 1600), dir, "bucket", numFiles = Some(8))
    val picked = Array(1L, 9L, 15L)
    val got = GraftTable.readForBuckets(spark, dir, picked)
    val want = GraftTable.read(spark, dir)
      .filter(col("bucket").isin(picked.map(java.lang.Long.valueOf): _*))
      .orderBy("id").collect().toSeq
    assert(got.orderBy("id").collect().toSeq == want)
    assert(got.inputFiles.length < GraftTable.read(spark, dir).inputFiles.length)
  }

  test("compact: row multiset unchanged, fewer files, old snapshot time-travels") {
    val dir = freshDir()
    (0 until 6).foreach(k => GraftTable.append(rows(k * 50, k * 50 + 50), dir, "bucket"))
    val before = GraftTable.read(spark, dir)
    val nFilesBefore = before.inputFiles.length
    val beforeRows = before.orderBy("id").collect().toSeq
    val snap = GraftTable.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(snap.files.forall(_.kind == "compact"))
    val after = GraftTable.read(spark, dir)
    assert(after.inputFiles.length < nFilesBefore,
      s"${after.inputFiles.length} vs $nFilesBefore")
    assert(after.orderBy("id").collect().toSeq == beforeRows)
    // snapshot 6 (pre-compaction) still reads its own files
    val old = GraftTable.read(spark, dir, Some(6L))
    assert(old.orderBy("id").collect().toSeq == beforeRows)
    // compacted files are range-clustered: bucket ranges don't all overlap
    if (snap.files.length >= 2) {
      val sorted = snap.files.sortBy(_.minBucket)
      assert(sorted.head.maxBucket <= sorted.last.minBucket ||
        sorted.head.minBucket != sorted.last.minBucket)
    }
  }

  test("delta: exactly the appended rows, across a compaction; expire bounds it") {
    val dir = freshDir()
    GraftTable.append(rows(0, 100), dir, "bucket") // snapshot 1
    GraftTable.append(rows(100, 130), dir, "bucket") // snapshot 2
    GraftTable.compact(spark, dir, targetFileBytes = 1L << 30, minFiles = 2) // 3
    GraftTable.append(rows(130, 140), dir, "bucket") // snapshot 4
    val d12 = GraftTable.delta(spark, dir, 1L, Some(2L))
      .select("id").as[Long].collect().sorted
    assert(d12.toSeq == (100L until 130L).toSeq)
    val d14 = GraftTable.delta(spark, dir, 1L)
      .select("id").as[Long].collect().sorted
    assert(d14.toSeq == (100L until 140L).toSeq, "compaction adds no delta rows")
    // expire to the last 2 snapshots: delta from snapshot 1 now refuses
    val (droppedM, deletedF) = GraftTable.expire(spark, dir, keepSnapshots = 2)
    assert(droppedM == 2 && deletedF > 0)
    val e = intercept[IllegalArgumentException] {
      GraftTable.delta(spark, dir, 1L).collect()
    }
    assert(e.getMessage.contains("expire"), e.getMessage)
    // the kept snapshots still read fine after expire
    assert(GraftTable.read(spark, dir).count() == 140)
  }

  test("concurrent appends: both writers survive with all rows present") {
    // two threads race the optimistic publish path — the loser must
    // rebase on the winner's snapshot and retry, so EVERY row from both
    // appends lands in the final manifest (the round-11 verdict's
    // lost-update scenario: last-wins rename silently erased one side)
    val dir = freshDir()
    GraftTable.append(rows(0, 50), dir, "bucket") // base snapshot
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tasks = Seq(rows(50, 120), rows(120, 200)).map { df =>
      pool.submit(new Runnable {
        def run(): Unit =
          try { gate.await(); GraftTable.append(df, dir, "bucket"); () }
          catch { case t: Throwable => errs.add(t) }
      })
    }
    gate.countDown()
    tasks.foreach(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(errs.isEmpty, errs.toString)
    val ids = GraftTable.snapshotIds(spark, dir)
    assert(ids == Seq(1L, 2L, 3L), s"both commits must publish: $ids")
    val got = GraftTable.read(spark, dir).select("id").as[Long].collect().sorted
    assert(got.toSeq == (0L until 200L).toSeq,
      s"lost rows: ${got.length} of 200")
    // no claim files left behind
    val leftovers = new java.io.File(s"$dir/_manifests").listFiles()
      .map(_.getName).filter(_.endsWith(".claim"))
    assert(leftovers.isEmpty, leftovers.toSeq)
  }

  test("append enforces the table schema (names + types)") {
    val dir = freshDir()
    GraftTable.append(rows(0, 10), dir, "bucket")
    // extra column
    val e1 = intercept[IllegalArgumentException] {
      GraftTable.append(rows(10, 20).withColumn("extra", lit(1)), dir, "bucket")
    }
    assert(e1.getMessage.contains("schema mismatch"), e1.getMessage)
    // same names, different type
    val e2 = intercept[IllegalArgumentException] {
      GraftTable.append(
        rows(10, 20).withColumn("payload", col("payload").cast("binary")),
        dir, "bucket")
    }
    assert(e2.getMessage.contains("schema mismatch"), e2.getMessage)
    // column order must NOT matter (Delta-style name-based enforcement)
    GraftTable.append(rows(10, 20).select("payload", "id", "bucket"), dir, "bucket")
    assert(GraftTable.read(spark, dir).count() == 20)
  }

  test("schema evolution: mergeSchema appends new columns, old rows read null") {
    val dir = freshDir()
    GraftTable.append(rows(0, 100), dir, "bucket") // snapshot 1: 3 columns
    // strict append of a wider frame still fails
    val e = intercept[IllegalArgumentException] {
      GraftTable.append(rows(100, 150).withColumn("lang", lit("en")), dir, "bucket")
    }
    assert(e.getMessage.contains("mergeSchema"), e.getMessage)
    // merge append evolves the schema
    GraftTable.append(rows(100, 150).withColumn("lang", lit("en")), dir, "bucket",
      mergeSchema = true)
    val got = GraftTable.read(spark, dir)
    assert(got.schema.fieldNames.toSeq == Seq("id", "bucket", "payload", "lang"))
    assert(got.filter(col("lang").isNull).count() == 100, "old rows surface null")
    assert(got.filter(col("lang") === "en").count() == 50)
    // an append OMITTING the evolved column fills it with nulls
    GraftTable.append(rows(150, 160), dir, "bucket", mergeSchema = true)
    assert(GraftTable.read(spark, dir).filter(col("lang").isNull).count() == 110)
    // time travel: snapshot 1 predates the column entirely
    assert(!GraftTable.read(spark, dir, Some(1L)).schema.fieldNames.contains("lang"))
    // type change is rejected even under mergeSchema
    val e2 = intercept[IllegalArgumentException] {
      GraftTable.append(
        rows(160, 170).withColumn("lang", lit(7)), dir, "bucket", mergeSchema = true)
    }
    assert(e2.getMessage.contains("type change"), e2.getMessage)
    // pruned reads and delta go through the same stored-schema path
    assert(GraftTable.readBuckets(spark, dir, 0, 15)
      .schema.fieldNames.contains("lang"))
    assert(GraftTable.delta(spark, dir, 1L).filter(col("lang").isNull).count() == 10)
  }

  test("compaction after evolution materializes the union schema") {
    val dir = freshDir()
    GraftTable.append(rows(0, 100), dir, "bucket")
    GraftTable.append(rows(100, 150).withColumn("lang", lit("xx")), dir, "bucket",
      mergeSchema = true)
    val before = GraftTable.read(spark, dir)
      .orderBy("id").collect().toSeq
    GraftTable.compact(spark, dir, targetFileBytes = 1L << 30, minFiles = 2)
    val after = GraftTable.read(spark, dir)
    assert(after.schema.fieldNames.toSeq == Seq("id", "bucket", "payload", "lang"))
    assert(after.orderBy("id").collect().toSeq == before,
      "row multiset incl. evolved nulls unchanged by compaction")
  }

  test("zone maps + z-order compact: readWhere prunes on a second dimension") {
    val dir = freshDir()
    // ts is independent of bucket: under the bucket-range layout every
    // file spans the full ts range, so a ts predicate can prune nothing
    // 16 input files so the z-compact rewrites to 15 — each covers
    // ~6.7% of the curve, a wide margin over the 3% ts box even under
    // range-partitioner sampling error (the boundary split is sampled,
    // not exact)
    val df = (0 until 1600).map(i => (i.toLong, i.toLong % 16, 1000L + i, s"doc-$i"))
      .toDF("id", "bucket", "ts", "payload")
    GraftTable.append(df, dir, "bucket", numFiles = Some(16), statsCols = Seq("ts"))
    val snap = GraftTable.snapshot(spark, dir).get
    assert(snap.files.forall(_.stats.contains("ts")))
    assert(GraftTable.snapshotMeta(spark, dir).get.refs.forall(_.stats.contains("ts")))
    val want = GraftTable.read(spark, dir)
      .filter(col("ts").between(1100, 1150)).orderBy("id").collect().toSeq
    val gotPre = GraftTable.readWhere(spark, dir, "ts", 1100, 1150)
      .orderBy("id").collect().toSeq
    assert(gotPre == want)
    assert(GraftTable.pruneWhere(spark, dir, "ts", 1100, 1150)._2.length ==
      snap.files.length, "bucket layout scatters ts: nothing prunable yet")
    // z-order compact over (bucket, ts): every file becomes a hyper-box
    GraftTable.compact(spark, dir, targetFileBytes = 1L, minFiles = 2,
      clusterBy = Seq("bucket", "ts"))
    val zFiles = GraftTable.snapshot(spark, dir).get.files
    val tsHit = GraftTable.pruneWhere(spark, dir, "ts", 1100, 1150)._2.length
    assert(tsHit < zFiles.length,
      s"z-layout must make ts prunable: $tsHit of ${zFiles.length}")
    // and the bucket dimension stays prunable too (the 2-D trade)
    val bHit = GraftTable.pruneRange(spark, dir, 3, 3)._2.length
    assert(bHit < zFiles.length, s"bucket still prunable: $bHit of ${zFiles.length}")
    // values unchanged through the z rewrite, both pruned and full
    assert(GraftTable.readWhere(spark, dir, "ts", 1100, 1150)
      .orderBy("id").collect().toSeq == want)
    assert(GraftTable.read(spark, dir).count() == 1600)
  }

  test("deleteWhere: copy-on-write — only files holding victims rewritten") {
    val dir = freshDir()
    GraftTable.append(rows(0, 800), dir, "bucket", numFiles = Some(8))
    val before = GraftTable.snapshot(spark, dir).get
    def names(s: GraftTable.Snapshot) =
      s.files.map(e => new org.apache.hadoop.fs.Path(e.path).getName).toSet
    // victims live in bucket 3 only (range-clustered: ~1 file holds them)
    val m = GraftTable.deleteWhere(spark, dir,
      col("bucket") === 3 && col("id") < 100)
    assert(m.id == 2L)
    val after = GraftTable.snapshot(spark, dir).get
    val rewritten = names(before).diff(names(after))
    assert(rewritten.nonEmpty && rewritten.size <= 2,
      s"only victim-holding files rewritten: $rewritten")
    val got = GraftTable.read(spark, dir).select("id").as[Long].collect().sorted
    val want = (0L until 800L).filterNot(i => i % 16 == 3 && i < 100)
    assert(got.toSeq == want)
    // time travel: pre-delete snapshot intact
    assert(GraftTable.read(spark, dir, Some(1L)).count() == 800)
    // rewritten entries carry kind=delete; untouched keep their kind
    assert(after.files.filter(e => !names(before).contains(
      new org.apache.hadoop.fs.Path(e.path).getName)).forall(_.kind == "delete"))
    // a no-match delete publishes nothing
    val m2 = GraftTable.deleteWhere(spark, dir, col("id") === 99999L)
    assert(m2.id == 2L)
  }

  test("deleteWhere: bucket-pruned path agrees; delta stays the append log") {
    val dir = freshDir()
    GraftTable.append(rows(0, 100), dir, "bucket") // 1
    GraftTable.append(rows(100, 200), dir, "bucket") // 2
    GraftTable.deleteWhere(spark, dir, col("id").between(150, 159),
      buckets = Some((150L until 160L).map(_ % 16).toArray)) // 3
    assert(GraftTable.read(spark, dir).count() == 190)
    // delta is the APPEND log: the pre-delete window still reads the
    // original append files (deletions are not retroactive there), and
    // the replacement shard must not double-read the shared paths
    val d = GraftTable.delta(spark, dir, 1L).select("id").as[Long].collect().sorted
    assert(d.toSeq == (100L until 200L).toSeq, s"got ${d.length} rows")
    // a post-delete append then delta FROM the delete snapshot: only it
    GraftTable.append(rows(200, 210), dir, "bucket") // 4
    val d2 = GraftTable.delta(spark, dir, 3L).select("id").as[Long].collect().sorted
    assert(d2.toSeq == (200L until 210L).toSeq)
    // expire to latest: the state stays exact
    GraftTable.expire(spark, dir, keepSnapshots = 1)
    assert(GraftTable.read(spark, dir).count() == 200)
  }

  test("delta(0) refuses after expire dropped snapshot 1") {
    val dir = freshDir()
    GraftTable.append(rows(0, 100), dir, "bucket") // 1
    // full history still present: delta(0) == read()
    assert(GraftTable.delta(spark, dir, 0L).count() == 100)
    GraftTable.append(rows(100, 130), dir, "bucket") // 2
    GraftTable.compact(spark, dir, targetFileBytes = 1L << 30, minFiles = 2) // 3
    GraftTable.append(rows(130, 140), dir, "bucket") // 4
    GraftTable.expire(spark, dir, keepSnapshots = 2)
    // pre-compaction append files are deleted and absent from kept
    // manifests — delta(0) would silently return only rows 130..139
    // (round-11 ADVICE); it must refuse instead
    val e = intercept[IllegalArgumentException] {
      GraftTable.delta(spark, dir, 0L).collect()
    }
    assert(e.getMessage.contains("use read()"), e.getMessage)
  }

  test("compact retried over a racing append keeps the interloper's rows") {
    // direct exercise of the compact rebase path: append wins the id the
    // compactor wanted; the retried compaction snapshot must list the
    // interloper's append files alongside the compacted set
    val dir = freshDir()
    (0 until 4).foreach(k => GraftTable.append(rows(k * 25, k * 25 + 25), dir, "bucket"))
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val fCompact = pool.submit(new Runnable {
      def run(): Unit =
        try { gate.await(); GraftTable.compact(spark, dir, targetFileBytes = 1L << 30); () }
        catch { case t: Throwable => errs.add(t) }
    })
    val fAppend = pool.submit(new Runnable {
      def run(): Unit =
        try { gate.await(); GraftTable.append(rows(100, 125), dir, "bucket"); () }
        catch { case t: Throwable => errs.add(t) }
    })
    gate.countDown()
    Seq(fCompact, fAppend).foreach(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(errs.isEmpty, errs.toString)
    val got = GraftTable.read(spark, dir).select("id").as[Long].collect().sorted
    assert(got.toSeq == (0L until 125L).toSeq, s"lost rows: ${got.length} of 125")
  }

  test("bucket-column mismatch and empty-table reads fail fast") {
    val dir = freshDir()
    GraftTable.append(rows(0, 10), dir, "bucket")
    val e = intercept[IllegalArgumentException] {
      GraftTable.append(rows(0, 10).withColumnRenamed("bucket", "b2"), dir, "b2")
    }
    assert(e.getMessage.contains("bucketed by"), e.getMessage)
    val dir2 = freshDir()
    intercept[IllegalStateException] { GraftTable.read(spark, dir2) }
  }
}

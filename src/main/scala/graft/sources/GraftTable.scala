package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Manifest-tracked parquet table — the table-format leg for incremental
 * pipelines (the open-format semantics of Delta/Iceberg re-expressed
 * over plain parquet, since no table-format jars ship in this
 * container; the CONCEPTS are the public ones: snapshot manifests,
 * atomic publish, file-level statistics pruning, compaction with time
 * travel, snapshot delta).
 *
 * Layout:
 * {{{
 *   <dir>/data/<uuid>-part-*.parquet        immutable data files
 *   <dir>/_manifests/snapshot-000000K.json  one manifest per snapshot
 * }}}
 *
 * Every manifest lists the COMPLETE file set of its snapshot with
 * per-file statistics on the declared LONG bucket column: (path, rows,
 * bytes, minBucket, maxBucket, addedAt, kind). Commits are atomic: the
 * manifest writes to a dotted temp name and renames into place, so a
 * concurrent reader sees the previous snapshot or the new one, never a
 * torn file list. Writers use OPTIMISTIC CONCURRENCY (round-12): each
 * snapshot id is claimed by an exclusive create before rename, a lost
 * race rebases on the new latest and retries, and appends enforce the
 * table's schema (names + types) before writing — concurrent appends
 * both survive with all rows present.
 *
 * The 100 TB read path: [[readBuckets]]/[[readForBuckets]] prune the
 * file list MANIFEST-SIDE — a bucket predicate touches only files whose
 * [minBucket, maxBucket] intersects it, before Spark lists or opens
 * anything. [[compact]] rewrites the live snapshot range-clustered by
 * bucket so each file covers a narrow bucket range (that clustering is
 * what makes the stats selective — the Z-order argument from
 * [[graft.operators.Layout]] in one dimension). Old snapshots keep
 * reading their own file lists (time travel) until [[expire]] drops
 * them.
 */
object GraftTable {

  /** A shutdown-hook-cleaned scratch directory for a throwaway table
    * (the oracle queries build theirs per run; production tables pass a
    * real shared-FS dir). */
  def scratchTable(tag: String): String = TextFormats.scratchDir(s"table_$tag")

  /** One immutable data file with its bucket statistics. */
  case class FileEntry(path: String, rows: Long, bytes: Long,
                       minBucket: Long, maxBucket: Long,
                       addedAt: Long, kind: String) // kind: append|compact

  case class Snapshot(id: Long, bucketCol: String, files: Seq[FileEntry])

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(dir: String) = s"${dir.stripSuffix("/")}/_manifests"
  private def dataDir(dir: String) = s"${dir.stripSuffix("/")}/data"

  // ------------------------------------------------------------ manifests

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def snapshotBody(snap: Snapshot): String = {
    val body = new StringBuilder()
    body.append(s"""{"id":${snap.id},"bucketCol":${q(snap.bucketCol)},"files":[""")
    body.append(snap.files.map(e =>
      s"""{"path":${q(e.path)},"rows":${e.rows},"bytes":${e.bytes},""" +
        s""""minBucket":${e.minBucket},"maxBucket":${e.maxBucket},""" +
        s""""addedAt":${e.addedAt},"kind":${q(e.kind)}}""").mkString(","))
    body.append("]}")
    body.toString
  }

  /** A dead writer's claim older than this may be broken by a new
    * writer (the claim holder crashed between claim and publish). */
  private val ClaimTtlMs = 15L * 60 * 1000

  /**
   * Optimistic-concurrency publish (round-12; the Delta/Iceberg commit
   * protocol shape). Returns false on a LOST RACE — another writer
   * already published this snapshot id — in which case the caller must
   * re-read the latest snapshot, rebase its file list, and retry.
   *
   * Why not rename alone: HDFS rename fails on an existing destination,
   * but LocalFileSystem (File.renameTo) silently OVERWRITES — two
   * writers both publishing snapshot-(N+1).json would let the second
   * erase the first's files from the manifest. So mutual exclusion
   * comes from an EXCLUSIVE CREATE (`create(path, overwrite=false)`)
   * of a claim file, which both filesystems make atomic, while reader
   * atomicity still comes from temp-write + rename (readers only ever
   * list fully-written `snapshot-*.json` names — `.claim` and `.tmp`
   * never match the snapshot filter).
   */
  private def tryPublish(spark: SparkSession, dir: String,
                         snap: Snapshot): Boolean = {
    val f = fs(spark, dir)
    val md = new org.apache.hadoop.fs.Path(manifestDir(dir))
    if (!f.exists(md)) f.mkdirs(md)
    val name = f"snapshot-${snap.id}%09d.json"
    val fin = new org.apache.hadoop.fs.Path(md, name)
    if (f.exists(fin)) return false // already published by someone else
    val claim = new org.apache.hadoop.fs.Path(md, s"$name.claim")
    // break a stale claim from a crashed writer; a live one is younger
    try {
      val st = f.getFileStatus(claim)
      if (System.currentTimeMillis() - st.getModificationTime > ClaimTtlMs)
        f.delete(claim, false)
    } catch { case _: java.io.FileNotFoundException => }
    val held =
      try { f.create(claim, false).close(); true }
      catch { case _: java.io.IOException => false } // claim exists: lost
    if (!held) return false
    try {
      if (f.exists(fin)) return false // claimed too late: winner already renamed
      val tmp = new org.apache.hadoop.fs.Path(md, s".$name.tmp")
      val out = f.create(tmp, true)
      out.write(snapshotBody(snap).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
      if (!f.rename(tmp, fin))
        throw new java.io.IOException(s"GraftTable: manifest publish failed: $fin")
      true
    } finally f.delete(claim, false)
  }

  /** Hand-rolled parse of our own fixed manifest shape (no JSON lib on
    * the classpath beyond Spark's shaded ones). */
  private def parseSnapshot(text: String): Snapshot = {
    val id = "\"id\":(\\d+)".r.findFirstMatchIn(text).get.group(1).toLong
    val bucketCol = "\"bucketCol\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findFirstMatchIn(text).get.group(1)
    val entry = ("\\{\"path\":\"((?:[^\"\\\\]|\\\\.)*)\",\"rows\":(\\d+)," +
      "\"bytes\":(\\d+),\"minBucket\":(-?\\d+),\"maxBucket\":(-?\\d+)," +
      "\"addedAt\":(\\d+),\"kind\":\"(\\w+)\"\\}").r
    val files = entry.findAllMatchIn(text).map(m =>
      FileEntry(m.group(1).replace("\\\\", "\\").replace("\\\"", "\""),
        m.group(2).toLong, m.group(3).toLong, m.group(4).toLong,
        m.group(5).toLong, m.group(6).toLong, m.group(7))).toSeq
    Snapshot(id, bucketCol, files)
  }

  /** All snapshot ids present, ascending. */
  def snapshotIds(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val md = new org.apache.hadoop.fs.Path(manifestDir(dir))
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("snapshot-") && n.endsWith(".json"))
      .map(n => n.stripPrefix("snapshot-").stripSuffix(".json").toLong)
      .sorted
  }

  /** Load a snapshot (latest when `id` is None); None on an empty table. */
  def snapshot(spark: SparkSession, dir: String,
               id: Option[Long] = None): Option[Snapshot] = {
    val ids = snapshotIds(spark, dir)
    val want = id match {
      case Some(i) => if (ids.contains(i)) Some(i) else None
      case None => ids.lastOption
    }
    want.map { i =>
      val p = new org.apache.hadoop.fs.Path(manifestDir(dir), f"snapshot-$i%09d.json")
      val in = fs(spark, dir).open(p)
      val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      in.close()
      parseSnapshot(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  // ------------------------------------------------------------ writes

  /** Fail fast on an append whose columns don't match the table's
    * (names + types, order-insensitive — the Delta enforcement shape).
    * Checked against the parquet footer of one live file, so the check
    * costs a footer read, not a scan. */
  private def checkSchema(spark: SparkSession, dir: String,
                          prev: Snapshot, incoming: DataFrame): Unit = {
    if (prev.files.isEmpty) return
    val existing = spark.read.parquet(prev.files.head.path).schema
    // catalogString, not DataType equality: parquet read-back flips
    // array/struct NULLABILITY flags (containsNull) that don't change
    // what rows fit the table — names + value types are the contract
    val a = existing.fields.map(f => (f.name, f.dataType.catalogString)).toSet
    val b = incoming.schema.fields.map(f => (f.name, f.dataType.catalogString)).toSet
    require(a == b,
      s"GraftTable.append: schema mismatch at $dir — table has " +
        s"${existing.fields.map(f => s"${f.name}:${f.dataType.simpleString}").sorted.mkString(", ")} " +
        s"but the append has " +
        s"${incoming.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").sorted.mkString(", ")}")
  }

  /** Max publish retries before an append/compact gives up (each retry
    * rebases on the latest snapshot — losing that many races in a row
    * means pathological contention, better surfaced than spun on). */
  private val MaxCommitRetries = 20

  /** Append `df` as a new snapshot: rows land range-clustered by
    * `bucketCol` (so per-file min/max stats are selective from the first
    * write), per-file stats are computed in one columnar pass over the
    * new files only, and the manifest publishes atomically with
    * OPTIMISTIC CONCURRENCY (round-12): a lost publish race re-reads the
    * latest snapshot, rebases the cumulative file list, and retries —
    * the moved data files stay valid across retries, so a retry costs a
    * manifest read, not a rewrite. Concurrent appends therefore both
    * survive with all rows present. Returns the new snapshot. */
  def append(df: DataFrame, dir: String, bucketCol: String,
             numFiles: Option[Int] = None): Snapshot = {
    val spark = df.sparkSession
    val prev = snapshot(spark, dir)
    val clustered = df.withColumn(bucketCol, col(bucketCol).cast("long"))
    prev.foreach { s =>
      require(s.bucketCol == bucketCol,
        s"GraftTable at $dir is bucketed by ${s.bucketCol}, not $bucketCol")
      checkSchema(spark, dir, s, clustered)
    }
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val tmp = s"${dir.stripSuffix("/")}/.append_$stamp"
    (numFiles match {
      case Some(n) => clustered.repartitionByRange(n, col(bucketCol))
      case None => clustered.repartitionByRange(col(bucketCol))
    }).sortWithinPartitions(col(bucketCol))
      .write.mode("overwrite").parquet(tmp)
    val f = fs(spark, dir)
    val dd = new org.apache.hadoop.fs.Path(dataDir(dir))
    if (!f.exists(dd)) f.mkdirs(dd)
    val moved = f.listStatus(new org.apache.hadoop.fs.Path(tmp)).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val dest = new org.apache.hadoop.fs.Path(dd, s"$stamp-${st.getPath.getName}")
        require(f.rename(st.getPath, dest), s"GraftTable append move failed: $dest")
        // record the QUALIFIED form (scheme + authority) so expire's
        // listStatus comparison and cross-FS readers resolve identically
        (f.makeQualified(dest).toString, f.getFileStatus(dest).getLen)
      }
    f.delete(new org.apache.hadoop.fs.Path(tmp), true)
    // per-file stats over the NEW files only (addedAt is re-stamped per
    // publish attempt below — the stats themselves never change)
    val statEntries =
      if (moved.isEmpty) Seq.empty
      else {
        val byteSizes = moved.toMap
        spark.read.parquet(moved.map(_._1): _*)
          .groupBy(input_file_name().as("__f"))
          .agg(count(lit(1)).as("__n"),
            min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
          .collect().toSeq.map { r =>
            // input_file_name returns a URI form; match on suffix
            val uri = r.getString(0)
            val key = byteSizes.keys.find(k => uri.endsWith(
              new org.apache.hadoop.fs.Path(k).getName)).getOrElse(uri)
            FileEntry(key, r.getLong(1), byteSizes.getOrElse(key, 0L),
              r.getLong(2), r.getLong(3), 0L, "append")
          }
      }
    var base = prev
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      val nextId = base.map(_.id + 1).getOrElse(1L)
      val snap = Snapshot(nextId, bucketCol,
        base.map(_.files).getOrElse(Seq.empty) ++
          statEntries.map(_.copy(addedAt = nextId)))
      if (tryPublish(spark, dir, snap)) return snap
      attempt += 1
      Thread.sleep(math.min(50L * attempt, 500L)) // back off behind the claim holder
      val rebased = snapshot(spark, dir)
      rebased.foreach { s =>
        require(s.bucketCol == bucketCol,
          s"GraftTable at $dir is bucketed by ${s.bucketCol}, not $bucketCol")
      }
      base = rebased
    }
    throw new java.io.IOException(
      s"GraftTable.append: lost $MaxCommitRetries publish races at $dir — giving up")
  }

  /** Rewrite the CURRENT snapshot into ~`targetFileBytes` files
    * range-clustered by bucket and publish it as a new snapshot whose
    * file list is the compacted files ONLY. The row multiset is
    * unchanged (spec-pinned); old snapshots keep reading their own
    * files until [[expire]]. No-op (returns the current snapshot) when
    * fewer than `minFiles` files or compaction would not shrink. */
  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L << 20,
              minFiles: Int = 4): Snapshot = {
    val cur = snapshot(spark, dir).getOrElse(
      throw new IllegalStateException(s"GraftTable.compact: empty table at $dir"))
    if (cur.files.length < minFiles) return cur
    val totalBytes = cur.files.map(_.bytes).sum
    val nOut = math.max(1L, math.min(cur.files.length - 1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes)).toInt
    if (nOut >= cur.files.length) return cur
    val stamp = "c" + java.util.UUID.randomUUID().toString.take(8)
    val tmp = s"${dir.stripSuffix("/")}/.compact_$stamp"
    spark.read.parquet(cur.files.map(_.path): _*)
      .repartitionByRange(nOut, col(cur.bucketCol))
      .sortWithinPartitions(col(cur.bucketCol))
      .write.mode("overwrite").parquet(tmp)
    val f = fs(spark, dir)
    val dd = new org.apache.hadoop.fs.Path(dataDir(dir))
    val moved = f.listStatus(new org.apache.hadoop.fs.Path(tmp)).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val dest = new org.apache.hadoop.fs.Path(dd, s"$stamp-${st.getPath.getName}")
        require(f.rename(st.getPath, dest), s"GraftTable compact move failed: $dest")
        (f.makeQualified(dest).toString, f.getFileStatus(dest).getLen)
      }
    f.delete(new org.apache.hadoop.fs.Path(tmp), true)
    val byteSizes = moved.toMap
    val statEntries = spark.read.parquet(moved.map(_._1): _*)
      .groupBy(input_file_name().as("__f"))
      .agg(count(lit(1)).as("__n"),
        min(col(cur.bucketCol)).as("__lo"), max(col(cur.bucketCol)).as("__hi"))
      .collect().toSeq.map { r =>
        val uri = r.getString(0)
        val key = byteSizes.keys.find(k => uri.endsWith(
          new org.apache.hadoop.fs.Path(k).getName)).getOrElse(uri)
        FileEntry(key, r.getLong(1), byteSizes.getOrElse(key, 0L),
          r.getLong(2), r.getLong(3), 0L, "compact")
      }
    // optimistic publish: if an APPEND won the race for cur.id+1, the
    // compacted files cover only the rows up to cur.id — the retried
    // snapshot must carry the interlopers' append files ALONGSIDE the
    // compacted set, or their rows would silently vanish from latest
    var attempt = 0
    while (attempt < MaxCommitRetries) {
      val latest = snapshot(spark, dir).getOrElse(cur)
      val nextId = latest.id + 1
      val interlopers = latest.files.filter(e =>
        e.addedAt > cur.id && e.kind == "append")
      val snap = Snapshot(nextId, cur.bucketCol,
        statEntries.map(_.copy(addedAt = nextId)) ++ interlopers)
      if (tryPublish(spark, dir, snap)) return snap
      attempt += 1
      Thread.sleep(math.min(50L * attempt, 500L))
    }
    throw new java.io.IOException(
      s"GraftTable.compact: lost $MaxCommitRetries publish races at $dir — giving up")
  }

  /** Drop manifests older than the newest `keepSnapshots` and delete
    * data files no kept snapshot references. Bounds [[delta]] lookback
    * to the kept range. Returns (manifests dropped, files deleted). */
  def expire(spark: SparkSession, dir: String, keepSnapshots: Int = 2): (Int, Int) = {
    require(keepSnapshots >= 1, "keepSnapshots >= 1")
    val ids = snapshotIds(spark, dir)
    val drop = ids.dropRight(keepSnapshots)
    if (drop.isEmpty) return (0, 0)
    val keep = ids.takeRight(keepSnapshots)
    val referenced = keep.flatMap(i =>
      snapshot(spark, dir, Some(i)).get.files.map(p =>
        fs(spark, dir).makeQualified(new org.apache.hadoop.fs.Path(p.path)).toString)).toSet
    val f = fs(spark, dir)
    val dd = new org.apache.hadoop.fs.Path(dataDir(dir))
    val deleted =
      if (!f.exists(dd)) 0
      else f.listStatus(dd).toSeq
        .filter(st => !referenced.contains(f.makeQualified(st.getPath).toString))
        .map { st => f.delete(st.getPath, false); 1 }.sum
    drop.foreach { i =>
      f.delete(new org.apache.hadoop.fs.Path(
        manifestDir(dir), f"snapshot-$i%09d.json"), false)
    }
    // housekeeping: a claim for an already-published id can never
    // succeed (its final exists) — it is a dead writer's leftover
    val md = new org.apache.hadoop.fs.Path(manifestDir(dir))
    f.listStatus(md).toSeq.map(_.getPath)
      .filter(p => p.getName.endsWith(".json.claim"))
      .filter { p =>
        val id = p.getName.stripSuffix(".json.claim")
          .stripPrefix("snapshot-").toLong
        id <= ids.last
      }.foreach(p => f.delete(p, false))
    (drop.length, deleted)
  }

  // ------------------------------------------------------------ reads

  private def readFiles(spark: SparkSession, files: Seq[FileEntry],
                        schemaFrom: String): DataFrame =
    if (files.nonEmpty) spark.read.parquet(files.map(_.path): _*)
    else spark.read.parquet(schemaFrom).limit(0)

  /** Full scan of a snapshot (latest by default). */
  def read(spark: SparkSession, dir: String,
           snapshotId: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, dir, snapshotId).getOrElse(
      throw new IllegalStateException(s"GraftTable.read: empty table at $dir"))
    require(snap.files.nonEmpty, s"GraftTable.read: snapshot ${snap.id} has no files")
    spark.read.parquet(snap.files.map(_.path): _*)
  }

  /** Bucket-RANGE scan: only files whose [minBucket, maxBucket]
    * intersects [lo, hi] are handed to Spark (manifest-side pruning —
    * nothing else is listed or opened), then the exact residual filter
    * applies. */
  def readBuckets(spark: SparkSession, dir: String, lo: Long, hi: Long,
                  snapshotId: Option[Long] = None): DataFrame = {
    require(lo <= hi, s"bad bucket range [$lo, $hi]")
    val snap = snapshot(spark, dir, snapshotId).getOrElse(
      throw new IllegalStateException(s"GraftTable.readBuckets: empty table at $dir"))
    val hit = snap.files.filter(e => e.maxBucket >= lo && e.minBucket <= hi)
    readFiles(spark, hit, snap.files.head.path)
      .filter(col(snap.bucketCol).between(lo, hi))
  }

  /** Bucket-SET scan (the incremental-index shape: a small batch's
    * bucket set against a large clustered table): files pruned to those
    * whose range contains any requested bucket, then the exact residual
    * filter. Sorted-merge over (sorted entries, sorted buckets). */
  def readForBuckets(spark: SparkSession, dir: String, buckets: Array[Long],
                     snapshotId: Option[Long] = None,
                     residualFilter: Boolean = true): DataFrame = {
    val snap = snapshot(spark, dir, snapshotId).getOrElse(
      throw new IllegalStateException(s"GraftTable.readForBuckets: empty table at $dir"))
    val bs = buckets.distinct.sorted
    val hit = snap.files.filter { e =>
      // any bucket in [minBucket, maxBucket]? binary-search the sorted set
      val i = java.util.Arrays.binarySearch(bs, e.minBucket)
      val from = if (i >= 0) i else -i - 1
      from < bs.length && bs(from) <= e.maxBucket
    }
    val pruned = readFiles(spark, hit, snap.files.headOption.map(_.path).getOrElse(
      throw new IllegalStateException("empty snapshot")))
    // residualFilter=false when the caller's own equality predicate (a
    // bucket-keyed JOIN) already applies exactly — a 100k-literal isin
    // would only duplicate it
    if (residualFilter)
      pruned.filter(col(snap.bucketCol).isin(bs.map(java.lang.Long.valueOf): _*))
    else pruned
  }

  /** Rows appended AFTER snapshot `fromId` up to and including `toId`
    * (latest by default): the append-kind files in that id range, read
    * directly — exact regardless of intervening compactions (compaction
    * adds no rows; the superseded append files stay on disk until
    * [[expire]], which therefore bounds delta lookback). */
  def delta(spark: SparkSession, dir: String, fromId: Long,
            toId: Option[Long] = None): DataFrame = {
    val ids = snapshotIds(spark, dir)
    require(ids.nonEmpty, s"GraftTable.delta: empty table at $dir")
    val to = toId.getOrElse(ids.last)
    // fromId == 0 means "everything since the table existed" — which is
    // only answerable while snapshot 1 is still present. After expire()
    // drops early manifests, compaction snapshots list no append-kind
    // files for the pre-compaction rows, so delta(0) would silently
    // return only post-compaction appends (round-11 ADVICE): reject it
    // like any other expired lookback and send the caller to read().
    require(ids.contains(fromId) || (fromId == 0L && ids.head == 1L),
      s"GraftTable.delta: snapshot $fromId expired or never existed " +
        s"(present: ${ids.mkString(",")}) — expire() bounded the lookback" +
        (if (fromId == 0L) "; use read() for the full current state" else ""))
    val entries = (math.max(fromId + 1, ids.head) to to)
      .flatMap(i => snapshot(spark, dir, Some(i)))
      .flatMap(s => s.files.filter(e => e.addedAt > fromId && e.addedAt <= to &&
        e.kind == "append"))
      .distinctBy(_.path)
    val base = snapshot(spark, dir, Some(to)).get
    readFiles(spark, entries, base.files.headOption.map(_.path).getOrElse(
      throw new IllegalStateException("empty snapshot")))
  }
}

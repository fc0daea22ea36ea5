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
 * torn file list (single-writer, many-reader — the discipline the
 * incremental dedup index already assumes).
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

  private def writeSnapshot(spark: SparkSession, dir: String,
                            snap: Snapshot): Unit = {
    val f = fs(spark, dir)
    val md = new org.apache.hadoop.fs.Path(manifestDir(dir))
    if (!f.exists(md)) f.mkdirs(md)
    val body = new StringBuilder()
    body.append(s"""{"id":${snap.id},"bucketCol":${q(snap.bucketCol)},"files":[""")
    body.append(snap.files.map(e =>
      s"""{"path":${q(e.path)},"rows":${e.rows},"bytes":${e.bytes},""" +
        s""""minBucket":${e.minBucket},"maxBucket":${e.maxBucket},""" +
        s""""addedAt":${e.addedAt},"kind":${q(e.kind)}}""").mkString(","))
    body.append("]}")
    val name = f"snapshot-${snap.id}%09d.json"
    val tmp = new org.apache.hadoop.fs.Path(md, s".$name.tmp")
    val out = f.create(tmp, true)
    out.write(body.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    val fin = new org.apache.hadoop.fs.Path(md, name)
    if (!f.rename(tmp, fin))
      throw new java.io.IOException(s"GraftTable: manifest publish failed: $fin")
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

  /** Append `df` as a new snapshot: rows land range-clustered by
    * `bucketCol` (so per-file min/max stats are selective from the first
    * write), per-file stats are computed in one columnar pass over the
    * new files only, and the manifest publishes atomically. Returns the
    * new snapshot. Single-writer discipline, like the index it backs. */
  def append(df: DataFrame, dir: String, bucketCol: String,
             numFiles: Option[Int] = None): Snapshot = {
    val spark = df.sparkSession
    val prev = snapshot(spark, dir)
    prev.foreach(s => require(s.bucketCol == bucketCol,
      s"GraftTable at $dir is bucketed by ${s.bucketCol}, not $bucketCol"))
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val tmp = s"${dir.stripSuffix("/")}/.append_$stamp"
    val clustered = df.withColumn(bucketCol, col(bucketCol).cast("long"))
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
    val nextId = prev.map(_.id + 1).getOrElse(1L)
    val entries =
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
              r.getLong(2), r.getLong(3), nextId, "append")
          }
      }
    val snap = Snapshot(nextId, bucketCol,
      prev.map(_.files).getOrElse(Seq.empty) ++ entries)
    writeSnapshot(spark, dir, snap)
    snap
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
    val nextId = cur.id + 1
    val byteSizes = moved.toMap
    val entries = spark.read.parquet(moved.map(_._1): _*)
      .groupBy(input_file_name().as("__f"))
      .agg(count(lit(1)).as("__n"),
        min(col(cur.bucketCol)).as("__lo"), max(col(cur.bucketCol)).as("__hi"))
      .collect().toSeq.map { r =>
        val uri = r.getString(0)
        val key = byteSizes.keys.find(k => uri.endsWith(
          new org.apache.hadoop.fs.Path(k).getName)).getOrElse(uri)
        FileEntry(key, r.getLong(1), byteSizes.getOrElse(key, 0L),
          r.getLong(2), r.getLong(3), nextId, "compact")
      }
    val snap = Snapshot(nextId, cur.bucketCol, entries)
    writeSnapshot(spark, dir, snap)
    snap
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
    require(ids.contains(fromId) || fromId == 0L,
      s"GraftTable.delta: snapshot $fromId expired or never existed " +
        s"(present: ${ids.mkString(",")}) — expire() bounded the lookback")
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

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Splittable reader for QUOTED (multi-line-field) CSV — the case Spark's
 * own reader forces onto `multiLine=true` and therefore ONE TASK PER
 * FILE: hand a 1 TB quoted CSV to `spark.read`, get a single-threaded
 * scan. This reader parallelizes the same file with two cheap passes,
 * both distributed:
 *
 *  1. QUOTE-PARITY PASS: the file is cut into fixed byte ranges; each
 *     task counts quote characters in its range. For RFC-4180 quoting
 *     (quote = `"`, escaped by DOUBLING — the `escape="` convention
 *     [[TextFormats.csvRoundTrip]] writes), the in-quote state at any
 *     byte is simply (number of `"` bytes before it) mod 2: an opening
 *     quote flips in, a closing flips out, and a doubled escape flips
 *     twice — net zero. A driver-side prefix XOR over the per-range
 *     counts (O(#ranges) longs) gives every range its starting state.
 *     This is exactly why the BACKSLASH escape convention is rejected
 *     below: `\"` must not flip, which breaks pure parity counting.
 *
 *  2. RECORD PASS: each task seeks to its range, tracks quote state
 *     from the known starting parity, and owns every record that
 *     STARTS in its range: it skips to the first record boundary (a
 *     newline at quote depth 0; range 0 starts at byte 0), then emits
 *     complete record strings, reading past its range end as far as
 *     needed to close the last record it owns (records bigger than a
 *     range degrade throughput, never correctness). The record strings
 *     are then handed to Spark's own CSV parser via
 *     `DataFrameReader.csv(Dataset[String])` with `multiLine` OFF —
 *     each element is one complete record, so embedded newlines are
 *     already inside the string and the parse stays distributed.
 *
 * Scale shape: both passes are embarrassingly parallel over byte
 * ranges (pass 1 reads every byte once, pass 2 once more — same total
 * IO as Spark's single-task multiLine scan, minus the single task);
 * driver state is one long per range. `blockBytes` plays the role of
 * `spark.sql.files.maxPartitionBytes`. Uses the Hadoop FileSystem API,
 * so the same code paths work on HDFS/S3A, not just local disk.
 *
 * Contract: UTF-8, quote `"`, doubled-quote escaping, records
 * terminated by `\n` (CRLF tolerated — the CR rides into the record
 * string and Spark's parser strips it). A lone final record without a
 * trailing newline is emitted. Unbalanced quotes (odd total parity)
 * fail fast rather than silently mis-splitting.
 */
object SplittableCsv {

  /** Read one quoted-CSV file in parallel byte ranges. `header=true`
    * drops the first record of the file (after parsing it as the
    * column check is the caller's schema). */
  def read(spark: SparkSession, path: String, schema: StructType,
           header: Boolean = true,
           blockBytes: Long = 32L * 1024 * 1024,
           nullValue: String = "\\N",
           maxRecordBytes: Int = 64 * 1024 * 1024): DataFrame = {
    require(blockBytes >= 1024, s"blockBytes too small: $blockBytes")
    require(maxRecordBytes > 0, "maxRecordBytes must be positive")
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val nRanges = math.max(1, ((len + blockBytes - 1) / blockBytes).toInt)
    val ranges = (0 until nRanges)
      .map(i => (i.toLong * blockBytes, math.min((i + 1).toLong * blockBytes, len)))

    // pass 1: distributed quote counting per range
    val sc = spark.sparkContext
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val counts = sc.parallelize(ranges.zipWithIndex, nRanges).map {
      case ((start, end), i) =>
        val fsx = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(serConf.value)
        val in = fsx.open(new org.apache.hadoop.fs.Path(path))
        try {
          in.seek(start)
          var quotes = 0L
          val buf = new Array[Byte](64 * 1024)
          var pos = start
          while (pos < end) {
            val n = in.read(buf, 0, math.min(buf.length.toLong, end - pos).toInt)
            // InputStream.read may legally return 0 without EOF on some
            // Hadoop streams — retry; only n < 0 (EOF before `end`) is a
            // genuinely short file and fails the split
            require(n >= 0, s"unexpected EOF at $pos (range end $end)")
            var j = 0
            while (j < n) { if (buf(j) == '"') quotes += 1; j += 1 }
            pos += n
          }
          (i, quotes)
        } finally in.close()
    }.collect().sortBy(_._1).map(_._2)
    require(counts.sum % 2 == 0,
      s"SplittableCsv: unbalanced quotes in $path (${counts.sum} total) — " +
        "not RFC-4180 doubled-quote CSV; refusing to split")
    // starting state of each range: parity of all quotes before it
    val startInQuote = counts.scanLeft(0L)(_ + _).map(_ % 2 == 1)

    // pass 2: each task emits the records that START in its range
    val dropHead = header
    val records = sc.parallelize(
      ranges.zipWithIndex.map { case ((s, e), i) => (s, e, startInQuote(i), i) },
      nRanges).flatMap { case (start, end, inQuote0, idx) =>
      val fsx = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(serConf.value)
      val in = fsx.open(new org.apache.hadoop.fs.Path(path))
      val fileLen = fsx.getFileStatus(new org.apache.hadoop.fs.Path(path)).getLen
      // buffered single-forward scan from `start`
      val buf = new java.io.BufferedInputStream(
        { in.seek(start); in }, 256 * 1024)
      var pos = start
      var inQuote = inQuote0
      def nextByte(): Int = { val b = buf.read(); if (b >= 0) pos += 1; b }
      // Ownership convention (the LineRecordReader one, quote-aware):
      // task i > 0 DISCARDS everything up to and including the first
      // depth-0 newline in [start, end) — the record it cuts into is
      // owned upstream — then owns every record starting at an offset
      // <= end (a record starting EXACTLY at `end` is ours; the next
      // task's discard scan drops it). Task 0 owns the file head —
      // except that with a header, the head record IS the header, so
      // task 0 runs the same discard scan. (The drop must live HERE,
      // keyed on the RANGE index: a downstream coalesce collapses
      // ranges into one task, so TaskContext.partitionId cannot
      // identify range 0 — the first cut of this reader dropped one
      // record per range under coalesce(1).)
      var reachedEof = false
      if (idx > 0 || dropHead) {
        var boundary = false
        while (!boundary && pos < end) {
          val b = nextByte()
          if (b < 0) { boundary = true; reachedEof = true }
          else if (b == '"') inQuote = !inQuote
          else if (b == '\n' && !inQuote) boundary = true
        }
        if (pos >= end && !boundary) reachedEof = true // no record starts here
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      if (!reachedEof) {
        val cur = new java.io.ByteArrayOutputStream(1024)
        // strip ONE trailing \r (the CRLF terminator's CR — a \r inside
        // a quoted field never sits right before a depth-0 \n)
        def emit(): String = {
          val bytes = cur.toByteArray
          val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
            bytes.length - 1 else bytes.length
          new String(bytes, 0, n, "UTF-8")
        }
        var ownedStart = pos // offset where the record being read started
        var done = false
        while (!done) {
          val b = nextByte()
          if (b < 0) {
            if (cur.size() > 0 && ownedStart <= end) out += emit()
            done = true
          } else if (cur.size() >= maxRecordBytes) {
            // fail-fast, named: a "record" this large usually means the
            // file is NOT doubled-quote RFC-4180 (e.g. backslash-escaped
            // quotes keep overall parity but flip the in-quote state),
            // and the quote-state scan is swallowing rows — surface it
            // rather than corrupt silently or OOM
            throw new IllegalStateException(
              s"SplittableCsv: record starting at byte $ownedStart of " +
                s"$path exceeds maxRecordBytes=$maxRecordBytes — " +
                "unterminated quote or non-RFC-4180 escaping? This " +
                "reader requires doubled-quote CSV; raise maxRecordBytes " +
                "only if records really are this large")
          } else if (b == '"') { inQuote = !inQuote; cur.write(b) }
          else if (b == '\n' && !inQuote) {
            if (ownedStart <= end) out += emit()
            cur.reset()
            ownedStart = pos
            // the record starting at `pos` is the next task's iff pos > end
            if (pos > end || pos >= fileLen) done = true
          } else cur.write(b)
        }
      }
      buf.close()
      out.iterator
    }

    import spark.implicits._
    spark.read.schema(schema)
      .option("nullValue", nullValue).option("escape", "\"")
      .csv(spark.createDataset(records))
  }
}

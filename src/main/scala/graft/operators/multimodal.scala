package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: images/audio/video travel as opaque `binary`
 * columns next to a typed metadata struct, and per-row media kernels run
 * as batched mapPartitions — the Scala analog of `mapInPandas` with Arrow
 * batches (same batch shape: the kernel sees a buffered slice of the
 * partition, amortizing per-call setup like a decoder context).
 *
 * 100 TB design notes:
 *  - blobs stay in parquet binary columns; column pruning means metadata-
 *    only queries never read the bytes (check ReadSchema in .explain);
 *  - `spark.sql.files.maxPartitionBytes` bounds the per-task blob volume,
 *    so decode parallelism follows data size with no driver involvement;
 *  - kernels are Iterator->Iterator (no per-partition materialization
 *    beyond one batch) — safe for multi-GB partitions.
 *
 * The DECODE ITSELF IS A DETERMINISTIC STUB — this container has no image
 * or audio codecs. Every `???`-equivalent is `StubCodecs.*`, which derives
 * stable pseudo-content from the blob bytes. Swap StubCodecs for real
 * codecs (javacv / TwelveMonkeys / ffmpeg bindings) in production; the
 * schemas, batching, and partition behavior — the Spark-side contract —
 * stay exactly as tested here.
 */
object Multimodal {

  /** Typed metadata carried next to each blob. */
  case class ImageMeta(width: Option[Int], height: Option[Int],
                       channels: Option[Int], format: String)

  val imageMetaType: StructType = new StructType()
    .add("width", IntegerType).add("height", IntegerType)
    .add("channels", IntegerType).add("format", StringType)

  val featureSchema: StructType = new StructType()
    .add("media_id", LongType, nullable = false)
    .add("meta", imageMetaType)
    .add("features", ArrayType(FloatType), nullable = false)

  val frameSchema: StructType = new StructType()
    .add("media_id", LongType, nullable = false)
    .add("frame_index", IntegerType, nullable = false)
    .add("frame", BinaryType, nullable = false)

  /** STUB codec layer — deterministic fakes in place of real decoders. */
  object StubCodecs {
    /** "Decode" a blob into a d-dim float feature vector: stable moments
      * of the byte stream (a real impl would run a vision encoder).
      * Accumulates in double with ONE terminal float cast — float32
      * round-to-nearest is engine-portable, float accumulation order is
      * not, and this keeps the output SQL-oracle-exact. */
    def imageFeatures(blob: Array[Byte], d: Int): Array[Float] = {
      val out = new Array[Double](d)
      var i = 0
      while (i < blob.length) {
        out(i % d) += (blob(i) & 0xff)
        i += 1
      }
      val n = math.max(blob.length / d, 1)
      out.map(s => (s / 255.0 / n).toFloat)
    }

    /** "Parse" metadata from a fake 12-byte header (w, h, c as ints). */
    def imageMeta(blob: Array[Byte]): ImageMeta = {
      val bb = java.nio.ByteBuffer.wrap(blob)
      if (blob.length >= 12)
        ImageMeta(Some(bb.getInt(0)), Some(bb.getInt(4)), Some(bb.getInt(8)), "stub")
      else ImageMeta(None, None, None, "unknown")
    }

    /** "Resize": deterministic re-hash to a fixed-size blob. */
    def resize(blob: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](w * h)
      var i = 0
      while (i < out.length) { out(i) = blob(i % math.max(blob.length, 1)); i += 1 }
      out
    }
  }

  /** Attach the typed metadata struct parsed from the blob header. */
  def withImageMeta(df: DataFrame, blobCol: String): DataFrame = {
    val metaUdf = udf((b: Array[Byte]) => StubCodecs.imageMeta(b))
    df.withColumn("meta", metaUdf(col(blobCol)))
  }

  /**
   * Batched feature extraction: the mapInPandas analog. `batchSize` rows
   * are buffered per kernel call (decoder contexts amortize across a
   * batch); partitions stream through, one batch resident at a time.
   */
  def extractImageFeatures(df: DataFrame, idCol: String, blobCol: String,
                           dims: Int, batchSize: Int = 64): DataFrame = {
    val src = withImageMeta(df, blobCol)
      .select(col(idCol).cast(LongType), col("meta"), col(blobCol))
    val enc = RowEncoder.encoderFor(featureSchema)
    src.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one "decoder context" per batch — the amortization point
        batch.map { r =>
          Row(r.getLong(0), r.getStruct(1),
            StubCodecs.imageFeatures(r.getAs[Array[Byte]](2), dims).toSeq)
        }
      }
    }(enc)
  }

  /**
   * Batched resize: maps every blob to a fixed w×h byte payload through
   * the (stub) codec — the normalize-before-encode step of an image
   * pipeline. Same batched mapPartitions shape as feature extraction;
   * output schema (media_id, resized binary) keeps downstream row sizes
   * uniform, which is what makes `maxPartitionBytes` sizing predictable.
   */
  def resizeImages(df: DataFrame, idCol: String, blobCol: String,
                   w: Int, h: Int, batchSize: Int = 64): DataFrame = {
    val schema = new StructType()
      .add("media_id", LongType, nullable = false)
      .add("resized", BinaryType, nullable = false)
    val src = df.select(col(idCol).cast(LongType), col(blobCol))
    val enc = RowEncoder.encoderFor(schema)
    src.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map(r => Row(r.getLong(0), StubCodecs.resize(r.getAs[Array[Byte]](1), w, h)))
      }
    }(enc)
  }

  /**
   * Frame sampling for video blobs: emit every `stride`-th fixed-size
   * frame slice with its index. Generator-shaped (explode), output rows
   * >> input rows — exactly the shape a real ffmpeg splitter has.
   */
  def sampleFrames(df: DataFrame, idCol: String, blobCol: String,
                   frameBytes: Int, stride: Int): DataFrame = {
    val src = df.select(col(idCol).cast(LongType), col(blobCol))
    val enc = RowEncoder.encoderFor(frameSchema)
    src.flatMap { r =>
      val blob = r.getAs[Array[Byte]](1)
      val nFrames = blob.length / frameBytes
      (0 until nFrames by stride).map { f =>
        Row(r.getLong(0), f, blob.slice(f * frameBytes, (f + 1) * frameBytes))
      }
    }(enc)
  }
}

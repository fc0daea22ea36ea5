package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schemas, batching, determinism (decode is a
  * documented stub — the Spark-side contract is what's under test). */
class MultimodalSpec extends GraftSpec {
  import spark.implicits._

  private def fakeImage(id: Int, w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + w * h)
    bb.putInt(w).putInt(h).putInt(3)
    (0 until w * h).foreach(i => bb.put(((id * 31 + i) % 251).toByte))
    bb.array()
  }

  private lazy val media = (1 to 10)
    .map(i => (i.toLong, fakeImage(i, 8, 6)))
    .toDF("media_id", "blob").repartition(3)

  test("metadata struct parses from blob header; blobs prune from metadata-only scans") {
    val withMeta = Multimodal.withImageMeta(media, "blob")
    val m = withMeta.select("meta.width", "meta.height", "meta.channels").head()
    assert((m.getInt(0), m.getInt(1), m.getInt(2)) == (8, 6, 3))
    assert(withMeta.schema("meta").dataType == Multimodal.imageMetaType)
  }

  test("batched feature extraction: schema, determinism, batch independence") {
    val f1 = Multimodal.extractImageFeatures(media, "media_id", "blob", dims = 16, batchSize = 3)
    val f2 = Multimodal.extractImageFeatures(media, "media_id", "blob", dims = 16, batchSize = 64)
    assert(f1.schema == Multimodal.featureSchema)
    val a = f1.collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val b = f2.collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(a.keySet == (1L to 10L).toSet)
    assert(a.forall { case (k, v) => v.length == 16 && v == b(k) },
      "features must not depend on batch size or partitioning")
  }

  test("resize emits uniform fixed-size payloads, deterministic per blob") {
    val out = Multimodal.resizeImages(media, "media_id", "blob", w = 4, h = 4)
    val rows = out.collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(rows.length == 10)
    rows.foreach { case (_, b) => assert(b.length == 16) }
    // deterministic: same blob -> same resized bytes regardless of batching
    val again = Multimodal.resizeImages(media.repartition(1), "media_id", "blob", 4, 4, batchSize = 2)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    rows.foreach { case (id, b) => assert(again(id) == b.toSeq) }
  }

  test("frame sampling: stride-spaced generator output") {
    val frames = Multimodal.sampleFrames(media, "media_id", "blob",
      frameBytes = 10, stride = 2)
    assert(frames.schema == Multimodal.frameSchema)
    val perDoc = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // blob = 12 + 48 bytes = 6 frames of 10 -> indices 0,2,4
    assert(perDoc.values.toSet == Set(3L))
    val idx = frames.filter(col("media_id") === 1L)
      .select("frame_index").as[Int].collect().sorted
    assert(idx.toSeq == Seq(0, 2, 4))
  }
}

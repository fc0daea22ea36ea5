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

  // ------------------------- real codecs (round 7): spec-fixture pins --

  private def hexBytes(s: String): Array[Byte] =
    s.split("\\s+").filter(_.nonEmpty).map(h => Integer.parseInt(h, 16).toByte)

  // Canonical 3-sample mono PCM16 WAV at 8000 Hz with a LIST chunk before
  // data — every byte written from the RIFF/WAVE spec BY HAND, so an
  // encode/decode-symmetric bug cannot hide behind round-tripping
  private val wavFixture = hexBytes(
    "52 49 46 46 36 00 00 00 57 41 56 45 " +          // RIFF 54 WAVE
    "66 6d 74 20 10 00 00 00 01 00 01 00 " +          // fmt 16, PCM, mono
    "40 1f 00 00 80 3e 00 00 02 00 10 00 " +          // 8000 Hz, 16-bit
    "4c 49 53 54 04 00 00 00 7e 7e 7e 7e " +          // LIST junk chunk
    "64 61 74 61 06 00 00 00 e8 03 fe ff ff 7f")      // data: 1000,-2,32767

  // Canonical 2x2 24-bpp BMP: top-down logical pixels red,green/blue,
  // (1,2,3); stored bottom-up with 2 pad bytes per row
  private val bmpFixture = hexBytes(
    "42 4d 46 00 00 00 00 00 00 00 36 00 00 00 " +    // BM, 70 bytes, off 54
    "28 00 00 00 02 00 00 00 02 00 00 00 01 00 18 00 " + // 40, 2x2, 24bpp
    "00 00 00 00 10 00 00 00 13 0b 00 00 13 0b 00 00 " +
    "00 00 00 00 00 00 00 00 " +
    "ff 00 00 03 02 01 00 00 " +                      // bottom row: blue,(1,2,3)
    "00 00 ff 00 ff 00 00 00")                        // top row: red,green

  test("RealCodecs WAV: hand-written fixture decodes; encoder reproduces it; chunk walk skips junk") {
    val Some((m, ss)) = Multimodal.RealCodecs.decodeWavPcm16(wavFixture)
    assert(m == Multimodal.RealCodecs.WavMeta(8000, 1, 16, 3))
    assert(ss.toSeq == Seq[Short](1000, -2, 32767))
    val enc = Multimodal.RealCodecs.encodeWavPcm16(
      Array[Short](1000, -2, 32767), 8000)
    assert(enc.toSeq == wavFixture.toSeq, "encoder must emit the canonical bytes")
    // non-PCM and truncated blobs refuse, not crash
    val nonPcm = wavFixture.clone(); nonPcm(20) = 3 // audioFormat = 3 (float)
    assert(Multimodal.RealCodecs.decodeWavPcm16(nonPcm).isEmpty)
    assert(Multimodal.RealCodecs.decodeWavPcm16(wavFixture.take(30)).isEmpty)
  }

  test("RealCodecs BMP: hand-written fixture decodes un-flipped; encoder reproduces it") {
    val Some((m, px)) = Multimodal.RealCodecs.decodeBmp24(bmpFixture)
    assert((m.width, m.height, m.channels) == (Some(2), Some(2), Some(3)))
    assert(px.map(_ & 0xff).toSeq ==
      Seq(255, 0, 0, 0, 255, 0, 0, 0, 255, 1, 2, 3),
      "pixels must come back top-down RGB despite bottom-up BGR storage")
    val pixels = Map((0, 0) -> (255, 0, 0), (1, 0) -> (0, 255, 0),
      (0, 1) -> (0, 0, 255), (1, 1) -> (1, 2, 3))
    val enc = Multimodal.RealCodecs.encodeBmp24(2, 2, (x, y) => pixels((x, y)))
    assert(enc.toSeq == bmpFixture.toSeq, "encoder must emit the canonical bytes")
    assert(Multimodal.RealCodecs.decodeBmp24(bmpFixture.take(40)).isEmpty)
  }

  test("audioStats/imageStats: order-sensitive stats over the batched decode path; sniff fallback") {
    val wav = Multimodal.RealCodecs.encodeWavPcm16(
      Array[Short](5, -1, 2, -7), 16000)
    val df = Seq((1L, wav), (2L, "not media".getBytes("UTF-8")))
      .toDF("media_id", "blob")
    val a = Multimodal.audioStats(df, "media_id", "blob").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(a(1L).getString(1) == "wav" && a(1L).getInt(2) == 16000)
    assert(a(1L).getLong(3) == 4 && a(1L).getLong(4) == 15 &&
      a(1L).getLong(5) == 3, "sum_abs=15, 3 sign changes")
    assert(a(2L).getString(1) == "stub" && a(2L).isNullAt(3))
    val bmp = Multimodal.RealCodecs.encodeBmp24(2, 2,
      (x, y) => (0, 10 * (y + 1) + x, 0)) // g: row0 = 10,11; row1 = 20,21
    val i = Multimodal.imageStats(
      Seq((7L, bmp)).toDF("media_id", "blob"), "media_id", "blob")
      .collect().head
    assert(i.getInt(2) == 2 && i.getInt(3) == 2)
    assert(i.getLong(5) == 62, "g_sum = 10+11+20+21")
    assert(i.getLong(6) == 1 * 21 + 2 * 41, s"gy_sum row-weighted, got ${i.getLong(6)}")
  }
}

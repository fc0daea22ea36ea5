package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schemas, batching, determinism over REAL
  * spec-valid image blobs (the Spark-side contract plus the real
  * header/decode path). */
class MultimodalSpec extends GraftSpec {
  import spark.implicits._

  private def fakeImage(id: Int, w: Int, h: Int): Array[Byte] =
    Multimodal.RealCodecs.encodeBmp24(w, h, (x, y) =>
      (((id * 31 + x) % 251) & 0xff, ((id * 17 + y) % 251) & 0xff,
        ((id + x * y) % 251) & 0xff))

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

  test("features are over DECODED PIXELS: the same image as BMP and PNG " +
    "featurizes identically") {
    val px = (x: Int, y: Int) => ((x * 7 + y) % 251, (y * 13) % 251, (x * y) % 251)
    val pair = Seq(
      (1L, Multimodal.RealCodecs.encodeBmp24(8, 6, px)),
      (2L, Multimodal.RealCodecs.encodePng(8, 6, px)))
      .toDF("media_id", "blob")
    val f = Multimodal.extractImageFeatures(pair, "media_id", "blob", dims = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(f(1L) == f(2L), "format must not leak into pixel features")
  }

  test("frame sampling: stride-spaced generator output") {
    val frames = Multimodal.sampleFrames(media, "media_id", "blob",
      frameBytes = 10, stride = 2)
    assert(frames.schema == Multimodal.frameSchema)
    val perDoc = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // blob = 54-byte BMP header + 24*6 pixel bytes = 198 -> 19 frames
    // of 10 -> sampled indices 0,2,...,18
    assert(perDoc.values.toSet == Set(10L))
    val idx = frames.filter(col("media_id") === 1L)
      .select("frame_index").as[Int].collect().sorted
    assert(idx.toSeq == (0 to 18 by 2).toSeq)
  }

  test("h264Info: real fixtures parse, non-video blobs pass through null") {
    val mk = udf { (id: Long) =>
      if (id == 9L) "not a video".getBytes("UTF-8")
      else graft.operators.H264Codec.encodeFixture(
        width = 16 * (2 + id.toInt % 3), height = 48, frames = 2 + id.toInt,
        fps = 24.0, profileIdc = if (id % 2 == 0) 66 else 100)
    }
    val df = spark.range(0, 10).select(col("id"), mk(col("id")).as("blob"))
    val got = Multimodal.h264Info(df, "id", "blob", batchSize = 4)
      .orderBy("media_id").collect()
    assert(got.length == 10)
    (0 until 9).foreach { k =>
      val r = got(k)
      assert(r.getString(1) == "h264" && r.getInt(4) == 16 * (2 + k % 3) &&
        r.getInt(6) == 2 + k && r.getInt(7) == 1, s"row $k: $r")
      assert(r.getLong(9) == ((2 + k) * 1000.0 / 24.0).toLong)
    }
    assert(got(9).getString(1) != "h264" && got(9).isNullAt(6))
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

  // 4x6 truecolor PNG produced by an INDEPENDENT encoder (python zlib),
  // alternating None/Up row filters, pixels (r,g,b) =
  // ((x*31+y*17+9)%256, (x*7+y*101+18)%256, (x+y+27)%256) — pins decode
  // against foreign DEFLATE output, not this codec's own round trip
  private val pngFixture = hexBytes(
    "89 50 4e 47 0d 0a 1a 0a 00 00 00 0d 49 48 44 52 " +
    "00 00 00 04 00 00 00 06 08 02 00 00 00 6b 5b a8 " +
    "22 00 00 00 38 49 44 41 54 78 9c 63 e0 14 92 d6 " +
    "90 94 71 57 90 4d 53 97 63 12 4c 65 84 23 06 ed " +
    "3b b2 5e 8f e5 32 5f c9 77 7c 54 40 95 f1 5d 26 " +
    "9f b3 56 a1 7b 8b e2 aa dd 4a 28 32 00 8f 76 12 " +
    "09 69 97 6a f7 00 00 00 00 49 45 4e 44 ae 42 60 " +
    "82")

  test("RealCodecs PNG: foreign-encoder fixture decodes; own encoder round-trips all five filters") {
    val Some((m, px)) = Multimodal.RealCodecs.decodePng(pngFixture)
    assert((m.width, m.height, m.channels, m.format) ==
      (Some(4), Some(6), Some(3), "png"))
    for (y <- 0 until 6; x <- 0 until 4) {
      val o = (y * 4 + x) * 3
      assert((px(o) & 0xff, px(o + 1) & 0xff, px(o + 2) & 0xff) ==
        ((x * 31 + y * 17 + 9) % 256, (x * 7 + y * 101 + 18) % 256,
          (x + y + 27) % 256), s"pixel ($x,$y)")
    }
    // corrupting one IDAT byte must fail the CRC check, not mis-decode
    val bad = pngFixture.clone(); bad(60) = (bad(60) ^ 0x5a).toByte
    assert(Multimodal.RealCodecs.decodePng(bad).isEmpty, "CRC must catch corruption")
    assert(Multimodal.RealCodecs.decodePng(pngFixture.take(40)).isEmpty)
    assert(Multimodal.RealCodecs.sniff(pngFixture) == "png")
    // own encoder: h >= 5 exercises every filter type (y % 5), and the
    // long zlib stream forces the two-IDAT path
    def pix(x: Int, y: Int) = ((x * 13 + y * 29 + 3) % 256,
      (x * 3 + y * 71 + 8) % 256, (x * 17 + y + 1) % 256)
    val blob = Multimodal.RealCodecs.encodePng(9, 11, pix)
    val Some((m2, px2)) = Multimodal.RealCodecs.decodePng(blob)
    assert((m2.width, m2.height) == (Some(9), Some(11)))
    for (y <- 0 until 11; x <- 0 until 9) {
      val o = (y * 9 + x) * 3
      val (r, g, b) = pix(x, y)
      assert((px2(o) & 0xff, px2(o + 1) & 0xff, px2(o + 2) & 0xff) == (r, g, b),
        s"own round trip pixel ($x,$y)")
    }
  }

  test("decoders refuse hostile headers: overflowing chunk lengths, absurd dims — None, never a throw") {
    import Multimodal.RealCodecs
    // PNG with a chunk length near 2^31: int arithmetic would wrap the
    // bound check and crash copyOfRange
    val png = RealCodecs.encodePng(2, 2, (_, _) => (1, 2, 3))
    val evilLen = png.clone()
    val bbP = java.nio.ByteBuffer.wrap(evilLen)
    bbP.putInt(8, 0x7ffffff0) // IHDR length field
    assert(RealCodecs.decodePng(evilLen).isEmpty)
    // PNG claiming 60000x60000: must refuse BEFORE allocating ~10 GB
    val evilDims = png.clone()
    val bb2 = java.nio.ByteBuffer.wrap(evilDims)
    bb2.putInt(16, 60000); bb2.putInt(20, 60000)
    assert(RealCodecs.decodePng(evilDims).isEmpty) // (CRC also fails — order matters: dims check is inside IHDR handling)
    // WAV with a chunk size near 2^31
    val wav = RealCodecs.encodeWavPcm16(Array[Short](1, 2, 3), 8000)
    val evilWav = wav.clone()
    java.nio.ByteBuffer.wrap(evilWav)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(16, 0x7ffffff0)
    assert(RealCodecs.decodeWavPcm16(evilWav).isEmpty)
    // BMP claiming 2^20 x 2^20: rowBytes would overflow int
    val bmp = RealCodecs.encodeBmp24(2, 2, (_, _) => (1, 2, 3))
    val evilBmp = bmp.clone()
    java.nio.ByteBuffer.wrap(evilBmp)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(18, 1 << 20)
    java.nio.ByteBuffer.wrap(evilBmp)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(22, 1 << 20)
    assert(RealCodecs.decodeBmp24(evilBmp).isEmpty)
  }

  test("imageStats dispatches png blobs through the real decoder") {
    val png = Multimodal.RealCodecs.encodePng(2, 5,
      (x, y) => (0, 10 * (y + 1) + x, 0))
    val i = Multimodal.imageStats(
      Seq((9L, png)).toDF("media_id", "blob"), "media_id", "blob")
      .collect().head
    assert(i.getString(1) == "png" && i.getInt(2) == 2 && i.getInt(3) == 5)
    // g row y: 10(y+1), 10(y+1)+1 -> row sum 20(y+1)+1
    assert(i.getLong(5) == (1 to 5).map(20 * _ + 1).sum)
    assert(i.getLong(6) == (1 to 5).map(y => y.toLong * (20 * y + 1)).sum)
  }

  test("decimateAudio: exact every-k-th slice survives the re-encode; non-WAV drops") {
    val samples = Array.tabulate(11)(i => (100 * i - 500).toShort)
    val wav = Multimodal.RealCodecs.encodeWavPcm16(samples, 16000)
    val out = Multimodal.decimateAudio(
      Seq((1L, wav), (2L, "junk".getBytes("UTF-8"))).toDF("media_id", "blob"),
      "media_id", "blob", factor = 4).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    val Some((m, ss)) = Multimodal.RealCodecs.decodeWavPcm16(
      out.head.getAs[Array[Byte]](1))
    assert(m.sampleRate == 4000)
    assert(ss.toSeq == Seq(0, 4, 8).map(i => samples(i)),
      s"kept samples 0,4,8; got ${ss.toSeq}")
    intercept[IllegalArgumentException](
      Multimodal.decimateAudio(Seq((1L, wav)).toDF("media_id", "blob"),
        "media_id", "blob", factor = 0))
    // STEREO strides FRAMES: 11 interleaved samples = 5 full L/R frames
    // (+ a dropped dangling half-frame); factor 2 keeps frames 0,2,4 —
    // a raw-sample stride would emit (s0,s2,...) and swap channels
    val stereo = Multimodal.RealCodecs.encodeWavPcm16(samples, 16000,
      channels = 2)
    val sOut = Multimodal.decimateAudio(
      Seq((3L, stereo)).toDF("media_id", "blob"),
      "media_id", "blob", factor = 2).collect()
    val Some((sm, sss)) = Multimodal.RealCodecs.decodeWavPcm16(
      sOut.head.getAs[Array[Byte]](1))
    assert(sm.sampleRate == 8000 && sm.channels == 2)
    assert(sss.toSeq == Seq(0, 1, 4, 5, 8, 9).map(i => samples(i)),
      s"kept frames 0,2,4 intact; got ${sss.toSeq}")
  }

  test("grayPool: grid-aligned integer box means, hand-checked incl. uneven boxes") {
    // 5x3 image pooled to 2x2: x-boxes [0,2),[2,5); y-boxes [0,1),[1,3)
    val w = 5; val h = 3
    val px = new Array[Byte](w * h * 3)
    def set(x: Int, y: Int, v: Int): Unit = {
      px((y * w + x) * 3) = v.toByte; px((y * w + x) * 3 + 1) = 0
      px((y * w + x) * 3 + 2) = 0
    }
    for (y <- 0 until h; x <- 0 until w) set(x, y, 10 * y + x) // gray = r
    val g = Multimodal.grayPool(px, w, h, 2, 2)
    // cell(0,0): pixels (0,0),(1,0) -> (0+1)/2 = 0 (floor)
    // cell(1,0): (2,0),(3,0),(4,0) -> (2+3+4)/3 = 3
    // cell(0,1): (0,1),(1,1),(0,2),(1,2) -> (10+11+20+21)/4 = 15
    // cell(1,1): (12..14, 22..24) -> (12+13+14+22+23+24)/6 = 18
    assert(g.toSeq == Seq(0, 3, 15, 18), g.toSeq.toString)
    intercept[IllegalArgumentException](Multimodal.grayPool(px, w, h, 6, 2))
  }

  test("dHash56: exact brightness-shift invariance; distinct structure separates") {
    def blob(bright: Int, seed: Long) = Multimodal.RealCodecs.encodePng(16, 12,
      (x, y) => (((x * 31 + y * 17 + seed) % 247).toInt + bright,
        ((x * 7 + y * 101 + 2 * seed) % 247).toInt + bright,
        ((x + y + 3 * seed) % 247).toInt + bright))
    val h0 = Multimodal.dHash56(blob(0, 5L)).get
    assert(h0 >= 0L, "56-bit hash must stay in positive BIGINT range")
    assert(Multimodal.dHash56(blob(3, 5L)).get == h0,
      "uniform +3/channel must not move a gradient hash")
    assert(Multimodal.dHash56(blob(8, 5L)).get == h0)
    // a transposed-structure image flips gradients somewhere
    val other = Multimodal.RealCodecs.encodePng(16, 12,
      (x, y) => ((y * 31 + x * 90) % 247, (y * 7 + x * 3) % 247, 0))
    assert(Multimodal.dHash56(other).get != h0)
    // too small for a 9x7 grid, or undecodable: None, not garbage
    assert(Multimodal.dHash56(
      Multimodal.RealCodecs.encodePng(8, 12, (_, _) => (1, 2, 3))).isEmpty)
    assert(Multimodal.dHash56("nope".getBytes("UTF-8")).isEmpty)
  }

  test("resizeReal: pooled pixels survive the re-encode round trip; small images drop") {
    val src = Multimodal.RealCodecs.encodePng(6, 4,
      (x, y) => (40 * y + 6 * x, 10 * y + x, 7))
    val out = Multimodal.resizeReal(
      Seq((1L, src), (2L, Multimodal.RealCodecs.encodePng(2, 2, (_, _) => (0, 0, 0))),
        (3L, "junk".getBytes("UTF-8"))).toDF("media_id", "blob"),
      "media_id", "blob", outW = 3, outH = 2).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L), "small/junk must drop")
    val Some((m, px)) = Multimodal.RealCodecs.decodePng(out.head.getAs[Array[Byte]](1))
    assert((m.width, m.height) == (Some(3), Some(2)))
    // 6x4 -> 3x2: each box is 2x2; green cell (ox,oy) =
    // mean of 10y+x over x in {2ox,2ox+1}, y in {2oy,2oy+1}
    for (oy <- 0 until 2; ox <- 0 until 3) {
      val vals = for (y <- Seq(2 * oy, 2 * oy + 1); x <- Seq(2 * ox, 2 * ox + 1))
        yield 10 * y + x
      assert((px((oy * 3 + ox) * 3 + 1) & 0xff) == vals.sum / 4,
        s"green cell ($ox,$oy)")
    }
  }

  test("imageNearDupPairs: planted brightness pair found at hamming 0, band join not cartesian") {
    def blob(bright: Int, seed: Long) = Multimodal.RealCodecs.encodePng(16, 12,
      (x, y) => (((x * 31 + y * 17 + seed * 1009) % 247).toInt + bright,
        ((x * 7 + y * 101 + 2 * seed * 977) % 247).toInt + bright,
        ((x + y + 3 * seed * 601) % 247).toInt + bright))
    val df = (0L until 20L).map(i => (i, blob((3 * (i % 2)).toInt, i / 2)))
      .toDF("media_id", "blob")
    val q = Multimodal.imageNearDupPairs(df, "media_id", "blob", radius = 3)
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"band join must be an equi hash join:\n$p")
    val pairs = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = pairs.filter { case (a, b, _) => b == a + 1 && a % 2 == 0 }
    assert(planted.length == 10 && planted.forall(_._3 == 0),
      s"all 10 planted pairs at hamming 0, got ${planted.toSeq}")
    // texture-degenerate corpora trip the candidate-volume guard instead
    // of going quadratic (these linear-formula images hash near-alike)
    val e = intercept[IllegalArgumentException] {
      Multimodal.imageNearDupPairs(df, "media_id", "blob", radius = 3,
        maxCandidates = 3L).collect()
    }
    assert(e.getMessage.contains("maxCandidates"), e.getMessage)
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

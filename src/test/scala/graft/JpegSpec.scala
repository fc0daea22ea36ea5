package graft

import graft.operators.{JpegCodec, Multimodal}

/**
 * Pure-JVM baseline JPEG codec: self round-trips, cross-validation
 * against the JDK's own ImageIO JPEG plugin as BOTH a foreign decoder
 * (it reads our streams) and a foreign encoder (we read its streams) —
 * ImageIO is test-only scaffolding; the production path has no library
 * dependency. Tolerances: the JPEG spec allows small IDCT
 * implementation differences (±1 code), and chroma upsampling is
 * implementation-defined (ours is replication, libjpeg-family decoders
 * default to fancy/triangle) — so gray content compares tightly and
 * textured color content compares by mean absolute error.
 */
class JpegSpec extends GraftSpec {
  import spark.implicits._
  System.setProperty("java.awt.headless", "true")

  private def imageIoDecode(blob: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    assert(img != null, "ImageIO failed to decode")
    val w = img.getWidth; val h = img.getHeight
    val px = new Array[Int](w * h * 3)
    val raster = img.getRaster
    val gray = raster.getNumBands == 1
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      if (gray) {
        // raw codes, NOT getRGB: getRGB routes gray through a linear-
        // gray -> sRGB ColorModel conversion (a gamma curve), which
        // would compare color-managed values against codec output
        val g = raster.getSample(x, y, 0)
        px(o) = g; px(o + 1) = g; px(o + 2) = g
      } else {
        val rgb = img.getRGB(x, y)
        px(o) = (rgb >> 16) & 0xff; px(o + 1) = (rgb >> 8) & 0xff
        px(o + 2) = rgb & 0xff
      }
    }
    (w, h, px)
  }

  private def imageIoEncode(w: Int, h: Int, gray: Boolean,
                            pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val t = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
    else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    val img = new java.awt.image.BufferedImage(w, h, t)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pix(x, y)
      if (gray) img.getRaster.setSample(x, y, 0, g) // raw code (see decode)
      else img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    bos.toByteArray
  }

  test("gray unit-quant block-constant images round-trip bit-exact (the oracle bridge)") {
    // 8x8-block-constant values + all-ones quant: DC-only blocks whose
    // F(0,0)=8(v-128) is integer-exact through FDCT/quant/IDCT — incl.
    // non-multiple-of-8 dims (edge-replicated pad blocks stay constant)
    for ((w, h) <- Seq((8, 8), (12, 10), (20, 14), (8, 24))) {
      def v(x: Int, y: Int): Int = ((x / 8) * 31 + (y / 8) * 17 + 5) % 256
      val blob = JpegCodec.encodeGray(w, h, v)
      val Some((m, px)) = JpegCodec.decode(blob)
      assert((m.width, m.height, m.channels, m.format) ==
        (Some(w), Some(h), Some(1), "jpeg"))
      for (y <- 0 until h; x <- 0 until w; c <- 0 to 2)
        assert((px((y * w + x) * 3 + c) & 0xff) == v(x, y),
          s"($x,$y,$c) of ${w}x$h")
    }
  }

  test("restart markers: DRI/RSTn segmentation round-trips and resets DC prediction") {
    def v(x: Int, y: Int): Int = ((x / 8) * 67 + (y / 8) * 29 + 100) % 256
    val blob = JpegCodec.encodeGray(24, 24, v, restartEvery = 2)
    // the stream must actually contain RST markers
    val hasRst = blob.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    assert(hasRst, "restartEvery must emit RSTn")
    val Some((_, px)) = JpegCodec.decode(blob)
    for (y <- 0 until 24; x <- 0 until 24)
      assert((px((y * 24 + x) * 3) & 0xff) == v(x, y), s"($x,$y)")
    // and a foreign decoder accepts the restart-marker stream too
    val (fw, fh, fpx) = imageIoDecode(blob)
    assert((fw, fh) == (24, 24))
    for (i <- fpx.indices)
      assert(math.abs(fpx(i) - (px(i) & 0xff)) <= 1, s"foreign idx $i")
  }

  test("ImageIO as foreign DECODER: our 4:4:4 and 4:2:0 color streams read back within IDCT tolerance") {
    def pix(x: Int, y: Int) = ((x * 13 + y * 29 + 3) % 256,
      (x * 3 + y * 71 + 8) % 256, (x * 17 + y + 1) % 256)
    for (sub <- Seq(1, 2)) {
      val blob = JpegCodec.encode(19, 13, pix, chromaSub = sub,
        quantLuma = JpegCodec.scaledQuant(JpegCodec.StdQuantLuma, 90),
        quantChroma = JpegCodec.scaledQuant(JpegCodec.StdQuantChroma, 90))
      val Some((m, ours)) = JpegCodec.decode(blob)
      assert((m.width, m.height) == (Some(19), Some(13)))
      val (fw, fh, theirs) = imageIoDecode(blob)
      assert((fw, fh) == (19, 13))
      // same stream, two decoders: luma-only differences at 4:4:4 stay
      // within ±2; at 4:2:0 fancy-vs-replication chroma upsampling
      // diverges on this deliberately high-frequency chroma texture
      // (the worst case for the upsampling choice), so compare by mean
      // abs error with a bound that catches structural bugs (block
      // misplacement, DC drift) but tolerates the interpolation delta
      val diffs = ours.indices.map(i => math.abs((ours(i) & 0xff) - theirs(i)))
      val mae = diffs.sum.toDouble / diffs.length
      if (sub == 1) assert(diffs.max <= 2, s"4:4:4 max diff ${diffs.max}")
      else assert(mae <= 16.0, s"4:2:0 mean abs diff $mae")
    }
  }

  test("ImageIO as foreign ENCODER: gray and smooth-color fixtures decode within tolerance") {
    // gray: single-component stream, no chroma — tight bound
    def gv(x: Int, y: Int): Int = (x * 9 + y * 23 + 40) % 256
    val grayBlob = imageIoEncode(17, 11, gray = true,
      (x, y) => { val g = gv(x, y); (g, g, g) })
    assert(Multimodal.RealCodecs.sniff(grayBlob) == "jpeg")
    val Some((gm, gpx)) = JpegCodec.decode(grayBlob)
    assert((gm.width, gm.height, gm.channels) == (Some(17), Some(11), Some(1)))
    val (_, _, gRef) = imageIoDecode(grayBlob)
    val gDiffs = gpx.indices.map(i => math.abs((gpx(i) & 0xff) - gRef(i)))
    assert(gDiffs.max <= 1, s"gray foreign max diff ${gDiffs.max}")
    // smooth color gradient: chroma varies slowly, so the upsampling
    // choice contributes little; ImageIO's default quality is lossy —
    // compare our decode against ITS OWN decode, not the source pixels
    val colorBlob = imageIoEncode(24, 16, gray = false,
      (x, y) => (10 * x % 256, 8 * y % 256, (4 * x + 4 * y) % 256))
    val Some((cm, cpx)) = JpegCodec.decode(colorBlob)
    assert((cm.width, cm.height, cm.channels) == (Some(24), Some(16), Some(3)))
    val (_, _, cRef) = imageIoDecode(colorBlob)
    val cDiffs = cpx.indices.map(i => math.abs((cpx(i) & 0xff) - cRef(i)))
    val cMae = cDiffs.sum.toDouble / cDiffs.length
    assert(cMae <= 4.0, s"color foreign mean abs diff $cMae")
  }

  test("hostile and out-of-scope streams decode to None, never a throw") {
    val good = JpegCodec.encodeGray(16, 16, (x, y) => (x * y) % 256)
    // truncations at every prefix length must not throw
    for (n <- 0 until good.length by 7)
      assert(JpegCodec.decode(good.take(n)).isEmpty || n == good.length)
    // absurd dims: 65535x65535 is past the 64 Mpx cap
    val evil = good.clone()
    val sof = {
      var i = 2
      while (!((evil(i) & 0xff) == 0xff && (evil(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    evil(sof + 5) = 0xff.toByte; evil(sof + 6) = 0xff.toByte // height
    evil(sof + 7) = 0xff.toByte; evil(sof + 8) = 0xff.toByte // width
    assert(JpegCodec.decode(evil).isEmpty)
    // progressive (SOF2) is out of scope: flip the SOF marker
    val prog = good.clone(); prog(sof + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog).isEmpty)
    // random noise with a JPEG magic prefix
    val rnd = new java.util.Random(7)
    val noise = new Array[Byte](512); rnd.nextBytes(noise)
    noise(0) = 0xff.toByte; noise(1) = 0xd8.toByte; noise(2) = 0xff.toByte
    assert(JpegCodec.decode(noise).isEmpty)
    assert(JpegCodec.decode(Array[Byte](0x12, 0x34)).isEmpty)
  }

  test("imageStats dispatches jpeg blobs through the real decoder") {
    def v(x: Int, y: Int): Int = ((x / 8) * 10 + (y / 8) * 20 + 30) % 256
    val blob = JpegCodec.encodeGray(16, 12, v)
    val i = Multimodal.imageStats(
      Seq((4L, blob)).toDF("media_id", "blob"), "media_id", "blob")
      .collect().head
    assert(i.getString(1) == "jpeg" && i.getInt(2) == 16 && i.getInt(3) == 12)
    val want = (for (y <- 0 until 12; x <- 0 until 16) yield v(x, y).toLong).sum
    val wantY = (for (y <- 0 until 12; x <- 0 until 16)
      yield (y + 1).toLong * v(x, y)).sum
    assert(i.getLong(5) == want && i.getLong(6) == wantY)
  }
}

package graft

import graft.operators.{GifCodec, Multimodal}

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** GifCodec pins: self round trip (sequential + interlaced), both
  * directions against the JDK's ImageIO GIF codec (whose writer does
  * REAL LZW with growing code widths and KwKwK chains — the paths the
  * simple literal-stream encoder never produces), and hostile bytes. */
class GifSpec extends GraftSpec {

  private def formula(id: Long)(x: Int, y: Int): Int =
    ((x * 31 + y * 17 + id) % 256).toInt

  test("self round trip is pixel-exact, sequential and interlaced") {
    Seq((1L, false), (2L, true), (3L, true), (9L, false)).foreach {
      case (id, inter) =>
        val w = (4 + id % 9).toInt
        val h = (3 + id % 10).toInt
        val blob = GifCodec.encodeGray(w, h, formula(id), interlaced = inter)
        assert(Multimodal.RealCodecs.sniff(blob) == "gif")
        val (meta, px) = GifCodec.decode(blob).get
        assert(meta.width.contains(w) && meta.height.contains(h) &&
          meta.format == "gif")
        for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
          val want = formula(id)(x, y)
          assert((px((y * w + x) * 3 + c) & 0xff) == want,
            s"id=$id inter=$inter pixel ($x,$y) ch$c")
        }
    }
  }

  test("1x1 and single-row edges") {
    val b1 = GifCodec.encodeGray(1, 1, (_, _) => 77)
    assert(GifCodec.decode(b1).get._2.toSeq == Seq[Byte](77, 77, 77))
    val b2 = GifCodec.encodeGray(5, 1, (x, _) => 50 * x, interlaced = true)
    val px = GifCodec.decode(b2).get._2
    assert((0 until 5).forall(x => (px(x * 3) & 0xff) == 50 * x))
  }

  test("ImageIO reads our GIFs (encoder is spec-valid)") {
    val id = 4L
    val w = 11; val h = 9
    val blob = GifCodec.encodeGray(w, h, formula(id), interlaced = true)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(blob))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val want = formula(id)(x, y)
      val rgb = img.getRGB(x, y)
      assert((rgb & 0xff) == want && ((rgb >> 8) & 0xff) == want,
        s"pixel ($x,$y): want gray $want got ${rgb.toHexString}")
    }
  }

  test("we decode ImageIO's GIFs — real LZW width growth and KwKwK") {
    // gradient image: >256 distinct strings force dict growth past 512
    // (9->10-bit codes); the constant image forces long KwKwK chains
    val cases = Seq[(Int, Int, (Int, Int) => Int)](
      (100, 80, (x, y) => (x * 7 + y * 13) % 256),
      (64, 64, (_, _) => 200),
      (33, 1, (x, _) => (x * 97) % 256))
    cases.foreach { case (w, h, f) =>
      val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        val g = f(x, y)
        bi.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val baos = new ByteArrayOutputStream()
      assert(ImageIO.write(bi, "gif", baos), "JDK refused to write GIF")
      val blob = baos.toByteArray
      val (meta, px) = GifCodec.decode(blob)
        .getOrElse(fail(s"failed to decode ImageIO GIF ${w}x$h"))
      assert(meta.width.contains(w) && meta.height.contains(h))
      for (y <- 0 until h; x <- 0 until w) {
        // TYPE_BYTE_GRAY -> sRGB readback can shift levels; compare to
        // what ImageIO itself decodes from the same bytes
        val want = ImageIO.read(new java.io.ByteArrayInputStream(blob))
          .getRGB(x, y) & 0xff
        assert((px((y * w + x) * 3 + 1) & 0xff) == want,
          s"${w}x$h pixel ($x,$y)")
      }
    }
  }

  test("hostile bytes decode to None, never throw") {
    val good = GifCodec.encodeGray(6, 5, formula(7L))
    val cases = Seq[Array[Byte]](
      Array.empty,
      "GIF89a".getBytes("US-ASCII"),
      good.take(20),
      good.take(good.length - 3),
      { val b = good.clone(); b(8) = 0x70; b(7) = 0x70; b }, // huge dims
      Array.fill(300)(0x2c.toByte),
      { val b = good.clone(); b(b.length / 2) = (b(b.length / 2) ^ 0x55).toByte; b })
    cases.foreach { b =>
      val r = GifCodec.decode(b) // must not throw
      r match {
        case Some((m, px)) => // a mid-stream flip may legally still parse;
          assert(px.length == m.width.get * m.height.get * 3)
        case None => ()
      }
    }
    // the huge-dims case specifically must refuse BEFORE allocating
    val big = GifCodec.encodeGray(10, 10, (_, _) => 0)
    // logical screen w/h live at bytes 6-9; image descriptor w/h later —
    // patch the DESCRIPTOR dims (offset: 6+7+768 header+gct, +5)
    val off = 6 + 7 + 768 + 5
    val b = big.clone()
    b(off) = 0xff.toByte; b(off + 1) = 0xff.toByte
    b(off + 2) = 0xff.toByte; b(off + 3) = 0xff.toByte
    assert(GifCodec.decode(b).isEmpty)
  }

  test("encodeGray refuses dims whose byte budget overflows Int") {
    // 0xffff x 0xffff passes the per-axis checks but w*h*2 wraps negative;
    // the total-pixel guard must catch it before any allocation
    intercept[IllegalArgumentException](
      GifCodec.encodeGray(0xffff, 0xffff, (_, _) => 0))
    intercept[IllegalArgumentException](
      GifCodec.encodeGray(1 << 13, (1 << 13) + 1, (_, _) => 0))
  }
}

package graft

import graft.operators.H264Codec

class H264Spec extends GraftSpec {

  test("SPS bytes pin: hand-computed minimal baseline 64x48 SPS") {
    // profile 66, flags 0, level 31, then Exp-Golomb by hand:
    // sps_id ue(0)=1, log2mfn ue(0)=1, poc ue(2)=011, refs ue(1)=010,
    // gaps 0, width ue(3)=00100, height ue(2)=011, mbs_only 1, d8x8 1,
    // crop 0, vui 0, stop 1, pad 00 -> DA 11 E4
    val s = H264Codec.encodeFixture(64, 48, frames = 1)
    val want = Array(0x00, 0x00, 0x00, 0x01, 0x67, 0x42, 0x00, 0x1F,
      0xDA, 0x11, 0xE4).map(_.toByte)
    assert(s.take(want.length).sameElements(want),
      s.take(want.length).map(b => f"${b & 0xff}%02X").mkString(" "))
  }

  test("round trip across the parameter grid") {
    for {
      (w, h) <- Seq((64, 48), (1920, 1088), (128, 128))
      frames <- Seq(1, 7)
      fps <- Seq(0.0, 24.0, 30.0)
      profile <- Seq(66, 100)
    } {
      val s = H264Codec.encodeFixture(w, h, frames, fps, profile,
        levelIdc = 41)
      val i = H264Codec.parse(s).get
      assert(i.width == w && i.height == h, s"$w x $h -> ${i.width} x ${i.height}")
      assert(i.frames == frames && i.idrFrames == 1)
      assert(i.profileIdc == profile && i.level == "4.1")
      assert(i.profile == (if (profile == 66) "baseline" else "high"))
      if (fps > 0) {
        assert(i.fps.contains(fps))
        assert(i.durationMs.contains((frames * 1000.0 / fps).toLong))
      } else assert(i.fps.isEmpty && i.durationMs.isEmpty)
      assert(i.badNals == 0)
    }
  }

  test("cropping arithmetic: 1080p is 1088 map-height minus 8 crop") {
    val s = H264Codec.encodeFixture(1920, 1088, frames = 2, cropBottom = 8)
    val i = H264Codec.parse(s).get
    assert(i.width == 1920 && i.height == 1080)
    val s2 = H264Codec.encodeFixture(64, 64, frames = 1, cropRight = 4,
      cropBottom = 16)
    val i2 = H264Codec.parse(s2).get
    assert(i2.width == 60 && i2.height == 48)
  }

  test("multi-slice pictures count once (continuation slices first_mb > 0)") {
    val s = H264Codec.encodeFixture(128, 96, frames = 5, slicesPerFrame = 3)
    val i = H264Codec.parse(s).get
    assert(i.frames == 5 && i.idrFrames == 1)
    // 1 SPS + 1 PPS + 15 slice NALs
    assert(i.nalUnits == 17, s"nalUnits=${i.nalUnits}")
  }

  test("emulation prevention: escape/unescape round-trips hostile payloads") {
    val payloads = Seq(
      Array[Byte](0, 0, 0, 0, 1, 2, 3),
      Array[Byte](0, 0, 1),
      Array[Byte](0, 0, 3, 0, 0, 2),
      Array.fill[Byte](64)(0),
      Array[Byte](1, 2, 3, 4))
    payloads.foreach { p =>
      val esc = H264Codec.escapeRbsp(p)
      // no start-code-prefix emulation survives escaping
      val bad = (0 until esc.length - 2).exists(k =>
        esc(k) == 0 && esc(k + 1) == 0 && (esc(k + 2) & 0xff) <= 2)
      assert(!bad, esc.map(b => f"$b%02X").mkString(" "))
      val back = H264Codec.unescapeRbsp(esc, 0, esc.length)
      assert(back.sameElements(p))
    }
  }

  test("hostile inputs: garbage, truncation, forbidden bit, null") {
    assert(H264Codec.parse(null).isEmpty)
    assert(H264Codec.parse(Array.fill[Byte](1024)(0x5A)).isEmpty)
    assert(H264Codec.parse(Array.fill[Byte](4096)(0)).isEmpty)
    val good = H264Codec.encodeFixture(64, 48, frames = 3, fps = 24.0)
    // truncate mid-SPS: no dimensions -> None
    assert(H264Codec.parse(good.take(8)).isEmpty)
    // flip the forbidden bit on the first slice NAL: that NAL is bad,
    // the walk survives and still counts the remaining pictures
    val idx = {
      // find the IDR NAL header (0x65 after a 3-byte start code)
      (0 until good.length - 3).find(k =>
        good(k) == 0 && good(k + 1) == 0 && good(k + 2) == 1 &&
          (good(k + 3) & 0x1f) == 5).get + 3
    }
    val mut = good.clone()
    mut(idx) = (mut(idx) | 0x80).toByte
    val i = H264Codec.parse(mut).get
    assert(i.badNals == 1 && i.frames == 2 && i.idrFrames == 0)
  }

  test("truncated final slice counts as bad, earlier frames survive") {
    val good = H264Codec.encodeFixture(64, 48, frames = 4)
    // cut inside the last NAL's payload (drop the final byte)
    val cut = good.dropRight(1)
    val i = H264Codec.parse(cut).get
    // the final slice header prefix still parses (cut hits filler), so
    // frames stay 4; cutting deeper (into the header) loses the frame
    assert(i.frames == 4 || i.frames == 3)
    val deeper = good.dropRight(3)
    val i2 = H264Codec.parse(deeper)
    assert(i2.isEmpty || i2.get.frames <= 4)
  }
}

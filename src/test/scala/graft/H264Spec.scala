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

  // minimal test-side bit writer for hand-built SPS payloads — covers
  // the SPS branches the fixture encoder never takes (pocType 0/1,
  // scaling matrices, interlace)
  private class Bits {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0; private var n = 0
    def u(v: Long, k: Int): Bits = {
      (k - 1 to 0 by -1).foreach { i =>
        cur = (cur << 1) | ((v >> i) & 1).toInt; n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
      }; this
    }
    def ue(v: Long): Bits = {
      val code = v + 1
      val len = 63 - java.lang.Long.numberOfLeadingZeros(code)
      u(0, len.toInt); u(code, len.toInt + 1)
    }
    def se(v: Long): Bits = ue(if (v <= 0) -2 * v else 2 * v - 1)
    def done(): Array[Byte] = { u(1, 1); while (n != 0) u(0, 1); out.toByteArray }
  }

  private def streamWithSps(sps: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0, 0, 0, 1, 0x67)); out.write(sps)
    // one valid IDR slice (first_mb=0, type I, pps 0, frame_num 0, idr 0)
    val slice = new Bits
    slice.ue(0).ue(7).ue(0).u(0, 4).ue(0)
    out.write(Array[Byte](0, 0, 1, 0x65)); out.write(slice.done())
    out.toByteArray
  }

  test("SPS branches the fixture never takes: pocType 0, pocType 1, " +
    "scaling matrix, interlace") {
    // pocType 0: one extra ue (log2_max_pic_order_cnt_lsb_minus4)
    val poc0 = new Bits
    poc0.u(66, 8).u(0, 8).u(31, 8).ue(0).ue(0)
      .ue(0).ue(2) // pocType 0 + log2maxpoclsb
      .ue(1).u(0, 1).ue(3).ue(2).u(1, 1).u(1, 1).u(0, 1).u(0, 1)
    val i0 = H264Codec.parse(streamWithSps(poc0.done())).get
    assert(i0.width == 64 && i0.height == 48 && i0.frames == 1)
    // pocType 1: flag + 2 se + cycle of 2 se offsets
    val poc1 = new Bits
    poc1.u(66, 8).u(0, 8).u(31, 8).ue(0).ue(0)
      .ue(1).u(1, 1).se(-3).se(4).ue(2).se(1).se(-1)
      .ue(1).u(0, 1).ue(3).ue(2).u(1, 1).u(1, 1).u(0, 1).u(0, 1)
    val i1 = H264Codec.parse(streamWithSps(poc1.done())).get
    assert(i1.width == 64 && i1.height == 48)
    // High profile with one scaling list present (16-entry delta walk)
    val sm = new Bits
    sm.u(100, 8).u(0, 8).u(41, 8).ue(0)
      .ue(1).ue(0).ue(0).u(0, 1) // chroma 4:2:0, depths, bypass
      .u(1, 1) // seq_scaling_matrix_present
    sm.u(1, 1) // list 0 present
    (0 until 16).foreach(_ => sm.se(1)) // deltas keep nextScale nonzero
    (1 until 8).foreach(_ => sm.u(0, 1)) // lists 1..7 absent
    sm.ue(0).ue(2).ue(1).u(0, 1).ue(3).ue(2).u(1, 1).u(1, 1).u(0, 1).u(0, 1)
    val i2 = H264Codec.parse(streamWithSps(sm.done())).get
    assert(i2.profile == "high" && i2.width == 64 && i2.height == 48)
    // interlaced (frame_mbs_only=0): height doubles per map unit and
    // mb_adaptive flag is consumed
    val il = new Bits
    il.u(66, 8).u(0, 8).u(31, 8).ue(0).ue(0).ue(2)
      .ue(1).u(0, 1).ue(3).ue(2)
      .u(0, 1).u(1, 1) // frame_mbs_only=0, mb_adaptive=1
      .u(1, 1).u(0, 1).u(0, 1)
    val i3 = H264Codec.parse(streamWithSps(il.done())).get
    assert(i3.width == 64 && i3.height == 96, s"${i3.width}x${i3.height}")
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

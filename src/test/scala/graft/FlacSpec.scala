package graft

import graft.operators.{FlacCodec, Multimodal}

/**
 * FlacCodec pins: exact lossless round trips through every encoder path
 * (CONSTANT / FIXED+Rice / VERBATIM, mono + all three stereo modes,
 * multi-frame, short tail frames), HAND-BUILT streams for the decode
 * paths the small encoder never emits (LPC subframes, multi-partition
 * and escape residuals, the 5-bit parameter method, wasted bits — the
 * PNG hand-fixture discipline), and hostile bytes.
 */
class FlacSpec extends GraftSpec {

  private def noise(n: Int, seed: Long): Array[Short] =
    Array.tabulate(n) { i =>
      ((graft.operators.Dedup.md5LongJvm(s"fl_${seed}_$i") % 65536) - 32768).toShort
    }

  test("mono round trip: noise, multi-frame, short tail") {
    Seq(1, 5, 15, 255, 256, 257, 1000).foreach { n =>
      val in = noise(n, n)
      val blob = FlacCodec.encode(in, 16000, channels = 1, blockSize = 256)
      assert(Multimodal.RealCodecs.sniff(blob) == "flac")
      val (meta, out) = FlacCodec.decode(blob).get
      assert(meta == FlacCodec.FlacMeta(16000, 1, 16, n.toLong), s"n=$n")
      assert(out.toSeq == in.toSeq, s"n=$n")
    }
  }

  test("stereo round trips: independent, left/side, mid/side") {
    val in = noise(600, 7) // 300 frames of L/R
    Seq("independent", "leftside", "midside").foreach { mode =>
      val blob = FlacCodec.encode(in, 8000, channels = 2, blockSize = 128,
        stereoMode = mode)
      val (meta, out) = FlacCodec.decode(blob).get
      assert(meta.channels == 2 && meta.nSamples == 300)
      assert(out.toSeq == in.toSeq, s"mode=$mode")
    }
    // extreme values stress the side channel's 17-bit width
    val ext = Array[Short](32767, -32768, -32768, 32767, 0, -1, 1, 0,
      32767, 32767, -32768, -32768, 17, -9999, 12345, -12345)
    Seq("leftside", "midside").foreach { mode =>
      val blob = FlacCodec.encode(ext, 8000, channels = 2, blockSize = 16,
        stereoMode = mode)
      assert(FlacCodec.decode(blob).get._2.toSeq == ext.toSeq, s"mode=$mode")
    }
  }

  test("constant and ramp blocks (CONSTANT / FIXED order paths)") {
    val flat = Array.fill[Short](500)(123)
    assert(FlacCodec.decode(FlacCodec.encode(flat, 44100, blockSize = 256))
      .get._2.toSeq == flat.toSeq)
    val ramp = Array.tabulate[Short](500)(i => (i * 3 - 700).toShort) // order 1/2 wins
    val blob = FlacCodec.encode(ramp, 44100, blockSize = 256)
    assert(FlacCodec.decode(blob).get._2.toSeq == ramp.toSeq)
    assert(blob.length < 500 * 2, "ramp should compress below verbatim")
  }

  // ---- hand-built streams ------------------------------------------

  /** Minimal MSB-first writer for hand fixtures. */
  private class W {
    val bytes = collection.mutable.ArrayBuffer[Byte]()
    private var acc = 0; private var n = 0
    def bit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1); n += 1
      if (n == 8) { bytes += acc.toByte; acc = 0; n = 0 }
    }
    def bits(v: Long, w: Int): Unit = (w - 1 to 0 by -1).foreach(k => bit(((v >> k) & 1).toInt))
    def unary(q: Int): Unit = { (0 until q).foreach(_ => bit(0)); bit(1) }
    def align(): Unit = while (n != 0) bit(0)
    def arr: Array[Byte] = { align(); bytes.toArray }
  }

  private def streamInfo(blockSize: Int, rate: Int, channels: Int,
                         total: Long): Array[Byte] = {
    val w = new W
    w.bits(blockSize.toLong, 16); w.bits(blockSize.toLong, 16)
    w.bits(0, 24); w.bits(0, 24)
    w.bits(rate.toLong, 20); w.bits((channels - 1).toLong, 3); w.bits(15, 5)
    w.bits(total, 36); w.bits(0, 64); w.bits(0, 64)
    w.arr
  }

  /** Assemble fLaC + STREAMINFO + one hand-built frame (header crc8 and
    * frame crc16 computed here so fixtures stay valid by construction). */
  private def oneFrameStream(blockSize: Int, rate: Int,
                             subframes: W => Unit): Array[Byte] = {
    val out = collection.mutable.ArrayBuffer[Byte]()
    out ++= "fLaC".getBytes("US-ASCII")
    out += 0x80.toByte; out += 0; out += 0; out += 34
    out ++= streamInfo(blockSize, rate, 1, blockSize.toLong)
    val hw = new W
    hw.bits(0x3ffe, 14); hw.bit(0); hw.bit(0)
    hw.bits(7, 4); hw.bits(0, 4) // blocksize: 16-bit at end; rate: STREAMINFO
    hw.bits(0, 4) // mono
    hw.bits(4, 3); hw.bit(0) // 16-bit
    hw.bits(0, 8) // frame number 0
    hw.bits((blockSize - 1).toLong, 16)
    val header = hw.arr
    val fw = new W
    header.foreach(b => fw.bits(b & 0xff, 8))
    fw.bits(FlacCodec.crc8(header, 0, header.length).toLong, 8)
    subframes(fw)
    val body = fw.arr
    out ++= body
    val c16 = FlacCodec.crc16(body, 0, body.length)
    out += ((c16 >> 8) & 0xff).toByte; out += (c16 & 0xff).toByte
    out.toArray
  }

  test("hand-built LPC subframe decodes (order 1, shift 1)") {
    // warmup 100; coeff 3, shift 1 -> pred = (3*prev)>>1; residuals +1
    val bs = 6
    val blob = oneFrameStream(bs, 8000, { w =>
      w.bit(0); w.bits(32, 6); w.bit(0) // LPC order 1, no wasted bits
      w.bits(100 & 0xffff, 16) // warmup
      w.bits(1, 4) // precision - 1 = 1 -> 2 bits
      w.bits(1, 5) // shift = 1
      w.bits(1, 2) // coeff = +1 in 2-bit two's complement... use 1
      w.bits(0, 2); w.bits(0, 4) // residual method 0, partition order 0
      w.bits(0, 4) // rice param 0
      (1 until bs).foreach(_ => w.unary(2)) // zigzag 2 -> residual +1
    })
    val (meta, out) = FlacCodec.decode(blob).get
    assert(meta.nSamples == bs)
    // s[i] = ((1 * s[i-1]) >> 1) + 1
    val want = Iterator.iterate(100L)(v => (v >> 1) + 1).take(bs).toSeq
    assert(out.map(_.toLong).toSeq == want)
  }

  test("hand-built multi-partition 5-bit-method residuals with escape") {
    // FIXED order 0, partition order 1 (two partitions of 4):
    // partition 1: rice param 1; partition 2: ESCAPE, 3-bit raw
    val bs = 8
    val blob = oneFrameStream(bs, 8000, { w =>
      w.bit(0); w.bits(8, 6); w.bit(0) // FIXED order 0
      w.bits(1, 2) // method 1: 5-bit params
      w.bits(1, 4) // partition order 1
      w.bits(1, 5) // partition 1: param 1
      Seq(0L, 1L, -1L, 2L).foreach { v => // zigzag: 0,2,1,4
        val u = (v << 1) ^ (v >> 63)
        w.unary((u >>> 1).toInt); w.bits(u & 1, 1)
      }
      w.bits(31, 5) // partition 2: escape
      w.bits(3, 5) // 3-bit raw residuals
      Seq(3L, -4L, -1L, 2L).foreach(v => w.bits(v & 7, 3))
    })
    val (_, out) = FlacCodec.decode(blob).get
    assert(out.map(_.toLong).toSeq == Seq(0L, 1L, -1L, 2L, 3L, -4L, -1L, 2L))
  }

  test("hand-built wasted-bits subframe") {
    // CONSTANT with 2 wasted bits: stored value 25 -> output 100
    val bs = 4
    val blob = oneFrameStream(bs, 8000, { w =>
      w.bit(0); w.bits(0, 6) // CONSTANT
      w.bit(1); w.unary(1) // wasted flag; unary 1 -> wasted = 2
      w.bits(25, 14) // 16 - 2 = 14-bit value
    })
    val (_, out) = FlacCodec.decode(blob).get
    assert(out.toSeq == Seq.fill(bs)(100.toShort))
  }

  test("hostile bytes decode to None, never throw") {
    val good = FlacCodec.encode(noise(300, 3), 16000, blockSize = 256)
    val cases = Seq[Array[Byte]](
      Array.empty,
      "fLaC".getBytes("US-ASCII"),
      good.take(30),
      good.take(good.length - 2),
      { val b = good.clone(); b(60) = (b(60) ^ 0x40).toByte; b }, // CRC breaks
      { val b = good.clone(); b(b.length - 1) = (b(b.length - 1) ^ 1).toByte; b },
      Array.fill(200)(0xff.toByte))
    cases.foreach(b => assert(FlacCodec.decode(b).isEmpty ||
      b.sameElements(good), "hostile bytes must not decode"))
    // sample-budget cap: a STREAMINFO demanding 2^35 samples refuses early
    val w = new W
    w.bits(16, 16); w.bits(16, 16); w.bits(0, 24); w.bits(0, 24)
    w.bits(16000, 20); w.bits(0, 3); w.bits(15, 5)
    w.bits(1L << 35, 36); w.bits(0, 64); w.bits(0, 64)
    val big = "fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ w.arr
    assert(FlacCodec.decode(big).isEmpty)
  }

  test("encode refuses field-overflowing parameters instead of bit-truncating") {
    val s = new Array[Short](64)
    // STREAMINFO sample rate is a 20-bit field
    intercept[IllegalArgumentException](FlacCodec.encode(s, 0))
    intercept[IllegalArgumentException](FlacCodec.encode(s, -8000))
    intercept[IllegalArgumentException](FlacCodec.encode(s, 1 << 20))
    assert(FlacCodec.encode(s, (1 << 20) - 1).nonEmpty)
    // frame count must stay inside the 21-bit coded-number range
    intercept[IllegalArgumentException](
      FlacCodec.encode(new Array[Short](16 * (1 << 21) + 16), 16000,
        blockSize = 16))
  }

  test("audioStats dispatches FLAC to the shared stats kernel") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three")).toDF("doc_id", "text")
    val flacUdf = udf((t: String) => Multimodal.flacBlobFromText(t, 16000))
    val wavUdf = udf((t: String) => Multimodal.wavBlobFromText(t, 16000))
    val both = docs.select(col("doc_id"),
      flacUdf(col("text")).as("fblob"), wavUdf(col("text")).as("wblob"))
    val f = Multimodal.audioStats(both.select(col("doc_id"),
      col("fblob").as("blob")), "doc_id", "blob").orderBy("media_id").collect()
    val v = Multimodal.audioStats(both.select(col("doc_id"),
      col("wblob").as("blob")), "doc_id", "blob").orderBy("media_id").collect()
    f.zip(v).foreach { case (fr, wr) =>
      assert(fr.getString(1) == "flac" && wr.getString(1) == "wav")
      (2 until 6).foreach(i => assert(fr.get(i) == wr.get(i),
        s"stat $i differs: flac=${fr.get(i)} wav=${wr.get(i)}"))
    }
  }
}

package graft

import graft.operators.{Mp3Codec, Multimodal}
import org.apache.spark.sql.functions._

class Mp3Spec extends GraftSpec {
  import spark.implicits._

  test("silent-frame round trip across rates, channels, bitrates, CRC") {
    for {
      rate <- Seq(44100, 48000, 32000)
      ch <- Seq(1, 2)
      kbps <- Seq(64, 128, 320)
      crc <- Seq(false, true)
    } {
      val bytes = Mp3Codec.encodeSilent(rate, ch, frames = 7,
        bitrateKbps = kbps, withCrc = crc)
      val i = Mp3Codec.parse(bytes).getOrElse(
        fail(s"parse failed rate=$rate ch=$ch kbps=$kbps crc=$crc"))
      assert(i.version == "1" && i.sampleRate == rate && i.channels == ch)
      assert(i.frames == 7 && i.samples == 7L * 1152)
      assert(i.durationMs == 7L * 1152 * 1000 / rate)
      assert(i.bitrateKbps == kbps && !i.vbr && i.badFrames == 0)
    }
  }

  test("ID3v2/ID3v1 tags are skipped; false syncs in tag junk don't anchor") {
    val clean = Mp3Codec.encodeSilent(44100, 1, frames = 5, bitrateKbps = 128)
    val tagged = Mp3Codec.withId3(clean, v2PayloadBytes = 200)
    val i = Mp3Codec.parse(tagged).get
    assert(i.frames == 5 && i.badFrames == 0 && i.durationMs ==
      Mp3Codec.parse(clean).get.durationMs)
  }

  test("damage: truncated tail dropped, corrupt CRC counted, garbage = None") {
    val s = Mp3Codec.encodeSilent(48000, 2, frames = 6, bitrateKbps = 192,
      withCrc = true)
    val frameLen = 144 * 192 * 1000 / 48000
    // truncated final frame
    val trunc = s.take(s.length - frameLen / 2)
    val ti = Mp3Codec.parse(trunc).get
    assert(ti.frames == 5)
    // corrupt one protected side-info byte in frame 3: CRC must fail it
    val bad = s.clone()
    bad(2 * frameLen + 10) = (bad(2 * frameLen + 10) ^ 0x5a).toByte
    val bi = Mp3Codec.parse(bad).get
    assert(bi.frames == 5 && bi.badFrames == 1)
    // pure garbage
    assert(Mp3Codec.parse(Array.fill[Byte](4096)(0x55)).isEmpty)
    assert(Mp3Codec.parse(Array.fill[Byte](4096)(0xff.toByte)).isEmpty)
    assert(Mp3Codec.parse(null).isEmpty)
  }

  test("Xing tag sets vbr; the tag frame is excluded from accounting") {
    val s = Mp3Codec.encodeSilent(44100, 1, frames = 4, bitrateKbps = 128)
    val p = 4 + 17 // header + mono side info, no CRC
    s(p) = 'X'; s(p + 1) = 'i'; s(p + 2) = 'n'; s(p + 3) = 'g'
    s(p + 7) = 1 // flags: frames present
    s(p + 11) = 4
    val i = Mp3Codec.parse(s).get
    // the tag-carrying first frame is metadata, not audio: 3 real frames
    assert(i.vbr && i.frames == 3 && i.samples == 3L * 1152)
  }

  test("Info tag marks CBR (LAME convention): vbr stays false") {
    val s = Mp3Codec.encodeSilent(44100, 1, frames = 4, bitrateKbps = 128)
    val p = 4 + 17
    s(p) = 'I'; s(p + 1) = 'n'; s(p + 2) = 'f'; s(p + 3) = 'o'
    s(p + 7) = 1
    s(p + 11) = 4
    val i = Mp3Codec.parse(s).get
    assert(!i.vbr && i.frames == 3)
  }

  test("tag-only stream (no audio frames) parses to None") {
    val s = Mp3Codec.encodeSilent(44100, 1, frames = 1, bitrateKbps = 128)
    val p = 4 + 17
    s(p) = 'X'; s(p + 1) = 'i'; s(p + 2) = 'n'; s(p + 3) = 'g'
    assert(Mp3Codec.parse(s).isEmpty)
  }

  test("mp3Info operator: nulls for non-MP3, metadata for streams") {
    val mk = udf { (id: Long) =>
      if (id == 9L) "not audio at all".getBytes("UTF-8")
      else Mp3Codec.encodeSilent(44100, 1, frames = 2 + id.toInt,
        bitrateKbps = 128, withCrc = id % 2 == 0)
    }
    val df = spark.range(0, 10).select(col("id"), mk(col("id")).as("blob"))
    val got = Multimodal.mp3Info(df, "id", "blob", batchSize = 4)
      .orderBy("media_id").collect()
    assert(got.length == 10)
    (0 until 9).foreach { k =>
      val r = got(k)
      assert(r.getString(1) == "mp3" && r.getInt(5) == 2 + k,
        s"row $k: $r")
      assert(r.getLong(6) == (2 + k).toLong * 1152 * 1000 / 44100)
    }
    assert(got(9).getString(1) == "stub" && got(9).isNullAt(5))
  }
}

package graft.operators

import java.io.ByteArrayOutputStream

/**
 * MPEG Audio Layer III (MP3) FRAME-LEVEL codec: header/stream parsing,
 * CRC validation, Xing/Info VBR accounting, ID3 tag handling, and a
 * spec-valid silent-frame encoder for fixtures (ISO/IEC 11172-3 §2.4;
 * MPEG-2 LSF per ISO/IEC 13818-3). Pure JVM, allocation-bounded,
 * hostile-input-safe (any malformed stream → None or counted bad
 * frames, never a throw).
 *
 * WHAT a 100 TB audio-curation pipeline runs against podcast/speech
 * dumps is exactly this layer: validity gating (does the stream parse?
 * how many damaged frames?), duration/sample-rate/channel extraction
 * for budgeting and bucketing, CBR/VBR detection. All of it is here
 * and oracle-checkable.
 *
 * THE HONEST BOUNDARY — PCM decode stays out, deliberately. Full Layer
 * III synthesis (Huffman → requantize → stereo → alias/IMDCT →
 * polyphase) hinges on the ISO Huffman code tables: ~4,000 specific
 * (code, value) entries across 34 tables. Unlike JPEG (Annex K tables,
 * compact, and cross-validatable against JDK ImageIO) or FLAC (Rice
 * codes are algorithmic, validated against our own encoder AND the
 * JDK's WAV path), this container offers NO ground truth for those
 * tables: no reference MP3 decoder in the JDK, no sample MP3 bytes on
 * disk, zero network egress. A decoder whose only check is agreeing
 * with its own encoder's copy of the same hand-typed tables would be
 * self-consistent garbage if a single entry were mistyped — an
 * UNVALIDATABLE component masquerading as a real one, which is worse
 * than a stub. The day a validated table source is available, the
 * frame walk here already yields the per-granule bit regions a
 * synthesis stage would consume.
 */
object Mp3Codec {

  /** Stream-level metadata from a full frame walk. */
  case class Mp3Info(
      version: String,     // "1" | "2" | "2.5"
      sampleRate: Int,
      channels: Int,
      frames: Int,         // complete, validated frames
      samples: Long,       // frames × samples-per-frame
      durationMs: Long,    // samples * 1000 / sampleRate (integer)
      bitrateKbps: Int,    // average over frames (integer)
      vbr: Boolean,        // >1 distinct bitrate index or a Xing tag
                           //   ('Info' marks CBR by LAME convention)
      badFrames: Int)      // resyncs + CRC failures skipped over

  // MPEG-1 Layer III bitrates (kbps), index 1..14; 0 = free, 15 = bad
  private val bitratesV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320, -1)
  // MPEG-2 / 2.5 Layer III (LSF)
  private val bitratesV2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64,
    80, 96, 112, 128, 144, 160, -1)
  private val ratesV1 = Array(44100, 48000, 32000, -1)
  private val ratesV2 = Array(22050, 24000, 16000, -1)
  private val ratesV25 = Array(11025, 12000, 8000, -1)

  /** One parsed frame header (fields needed for the walk). */
  private case class Header(versionBits: Int, crcPresent: Boolean,
                            bitrateIdx: Int, sampleRate: Int, padding: Int,
                            channels: Int, frameLen: Int, samplesPerFrame: Int,
                            sideInfoLen: Int, bitrateKbps: Int)

  /** Parse + validate the 4 header bytes at `off`; None if not a valid
    * Layer III header. Free-format (bitrate index 0) is rejected — its
    * frame length is undefined without a second sync scan, and corpus
    * MP3s don't ship it. */
  private def header(b: Array[Byte], off: Int): Option[Header] = {
    if (off + 4 > b.length) return None
    val h = ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    if ((h >>> 21) != 0x7ff) return None // 11-bit sync
    val version = (h >>> 19) & 3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    if (version == 1) return None
    val layer = (h >>> 17) & 3 // 1 = Layer III
    if (layer != 1) return None
    val crcPresent = ((h >>> 16) & 1) == 0
    val bitrateIdx = (h >>> 12) & 0xf
    if (bitrateIdx == 0 || bitrateIdx == 15) return None
    val rateIdx = (h >>> 10) & 3
    if (rateIdx == 3) return None
    if ((h & 3) == 2) return None // reserved emphasis
    val mode = (h >>> 6) & 3
    val channels = if (mode == 3) 1 else 2
    val mpeg1 = version == 3
    val sampleRate = version match {
      case 3 => ratesV1(rateIdx)
      case 2 => ratesV2(rateIdx)
      case _ => ratesV25(rateIdx)
    }
    val kbps = if (mpeg1) bitratesV1(bitrateIdx) else bitratesV2(bitrateIdx)
    val padding = (h >>> 9) & 1
    val coef = if (mpeg1) 144 else 72
    val frameLen = coef * kbps * 1000 / sampleRate + padding
    val spf = if (mpeg1) 1152 else 576
    val sideInfoLen =
      if (mpeg1) { if (channels == 1) 17 else 32 }
      else { if (channels == 1) 9 else 17 }
    if (frameLen < 4 + (if (crcPresent) 2 else 0) + sideInfoLen) return None
    Some(Header(version, crcPresent, bitrateIdx, sampleRate, padding,
      channels, frameLen, spf, sideInfoLen, kbps))
  }

  /** CRC-16 (poly 0x8005, init 0xFFFF, MSB-first) over the ranges the
    * spec protects: header bytes 2–3 then the side info. */
  private[operators] def crc16(b: Array[Byte], ranges: Seq[(Int, Int)]): Int = {
    var crc = 0xffff
    ranges.foreach { case (from, until) =>
      var i = from
      while (i < until) {
        crc ^= (b(i) & 0xff) << 8
        var k = 0
        while (k < 8) {
          crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
                else (crc << 1) & 0xffff
          k += 1
        }
        i += 1
      }
    }
    crc
  }

  /** Syncsafe 28-bit int (ID3v2 sizes). */
  private def syncsafe(b: Array[Byte], off: Int): Int =
    ((b(off) & 0x7f) << 21) | ((b(off + 1) & 0x7f) << 14) |
      ((b(off + 2) & 0x7f) << 7) | (b(off + 3) & 0x7f)

  /** Parse an MP3 stream: skip ID3v2/ID3v1 tags, walk frames from the
    * first valid chained sync, validate CRCs where present, read a
    * Xing/Info VBR tag if the first frame carries one. Truncated final
    * frames are dropped; a mid-stream chain break resyncs forward
    * (counted in badFrames, capped — a stream that is mostly garbage
    * returns None rather than a fiction). */
  def parse(bytes: Array[Byte], maxBad: Int = 64): Option[Mp3Info] = {
    if (bytes == null || bytes.length < 4) return None
    var start = 0
    var end = bytes.length
    // ID3v2 at start: "ID3" ver(2) flags(1) syncsafe-size(4)
    if (end >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = syncsafe(bytes, 6)
      val footer = (bytes(5) & 0x10) != 0
      val skip = 10L + size + (if (footer) 10 else 0)
      if (skip >= end) return None
      start = skip.toInt
    }
    // ID3v1 at end: 128-byte "TAG"
    if (end - start >= 128 && bytes(end - 128) == 'T' &&
        bytes(end - 127) == 'A' && bytes(end - 126) == 'G') end -= 128

    // first frame: scan for a sync whose NEXT frame also parses (or is
    // EOF) — a lone false sync in junk bytes must not anchor the walk
    var off = start
    var first: Option[Header] = None
    while (first.isEmpty && off + 4 <= end) {
      header(bytes, off) match {
        case Some(h) =>
          val nxt = off + h.frameLen
          if (nxt >= end || header(bytes, nxt).nonEmpty) first = Some(h)
          else off += 1
        case None => off += 1
      }
    }
    val h0 = first.getOrElse(return None)

    // Xing/Info tag in frame 1's main-data region. LAME convention:
    // 'Xing' marks a VBR stream, 'Info' marks CBR — an Info-tagged
    // podcast dump must NOT be reported VBR. Either way the
    // tag-carrying frame is metadata, not audio: reference parsers
    // exclude it from frame/duration accounting, so the walk below
    // starts after it.
    var xingFrames = -1
    var tagKind: String = null // "Xing" | "Info" | null
    locally {
      val p = off + 4 + (if (h0.crcPresent) 2 else 0) + h0.sideInfoLen
      if (p + 8 <= end &&
          ((bytes(p) == 'X' && bytes(p + 1) == 'i' && bytes(p + 2) == 'n' && bytes(p + 3) == 'g') ||
           (bytes(p) == 'I' && bytes(p + 1) == 'n' && bytes(p + 2) == 'f' && bytes(p + 3) == 'o'))) {
        tagKind = if (bytes(p) == 'X') "Xing" else "Info"
        val flags = ((bytes(p + 4) & 0xff) << 24) | ((bytes(p + 5) & 0xff) << 16) |
          ((bytes(p + 6) & 0xff) << 8) | (bytes(p + 7) & 0xff)
        if ((flags & 1) != 0 && p + 12 <= end)
          xingFrames = ((bytes(p + 8) & 0xff) << 24) | ((bytes(p + 9) & 0xff) << 16) |
            ((bytes(p + 10) & 0xff) << 8) | (bytes(p + 11) & 0xff)
      }
    }

    var frames = 0
    var bad = 0
    var kbpsSum = 0L
    var bitrateIndices = Set.empty[Int]
    var pos = if (tagKind != null) off + h0.frameLen else off
    var done = pos + 4 > end
    while (!done) {
      header(bytes, pos) match {
        case Some(h) if h.versionBits == h0.versionBits &&
            h.sampleRate == h0.sampleRate && h.channels == h0.channels =>
          if (pos + h.frameLen > end) done = true // truncated tail — drop
          else {
            val crcOk = !h.crcPresent || {
              val si = pos + 6
              si + h.sideInfoLen <= end && {
                val want = ((bytes(pos + 4) & 0xff) << 8) | (bytes(pos + 5) & 0xff)
                crc16(bytes, Seq((pos + 2, pos + 4), (si, si + h.sideInfoLen))) == want
              }
            }
            if (crcOk) {
              frames += 1
              kbpsSum += h.bitrateKbps
              bitrateIndices += h.bitrateIdx
            } else bad += 1
            pos += h.frameLen
            if (pos >= end) done = true
          }
        case _ =>
          // chain break: bounded one-byte resync
          bad += 1
          if (bad > maxBad) return None
          var p = pos + 1
          var found = -1
          while (found < 0 && p + 4 <= end) {
            header(bytes, p) match {
              case Some(h) if h.versionBits == h0.versionBits &&
                  h.sampleRate == h0.sampleRate && h.channels == h0.channels =>
                found = p
              case _ => p += 1
            }
          }
          if (found < 0) done = true else pos = found
      }
    }
    if (frames == 0) return None
    val samples = frames.toLong * h0.samplesPerFrame
    Some(Mp3Info(
      version = h0.versionBits match {
        case 3 => "1"; case 2 => "2"; case _ => "2.5"
      },
      sampleRate = h0.sampleRate,
      channels = h0.channels,
      frames = frames,
      samples = samples,
      durationMs = samples * 1000L / h0.sampleRate,
      bitrateKbps = (kbpsSum / frames).toInt,
      vbr = bitrateIndices.size > 1 || tagKind == "Xing",
      badFrames = bad))
  }

  // ------------------------------------------------------------------
  // fixture encoder — spec-valid SILENT frames
  // ------------------------------------------------------------------

  /** Build a valid MPEG-1 Layer III stream of `frames` silent frames:
    * all-zero side info (part2_3_length = 0, big_values = 0 — legal
    * silence per §2.4.3.4; no main data bits are read), zero-filled
    * main data, optional CRC protection (computed per spec, so the
    * parser's CRC leg is exercised both ways). Any conformant decoder
    * accepts this stream and emits silence. */
  def encodeSilent(sampleRate: Int, channels: Int, frames: Int,
                   bitrateKbps: Int, withCrc: Boolean = false): Array[Byte] = {
    val rateIdx = ratesV1.indexOf(sampleRate)
    require(rateIdx >= 0 && rateIdx < 3, s"MPEG-1 rates only, got $sampleRate")
    val brIdx = bitratesV1.indexOf(bitrateKbps)
    require(brIdx >= 1 && brIdx <= 14, s"bad MPEG-1 bitrate $bitrateKbps")
    require(channels == 1 || channels == 2, s"channels 1|2, got $channels")
    require(frames > 0, "frames must be positive")
    val sideLen = if (channels == 1) 17 else 32
    val out = new ByteArrayOutputStream(frames * 512)
    val mode = if (channels == 1) 3 else 0
    var f = 0
    while (f < frames) {
      val frameLen = 144 * bitrateKbps * 1000 / sampleRate // no padding
      val frame = new Array[Byte](frameLen)
      val h = (0x7ff << 21) | (3 << 19) | (1 << 17) |
        ((if (withCrc) 0 else 1) << 16) | (brIdx << 12) | (rateIdx << 10) |
        (mode << 6)
      frame(0) = (h >>> 24).toByte
      frame(1) = ((h >>> 16) & 0xff).toByte
      frame(2) = ((h >>> 8) & 0xff).toByte
      frame(3) = (h & 0xff).toByte
      // side info: all zeros (already) — main_data_begin 0, silence
      if (withCrc) {
        val crc = crc16(frame, Seq((2, 4), (6, 6 + sideLen)))
        frame(4) = (crc >>> 8).toByte
        frame(5) = (crc & 0xff).toByte
      }
      out.write(frame)
      f += 1
    }
    out.toByteArray
  }

  /** Wrap a stream in ID3v2 (leading) and ID3v1 (trailing) tags — the
    * fixture for the parser's tag-skipping legs. */
  def withId3(stream: Array[Byte], v2PayloadBytes: Int = 64): Array[Byte] = {
    val out = new ByteArrayOutputStream(stream.length + v2PayloadBytes + 138)
    out.write('I'); out.write('D'); out.write('3')
    out.write(4); out.write(0) // v2.4.0
    out.write(0) // flags: no footer
    // syncsafe size
    out.write((v2PayloadBytes >>> 21) & 0x7f)
    out.write((v2PayloadBytes >>> 14) & 0x7f)
    out.write((v2PayloadBytes >>> 7) & 0x7f)
    out.write(v2PayloadBytes & 0x7f)
    // payload: 0xff-laden junk — false syncs the frame walk must not anchor on
    var i = 0
    while (i < v2PayloadBytes) { out.write(if (i % 2 == 0) 0xff else 0xfb); i += 1 }
    out.write(stream)
    val v1 = new Array[Byte](128)
    v1(0) = 'T'; v1(1) = 'A'; v1(2) = 'G'
    out.write(v1)
    out.toByteArray
  }
}

package graft.operators

/**
 * H.264/AVC FRAME-LAYER codec (ITU-T H.264, public spec): the Annex-B
 * byte-stream walk a video-curation gate needs — NAL unit scan (3- and
 * 4-byte start codes, emulation-prevention un-escaping), full SPS parse
 * (profile/level, chroma branch for High profiles, frame cropping, VUI
 * timing → fps), slice-header prefix reads for picture/IDR counting,
 * and duration. No pixel synthesis: decoding the CAVLC/CABAC macroblock
 * layer has no ground-truth source in this container (the
 * [[Mp3Codec]]-style validatability boundary — a decoder validated only
 * against its own encoder's tables is self-consistent garbage), and no
 * curation gate needs pixels: resolution, profile conformance, frame
 * count, fps, IDR cadence and stream integrity are all header-layer.
 *
 * The fixture encoder emits streams that are SPEC-VALID at exactly the
 * layer this parser reads: correct start codes, NAL headers, bit-exact
 * Exp-Golomb SPS/PPS (pinned against hand-computed byte fixtures in
 * H264Spec), slice headers valid through the fields any frame-layer
 * walk consumes (first_mb_in_slice, slice_type, pps_id, frame_num,
 * idr_pic_id) — the macroblock payload below that is deterministic
 * filler (emulation-escaped), the documented boundary.
 *
 * Reference behavior surface: the same per-blob metadata contract as
 * [[Mp3Codec]]/[[FlacCodec]] (cn/swust reference has no media layer;
 * this is part of the beyond-reference multimodal kit).
 */
object H264Codec {

  /** Frame-layer metadata of one Annex-B H.264 stream. */
  case class H264Info(
      profile: String,     // baseline/main/extended/high/high10/high422/high444/other
      profileIdc: Int,
      level: String,       // "4.1"-style from level_idc
      width: Int,          // luma samples after cropping
      height: Int,
      frames: Int,         // coded pictures (slices with first_mb_in_slice == 0)
      idrFrames: Int,      // pictures whose first slice is NAL type 5
      fps: Option[Double], // from VUI timing_info (time_scale / 2*num_units_in_tick)
      durationMs: Option[Long], // frames / fps, floor to ms
      nalUnits: Int,       // total NAL units walked
      badNals: Int)        // forbidden-bit / truncated / unparseable NALs

  // ------------------------------------------------------------------
  // RBSP bit reader (emulation-prevention-aware)
  // ------------------------------------------------------------------

  /** Strip emulation-prevention bytes: 00 00 03 -> 00 00 (§7.4.1.1). */
  private[graft] def unescapeRbsp(b: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new Array[Byte](until - from)
    var i = from
    var n = 0
    var zeros = 0
    while (i < until) {
      val v = b(i)
      if (zeros >= 2 && v == 3) {
        zeros = 0 // emulation-prevention byte: drop, reset the zero run
      } else {
        out(n) = v; n += 1
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, n)
  }

  private class Eob extends Exception // end-of-bits: truncated NAL

  private final class BitReader(b: Array[Byte]) {
    private var pos = 0 // bit position
    def u(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        val byteIdx = pos >> 3
        if (byteIdx >= b.length) throw new Eob
        v = (v << 1) | ((b(byteIdx) >> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }
    /** Exp-Golomb unsigned (§9.1). */
    def ue(): Long = {
      var zeros = 0
      while (u(1) == 0) {
        zeros += 1
        if (zeros > 32) throw new Eob // hostile: absurd code length
      }
      if (zeros == 0) 0L else ((1L << zeros) - 1) + u(zeros)
    }
    /** Exp-Golomb signed (§9.1.1): k -> ceil(k/2) with alternating sign. */
    def se(): Long = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
  }

  // ------------------------------------------------------------------
  // SPS
  // ------------------------------------------------------------------

  private case class Sps(profileIdc: Int, levelIdc: Int, width: Int,
                         height: Int, fps: Option[Double],
                         log2MaxFrameNum: Int)

  private val highProfiles =
    Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)

  /** Parse a seq_parameter_set_rbsp (§7.3.2.1.1). `rbsp` excludes the
    * NAL header byte and is already un-escaped. */
  private def parseSps(rbsp: Array[Byte]): Option[Sps] = {
    try {
      val r = new BitReader(rbsp)
      val profileIdc = r.u(8).toInt
      r.u(8) // constraint_set flags + reserved_zero_2bits
      val levelIdc = r.u(8).toInt
      r.ue() // seq_parameter_set_id
      var chromaFormatIdc = 1L // default 4:2:0 when the branch is absent
      var separateColourPlane = false
      if (highProfiles.contains(profileIdc)) {
        chromaFormatIdc = r.ue()
        if (chromaFormatIdc == 3) separateColourPlane = r.u(1) == 1
        r.ue() // bit_depth_luma_minus8
        r.ue() // bit_depth_chroma_minus8
        r.u(1) // qpprime_y_zero_transform_bypass_flag
        if (r.u(1) == 1) { // seq_scaling_matrix_present_flag
          val lists = if (chromaFormatIdc != 3) 8 else 12
          var i = 0
          while (i < lists) {
            if (r.u(1) == 1) { // seq_scaling_list_present_flag[i]
              // scaling_list(): delta-coded; walk it to stay in sync
              val size = if (i < 6) 16 else 64
              var lastScale = 8L; var nextScale = 8L; var j = 0
              while (j < size) {
                if (nextScale != 0) {
                  val delta = r.se()
                  nextScale = (lastScale + delta + 256) % 256
                }
                if (nextScale != 0) lastScale = nextScale
                j += 1
              }
            }
            i += 1
          }
        }
      }
      val log2MaxFrameNum = r.ue().toInt + 4
      val pocType = r.ue()
      if (pocType == 0) r.ue() // log2_max_pic_order_cnt_lsb_minus4
      else if (pocType == 1) {
        r.u(1); r.se(); r.se()
        val n = r.ue()
        if (n > 255) throw new Eob // spec bound; hostile guard
        var i = 0L
        while (i < n) { r.se(); i += 1 }
      }
      r.ue() // max_num_ref_frames
      r.u(1) // gaps_in_frame_num_value_allowed_flag
      val widthMbs = r.ue() + 1
      val heightMapUnits = r.ue() + 1
      if (widthMbs > 4096 || heightMapUnits > 4096) throw new Eob // hostile
      val frameMbsOnly = r.u(1)
      if (frameMbsOnly == 0) r.u(1) // mb_adaptive_frame_field_flag
      r.u(1) // direct_8x8_inference_flag
      var width = (widthMbs * 16).toInt
      var height = ((2 - frameMbsOnly) * heightMapUnits * 16).toInt
      if (r.u(1) == 1) { // frame_cropping_flag
        val (subW, subH) = chromaFormatIdc match {
          case 0 => (1L, 1L) // monochrome
          case 2 => (2L, 1L) // 4:2:2
          case 3 => (1L, 1L) // 4:4:4
          case _ => (2L, 2L) // 4:2:0
        }
        val cropX = if (chromaFormatIdc == 0 || separateColourPlane) 1L else subW
        val cropY = (if (chromaFormatIdc == 0 || separateColourPlane) 1L else subH) *
          (2 - frameMbsOnly)
        val l = r.ue(); val rt = r.ue(); val t = r.ue(); val bt = r.ue()
        width -= (cropX * (l + rt)).toInt
        height -= (cropY * (t + bt)).toInt
      }
      var fps: Option[Double] = None
      if (r.u(1) == 1) { // vui_parameters_present_flag (§E.1.1)
        if (r.u(1) == 1) { // aspect_ratio_info_present_flag
          val idc = r.u(8)
          if (idc == 255) { r.u(16); r.u(16) } // Extended_SAR
        }
        if (r.u(1) == 1) r.u(1) // overscan
        if (r.u(1) == 1) { // video_signal_type
          r.u(3); r.u(1)
          if (r.u(1) == 1) { r.u(8); r.u(8); r.u(8) }
        }
        if (r.u(1) == 1) { r.ue(); r.ue() } // chroma_loc_info
        if (r.u(1) == 1) { // timing_info_present_flag
          val numUnits = r.u(32)
          val timeScale = r.u(32)
          r.u(1) // fixed_frame_rate_flag
          if (numUnits > 0 && timeScale > 0)
            // two ticks per frame — the spec's field-based clock
            fps = Some(timeScale.toDouble / (2.0 * numUnits))
        }
        // remaining VUI (hrd, bitstream restrictions) not needed
      }
      if (width <= 0 || height <= 0) None
      else Some(Sps(profileIdc, levelIdc, width, height, fps, log2MaxFrameNum))
    } catch { case _: Eob | _: ArrayIndexOutOfBoundsException => None }
  }

  private def profileName(idc: Int): String = idc match {
    case 66 => "baseline"
    case 77 => "main"
    case 88 => "extended"
    case 100 => "high"
    case 110 => "high10"
    case 122 => "high422"
    case 244 => "high444"
    case _ => "other"
  }

  private def levelName(idc: Int): String =
    if (idc == 9) "1b" // level 1b convention
    else if (idc % 10 == 0) (idc / 10).toString
    else s"${idc / 10}.${idc % 10}"

  // ------------------------------------------------------------------
  // Annex-B walk
  // ------------------------------------------------------------------

  /** Parse an Annex-B H.264 elementary stream into frame-layer
    * metadata. Returns None when no SPS parses or no coded slice is
    * found (not an H.264 stream for curation purposes). Hostile-input
    * safe: every read is bounds-checked, Exp-Golomb lengths are capped,
    * bad NALs are counted rather than thrown. */
  def parse(bytes: Array[Byte], maxBadNals: Int = 64): Option[H264Info] = {
    if (bytes == null || bytes.length < 8) return None
    // collect [start, end) of every NAL payload (after the start code)
    var sps: Option[Sps] = None
    var frames = 0
    var idr = 0
    var nals = 0
    var bad = 0
    var sawSlice = false
    var i = 0
    val n = bytes.length
    // find first start code
    def nextStart(from: Int): Int = {
      var p = from
      while (p + 3 <= n) {
        if (bytes(p) == 0 && bytes(p + 1) == 0 &&
            (bytes(p + 2) == 1 ||
              (bytes(p + 2) == 0 && p + 4 <= n && bytes(p + 3) == 1))) return p
        p += 1
      }
      -1
    }
    i = nextStart(0)
    if (i < 0) return None
    while (i >= 0 && i < n) {
      val payloadStart = i + (if (bytes(i + 2) == 1) 3 else 4)
      val nextSc = nextStart(payloadStart)
      val end = if (nextSc < 0) n else nextSc
      if (payloadStart < end) {
        nals += 1
        if (nals > 4 * 1024 * 1024) return None // runaway-stream guard
        val header = bytes(payloadStart) & 0xff
        if ((header & 0x80) != 0) bad += 1 // forbidden_zero_bit
        else {
          val nalType = header & 0x1f
          nalType match {
            case 7 => // SPS: first one wins (steady-stream convention)
              val rbsp = unescapeRbsp(bytes, payloadStart + 1, end)
              parseSps(rbsp) match {
                case s @ Some(_) => if (sps.isEmpty) sps = s
                case None => bad += 1
              }
            case 1 | 5 => // coded slice (non-IDR | IDR)
              val rbsp = unescapeRbsp(bytes, payloadStart + 1,
                math.min(end, payloadStart + 1 + 16)) // header prefix only
              try {
                val r = new BitReader(rbsp)
                val firstMb = r.ue()
                r.ue() // slice_type (walked to validate the header shape)
                r.ue() // pic_parameter_set_id
                sawSlice = true
                if (firstMb == 0) { // new coded picture
                  frames += 1
                  if (nalType == 5) idr += 1
                }
              } catch { case _: Eob => bad += 1 }
            case _ => () // PPS/SEI/AUD/filler: walked, not decoded
          }
        }
        if (bad > maxBadNals) return None
      }
      i = if (nextSc < 0) n else nextSc
    }
    sps match {
      case Some(s) if sawSlice && frames > 0 =>
        Some(H264Info(profileName(s.profileIdc), s.profileIdc,
          levelName(s.levelIdc), s.width, s.height, frames, idr,
          s.fps,
          s.fps.map(f => (frames * 1000.0 / f).toLong),
          nals, bad))
      case _ => None
    }
  }

  // ------------------------------------------------------------------
  // fixture encoder — spec-valid at the frame layer
  // ------------------------------------------------------------------

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def u(v: Long, n: Int): this.type = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1).toInt
        nbits += 1
        if (nbits == 8) { buf.write(cur); cur = 0; nbits = 0 }
        i -= 1
      }
      this
    }
    def ue(v: Long): this.type = {
      val k = v + 1
      val len = 63 - java.lang.Long.numberOfLeadingZeros(k)
      u(0, len.toInt) // len leading zeros
      u(k, len.toInt + 1)
    }
    def se(v: Long): this.type = ue(if (v <= 0) -2 * v else 2 * v - 1)
    /** rbsp_trailing_bits: stop bit + zero-pad to a byte boundary. */
    def trailing(): Array[Byte] = {
      u(1, 1)
      while (nbits != 0) u(0, 1)
      buf.toByteArray
    }
  }

  /** Escape a raw RBSP into the NAL payload form (insert 03 after any
    * 00 00 before a byte <= 3 — §7.4.1.1). */
  private[graft] def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    var zeros = 0
    var i = 0
    while (i < rbsp.length) {
      val v = rbsp(i) & 0xff
      if (zeros >= 2 && v <= 3) { out.write(3); zeros = 0 }
      out.write(v)
      zeros = if (v == 0) zeros + 1 else 0
      i += 1
    }
    out.toByteArray
  }

  private def nal(refIdc: Int, nalType: Int, rbsp: Array[Byte],
                  out: java.io.ByteArrayOutputStream, longSc: Boolean): Unit = {
    if (longSc) { out.write(0); out.write(0); out.write(0); out.write(1) }
    else { out.write(0); out.write(0); out.write(1) }
    out.write((refIdc << 5) | nalType)
    val esc = escapeRbsp(rbsp)
    out.write(esc, 0, esc.length)
  }

  /** Build an Annex-B stream whose frame layer is fully spec-valid:
    * SPS (+VUI timing when `fps` > 0), PPS, then `frames` coded
    * pictures — picture 0 IDR, the rest non-IDR, each with
    * `slicesPerFrame` slices (continuation slices carry a non-zero
    * first_mb_in_slice, so a picture counter that naively counts slice
    * NALs reads wrong). Slice headers are valid through
    * (first_mb_in_slice, slice_type, pps_id, frame_num, idr_pic_id);
    * the macroblock payload below is deterministic filler — the
    * documented validatability boundary (see object scaladoc).
    *
    * Width/height must be multiples of 16 (whole macroblocks); use
    * `cropRight`/`cropBottom` (luma samples, even) to exercise the
    * cropping arithmetic. */
  def encodeFixture(width: Int, height: Int, frames: Int,
                    fps: Double = 0.0, profileIdc: Int = 66,
                    levelIdc: Int = 31, slicesPerFrame: Int = 1,
                    cropRight: Int = 0, cropBottom: Int = 0): Array[Byte] = {
    require(width > 0 && width % 16 == 0, s"width must be a multiple of 16: $width")
    require(height > 0 && height % 16 == 0, s"height % 16 != 0: $height")
    require(frames > 0 && slicesPerFrame >= 1, "frames/slices must be positive")
    require(cropRight % 2 == 0 && cropBottom % 2 == 0 &&
      cropRight >= 0 && cropBottom >= 0 && cropRight < width && cropBottom < height,
      "crops must be even, non-negative, smaller than the dimension (4:2:0 units)")
    val out = new java.io.ByteArrayOutputStream()
    // --- SPS ---
    val sps = new BitWriter
    sps.u(profileIdc, 8)
    sps.u(0, 8) // constraint flags + reserved
    sps.u(levelIdc, 8)
    sps.ue(0) // seq_parameter_set_id
    if (highProfiles.contains(profileIdc)) {
      sps.ue(1) // chroma_format_idc 4:2:0
      sps.ue(0); sps.ue(0) // bit depths
      sps.u(0, 1) // transform bypass
      sps.u(0, 1) // no scaling matrix
    }
    sps.ue(0) // log2_max_frame_num_minus4 -> 4-bit frame_num
    sps.ue(2) // pic_order_cnt_type 2 (no POC fields in slice headers)
    sps.ue(1) // max_num_ref_frames
    sps.u(0, 1) // gaps_in_frame_num_value_allowed_flag
    sps.ue(width / 16 - 1)
    sps.ue(height / 16 - 1)
    sps.u(1, 1) // frame_mbs_only_flag
    sps.u(1, 1) // direct_8x8_inference_flag
    if (cropRight > 0 || cropBottom > 0) {
      sps.u(1, 1) // frame_cropping_flag
      sps.ue(0); sps.ue(cropRight / 2) // CropUnitX = 2 for 4:2:0
      sps.ue(0); sps.ue(cropBottom / 2) // CropUnitY = 2 (frame_mbs_only)
    } else sps.u(0, 1)
    if (fps > 0) {
      sps.u(1, 1) // vui_parameters_present_flag
      sps.u(0, 1); sps.u(0, 1); sps.u(0, 1); sps.u(0, 1) // aspect/overscan/signal/chroma_loc
      sps.u(1, 1) // timing_info_present_flag
      sps.u(1000L, 32) // num_units_in_tick
      sps.u(math.round(fps * 2000.0), 32) // time_scale (2 ticks/frame)
      sps.u(1, 1) // fixed_frame_rate_flag
      // nal_hrd / vcl_hrd / pic_struct / bitstream_restriction: absent
      sps.u(0, 1); sps.u(0, 1); sps.u(0, 1); sps.u(0, 1)
    } else sps.u(0, 1)
    nal(3, 7, sps.trailing(), out, longSc = true)
    // --- PPS ---
    val pps = new BitWriter
    pps.ue(0); pps.ue(0) // pps id, sps id
    pps.u(0, 1) // entropy_coding_mode_flag (CAVLC)
    pps.u(0, 1) // bottom_field_pic_order_in_frame_present_flag
    pps.ue(0) // num_slice_groups_minus1
    pps.ue(0); pps.ue(0) // num_ref_idx defaults
    pps.u(0, 1); pps.u(0, 2) // weighted pred/bipred
    pps.se(0); pps.se(0); pps.se(0) // init qp/qs, chroma offset
    pps.u(0, 1); pps.u(0, 1); pps.u(0, 1) // deblock/intra/redundant flags
    nal(3, 8, pps.trailing(), out, longSc = false)
    // --- slices ---
    val mbs = (width / 16) * (height / 16)
    var f = 0
    while (f < frames) {
      val isIdr = f == 0
      var s = 0
      while (s < slicesPerFrame) {
        val w = new BitWriter
        val firstMb = (mbs.toLong * s) / slicesPerFrame
        w.ue(firstMb)
        w.ue(if (isIdr) 7 else 5) // slice_type: I (7) / P (5), all-slices form
        w.ue(0) // pic_parameter_set_id
        w.u(f % 16, 4) // frame_num (log2_max_frame_num = 4)
        if (isIdr) w.ue(f) // idr_pic_id
        // pic_order_cnt_type == 2: no POC fields. Below this line is
        // macroblock data — the documented boundary; deterministic
        // filler derived from (f, s) keeps streams content-distinct.
        w.u((f * 131 + s * 17 + 7) & 0xff, 8)
        w.u((f * 29 + s * 3 + 1) & 0xff, 8)
        nal(if (isIdr) 3 else 2, if (isIdr) 5 else 1, w.trailing(), out,
          longSc = false)
        s += 1
      }
      f += 1
    }
    out.toByteArray
  }
}

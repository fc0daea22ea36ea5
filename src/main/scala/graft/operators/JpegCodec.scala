package graft.operators

/**
 * Pure-JVM baseline JPEG codec (ITU-T T.81 sequential DCT, Huffman):
 * no codec library — Huffman tables, zigzag, dequant, double-precision
 * IDCT and YCbCr→RGB are all plain arithmetic, the same move as the
 * `java.util.zip` PNG work. This closes the dominant-web-format gap the
 * stub boundary used to carve out: decode is now REAL for JPEG/PNG/BMP/
 * WAV (and since r10/r11 the MP3 and H.264 FRAME layers — `StubCodecs`
 * is deleted; only MP3 PCM synthesis and H.264 macroblock decode stay
 * out, by the validatability argument in their codec headers).
 *
 * Decoder scope (returns None for anything else, never throws on
 * hostile bytes): baseline SOF0, 8-bit precision, 1 or 3 components,
 * chroma sampling factors 1–2 in each axis (4:4:4 / 4:2:2 / 4:4:0 /
 * 4:2:0), multiple DQT/DHT segments, restart markers (DRI/RSTn),
 * FF00 byte stuffing. Progressive (SOF2), arithmetic coding, 12-bit
 * precision and CMYK are out of scope and decode to None — they flow
 * through pipelines as undecodable blobs, the honest degradation.
 * Chroma upsampling is sample replication (nearest): deterministic and
 * spec-legal; fancy (triangle) upsamplers differ by a few codes near
 * chroma edges, which is why the foreign-decoder spec compares with a
 * small tolerance while the self round-trip is exact.
 *
 * Encoder: baseline, standard Annex K Huffman tables, caller-supplied
 * or quality-scaled Annex K quantization, optional 2×2 chroma
 * subsampling and restart intervals. With UNIT quant tables and
 * 8×8-block-constant gray pixels the encode→decode round trip is
 * bit-exact (DC-only blocks: FDCT's F(0,0)=8·(v−128) is integer-exact
 * in double, unit dequant keeps it, and any correct IDCT reconstructs
 * the constant) — that is the SQL-replayable bridge the q_jpeg_image
 * oracle uses, the same design as the PNG/BMP formula oracles.
 *
 * Output contract matches the other RealCodecs image decoders:
 * (ImageMeta, top-down row-major RGB triples).
 */
object JpegCodec {
  import Multimodal.ImageMeta

  /** Natural-order index of the k-th zigzag position (T.81 Figure 5). */
  private[operators] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ---- Annex K reference tables (public spec constants) ---------------

  /** K.1 luminance quantization, natural (row-major) order. */
  val StdQuantLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** K.2 chrominance quantization, natural order. */
  val StdQuantChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** All-ones table: lossless-for-DC, the oracle bridge. */
  val UnitQuant: Array[Int] = Array.fill(64)(1)

  /** libjpeg's public quality→scale mapping over the Annex K tables. */
  def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, "quality in [1,100]")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map(t => math.min(255, math.max(1, (t * scale + 50) / 100)))
  }

  // (bits-per-length histogram, symbol list) — T.81 Annex K.3
  private val DcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).map(_.toByte).toArray
  private val DcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).map(_.toByte).toArray
  private val AcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)
  private val AcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)

  // cosT(x)(u) = C(u)·cos((2x+1)uπ/16); shared by FDCT and IDCT
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Hard dimension cap shared with the PNG reader: a hostile 20-byte
    * header must not be able to demand a multi-GB pixel buffer. */
  private val MaxPixels = 1L << 26

  // ======================= DECODER =====================================

  /** Internal malformed-stream signal; never escapes [[decode]]. */
  private final class Malformed extends Exception(null, null, false, false)
  private def bad(): Nothing = throw new Malformed

  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    // canonical-code decode tables (T.81 F.2.2.3): mincode/maxcode/valptr
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    val values: Array[Byte] = vals
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valPtr(l) = k; minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
      if (k != vals.length) bad()
    }
  }

  /** MSB-first reader over an UNSTUFFED entropy segment. */
  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var cur = 0
    private var nBits = 0
    def nextBit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) bad()
        cur = data(pos) & 0xff; pos += 1; nBits = 8
      }
      nBits -= 1
      (cur >> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = nextBit(); var l = 1
      while (code > t.maxCode(l)) {
        if (l >= 16) bad()
        code = (code << 1) | nextBit(); l += 1
      }
      t.values(t.valPtr(l) + code - t.minCode(l)) & 0xff
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab: Int = 0
    var acTab: Int = 0
  }

  /** Baseline-JPEG reader; (meta, top-down RGB triples) or None. */
  def decode(blob: Array[Byte]): Option[(ImageMeta, Array[Byte])] = {
    if (blob.length < 4 || (blob(0) & 0xff) != 0xff ||
      (blob(1) & 0xff) != 0xd8) return None
    try Some(decodeOrThrow(blob))
    catch {
      case _: Malformed => None
      // untrusted-bytes contract: decode never throws — any residual
      // indexing/arithmetic surprise degrades to an undecodable blob
      case scala.util.control.NonFatal(_) => None
    }
  }

  private def decodeOrThrow(blob: Array[Byte]): (ImageMeta, Array[Byte]) = {
    def u8(i: Int): Int = { if (i >= blob.length) bad(); blob(i) & 0xff }
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)

    val quant = new Array[Array[Int]](4) // natural order after un-zigzag
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var pos = 2

    var scanData: Array[Array[Byte]] = null // entropy segments, unstuffed
    while (scanData == null) {
      // skip fill bytes before a marker
      while (u8(pos) != 0xff) pos += 1
      while (u8(pos) == 0xff) pos += 1
      val marker = u8(pos); pos += 1
      marker match {
        case 0xd9 => bad() // EOI before SOS: no image
        case 0xc0 | 0xc1 => // baseline / extended sequential (Huffman)
          val len = u16(pos)
          if (u8(pos + 2) != 8) bad() // precision
          h = u16(pos + 3); w = u16(pos + 5)
          val nc = u8(pos + 7)
          if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) bad()
          if (w.toLong * h > MaxPixels) bad()
          if (len != 8 + 3 * nc) bad()
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val hv = u8(o + 1)
            val ch = hv >> 4; val cv = hv & 15
            if (ch < 1 || ch > 2 || cv < 1 || cv > 2) bad()
            Component(u8(o), ch, cv, u8(o + 2) & 3)
          }
          if (nc == 1 && (comps(0).h != 1 || comps(0).v != 1)) bad()
          pos += len
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf =>
          bad() // progressive/lossless/arithmetic: out of scope
        case 0xdb => // DQT: one or more tables
          val len = u16(pos)
          var o = pos + 2
          while (o < pos + len) {
            val pq = u8(o) >> 4; val tq = u8(o) & 15
            if (pq > 1 || tq > 3) bad()
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) {
              t(Zigzag(k)) =
                if (pq == 0) u8(o + 1 + k) else u16(o + 1 + 2 * k)
              k += 1
            }
            quant(tq) = t
            o += 1 + (if (pq == 0) 64 else 128)
          }
          if (o != pos + len) bad()
          pos += len
        case 0xc4 => // DHT: one or more tables
          val len = u16(pos)
          var o = pos + 2
          while (o < pos + len) {
            val tc = u8(o) >> 4; val th = u8(o) & 15
            if (tc > 1 || th > 3) bad()
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) { bits(l) = u8(o + l); total += bits(l); l += 1 }
            if (total > 256 || o + 17 + total > blob.length) bad()
            val vals = java.util.Arrays.copyOfRange(blob, o + 17, o + 17 + total)
            val tab = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
            o += 17 + total
          }
          if (o != pos + len) bad()
          pos += len
        case 0xdd => // DRI
          if (u16(pos) != 4) bad()
          restartInterval = u16(pos + 2)
          pos += 4
        case 0xda => // SOS: bind tables, then slurp entropy segments
          if (comps == null) bad()
          val len = u16(pos)
          val ns = u8(pos + 2)
          if (ns != comps.length || len != 6 + 2 * ns) bad()
          var i = 0
          while (i < ns) {
            val cs = u8(pos + 3 + 2 * i)
            val c = comps.find(_.id == cs).getOrElse(bad())
            c.dcTab = u8(pos + 4 + 2 * i) >> 4
            c.acTab = u8(pos + 4 + 2 * i) & 15
            i += 1
          }
          // baseline scan header: Ss=0, Se=63, Ah=Al=0 — don't enforce
          // beyond presence (some encoders write junk here)
          pos += len
          // walk the entropy-coded data: unstuff FF00, split at RSTn,
          // stop at the next real marker
          val segs = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
          var segBuf = new java.io.ByteArrayOutputStream()
          var done = false
          while (!done) {
            val b = u8(pos)
            if (b != 0xff) { segBuf.write(b); pos += 1 }
            else {
              val m = u8(pos + 1)
              if (m == 0x00) { segBuf.write(0xff); pos += 2 }
              else if (m >= 0xd0 && m <= 0xd7) { // RSTn: segment boundary
                segs += segBuf.toByteArray
                segBuf = new java.io.ByteArrayOutputStream()
                pos += 2
              } else if (m == 0xff) pos += 1 // fill byte
              else done = true // EOI or any other marker ends the scan
            }
          }
          segs += segBuf.toByteArray
          scanData = segs.toArray
        case 0x01 => () // TEM, no payload
        case m if m >= 0xd0 && m <= 0xd7 => () // stray RST, no payload
        case _ => pos += u16(pos) // APPn / COM / anything with a length
      }
    }

    // ---- entropy decode + dequant + IDCT into per-component planes ----
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val planes = comps.map { c =>
      new Array[Byte](mcusX * c.h * 8 * mcusY * c.v * 8)
    }
    val planeW = comps.map(c => mcusX * c.h * 8)
    comps.foreach { c =>
      if (quant(c.tq) == null || dcTabs(c.dcTab) == null ||
        acTabs(c.acTab) == null) bad()
    }

    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    val dcPred = new Array[Int](comps.length)
    var seg = 0
    var reader = new BitReader(scanData(0))
    val nMcus = mcusX * mcusY
    var mcu = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        seg += 1
        if (seg >= scanData.length) bad()
        reader = new BitReader(scanData(seg))
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val qt = quant(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val s = reader.decodeHuff(dcTabs(c.dcTab))
            if (s > 11) bad()
            dcPred(ci) += extend(reader.receive(s), s)
            coef(0) = dcPred(ci) * qt(0)
            // AC
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = reader.decodeHuff(acTabs(c.acTab))
              val r = rs >> 4; val sz = rs & 15
              if (sz == 0) {
                if (r == 15) k += 16 else eob = true
              } else {
                k += r
                if (k > 63 || sz > 10) bad()
                coef(Zigzag(k)) =
                  extend(reader.receive(sz), sz) * qt(Zigzag(k))
                k += 1
              }
            }
            // IDCT (separable, double): rows then columns
            var y0 = 0
            while (y0 < 8) {
              var x0 = 0
              while (x0 < 8) {
                var acc = 0.0
                var u = 0
                while (u < 8) { acc += CosT(x0)(u) * coef(y0 * 8 + u); u += 1 }
                tmp(y0 * 8 + x0) = acc
                x0 += 1
              }
              y0 += 1
            }
            val plane = planes(ci)
            val pw = planeW(ci)
            val px0 = (mx * c.h + bx) * 8
            val py0 = (my * c.v + by) * 8
            var x1 = 0
            while (x1 < 8) {
              var y1 = 0
              while (y1 < 8) {
                var acc = 0.0
                var v = 0
                while (v < 8) { acc += CosT(y1)(v) * tmp(v * 8 + x1); v += 1 }
                val samp = Math.round(acc / 4.0 + 128.0).toInt
                plane((py0 + y1) * pw + px0 + x1) =
                  (if (samp < 0) 0 else if (samp > 255) 255 else samp).toByte
                y1 += 1
              }
              x1 += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // ---- upsample + color convert to top-down RGB --------------------
    val rgb = new Array[Byte](w * h * 3)
    if (comps.length == 1) {
      val plane = planes(0); val pw = planeW(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = plane(y * pw + x)
          val o = (y * w + x) * 3
          rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // nearest (replication) chroma upsampling
          def samp(ci: Int): Int = {
            val c = comps(ci)
            planes(ci)((y * c.v / vmax) * planeW(ci) + (x * c.h / hmax)) & 0xff
          }
          val yy = samp(0).toDouble
          val cb = samp(1) - 128.0
          val cr = samp(2) - 128.0
          def clamp(d: Double): Byte = {
            val v = Math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          val o = (y * w + x) * 3
          rgb(o) = clamp(yy + 1.402 * cr)
          rgb(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          rgb(o + 2) = clamp(yy + 1.772 * cb)
          x += 1
        }
        y += 1
      }
    }
    (ImageMeta(Some(w), Some(h), Some(if (comps.length == 1) 1 else 3),
      "jpeg"), rgb)
  }

  // ======================= ENCODER =====================================

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(bits: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    /** Pad to a byte boundary with 1-bits (spec fill before a marker). */
    def flush(): Unit = { if (nBits > 0) put((1 << (8 - nBits)) - 1, 8 - nBits) }
  }

  private def buildCodes(bits: Array[Int], vals: Array[Byte])
      : (Array[Int], Array[Int]) = {
    val codes = new Array[Int](256)
    val sizes = new Array[Int](256)
    var code = 0; var k = 0; var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) {
        codes(vals(k) & 0xff) = code
        sizes(vals(k) & 0xff) = l
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    (codes, sizes)
  }

  private def category(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /**
   * Baseline encoder. `pix` returns (r,g,b); `chromaSub` 1 = 4:4:4,
   * 2 = 4:2:0 (2×2 box-mean chroma); `gray` drops to one component;
   * `restartEvery` > 0 emits DRI + RSTn markers. Quant tables are in
   * NATURAL order (encoder zigzags them into the DQT segment).
   */
  def encode(w: Int, h: Int, pix: (Int, Int) => (Int, Int, Int),
             quantLuma: Array[Int] = StdQuantLuma,
             quantChroma: Array[Int] = StdQuantChroma,
             chromaSub: Int = 1, gray: Boolean = false,
             restartEvery: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0, "encode: positive dims")
    require(chromaSub == 1 || chromaSub == 2, "chromaSub 1 or 2")
    val sub = if (gray) 1 else chromaSub
    val mcuPx = 8 * sub
    val mcusX = (w + mcuPx - 1) / mcuPx
    val mcusY = (h + mcuPx - 1) / mcuPx
    val padW = mcusX * mcuPx; val padH = mcusY * mcuPx

    // padded YCbCr planes (edge replication)
    val yP = new Array[Int](padW * padH)
    val cbP = if (gray) null else new Array[Int](padW * padH)
    val crP = if (gray) null else new Array[Int](padW * padH)
    var y = 0
    while (y < padH) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < padW) {
        val sx = math.min(x, w - 1)
        val (r, g, b) = pix(sx, sy)
        if (gray) {
          // callers encode gray via r=g=b; use green as the sample
          yP(y * padW + x) = math.max(0, math.min(255, g))
        } else {
          val yy = Math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt
          val cb = Math.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b).toInt
          val cr = Math.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b).toInt
          yP(y * padW + x) = math.max(0, math.min(255, yy))
          cbP(y * padW + x) = math.max(0, math.min(255, cb))
          crP(y * padW + x) = math.max(0, math.min(255, cr))
        }
        x += 1
      }
      y += 1
    }
    // subsampled chroma planes (box mean, round half up)
    val cw = padW / sub; val ch = padH / sub
    def downsample(p: Array[Int]): Array[Int] = {
      if (sub == 1) p
      else {
        val o = new Array[Int](cw * ch)
        var cy = 0
        while (cy < ch) {
          var cx = 0
          while (cx < cw) {
            var s = 0
            var dy = 0
            while (dy < sub) {
              var dx = 0
              while (dx < sub) {
                s += p((cy * sub + dy) * padW + cx * sub + dx)
                dx += 1
              }
              dy += 1
            }
            o(cy * cw + cx) = (s + sub * sub / 2) / (sub * sub)
            cx += 1
          }
          cy += 1
        }
        o
      }
    }
    val cbS = if (gray) null else downsample(cbP)
    val crS = if (gray) null else downsample(crP)

    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    // JFIF APP0
    marker(0xe0); u16(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0) // v1.1, no density units
    u16(1); u16(1); out.write(0); out.write(0)
    // DQT
    def dqt(id: Int, t: Array[Int]): Unit = {
      marker(0xdb); u16(67); out.write(id)
      var k = 0
      while (k < 64) { out.write(t(Zigzag(k)) & 0xff); k += 1 }
    }
    dqt(0, quantLuma)
    if (!gray) dqt(1, quantChroma)
    // SOF0
    val nc = if (gray) 1 else 3
    marker(0xc0); u16(8 + 3 * nc); out.write(8); u16(h); u16(w); out.write(nc)
    out.write(1); out.write((sub << 4) | sub); out.write(0) // Y
    if (!gray) {
      out.write(2); out.write(0x11); out.write(1) // Cb
      out.write(3); out.write(0x11); out.write(1) // Cr
    }
    // DHT
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      marker(0xc4); u16(19 + vals.length); out.write((tc << 4) | th)
      var l = 1
      while (l <= 16) { out.write(bits(l)); l += 1 }
      out.write(vals)
    }
    dht(0, 0, DcLumaBits, DcLumaVals)
    dht(1, 0, AcLumaBits, AcLumaVals)
    if (!gray) {
      dht(0, 1, DcChromaBits, DcChromaVals)
      dht(1, 1, AcChromaBits, AcChromaVals)
    }
    if (restartEvery > 0) { marker(0xdd); u16(4); u16(restartEvery) }
    // SOS
    marker(0xda); u16(6 + 2 * nc); out.write(nc)
    out.write(1); out.write(0x00)
    if (!gray) { out.write(2); out.write(0x11); out.write(3); out.write(0x11) }
    out.write(0); out.write(63); out.write(0) // Ss/Se/AhAl

    val (dcLC, dcLS) = buildCodes(DcLumaBits, DcLumaVals)
    val (acLC, acLS) = buildCodes(AcLumaBits, AcLumaVals)
    val (dcCC, dcCS) = buildCodes(DcChromaBits, DcChromaVals)
    val (acCC, acCS) = buildCodes(AcChromaBits, AcChromaVals)

    var bw = new BitWriter(out)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)

    def encodeBlock(plane: Array[Int], pw: Int, px0: Int, py0: Int,
                    qt: Array[Int], dcCodes: Array[Int], dcSizes: Array[Int],
                    acCodes: Array[Int], acSizes: Array[Int],
                    dcPred: Int): Int = {
      // FDCT (separable, double) over level-shifted samples
      var yy = 0
      while (yy < 8) {
        var u = 0
        while (u < 8) {
          var acc = 0.0
          var x = 0
          while (x < 8) {
            acc += CosT(x)(u) * (plane((py0 + yy) * pw + px0 + x) - 128)
            x += 1
          }
          tmp(yy * 8 + u) = acc
          u += 1
        }
        yy += 1
      }
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var acc = 0.0
          var yk = 0
          while (yk < 8) { acc += CosT(yk)(v) * tmp(yk * 8 + u); yk += 1 }
          val q = qt(v * 8 + u)
          coef(v * 8 + u) = Math.round(acc / 4.0 / q).toInt
          v += 1
        }
        u += 1
      }
      // DC
      val diff = coef(0) - dcPred
      val s = category(diff)
      bw.put(dcCodes(s), dcSizes(s))
      if (s > 0)
        bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      // AC with run-length + ZRL + EOB
      var run = 0
      var k = 1
      while (k < 64) {
        val c = coef(Zigzag(k))
        if (c == 0) run += 1
        else {
          while (run > 15) { bw.put(acCodes(0xf0), acSizes(0xf0)); run -= 16 }
          val sz = category(c)
          val rs = (run << 4) | sz
          bw.put(acCodes(rs), acSizes(rs))
          bw.put(if (c < 0) c + (1 << sz) - 1 else c, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(acCodes(0x00), acSizes(0x00)) // EOB
      coef(0)
    }

    var dcY = 0; var dcCb = 0; var dcCr = 0
    var rstIdx = 0
    val nMcus = mcusX * mcusY
    var mcu = 0
    while (mcu < nMcus) {
      if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0) {
        bw.flush()
        marker(0xd0 + (rstIdx & 7)); rstIdx += 1
        bw = new BitWriter(out)
        dcY = 0; dcCb = 0; dcCr = 0
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var by = 0
      while (by < sub) {
        var bx = 0
        while (bx < sub) {
          dcY = encodeBlock(yP, padW, (mx * sub + bx) * 8, (my * sub + by) * 8,
            quantLuma, dcLC, dcLS, acLC, acLS, dcY)
          bx += 1
        }
        by += 1
      }
      if (!gray) {
        dcCb = encodeBlock(cbS, cw, mx * 8, my * 8, quantChroma,
          dcCC, dcCS, acCC, acCS, dcCb)
        dcCr = encodeBlock(crS, cw, mx * 8, my * 8, quantChroma,
          dcCC, dcCS, acCC, acCS, dcCr)
      }
      mcu += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Gray-pixel convenience: r=g=b=v blocks through the 1-component
    * path; with [[UnitQuant]] and 8×8-block-constant `v` the round trip
    * is bit-exact (the oracle bridge). */
  def encodeGray(w: Int, h: Int, v: (Int, Int) => Int,
                 quant: Array[Int] = UnitQuant,
                 restartEvery: Int = 0): Array[Byte] =
    encode(w, h, (x, y) => { val g = v(x, y); (g, g, g) },
      quantLuma = quant, gray = true, restartEvery = restartEvery)
}

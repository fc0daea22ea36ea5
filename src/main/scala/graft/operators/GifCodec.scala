package graft.operators

import java.io.ByteArrayOutputStream

/**
 * Pure-JVM GIF codec (GIF87a/89a): LZW with variable code widths is
 * plain bit arithmetic — no codec library, the same move as the
 * `java.util.zip` PNG work and the [[JpegCodec]] Huffman tables. With
 * this, decode is REAL for every common legacy web image format
 * (JPEG/PNG/GIF/BMP); FLAC decodes for real since FlacCodec, and the
 * MP3/H.264 FRAME layers since r10/r11 (`StubCodecs` is deleted — only
 * MP3 PCM synthesis and H.264 macroblock decode stay out, by the
 * validatability argument in their codec headers).
 *
 * Decoder scope (None for anything else; hostile bytes never throw):
 * first image of the stream (animated GIFs decode frame 1 — the
 * image-pipeline contract), global or local color table, interlaced or
 * sequential row order, GIF89a extension blocks skipped by their
 * sub-block chains, full LZW semantics: variable width 3–12 bits,
 * LSB-first packing across sub-block boundaries, CLEAR/END codes,
 * the KwKwK case (code == next dict slot), dict frozen at 4096 until a
 * clear (deferred-clear encoders). Transparency is ignored by contract
 * — the transparent index renders as its palette color (decode targets
 * dedup/stats, not compositing). Output is the image descriptor's own
 * w×h top-down RGB (frame offsets are not composited onto the canvas).
 *
 * Encoder: single-image GIF89a with a 256-entry GRAYSCALE global table
 * (entry i = (i,i,i)), 8-bit min code size, optional interlace. It
 * emits literal codes with a CLEAR before the width would grow (the
 * classic spec-valid "uncompressed GIF" stream) — simple, deterministic
 * at any parallelism, and it makes index == gray value, which is what
 * lets the q_gif_image oracle replay pixels as arithmetic, exactly like
 * the PNG/BMP formula oracles. The dict-growth decode paths the simple
 * encoder never produces are pinned by a FOREIGN encoder in the spec
 * (the JDK's ImageIO GIF writer does real LZW with growing widths).
 */
object GifCodec {

  private val Trailer = 0x3b
  private val ExtensionIntroducer = 0x21
  private val ImageSeparator = 0x2c

  /** Interlace pass structure: (first row, step). */
  private val interlacePasses = Array((0, 8), (4, 8), (2, 4), (1, 2))

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  /** First image → (meta, top-down RGB); None on anything out of scope. */
  def decode(blob: Array[Byte]): Option[(Multimodal.ImageMeta, Array[Byte])] = {
    if (blob.length < 13) return None
    val hdr = new String(blob, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    def u8(i: Int): Int = blob(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8) // little-endian
    var pos = 6
    pos += 4 // logical screen w/h (frame decodes to its own size)
    val packed = u8(pos); pos += 3 // packed, bg index, aspect
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 3 * (1 << ((packed & 7) + 1))
      if (pos + n > blob.length) return None
      gct = java.util.Arrays.copyOfRange(blob, pos, pos + n)
      pos += n
    }
    while (pos < blob.length) {
      u8(pos) match {
        case Trailer => return None // no image block seen
        case ExtensionIntroducer =>
          pos += 2 // introducer + label; all extensions are sub-block chains
          var len = if (pos < blob.length) u8(pos) else return None
          while (len != 0) {
            pos += 1 + len
            if (pos >= blob.length) return None
            len = u8(pos)
          }
          pos += 1 // block terminator
        case ImageSeparator =>
          if (pos + 10 > blob.length) return None
          val iw = u16(pos + 5); val ih = u16(pos + 7)
          val ipacked = u8(pos + 9)
          pos += 10
          // dimension sanity BEFORE allocation, like decodePng: hostile
          // headers must not demand multi-GB buffers
          if (iw <= 0 || ih <= 0 || iw.toLong * ih > (1L << 26)) return None
          var palette = gct
          if ((ipacked & 0x80) != 0) {
            val n = 3 * (1 << ((ipacked & 7) + 1))
            if (pos + n > blob.length) return None
            palette = java.util.Arrays.copyOfRange(blob, pos, pos + n)
            pos += n
          }
          if (palette == null) return None
          val interlaced = (ipacked & 0x40) != 0
          if (pos >= blob.length) return None
          val minCodeSize = u8(pos); pos += 1
          if (minCodeSize < 2 || minCodeSize > 11) return None
          // concatenate the LZW sub-blocks
          val data = new ByteArrayOutputStream()
          var len = if (pos < blob.length) u8(pos) else return None
          while (len != 0) {
            if (pos + 1 + len > blob.length) return None
            data.write(blob, pos + 1, len)
            pos += 1 + len
            if (pos >= blob.length) return None
            len = u8(pos)
          }
          val indices = lzwDecode(data.toByteArray, minCodeSize, iw * ih)
            .getOrElse(return None)
          val nColors = palette.length / 3
          val rgb = new Array[Byte](iw * ih * 3)
          // de-interlace while mapping through the palette
          val rowOrder: Array[Int] =
            if (!interlaced) Array.tabulate(ih)(identity)
            else {
              val order = new Array[Int](ih)
              var k = 0
              interlacePasses.foreach { case (first, step) =>
                var y = first
                while (y < ih) { order(k) = y; k += 1; y += step }
              }
              order
            }
          var srcRow = 0
          while (srcRow < ih) {
            val y = rowOrder(srcRow)
            var x = 0
            while (x < iw) {
              val idx = indices(srcRow * iw + x) & 0xff
              if (idx >= nColors) return None
              rgb((y * iw + x) * 3) = palette(idx * 3)
              rgb((y * iw + x) * 3 + 1) = palette(idx * 3 + 1)
              rgb((y * iw + x) * 3 + 2) = palette(idx * 3 + 2)
              x += 1
            }
            srcRow += 1
          }
          return Some((Multimodal.ImageMeta(
            Some(iw), Some(ih), Some(3), "gif"), rgb))
        case _ => return None // unknown block type: unparseable stream
      }
    }
    None
  }

  /** GIF LZW: LSB-first variable-width codes, CLEAR/END, KwKwK, dict
    * frozen at 4096 until clear. Returns exactly `nPixels` indices. */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
                        nPixels: Int): Option[Array[Byte]] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val out = new Array[Byte](nPixels)
    var outPos = 0
    // dict as prefix links: suffix byte + prefix code per slot
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    var dictSize = end + 1
    var width = minCodeSize + 1
    var prev = -1
    var bitPos = 0
    val nBits = data.length * 8
    while (outPos < nPixels) {
      if (bitPos + width > nBits) return None // truncated stream
      var code = 0
      var k = 0
      while (k < width) {
        val b = bitPos + k
        if ((data(b >> 3) >> (b & 7) & 1) != 0) code |= 1 << k
        k += 1
      }
      bitPos += width
      if (code == clear) {
        dictSize = end + 1
        width = minCodeSize + 1
        prev = -1
      } else if (code == end) {
        return if (outPos == nPixels) Some(out) else None
      } else {
        // expand `code` (KwKwK: code may be the next unassigned slot)
        if (code > dictSize || (code == dictSize && prev < 0)) return None
        var sp = 0
        var cur = if (code == dictSize) prev else code
        val kwkwk = code == dictSize
        while (cur >= clear + 2) { // composite slot: walk prefix links
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
        }
        if (cur >= clear) return None // dangling link: corrupt
        val firstByte = cur.toByte
        // emit: first byte, reversed stack, and for KwKwK the first byte again
        if (outPos >= nPixels) return None
        out(outPos) = firstByte; outPos += 1
        while (sp > 0) {
          sp -= 1
          if (outPos >= nPixels) return None
          out(outPos) = stack(sp); outPos += 1
        }
        if (kwkwk) {
          if (outPos >= nPixels) return None
          out(outPos) = firstByte; outPos += 1
        }
        // add (prev + firstByte) to the dict — not before the first code
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = firstByte
          dictSize += 1
          if (dictSize == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    Some(out)
  }

  // ------------------------------------------------------------------
  // encode
  // ------------------------------------------------------------------

  /** Single-image grayscale GIF: pixel (x,y) = palette index
    * `f(x,y) & 0xff`, palette entry i = (i,i,i). `interlaced` writes
    * rows in the four-pass order (decoder must undo it). */
  def encodeGray(w: Int, h: Int, f: (Int, Int) => Int,
                 interlaced: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, s"bad dims ${w}x$h")
    // mirror the decoder's total-pixel guard: 0xffff x 0xffff would
    // overflow the w*h*2 Int buffer hints to a negative allocation size
    require(w.toLong * h <= (1L << 26),
      s"total pixels ${w.toLong * h} exceed 2^26 — encode smaller tiles")
    val out = new ByteArrayOutputStream(w * h * 2 + 800)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    u8(0x80 | 7) // GCT present, 256 entries
    u8(0); u8(0) // bg index, aspect
    var i = 0
    while (i < 256) { u8(i); u8(i); u8(i); i += 1 } // grayscale GCT
    u8(ImageSeparator)
    u16(0); u16(0); u16(w); u16(h)
    u8(if (interlaced) 0x40 else 0) // no LCT
    val minCodeSize = 8
    u8(minCodeSize)
    // LZW literal stream with pre-growth CLEARs (width stays 9)
    val clear = 1 << minCodeSize
    val end = clear + 1
    val width = minCodeSize + 1
    val body = new ByteArrayOutputStream(w * h * 2)
    var acc = 0L
    var accBits = 0
    def putCode(c: Int): Unit = {
      acc |= c.toLong << accBits
      accBits += width
      while (accBits >= 8) {
        body.write((acc & 0xff).toInt)
        acc >>= 8
        accBits -= 8
      }
    }
    putCode(clear)
    var dictSize = end + 1 // what a decoder's dict does as it consumes this
    var emittedSinceClear = 0
    val rows: Array[Int] =
      if (!interlaced) Array.tabulate(h)(identity)
      else interlacePasses.flatMap { case (first, step) =>
        Iterator.range(first, h, step)
      }
    rows.foreach { y =>
      var x = 0
      while (x < w) {
        // the decoder adds one dict entry per code AFTER the first
        // following a clear; clear before it would need width 10
        if (emittedSinceClear > 0) dictSize += 1
        if (dictSize >= (1 << width) - 1) {
          putCode(clear)
          dictSize = end + 1
          emittedSinceClear = 0
        }
        putCode(f(x, y) & 0xff)
        emittedSinceClear += 1
        x += 1
      }
    }
    putCode(end)
    if (accBits > 0) body.write((acc & 0xff).toInt)
    // chunk into <=255-byte sub-blocks
    val bytes = body.toByteArray
    var off = 0
    while (off < bytes.length) {
      val n = math.min(255, bytes.length - off)
      u8(n)
      out.write(bytes, off, n)
      off += n
    }
    u8(0) // sub-block terminator
    u8(Trailer)
    out.toByteArray
  }
}

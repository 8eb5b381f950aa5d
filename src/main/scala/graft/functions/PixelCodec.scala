package graft.functions

import java.util.zip.{CRC32, Deflater, Inflater}

/**
 * C12 — REAL pixel/sample decode for the formats the JVM can decode
 * without external codec libraries, closing the decode stub for them:
 *
 *  - PNG (RFC 2083): full pixel decode — IDAT concatenation, zlib
 *    inflate via `java.util.zip.Inflater`, scanline UNFILTERING (all
 *    five filter types: None/Sub/Up/Average/Paeth) for 8-bit RGBA
 *    (colour type 6), the layout [[encodePngPixels]] emits. Exactness
 *    is cross-checked pixel-for-pixel against the JDK's own ImageIO
 *    PNG reader in `MultimodalSpec`.
 *  - WAV (RIFF PCM): sample decode — 8-bit unsigned, 16/24-bit
 *    little-endian signed frames out of the `data` chunk located by
 *    the [[MediaCodecUtil.parseWav]] chunk walk.
 *  - GIF (GIF89a): full LZW pixel decode — variable-width codes, clear
 *    codes, the KwKwK code==next case, 4096-entry capacity handling,
 *    global/local palettes; [[encodeGifPixels]] emits genuine LZW
 *    streams, cross-checked against the JDK's ImageIO GIF reader.
 *
 * JPEG baseline pixels are decoded for real in
 * [[graft.functions.JpegCodecUtil]] (T.81 huffman + IDCT), MP4
 * PCM samples / MJPEG frames in [[MediaCodecUtil]] (which also walks
 * AAC ADTS frames and Ogg Vorbis pages with real RFC 3533 CRCs at the
 * container level), and lossless compressed audio in
 * [[FlacCodecUtil]] (full FLAC encode+decode). The only remaining
 * stand-ins are the LOSSY transform codecs a JVM cannot host here —
 * H.264/HEVC video and AAC/Vorbis sample decode — documented in
 * [[graft.operators.Multimodal]].
 *
 * Decoding runs executor-side inside the batched `mapPartitions`
 * feature stage — per-row byte arithmetic, no driver involvement, so
 * the shape holds at any scale.
 */
object PixelCodecUtil {

  /** Encode an 8-bit RGBA PNG whose pixel (x, y) is `pixelOf(x, y)`
    * (packed 0xAARRGGBB is NOT used — value is packed RGBA as
    * (r<<24|g<<16|b<<8|a)). Scanline filters cycle through types
    * 0..4 by row, so a decoder must implement the full unfilter set.
    * Real zlib stream (fixed level for determinism), real CRCs. */
  def encodePngPixels(width: Int, height: Int,
                      pixelOf: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    val stride = width * 4
    val raw = new Array[Byte]((stride + 1) * height)
    val prev = new Array[Byte](stride)
    val cur = new Array[Byte](stride)
    var y = 0
    var o = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = pixelOf(x, y)
        cur(x * 4) = (p >>> 24).toByte
        cur(x * 4 + 1) = (p >>> 16).toByte
        cur(x * 4 + 2) = (p >>> 8).toByte
        cur(x * 4 + 3) = p.toByte
        x += 1
      }
      val ft = y % 5
      raw(o) = ft.toByte; o += 1
      var i = 0
      while (i < stride) {
        val cb = cur(i) & 0xFF
        val left = if (i >= 4) cur(i - 4) & 0xFF else 0
        val up = prev(i) & 0xFF
        val ul = if (i >= 4) prevAt(prev, i - 4, y) else 0
        val enc = ft match {
          case 0 => cb
          case 1 => cb - left
          case 2 => cb - (if (y > 0) up else 0)
          case 3 => cb - ((left + (if (y > 0) up else 0)) >> 1)
          case 4 => cb - paeth(left, if (y > 0) up else 0, if (y > 0) ul else 0)
        }
        raw(o) = enc.toByte; o += 1
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zl = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) zl.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val idat = zl.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    writeChunk(out, "IHDR", {
      val h = new Array[Byte](13)
      h(0) = (width >>> 24).toByte; h(1) = (width >>> 16).toByte
      h(2) = (width >>> 8).toByte; h(3) = width.toByte
      h(4) = (height >>> 24).toByte; h(5) = (height >>> 16).toByte
      h(6) = (height >>> 8).toByte; h(7) = height.toByte
      h(8) = 8 // bit depth
      h(9) = 6 // colour type RGBA
      h
    })
    writeChunk(out, "IDAT", idat)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def prevAt(prev: Array[Byte], i: Int, y: Int): Int =
    if (y > 0) prev(i) & 0xFF else 0

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
                         data: Array[Byte]): Unit = {
    val len = data.length
    out.write(len >>> 24); out.write(len >>> 16); out.write(len >>> 8); out.write(len)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb, 0, 4)
    out.write(data, 0, len)
    val crc = new CRC32
    crc.update(tb); crc.update(data)
    val c = crc.getValue
    out.write((c >>> 24).toInt); out.write((c >>> 16).toInt)
    out.write((c >>> 8).toInt); out.write(c.toInt)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode an 8-bit RGBA PNG produced by any encoder (all five filter
    * types handled) → packed (r<<24|g<<16|b<<8|a) pixels row-major, or
    * null when the stream is not an 8-bit-RGBA PNG or is corrupt. */
  def decodePngPixels(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 8) return null
    if ((b(0) & 0xFF) != 0x89 || b(1) != 'P' || b(2) != 'N' || b(3) != 'G') return null
    var width = 0; var height = 0; var depth = -1; var colour = -1
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var sawEnd = false
    while (!sawEnd && i + 8 <= b.length) {
      val len = ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
        ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
      if (len < 0 || i + 12 + len > b.length) return null
      val typ = new String(b, i + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (len < 13) return null
          width = ((b(i + 8) & 0xFF) << 24) | ((b(i + 9) & 0xFF) << 16) |
            ((b(i + 10) & 0xFF) << 8) | (b(i + 11) & 0xFF)
          height = ((b(i + 12) & 0xFF) << 24) | ((b(i + 13) & 0xFF) << 16) |
            ((b(i + 14) & 0xFF) << 8) | (b(i + 15) & 0xFF)
          depth = b(i + 16) & 0xFF; colour = b(i + 17) & 0xFF
        case "IDAT" => idat.write(b, i + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunk — skip
      }
      i += 12 + len
    }
    if (width <= 0 || height <= 0 || depth != 8 || colour != 6) return null
    val stride = width * 4
    val raw = new Array[Byte]((stride + 1) * height)
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    try {
      var off = 0
      while (!inflater.finished() && off < raw.length) {
        val n = inflater.inflate(raw, off, raw.length - off)
        if (n == 0 && inflater.needsInput()) return null // truncated stream
        off += n
      }
      if (off != raw.length) return null
    } catch { case _: java.util.zip.DataFormatException => return null }
    finally inflater.end()

    val out = new Array[Int](width * height)
    val prev = new Array[Int](stride) // unfiltered previous scanline
    val cur = new Array[Int](stride)
    var y = 0
    while (y < height) {
      val base = y * (stride + 1)
      val ft = raw(base) & 0xFF
      if (ft > 4) return null
      var x = 0
      while (x < stride) {
        val f = raw(base + 1 + x) & 0xFF
        val left = if (x >= 4) cur(x - 4) else 0
        val up = if (y > 0) prev(x) else 0
        val ul = if (y > 0 && x >= 4) prev(x - 4) else 0
        cur(x) = (ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + ((left + up) >> 1)
          case 4 => f + paeth(left, up, ul)
        }) & 0xFF
        x += 1
      }
      var px = 0
      while (px < width) {
        out(y * width + px) = (cur(px * 4) << 24) | (cur(px * 4 + 1) << 16) |
          (cur(px * 4 + 2) << 8) | cur(px * 4 + 3)
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    out
  }

  /** [[MediaCodecUtil.encodeWav]] with a REAL PCM payload: frame s of
    * channel c carries `sampleOf(s * channels + c)` (clamped to the bit
    * depth), so decoded audio round-trips value-exactly. */
  def encodeWavSamples(sampleRate: Int, channels: Int, bits: Int,
                       samples: Array[Int], pad: Int = 0): Array[Byte] = {
    require(bits == 8 || bits == 16 || bits == 24, s"unsupported bit depth $bits")
    require(samples.length % channels == 0, "partial trailing frame")
    val out = MediaCodecUtil.encodeWav(sampleRate, channels, bits,
      samples.length / channels, pad)
    // data chunk is the last chunk encodeWav emits — walk to it
    var i = 12
    var dOff = -1
    while (i + 8 <= out.length && dOff < 0) {
      val size = (out(i + 4) & 0xFFL) | ((out(i + 5) & 0xFFL) << 8) |
        ((out(i + 6) & 0xFFL) << 16) | ((out(i + 7) & 0xFFL) << 24)
      if (out(i) == 'd' && out(i + 1) == 'a' && out(i + 2) == 't' && out(i + 3) == 'a') dOff = i + 8
      else i += 8 + size.toInt + (size & 1).toInt
    }
    val bytesPer = bits / 8
    var s = 0
    while (s < samples.length) {
      val v = samples(s)
      val o = dOff + s * bytesPer
      bits match {
        case 8 => out(o) = (math.max(-128, math.min(127, v)) + 128).toByte
        case 16 =>
          val c = math.max(-32768, math.min(32767, v))
          out(o) = c.toByte; out(o + 1) = (c >> 8).toByte
        case 24 =>
          val c = math.max(-(1 << 23), math.min((1 << 23) - 1, v))
          out(o) = c.toByte; out(o + 1) = (c >> 8).toByte; out(o + 2) = (c >> 16).toByte
      }
      s += 1
    }
    out
  }

  /** Decode PCM samples out of a WAV container: channel-interleaved
    * frames as Int sample values (8-bit unsigned rebased to signed,
    * 16/24-bit little-endian signed), or null when the container is
    * unparseable / not integer PCM. */
  def decodeWavSamples(b: Array[Byte]): Array[Int] = {
    val meta = MediaCodecUtil.parseWav(b)
    if (meta == null) return null
    val bits = meta.getInt(3)
    if (bits != 8 && bits != 16 && bits != 24) return null
    // locate the data chunk (same walk as parseWav)
    var i = 12
    var dOff = -1; var dLen = 0L
    while (i + 8 <= b.length && dOff < 0) {
      val size = (b(i + 4) & 0xFFL) | ((b(i + 5) & 0xFFL) << 8) |
        ((b(i + 6) & 0xFFL) << 16) | ((b(i + 7) & 0xFFL) << 24)
      if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a') {
        dOff = i + 8; dLen = size
      } else i += 8 + size.toInt + (size & 1).toInt
    }
    if (dOff < 0 || dOff + dLen > b.length) return null
    val bytesPer = bits / 8
    val n = (dLen / bytesPer).toInt
    val out = new Array[Int](n)
    var s = 0
    while (s < n) {
      val o = dOff + s * bytesPer
      out(s) = bits match {
        case 8 => (b(o) & 0xFF) - 128
        case 16 => ((b(o) & 0xFF) | (b(o + 1) << 8)).toShort.toInt
        case 24 => ((b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | (b(o + 2) << 16)) << 8 >> 8
      }
      s += 1
    }
    out
  }

  // ---------------------------------------------------------------------
  // GIF (GIF89a): REAL LZW — full variable-width dictionary compression
  // on encode and a spec-compliant decoder (clear codes, the KwKwK
  // code==next case, width growth at 2^w, 4096-entry capacity reset).
  // Palette-indexed pixels; exactness is cross-checked against the JDK's
  // own ImageIO GIF reader in MultimodalSpec.
  // ---------------------------------------------------------------------

  /** Encode a GIF89a whose pixel (x, y) carries palette index
    * `indexOf(x, y) mod palette.length`. One frame, global colour table,
    * genuine LZW with width growth and capacity clear codes. */
  def encodeGifPixels(width: Int, height: Int, palette: Array[Int],
                      indexOf: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    require(palette.nonEmpty && palette.length <= 256, "palette must be 1..256 colours")
    var bits = 1
    while ((1 << bits) < palette.length) bits += 1
    val tableSize = 1 << bits
    val out = new java.io.ByteArrayOutputStream()
    out.write('G'); out.write('I'); out.write('F')
    out.write('8'); out.write('9'); out.write('a')
    out.write(width & 0xFF); out.write((width >> 8) & 0xFF)
    out.write(height & 0xFF); out.write((height >> 8) & 0xFF)
    out.write(0x80 | ((bits - 1) << 4) | (bits - 1)) // global table, 2^bits entries
    out.write(0); out.write(0)                       // background index, aspect
    var c = 0
    while (c < tableSize) {
      val rgb = if (c < palette.length) palette(c) else 0
      out.write((rgb >> 16) & 0xFF); out.write((rgb >> 8) & 0xFF); out.write(rgb & 0xFF)
      c += 1
    }
    out.write(0x2C)                                  // image descriptor
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(width & 0xFF); out.write((width >> 8) & 0xFF)
    out.write(height & 0xFF); out.write((height >> 8) & 0xFF)
    out.write(0)                                     // no local table, sequential

    val minCode = math.max(2, bits)
    out.write(minCode)
    val clear = 1 << minCode
    val eoi = clear + 1
    var nextCode = eoi + 1
    var w = minCode + 1
    val dict = new java.util.HashMap[Long, Integer]()
    val data = new java.io.ByteArrayOutputStream()
    var acc = 0; var nAcc = 0
    def emit(code: Int): Unit = {
      acc |= code << nAcc; nAcc += w
      while (nAcc >= 8) { data.write(acc & 0xFF); acc >>>= 8; nAcc -= 8 }
    }
    emit(clear)
    var prefix = -1
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val k = java.lang.Math.floorMod(indexOf(x, y), palette.length)
        if (prefix < 0) prefix = k
        else {
          val key = prefix.toLong << 8 | k
          val hit = dict.get(key)
          if (hit != null) prefix = hit.intValue()
          else {
            emit(prefix)
            if (nextCode < 4096) {
              dict.put(key, nextCode); nextCode += 1
              // decoder lag: it adds no entry for the first code after a
              // clear, so its counter runs one behind ours — delay width
              // growth by one code to stay in lock-step (canonical GIF)
              if (nextCode == (1 << w) + 1 && w < 12) w += 1
            } else {
              emit(clear)
              dict.clear(); nextCode = eoi + 1; w = minCode + 1
            }
            prefix = k
          }
        }
        x += 1
      }
      y += 1
    }
    if (prefix >= 0) emit(prefix)
    emit(eoi)
    if (nAcc > 0) data.write(acc & 0xFF)

    val bytes = data.toByteArray                     // → 255-byte sub-blocks
    var o = 0
    while (o < bytes.length) {
      val n = math.min(255, bytes.length - o)
      out.write(n); out.write(bytes, o, n)
      o += n
    }
    out.write(0)                                     // block terminator
    out.write(0x3B)                                  // trailer
    out.toByteArray
  }

  /** Decode the first frame of a GIF87a/89a → packed (r<<24|g<<16|b<<8|a)
    * pixels row-major (alpha 255 — single-frame opaque path), or null on
    * any unsupported structure (interlace, missing palette) or corrupt
    * LZW stream. Extensions are skipped by their sub-block framing. */
  def decodeGifPixels(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 14) return null
    if (b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
        (b(4) != '7' && b(4) != '9') || b(5) != 'a') return null
    val width = (b(6) & 0xFF) | ((b(7) & 0xFF) << 8)
    val height = (b(8) & 0xFF) | ((b(9) & 0xFF) << 8)
    if (width <= 0 || height <= 0) return null
    val flags = b(10) & 0xFF
    var palette: Array[Int] = null
    var i = 13
    if ((flags & 0x80) != 0) {
      val n = 1 << ((flags & 7) + 1)
      if (i + 3 * n > b.length) return null
      palette = Array.tabulate(n)(c =>
        ((b(i + 3 * c) & 0xFF) << 16) | ((b(i + 3 * c + 1) & 0xFF) << 8) |
          (b(i + 3 * c + 2) & 0xFF))
      i += 3 * n
    }
    while (i < b.length) {
      (b(i) & 0xFF) match {
        case 0x21 =>                                 // extension: label + sub-blocks
          i += 2
          while (i < b.length && (b(i) & 0xFF) != 0) i += 1 + (b(i) & 0xFF)
          i += 1
        case 0x2C =>                                 // image descriptor
          if (i + 10 > b.length) return null
          val iw = (b(i + 5) & 0xFF) | ((b(i + 6) & 0xFF) << 8)
          val ih = (b(i + 7) & 0xFF) | ((b(i + 8) & 0xFF) << 8)
          // Long check: 65535×65535 overflows Int; also bound allocation
          // (a 20-byte header must not command a multi-GB buffer)
          if (iw <= 0 || ih <= 0 || iw.toLong * ih > (1L << 26)) return null
          val ifl = b(i + 9) & 0xFF
          i += 10
          if ((ifl & 0x40) != 0) return null         // interlaced: unsupported
          if ((ifl & 0x80) != 0) {                   // local palette wins
            val n = 1 << ((ifl & 7) + 1)
            if (i + 3 * n > b.length) return null
            palette = Array.tabulate(n)(c =>
              ((b(i + 3 * c) & 0xFF) << 16) | ((b(i + 3 * c + 1) & 0xFF) << 8) |
                (b(i + 3 * c + 2) & 0xFF))
            i += 3 * n
          }
          if (palette == null || i >= b.length) return null
          val minCode = b(i) & 0xFF
          if (minCode < 2 || minCode > 11) return null
          i += 1
          val data = new java.io.ByteArrayOutputStream()
          while (i < b.length && (b(i) & 0xFF) != 0) {
            val n = b(i) & 0xFF
            if (i + 1 + n > b.length) return null
            data.write(b, i + 1, n)
            i += 1 + n
          }
          val idx = lzwDecode(data.toByteArray, minCode, iw * ih)
          if (idx == null) return null
          val out = new Array[Int](iw * ih)
          var p = 0
          while (p < out.length) {
            val rgb = palette(idx(p) % palette.length)
            out(p) = (((rgb >> 16) & 0xFF) << 24) | (((rgb >> 8) & 0xFF) << 16) |
              ((rgb & 0xFF) << 8) | 0xFF
            p += 1
          }
          return out
        case 0x3B => return null                     // trailer before any image
        case _ => return null                        // desynchronized stream
      }
    }
    null
  }

  // ---------------------------------------------------------------------
  // MP4 (ISO BMFF) PCM audio tracks: a COMPLETE box tree on encode
  // (ftyp + moov/mvhd/trak/tkhd/mdia/mdhd/hdlr/minf/smhd/dinf/stbl with
  // stsd 'twos'/'sowt', stts/stsc/stsz/stco + mdat) and a general
  // stbl-walking sample decoder. Raw PCM ('twos' big-endian, 'sowt'
  // little-endian, 16-bit) is the one MP4 payload decodable without AV
  // codec libraries — compressed tracks (H.264/AAC) remain the
  // documented stand-in in graft.operators.Multimodal.
  // ---------------------------------------------------------------------

  /** Decoded PCM track: interleaved samples + geometry. */
  final case class Mp4Pcm(samples: Array[Int], bits: Int, channels: Int,
                          sampleRate: Int)

  private def be16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def mp4Box(tag: String, parts: Array[Byte]*): Array[Byte] = {
    val size = 8 + parts.map(_.length).sum
    val out = new java.io.ByteArrayOutputStream(size)
    out.write(be32(size), 0, 4)
    out.write(tag.getBytes("US-ASCII"), 0, 4)
    parts.foreach(p => out.write(p, 0, p.length))
    out.toByteArray
  }

  /** Encode a complete single-track PCM MP4 ('twos' big-endian 16-bit):
    * every box a conformant reader needs, with `stco` pointing at the
    * real `mdat` payload. Interleaved samples, `timescale = sampleRate`. */
  def encodeMp4PcmSamples(sampleRate: Int, channels: Int,
                          samples: Array[Int]): Array[Byte] = {
    require(sampleRate > 0 && channels >= 1 && samples.length % channels == 0)
    val nFrames = samples.length / channels
    val frameBytes = 2 * channels
    def moovAt(mdatPayloadOffset: Long): Array[Byte] = {
      val mvhd = mp4Box("mvhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
        be32(sampleRate), be32(nFrames), be32(0x00010000L), be16(0x0100),
        new Array[Byte](10),
        be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
        be32(0), be32(0), be32(0), be32(0x40000000L),
        new Array[Byte](24), be32(2))
      val tkhd = mp4Box("tkhd", Array[Byte](0, 0, 0, 7), be32(0), be32(0),
        be32(1), be32(0), be32(nFrames), new Array[Byte](8),
        be16(0), be16(0), be16(0x0100), be16(0),
        be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
        be32(0), be32(0), be32(0), be32(0x40000000L), be32(0), be32(0))
      val mdhd = mp4Box("mdhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
        be32(sampleRate), be32(nFrames), be16(0x55C4), be16(0)) // 'und'
      val hdlr = mp4Box("hdlr", Array[Byte](0, 0, 0, 0), be32(0),
        "soun".getBytes("US-ASCII"), new Array[Byte](12), Array[Byte](0))
      val smhd = mp4Box("smhd", Array[Byte](0, 0, 0, 0), be16(0), be16(0))
      val dinf = mp4Box("dinf",
        mp4Box("dref", Array[Byte](0, 0, 0, 0), be32(1),
          mp4Box("url ", Array[Byte](0, 0, 0, 1)))) // self-contained
      val entry = mp4Box("twos", new Array[Byte](6), be16(1),
        be16(0), be16(0), be32(0), be16(channels), be16(16), be16(0), be16(0),
        be32(sampleRate.toLong << 16)) // 16.16 fixed
      val stsd = mp4Box("stsd", Array[Byte](0, 0, 0, 0), be32(1), entry)
      val stts = mp4Box("stts", Array[Byte](0, 0, 0, 0), be32(1),
        be32(nFrames), be32(1))
      val stsc = mp4Box("stsc", Array[Byte](0, 0, 0, 0), be32(1),
        be32(1), be32(nFrames), be32(1))
      val stsz = mp4Box("stsz", Array[Byte](0, 0, 0, 0),
        be32(frameBytes), be32(nFrames)) // uniform sample size
      val stco = mp4Box("stco", Array[Byte](0, 0, 0, 0), be32(1),
        be32(mdatPayloadOffset))
      val stbl = mp4Box("stbl", stsd, stts, stsc, stsz, stco)
      val minf = mp4Box("minf", smhd, dinf, stbl)
      val mdia = mp4Box("mdia", mdhd, hdlr, minf)
      val trak = mp4Box("trak", tkhd, mdia)
      mp4Box("moov", mvhd, trak)
    }
    val ftyp = mp4Box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isom".getBytes("US-ASCII"), "mp42".getBytes("US-ASCII"))
    // stco is inside moov but moov's SIZE doesn't depend on its value:
    // build once with 0 to learn the layout, then with the real offset
    val moovLen = moovAt(0).length
    val moov = moovAt(ftyp.length + moovLen + 8L)
    val pcm = new Array[Byte](samples.length * 2)
    var s = 0
    while (s < samples.length) {
      val v = math.max(-32768, math.min(32767, samples(s)))
      pcm(2 * s) = (v >> 8).toByte; pcm(2 * s + 1) = v.toByte // big-endian
      s += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp, 0, ftyp.length)
    out.write(moov, 0, moov.length)
    val mdat = mp4Box("mdat", pcm)
    out.write(mdat, 0, mdat.length)
    out.toByteArray
  }

  /** A decoded MJPEG track: per-frame ARGB pixel arrays + geometry. */
  final case class Mp4Mjpeg(frames: Array[Array[Int]], width: Int,
                            height: Int, timescale: Int)

  /** Encode JPEG frames as a MOTION-JPEG MP4 video track (stsd 'jpeg' —
    * the intra-only video codec real cameras ship; each sample is a
    * complete baseline JPEG the existing codec decodes). Full box tree:
    * vmhd/hdlr 'vide', VideoSampleEntry geometry, per-sample stsz (frames
    * differ in size), one chunk, stco at the real mdat payload. */
  def encodeMp4Mjpeg(width: Int, height: Int, fps: Int,
                     frames: Array[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && frames.nonEmpty)
    val n = frames.length
    def moovAt(mdatPayloadOffset: Long): Array[Byte] = {
      val mvhd = mp4Box("mvhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
        be32(fps), be32(n), be32(0x00010000L), be16(0x0100),
        new Array[Byte](10),
        be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
        be32(0), be32(0), be32(0), be32(0x40000000L),
        new Array[Byte](24), be32(2))
      val tkhd = mp4Box("tkhd", Array[Byte](0, 0, 0, 7), be32(0), be32(0),
        be32(1), be32(0), be32(n), new Array[Byte](8),
        be16(0), be16(0), be16(0), be16(0),
        be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
        be32(0), be32(0), be32(0), be32(0x40000000L),
        be32(width.toLong << 16), be32(height.toLong << 16))
      val mdhd = mp4Box("mdhd", Array[Byte](0, 0, 0, 0), be32(0), be32(0),
        be32(fps), be32(n), be16(0x55C4), be16(0))
      val hdlr = mp4Box("hdlr", Array[Byte](0, 0, 0, 0), be32(0),
        "vide".getBytes("US-ASCII"), new Array[Byte](12), Array[Byte](0))
      val vmhd = mp4Box("vmhd", Array[Byte](0, 0, 0, 1),
        be16(0), be16(0), be16(0), be16(0))
      val dinf = mp4Box("dinf",
        mp4Box("dref", Array[Byte](0, 0, 0, 0), be32(1),
          mp4Box("url ", Array[Byte](0, 0, 0, 1))))
      // ISO 14496-12 VideoSampleEntry for an MJPEG ('jpeg') track
      val entry = mp4Box("jpeg", new Array[Byte](6), be16(1),
        be16(0), be16(0), new Array[Byte](12),
        be16(width), be16(height),
        be32(0x00480000L), be32(0x00480000L), be32(0), be16(1),
        new Array[Byte](32), be16(24), be16(0xFFFF))
      val stsd = mp4Box("stsd", Array[Byte](0, 0, 0, 0), be32(1), entry)
      val stts = mp4Box("stts", Array[Byte](0, 0, 0, 0), be32(1),
        be32(n), be32(1))
      val stsc = mp4Box("stsc", Array[Byte](0, 0, 0, 0), be32(1),
        be32(1), be32(n), be32(1))
      val stsz = mp4Box("stsz",
        (Seq(Array[Byte](0, 0, 0, 0), be32(0), be32(n)) ++
          frames.map(f => be32(f.length))): _*)
      val stco = mp4Box("stco", Array[Byte](0, 0, 0, 0), be32(1),
        be32(mdatPayloadOffset))
      val stbl = mp4Box("stbl", stsd, stts, stsc, stsz, stco)
      val minf = mp4Box("minf", vmhd, dinf, stbl)
      val mdia = mp4Box("mdia", mdhd, hdlr, minf)
      val trak = mp4Box("trak", tkhd, mdia)
      mp4Box("moov", mvhd, trak)
    }
    val ftyp = mp4Box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
      "isom".getBytes("US-ASCII"), "mp42".getBytes("US-ASCII"))
    val moovLen = moovAt(0).length
    val moov = moovAt(ftyp.length + moovLen + 8L)
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp, 0, ftyp.length)
    out.write(moov, 0, moov.length)
    val payload = new java.io.ByteArrayOutputStream()
    frames.foreach(f => payload.write(f, 0, f.length))
    val mdat = mp4Box("mdat", payload.toByteArray)
    out.write(mdat, 0, mdat.length)
    out.toByteArray
  }

  /** Decode the first MJPEG ('jpeg' stsd) video track via the real sample
    * tables, each sample through the full baseline JPEG decoder — or null
    * when there is no decodable MJPEG track (other codecs, truncated
    * tables, any undecodable frame). */
  def decodeMp4MjpegFrames(b: Array[Byte]): Mp4Mjpeg =
    try decodeMp4MjpegFrames0(b)
    catch {
      case _: IndexOutOfBoundsException | _: NegativeArraySizeException => null
    }

  private def decodeMp4MjpegFrames0(b: Array[Byte]): Mp4Mjpeg = {
    if (b == null || b.length < 16) return null
    def u32(i: Long): Long = ((b(i.toInt) & 0xFFL) << 24) |
      ((b(i.toInt + 1) & 0xFFL) << 16) | ((b(i.toInt + 2) & 0xFFL) << 8) |
      (b(i.toInt + 3) & 0xFFL)
    def u16(i: Long): Int = ((b(i.toInt) & 0xFF) << 8) | (b(i.toInt + 1) & 0xFF)
    if (findMp4Box(b, 0, b.length, "ftyp") != 0L) return null
    val moov = findMp4Box(b, 0, b.length, "moov")
    if (moov < 0) return null
    val moovEnd = moov + u32(moov)
    var trak = findMp4Box(b, moov + 8, moovEnd, "trak")
    while (trak >= 0) {
      val trakEnd = trak + u32(trak)
      val mdia = findMp4Box(b, trak + 8, trakEnd, "mdia")
      if (mdia >= 0) {
        val mdiaEnd = mdia + u32(mdia)
        val minf = findMp4Box(b, mdia + 8, mdiaEnd, "minf")
        val mdhd = findMp4Box(b, mdia + 8, mdiaEnd, "mdhd")
        if (minf >= 0 && mdhd >= 0) {
          val minfEnd = minf + u32(minf)
          val stbl = findMp4Box(b, minf + 8, minfEnd, "stbl")
          if (stbl >= 0) {
            val stblEnd = stbl + u32(stbl)
            val stsd = findMp4Box(b, stbl + 8, stblEnd, "stsd")
            val stsz = findMp4Box(b, stbl + 8, stblEnd, "stsz")
            val stsc = findMp4Box(b, stbl + 8, stblEnd, "stsc")
            val stco = findMp4Box(b, stbl + 8, stblEnd, "stco")
            if (stsd >= 0 && stsz >= 0 && stsc >= 0 && stco >= 0 &&
                u32(stsd) >= 16 + 86 && u32(stsd + 12) >= 1 &&
                u32(mdhd) >= 24 && u32(stsz) >= 20 && u32(stsc) >= 16 &&
                u32(stco) >= 16) {
              val e = stsd + 16
              val fmt = new String(b, e.toInt + 4, 4, "US-ASCII")
              if (fmt == "jpeg") {
                val width = u16(e + 32)
                val height = u16(e + 34)
                val mdhdTs = u32(mdhd + 20).toInt
                val uniform = u32(stsz + 12)
                val nSamples = u32(stsz + 16).toInt
                if (nSamples <= 0 || nSamples > (1 << 20)) return null
                if (uniform == 0 && 20 + 4L * nSamples > u32(stsz)) return null
                val sizes = Array.tabulate(nSamples)(k =>
                  if (uniform != 0) uniform else u32(stsz + 20 + 4L * k))
                val nChunks = u32(stco + 12).toInt
                if (nChunks < 0 || 16 + 4L * nChunks > u32(stco)) return null
                val chunkOff = Array.tabulate(nChunks)(k => u32(stco + 16 + 4L * k))
                val nStsc = u32(stsc + 12).toInt
                if (nStsc < 0 || 16 + 12L * nStsc > u32(stsc)) return null
                val spc = new Array[Int](nChunks)
                var r = 0
                while (r < nStsc) {
                  val first = u32(stsc + 16 + 12L * r).toInt
                  val cnt = u32(stsc + 20 + 12L * r).toInt
                  val last = if (r + 1 < nStsc) u32(stsc + 16 + 12L * (r + 1)).toInt
                             else nChunks + 1
                  var ch = first
                  while (ch < last && ch <= nChunks) { spc(ch - 1) = cnt; ch += 1 }
                  r += 1
                }
                val frames = Array.newBuilder[Array[Int]]
                var sample = 0
                var chunk = 0
                while (chunk < nChunks && sample < nSamples) {
                  var off = chunkOff(chunk)
                  var k = 0
                  while (k < spc(chunk) && sample < nSamples) {
                    val sz = sizes(sample)
                    if (sz <= 0 || off + sz > b.length) return null
                    val px = graft.functions.JpegCodecUtil.decodeJpegPixels(
                      java.util.Arrays.copyOfRange(b, off.toInt, (off + sz).toInt))
                    if (px == null) return null
                    frames += px
                    off += sz
                    sample += 1
                    k += 1
                  }
                  chunk += 1
                }
                val fs = frames.result()
                if (fs.length != nSamples) return null
                return Mp4Mjpeg(fs, width, height, mdhdTs)
              }
            }
          }
        }
      }
      trak = findMp4Box(b, trakEnd, moovEnd, "trak")
    }
    null
  }

  private def findMp4Box(b: Array[Byte], from: Long, end: Long,
                         tag: String): Long = {
    var i = from
    while (i + 8 <= end) {
      val size = ((b(i.toInt) & 0xFFL) << 24) | ((b(i.toInt + 1) & 0xFFL) << 16) |
        ((b(i.toInt + 2) & 0xFFL) << 8) | (b(i.toInt + 3) & 0xFFL)
      if (size < 8 || i + size > end) return -1L
      if (b(i.toInt + 4) == tag(0) && b(i.toInt + 5) == tag(1) &&
          b(i.toInt + 6) == tag(2) && b(i.toInt + 7) == tag(3)) return i
      i += size
    }
    -1L
  }

  /** Decode the first raw-PCM audio track ('twos'/'sowt' 16-bit) of an
    * ISO BMFF file via the real sample tables — stsd format, stsz sizes
    * (uniform or per-sample), stsc chunk mapping, stco offsets — or null
    * when there is no decodable PCM track (compressed codecs, truncated
    * tables). */
  def decodeMp4PcmSamples(b: Array[Byte]): Mp4Pcm =
    try decodeMp4PcmSamples0(b)
    catch { // malformed tables must fall through, never kill the task
      case _: IndexOutOfBoundsException | _: NegativeArraySizeException => null
    }

  private def decodeMp4PcmSamples0(b: Array[Byte]): Mp4Pcm = {
    if (b == null || b.length < 16) return null
    def u32(i: Long): Long = ((b(i.toInt) & 0xFFL) << 24) |
      ((b(i.toInt + 1) & 0xFFL) << 16) | ((b(i.toInt + 2) & 0xFFL) << 8) |
      (b(i.toInt + 3) & 0xFFL)
    def u16(i: Long): Int = ((b(i.toInt) & 0xFF) << 8) | (b(i.toInt + 1) & 0xFF)
    if (findMp4Box(b, 0, b.length, "ftyp") != 0L) return null
    val moov = findMp4Box(b, 0, b.length, "moov")
    if (moov < 0) return null
    val moovEnd = moov + u32(moov)
    var trak = findMp4Box(b, moov + 8, moovEnd, "trak")
    while (trak >= 0) {
      val trakEnd = trak + u32(trak)
      val mdia = findMp4Box(b, trak + 8, trakEnd, "mdia")
      if (mdia >= 0) {
        val mdiaEnd = mdia + u32(mdia)
        val minf = findMp4Box(b, mdia + 8, mdiaEnd, "minf")
        val mdhd = findMp4Box(b, mdia + 8, mdiaEnd, "mdhd")
        if (minf >= 0 && mdhd >= 0) {
          val minfEnd = minf + u32(minf)
          val stbl = findMp4Box(b, minf + 8, minfEnd, "stbl")
          if (stbl >= 0) {
            val stblEnd = stbl + u32(stbl)
            val stsd = findMp4Box(b, stbl + 8, stblEnd, "stsd")
            val stsz = findMp4Box(b, stbl + 8, stblEnd, "stsz")
            val stsc = findMp4Box(b, stbl + 8, stblEnd, "stsc")
            val stco = findMp4Box(b, stbl + 8, stblEnd, "stco")
            if (stsd >= 0 && stsz >= 0 && stsc >= 0 && stco >= 0 &&
                u32(stsd) >= 16 + 36 && u32(stsd + 12) >= 1 &&
                u32(mdhd) >= 24 && u32(stsz) >= 20 && u32(stsc) >= 16 &&
                u32(stco) >= 16) {
              val e = stsd + 16 // first sample entry
              val fmt = new String(b, e.toInt + 4, 4, "US-ASCII")
              if (fmt == "twos" || fmt == "sowt") {
                val channels = u16(e + 24)
                val sampleBits = u16(e + 26)
                val mdhdTs = u32(mdhd + 20).toInt
                if (channels >= 1 && sampleBits == 16) {
                  val uniform = u32(stsz + 12)
                  val nSamples = u32(stsz + 16).toInt
                  // per-sample sizes must FIT in the stsz box; counts are
                  // capped so a lying header can't command a huge alloc
                  if (nSamples <= 0 || nSamples > (1 << 26)) return null
                  if (uniform == 0 && 20 + 4L * nSamples > u32(stsz)) return null
                  val sizes = Array.tabulate(nSamples)(k =>
                    if (uniform != 0) uniform else u32(stsz + 20 + 4L * k))
                  val nChunks = u32(stco + 12).toInt
                  if (nChunks < 0 || 16 + 4L * nChunks > u32(stco)) return null
                  val chunkOff = Array.tabulate(nChunks)(k => u32(stco + 16 + 4L * k))
                  val nStsc = u32(stsc + 12).toInt
                  if (nStsc < 0 || 16 + 12L * nStsc > u32(stsc)) return null
                  // expand stsc runs → samples-per-chunk for every chunk
                  val spc = new Array[Int](nChunks)
                  var r = 0
                  while (r < nStsc) {
                    val first = u32(stsc + 16 + 12L * r).toInt
                    val n = u32(stsc + 20 + 12L * r).toInt
                    val last = if (r + 1 < nStsc) u32(stsc + 16 + 12L * (r + 1)).toInt
                               else nChunks + 1
                    var ch = first
                    while (ch < last && ch <= nChunks) { spc(ch - 1) = n; ch += 1 }
                    r += 1
                  }
                  val out = Array.newBuilder[Int]
                  var sample = 0
                  var chunk = 0
                  while (chunk < nChunks && sample < nSamples) {
                    var off = chunkOff(chunk)
                    var k = 0
                    while (k < spc(chunk) && sample < nSamples) {
                      val sz = sizes(sample)
                      if (off + sz > b.length) return null
                      var j = 0L
                      while (j + 1 < sz) {
                        val v =
                          if (fmt == "twos")
                            ((b((off + j).toInt) << 8) | (b((off + j + 1).toInt) & 0xFF)).toShort.toInt
                          else
                            ((b((off + j + 1).toInt) << 8) | (b((off + j).toInt) & 0xFF)).toShort.toInt
                        out += v
                        j += 2
                      }
                      off += sz
                      sample += 1
                      k += 1
                    }
                    chunk += 1
                  }
                  return Mp4Pcm(out.result(), sampleBits, channels, mdhdTs)
                }
              }
            }
          }
        }
      }
      trak = findMp4Box(b, trakEnd, moovEnd, "trak")
    }
    null
  }

  /** GIF-variant LZW decode of `data` into exactly `nPixels` indices
    * (prefix/suffix dictionary tables, iterative expansion — no
    * recursion, no per-entry byte copies). */
  private def lzwDecode(data: Array[Byte], minCode: Int, nPixels: Int): Array[Int] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefixT = new Array[Int](4096)
    val suffixT = new Array[Int](4096)
    val stack = new Array[Int](4096)
    var next = eoi + 1
    var w = minCode + 1
    val out = new Array[Int](nPixels)
    var nOut = 0
    var acc = 0; var nAcc = 0; var pos = 0
    var prev = -1
    def read(): Int = {
      while (nAcc < w) {
        if (pos >= data.length) return -1
        acc |= (data(pos) & 0xFF) << nAcc; nAcc += 8; pos += 1
      }
      val code = acc & ((1 << w) - 1)
      acc >>>= w; nAcc -= w
      code
    }
    def firstOf(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefixT(c)
      c
    }
    while (nOut < nPixels) {
      val code = read()
      if (code < 0 || code == eoi) return if (nOut == nPixels) out else null
      if (code == clear) {
        next = eoi + 1; w = minCode + 1; prev = -1
      } else if (prev < 0) {
        if (code >= clear) return null               // first code must be literal
        out(nOut) = code; nOut += 1
        prev = code
      } else {
        if (code > next || (code == next && next >= 4096)) return null
        // expand `code` (KwKwK: code == next expands prev + first(prev))
        var top = 0
        var c = if (code == next) { stack(top) = firstOf(prev); top += 1; prev }
                else code
        while (c >= clear) { stack(top) = suffixT(c); top += 1; c = prefixT(c) }
        stack(top) = c; top += 1
        val first = c
        while (top > 0) {
          top -= 1
          if (nOut < nPixels) { out(nOut) = stack(top); nOut += 1 }
          else return null                           // more pixels than declared
        }
        if (next < 4096) {
          prefixT(next) = prev; suffixT(next) = first
          next += 1
          if (next == (1 << w) && w < 12) w += 1
        }
        prev = code
      }
    }
    out
  }
}
